import numpy as np

from dafs_tpu.decoders_ip import ipknot


def test_ipknot_nested_only():
    L = 20
    p = np.zeros((L, L), np.float32)
    for k in range(3):
        p[k, L - 1 - k] = 0.9  # one helix
    ss, s, _score = ipknot.decode(p, [0.2, 1 / 9.0])
    assert s.count("(") == 3 and s.count(")") == 3
    assert "[" not in s


def test_ipknot_pseudoknot_two_levels():
    # H-type pseudoknot: helix A pairs (0..2 with 10..8), helix B (5..6 with 15..14)
    L = 18
    p = np.zeros((L, L), np.float32)
    for k in range(3):
        p[k, 10 - k] = 0.9
    for k in range(2):
        p[5 + k, 15 - k] = 0.8
    ss, s, _score = ipknot.decode(p, [0.2, 1 / 9.0])
    # both helices kept, on different levels; since the level-1 threshold
    # (1/9) is lower than level-0's (0.2), the optimum puts the larger helix
    # at level 1 (must-cross-lower-level makes the smaller one level 0)
    assert s == "[[[..((.]]]...))..", s
    assert ss[0] == 10 and ss[5] == 15


def test_ipknot_stacking_kills_isolated():
    L = 16
    p = np.zeros((L, L), np.float32)
    p[2, 13] = 0.9  # isolated pair, no neighbors
    ss, s, _score = ipknot.decode(p, [0.2])
    assert (ss < 0).all()
    assert s == "." * L


def test_ipknot_crossing_requirement():
    # a level-1-only candidate that crosses nothing must be dropped
    L = 20
    p = np.zeros((L, L), np.float32)
    for k in range(3):
        p[k, 12 - k] = 0.15  # below level-0 th 0.2, above level-1 th 1/9
    ss, s, _score = ipknot.decode(p, [0.2, 1 / 9.0])
    assert (ss < 0).all(), s


def _ss_from_pairs(L, pairs):
    ss = np.full(L, -1, dtype=np.int64)
    for i, j in pairs:
        ss[i] = j
    return ss


def test_decompose_plevel_three_mutually_crossing():
    # three 2-pair helices, each pair of helices crossing -> 3 colors
    pairs = [(0, 14), (1, 13), (4, 20), (5, 19), (8, 26), (9, 25)]
    ss = _ss_from_pairs(30, pairs)
    plevel = ipknot.decompose_plevel(ss)
    assert plevel[0] == plevel[1] == 0
    assert plevel[4] == plevel[5] == 1
    assert plevel[8] == plevel[9] == 2
    # only left ends are leveled after decomposition (src/ipknot.cpp:351-355)
    assert plevel[13] == -1 and plevel[19] == -1 and plevel[25] == -1


def test_decompose_plevel_nested_single_color():
    ss = _ss_from_pairs(12, [(0, 11), (1, 10), (3, 8)])
    plevel = ipknot.decompose_plevel(ss)
    assert plevel[0] == plevel[1] == plevel[3] == 0


def test_decompose_plevel_color_renumbering():
    # level counts decide final numbering: the color with more pairs becomes 0
    # one pair (0,6) crossing a 3-pair helix (2..4 with 12..10)
    ss = _ss_from_pairs(14, [(0, 6), (2, 12), (3, 11), (4, 10)])
    plevel = ipknot.decompose_plevel(ss)
    # vertex 0 has degree 3 (crosses all of helix B), colored first -> color 0;
    # helix B gets color 1; renumbering by count (3 > 1) swaps them
    assert plevel[2] == plevel[3] == plevel[4] == 0
    assert plevel[0] == 1


def test_ipknot_decode_non_levelwise():
    # without per-level planarity constraints, all positive pairs survive and
    # greedy coloring rebuilds the bracket levels
    L = 30
    p = np.zeros((L, L), np.float32)
    for i, j in [(0, 14), (1, 13), (4, 20), (5, 19), (8, 26), (9, 25)]:
        p[i, j] = 0.9
    ss, s, score = ipknot.decode(p, [0.2, 0.1, 0.05], levelwise=False)
    assert ss[0] == 14 and ss[4] == 20 and ss[8] == 26
    assert s == "((..[[..{{...))....]]....}}...", s


def _random_ipknot_instance(rng, L=24, th=(0.2, 1 / 9.0)):
    """Random sparse p plus a DD-style q: negative entries confined to a
    random `extra` (consensus-candidate) set, non-negative elsewhere — the
    invariant IPknotModel's column superset relies on."""
    p = np.float32(rng.random((L, L)) * (rng.random((L, L)) < 0.15))
    p = np.triu(p, 1)
    extra = (rng.random((L, L)) < 0.1) & (np.triu(np.ones((L, L), bool), 1))
    q = np.float32(np.abs(rng.normal(0, 0.05, (L, L))))
    neg = np.float32(-np.abs(rng.normal(0, 0.2, (L, L))))
    q = np.where(extra, neg, q)
    q = np.float32(np.triu(q, 1))
    return p, q, extra, list(th)


def test_ipknot_model_matches_decode_oracle():
    """IPknotModel (persistent HiGHS skeleton + cost/bound updates) solves
    the SAME ILP as the from-scratch decode() on every q, including q that
    activates extra (consensus-candidate) columns — the correctness claim
    behind using it inside the DD loop (dd.solve_by_dd_ipknot)."""
    w = np.float32(4.0)
    rng = np.random.default_rng(7)
    for trial in range(6):
        p, q, extra, th = _random_ipknot_instance(rng)
        model = ipknot.IPknotModel(p, th, w, extra=extra)
        for it in range(3):
            ss_m, str_m, sc_m = model.solve(q)
            ss_d, str_d, sc_d = ipknot.decode(p, th, w=w, q=q)
            # random continuous weights -> the optimum is a.s. unique
            assert abs(sc_m - sc_d) < 1e-6, (trial, it, sc_m, sc_d)
            np.testing.assert_array_equal(ss_m, ss_d)
            assert str_m == str_d
            # next DD-style q: drift the multipliers, keeping negatives
            # confined to the extra cells
            q = np.float32(q + rng.normal(0, 0.02, q.shape))
            q = np.where(extra, q, np.abs(q))
            q = np.float32(np.triu(q, 1))
