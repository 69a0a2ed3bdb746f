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
