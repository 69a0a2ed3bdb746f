"""Oracle tests for driver features flagged untested in round 3:

- four-way PCT (scalar re-expression of src/dafs.cpp:377-444)
- bp-update constraint-string construction + re-averaging
  (src/dafs.cpp:609-711, both bracket levels, with injected fake models)
- constrained CONTRAfold (enumeration oracle mirroring
  InferenceEngine.ipp:1869-1903 allow_paired/allow_unpaired semantics)
- refinement determinism (glibc rand() replica: known seed-1 stream and
  the rand()%2 bipartition sequence of DAFS::refine, src/dafs.cpp:1539-1576)
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from dafs_tpu import consistency
from dafs_tpu.typedefs import CUTOFF, AlnRow
from dafs_tpu.utils.crand import GlibcRand

F = np.float32


# ---------------------------------------------------------------------------
# four-way PCT
# ---------------------------------------------------------------------------


def _sparse_rows(mat):
    """Dense (L1, L2) -> reference sparse rows [(col, val), ...] (>0)."""
    out = []
    for i in range(mat.shape[0]):
        cols = np.nonzero(mat[i])[0]
        out.append([(int(j), F(mat[i, j])) for j in cols])
    return out


def _fourway_oracle(mp, bp, lens, w):
    """Literal scalar re-expression of relax_fourway_consistency
    (src/dafs.cpp:377-444): sparse iteration with the sorted merge-join
    over l, f32 accumulation."""
    N = len(lens)
    out = np.zeros_like(mp)
    w = F(w)
    for x in range(N - 1):
        L1 = lens[x]
        for y in range(x + 1, N):
            L2 = lens[y]
            mpxy = _sparse_rows(mp[x, y, :L1, :L2])
            bpx = _sparse_rows(bp[x, :L1, :L1])
            bpy = _sparse_rows(bp[y, :L2, :L2])
            posterior = np.zeros((L1, L2), np.float32)
            for i in range(L1):
                for (k, p_ik) in mpxy[i]:
                    posterior[i, k] = F(posterior[i, k] + F(p_ik * F(1.0 - w)))
                    for (j, p_ij) in bpx[i]:
                        # merge-join over l: mp[x][y][j] x bp[y][k]
                        l1 = 0
                        l2 = 0
                        row_j = mpxy[j]
                        row_k = bpy[k]
                        while l1 < len(row_j) and l2 < len(row_k):
                            if row_j[l1][0] < row_k[l2][0]:
                                l1 += 1
                            elif row_j[l1][0] > row_k[l2][0]:
                                l2 += 1
                            else:
                                l = row_j[l1][0]
                                p_jl = row_j[l1][1]
                                p_kl = row_k[l2][1]
                                posterior[i, k] = F(
                                    posterior[i, k] + F(p_ij * p_kl * p_jl * w)
                                )
                                posterior[j, l] = F(
                                    posterior[j, l] + F(p_ij * p_kl * p_ik * w)
                                )
                                l1 += 1
                                l2 += 1
            posterior[posterior <= CUTOFF] = 0.0
            out[x, y, :L1, :L2] = posterior
            out[y, x, :L2, :L1] = posterior.T
    for x in range(N):
        out[x, x][np.arange(lens[x]), np.arange(lens[x])] = 1.0
    return out


def _random_family(seed, N=4, L=16):
    rng = np.random.default_rng(seed)
    lens = [int(v) for v in rng.integers(L - 5, L + 1, size=N)]
    P = max(lens)
    mp = np.zeros((N, N, P, P), np.float32)
    bp = np.zeros((N, P, P), np.float32)
    for x in range(N):
        # sparse upper-tri bp rows
        m = rng.random((lens[x], lens[x])).astype(np.float32)
        m = np.triu(m, 1)
        m[m < 0.75] = 0.0  # sparse
        bp[x, : lens[x], : lens[x]] = m
        mp[x, x][np.arange(lens[x]), np.arange(lens[x])] = 1.0
    for x in range(N - 1):
        for y in range(x + 1, N):
            m = rng.random((lens[x], lens[y])).astype(np.float32)
            m[m < 0.6] = 0.0
            mp[x, y, : lens[x], : lens[y]] = m
            mp[y, x, : lens[y], : lens[x]] = m.T
    return mp, bp, lens


@pytest.mark.parametrize("seed", [0, 1])
def test_fourway_pct_matches_scalar_oracle(seed):
    mp, bp, lens = _random_family(seed)
    w = 0.3
    got = consistency.relax_fourway_consistency(mp, bp, lens, w)
    want = _fourway_oracle(mp, bp, lens, w)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-7)
    # the transform must actually do something on this data
    assert np.abs(got - mp).max() > 1e-3


def test_fourway_pct_detects_injected_bug():
    """The oracle comparison must fail loudly under a perturbed kernel."""
    mp, bp, lens = _random_family(2)
    got = consistency.relax_fourway_consistency(mp, bp, lens, 0.3)
    bad = consistency.relax_fourway_consistency(mp, bp, lens, 0.3001)
    assert np.abs(got - bad).max() > 1e-6


# ---------------------------------------------------------------------------
# bp-update constraint construction + re-averaging
# ---------------------------------------------------------------------------


def _det_matrix(key: str, L: int, upper=True) -> np.ndarray:
    """Deterministic pseudo-random (L, L) f32 matrix from a string key."""
    rng = np.random.default_rng(zlib.crc32(key.encode()) & 0xFFFFFFFF)
    m = rng.random((L, L)).astype(np.float32) * 0.5
    if upper:
        m = np.triu(m, 1)
    return m


class _FakeSeq:
    def __init__(self, name, seq):
        self.name = name
        self.seq = seq

    def __len__(self):
        return len(self.seq)


class _FakeFold:
    """Fake fold model: the posterior is a pure function of (seq, con)."""

    def __init__(self):
        self.calls = []

    def batch_bp_posteriors(self, seqs, constraints=None):
        out = []
        for s, c in zip(seqs, constraints):
            self.calls.append((s, c))
            out.append(_det_matrix(f"fold|{s}|{c}", len(s)))
        return out


class _FakeAlifold:
    def __init__(self):
        self.calls = []

    def consensus_bp(self, aln, fa, constraint=None):
        key = "|".join(
            f"{r.seq_id}:{''.join('1' if b else '0' for b in r.mask)}"
            for r in aln
        )
        self.calls.append(constraint)
        L = len(aln[0].mask)
        return _det_matrix(f"ali|{key}|{constraint}", L)


def _bp_update_oracle(fa, aln, ss, sstr, th_s, use_alifold):
    """Scalar re-expression of update_basepairing_probability
    (src/dafs.cpp:609-711) against the same fake models."""
    left_brackets = "([{<ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    L = len(aln[0].mask)
    N = len(aln)
    plevel = len(th_s)
    p = np.zeros((L, L), np.float32)
    for row in aln:
        s = row.seq_id
        seq = fa[s].seq
        idx = [i for i in range(L) if row.mask[i]]
        rev = {i: j for j, i in enumerate(idx)}
        for plv in range(plevel):
            con = ["?"] * len(seq)
            for i in range(L):
                if ss[i] != -1 and i in rev and int(ss[i]) in rev:
                    if sstr[i] == left_brackets[plv]:
                        con[rev[i]] = "("
                        con[rev[int(ss[i])]] = ")"
                    else:
                        con[rev[i]] = con[rev[int(ss[i])]] = "."
            bp = _det_matrix(f"fold|{seq}|{''.join(con)}", len(seq))
            for i in range(len(seq)):
                for j in range(len(seq)):
                    if bp[i, j] > 0:
                        p[idx[i], idx[j]] = F(
                            p[idx[i], idx[j]] + F(bp[i, j] / F(N))
                        )
    if use_alifold:
        key = "|".join(
            f"{r.seq_id}:{''.join('1' if b else '0' for b in r.mask)}"
            for r in aln
        )
        for plv in range(plevel):
            con = ["?"] * L
            for i in range(L):
                if ss[i] != -1:
                    if sstr[i] == left_brackets[plv]:
                        con[i] = "("
                        con[int(ss[i])] = ")"
                    else:
                        con[i] = con[int(ss[i])] = "."
            p = np.float32(p + _det_matrix(f"ali|{key}|{''.join(con)}", L))
        iu = np.triu_indices(L, 1)
        p[iu] = np.float32(p[iu] / F(2.0))
    p[np.tril_indices(L, 0)] = 0.0
    p[p <= CUTOFF] = 0.0
    return p


def _mk_dafs(fa, th_s, use_alifold=True):
    from dafs_tpu.pipeline import Dafs, Options

    o = Options(th_s=tuple(th_s))
    d = Dafs(align_model=None, fold_model=_FakeFold(), opts=o,
             alifold_model=_FakeAlifold() if use_alifold else None)
    d.fa = fa
    return d


@pytest.mark.parametrize("use_alifold", [True, False])
def test_bp_update_matches_scalar_oracle(use_alifold):
    # 3 sequences, alignment with gap columns, a 2-level pseudoknotted
    # prediction so BOTH bracket levels exercise distinct constraints
    fa = [
        _FakeSeq("a", "GGGAACCCUU"),
        _FakeSeq("b", "GGAAACCCU"),
        _FakeSeq("c", "GGGAACCCU"),
    ]
    masks = [
        np.array([1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1], bool),
        np.array([1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0], bool),
        np.array([0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1], bool),
    ]
    aln = [AlnRow(i, m) for i, m in enumerate(masks)]
    L = 11
    # prediction: level-0 pairs (0,9), (1,8); level-1 pair (3,10)
    ss = np.full(L, -1, np.int64)
    ss[0], ss[1], ss[3] = 9, 8, 10
    sstr = "((.[....))]"
    th_s = (0.2, 1 / 9.0)

    d = _mk_dafs(fa, th_s, use_alifold)
    got = d._update_bp(None, ss, sstr, aln, use_alifold)
    want = _bp_update_oracle(fa, aln, ss, sstr, th_s, use_alifold)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    # the constraint strings must reflect the bracket levels: level 0 pins
    # (0,9)/(1,8) as '(' ')' and dots the level-1 pair; level 1 vice versa
    con_by_call = [c for _, c in d.s_model.calls]
    assert len(con_by_call) == 6  # 3 seqs x 2 levels
    lvl0_a = con_by_call[0]
    # seq a: alignment cols 0..4 -> seq pos 0..4, col 5 is a gap for a,
    # cols 6..10 -> seq pos 5..9; pair (0,9)->( ,) at seq pos 0 and 8
    assert lvl0_a[0] == "(" and lvl0_a[8] == ")"
    assert lvl0_a[1] == "(" and lvl0_a[7] == ")"
    assert lvl0_a[3] == "." and lvl0_a[9] == "."  # level-1 pair dotted
    lvl1_a = con_by_call[1]
    assert lvl1_a[3] == "(" and lvl1_a[9] == ")"
    assert lvl1_a[0] == "." and lvl1_a[8] == "."
    if use_alifold:
        ali_cons = d.alifold.calls
        assert len(ali_cons) == 2
        assert ali_cons[0][0] == "(" and ali_cons[0][9] == ")"
        assert ali_cons[1][3] == "(" and ali_cons[1][10] == ")"


def test_bp_update_skips_pairs_lost_to_gaps():
    """A pair whose partner column is a gap for a sequence must leave that
    sequence's constraint untouched (the rev[ss[i]] != -1u guard)."""
    fa = [_FakeSeq("a", "GGAACC"), _FakeSeq("b", "GGAACCU")]
    masks = [
        np.array([1, 1, 1, 1, 1, 1, 0], bool),
        np.array([1, 1, 1, 1, 1, 1, 1], bool),
    ]
    aln = [AlnRow(0, masks[0]), AlnRow(1, masks[1])]
    ss = np.full(7, -1, np.int64)
    ss[0] = 6  # partner column 6 is a gap for sequence a
    sstr = "(.....)"
    d = _mk_dafs(fa, (0.2,), use_alifold=False)
    got = d._update_bp(None, ss, sstr, aln, False)
    want = _bp_update_oracle(fa, aln, ss, sstr, (0.2,), False)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    con_a = d.s_model.calls[0][1]
    assert con_a == "??????"  # untouched: no pair lands in sequence a
    con_b = d.s_model.calls[1][1]
    assert con_b[0] == "(" and con_b[6] == ")"


# ---------------------------------------------------------------------------
# constrained CONTRAfold vs enumeration oracle
# ---------------------------------------------------------------------------


def _constrained_exact_bpp(seq: str, constraint: str):
    """Enumeration oracle under UseConstraints semantics
    (InferenceEngine.ipp:1869-1903): '(' ')' = must pair with the matched
    partner (and may not be unpaired), '.' = forced unpaired, '?' = free."""
    from dafs_tpu.ops import contrafold_params as CF
    from tests.oracle_contrafold import enumerate_structures, structure_score

    t = {k: np.asarray(v, np.float64) for k, v in CF.tables().items()}
    n = len(seq)
    s = np.full(n + 2, 4, dtype=np.int32)
    s[1 : n + 1] = CF.encode(seq)
    allow = CF.COMPLEMENTARY[s[:, None], s[None, :]].copy()

    # apply the constraint to allow_paired exactly as the reference does
    mapping = {}
    stack = []
    for k, ch in enumerate(constraint):
        pos = k + 1
        if ch == ".":
            mapping[pos] = 0  # UNPAIRED
        elif ch == "(":
            stack.append(pos)
        elif ch == ")":
            a = stack.pop()
            mapping[a] = pos
            mapping[pos] = a
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            mi = mapping.get(i, -1)
            mj = mapping.get(j, -1)
            if not ((mi == -1 or mi == j) and (mj == -1 or mj == i)):
                allow[i, j] = False
                allow[j, i] = False

    must_pair = {p for p, m in mapping.items() if m > 0}
    structures = enumerate_structures(n, allow)
    kept = []
    for st in structures:
        paired = {a for (a, b) in st} | {b for (a, b) in st}
        if must_pair <= paired:
            kept.append(st)
    ws = np.array([structure_score(st, s, t, n) for st in kept])
    m = ws.max()
    w = np.exp(ws - m)
    Z = w.sum()
    out = np.zeros((n, n))
    for st, wi in zip(kept, w):
        for (a, b) in st:
            out[a - 1, b - 1] += wi
    return out / Z


@pytest.mark.parametrize(
    "seq,con",
    [
        ("GGGAAACCC", "((?????))"),   # forced outer pairs
        ("GGGAAACCC", "??..?????"),   # forced unpaired in the loop
        ("GCAUCGAUGC", "(????????)"),  # forced long-range pair
        ("GGCGAAACGCC", "?.?????????"),  # mixed free/unpaired
    ],
)
def test_constrained_contrafold_matches_enumeration(seq, con):
    from dafs_tpu.ops import contrafold

    got = contrafold.bp_posterior(seq, 0.0, constraint=con)
    want = _constrained_exact_bpp(seq, con)
    np.testing.assert_allclose(got, np.float32(want), rtol=5e-5, atol=5e-6)
    # and the constraint must have bitten vs the unconstrained ensemble
    free = contrafold.bp_posterior(seq, 0.0)
    assert np.abs(np.float64(got) - np.float64(free)).max() > 1e-3


def test_constrained_contrafold_forced_pair_is_certain():
    """A forced pair must carry posterior 1 (every surviving structure
    contains it)."""
    from dafs_tpu.ops import contrafold

    got = contrafold.bp_posterior("GGGAAACCC", 0.0, constraint="(???????)")
    assert got[0, 8] == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# refinement determinism
# ---------------------------------------------------------------------------


def test_glibc_rand_known_stream():
    """glibc rand() with no srand = seed 1; first values are well known."""
    r = GlibcRand()
    got = [r.rand() for _ in range(10)]
    assert got == [
        1804289383, 846930886, 1681692777, 1714636915, 1957747793,
        424238335, 719885386, 1649760492, 596516649, 1189641421,
    ]


def test_refine_bipartition_sequence():
    """DAFS::refine consumes rand()%2 per sequence (src/dafs.cpp:1546-1551);
    fixed stream -> fixed bipartitions, and all-gap columns are stripped."""
    from dafs_tpu.pipeline import Dafs, Options

    fa = [_FakeSeq(c, "GGAACC") for c in "abcd"]
    d = Dafs(align_model=None, fold_model=None, opts=Options())
    d.fa = fa
    captured = []

    def fake_merge(a1, a2):
        captured.append(([r.seq_id for r in a1], [r.seq_id for r in a2],
                         [r.mask.copy() for r in a1 + a2]))
        return 1.0, None, a1 + a2

    d._align_alignments = fake_merge
    masks = np.ones((4, 8), bool)
    masks[0, 3] = masks[1, 3] = masks[2, 3] = masks[3, 3] = True
    # give group-dependent all-gap columns: column 7 is gapped for seqs 1
    masks[1, 7] = False
    aln = [AlnRow(i, masks[i]) for i in range(4)]
    d._refine(None, aln)
    d._refine(None, aln)
    # glibc stream %2: 1,0,1,1 -> groups [1], [0,2,3]; then 1,1,0,0 ->
    # groups [2,3], [0,1]
    assert captured[0][0] == [1] and captured[0][1] == [0, 2, 3]
    assert captured[1][0] == [2, 3] and captured[1][1] == [0, 1]
    # group [1] drops its all-gap column 7 -> mask length 7
    assert len(captured[0][2][0]) == 7
    # second call: group [0,1] keeps column 7 (seq 0 occupies it)
    assert len(captured[1][2][2]) == 8
