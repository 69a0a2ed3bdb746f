import numpy as np
import pytest

from dafs_tpu.ops import contrafold
from tests import oracle_contrafold


SEQS = [
    "GGGAAACCC",
    "GCAUCGGC",
    "AUGGCAAUGC",
    "CCGGAAUU",
]


@pytest.mark.parametrize("seq", SEQS)
def test_contrafold_matches_enumeration(seq):
    want = oracle_contrafold.exact_bpp(seq)
    got = contrafold.bp_posterior(seq, th=0.0)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_contrafold_real_trna_shape():
    import dafs_tpu

    fa = dafs_tpu.load_fasta("/root/reference/examples/RF00005:0.fa")
    p = contrafold.bp_posterior(fa[7].seq, th=0.01)
    assert p.shape == (73, 73)
    assert 0 <= p.min() and p.max() <= 1.0
    # acceptor stem should appear
    assert (p > 0.5).sum() >= 10


def test_contrafold_trna_snapshot():
    """Full-length (L~73) posterior snapshot: the enumeration oracles only
    exercise L <= 10 (single-branch split sizes u <= 8), so this pins the
    61-row window / lane-shift assembly of the gather-free kernel at real
    split sizes.  Recorded from an implementation cross-checked against the
    round-1 gather-based formulation (max |diff| 1.8e-6 over all 10 RF00005
    tRNAs); tolerance covers f32 reduction-order drift."""
    import dafs_tpu

    snap = np.load("tests/snapshots/contrafold_trna.npz")
    fa = dafs_tpu.load_fasta("/root/reference/examples/RF00005:0.fa")
    assert fa[0].seq == str(snap["s0"]) and fa[7].seq == str(snap["s1"])
    ps = contrafold.batch_bp_posteriors([fa[0].seq, fa[7].seq], 0.0)
    np.testing.assert_allclose(ps[0], snap["p0"], atol=5e-5)
    np.testing.assert_allclose(ps[1], snap["p1"], atol=5e-5)
