"""The gather-free fast kernel must agree with the reference-style kernel."""

import numpy as np
import pytest

from dafs_tpu.ops import mccaskill
from tests import oracle_mccaskill


@pytest.mark.parametrize("seq", ["GGGAAAACCC", "GCGCUUCGGCGC", "AUAUAUAUAUAUAU"])
def test_fast_matches_enumeration(seq):
    want = oracle_mccaskill.exact_bpp(seq, bl=True)
    got = mccaskill.bp_posterior_fast(seq, th=0.0)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)


def test_fast_matches_slow_kernel_real_seq():
    import dafs_tpu

    fa = dafs_tpu.load_fasta("/root/reference/examples/RF00005:0.fa")
    seq = fa[3].seq
    a = mccaskill.bp_posterior_fast(seq, 0.0)
    b = mccaskill.bp_posterior(seq, 0.0)
    np.testing.assert_allclose(a, b, atol=3e-5, rtol=3e-3)


def test_batched_fast_matches_serial():
    seqs = ["GGGAAAACCC", "GCGCUUCGGCGC", "AUAUAUAUAUAUAU"]
    batched = mccaskill.batch_bp_posteriors_fast(seqs, 0.0)
    for s, got in zip(seqs, batched):
        want = mccaskill.bp_posterior_fast(s, 0.0)
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_fast_constrained():
    seq = "GGGAAAACCC"
    con = "x" * 3 + "?" * 7
    a = mccaskill.bp_posterior_fast(seq, 0.0, constraint=con)
    b = mccaskill.bp_posterior(seq, 0.0, constraint=con)
    np.testing.assert_allclose(a, b, atol=3e-5, rtol=3e-3)
    assert (a[:3, :] == 0).all()
