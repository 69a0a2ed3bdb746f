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
