import numpy as np
import pytest

from dafs_tpu.ops import mccaskill
from tests import oracle_mccaskill


SEQS = [
    "GGGAAAACCC",        # simple stem-loop
    "GCGCUUCGGCGC",      # tetraloop candidate
    "GGCAGAUCUGCC",
    "AUAUAUAUAUAUAU",    # weak AU pairs, many structures
    "GGACUUCGGUCC",
]


@pytest.mark.parametrize("seq", SEQS)
def test_mccaskill_matches_enumeration(seq):
    want = oracle_mccaskill.exact_bpp(seq, bl=True)
    got = mccaskill.bp_posterior(seq, th=0.0, bl=True)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)


def test_mccaskill_probability_sanity():
    seq = "GGGGAAAACCCCAAAGGGGAAAACCCC"
    p = mccaskill.bp_posterior(seq, th=0.0)
    assert p.min() >= 0.0 and p.max() <= 1.0
    # rowwise total pairing probability <= 1
    tot = p.sum(axis=1) + p.sum(axis=0)
    assert tot.max() <= 1.0 + 1e-4


def test_mccaskill_threshold():
    p = mccaskill.bp_posterior("GGGAAAACCC", th=0.5)
    assert ((p == 0) | (p > 0.5)).all()
