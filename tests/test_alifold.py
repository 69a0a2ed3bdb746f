import numpy as np
import pytest

from dafs_tpu.ops import alifold
from tests import oracle_alifold


CASES = [
    # identical sequences (conserved, pscore 0 everywhere pairable)
    ["GGGAAAACCC", "GGGAAAACCC", "GGGAAAACCC"],
    # compensatory mutation (CG->UA) plus one one-sided mutation
    ["GGCAAAAGCC", "GUCAAAAGAC", "GGCAAAAGCC"],
    # alignment with gaps
    ["GGGAAAACCC", "GG-AAAAC-C"],
    ["GCGCUUCGGCGC", "GCGC-UCGGCGC", "GCACUUCGGUGC"],
]


@pytest.mark.slow
@pytest.mark.parametrize("seqs", CASES)
def test_alifold_matches_enumeration(seqs):
    want = oracle_alifold.exact_consensus_bpp(seqs)
    got = alifold.consensus_bp(seqs, th=0.0)
    # the kernel zeroes below Vienna's 1e-6 plist cutoff
    want[want <= 1e-6] = 0.0
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_alifold_compensatory_boost():
    # covariance bonus: compensatory double mutations should give higher
    # consensus pair probability than the same pair in an identical-sequence
    # alignment of the weaker sequence set... sanity: probabilities valid.
    p = alifold.consensus_bp(["GGGAAAACCC", "CGGAAAACCG"], th=0.0)
    assert p.min() >= 0 and p.max() <= 1.0
    assert p[0, 9] > 0.5  # compensatory G-C / C-G pair at the outermost stem
