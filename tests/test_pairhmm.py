import numpy as np
import pytest

from dafs_tpu.ops import pairhmm
from tests import oracle_probcons


def _random_rna(rng, n):
    return "".join(rng.choice(list("ACGU"), size=n))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pairhmm_matches_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    seqs1, seqs2 = [], []
    for _ in range(4):
        seqs1.append(_random_rna(rng, int(rng.integers(5, 20))))
        seqs2.append(_random_rna(rng, int(rng.integers(5, 20))))

    got = pairhmm.batch_posteriors(seqs1, seqs2, threshold=0.0)
    for b, (s1, s2) in enumerate(zip(seqs1, seqs2)):
        want = oracle_probcons.posterior(s1, s2)[1:, 1:]
        np.testing.assert_allclose(got[b], want, atol=2e-5, rtol=2e-4)


def test_pairhmm_posterior_rowsums():
    # posteriors of a ~identical pair should be near-diagonal and <= 1
    s = "GGGAAACCCUUCGGGAAACCC"
    got = pairhmm.batch_posteriors([s], [s], threshold=0.0)[0]
    assert got.shape == (len(s), len(s))
    assert np.all(got <= 1.0 + 1e-6)
    assert np.diag(got).min() > 0.5
