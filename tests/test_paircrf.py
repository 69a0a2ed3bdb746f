import numpy as np
import pytest

from dafs_tpu.ops import paircrf
from tests import oracle_contralign


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_paircrf_matches_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    seqs1, seqs2 = [], []
    for _ in range(3):
        seqs1.append("".join(rng.choice(list("ACGU"), size=int(rng.integers(5, 18)))))
        seqs2.append("".join(rng.choice(list("ACGU"), size=int(rng.integers(5, 18)))))
    got = paircrf.batch_posteriors(seqs1, seqs2, threshold=0.0)
    for b, (s1, s2) in enumerate(zip(seqs1, seqs2)):
        want = oracle_contralign.posterior(s1, s2)[1:, 1:]
        np.testing.assert_allclose(got[b], want, atol=5e-5, rtol=5e-4)


def test_paircrf_identical_sequences():
    s = "GGGAAACCCUUCGG"
    p = paircrf.batch_posteriors([s], [s], 0.0)[0]
    assert p.shape == (len(s), len(s))
    assert np.diag(p).min() > 0.5
    assert p.max() <= 1.0
