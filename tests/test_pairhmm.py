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


def test_pallas_kernel_matches_scan_interpret():
    """The Pallas kernel (TPU fast path) must reproduce the lax.scan path.

    On the CPU test backend this runs in pallas interpret mode; on real TPU
    hardware the two are bitwise identical (validated on-chip)."""
    import numpy as np
    import jax.numpy as jnp
    from unittest import mock
    from jax.experimental import pallas as pl

    from dafs_tpu.models import probcons_params as PP
    from dafs_tpu.ops import pairhmm, pairhmm_pallas

    seqs1 = ["GGGAAACCCUUCGGGAAACCC", "GGCAAAGGCUUCGG"]
    seqs2 = ["GGCAAAGGCUUCGGAAAGCC", "GGGAAACCCUUCG"]
    l1max = l2max = 32
    B = len(seqs1)
    codes1 = np.zeros((B, l1max + 1), np.int32)
    codes2 = np.zeros((B, l2max + 1), np.int32)
    len1 = np.array([len(s) for s in seqs1], np.int32)
    len2 = np.array([len(s) for s in seqs2], np.int32)
    for b, s in enumerate(seqs1):
        codes1[b, 1 : len(s) + 1] = PP.encode(s)
    for b, s in enumerate(seqs2):
        codes2[b, 1 : len(s) + 1] = PP.encode(s)
    args = (
        jnp.asarray(codes1), jnp.asarray(len1),
        jnp.asarray(codes2), jnp.asarray(len2),
    )
    ref = np.asarray(
        pairhmm.forward_backward_posterior(*args, l1max=l1max, l2max=l2max)
    )
    orig_call = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = np.asarray(
            pairhmm_pallas.forward_backward_posterior(
                *args, l1max=l1max, l2max=l2max
            )
        )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # the wide-batch dispatcher scans 48-row sub-batches inside one
    # executable; exercise the scan plumbing with a tiny chunk size
    with mock.patch.object(pl, "pallas_call", interp_call), \
            mock.patch.object(pairhmm, "_PALLAS_CHUNK_B", 1):
        pairhmm._chunked_pallas_fbp.clear_cache()
        got_ch = np.asarray(
            pairhmm._chunked_pallas_fbp(*args, l1max=l1max, l2max=l2max)
        )
        pairhmm._chunked_pallas_fbp.clear_cache()
    np.testing.assert_allclose(got_ch, ref, atol=1e-5, rtol=1e-5)
