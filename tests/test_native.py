"""Native C++ host kernels vs device kernels and Python oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from dafs_tpu import native
from dafs_tpu.ops import nussinov, nw
from dafs_tpu import consistency
from tests.test_decoders import _random_bp_matrix, _random_mp_matrix


@pytest.mark.parametrize("seed", range(3))
def test_native_nussinov_matches_device(seed):
    rng = np.random.default_rng(seed)
    L = 64
    p = _random_bp_matrix(rng, L)
    sm = np.float32(np.float32(4.0) * (p - np.float32(0.2)))
    s_n, ss_n = native.sparse_nussinov(sm)
    s_d, ss_d = nussinov.decode(jnp.asarray(sm), L=L)
    np.testing.assert_array_equal(ss_n, np.asarray(ss_d))
    assert abs(s_n - float(s_d)) < 1e-4


@pytest.mark.parametrize("seed", range(3))
def test_native_nw_matches_device(seed):
    rng = np.random.default_rng(seed + 10)
    L1, L2 = 48, 56
    p = _random_mp_matrix(rng, L1, L2)
    th = np.float32(0.01)
    env_n = native.nw_envelope(p, th)
    env_d = nw.envelope(p, th)
    np.testing.assert_array_equal(env_n, env_d)

    sm = np.float32(p - th)
    s_n, al_n = native.sparse_nw(sm, env_n)
    s_d, al_d = nw.decode(
        jnp.asarray(sm), jnp.asarray(env_n[:, 0], jnp.int32),
        jnp.asarray(env_n[:, 1], jnp.int32), L1=L1, L2=L2,
    )
    np.testing.assert_array_equal(al_n, np.asarray(al_d))


@pytest.mark.parametrize("seed", range(3))
def test_native_similarity_matches_device(seed):
    rng = np.random.default_rng(seed + 20)
    L1, L2 = 40, 44
    p = _random_mp_matrix(rng, L1, L2)
    got = native.similarity(p)
    want = consistency.similarity(p, p > 0, L1, L2)
    assert abs(got - want) < 1e-6


def test_native_pairhmm_matches_scan_path():
    """The scalar C++ pair-HMM (measured-baseline + oracle) agrees with the
    batched wavefront kernel to float-reassociation level."""
    import numpy as np

    from dafs_tpu import fasta, native
    from dafs_tpu.ops import pairhmm

    fa = fasta.load_fasta("/root/reference/examples/RF00005:0.fa")
    for a, b in [(0, 1), (2, 7), (4, 9)]:
        s1, s2 = fa[a].seq, fa[b].seq
        _total, post = native.pairhmm_posterior(s1, s2)
        ref = pairhmm.batch_posteriors([s1], [s2], 0.0)[0]
        assert post.shape == ref.shape
        assert float(np.abs(post - ref).max()) < 1e-4
