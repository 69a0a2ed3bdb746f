"""Native C++ host kernels vs device kernels and reference-mirror oracles.

Three layers are pinned against each other here:
  - the production host decoders (dafs_tpu/native — independently written
    scalar forms of ops/nussinov.py / ops/nw.py),
  - the device kernels (ops/nussinov.py, ops/nw.py, consistency.py),
  - the disclosed reference-mirror oracles (/oracle, line-level mirrors of
    src/nussinov.cpp:207-298, src/needleman_wunsch.cpp:198-422,
    src/dafs.cpp:713-764, probconsRNA/ProbabilisticModel.h) — test-only.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
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


@pytest.mark.parametrize("seed", range(8))
def test_native_nussinov_matches_oracle(seed):
    """Production decoder == the reference-mirror oracle, bit for bit
    (score and traceback), on random sparse instances incl. DD-style
    multiplier perturbations."""
    rng = np.random.default_rng(seed + 100)
    L = int(rng.integers(16, 120))
    p = _random_bp_matrix(rng, L)
    q = np.float32(rng.normal(0, 0.05, (L, L)) * (rng.random((L, L)) < 0.1))
    sm = np.float32(np.float32(4.0) * (p - np.float32(0.2)) - q)
    s_n, ss_n = native.sparse_nussinov(sm)
    s_o, ss_o = oracle.sparse_nussinov(sm)
    np.testing.assert_array_equal(ss_n, ss_o)
    assert np.float32(s_n) == np.float32(s_o)


@pytest.mark.parametrize("seed", range(3))
def test_native_nw_matches_device(seed):
    rng = np.random.default_rng(seed + 10)
    L1, L2 = 48, 56
    p = _random_mp_matrix(rng, L1, L2)
    th = np.float32(0.01)
    env_n = oracle.nw_envelope(p, th)
    env_d = nw.envelope(p, th)
    np.testing.assert_array_equal(env_n, env_d)

    sm = np.float32(p - th)
    s_n, al_n = native.sparse_nw(sm, env_n)
    s_d, al_d = nw.decode(
        jnp.asarray(sm), jnp.asarray(env_n[:, 0], jnp.int32),
        jnp.asarray(env_n[:, 1], jnp.int32), L1=L1, L2=L2,
    )
    np.testing.assert_array_equal(al_n, np.asarray(al_d))


@pytest.mark.parametrize("seed", range(8))
def test_native_nw_matches_oracle(seed):
    """Production banded NW decoder == the reference-mirror oracle, bit for
    bit, on random envelopes incl. DD-style multiplier perturbations."""
    rng = np.random.default_rng(seed + 200)
    L1 = int(rng.integers(16, 100))
    L2 = int(rng.integers(16, 100))
    p = _random_mp_matrix(rng, L1, L2)
    q = np.float32(np.abs(rng.normal(0, 0.05, (L1, L2))) * (rng.random((L1, L2)) < 0.1))
    sm = np.float32(p - np.float32(0.01) + q)
    env = nw.envelope(p, np.float32(0.01))
    s_n, al_n = native.sparse_nw(sm, env)
    s_o, al_o = oracle.sparse_nw(sm, env)
    np.testing.assert_array_equal(al_n, al_o)
    assert np.float32(s_n) == np.float32(s_o)


@pytest.mark.parametrize("seed", range(3))
def test_oracle_similarity_matches_device(seed):
    rng = np.random.default_rng(seed + 20)
    L1, L2 = 40, 44
    p = _random_mp_matrix(rng, L1, L2)
    got = oracle.similarity(p)
    want = consistency.similarity(p, p > 0, L1, L2)
    assert abs(got - want) < 1e-6


def test_oracle_pairhmm_matches_scan_path():
    """The scalar C++ pair-HMM (measured-baseline + oracle) agrees with the
    batched wavefront kernel to float-reassociation level."""
    import numpy as np

    from dafs_tpu import fasta
    from dafs_tpu.ops import pairhmm

    fa = fasta.load_fasta("/root/reference/examples/RF00005:0.fa")
    for a, b in [(0, 1), (2, 7), (4, 9)]:
        s1, s2 = fa[a].seq, fa[b].seq
        _total, post = oracle.pairhmm_posterior(s1, s2)
        ref = pairhmm.batch_posteriors([s1], [s2], 0.0)[0]
        assert post.shape == ref.shape
        assert float(np.abs(post - ref).max()) < 1e-4
