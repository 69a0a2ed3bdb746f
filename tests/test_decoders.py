import numpy as np
import jax.numpy as jnp
import pytest

from dafs_tpu.ops import nussinov, nw
from tests import oracle_decoders as orc


def _random_bp_matrix(rng, L):
    """Sparse symmetric-ish upper-triangular base-pair probability matrix."""
    p = np.zeros((L, L), dtype=np.float32)
    n = rng.integers(L // 2, 2 * L)
    for _ in range(n):
        i = int(rng.integers(0, L - 3))
        j = int(rng.integers(i + 3, L))
        p[i, j] = rng.random()
    return p


@pytest.mark.parametrize("seed", range(5))
def test_sparse_nussinov_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(8, 40))
    p = _random_bp_matrix(rng, L)
    q = (rng.random((L, L)) * 0.2).astype(np.float32)
    w = np.float32(4.0)
    th = np.float32(0.2)

    sm = np.float32(w * (p - th) - q)
    want_score, want_ss = orc.sparse_nussinov(sm)
    got_score, got_ss = nussinov.decode(jnp.asarray(sm), L=L)
    assert np.allclose(float(got_score), want_score, atol=1e-5)
    np.testing.assert_array_equal(np.where(np.asarray(got_ss) < 0, -1, got_ss), want_ss)


@pytest.mark.parametrize("seed", range(5))
def test_sparse_nussinov_padded_equals_unpadded(seed):
    rng = np.random.default_rng(seed + 100)
    L = int(rng.integers(8, 30))
    Lpad = L + 17
    p = _random_bp_matrix(rng, L)
    w, th = np.float32(4.0), np.float32(0.2)
    sm = np.float32(w * (p - th))
    smp = np.full((Lpad, Lpad), np.float32(w * (0.0 - th)))
    smp[:L, :L] = sm
    s0, ss0 = nussinov.decode(jnp.asarray(sm), L=L)
    s1, ss1 = nussinov.decode(jnp.asarray(smp), jnp.int32(L), L=Lpad)
    assert float(s0) == float(s1)
    np.testing.assert_array_equal(np.asarray(ss0), np.asarray(ss1)[:L])


def _random_mp_matrix(rng, L1, L2):
    p = np.zeros((L1, L2), dtype=np.float32)
    # roughly-diagonal matches
    for i in range(L1):
        j = int(np.clip(round(i * L2 / L1 + rng.integers(-2, 3)), 0, L2 - 1))
        p[i, j] = 0.3 + 0.7 * rng.random()
        if rng.random() < 0.3:
            p[i, int(rng.integers(0, L2))] += 0.2
    return p


@pytest.mark.parametrize("seed", range(5))
def test_sparse_nw_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    L1 = int(rng.integers(6, 30))
    L2 = int(rng.integers(6, 30))
    p = _random_mp_matrix(rng, L1, L2)
    q = (rng.random((L1, L2)) * 0.1).astype(np.float32)
    th = np.float32(0.01)

    env = nw.envelope(p, th)
    env_o = orc.nw_envelope(p, th)
    np.testing.assert_array_equal(env, env_o)

    sm = np.float32(p - th + q)
    want_score, want_al = orc.sparse_nw(sm, env)
    got_score, got_al = nw.decode(
        jnp.asarray(sm),
        jnp.asarray(env[:, 0], jnp.int32),
        jnp.asarray(env[:, 1], jnp.int32),
        L1=L1,
        L2=L2,
    )
    assert np.allclose(float(got_score), want_score, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_al), want_al)


@pytest.mark.parametrize("seed", range(3))
def test_sparse_nw_padded_equals_unpadded(seed):
    rng = np.random.default_rng(seed + 50)
    L1 = int(rng.integers(6, 25))
    L2 = int(rng.integers(6, 25))
    p = _random_mp_matrix(rng, L1, L2)
    th = np.float32(0.01)
    env = nw.envelope(p, th)
    sm = np.float32(p - th)

    P1, P2 = L1 + 13, L2 + 9
    smp = np.full((P1, P2), np.float32(0.0 - th), dtype=np.float32)
    smp[:L1, :L2] = sm
    envf = np.zeros(P1 + 1, dtype=np.int32)
    envl = np.full(P1 + 1, P2, dtype=np.int32)
    envf[: L1 + 1] = env[:, 0]
    envl[: L1 + 1] = env[:, 1]

    s0, al0 = nw.decode(
        jnp.asarray(sm), jnp.asarray(env[:, 0], jnp.int32),
        jnp.asarray(env[:, 1], jnp.int32), L1=L1, L2=L2,
    )
    s1, al1 = nw.decode(
        jnp.asarray(smp), jnp.asarray(envf), jnp.asarray(envl),
        jnp.int32(L1), jnp.int32(L2), L1=P1, L2=P2,
    )
    assert float(s0) == float(s1)
    np.testing.assert_array_equal(np.asarray(al0), np.asarray(al1)[:L1])


@pytest.mark.parametrize("seed", range(4))
def test_nussinov_pallas_matches_lax(seed):
    """Pallas kernel (interpret mode) bit-identical to the lax.scan decode."""
    from dafs_tpu.ops import nussinov_pallas

    rng = np.random.default_rng(seed + 300)
    L = int(rng.integers(8, 48))
    p = _random_bp_matrix(rng, L)
    q = (rng.random((L, L)) * 0.2).astype(np.float32)
    sm = np.float32(4.0 * (p - 0.2) - q)
    s0, ss0 = nussinov.decode(jnp.asarray(sm), L=L)
    s1, ss1 = nussinov_pallas.decode(jnp.asarray(sm), L=L, interpret=True)
    assert float(s0) == float(s1)
    np.testing.assert_array_equal(np.asarray(ss0), np.asarray(ss1))


def test_nussinov_pallas_padded(seed=0):
    from dafs_tpu.ops import nussinov_pallas

    rng = np.random.default_rng(seed + 400)
    L, Lpad = 20, 37
    p = _random_bp_matrix(rng, L)
    sm = np.float32(4.0 * (p - 0.2))
    smp = np.full((Lpad, Lpad), np.float32(4.0 * (0.0 - 0.2)))
    smp[:L, :L] = sm
    s0, ss0 = nussinov.decode(jnp.asarray(sm), L=L)
    s1, ss1 = nussinov_pallas.decode(jnp.asarray(smp), jnp.int32(L), L=Lpad,
                                     interpret=True)
    assert float(s0) == float(s1)
    np.testing.assert_array_equal(np.asarray(ss0), np.asarray(ss1)[:L])


@pytest.mark.parametrize("seed", range(4))
def test_nw_pallas_matches_lax(seed):
    """NW Pallas kernel (interpret mode) bit-identical to the lax decode,
    including on bucket-padded shapes with dynamic true lengths."""
    from dafs_tpu.ops import nw_pallas

    rng = np.random.default_rng(seed + 500)
    L1 = int(rng.integers(6, 40))
    L2 = int(rng.integers(6, 40))
    p = _random_mp_matrix(rng, L1, L2)
    q = (rng.random((L1, L2)) * 0.1).astype(np.float32)
    th = np.float32(0.01)
    env = nw.envelope(p, th)
    sm = np.float32(p - th + q)

    s0, al0 = nw.decode(
        jnp.asarray(sm), jnp.asarray(env[:, 0], jnp.int32),
        jnp.asarray(env[:, 1], jnp.int32), L1=L1, L2=L2,
    )
    s1, al1 = nw_pallas.decode(
        jnp.asarray(sm), jnp.asarray(env[:, 0], jnp.int32),
        jnp.asarray(env[:, 1], jnp.int32), L1=L1, L2=L2, interpret=True,
    )
    assert float(s0) == float(s1)
    np.testing.assert_array_equal(np.asarray(al0), np.asarray(al1))

    # padded shapes + dynamic lengths (the DD call pattern)
    P1, P2 = L1 + 13, L2 + 29
    smp = np.full((P1, P2), np.float32(0.0 - th), dtype=np.float32)
    smp[:L1, :L2] = sm
    envf = np.zeros(P1 + 1, dtype=np.int32)
    envl = np.full(P1 + 1, P2, dtype=np.int32)
    envf[: L1 + 1] = env[:, 0]
    envl[: L1 + 1] = env[:, 1]
    s2, al2 = nw_pallas.decode(
        jnp.asarray(smp), jnp.asarray(envf), jnp.asarray(envl),
        jnp.int32(L1), jnp.int32(L2), L1=P1, L2=P2, interpret=True,
    )
    assert float(s0) == float(s2)
    np.testing.assert_array_equal(np.asarray(al0), np.asarray(al2)[:L1])
