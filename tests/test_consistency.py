import numpy as np
import pytest

from dafs_tpu import consistency
from dafs_tpu.typedefs import CUTOFF

F = np.float32


def oracle_similarity(mp_sparse, L1, L2):
    """Literal calculate_similarity_score (src/dafs.cpp:713-764)."""
    dp = np.zeros((L1 + 1, L2 + 1), np.float32)
    tr = np.zeros((L1 + 1, L2 + 1), np.int64)
    for i in range(1, L1 + 1):
        j = 1
        for (jj, p) in mp_sparse[i - 1]:
            while j - 1 < jj:
                dp[i, j] = dp[i, j - 1]
                tr[i, j] = tr[i, j - 1] + 1
                if dp[i, j] < dp[i - 1, j]:
                    dp[i, j] = dp[i - 1, j]
                    tr[i, j] = tr[i - 1, j] + 1
                j += 1
            dp[i, j] = F(dp[i - 1, j - 1] + p)
            tr[i, j] = tr[i - 1, j - 1] + 1
            if dp[i, j] < dp[i, j - 1]:
                dp[i, j] = dp[i, j - 1]
                tr[i, j] = tr[i, j - 1] + 1
            if dp[i, j] < dp[i - 1, j]:
                dp[i, j] = dp[i - 1, j]
                tr[i, j] = tr[i - 1, j] + 1
            j += 1
        while j < L2 + 1:
            dp[i, j] = dp[i, j - 1]
            tr[i, j] = tr[i, j - 1] + 1
            if dp[i, j] < dp[i - 1, j]:
                dp[i, j] = dp[i - 1, j]
                tr[i, j] = tr[i - 1, j] + 1
            j += 1
    return dp[L1, L2] / tr[L1, L2]


def _sparse_from_dense(p):
    return [
        [(j, p[i, j]) for j in np.nonzero(p[i])[0]] for i in range(p.shape[0])
    ]


@pytest.mark.parametrize("seed", range(4))
def test_similarity_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    L1, L2 = int(rng.integers(10, 40)), int(rng.integers(10, 40))
    p = np.zeros((L1, L2), np.float32)
    for i in range(L1):
        j = int(np.clip(round(i * L2 / L1) + rng.integers(-2, 3), 0, L2 - 1))
        p[i, j] = 0.2 + 0.8 * rng.random()
        if rng.random() < 0.2:
            p[i, int(rng.integers(0, L2))] += 0.1
    want = oracle_similarity(_sparse_from_dense(p), L1, L2)
    got = consistency.similarity(p, p > 0, L1, L2)
    assert abs(got - want) < 1e-6, (got, want)


def oracle_relax_matching(mp, sim, lens, w_pct_a):
    """Literal relax_matching_probability (src/dafs.cpp:258-324)."""
    N = len(lens)
    out = np.zeros_like(mp)
    for x in range(N - 1):
        for y in range(x + 1, N):
            L1, L2 = lens[x], lens[y]
            post = np.zeros((L1, L2), np.float32)
            sum_w = F(0.0)
            for z in range(N):
                L3 = lens[z]
                w = F(sim[z, x] * sim[z, y])
                if w_pct_a < 0.0:
                    w = F(w * F(1.0 / N))
                elif z == x or z == y:
                    w = F(w * F((1.0 - w_pct_a) / 2))
                else:
                    w = F(w * F(w_pct_a / (N - 2)))
                sum_w = F(sum_w + w)
                for k in range(L3):
                    for i in np.nonzero(mp[z, x, k, :lens[x]])[0]:
                        for j in np.nonzero(mp[z, y, k, :lens[y]])[0]:
                            post[i, j] = F(
                                post[i, j] + mp[z, x, k, i] * mp[z, y, k, j] * w
                            )
            for i in range(L1):
                for j in range(L2):
                    v = F(post[i, j] / sum_w)
                    if v > CUTOFF:
                        out[x, y, i, j] = v
            out[y, x, : lens[y], : lens[x]] = out[x, y, : lens[x], : lens[y]].T
    for x in range(N):
        out[x, x][np.arange(lens[x]), np.arange(lens[x])] = 1.0
    return out


def test_relax_matching_matches_oracle():
    rng = np.random.default_rng(3)
    N = 4
    lens = [12, 14, 13, 12]
    L = max(lens)
    mp = np.zeros((N, N, L, L), np.float32)
    for x in range(N):
        mp[x, x][np.arange(lens[x]), np.arange(lens[x])] = 1.0
        for y in range(x + 1, N):
            for i in range(lens[x]):
                j = int(np.clip(round(i * lens[y] / lens[x]), 0, lens[y] - 1))
                mp[x, y, i, j] = 0.3 + 0.7 * rng.random()
            mp[y, x] = mp[x, y].T
    sim = np.ones((N, N), np.float32) * 0.8
    np.fill_diagonal(sim, 1.0)

    want = oracle_relax_matching(mp, sim, lens, 0.25)
    got = consistency.relax_matching_probability(mp, sim, lens, 0.25)
    np.testing.assert_allclose(got, want, atol=2e-6)


def oracle_relax_bp(bp, mp, sim, lens, w_pct_s):
    N = len(lens)
    out = np.zeros_like(bp)
    for x in range(N):
        L1 = lens[x]
        p = np.zeros((L1, L1), np.float32)
        sum_w = F(0.0)
        for y in range(N):
            w = F(sim[y, x])
            if w_pct_s < 0.0:
                w = F(w * F(1.0 / N))
            elif y == x:
                w = F(w * F(1.0 - w_pct_s))
            else:
                w = F(w * F(w_pct_s / (N - 1)))
            sum_w = F(sum_w + w)
            for k in range(lens[y]):
                for l in np.nonzero(bp[y, k])[0]:
                    for i in np.nonzero(mp[y, x, k])[0]:
                        for j in np.nonzero(mp[y, x, l])[0]:
                            if i < j:
                                p[i, j] = F(
                                    p[i, j]
                                    + bp[y, k, l] * mp[y, x, k, i] * mp[y, x, l, j] * w
                                )
        for i in range(L1 - 1):
            for j in range(i + 1, L1):
                v = F(p[i, j] / sum_w)
                if v > CUTOFF:
                    out[x, i, j] = v
    return out


def test_relax_bp_matches_oracle():
    rng = np.random.default_rng(5)
    N = 3
    lens = [12, 14, 13]
    L = max(lens)
    mp = np.zeros((N, N, L, L), np.float32)
    bp = np.zeros((N, L, L), np.float32)
    for x in range(N):
        mp[x, x][np.arange(lens[x]), np.arange(lens[x])] = 1.0
        for _ in range(6):
            i = int(rng.integers(0, lens[x] - 4))
            j = int(rng.integers(i + 3, lens[x]))
            bp[x, i, j] = 0.2 + 0.8 * rng.random()
        for y in range(x + 1, N):
            for i in range(lens[x]):
                j = int(np.clip(round(i * lens[y] / lens[x]), 0, lens[y] - 1))
                mp[x, y, i, j] = 0.3 + 0.7 * rng.random()
            mp[y, x] = mp[x, y].T
    sim = np.ones((N, N), np.float32) * 0.7
    np.fill_diagonal(sim, 1.0)

    want = oracle_relax_bp(bp, mp, sim, lens, 0.25)
    got = consistency.relax_basepairing_probability(bp, mp, sim, lens, 0.25)
    np.testing.assert_allclose(got, want, atol=2e-6)
