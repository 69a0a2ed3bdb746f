"""Literal scalar re-expressions of the reference decoders (test oracles).

SparseNussinov (src/nussinov.cpp:207-298) and SparseNeedlemanWunsch
(src/needleman_wunsch.cpp:198-338) cell-by-cell, including candidate
iteration order and strictly-greater tie-breaking.
"""

from __future__ import annotations

import numpy as np

F = np.float32
LOWEST = np.finfo(np.float32).min


def sparse_nussinov(sm: np.ndarray):
    """Returns (score, ss) for score matrix sm (built by caller)."""
    L = sm.shape[0]
    dp = np.zeros((L, L), dtype=np.float32)
    tr = np.zeros((L, L), dtype=np.int64)
    bp: list[list[tuple[int, np.float32]]] = [[] for _ in range(L)]
    for l in range(1, L):
        for i in range(0, L - l):
            j = i + l
            v = F(0.0)
            t = 0
            if i + 1 < j:
                v = dp[i + 1, j]
                t = 1
            if i < j - 1 and v < dp[i, j - 1]:
                v = dp[i, j - 1]
                t = 2
            if i + 1 < j - 1:
                s = sm[i, j]
                if s > 0.0:
                    bp[j].append((i, F(dp[i + 1, j - 1] + s)))
                    if v < dp[i + 1, j - 1] + s:
                        v = F(dp[i + 1, j - 1] + s)
                        t = 3
            for k, s in bp[j]:
                if i < k:
                    if v < dp[i, k - 1] + s:
                        v = F(dp[i, k - 1] + s)
                        t = k - i + 3
            dp[i, j] = v
            tr[i, j] = t

    ss = np.full(L, -1, dtype=np.int64)
    st = [(0, L - 1)]
    while st:
        i, j = st.pop()
        t = tr[i, j]
        if t == 0:
            continue
        if t == 1:
            st.append((i + 1, j))
        elif t == 2:
            st.append((i, j - 1))
        elif t == 3:
            ss[i] = j
            st.append((i + 1, j - 1))
        else:
            k = i + t - 3
            st.append((i, k - 1))
            ss[k] = j
            st.append((k + 1, j - 1))
    return dp[0, L - 1], ss


def nw_envelope(p: np.ndarray, th: float):
    L1, L2 = p.shape
    env = np.zeros((L1 + 1, 2), dtype=np.int64)
    for i in range(1, L1 + 1):
        for k in range(1, L2 + 1):
            if p[i - 1, k - 1] - F(th) >= 0.0:
                env[i - 1, 0] = min(env[i - 1, 0], k - 1)
                env[i, 0] = k
                break
        if env[i, 0] == 0:
            env[i, 0] = env[i - 1, 0]
            env[i, 1] = env[i - 1, 1]
            continue
        for k in range(L2, 0, -1):
            if p[i - 1, k - 1] - F(th) >= 0.0:
                env[i - 1, 1] = max(env[i - 1, 1], k - 1)
                env[i, 1] = k
                break
    env[L1, 1] = L2
    v = L2
    for i in range(L1, 0, -1):
        v = min(v, env[i, 0])
        env[i, 0] = v
    v = 0
    for i in range(L1 + 1):
        v = max(v, env[i, 1])
        env[i, 1] = v
    for i in range(1, L1 + 1):
        if env[i - 1, 1] < env[i, 0]:
            env[i, 0] = env[i - 1, 1]
    return env


def sparse_nw(sm: np.ndarray, env: np.ndarray):
    """Returns (score, al) for cell-score matrix sm and envelope env."""
    L1, L2 = sm.shape
    dp = np.full((L1 + 1, L2 + 1), LOWEST, dtype=np.float32)
    tr = np.full((L1 + 1, L2 + 1), " ", dtype="U1")
    dp[0, 0] = 0.0
    for i in range(1, L1 + 1):
        dp[i, 0] = 0.0
        tr[i, 0] = "X"
    for k in range(1, L2 + 1):
        dp[0, k] = 0.0
        tr[0, k] = "Y"
    for i in range(1, L1 + 1):
        for k in range(env[i, 0], env[i, 1] + 1):
            if k == 0:
                continue
            v = F(dp[i - 1, k - 1] + sm[i - 1, k - 1])
            t = "M"
            if v < dp[i - 1, k]:
                v = dp[i - 1, k]
                t = "X"
            if v < dp[i, k - 1]:
                v = dp[i, k - 1]
                t = "Y"
            dp[i, k] = v
            tr[i, k] = t

    al = np.full(L1, -1, dtype=np.int64)
    i, k = L1, L2
    path = []
    while i > 0 or k > 0:
        path.append(tr[i, k])
        if tr[i, k] == "M":
            i -= 1
            k -= 1
        elif tr[i, k] == "X":
            i -= 1
        else:
            k -= 1
    path.reverse()
    i = k = 0
    for c in path:
        if c == "M":
            al[i] = k
            i += 1
            k += 1
        elif c == "X":
            al[i] = -1
            i += 1
        else:
            k += 1
    return dp[L1, L2], al
