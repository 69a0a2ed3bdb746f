"""SparseNussinov MEA structure decoder on TPU (src/nussinov.cpp:207-298).

TPU-first reformulation: the reference's sequential cell loop with an
anchored candidate list ``bp[j]`` becomes a diagonal-wavefront `lax.scan`
over a dense score matrix plus an incrementally-built pair-value matrix
``m[k, j] = dp[k+1][j-1] + s(k,j)`` (only where ``s > 0``).  Tie-breaking
replicates the reference exactly: candidates are evaluated in the order
[down(i+1,j), left(i,j-1), pair(i,j), bifurcation k = j-3 .. i+1] and the
*first* maximum wins (the C++ replaces only on strictly-greater).

Traceback runs on-device as a `lax.while_loop` over an explicit stack and
yields the pairing vector ``ss`` (ss[i] = j or -1), exactly like the C++
stack traceback (src/nussinov.cpp:265-297).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = jnp.float32(-3e38)


@functools.partial(jax.jit, static_argnames=("L",))
def decode(sm, l=None, *, L):
    """MEA Nussinov decode of a precomputed score matrix.

    Args:
      sm: (L, L) float32, sm[i, j] = score of pairing i with j (upper
        triangle used); the caller builds ``w*(p-th)-q`` in reference float
        order.  Padding cells (i or j >= l) MUST score negative so no pair
        lands there (true whenever p=0, q=0 there and th > 0).
      l: dynamic true length (defaults to L).  DP cells in the real region
        never depend on padding cells, so bucket-padded shapes reuse
        compiles; the score and traceback use the true length.
      L: static padded length.
    Returns:
      (score, ss): score = dp[0, l-1]; ss (L,) int32 pairing vector, -1 for
      unpaired.
    """
    if l is None:
        l = L
    dp = jnp.zeros((L, L), jnp.float32)
    m = jnp.full((L, L), NEG, jnp.float32)  # pair-candidate values
    tr = jnp.zeros((L, L), jnp.int32)

    ii = jnp.arange(L)
    rr = jnp.arange(L + 3)  # candidate axis in priority order

    def diag_step(carry, l):
        dp, m, tr = carry
        jj = ii + l  # cell (i, i+l); invalid where jj >= L
        valid_i = jj < L
        jc = jnp.minimum(jj, L - 1)

        t1 = dp[jnp.minimum(ii + 1, L - 1), jc]           # dp[i+1][j]
        t2 = dp[ii, jnp.maximum(jc - 1, 0)]               # dp[i][j-1]
        s_ij = sm[ii, jc]
        pair = dp[jnp.minimum(ii + 1, L - 1), jnp.maximum(jc - 1, 0)] + s_ij
        pair_ok = (s_ij > 0.0) & (l >= 3)
        m_new = jnp.where(pair_ok & valid_i, pair, NEG)

        # bifurcation candidates: r >= 3 -> k = i + l - r, value
        # dp[i][k-1] + m[k][j]; valid for k in [i+1, j-3]
        k = ii[:, None] + l - rr[None, :]  # (L, L+3)
        k_ok = (rr[None, :] >= 3) & (k >= ii[:, None] + 1) & (k <= jj[:, None] - 3)
        kc = jnp.clip(k, 0, L - 1)
        bif = dp[ii[:, None], jnp.maximum(kc - 1, 0)] + m[kc, jc[:, None]]
        bif = jnp.where(k_ok, bif, NEG)

        cand = bif
        cand = cand.at[:, 0].set(jnp.where(l >= 2, t1, NEG))
        cand = cand.at[:, 1].set(jnp.where(l >= 2, t2, NEG))
        cand = cand.at[:, 2].set(jnp.where(pair_ok, pair, NEG))

        v = jnp.max(cand, axis=1)
        r_star = jnp.argmax(cand == v[:, None], axis=1)  # first max wins
        has_any = v > NEG
        v = jnp.where(has_any, v, 0.0)
        # C++ codes: 1=down, 2=left, 3=pair, k-i+3=bifurcation at k
        code = jnp.where(
            has_any,
            jnp.where(
                r_star == 0,
                1,
                jnp.where(r_star == 1, 2, jnp.where(r_star == 2, 3, l - r_star + 3)),
            ),
            0,
        )

        dp = dp.at[ii, jj].set(jnp.where(valid_i, v, 0.0), mode="drop")
        tr = tr.at[ii, jj].set(jnp.where(valid_i, code, 0), mode="drop")
        m = m.at[ii, jj].set(jnp.where(valid_i, m_new, NEG), mode="drop")
        return (dp, m, tr), None

    (dp, m, tr), _ = jax.lax.scan(diag_step, (dp, m, tr), jnp.arange(1, L))

    score = dp[0, l - 1]
    ss = _traceback(tr, l, L)
    return score, ss


def _traceback(tr, l, L):
    stack = jnp.zeros((2 * L + 4, 2), jnp.int32)
    stack = stack.at[0].set(jnp.stack([jnp.int32(0), jnp.int32(l - 1)]))
    ss0 = jnp.full((L,), -1, jnp.int32)

    def cond(state):
        _, sp, _ = state
        return sp > 0

    def body(state):
        stack, sp, ss = state
        top = stack[sp - 1]
        i, j = top[0], top[1]
        sp = sp - 1
        code = tr[i, j]

        def push(stack, sp, a, b):
            stack = stack.at[sp].set(jnp.stack([a, b]))
            return stack, sp + 1

        def c0(args):
            stack, sp, ss = args
            return stack, sp, ss

        def c1(args):
            stack, sp, ss = args
            stack, sp = push(stack, sp, i + 1, j)
            return stack, sp, ss

        def c2(args):
            stack, sp, ss = args
            stack, sp = push(stack, sp, i, j - 1)
            return stack, sp, ss

        def c3(args):
            stack, sp, ss = args
            ss = ss.at[i].set(j)
            stack, sp = push(stack, sp, i + 1, j - 1)
            return stack, sp, ss

        def cbif(args):
            stack, sp, ss = args
            k = i + code - 3
            ss = ss.at[k].set(j)
            stack, sp = push(stack, sp, i, k - 1)
            stack, sp = push(stack, sp, k + 1, j - 1)
            return stack, sp, ss

        stack, sp, ss = jax.lax.switch(
            jnp.minimum(code, 4), [c0, c1, c2, c3, cbif], (stack, sp, ss)
        )
        return stack, sp, ss

    _, _, ss = jax.lax.while_loop(cond, body, (stack, jnp.int32(1), ss0))
    return ss


def score_matrix(w, p, q, th):
    """sm[i][j] = w*(p[i][j]-th) - q[i][j] in reference float32 order
    (src/nussinov.cpp:236)."""
    w = jnp.float32(w)
    th = jnp.float32(th)
    return w * (p - th) - q


def score_matrix_nothr(p, th):
    """sm[i][j] = p[i][j] - th (final decode variant, src/nussinov.cpp:329)."""
    return p - jnp.float32(th)
