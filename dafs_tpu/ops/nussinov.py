"""SparseNussinov MEA structure decoder on TPU (src/nussinov.cpp:207-298).

TPU-first reformulation: the reference's sequential cell loop with an
anchored candidate list ``bp[j]`` becomes a diagonal-wavefront `lax.scan`.
Tie-breaking replicates the reference exactly: candidates are evaluated in
the order [down(i+1,j), left(i,j-1), pair(i,j), bifurcation k = j-3 .. i+1]
and the *first* maximum wins (the C++ replaces only on strictly-greater).

Gather-free on TPU: scores arrive in LEFT-DIAGONAL layout (sm_l[dd, i] =
score of pair (i, i+dd)); the DP carries a top-aligned diagonal buffer (so
the bifurcation candidates' dp terms are one fixed-size dynamic slice) and a
right-endpoint-indexed pair-value buffer MR (so the whole diagonal's
candidate list is one dynamic column slice).  Traceback codes are emitted
as scan outputs in diagonal layout and chased by an on-device stack loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.utils import aot

# numpy, not jnp: module-level jnp constants are captured device buffers
# and trigger the relay's ~28 ms-per-dispatch mode (see ops/logspace.py)
NEG = np.float32(-3e38)


def to_ldiag(sm: np.ndarray) -> np.ndarray:
    """Host helper: row-major (L, L) -> left-diagonal layout (L, L)."""
    L = sm.shape[0]
    out = np.zeros((L, L), sm.dtype)
    for dd in range(L):
        out[dd, : L - dd] = np.diagonal(sm, offset=dd)
    return out


def _decode_ldiag_impl(sm_l, l, *, L):
    """MEA Nussinov decode; sm_l[dd, i] = score of pairing (i, i+dd).

    Padding cells (i or i+dd >= l) must score <= 0 so no pair lands there.
    Returns (score, ss) with ss (L,) int32, -1 = unpaired.
    """
    ii = jnp.arange(L)

    # height 3L: rows [0, 2L) hold spans (2L-1-row); rows [2L, 3L) are
    # zero padding so the L-row candidate window never clamps
    DPR = jnp.zeros((3 * L, L), jnp.float32)  # row (2L-1-dd) = dp(i, i+dd)
    MR = jnp.full((L + 1, 2 * L + 2), NEG, jnp.float32)

    def diag_step(carry, xs):
        DPR, MR, prev = carry
        ld, s_ij = xs
        jj = ii + ld
        valid_i = jj < L

        t1 = jnp.concatenate([prev[1:], jnp.zeros(1, jnp.float32)])
        t2 = prev
        dm2 = jax.lax.dynamic_slice(DPR, (2 * L - 1 - (ld - 2), 0), (1, L))[0]
        dp_in = jnp.concatenate([dm2[1:], jnp.zeros(1, jnp.float32)])
        pair_ok = (s_ij > 0.0) & (ld >= 3) & valid_i
        m_new = jnp.where(pair_ok, dp_in + s_ij, NEG)

        # bifurcation candidates r = 3..ld-1
        DProws = jax.lax.dynamic_slice(DPR, (2 * L - ld, 0), (L, L))
        # row q of DProws = span (ld - q - 1); candidate r needs span ld-r-1 -> q = r
        MRcols = jax.lax.dynamic_slice(MR, (0, ld), (L + 1, L))[:L]
        cand_bif = DProws + MRcols
        rr = jnp.arange(L)[:, None]
        cand_bif = jnp.where((rr >= 3) & (rr <= ld - 1), cand_bif, NEG)

        cand = jnp.concatenate(
            [
                jnp.where(ld >= 2, t1, NEG)[None, :],
                jnp.where(ld >= 2, t2, NEG)[None, :],
                m_new[None, :],
                cand_bif[3:],
            ],
            axis=0,
        )
        v = jnp.max(cand, axis=0)
        r_star = jnp.argmax(cand == v[None, :], axis=0)
        has_any = v > NEG
        v = jnp.where(has_any & valid_i, v, 0.0)
        code = jnp.where(
            has_any,
            jnp.where(
                r_star == 0,
                1,
                jnp.where(r_star == 1, 2, jnp.where(r_star == 2, 3, ld - r_star + 3)),
            ),
            0,
        )
        code = jnp.where(valid_i, code, 0)

        DPR = jax.lax.dynamic_update_slice(DPR, v[None, :], (2 * L - 1 - ld, 0))
        MR = jax.lax.dynamic_update_slice(MR, m_new[None, :], (ld, ld))
        return (DPR, MR, v), code

    DPR = jax.lax.dynamic_update_slice(
        DPR, jnp.zeros((1, L), jnp.float32), (2 * L - 1, 0)
    )
    (DPR, MR, _), codes = jax.lax.scan(
        diag_step,
        (DPR, MR, jnp.zeros((L,), jnp.float32)),
        (jnp.arange(1, L), sm_l[1:L]),
    )
    # codes: (L-1, L), row ld-1 holds the codes of diagonal ld

    score = jax.lax.dynamic_slice(DPR, (2 * L - 1 - (l - 1), 0), (1, 1))[0, 0]
    ss = _traceback(codes, l, L)
    return score, ss


@aot.persistent_jit(static_argnames=("L",))
def decode_ldiag(sm_l, l=None, *, L):
    if l is None:
        l = L
    return _decode_ldiag_impl(sm_l, l, L=L)


def _to_ldiag_dev(sm, L):
    dd_g = jnp.arange(L)[:, None]
    colg = jnp.clip(jnp.arange(L)[None, :] + dd_g, 0, L - 1)
    inb = (jnp.arange(L)[None, :] + dd_g) <= (L - 1)
    return jnp.where(inb, sm[jnp.arange(L)[None, :], colg], NEG)


@aot.persistent_jit(static_argnames=("L",))
def decode(sm, l=None, *, L):
    """Row-major convenience wrapper (converts layout on device, once).

    Dispatches to the Pallas kernel on TPU (in-kernel traceback), the
    lax.scan path elsewhere — both bit-identical (tests/test_decoders.py)."""
    if l is None:
        l = L
    return decode_traced(sm, l, L=L)


# NOTE: a vmapped batched decode was tried for the DD loop's x/y subproblems
# and measured SLOWER than two sequential calls (14ms vs 9ms at L=384): the
# vmapped dynamic-slice scan and switch-based traceback lower poorly on TPU.
# The wavefront cost is per-step HBM latency; the fix is the Pallas kernel
# (ops/nussinov_pallas.py, VMEM-resident DP; 1.3-3.5x at L=96-384).


def decode_traced(sm, l, *, L):
    """Backend-dispatched decode for use INSIDE an enclosing jit trace
    (e.g. the DD while_loop body): Pallas kernel on TPU, lax.scan elsewhere.
    Both paths are bit-identical (tests/test_decoders.py).  Set
    DAFS_TPU_NUSSINOV_PALLAS=0 to force the lax path (perf ablation)."""
    import os

    use_pallas = os.environ.get("DAFS_TPU_NUSSINOV_PALLAS", "1") != "0"
    if use_pallas and jax.default_backend() == "tpu":
        from dafs_tpu.ops import nussinov_pallas

        return nussinov_pallas.decode_traced(sm, l, L=L)
    return _decode_ldiag_impl(_to_ldiag_dev(sm, L), l, L=L)


def _traceback(codes, l, L):
    stack = jnp.zeros((2 * L + 4, 2), jnp.int32)
    stack = stack.at[0].set(jnp.stack([jnp.int32(0), jnp.int32(l - 1)]))
    ss0 = jnp.full((L,), -1, jnp.int32)

    def tr_of(i, j):
        return jnp.where(j > i, codes[jnp.maximum(j - i - 1, 0), i], 0)

    def cond(state):
        _, sp, _ = state
        return sp > 0

    def body(state):
        stack, sp, ss = state
        top = stack[sp - 1]
        i, j = top[0], top[1]
        sp = sp - 1
        code = tr_of(i, j)

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
