"""Pallas TPU kernel for the MEA Nussinov decode (src/nussinov.cpp:207-298).

Same computation as ops/nussinov.decode (the diagonal-wavefront lax.scan),
but the whole DP runs inside one Mosaic kernel with the state resident in
VMEM, removing the per-step HBM round-trips that dominate the lax path at
L ~ 300-400 (measured 4.6 ms/decode there; the DD loop runs 3 decodes x 600
iterations per merge, so this is the hottest kernel of the whole pipeline).

Layout strategy (Mosaic cannot vector-load/store at dynamic *lane* offsets;
dynamic *sublane* offsets are fine):

- ``DP[i, c] = dp(i, c)`` — start-major absolute coordinates.  The
  bifurcation term dp(i, k-1) is a static one-lane shift of the full block.
  The per-diagonal write dp(i, i+ld) hits lane i+ld of row i: the new
  diagonal vector is placed with one dynamic lane roll (pltpu.roll) and
  merged with an iota mask.
- ``M[j, k] = m(k, j)`` — end-major pair values.  The bifurcation term
  m(k, j=i+ld) for all (i, k) is the dynamic sublane window
  ``M[ld:ld+L]``.  Mosaic requires dynamic sublane offsets to be provably
  8-aligned, so the window is taken at ``a = 8*(ld//8)`` with height L+8
  and rotated down by the residue ``r = ld - a`` via a dynamic sublane
  roll; the write m(i, i+ld) lands on the r-shifted diagonal of the
  aligned window.
- Tie-breaking replicates ops/nussinov.py exactly: candidate priority
  down(i+1,j) > left(i,j-1) > pair > bifurcation with smallest span r >= 3
  (== largest split k), first strict max wins.

The traceback ALSO runs inside the kernel (same stack algorithm as
ops/nussinov._traceback, stack in SMEM, ss as a lane vector): as an XLA
while_loop it costs ~5us per pop (one fused micro-kernel launch each), i.e.
~3 ms at L=320 — 50x the DP kernel itself and the dominant cost of every
DD iteration (src/dafs.cpp:1087-1291 decodes 3 structures per iteration).
In-kernel the pops are hardware loop iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dafs_tpu.utils import aot

NEG = -3e38


def _round_up(n, m):
    return -(-n // m) * m


def _kernel(l_ref, sml_ref, score_ref, codes_ref, ss_ref, dp_ref, m_ref,
            vp_ref, vp2_ref, stack_ref, *, L, LP):
    f = jnp.float32
    neg = f(NEG)
    # dynamic-sublane-roll window height; Mosaic's dynamic_rotate needs the
    # rotated sublane dim to be a multiple of the f32 vreg sublane count (8)
    H = _round_up(L + 8, 8)

    codes_ref[:] = jnp.zeros((L, LP), jnp.int32)
    dp_ref[:] = jnp.zeros((L, LP), f)
    m_ref[:] = jnp.full((_round_up(L, 8) + H, LP), neg, f)
    vp_ref[:] = jnp.zeros((1, LP), f)
    vp2_ref[:] = jnp.zeros((1, LP), f)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LP), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (L, LP), 0)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (L, LP), 1)
    row_i8 = jax.lax.broadcasted_iota(jnp.int32, (H, LP), 0)
    col_k8 = jax.lax.broadcasted_iota(jnp.int32, (H, LP), 1)

    def shift_left(x):
        # value at lane i becomes x[i+1]; rightmost lane 0
        return jnp.concatenate([x[:, 1:], jnp.zeros((1, 1), f)], axis=1)

    def body(ld, _):
        prev = vp_ref[:]    # dp of diagonal ld-1 (lane i = dp(i, i+ld-1))
        prev2 = vp2_ref[:]  # dp of diagonal ld-2

        t1 = shift_left(prev)          # dp(i+1, j)
        t2 = prev                      # dp(i, j-1)
        dp_in = shift_left(prev2)      # dp(i+1, j-1)
        s_ij = sml_ref[pl.ds(ld, 1), :]
        valid_i = (lane + ld) <= (L - 1)
        pair_ok = (s_ij > 0.0) & (ld >= 3) & valid_i
        m_new = jnp.where(pair_ok, dp_in + s_ij, neg)

        # bifurcation over split k: dp(i, k-1) + m(k, j), i+1 <= k <= j-3
        # 8-aligned window + dynamic sublane roll (Mosaic alignment rule)
        a = (ld // 8) * 8
        r = ld - a
        mbig = m_ref[pl.ds(a, H), :]                        # rows a .. a+H-1
        # mwin[i, k] = M[ld+i, k] = mbig[r+i, k]
        mwin = pltpu.roll(mbig, H - r, 0)[:L]               # (L, LP): [i, k]
        dp_all = dp_ref[:]
        dp_shift = jnp.concatenate(
            [jnp.zeros((L, 1), f), dp_all[:, :-1]], axis=1
        )                                                    # [i, k] = dp(i, k-1)
        bmask = (col_k >= row_i + 1) & (col_k <= row_i + (ld - 3))
        cand_b = jnp.where(bmask, dp_shift + mwin, neg)
        bif_v = jnp.max(cand_b, axis=1, keepdims=True)       # (L, 1)
        # smallest span r == largest k wins ties
        k_star = jnp.max(
            jnp.where((cand_b == bif_v) & bmask, col_k, -1), axis=1, keepdims=True
        )
        # back to lane-i vectors: bif_v/k_star are (L, 1) columns; transpose
        bif_vr = jax.lax.transpose(bif_v, (1, 0))            # (1, L)
        k_starr = jax.lax.transpose(k_star, (1, 0))
        pad = LP - L
        if pad:
            bif_vr = jnp.concatenate([bif_vr, jnp.full((1, pad), neg, f)], axis=1)
            k_starr = jnp.concatenate(
                [k_starr, jnp.full((1, pad), -1, jnp.int32)], axis=1
            )

        gate12 = ld >= 2
        t1g = jnp.where(gate12, t1, neg)
        t2g = jnp.where(gate12, t2, neg)
        v = jnp.maximum(jnp.maximum(t1g, t2g), jnp.maximum(m_new, bif_vr))
        has_any = v > neg
        vout = jnp.where(has_any & valid_i, v, 0.0)
        # candidate priority: t1, t2, pair, bifurcation (first max wins)
        code = jnp.where(
            t1g == v, 1,
            jnp.where(
                t2g == v, 2,
                jnp.where(m_new == v, 3, (k_starr - lane) + 3),
            ),
        )
        code = jnp.where(valid_i & has_any, code, 0)
        codes_ref[pl.ds(ld - 1, 1), :] = code

        # state updates
        # M[j=i+ld, k=i] = m_new[i]: the r-shifted diagonal of the aligned
        # window (window row r+i, lane i)
        m_bcast8 = jnp.broadcast_to(m_new, (H, LP))
        m_ref[pl.ds(a, H), :] = jnp.where(
            (row_i8 - r) == col_k8, m_bcast8, mbig
        )
        # DP[i, i+ld] = vout[i]: roll the diagonal vector so lane c holds
        # vout[c-ld], then merge on the (c - r == ld) mask
        v_roll = pltpu.roll(vout, ld, 1)
        dmask = (col_k - row_i) == ld
        dp_ref[:] = jnp.where(dmask, jnp.broadcast_to(v_roll, (L, LP)), dp_ref[:])

        vp2_ref[:] = prev
        vp_ref[:] = vout
        return 0

    jax.lax.fori_loop(1, L, body, 0)

    lend = l_ref[0, 0]
    row0 = dp_ref[pl.ds(0, 1), :]
    score_ref[0, 0] = jnp.sum(jnp.where(lane == lend - 1, row0, 0.0))

    # ---- in-kernel traceback (mirrors ops/nussinov._traceback) ----------
    # stack of (i, j) segments in SMEM; each fori step pops at most one
    # entry (guarded no-op once the stack empties; total pops <= 2L)
    ss_ref[:] = jnp.full((1, LP), -1, jnp.int32)
    stack_ref[0, 0] = jnp.int32(0)
    stack_ref[0, 1] = lend - 1

    def tb_body(t, sp):
        i = stack_ref[jnp.maximum(sp - 1, 0), 0]
        j = stack_ref[jnp.maximum(sp - 1, 0), 1]
        dd = j - i
        crow = codes_ref[pl.ds(jnp.maximum(dd - 1, 0), 1), :]
        c = jnp.sum(jnp.where(lane == i, crow, 0))
        c = jnp.where((dd >= 1) & (sp > 0), c, 0)

        k = i + c - 3
        # pair record: code 3 marks (i, j); code >= 4 marks (k, j)
        tgt = jnp.where(c >= 4, k, i)
        mark = (c == 3) | (c >= 4)
        ss_ref[:] = jnp.where((lane == tgt) & mark, j, ss_ref[:])

        # pushes: c==1 -> (i+1, j); c==2 -> (i, j-1); c==3 -> (i+1, j-1);
        # c>=4 -> (i, k-1) then (k+1, j-1)
        a1 = jnp.where(c == 1, i + 1,
                       jnp.where(c == 2, i,
                                 jnp.where(c == 3, i + 1, i)))
        b1 = jnp.where(c == 1, j,
                       jnp.where(c == 2, j - 1,
                                 jnp.where(c == 3, j - 1, k - 1)))
        npush = jnp.where(c == 0, 0, jnp.where(c >= 4, 2, 1))
        sp_new = jnp.where(sp > 0, sp - 1 + npush, sp)

        @pl.when((sp > 0) & (npush >= 1))
        def _():
            stack_ref[sp - 1, 0] = a1
            stack_ref[sp - 1, 1] = b1

        @pl.when((sp > 0) & (npush == 2))
        def _():
            stack_ref[sp, 0] = k + 1
            stack_ref[sp, 1] = j - 1

        return sp_new

    jax.lax.fori_loop(0, 2 * L + 2, tb_body, jnp.int32(1))


@functools.partial(jax.jit, static_argnames=("L", "interpret"))
def _decode_pallas_ldiag(sm_l, l, *, L, interpret=False):
    """sm_l: (L, L) diagonal-major scores (row ld, lane i = score(i, i+ld)).

    Returns (score, codes) with codes in the same layout as
    nussinov._decode_ldiag_impl's scan output rows (codes[ld-1, i]).
    """
    LP = _round_up(L, 128)
    sml = jnp.zeros((L, LP), jnp.float32).at[:, :L].set(sm_l)
    l_arr = jnp.asarray(l, jnp.int32).reshape(1, 1)
    score, codes, ss = pl.pallas_call(
        functools.partial(_kernel, L=L, LP=LP),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, LP), jnp.int32),
            jax.ShapeDtypeStruct((1, LP), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, LP), jnp.float32),          # DP (start-major)
            # M (end-major): 8-aligned roll windows of height H
            pltpu.VMEM((_round_up(L, 8) + _round_up(L + 8, 8), LP), jnp.float32),
            pltpu.VMEM((1, LP), jnp.float32),      # dp diag ld-1
            pltpu.VMEM((1, LP), jnp.float32),      # dp diag ld-2
            pltpu.SMEM((2 * L + 4, 2), jnp.int32),  # traceback stack
        ],
        interpret=interpret,
    )(l_arr, sml)
    return score[0, 0], codes[:, :L], ss[0, :L]


def decode(sm, l=None, *, L, interpret=False):
    """Row-major Pallas decode; bit-identical to ops/nussinov.decode."""
    from dafs_tpu.ops import nussinov as _n

    if l is None:
        l = L
    sm_l = _n._to_ldiag_dev(sm, L)
    score, _codes, ss = _decode_pallas_ldiag(sm_l, l, L=L, interpret=interpret)
    return score, ss


# inline-traceable alias (jit-in-jit inlines; kept for call-site clarity)
decode_traced = decode
