"""Pallas TPU kernel for the MEA Nussinov decode (src/nussinov.cpp:207-298).

Same computation as ops/nussinov.decode (the diagonal-wavefront lax.scan),
but the whole DP runs inside one Mosaic kernel with the state resident in
VMEM, and — new in round 5 — **k-diagonal blocking**: each fori step
processes KB=4 anti-diagonals.  With KB <= 4 every bifurcation split
(i,k-1)+(k,j) of a diagonal in the block falls into exactly one of two
cases, both cheap:

- *stale*: both parts predate the block.  dp(i,k-1) comes from the DP block
  read once per super-step and m(k,j) from the end-major M window read+rolled
  once per super-step (un-computed M entries are NEG, so fresh-m splits are
  excluded automatically and the mask is the unchanged reference band
  i+1 <= k <= j-3; fresh-dp splits would need left span >= KB, impossible
  at KB=4 since the band caps the left span at (t)+... <= D-1).
- *fresh-m*: the right part m(k,j) was produced earlier in this block.  Its
  left part then has span <= KB-2 <= 2, and dp of any span <= 2 is exactly
  0.0 (no pair fits), so the candidate equals the in-block m diagonal
  statically lane-shifted — a couple of (1, LP) vector ops.

This amortizes the per-diagonal fixed costs that dominated the
one-diagonal-per-step kernel (M-window roll, DP read/modify/write, column
transposes) over KB diagonals.  Additionally the per-cell split argmax
(k_star) is no longer computed for every cell on every diagonal (its two
extra lane reductions were ~40% of the stale pass): codes only record THAT
a bifurcation won (code 4), and the in-kernel traceback recomputes the
reference tie-break (largest split k among maxima, src/nussinov.cpp:262-268)
for the <= L/2 bifurcation cells it actually visits, from the same
dp/M rows — the sums re-pair the identical f32 operands, so the recovered
k is bit-for-bit the one the per-diagonal computation would have stored.

Layout strategy (Mosaic cannot vector-load/store at dynamic *lane* offsets;
dynamic *sublane* offsets are fine):

- ``DP[i, c] = dp(i, c)`` — start-major absolute coordinates.  The
  bifurcation term dp(i, k-1) is a static one-lane shift of the full block.
  The per-diagonal writes dp(i, i+ld) are batched: one read, KB dynamic
  lane rolls + masked merges, one write per super-step.
- ``M[j, k] = m(k, j)`` — end-major pair values.  The window covering rows
  D..D+KB+L is taken 8-aligned and rotated down by the residue via one
  dynamic sublane roll per super-step (Mosaic requires dynamic sublane
  offsets to be provably 8-aligned); per-diagonal views are static sublane
  slices of the rotated window.  Writes are batched like DP.
- Tie-breaking replicates ops/nussinov.py exactly: candidate priority
  down(i+1,j) > left(i,j-1) > pair > bifurcation with the largest split k,
  first strict max wins.

The traceback ALSO runs inside the kernel (same stack algorithm as
ops/nussinov._traceback, stack in SMEM, ss as a lane vector): as an XLA
while_loop it costs ~5us per pop (one fused micro-kernel launch each), i.e.
~3 ms at L=320 — 50x the DP kernel itself and the dominant cost of every
DD iteration (src/dafs.cpp:1087-1291 decodes 3 structures per iteration).
In-kernel the pops are hardware loop iterations.
"""

from __future__ import annotations

import functools
import os

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
            vp_ref, vp2_ref, stack_ref, *, L, LP, KB, NSUP, H2):
    f = jnp.float32
    neg = f(NEG)

    codes_ref[:] = jnp.zeros((NSUP * KB, LP), jnp.int32)
    dp_ref[:] = jnp.zeros((L, LP), f)
    m_ref[:] = jnp.full((_round_up(L, 8) + H2, LP), neg, f)
    vp_ref[:] = jnp.zeros((1, LP), f)
    vp2_ref[:] = jnp.zeros((1, LP), f)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LP), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (L, LP), 0)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (L, LP), 1)
    row_i8 = jax.lax.broadcasted_iota(jnp.int32, (H2, LP), 0)
    col_k8 = jax.lax.broadcasted_iota(jnp.int32, (H2, LP), 1)

    def shift_left(x, fill=0.0, n=1):
        # value at lane i becomes x[i+n]; rightmost n lanes get fill
        return jnp.concatenate(
            [x[:, n:], jnp.full((1, n), fill, x.dtype)], axis=1
        )

    def body(s, _):
        D = 1 + s * KB
        a = (D // 8) * 8
        r = D - a

        # ---- shared per-super-step reads ---------------------------------
        mbig = m_ref[pl.ds(a, H2), :]              # rows a .. a+H2-1
        # mwinbase[q, k] = M[D+q, k] (8-aligned window + dynamic roll)
        mwinbase = pltpu.roll(mbig, H2 - r, 0)
        dp_all = dp_ref[:]
        dp_shift = jnp.concatenate(
            [jnp.zeros((L, 1), f), dp_all[:, :-1]], axis=1
        )                                          # [i, k] = dp(i, k-1)

        # ---- stale bifurcation maxima, all KB diagonals -------------------
        stale_cols = []
        for t in range(KB):
            ld = D + t
            # mwin_t[i, k] = M[ld+i, k] = m(k, i+ld); entries not yet
            # computed (spans >= D) are NEG, excluding fresh-m splits
            mwin_t = jax.lax.slice_in_dim(mwinbase, t, t + L, axis=0)
            bmask = (col_k >= row_i + 1) & (col_k <= row_i + (ld - 3))
            cand_b = jnp.where(bmask, dp_shift + mwin_t, neg)
            stale_cols.append(jnp.max(cand_b, axis=1, keepdims=True))
        SV = jnp.concatenate(stale_cols, axis=1)   # (L, KB)
        SVr = jax.lax.transpose(SV, (1, 0))        # (KB, L)
        if LP > L:
            SVr = jnp.concatenate(
                [SVr, jnp.full((KB, LP - L), neg, f)], axis=1
            )

        # ---- sequential recurrence over the block's diagonals -------------
        prev = vp_ref[:]    # dp of diagonal D-1+t (lane i = dp(i, i+span))
        prev2 = vp2_ref[:]  # dp of diagonal D-2+t
        mlist = []
        vlist = []
        for t in range(KB):
            ld = D + t
            t1 = shift_left(prev)          # dp(i+1, j)
            t2 = prev                      # dp(i, j-1)
            dp_in = shift_left(prev2)      # dp(i+1, j-1)
            s_ij = sml_ref[pl.ds(ld, 1), :]
            valid_i = (lane + ld) <= (L - 1)
            pair_ok = (s_ij > 0.0) & (ld >= 3) & valid_i
            m_new = jnp.where(pair_ok, dp_in + s_ij, neg)

            bif = SVr[t : t + 1, :]
            # fresh-m splits: m from block step tp, left span t-1-tp <= 2
            # whose dp is exactly 0.0, so the candidate is the in-block m
            # diagonal shifted left by t-tp lanes: lane i then holds
            # m(k, i+ld) for the split k = i + (t-tp).  (mlist entries with
            # span < 3 are all NEG, so early blocks need no special-casing.)
            for tp in range(t):
                bif = jnp.maximum(bif, shift_left(mlist[tp], neg, n=t - tp))

            gate12 = ld >= 2
            t1g = jnp.where(gate12, t1, neg)
            t2g = jnp.where(gate12, t2, neg)
            v = jnp.maximum(jnp.maximum(t1g, t2g), jnp.maximum(m_new, bif))
            has_any = v > neg
            vout = jnp.where(has_any & valid_i, v, 0.0)
            # candidate priority: t1, t2, pair, bifurcation (first max wins);
            # 4 = "some bifurcation" — the split is recovered at traceback
            code = jnp.where(
                t1g == v, 1,
                jnp.where(t2g == v, 2, jnp.where(m_new == v, 3, 4)),
            )
            code = jnp.where(valid_i & has_any, code, 0)
            codes_ref[pl.ds(ld - 1, 1), :] = code

            mlist.append(m_new)
            vlist.append(vout)
            prev2 = prev
            prev = vout

        # ---- batched state write-backs ------------------------------------
        # M[j = k + ld_t, k] = m_new_t[k]: window row r+t+k, lane k —
        # one read (mbig above), KB masked merges, one write.
        mnew_win = mbig
        for t in range(KB):
            mask = (row_i8 - (r + t)) == col_k8
            mnew_win = jnp.where(
                mask, jnp.broadcast_to(mlist[t], (H2, LP)), mnew_win
            )
        m_ref[pl.ds(a, H2), :] = mnew_win

        dp_new = dp_all
        for t in range(KB):
            v_roll = pltpu.roll(vlist[t], D + t, 1)
            dmask = (col_k - row_i) == (D + t)
            dp_new = jnp.where(
                dmask, jnp.broadcast_to(v_roll, (L, LP)), dp_new
            )
        dp_ref[:] = dp_new

        vp_ref[:] = prev
        vp2_ref[:] = prev2
        return 0

    jax.lax.fori_loop(0, NSUP, body, 0)

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

        # code 4: recover the winning split k — the largest k in [i+1, j-3]
        # with dp(i,k-1) + m(k,j) == dp(i,j) (reference candidate order:
        # strictly-greater replacement scanning k downward == largest
        # maximizer; sums re-pair the same f32 operands as the DP pass)
        dprow = dp_ref[pl.ds(jnp.maximum(i, 0), 1), :]
        v_cell = jnp.sum(jnp.where(lane == j, dprow, 0.0))
        mrow = m_ref[pl.ds(jnp.maximum(j, 0), 1), :]
        dpsh = jnp.concatenate(
            [jnp.zeros((1, 1), jnp.float32), dprow[:, :-1]], axis=1
        )
        cand = dpsh + mrow
        kmask = (lane >= i + 1) & (lane <= j - 3)
        k = jnp.max(jnp.where(kmask & (cand == v_cell), lane, -1))
        k = jnp.where(c == 4, k, 0)

        # pair record: code 3 marks (i, j); code 4 marks (k, j)
        tgt = jnp.where(c == 4, k, i)
        mark = (c == 3) | (c == 4)
        ss_ref[:] = jnp.where((lane == tgt) & mark, j, ss_ref[:])

        # pushes: c==1 -> (i+1, j); c==2 -> (i, j-1); c==3 -> (i+1, j-1);
        # c==4 -> (i, k-1) then (k+1, j-1)
        a1 = jnp.where(c == 1, i + 1,
                       jnp.where(c == 2, i,
                                 jnp.where(c == 3, i + 1, i)))
        b1 = jnp.where(c == 1, j,
                       jnp.where(c == 2, j - 1,
                                 jnp.where(c == 3, j - 1, k - 1)))
        npush = jnp.where(c == 0, 0, jnp.where(c == 4, 2, 1))
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

    Returns (score, codes, ss); codes rows are indexed ld-1 like
    nussinov._decode_ldiag_impl's scan output (values: 1=down, 2=left,
    3=pair, 4=bifurcation, 0=none).
    """
    KB = int(os.environ.get("DAFS_TPU_NUSSINOV_KB", "4") or 4)
    # KB > 4 would create fresh-dp bifurcation splits (left span >= D inside
    # the block), which this kernel does not implement — see module docstring
    if not 1 <= KB <= 4:
        raise ValueError(f"DAFS_TPU_NUSSINOV_KB must be in [1, 4], got {KB}")
    LP = _round_up(L, 128)
    NSUP = -(-(L - 1) // KB)
    LR = NSUP * KB + 1
    H2 = _round_up(L + KB + 8, 8)
    sml = jnp.zeros((LR, LP), jnp.float32).at[:L, :L].set(sm_l)
    l_arr = jnp.asarray(l, jnp.int32).reshape(1, 1)
    score, codes, ss = pl.pallas_call(
        functools.partial(_kernel, L=L, LP=LP, KB=KB, NSUP=NSUP, H2=H2),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((NSUP * KB, LP), jnp.int32),
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
            # M (end-major): 8-aligned roll windows of height H2
            pltpu.VMEM((_round_up(L, 8) + H2, LP), jnp.float32),
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
