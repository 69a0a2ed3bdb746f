"""Pallas TPU kernel for the banded MEA alignment decode (ops/nw.py).

Same computation as ops/nw.decode (SparseNeedlemanWunsch,
src/needleman_wunsch.cpp:255-422) — bit-identical scores, codes, and
traceback — but the whole row sweep AND the traceback run inside one Mosaic
kernel.  The lax path costs ~5 us per row step (one fused micro-kernel
launch each) plus ~5 us per traceback pop in an XLA while_loop: ~5 ms per
decode at L=320, executed once per DD iteration (src/dafs.cpp:1093).
In-kernel, rows and pops are hardware loop iterations.

Bit-exactness notes:
- The Y (gap-in-seq1) dependency is a prefix max along lanes, computed with
  log2(LP) static shift+max steps; max is exact in float (no rounding), so
  any association order gives bit-identical results to the lax path's
  associative_scan.
- Tie-breaking replicates ops/nw.py cell-for-cell: 'M' wins >= against 'X';
  'Y' only on strictly-greater (left > b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOWEST = float(np.finfo(np.float32).min)


def _round_up(n, m):
    return -(-n // m) * m


def _kernel(l_ref, env_ref, sm_ref, score_ref, al_ref, tr_ref, dp_ref,
            *, L1, L2, LP):
    f = jnp.float32
    lowest = f(LOWEST)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LP), 1)
    kk_ok = lane <= L2  # columns k in [0, L2]

    l1 = l_ref[0, 0]
    l2 = l_ref[0, 1]

    # row 0: dp = 0, tr = 'Y'(3) for k>0 else 0
    dp_row = jnp.zeros((1, LP), f)
    tr_ref[pl.ds(0, 1), :] = jnp.where(lane > 0, 3, 0)
    dp_ref[:] = dp_row

    def shift_right(x, fill):
        return jnp.concatenate(
            [jnp.full((1, 1), fill, x.dtype), x[:, :-1]], axis=1
        )

    def row_body(i, _):
        dp_prev = dp_ref[:]
        first = env_ref[i, 0]
        last = env_ref[i, 1]
        start = jnp.maximum(first, 1)
        in_band = (lane >= start) & (lane <= last) & kk_ok

        sm_row = sm_ref[pl.ds(i - 1, 1), :]      # score of (i-1, k-1) at lane k
        m_cand = shift_right(dp_prev, 0.0) + sm_row
        x_cand = dp_prev
        b = jnp.where(m_cand >= x_cand, m_cand, x_cand)
        b_code = jnp.where(m_cand >= x_cand, 1, 2)
        b = jnp.where(lane == 0, 0.0, b)
        b_code = jnp.where(lane == 0, 2, b_code)

        chain_init = jnp.where(start == 1, 0.0, lowest)
        c = jnp.where(in_band, b, lowest)
        c = jnp.where(lane == 0, jnp.where(start == 1, chain_init, lowest), c)
        # prefix max over lanes (exact: max has no rounding)
        run = c
        s = 1
        while s < LP:
            run = jnp.maximum(
                run,
                jnp.concatenate(
                    [jnp.full((1, s), lowest, f), run[:, :-s]], axis=1
                ),
            )
            s *= 2
        left = shift_right(run, lowest)
        dp_row = jnp.where(in_band, jnp.maximum(b, left), lowest)
        dp_row = jnp.where(lane == 0, 0.0, dp_row)
        tr_row = jnp.where(left > b, 3, b_code)
        tr_row = jnp.where(in_band, tr_row, 0)
        tr_row = jnp.where(lane == 0, 2, tr_row)

        tr_ref[pl.ds(i, 1), :] = tr_row
        dp_ref[:] = dp_row

        @pl.when(i == l1)
        def _():
            score_ref[0, 0] = jnp.sum(jnp.where(lane == l2, dp_row, 0.0))

        return 0

    jax.lax.fori_loop(1, L1 + 1, row_body, 0)

    # ---- in-kernel traceback (mirrors ops/nw._traceback) -----------------
    al_ref[:] = jnp.full((1, LP), -1, jnp.int32)

    def tb_body(t, state):
        i, k = state
        go = (i > 0) | (k > 0)
        crow = tr_ref[pl.ds(jnp.maximum(i, 0), 1), :]
        code = jnp.sum(jnp.where(lane == k, crow, 0))
        is_m = go & (code == 1)
        is_x = go & (code == 2)
        val = jnp.where(is_m, k - 1, -1)
        al_ref[:] = jnp.where(
            (lane == i - 1) & (is_m | is_x), val, al_ref[:]
        )
        i_new = jnp.where(is_m | is_x, i - 1, i)
        k_new = jnp.where(go & ~is_x, k - 1, k)
        return (i_new, k_new)

    jax.lax.fori_loop(0, L1 + L2 + 2, tb_body, (l1, l2))


@functools.partial(jax.jit, static_argnames=("L1", "L2", "interpret"))
def decode(sm, env_first, env_last, l1=None, l2=None, *, L1, L2,
           interpret=False):
    """Banded MEA alignment decode, Pallas path (see ops/nw.decode)."""
    if l1 is None:
        l1 = L1
    if l2 is None:
        l2 = L2
    LP = _round_up(L2 + 1, 128)
    smp = jnp.zeros((L1, LP), jnp.float32).at[:, 1 : L2 + 1].set(sm)
    env = jnp.stack(
        [env_first.astype(jnp.int32), env_last.astype(jnp.int32)], axis=1
    )  # (L1+1, 2) SMEM
    l_arr = jnp.stack(
        [jnp.asarray(l1, jnp.int32), jnp.asarray(l2, jnp.int32)]
    ).reshape(1, 2)
    score, al = pl.pallas_call(
        functools.partial(_kernel, L1=L1, L2=L2, LP=LP),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, LP), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((L1 + 1, LP), jnp.int32),   # tr codes
            pltpu.VMEM((1, LP), jnp.float32),      # dp row carry
        ],
        interpret=interpret,
    )(l_arr, env, smp)
    return score[0, 0], al[0, :L1]
