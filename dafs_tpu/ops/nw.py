"""SparseNeedlemanWunsch MEA alignment decoder (src/needleman_wunsch.cpp:198-422).

The reference restricts the NW DP to a per-row alignment envelope precomputed
from positive-scoring cells.  We keep the envelope computation on host (tiny,
O(L1*L2) numpy) and run the banded DP on device as a row `lax.scan`: within a
row, the gap-in-seq1 ('Y') dependency is a running maximum, which is exact in
max-plus algebra, while tie-breaking ('M' then 'X' then 'Y', first wins on
ties via strictly-greater replacement) is reproduced cell-for-cell.

Traceback is an on-device while_loop producing al[i] = k or -1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.utils import aot

LOWEST = np.float32(np.finfo(np.float32).min)  # numpy, not jnp: see ops/logspace.py


def envelope(p: np.ndarray, th: float) -> np.ndarray:
    """Alignment envelope, replicating initialize() (needleman_wunsch.cpp:198-253).

    Returns (L1+1, 2) int array of [first, last] per DP row.
    """
    L1, L2 = p.shape
    env = np.zeros((L1 + 1, 2), dtype=np.int64)
    pos = (p - np.float32(th)) >= 0.0
    for i in range(1, L1 + 1):
        row = pos[i - 1]
        nz = np.nonzero(row)[0]
        if nz.size:
            k = int(nz[0]) + 1  # first alignable point (1-based)
            env[i - 1, 0] = min(env[i - 1, 0], k - 1)
            env[i, 0] = k
        if env[i, 0] == 0:
            env[i, 0] = env[i - 1, 0]
            env[i, 1] = env[i - 1, 1]
            continue
        k = int(nz[-1]) + 1  # last alignable point
        env[i - 1, 1] = max(env[i - 1, 1], k - 1)
        env[i, 1] = k
    assert env[0, 0] == 0
    env[L1, 1] = L2
    # force monotonicity
    v = L2
    for i in range(L1, 0, -1):
        v = min(v, env[i, 0])
        env[i, 0] = v
    v = 0
    for i in range(L1 + 1):
        v = max(v, env[i, 1])
        env[i, 1] = v
    # connectivity
    for i in range(1, L1 + 1):
        if env[i - 1, 1] < env[i, 0]:
            env[i, 0] = env[i - 1, 1]
    return env


def decode_traced(sm, env_first, env_last, l1=None, l2=None, *, L1, L2):
    """Backend-dispatched decode for use INSIDE an enclosing jit trace
    (e.g. the DD while_loop body): Pallas kernel on TPU (DP rows and the
    traceback both run in one Mosaic kernel), lax.scan + XLA while_loop
    elsewhere.  Both paths are bit-identical (tests/test_decoders.py).
    Set DAFS_TPU_NW_PALLAS=0 to force the lax path (perf ablation)."""
    import os

    use_pallas = os.environ.get("DAFS_TPU_NW_PALLAS", "1") != "0"
    if use_pallas and jax.default_backend() == "tpu":
        from dafs_tpu.ops import nw_pallas

        return nw_pallas.decode(sm, env_first, env_last, l1, l2, L1=L1, L2=L2)
    return _decode_impl(sm, env_first, env_last, l1, l2, L1=L1, L2=L2)


@aot.persistent_jit(static_argnames=("L1", "L2"))
def decode(sm, env_first, env_last, l1=None, l2=None, *, L1, L2):
    """Banded MEA alignment decode.

    Args:
      sm: (L1, L2) float32 cell scores; caller builds ``p-th(+q)`` in
        reference float order (needleman_wunsch.cpp:281).
      env_first, env_last: (L1+1,) int32 envelope bounds per DP row,
        computed on the *unpadded* problem and extended arbitrarily for
        padding rows (those are never read back).
      l1, l2: dynamic true lengths (default: the static sizes).  The score
        and traceback use cell (l1, l2); real-region DP cells never depend
        on padding cells (larger indices), so bucket-padded shapes are safe.
    Returns:
      (score, al): score = dp[l1][l2]; al (L1,) int32 with al[i] = matched
      column in seq2 or -1.
    """
    return _decode_impl(sm, env_first, env_last, l1, l2, L1=L1, L2=L2)


def _decode_impl(sm, env_first, env_last, l1=None, l2=None, *, L1, L2):
    if l1 is None:
        l1 = L1
    if l2 is None:
        l2 = L2
    kk = jnp.arange(L2 + 1)

    # tr codes: 0=' ', 1='M', 2='X', 3='Y'
    row0_tr = jnp.where(kk > 0, 3, 0).astype(jnp.int32)
    row0_dp = jnp.zeros((L2 + 1,), jnp.float32)

    def row_step(carry, inp):
        dp_prev = carry
        i, first, last = inp  # i in [1, L1]
        start = jnp.maximum(first, 1)
        in_band = (kk >= start) & (kk <= last)

        sm_row = sm[i - 1]  # scores for pairs (i-1, k-1), k in [1, L2]
        m_cand = dp_prev[:-1] + sm_row  # dp[i-1][k-1] + score, for k>=1
        x_cand = dp_prev[1:]            # dp[i-1][k]
        b = jnp.where(m_cand >= x_cand, m_cand, x_cand)  # strict < replaces
        b_code = jnp.where(m_cand >= x_cand, 1, 2)
        b = jnp.concatenate([jnp.array([0.0], jnp.float32), b])  # k=0 slot
        b_code = jnp.concatenate([jnp.array([2], jnp.int32), b_code])

        # running max along the row implements the Y (left) dependency.
        # chain starts at k=start-1 with dp[i][start-1]: 0 when start==1
        # (dp[i][0] = 0), LOWEST otherwise.
        chain_init = jnp.where(start == 1, 0.0, LOWEST)
        c = jnp.where(in_band, b, LOWEST)
        c = c.at[0].set(jnp.where(start == 1, chain_init, LOWEST))
        run = jax.lax.associative_scan(jnp.maximum, c)
        # Y chosen iff left cell's dp strictly greater than this cell's b
        left = jnp.concatenate([jnp.array([LOWEST], jnp.float32), run[:-1]])
        dp_row = jnp.where(in_band, jnp.maximum(b, left), LOWEST)
        dp_row = dp_row.at[0].set(0.0)  # dp[i][0] = 0 (free end gap)
        tr_row = jnp.where(left > b, 3, b_code)
        tr_row = jnp.where(in_band, tr_row, 0)
        tr_row = tr_row.at[0].set(2)  # 'X'
        return dp_row, (dp_row, tr_row)

    iis = jnp.arange(1, L1 + 1)
    _, (dps, trs) = jax.lax.scan(
        row_step, row0_dp, (iis, env_first[1:], env_last[1:])
    )
    tr = jnp.concatenate([row0_tr[None, :], trs], axis=0)  # (L1+1, L2+1)
    score = dps[l1 - 1, l2]

    al = _traceback(tr, l1, l2, L1)
    return score, al


def _traceback(tr, l1, l2, L1):
    al0 = jnp.full((L1,), -1, jnp.int32)

    def cond(state):
        i, k, _ = state
        return (i > 0) | (k > 0)

    def body(state):
        i, k, al = state
        code = tr[i, k]
        is_m = code == 1
        is_x = code == 2
        al = jnp.where(
            is_m, al.at[i - 1].set(k - 1), jnp.where(is_x, al.at[i - 1].set(-1), al)
        )
        i = jnp.where(is_m | is_x, i - 1, i)
        k = jnp.where(is_m | (~is_x & ~is_m), k - 1, k)
        return i, k, al

    _, _, al = jax.lax.while_loop(
        cond, body, (jnp.asarray(l1, jnp.int32), jnp.asarray(l2, jnp.int32), al0)
    )
    return al
