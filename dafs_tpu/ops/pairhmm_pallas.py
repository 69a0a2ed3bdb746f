"""Pallas TPU kernel for the batched ProbCons pair-HMM forward/backward.

Same computation as ops/pairhmm.forward_backward_posterior (the anti-diagonal
wavefront over probconsRNA/ProbabilisticModel.h:105-259), but the whole
diagonal scan runs inside one Mosaic kernel: the six rolling state planes
live in VMEM scratch across sequential grid steps, each step emits one
(B, imax) M-plane diagonal to HBM, and the end-cell/origin-cell states needed
for the total probability (ProbabilisticModel.h:337-365) are captured with
masked lane reductions.  This removes the per-step XLA while-loop overhead
that dominates the lax.scan formulation at tRNA lengths.

Emissions are prematerialized diagonal-major OUTSIDE the kernel with the
gather-free shear (one-hot einsum over reversed codes2, then a pad+reshape),
and the grid index maps stream one (B, imax) diagonal block per step -
Mosaic cannot vector-load at dynamic lane offsets, so the dynamic-slice
formulation of the lax.scan path does not port directly.

Numerics: identical float32 expression trees (the LOG_ADD piecewise cubic of
ScoreType.h:259-262, same accumulation order), so the posteriors match the
lax.scan path bit-for-bit and the golden guide tree is preserved.

State order: 0=M, 1=Ix (gap in seq2), 2=Iy (gap in seq1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dafs_tpu.ops.logspace import lookup, probcons_exp, log_add
from dafs_tpu.ops import pairhmm as _ph

# module-level jnp constants would be captured as tracer constants by
# pallas_call; recreate them inline inside the kernels instead
_LZ = -2e20
_LU = 7.5


def _log_add_inline(x, y):
    """ops/logspace.log_add with inline (non-captured) constants."""
    lz = jnp.float32(_LZ)
    lu = jnp.float32(_LU)
    hi = jnp.maximum(x, y)
    lo = jnp.minimum(x, y)
    d = hi - lo
    use_hi = jnp.logical_or(lo == lz, d >= lu)
    approx = lookup(jnp.minimum(d, lu)) + lo
    return jnp.where(use_hi, hi, approx)


def _round_up(n, m):
    return -(-n // m) * m


def _shift_right_lanes(x, fill):
    return jnp.concatenate(
        [jnp.full((x.shape[0], 1), fill, x.dtype), x[:, :-1]], axis=1
    )


def _shift_left_lanes(x, fill):
    return jnp.concatenate(
        [x[:, 1:], jnp.full((x.shape[0], 1), fill, x.dtype)], axis=1
    )


def _fwd_kernel(
    md_ref, e2_ref, ins1_ref, len1_ref, len2_ref,
    fm_ref, fcap_ref,
    pm0, px0, py0, mm, mx, my, cap,
    *, ndiag, Bt, IP, trans, init_log,
):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        for ref in (pm0, px0, py0, mm, mx, my):
            ref[:] = jnp.full((Bt, IP), jnp.float32(_LZ), jnp.float32)
        cap[:] = jnp.zeros((Bt, 128), jnp.float32)

    m_d = md_ref[0, :, :]
    e2_d = e2_ref[0, :, :]
    ins1 = ins1_ref[0, :, :]

    i_idx = jax.lax.broadcasted_iota(jnp.int32, (Bt, IP), 1)
    j_idx = d - i_idx
    len1b = len1_ref[:, 0][:, None]
    len2b = len2_ref[:, 0][:, None]
    valid = (i_idx <= len1b) & (j_idx >= 0) & (j_idx <= len2b)
    not_init = (i_idx > 1) | (j_idx > 1)

    mm_v, mx_v, my_v = mm[:], mx[:], my[:]
    pm_v, px_v, py_v = pm0[:], px0[:], py0[:]

    m_in = _shift_right_lanes(mm_v, jnp.float32(_LZ))
    x_in = _shift_right_lanes(mx_v, jnp.float32(_LZ))
    y_in = _shift_right_lanes(my_v, jnp.float32(_LZ))
    acc = m_in + jnp.float32(trans[0, 0])
    acc = _log_add_inline(acc, x_in + jnp.float32(trans[1, 0]))
    acc = _log_add_inline(acc, y_in + jnp.float32(trans[2, 0]))
    m_new = acc + m_d
    m_ok = valid & not_init & (i_idx > 0) & (j_idx > 0)
    m_new = jnp.where(m_ok, m_new, jnp.float32(_LZ))

    pm_s = _shift_right_lanes(pm_v, jnp.float32(_LZ))
    px_s = _shift_right_lanes(px_v, jnp.float32(_LZ))
    x_new = ins1 + _log_add_inline(
        pm_s + jnp.float32(trans[0, 1]), px_s + jnp.float32(trans[1, 1])
    )
    x_ok = valid & not_init & (i_idx > 0)
    x_new = jnp.where(x_ok, x_new, jnp.float32(_LZ))

    y_new = e2_d + _log_add_inline(
        pm_v + jnp.float32(trans[0, 2]), py_v + jnp.float32(trans[2, 2])
    )
    y_ok = valid & not_init & (j_idx > 0)
    y_new = jnp.where(y_ok, y_new, jnp.float32(_LZ))

    m_new = jnp.where(
        (i_idx == 1) & (j_idx == 1), jnp.float32(init_log[0]) + m_d, m_new
    )
    x_new = jnp.where(
        (i_idx == 1) & (j_idx == 0) & (1 <= len1b),
        jnp.float32(init_log[1]) + ins1,
        x_new,
    )
    y_new = jnp.where(
        (i_idx == 0) & (j_idx == 1) & (1 <= len2b),
        jnp.float32(init_log[2]) + e2_d,
        y_new,
    )
    m_new = jnp.where(valid & (i_idx > 0) & (j_idx > 0), m_new, jnp.float32(_LZ))

    # capture cells for ComputeTotalProbability: (len1, len2) all states,
    # plus f_M(1,1), f_X(1,0), f_Y(0,1)
    def lane_pick(vals, mask):
        return jnp.sum(jnp.where(mask, vals, 0.0), axis=1)

    c = cap[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, 128), 1)
    at_end = (i_idx == len1b) & (j_idx == len2b)
    endr = at_end.any(axis=1)[:, None]
    c = jnp.where((col == 0) & endr, lane_pick(m_new, at_end)[:, None], c)
    c = jnp.where((col == 1) & endr, lane_pick(x_new, at_end)[:, None], c)
    c = jnp.where((col == 2) & endr, lane_pick(y_new, at_end)[:, None], c)
    m11 = (i_idx == 1) & (j_idx == 1)
    x10 = (i_idx == 1) & (j_idx == 0)
    y01 = (i_idx == 0) & (j_idx == 1)
    c = jnp.where((col == 3) & (d == 2), lane_pick(m_new, m11)[:, None], c)
    c = jnp.where((col == 4) & (d == 1), lane_pick(x_new, x10)[:, None], c)
    c = jnp.where((col == 5) & (d == 1), lane_pick(y_new, y01)[:, None], c)
    cap[:] = c

    fm_ref[0, :, :] = m_new
    fcap_ref[:] = c

    mm[:], mx[:], my[:] = pm_v, px_v, py_v
    pm0[:], px0[:], py0[:] = m_new, x_new, y_new


def _bwd_kernel(
    md2_ref, e2n_ref, ins1n_ref, len1_ref, len2_ref,
    bm_ref, bcap_ref,
    nm0, nx0, ny0, nm2, nx2, ny2, cap,
    *, ndiag, Bt, IP, trans, init_log,
):
    k = pl.program_id(1)
    d = ndiag - 1 - k

    @pl.when(k == 0)
    def _():
        for ref in (nm0, nx0, ny0, nm2, nx2, ny2):
            ref[:] = jnp.full((Bt, IP), jnp.float32(_LZ), jnp.float32)
        cap[:] = jnp.zeros((Bt, 128), jnp.float32)

    m_n2 = md2_ref[0, :, :]   # match diag d+2
    e2_n = e2n_ref[0, :, :]   # ins2 diag d+1
    ins1_next = ins1n_ref[0, :, :]

    i_idx = jax.lax.broadcasted_iota(jnp.int32, (Bt, IP), 1)
    j_idx = d - i_idx
    len1b = len1_ref[:, 0][:, None]
    len2b = len2_ref[:, 0][:, None]
    valid = (i_idx >= 0) & (i_idx <= len1b) & (j_idx >= 0) & (j_idx <= len2b)

    match_n = _shift_left_lanes(m_n2, jnp.float32(0.0))
    ins2_n = e2_n

    has_m = (i_idx < len1b) & (j_idx < len2b) & valid
    has_x = (i_idx < len1b) & valid
    has_y = (j_idx < len2b) & valid

    bm_11 = _shift_left_lanes(nm2[:], jnp.float32(_LZ))
    bx_n = _shift_left_lanes(nx0[:], jnp.float32(_LZ))
    by_n = ny0[:]

    prob_xy = bm_11 + match_n

    def lpe(x, y, cond):
        return jnp.where(cond, _log_add_inline(x, y), x)

    bM = jnp.full((Bt, IP), jnp.float32(_LZ), jnp.float32)
    bX = jnp.full((Bt, IP), jnp.float32(_LZ), jnp.float32)
    bY = jnp.full((Bt, IP), jnp.float32(_LZ), jnp.float32)
    bM = lpe(bM, prob_xy + jnp.float32(trans[0, 0]), has_m)
    bX = lpe(bX, prob_xy + jnp.float32(trans[1, 0]), has_m)
    bY = lpe(bY, prob_xy + jnp.float32(trans[2, 0]), has_m)
    bM = lpe(bM, bx_n + ins1_next + jnp.float32(trans[0, 1]), has_x)
    bX = lpe(bX, bx_n + ins1_next + jnp.float32(trans[1, 1]), has_x)
    bM = lpe(bM, by_n + ins2_n + jnp.float32(trans[0, 2]), has_y)
    bY = lpe(bY, by_n + ins2_n + jnp.float32(trans[2, 2]), has_y)

    at_end = (i_idx == len1b) & (j_idx == len2b)
    bM = jnp.where(at_end, jnp.float32(init_log[0]), bM)
    bX = jnp.where(at_end, jnp.float32(init_log[1]), bX)
    bY = jnp.where(at_end, jnp.float32(init_log[2]), bY)

    bM = jnp.where(valid, bM, jnp.float32(_LZ))
    bX = jnp.where(valid, bX, jnp.float32(_LZ))
    bY = jnp.where(valid, bY, jnp.float32(_LZ))

    def lane_pick(vals, mask):
        return jnp.sum(jnp.where(mask, vals, 0.0), axis=1)

    c = cap[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, 128), 1)
    m11 = (i_idx == 1) & (j_idx == 1)
    x10 = (i_idx == 1) & (j_idx == 0)
    y01 = (i_idx == 0) & (j_idx == 1)
    c = jnp.where((col == 3) & (d == 2), lane_pick(bM, m11)[:, None], c)
    c = jnp.where((col == 4) & (d == 1), lane_pick(bX, x10)[:, None], c)
    c = jnp.where((col == 5) & (d == 1), lane_pick(bY, y01)[:, None], c)
    cap[:] = c

    bm_ref[0, :, :] = bM
    bcap_ref[:] = c

    nm2[:], nx2[:], ny2[:] = nm0[:], nx0[:], ny0[:]
    nm0[:], nx0[:], ny0[:] = bM, bX, bY


def _shear_to_diag(rows, imax, O):
    """rows: (B, imax, W); returns S[b, i, o] = rows[b, i, o + i] for
    o in [0, O) (zeros where o + i >= W) - pad+reshape, gather-free."""
    B, _, W = rows.shape
    if W < O + imax:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, O + imax - W)))
        W = O + imax
    flat = rows.reshape(B, imax * W)
    flat = jnp.concatenate([flat, jnp.zeros((B, imax), flat.dtype)], axis=1)
    sheared = flat.reshape(B, imax, W + 1)  # [b, i, o] = rows[b, i, i + o]
    return sheared[:, :, :O]


@functools.partial(jax.jit, static_argnames=("l1max", "l2max"))
def forward_backward_posterior(codes1, len1, codes2, len2, *, l1max, l2max):
    """Drop-in replacement for pairhmm.forward_backward_posterior (TPU)."""
    t = _ph.tables()
    B = codes1.shape[0]
    imax = l1max + 1
    IP = _round_up(imax, 128)
    Bt = _round_up(B, 8)
    ndiag = l1max + l2max + 1

    trans = np.asarray(t["trans"], np.float32)
    init_log = np.asarray(t["init"], np.float32)
    match_t = jnp.asarray(np.asarray(t["match"], np.float32))
    ins_t = jnp.asarray(np.asarray(t["ins"], np.float32))

    # ---- emissions, diagonal-major (gather-free shear) ---------------------
    # M_diag[d][b][i] = match(c1[b,i], c2[b,d-i]).  With r2ext = reversed
    # codes2 left-padded by PADL zeros, codes2[b, d-i] = r2ext[b, OFFD-d+i],
    # so M_diag[d] is the (OFFD-d)-th shear diagonal of
    # M_rev[b, i, y] = match(c1[i], r2ext[y]).
    c1 = jnp.zeros((Bt, IP), jnp.int32).at[:B, :imax].set(codes1[:, :imax])
    oh1 = (c1[:, :imax, None] == jnp.arange(7)[None, None, :]).astype(jnp.float32)
    match_row = jnp.einsum("bic,cd->bid", oh1, match_t, precision="highest")

    PADL = imax + 1
    OFFD = l2max + PADL  # o(d) = OFFD - d >= 0 for d <= ndiag + 1
    W2 = PADL + l2max + 1
    r2ext = jnp.zeros((Bt, W2), jnp.int32).at[:B, PADL:].set(codes2[:, ::-1])
    oh2 = (r2ext[:, :, None] == jnp.arange(7)[None, None, :]).astype(jnp.float32)
    m_rev = jnp.einsum("bic,byc->biy", match_row, oh2, precision="highest")
    e_rev = jnp.sum(oh2 * ins_t[None, None, :], axis=2)  # (Bt, W2)

    O = OFFD + 1
    S_m = _shear_to_diag(m_rev, imax, O)  # (Bt, imax, O)
    S_e = _shear_to_diag(
        jnp.broadcast_to(e_rev[:, None, :], (Bt, imax, W2)), imax, O
    )

    def to_diag_major(S):
        S = jnp.pad(S, ((0, 0), (0, IP - imax), (0, 0)))
        return jnp.transpose(S, (2, 0, 1))  # (O, Bt, IP)

    MD = to_diag_major(S_m)
    ED = to_diag_major(S_e)

    ins1 = ins_t[c1]  # (Bt, IP)
    ins1_next = _shift_left_lanes(ins1, jnp.float32(0.0))
    l1p = jnp.zeros((Bt, 1), jnp.int32).at[:B, 0].set(len1)
    l2p = jnp.zeros((Bt, 1), jnp.int32).at[:B, 0].set(len2)

    kw = dict(ndiag=ndiag, Bt=Bt, IP=IP, trans=trans, init_log=init_log)

    def scratch():
        return [pltpu.VMEM((Bt, IP), jnp.float32) for _ in range(6)] + [
            pltpu.VMEM((Bt, 128), jnp.float32)
        ]

    def diag_spec(offset_of_d):
        return pl.BlockSpec(
            (1, Bt, IP),
            lambda b, d: (offset_of_d(d), b, 0),
            memory_space=pltpu.VMEM,
        )

    fixed_specs = [
        pl.BlockSpec((1, Bt, IP), lambda b, d: (0, b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1), lambda b, d: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1), lambda b, d: (b, 0), memory_space=pltpu.VMEM),
    ]
    grid = (1, ndiag)

    fm, fcap = pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        grid=grid,
        in_specs=[diag_spec(lambda d: OFFD - d), diag_spec(lambda d: OFFD - d)]
        + fixed_specs,
        out_specs=[
            pl.BlockSpec((1, Bt, IP), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 128), lambda b, d: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ndiag, Bt, IP), jnp.float32),
            jax.ShapeDtypeStruct((Bt, 128), jnp.float32),
        ],
        scratch_shapes=scratch(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(MD, ED, ins1[None, :, :], l1p, l2p)

    bm, bcap = pl.pallas_call(
        functools.partial(_bwd_kernel, **kw),
        grid=grid,
        in_specs=[
            # match at diag d+2, ins2 at diag d+1, with d = ndiag-1-k
            diag_spec(lambda k: OFFD - (ndiag + 1 - k)),
            diag_spec(lambda k: OFFD - (ndiag - k)),
        ]
        + fixed_specs,
        out_specs=[
            pl.BlockSpec(
                (1, Bt, IP),
                lambda b, k: (ndiag - 1 - k, b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((Bt, 128), lambda b, k: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ndiag, Bt, IP), jnp.float32),
            jax.ShapeDtypeStruct((Bt, 128), jnp.float32),
        ],
        scratch_shapes=scratch(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(MD, ED, ins1_next[None, :, :], l1p, l2p)

    # ---- totals (ProbabilisticModel.h:337-365) -----------------------------
    init_j = jnp.asarray(init_log)
    total_f = fcap[:, 0] + init_j[0]
    total_f = log_add(total_f, fcap[:, 1] + init_j[1])
    total_f = log_add(total_f, fcap[:, 2] + init_j[2])
    total_b = fcap[:, 3] + bcap[:, 3]
    total_b = log_add(total_b, fcap[:, 4] + bcap[:, 4])
    total_b = log_add(total_b, fcap[:, 5] + bcap[:, 5])
    total = (total_f + total_b) / jnp.float32(2.0)

    # ---- posterior + shear (same as the lax.scan path) ---------------------
    logp_d = fm + bm - total[None, :, None]
    post_d = probcons_exp(jnp.minimum(jnp.float32(0.0), logp_d))
    PD = jnp.transpose(post_d, (1, 2, 0))  # (Bt, IP, ndiag)
    W = ndiag
    flat = PD[:, :imax, :].reshape(Bt, imax * W)
    flat = jnp.concatenate([flat, jnp.zeros((Bt, imax), flat.dtype)], axis=1)
    sheared = flat.reshape(Bt, imax, W + 1)
    post = sheared[:, :, : l2max + 1]

    valid = (
        (jnp.arange(1, l1max + 1)[None, :, None] <= len1[:, None, None])
        & (jnp.arange(1, l2max + 1)[None, None, :] <= len2[:, None, None])
    )
    return jnp.where(valid, post[:B, 1:, 1:], 0.0)
