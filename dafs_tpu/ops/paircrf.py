"""Batched CONTRAlign 5-state pair-CRF on TPU (contralign/InferenceEngine.ipp).

Anti-diagonal wavefront reformulation of ComputeForward (:999-1071),
ComputeBackward (:1079-1150) and ComputePosterior (:1280-1317), with the
same Fast_LogPlusEquals/Fast_Exp approximations and per-cell accumulation
order, batched over sequence pairs like ops/pairhmm.py.

States: 0=MATCH, 1=INS_X, 2=INS_Y, 3=INS2_X, 4=INS2_Y.
Double-affine gaps: two insert tiers sharing emissions but with separate
bias/transition weights; INS_X receives {M, IX, IY}, INS2_X receives
{M, I2X, I2Y} (no tier mixing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.models import contralign_params as CP
from dafs_tpu.ops.logspace import contra_fast_logplus as lse
from dafs_tpu.ops.logspace import contra_fast_exp

from dafs_tpu.utils import aot

NEG = np.float32(-2e20)  # numpy, not jnp: see ops/logspace.py
M_, IX, IY, I2X, I2Y = range(5)

_T = None


def _tables():
    global _T
    if _T is None:
        _T = CP.tables()
    return _T


def _round_up(n, m):
    return -(-n // m) * m


def _shift_right(x, fill):
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]], axis=-1
    )


def _shift_left(x, fill):
    return jnp.concatenate(
        [x[..., 1:], jnp.full(x.shape[:-1] + (1,), fill, x.dtype)], axis=-1
    )


@aot.persistent_jit(static_argnames=("l1max", "l2max"))
def forward_backward_posterior(codes1, len1, codes2, len2, *, l1max, l2max):
    """Match posteriors for a batch of pairs; shapes as in ops/pairhmm.py."""
    t = {k: jnp.asarray(v) for k, v in _tables().items()}
    B = codes1.shape[0]
    imax = l1max + 1
    ndiag = l1max + l2max + 1

    match_t, ins_t, single, pair = t["match"], t["ins"], t["single"], t["pair"]

    i_idx = jnp.arange(imax)[None, :]
    len1b = len1[:, None]
    len2b = len2[:, None]

    # emissions in diagonal-major layout
    dd = jnp.arange(ndiag)[:, None, None]
    ib = jnp.arange(imax)[None, None, :]
    j_of = dd - ib
    jc = jnp.clip(j_of, 0, l2max)
    c2_diag = jnp.take_along_axis(
        jnp.broadcast_to(codes2[None], (ndiag, B, l2max + 1)),
        jnp.broadcast_to(jc, (ndiag, B, imax)),
        axis=2,
    )
    c1_b = jnp.broadcast_to(codes1[None, :, :imax], c2_diag.shape)
    # ScoreMatch emission part: match[x_i][y_j] + single[MATCH]
    ME_diag = match_t[c1_b, c2_diag] + single[M_]
    # insert-Y emission: ins[y_j] (+ single added per tier in the body)
    EY_diag = ins_t[c2_diag]
    EX = ins_t[codes1[:, :imax]]  # ins[x_i], (B, imax)

    def fwd_step(carry, xs):
        prev, prev2 = carry  # (B, 5, imax) diagonals d-1, d-2
        d, me_d, ey_d = xs
        j_idx = d - i_idx
        valid = (i_idx <= len1b) & (j_idx >= 0) & (j_idx <= len2b)
        at_origin_m = (i_idx == 1) & (j_idx == 1)
        not_first = (i_idx > 1) | (j_idx > 1)

        # MATCH from (i-1, j-1): sources in order M, IX, IY, I2X, I2Y
        # (InferenceEngine.ipp:1031-1038); pair term dropped at (1,1)
        pM = _shift_right(prev2[:, M_], NEG)
        pIX = _shift_right(prev2[:, IX], NEG)
        pIY = _shift_right(prev2[:, IY], NEG)
        pI2X = _shift_right(prev2[:, I2X], NEG)
        pI2Y = _shift_right(prev2[:, I2Y], NEG)
        pr = jnp.where(at_origin_m, 0.0, 1.0)  # pair-term gate
        m_new = pM + (me_d + pr * pair[M_, M_])
        ok_others = not_first
        m_new = jnp.where(ok_others, lse(m_new, pIX + (me_d + pair[IX, M_])), m_new)
        m_new = jnp.where(ok_others, lse(m_new, pIY + (me_d + pair[IY, M_])), m_new)
        m_new = jnp.where(ok_others, lse(m_new, pI2X + (me_d + pair[I2X, M_])), m_new)
        m_new = jnp.where(ok_others, lse(m_new, pI2Y + (me_d + pair[I2Y, M_])), m_new)
        m_ok = valid & (i_idx > 0) & (j_idx > 0)
        m_new = jnp.where(m_ok, m_new, NEG)

        # INS_X from (i-1, j): sources M, IX, IY (:1042-1045); boundary
        # column j == 0 chains IX only (:1015); pair dropped at (1,0)
        qM = _shift_right(prev[:, M_], NEG)
        qIX = _shift_right(prev[:, IX], NEG)
        qIY = _shift_right(prev[:, IY], NEG)
        qI2X = _shift_right(prev[:, I2X], NEG)
        qI2Y = _shift_right(prev[:, I2Y], NEG)
        at10 = (i_idx == 1) & (j_idx == 0)
        prx = jnp.where(at10, 0.0, 1.0)
        ex1 = EX + single[IX]
        j_pos = j_idx > 0
        # source order in C++: M, IX, IY (j >= 1); boundary column: IX only
        x_new = jnp.where(
            j_pos,
            lse(
                lse(qM + (ex1 + pair[M_, IX]), qIX + (ex1 + pair[IX, IX])),
                qIY + (ex1 + pair[IY, IX]),
            ),
            qIX + (ex1 + prx * pair[IX, IX]),
        )
        x_ok = valid & (i_idx > 0)
        x_new = jnp.where(x_ok, x_new, NEG)

        ex2 = EX + single[I2X]
        at10p = jnp.where(at10, 0.0, 1.0)
        x2_new = jnp.where(
            j_pos,
            lse(
                lse(qM + (ex2 + pair[M_, I2X]), qI2X + (ex2 + pair[I2X, I2X])),
                qI2Y + (ex2 + pair[I2Y, I2X]),
            ),
            qI2X + (ex2 + at10p * pair[I2X, I2X]),
        )
        x2_new = jnp.where(x_ok, x2_new, NEG)

        # INS_Y from (i, j-1): sources M, IX, IY (:1048-1050); boundary row
        # i == 0 chains IY only (:1016); pair dropped at (0,1)
        at01 = (i_idx == 0) & (j_idx == 1)
        pry = jnp.where(at01, 0.0, 1.0)
        ey1 = ey_d + single[IY]
        i_pos = i_idx > 0
        y_new = jnp.where(
            i_pos,
            lse(
                lse(prev[:, M_] + (ey1 + pair[M_, IY]), prev[:, IX] + (ey1 + pair[IX, IY])),
                prev[:, IY] + (ey1 + pair[IY, IY]),
            ),
            prev[:, IY] + (ey1 + pry * pair[IY, IY]),
        )
        y_ok = valid & (j_idx > 0)
        y_new = jnp.where(y_ok, y_new, NEG)

        ey2 = ey_d + single[I2Y]
        y2_new = jnp.where(
            i_pos,
            lse(
                lse(prev[:, M_] + (ey2 + pair[M_, I2Y]), prev[:, I2X] + (ey2 + pair[I2X, I2Y])),
                prev[:, I2Y] + (ey2 + pair[I2Y, I2Y]),
            ),
            prev[:, I2Y] + (ey2 + pry * pair[I2Y, I2Y]),
        )
        y2_new = jnp.where(y_ok, y2_new, NEG)

        # origin cell (0,0): all states 0
        origin = (i_idx == 0) & (j_idx == 0)
        zero = jnp.float32(0.0)
        m_new = jnp.where(origin, zero, m_new)
        x_new = jnp.where(origin, zero, x_new)
        y_new = jnp.where(origin, zero, y_new)
        x2_new = jnp.where(origin, zero, x2_new)
        y2_new = jnp.where(origin, zero, y2_new)

        diag = jnp.stack([m_new, x_new, y_new, x2_new, y2_new], axis=1)
        diag = jnp.where(valid[:, None, :], diag, NEG)
        return (diag, prev), diag

    neg = jnp.full((B, 5, imax), NEG)
    (_, _), fdiags = jax.lax.scan(
        fwd_step, (neg, neg), (jnp.arange(ndiag), ME_diag, EY_diag), unroll=2
    )

    # backward: cell (a, b) receives
    #   match (a+1, b+1):      into all k (k != M needs a+1>1 or b+1>1)
    #   insX/ins2X (a+1, b):   into {M, IX, IY} / {M, I2X, I2Y} if b >= 1
    #                          else into {IX} / {I2X}
    #   insY/ins2Y (a, b+1):   analogous with a >= 1
    # LPE order per target (derived from the C++ loop order):
    #   M:   match, insX, ins2X, insY, ins2Y
    #   IX:  match, insX, insY          IY:  match, insX, insY
    #   I2X: match, ins2X, ins2Y        I2Y: match, ins2X, ins2Y
    padM = jnp.full((2, B, imax), 0.0, ME_diag.dtype)
    ME_n2 = jnp.concatenate([ME_diag[2:], padM], axis=0)   # [d] -> ME_diag[d+2]
    padE = jnp.full((1, B, imax), 0.0, EY_diag.dtype)
    EY_n1 = jnp.concatenate([EY_diag[1:], padE], axis=0)   # [d] -> EY_diag[d+1]
    EX_next = _shift_left(EX, jnp.float32(0.0))            # ins[x_{i+1}]

    def bwd_step(carry, xs):
        nxt, nxt2 = carry
        d, me_n2, ey_n1 = xs
        j_idx = d - i_idx
        valid = (i_idx >= 0) & (i_idx <= len1b) & (j_idx >= 0) & (j_idx <= len2b)

        me_n = _shift_left(me_n2, jnp.float32(0.0))  # ScoreMatch emis at (i+1, j+1)
        bM11 = _shift_left(nxt2[:, M_], NEG)

        # pair gate for the (i+1, j+1) match: dropped when (i+1,j+1)==(1,1)
        at_origin_m = (i_idx + 1 == 1) & (j_idx + 1 == 1)
        prm = jnp.where(at_origin_m, 0.0, 1.0)
        has_m = (i_idx < len1b) & (j_idx < len2b)
        not_first_n = (i_idx + 1 > 1) | (j_idx + 1 > 1)

        bIX1 = _shift_left(nxt[:, IX], NEG)    # Fb[IX][i+1, j]
        bI2X1 = _shift_left(nxt[:, I2X], NEG)
        bIY1 = nxt[:, IY]                      # Fb[IY][i, j+1]
        bI2Y1 = nxt[:, I2Y]
        has_x = i_idx < len1b
        has_y = j_idx < len2b

        ex1n = EX_next + single[IX]
        ex2n = EX_next + single[I2X]
        ey1n = ey_n1 + single[IY]
        ey2n = ey_n1 + single[I2Y]
        # pair gates for insX at (i+1, j): dropped when (i+1, j) == (1, 0)
        at10n = (i_idx + 1 == 1) & (j_idx == 0)
        prx = jnp.where(at10n, 0.0, 1.0)
        at01n = (i_idx == 0) & (j_idx + 1 == 1)
        pry = jnp.where(at01n, 0.0, 1.0)
        j0 = j_idx == 0
        i0 = i_idx == 0

        def lpe(x, y, cond):
            return jnp.where(cond, lse(x, y), x)

        bM = jnp.full((B, imax), NEG)
        bIX = jnp.full((B, imax), NEG)
        bIY = jnp.full((B, imax), NEG)
        bI2X = jnp.full((B, imax), NEG)
        bI2Y = jnp.full((B, imax), NEG)

        mterm = bM11 + me_n
        bM = lpe(bM, mterm + prm * pair[M_, M_], has_m)
        bIX = lpe(bIX, mterm + pair[IX, M_], has_m & not_first_n)
        bIY = lpe(bIY, mterm + pair[IY, M_], has_m & not_first_n)
        bI2X = lpe(bI2X, mterm + pair[I2X, M_], has_m & not_first_n)
        bI2Y = lpe(bI2Y, mterm + pair[I2Y, M_], has_m & not_first_n)

        # from insX (i+1, j)
        bM = lpe(bM, bIX1 + (ex1n + pair[M_, IX]), has_x & ~j0)
        bIX = lpe(bIX, bIX1 + (ex1n + prx * pair[IX, IX]), has_x)
        bIY = lpe(bIY, bIX1 + (ex1n + pair[IY, IX]), has_x & ~j0)
        # from ins2X (i+1, j)
        bM = lpe(bM, bI2X1 + (ex2n + pair[M_, I2X]), has_x & ~j0)
        bI2X = lpe(bI2X, bI2X1 + (ex2n + prx * pair[I2X, I2X]), has_x)
        bI2Y = lpe(bI2Y, bI2X1 + (ex2n + pair[I2Y, I2X]), has_x & ~j0)
        # from insY (i, j+1)
        bM = lpe(bM, bIY1 + (ey1n + pair[M_, IY]), has_y & ~i0)
        bIX = lpe(bIX, bIY1 + (ey1n + pair[IX, IY]), has_y & ~i0)
        bIY = lpe(bIY, bIY1 + (ey1n + pry * pair[IY, IY]), has_y)
        # from ins2Y (i, j+1)
        bM = lpe(bM, bI2Y1 + (ey2n + pair[M_, I2Y]), has_y & ~i0)
        bI2X = lpe(bI2X, bI2Y1 + (ey2n + pair[I2X, I2Y]), has_y & ~i0)
        bI2Y = lpe(bI2Y, bI2Y1 + (ey2n + pry * pair[I2Y, I2Y]), has_y)

        at_end = (i_idx == len1b) & (j_idx == len2b)
        zero = jnp.float32(0.0)
        bM = jnp.where(at_end, zero, bM)
        bIX = jnp.where(at_end, zero, bIX)
        bIY = jnp.where(at_end, zero, bIY)
        bI2X = jnp.where(at_end, zero, bI2X)
        bI2Y = jnp.where(at_end, zero, bI2Y)

        diag = jnp.stack([bM, bIX, bIY, bI2X, bI2Y], axis=1)
        diag = jnp.where(valid[:, None, :], diag, NEG)
        return (diag, nxt), diag

    (_, _), bdiags_rev = jax.lax.scan(
        bwd_step, (neg, neg),
        (jnp.arange(ndiag - 1, -1, -1), ME_n2[::-1], EY_n1[::-1]),
        unroll=2,
    )
    bdiags = bdiags_rev[::-1]

    # Z = logsumexp over states at (LX, LY), k order 0..4 (:1252-1257)
    def diag_cell(diags, i, j):
        d = (i + j)[:, None]
        return diags[d, jnp.arange(B)[:, None], jnp.arange(5)[None, :], i[:, None]]

    f_end = diag_cell(fdiags, len1, len2)
    Z = f_end[:, 0]
    for k in range(1, 5):
        Z = lse(Z, f_end[:, k])

    # posterior[i][j] = sum_k Fast_Exp(Ff[k][i-1,j-1] + ScoreMatch(i,j,k)
    #                                  + Fb[MATCH][i,j] - Z)  (:1280-1307)
    ii = jnp.arange(1, l1max + 1)[:, None]
    jj = jnp.arange(1, l2max + 1)[None, :]
    dsel = ii + jj
    # Ff[k] at (i-1, j-1): diag (i+j-2), index i-1
    f_cells = fdiags[dsel - 2, :, :, ii - 1]   # (l1max, l2max, B, 5)
    b_match = bdiags[dsel, :, M_, ii]          # (l1max, l2max, B)
    # emission at (i, j): match[x_i][y_j] + single[M]
    me_cells = jnp.moveaxis(
        ME_diag[dsel, :, ii], -1, 0
    )  # (B, l1max, l2max)
    prm = jnp.where((ii == 1) & (jj == 1), 0.0, 1.0)  # (l1max, l2max)
    not_first = (ii > 1) | (jj > 1)

    logZ = Z[:, None, None]
    bmatch = jnp.moveaxis(b_match, -1, 0)
    post = jnp.zeros((B, l1max, l2max), jnp.float32)
    for k in range(5):
        fk = jnp.moveaxis(f_cells[..., k], -1, 0)  # (B, l1max, l2max)
        sc = me_cells + (prm * pair[k, M_])[None]
        term = contra_fast_exp(fk + sc + bmatch - logZ)
        gate = jnp.asarray(True) if k == M_ else not_first[None]
        post = post + jnp.where(gate, term, 0.0)
    post = jnp.clip(post, 0.0, 1.0)

    valid = (
        (jnp.arange(1, l1max + 1)[None, :, None] <= len1[:, None, None])
        & (jnp.arange(1, l2max + 1)[None, None, :] <= len2[:, None, None])
    )
    return jnp.where(valid, post, 0.0)


def batch_posteriors(seqs1, seqs2, threshold):
    """Dense (L1, L2) match posteriors per pair, entries kept > threshold."""
    if not seqs1:
        return []
    l1max = _round_up(max(len(s) for s in seqs1), 32)
    l2max = _round_up(max(len(s) for s in seqs2), 32)
    B = len(seqs1)
    codes1 = np.full((B, l1max + 1), 4, dtype=np.int32)
    codes2 = np.full((B, l2max + 1), 4, dtype=np.int32)
    len1 = np.array([len(s) for s in seqs1], dtype=np.int32)
    len2 = np.array([len(s) for s in seqs2], dtype=np.int32)
    for b, s in enumerate(seqs1):
        codes1[b, 1 : len(s) + 1] = CP.encode(s)
    for b, s in enumerate(seqs2):
        codes2[b, 1 : len(s) + 1] = CP.encode(s)
    post = np.asarray(
        forward_backward_posterior(
            jnp.asarray(codes1), jnp.asarray(len1), jnp.asarray(codes2),
            jnp.asarray(len2), l1max=l1max, l2max=l2max,
        )
    )
    out = []
    for b in range(B):
        p = post[b, : len1[b], : len2[b]].copy()
        p[p <= threshold] = 0.0
        out.append(p)
    return out
