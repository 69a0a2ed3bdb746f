"""Batched ProbCons pair-HMM forward/backward/posterior on TPU.

TPU-first reformulation of probconsRNA/ProbabilisticModel.h:105-259,337-403:
the sequential O(L1*L2) cell loop becomes an anti-diagonal wavefront
`lax.scan`; a whole batch of sequence pairs is processed simultaneously as
padded (B, 3, L+1) diagonal slices.  Each DP cell evaluates exactly the same
float32 expression tree (same LOG_ADD/LOG_PLUS_EQUALS approximations, same
accumulation order) as the reference, so results agree to the last few ulps
with the C++ binary while the wavefront exposes B*L-way parallelism per step.

Performance notes: all emission lookups are materialized once in
diagonal-major layout (ndiag, B, imax) and streamed through the scans as xs,
so the scan bodies are pure elementwise VPU work (no gathers); boundary
handling uses iota comparisons.

State order: 0=M, 1=Ix (gap in seq2), 2=Iy (gap in seq1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.models import probcons_params as P
from dafs_tpu.ops.logspace import LOG_ZERO, log_add, probcons_exp

from dafs_tpu.utils import aot

_TABLES = None


def tables():
    # cached as numpy so cross-jit reuse never captures tracers
    global _TABLES
    if _TABLES is None:
        _TABLES = P.log_tables()
    return _TABLES


def _round_up(n, m):
    return -(-n // m) * m


def _shift_right(x, fill):
    """x[..., i] -> x[..., i-1] along the last axis, filling index 0."""
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]], axis=-1
    )


def _shift_left(x, fill):
    return jnp.concatenate(
        [x[..., 1:], jnp.full(x.shape[:-1] + (1,), fill, x.dtype)], axis=-1
    )


@aot.persistent_jit(static_argnames=("l1max", "l2max"))
def forward_backward_posterior(codes1, len1, codes2, len2, *, l1max, l2max):
    """Compute match posteriors for a batch of sequence pairs.

    Args:
      codes1: (B, l1max+1) int32, 1-based codes (index 0 unused).
      len1:   (B,) int32 actual lengths.
      codes2: (B, l2max+1) int32.
      len2:   (B,) int32.
    Returns:
      posterior: (B, l1max, l2max) float32; entry (b,i,j) is the match
      posterior of seq1[i] ~ seq2[j] (0-based), matching
      ProbabilisticModel.h:374-403 (including the EXP/LOG_ADD approximations
      and the (0,0)=0 hack, which falls outside this slice).
    """
    t = {k: jnp.asarray(v) for k, v in tables().items()}
    B = codes1.shape[0]
    imax = l1max + 1  # diagonal index i in [0, l1max]
    ndiag = l1max + l2max + 1

    init_log = t["init"]
    trans = t["trans"]
    match_t = t["match"]
    ins_t = t["ins"]

    i_idx = jnp.arange(imax)[None, :]  # (1, imax)
    len1b = len1[:, None]
    len2b = len2[:, None]

    # --- emissions, gather-free --------------------------------------------
    # 7-letter alphabet (ScoreType/Defaults.h: ACGUTN + pad).
    # The first version prematerialized M_diag[d, b, i] =
    # match(c1[i], c2[d-i]) with an O(ndiag*B*imax) take_along_axis; that
    # gather crashed the TPU worker at L~320.  Instead each scan step takes
    # ONE dynamic slice of the reversed codes2 and resolves the 6-letter
    # alphabet with a one-hot select.
    oh1 = (codes1[:, :imax, None] == jnp.arange(7)[None, None, :]).astype(
        jnp.float32
    )
    match_row = jnp.einsum(
        "bic,cd->bid", oh1, match_t, precision="highest"
    )  # match vs c2 code d; highest: TPU f32, not bf16
    rev2 = codes2[:, ::-1]  # rev2[:, y] = codes2[:, l2max - y]
    OFF = l2max + imax + 2
    r2big = jnp.concatenate(
        [
            jnp.zeros((B, imax + 2), jnp.int32),
            rev2,
            jnp.zeros((B, imax), jnp.int32),
        ],
        axis=1,
    )

    def c2_codes_at(x):
        # w[b, i] = codes2[b, x - i] (0 outside [0, l2max]; consumers mask)
        return jax.lax.dynamic_slice(r2big, (0, OFF - x), (B, imax))

    def emissions_at(x):
        w = c2_codes_at(x)
        m = jnp.zeros((B, imax), jnp.float32)
        e2 = jnp.zeros((B, imax), jnp.float32)
        for cch in range(7):
            selc = w == cch
            m = jnp.where(selc, match_row[:, :, cch], m)
            e2 = jnp.where(selc, ins_t[cch], e2)
        return m, e2

    ins1 = ins_t[codes1[:, :imax]]  # (B, imax): ins score of seq1 char at i
    ins1_next = _shift_left(ins1, jnp.float32(0.0))  # char at i+1

    def fwd_step(carry, xs):
        # state planes kept as separate (B, imax) arrays: a (B, 3, imax)
        # stack wastes ~62% of TPU sublanes on the size-3 middle dim
        (pm0, px0, py0, mm, mx, my) = carry  # diag d-1 then d-2
        d = xs
        m_d, e2_d = emissions_at(d)
        j_idx = d - i_idx  # (1, imax)
        valid = (i_idx <= len1b) & (j_idx >= 0) & (j_idx <= len2b)
        not_init = (i_idx > 1) | (j_idx > 1)

        m_in = _shift_right(mm, LOG_ZERO)
        x_in = _shift_right(mx, LOG_ZERO)
        y_in = _shift_right(my, LOG_ZERO)
        acc = m_in + trans[0, 0]
        acc = log_add(acc, x_in + trans[1, 0])  # k=1 then k=2, as in the C++
        acc = log_add(acc, y_in + trans[2, 0])
        m_new = acc + m_d
        m_ok = valid & not_init & (i_idx > 0) & (j_idx > 0)
        m_new = jnp.where(m_ok, m_new, LOG_ZERO)

        pm = _shift_right(pm0, LOG_ZERO)
        px = _shift_right(px0, LOG_ZERO)
        x_new = ins1 + log_add(pm + trans[0, 1], px + trans[1, 1])
        x_ok = valid & not_init & (i_idx > 0)
        x_new = jnp.where(x_ok, x_new, LOG_ZERO)

        y_new = e2_d + log_add(pm0 + trans[0, 2], py0 + trans[2, 2])
        y_ok = valid & not_init & (j_idx > 0)
        y_new = jnp.where(y_ok, y_new, LOG_ZERO)

        # init cells (ProbabilisticModel.h:122-131)
        m_new = jnp.where((i_idx == 1) & (j_idx == 1), init_log[0] + m_d, m_new)
        x_new = jnp.where(
            (i_idx == 1) & (j_idx == 0) & (1 <= len1b), init_log[1] + ins1, x_new
        )
        y_new = jnp.where(
            (i_idx == 0) & (j_idx == 1) & (1 <= len2b), init_log[2] + e2_d, y_new
        )
        m_new = jnp.where(valid & (i_idx > 0) & (j_idx > 0), m_new, LOG_ZERO)

        return (
            (m_new, x_new, y_new, pm0, px0, py0),
            (m_new, x_new, y_new),
        )

    zero2 = jnp.full((B, imax), LOG_ZERO)
    (_, (fm_d, fx_d, fy_d)) = jax.lax.scan(
        fwd_step, (zero2,) * 6, jnp.arange(ndiag), unroll=2
    )[0:2]
    fdiags = jnp.stack([fm_d, fx_d, fy_d], axis=2)  # (ndiag, B, 3, imax)

    # backward emissions: match/ins at (i+1, j+1) for cell (i, j) on diag d
    # come from diag d+2 shifted left; ins2 at j+1 from diag d+1
    def bwd_step(carry, xs):
        (nm0, nx0, ny0, nm2, nx2, ny2) = carry  # diag d+1 then d+2
        d = xs
        m_n2, _ = emissions_at(d + 2)
        _, e2_n = emissions_at(d + 1)
        j_idx = d - i_idx
        valid = (i_idx >= 0) & (i_idx <= len1b) & (j_idx >= 0) & (j_idx <= len2b)

        match_n = _shift_left(m_n2, jnp.float32(0.0))  # match(c1[i+1], c2[j+1])
        ins2_n = e2_n  # E2_diag[d+1][i] = ins(c2[(d+1)-i]) = ins(c2[j+1])
        ins1_n = ins1_next  # ins(c1[i+1])

        has_m = (i_idx < len1b) & (j_idx < len2b) & valid
        has_x = (i_idx < len1b) & valid
        has_y = (j_idx < len2b) & valid

        bm_11 = _shift_left(nm2, LOG_ZERO)
        bx_n = _shift_left(nx0, LOG_ZERO)
        by_n = ny0

        prob_xy = bm_11 + match_n

        def lpe(x, y, cond):
            return jnp.where(cond, log_add(x, y), x)

        bM = jnp.full((B, imax), LOG_ZERO)
        bX = jnp.full((B, imax), LOG_ZERO)
        bY = jnp.full((B, imax), LOG_ZERO)
        # order matches ProbabilisticModel.h:233-249
        bM = lpe(bM, prob_xy + trans[0, 0], has_m)
        bX = lpe(bX, prob_xy + trans[1, 0], has_m)
        bY = lpe(bY, prob_xy + trans[2, 0], has_m)
        bM = lpe(bM, bx_n + ins1_n + trans[0, 1], has_x)
        bX = lpe(bX, bx_n + ins1_n + trans[1, 1], has_x)
        bM = lpe(bM, by_n + ins2_n + trans[0, 2], has_y)
        bY = lpe(bY, by_n + ins2_n + trans[2, 2], has_y)

        at_end = (i_idx == len1b) & (j_idx == len2b)
        bM = jnp.where(at_end, init_log[0], bM)
        bX = jnp.where(at_end, init_log[1], bX)
        bY = jnp.where(at_end, init_log[2], bY)

        bM = jnp.where(valid, bM, LOG_ZERO)
        bX = jnp.where(valid, bX, LOG_ZERO)
        bY = jnp.where(valid, bY, LOG_ZERO)

        return (
            (bM, bX, bY, nm0, nx0, ny0),
            (bM, bX, bY),
        )

    (_, (bm_d, bx_d, by_d)) = jax.lax.scan(
        bwd_step,
        (zero2,) * 6,
        jnp.arange(ndiag - 1, -1, -1),
        unroll=2,
    )[0:2]
    bdiags = jnp.stack([bm_d, bx_d, by_d], axis=2)[::-1]  # index by d again

    # ---- total probability (ProbabilisticModel.h:337-365) ----
    def diag_cell(diags, i, j):
        # diags: (ndiag, B, 3, imax); i,j: (B,) -> (B, 3)
        d = (i + j)[:, None]
        return diags[d, jnp.arange(B)[:, None], jnp.arange(3)[None, :], i[:, None]]

    f_end = diag_cell(fdiags, len1, len2)
    b_end = diag_cell(bdiags, len1, len2)
    total_f = f_end[:, 0] + b_end[:, 0]
    total_f = log_add(total_f, f_end[:, 1] + b_end[:, 1])
    total_f = log_add(total_f, f_end[:, 2] + b_end[:, 2])

    one = jnp.ones((B,), jnp.int32)
    zero_i = jnp.zeros((B,), jnp.int32)
    f_11 = diag_cell(fdiags, one, one)
    b_11 = diag_cell(bdiags, one, one)
    f_10 = diag_cell(fdiags, one, zero_i)
    b_10 = diag_cell(bdiags, one, zero_i)
    f_01 = diag_cell(fdiags, zero_i, one)
    b_01 = diag_cell(bdiags, zero_i, one)
    total_b = f_11[:, 0] + b_11[:, 0]
    total_b = log_add(total_b, f_10[:, 1] + b_10[:, 1])
    total_b = log_add(total_b, f_01[:, 2] + b_01[:, 2])

    total = (total_f + total_b) / jnp.float32(2.0)

    # ---- posterior (ProbabilisticModel.h:374-403) ----
    # diag-major -> row-major via a pad+reshape shear (gather-free):
    # PD[b, i, d] rows sheared so that row i starts at its own diagonal.
    fm = fdiags[:, :, 0, :]  # (ndiag, B, imax)
    bm = bdiags[:, :, 0, :]
    logp_d = fm + bm - total[None, :, None]
    post_d = probcons_exp(jnp.minimum(jnp.float32(0.0), logp_d))
    PD = jnp.transpose(post_d, (1, 2, 0))  # (B, imax, ndiag)
    W = ndiag  # >= imax + l2max: i + j <= ndiag - 1 for kept (i, j)
    flat = PD.reshape(B, imax * W)
    flat = jnp.concatenate([flat, jnp.zeros((B, imax), flat.dtype)], axis=1)
    sheared = flat.reshape(B, imax, W + 1)  # [b, i, j] = PD[b, i, i + j]
    post = sheared[:, :, : l2max + 1]  # (B, l1max+1, l2max+1)

    valid = (
        (jnp.arange(1, l1max + 1)[None, :, None] <= len1[:, None, None])
        & (jnp.arange(1, l2max + 1)[None, None, :] <= len2[:, None, None])
    )
    return jnp.where(valid, post[:, 1:, 1:], 0.0)


# Pallas kernel batch chunk: measured on v5e, the kernel sustains ~2.2x the
# per-element rate at a 48-row batch (state planes stay register/VMEM-hot
# across the KB sub-steps) versus 96+ rows, so wide all-pairs batches run as
# an in-executable lax.scan over 48-row sub-batches — one dispatch (the axon
# relay charges a fixed ~28 ms stall per dispatch), each iteration at the
# fast narrow-batch rate.  Per-pair results are independent and the kernel's
# per-row computation is batch-size-invariant, so chunking is
# bitwise-neutral (asserted vs the unchunked lax path in tools/bench_pairhmm
# and tests/test_pairhmm.py).
_PALLAS_CHUNK_B = 48


@functools.partial(jax.jit, static_argnames=("l1max", "l2max"))
def _chunked_pallas_fbp(codes1, len1, codes2, len2, *, l1max, l2max):
    from dafs_tpu.ops import pairhmm_pallas

    B = codes1.shape[0]
    CB = _PALLAS_CHUNK_B
    nch = -(-B // CB)
    pad = nch * CB - B
    c1 = jnp.pad(codes1, ((0, pad), (0, 0))).reshape(nch, CB, -1)
    l1 = jnp.pad(len1, (0, pad)).reshape(nch, CB)
    c2 = jnp.pad(codes2, ((0, pad), (0, 0))).reshape(nch, CB, -1)
    l2 = jnp.pad(len2, (0, pad)).reshape(nch, CB)

    def step(_, ch):
        return None, pairhmm_pallas.forward_backward_posterior(
            *ch, l1max=l1max, l2max=l2max
        )

    _, outs = jax.lax.scan(step, None, (c1, l1, c2, l2))
    return outs.reshape(nch * CB, l1max, l2max)[:B]


def best_forward_backward_posterior(codes1, len1, codes2, len2, *, l1max, l2max):
    """Dispatch to the Pallas kernel on TPU (bitwise-identical, faster);
    the lax.scan path elsewhere (CPU backend, virtual meshes)."""
    if jax.devices()[0].platform == "tpu":
        from dafs_tpu.ops import pairhmm_pallas

        B = codes1.shape[0]
        if B <= _PALLAS_CHUNK_B:
            return pairhmm_pallas.forward_backward_posterior(
                codes1, len1, codes2, len2, l1max=l1max, l2max=l2max
            )
        return _chunked_pallas_fbp(
            codes1, len1, codes2, len2, l1max=l1max, l2max=l2max
        )
    return forward_backward_posterior(
        codes1, len1, codes2, len2, l1max=l1max, l2max=l2max
    )


def batch_posteriors(seqs1, seqs2, threshold):
    """Host helper: posteriors for aligned-index pairs of raw strings.

    Returns a list of dense float32 (L1, L2) matrices with entries kept only
    when strictly greater than `threshold` (src/align.cpp:69-78 semantics:
    wrapper zeroes < th, adapter keeps > th).
    """
    if not seqs1:
        return []
    # bucket pad to limit the number of compiled variants
    l1max = _round_up(max(len(s) for s in seqs1), 32)
    l2max = _round_up(max(len(s) for s in seqs2), 32)
    B = len(seqs1)
    codes1 = np.zeros((B, l1max + 1), dtype=np.int32)
    codes2 = np.zeros((B, l2max + 1), dtype=np.int32)
    len1 = np.array([len(s) for s in seqs1], dtype=np.int32)
    len2 = np.array([len(s) for s in seqs2], dtype=np.int32)
    for b, s in enumerate(seqs1):
        codes1[b, 1 : len(s) + 1] = P.encode(s)
    for b, s in enumerate(seqs2):
        codes2[b, 1 : len(s) + 1] = P.encode(s)
    from dafs_tpu.utils import sparsexfer

    # the posterior tensor is mostly exact zeros (probcons_exp maps
    # log-posteriors <= -16 to 0.0); pull it sparse-packed
    post = sparsexfer.pull(
        best_forward_backward_posterior(
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
