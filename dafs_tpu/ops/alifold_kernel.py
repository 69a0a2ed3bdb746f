"""Gather-free RNAalifold consensus partition function (TPU fast path).

TPU-first reformulation of ops/alifold.py's `_ali_inside_outside` (which is
oracle-locked but gather-bound: XLA lowers its per-diagonal index arrays to
scalar loops on TPU).  Design:

- every factor that depends only on one alignment-column *cell* (hairpin
  products, exterior/multiloop mismatch products across sequences, covariance
  factors) is precomputed HOST-side with free numpy gathers into
  diagonal-major planes and read back with dynamic row slices;
- the gap-aware interior-loop stencil is the hard part: per sequence the
  loop sizes (u1, u2) differ from the column offsets (u, v) by the gap
  counts, so the factorization used by ops/mccaskill_kernel.py (categories
  partition the static stencil) does not apply.  Instead the per-sequence
  loop-size pair (u1, u2) is built from static shifts of the `a2s`
  gap-prefix vectors, and every energy lookup becomes a one-hot
  contraction: 31x31 loop-size tables are evaluated as batched (31,31)
  matmuls sandwiched between one-hot(u1)/one-hot(u2); the pair-coupled
  special cases (stack, 1-bulge, 1x1/2x1/2x2 interiors) contract small
  code alphabets (7 pair types x 5 bases) through host-relaid tables,
  with the 7-way pair-type select done as a static loop;
- the consensus product over sequences is then a plain `prod` over the
  materialized (NS, 31, 31, L) per-sequence factor array, and the stencil
  reduction is a tensordot against a diagonal-major qb window.

Semantics replicate _ali_inside_outside exactly (same categories, same
clipping, same scaling); locked by tests/test_alifold_fast.py against it.
Reference semantics: ViennaRNA 2.4.x alipfold.c via src/alifold.cpp:49-84.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.ops import energy_params as ep

from dafs_tpu.utils import aot

TURN = ep.TURN
MAXLOOP = ep.MAXLOOP

# perf-ablation switches (dev only): comma-separated in DAFS_TPU_ABLATE;
# combine with DAFS_TPU_NO_AOT=1 so ablated traces never enter the AOT cache
import os as _os

_ABLATE = frozenset(
    x for x in _os.environ.get("DAFS_TPU_ABLATE", "").split(",") if x
)
SW = MAXLOOP + 1   # stencil width (u, v in [0, 30])
RP = 64            # top/bottom row padding of diag-major buffers (>= 62)
PAD = 34           # column padding for static shift windows (>= SW + 2)

F = np.float32


# =============================== host prep =================================

def build_loop_tables(t: dict) -> dict:
    """31x31 loop-size tables T[u1, u2], one per scalar category.

    Categories mirror intloop_K (ops/alifold.py): entries are ZERO outside
    the category, so the one-hot sandwich auto-masks.  (u1+u2 > 30 cells are
    unreachable within the stencil and left zero.)
    """
    internal = np.asarray(t["internal"], F)
    ninio = np.asarray(t["ninio"], F)
    bulge = np.asarray(t["bulge"], F)
    T_gen = np.zeros((SW, SW), F)
    T_1n = np.zeros((SW, SW), F)
    T_23 = np.zeros((SW, SW), F)
    T_blg = np.zeros((SW, SW), F)
    for u1 in range(SW):
        for u2 in range(SW):
            ns, nl = min(u1, u2), max(u1, u2)
            if u1 + u2 > MAXLOOP:
                continue  # unreachable: u1 <= u, u2 <= v, u+v <= 30
            if nl == 0 or (ns == 0 and nl == 1) or (ns, nl) in (
                (1, 1), (1, 2), (2, 2)
            ):
                continue  # B-group (pair-coupled special cases)
            if ns == 0:
                T_blg[u1, u2] = bulge[nl]
            elif ns == 1:
                T_1n[u1, u2] = internal[min(nl + 1, MAXLOOP)] * ninio[
                    min(nl - 1, MAXLOOP)
                ]
            elif (ns, nl) == (2, 3):
                T_23[u1, u2] = internal[5] * ninio[1]
            else:
                T_gen[u1, u2] = internal[u1 + u2] * ninio[nl - ns]
    return dict(T_gen=T_gen, T_1n=T_1n, T_23=T_23, T_blg=T_blg)


def build_special_tables(t: dict) -> dict:
    """Relaid pair-coupled tables for the staged one-hot contractions.

    Code packings (pair types shifted to 0..6, NN = 6):
      c175 = (tp-1)*25 + b5*5 + b3   (outer: tp, S3[i], S5[j])
      c35  = (t2)*5 + q              (inner: tp2-1, base)
    """
    stack = np.asarray(t["stack"], F)
    i11 = np.asarray(t["i11"], F)
    i21 = np.asarray(t["i21"], F)
    i22 = np.asarray(t["i22"], F)
    T7 = stack[1:8, 1:8]  # [tp-1, tp2-1]
    # i11: D[c175, t2] = i11[tp, t2+1, b5, b3]
    Ti11 = np.zeros((175, 7), F)
    # i21a (u1=1, u2=2): val = i21[tp, tp2, si1, sq1, sj1]
    #   outer c175=(tp,si1,sj1); inner (t2, q=sq1)
    Ti21a = np.zeros((175, 35), F)
    # i21b (u1=2, u2=1): val = i21[tp2, tp, sq1, si1, sp1]
    #   outer c35=(tp,si1); inner (t2, q=sq1), extra sp1 (5) via u-shift
    Ti21b = np.zeros((35, 5, 35), F)
    # i22 (2,2): val = i22[tp, tp2, si1, sp1, sq1, sj1]
    #   outer c175=(tp,si1,sj1); extra sp1 (5) via u-shift; inner (t2, q=sq1)
    Ti22 = np.zeros((175, 5, 35), F)
    for tp in range(1, 8):
        for b5 in range(5):
            for b3 in range(5):
                c = (tp - 1) * 25 + b5 * 5 + b3
                for t2 in range(7):
                    Ti11[c, t2] = i11[tp, t2 + 1, b5, b3]
                    for q in range(5):
                        Ti21a[c, t2 * 5 + q] = i21[tp, t2 + 1, b5, q, b3]
                        for sp1 in range(5):
                            Ti22[c, sp1, t2 * 5 + q] = i22[
                                tp, t2 + 1, b5, sp1, q, b3
                            ]
            c35 = (tp - 1) * 5 + b5
            for sp1 in range(5):
                for t2 in range(7):
                    for q in range(5):
                        Ti21b[c35, sp1, t2 * 5 + q] = i21[
                            t2 + 1, tp, q, b5, sp1
                        ]
    # outside-direction relays: inner code c175_in = (t2)*25 + q*5 + sp1
    Ti21b_o = np.zeros((35, 175), F)
    Ti22_o = np.zeros((175, 175), F)
    for tt in range(7):
        for b in range(5):
            for c in range(5):
                for t2 in range(7):
                    for q in range(5):
                        for sp in range(5):
                            ci = t2 * 25 + q * 5 + sp
                            Ti21b_o[tt * 5 + b, ci] = i21[
                                t2 + 1, tt + 1, q, b, sp
                            ]
                            Ti22_o[tt * 25 + b * 5 + c, ci] = i22[
                                tt + 1, t2 + 1, b, sp, q, c
                            ]
    return dict(T7=T7, Ti11=Ti11, Ti21a=Ti21a, Ti21b=Ti21b, Ti22=Ti22,
                Ti21b_o=Ti21b_o, Ti22_o=Ti22_o,
                blg1=F(np.asarray(t["bulge"], F)[1]))


def _hairpin_plane(t, S, S5, S3, a2s, pt7, tri_code, tetra_code, hexa_code,
                   n, NS, Lp):
    """Consensus hairpin product HP[i, j] (without sc^(d+1)); replicates
    hairpin_prod in ops/alifold.py:125-156 exactly, across sequences."""
    f = np.float64  # accumulate product in f64? no - match f32 prod order
    hairpin = np.asarray(t["hairpin"], F)
    mmH = np.asarray(t["mmH"], F)
    tri = np.asarray(t["tri"], F)
    tetra = np.asarray(t["tetra"], F)
    hexa = np.asarray(t["hexa"], F)
    tau = F(t["tau"])
    lxc = F(t["lxc"])
    HP = np.ones((Lp, Lp), F)
    iidx = np.arange(Lp)
    for s in range(NS):
        ic = iidx[:, None].clip(0, Lp - 1)
        jc = iidx[None, :].clip(0, Lp - 1)
        u = (a2s[s][(jc - 1).clip(0, Lp - 1)] - a2s[s][ic]).clip(min=0)
        tp = pt7[s][ic, jc]
        uc = u.clip(0, MAXLOOP)
        base = hairpin[uc] * np.where(
            u > MAXLOOP, lxc ** (np.log(np.maximum(u, 1).astype(F) / F(30.0))), F(1.0)
        ).astype(F)
        s5 = S3[s][ic]
        s3 = S5[s][jc]
        mm = mmH[tp, s5, s3]
        ta = np.where(tp > 2, tau, F(1.0))
        trv = tri[tri_code[s][ic]]
        tev = tetra[tetra_code[s][ic]]
        hxv = hexa[hexa_code[s][ic]]
        val = np.where(
            u == 3,
            np.where(trv >= 0, trv, base * ta),
            np.where(
                (u == 4) & (tev >= 0),
                tev,
                np.where((u == 6) & (hxv >= 0), hxv, base * mm),
            ),
        ).astype(F)
        val = np.where(u < 3, F(0.0), val)
        val = np.where(a2s[s][ic] < 1, F(1.0), val)
        HP = (HP * val).astype(F)
    return HP


def build_planes(t, S, S5, S3, a2s, pt7, tri_code, tetra_code, hexa_code,
                 n, NS, Lp):
    """All per-cell host planes (numpy, row-major (Lp, Lp))."""
    RT = np.asarray(ep.RTYPE)
    mmI = np.asarray(t["mmI"], F)
    mm1n = np.asarray(t["mm1n"], F)
    mm23 = np.asarray(t["mm23"], F)
    mmM = np.asarray(t["mmM"], F)
    mmExt = np.asarray(t["mmExt"], F)
    d5 = np.asarray(t["d5"], F)
    d3 = np.asarray(t["d3"], F)
    tau = F(t["tau"])
    mli = F(t["mli"])
    mlc = F(t["mlc"])  # already ml_closing**nseq

    iidx = np.arange(Lp)
    ic = iidx[:, None].clip(0, Lp - 1)
    jc = iidx[None, :].clip(0, Lp - 1)

    def tau_of(x):
        return np.where(x > 2, tau, F(1.0))

    # flat-table relays: T175[(tp-1)*25 + b5*5 + b3] == T[tp, b5, b3]
    # (tp in 1..7); one np.take per plane replaces a 3-index fancy gather,
    # and the C175 code planes are reused across the three tables
    mmI175 = np.ascontiguousarray(mmI[1:8].reshape(175))
    mm1n175 = np.ascontiguousarray(mm1n[1:8].reshape(175))
    mm23175 = np.ascontiguousarray(mm23[1:8].reshape(175))
    mmM175 = np.ascontiguousarray(mmM[1:8].reshape(175))
    mmExt175 = np.ascontiguousarray(mmExt[1:8].reshape(175))
    d5f = np.ascontiguousarray(d5.reshape(-1))   # [tp*5 + b]
    d3f = np.ascontiguousarray(d3.reshape(-1))

    # per-seq index planes, vectorized over sequences (no (Lp, Lp) copies:
    # tp IS pt7, neighbor bases broadcast from the S5/S3 vectors)
    tp = pt7                      # (NS, Lp, Lp), values 1..7
    rt = RT[tp]
    si1 = S3[:, :, None]          # base 3' of col i (within seq s)
    sj1 = S5[:, None, :]          # base 5' of col j
    sp1 = S5[:, :, None]
    sq1 = S3[:, None, :]
    C175_OUT = ((tp - 1) * 25 + si1 * 5 + sj1).astype(np.int32)
    C35_OUT = ((tp - 1) * 5 + si1).astype(np.int32)
    C175_IN = ((rt - 1) * 25 + sq1 * 5 + sp1).astype(np.int32)
    C35_IN = ((rt - 1) * 5 + sq1).astype(np.int32)
    TP7 = (tp - 1).astype(np.int32)
    RT7 = (rt - 1).astype(np.int32)

    MMI_OUT = np.take(mmI175, C175_OUT)
    MM1N_OUT = np.take(mm1n175, C175_OUT)
    MM23_OUT = np.take(mm23175, C175_OUT)
    TAU_OUT = tau_of(tp).astype(F)
    MMI_IN = np.take(mmI175, C175_IN)
    MM1N_IN = np.take(mm1n175, C175_IN)
    MM23_IN = np.take(mm23175, C175_IN)
    TAU_IN = tau_of(rt).astype(F)

    # consensus multiloop / exterior products (sequential over s: preserve
    # the reference's ascending-s f32 multiplication order bitwise)
    MLSTEM = np.ones((Lp, Lp), F)
    MLCLOSE = np.ones((Lp, Lp), F)
    EXT = np.ones((Lp, Lp), F)
    ml_f = np.take(mmM175, ((tp - 1) * 25 + sp1 * 5 + sq1)) * TAU_OUT * mli
    mlc_f = np.take(mmM175, ((rt - 1) * 25 + sj1 * 5 + si1)) * TAU_IN * mli
    has5 = ic > 1
    has3 = jc < n
    s5g = np.where(has5[None], sp1, 0)
    s3g = np.where(has3[None], sq1, 0)
    ext_f = np.where(
        (has5 & has3)[None],
        np.take(mmExt175, (tp - 1) * 25 + s5g * 5 + s3g),
        np.where(
            has5[None], np.take(d5f, tp * 5 + s5g),
            np.where(has3[None], np.take(d3f, tp * 5 + s3g), F(1.0)),
        ),
    ) * TAU_OUT
    for s in range(NS):
        MLSTEM = (MLSTEM * ml_f[s]).astype(F)
        MLCLOSE = (MLCLOSE * mlc_f[s]).astype(F)
        EXT = (EXT * ext_f[s]).astype(F)
    MLCLOSE = (MLCLOSE * mlc).astype(F)

    HP = _hairpin_plane(t, S, S5, S3, a2s, pt7, tri_code, tetra_code,
                        hexa_code, n, NS, Lp)
    return dict(
        MMI_OUT=MMI_OUT, MM1N_OUT=MM1N_OUT, MM23_OUT=MM23_OUT, TAU_OUT=TAU_OUT,
        MMI_IN=MMI_IN, MM1N_IN=MM1N_IN, MM23_IN=MM23_IN, TAU_IN=TAU_IN,
        C175_OUT=C175_OUT, C35_OUT=C35_OUT, C175_IN=C175_IN, C35_IN=C35_IN,
        TP7=TP7, RT7=RT7, MLSTEM=MLSTEM, MLCLOSE=MLCLOSE, EXT=EXT, HP=HP,
    )


# =============================== device kernel =============================

def _dyn_rows(x, start, nrows):
    return jax.lax.dynamic_slice(x, (start, 0), (nrows, x.shape[1]))


def _dyn_rows3(x, start, nrows):
    return jax.lax.dynamic_slice(x, (0, start, 0), (x.shape[0], nrows, x.shape[2]))


def _oh(x, n):
    return (x[..., None] == jnp.arange(n)).astype(jnp.float32)


@aot.persistent_jit(static_argnames=("L", "NS"))
def alifold_fast(
    planes, loop_tabs, spec_tabs, psc_fac, allow_pair, allow_unpaired,
    S5b, S3b, A2Sb, n, sc, bsn0, *, L, NS,
):
    """Consensus inside+outside, gather-free.  Returns (pout, Q).

    planes: dict of host planes (row-major (NS?, Lp, Lp)); S5b/S3b/A2Sb:
    (NS, PAD+Lp+PAD) padded per-seq vectors; bsn0 = expMLbase**NS (no sc).
    """
    f = jnp.float32
    Lp = L + 2
    NROWS = Lp + 2 * RP
    idx = jnp.arange(Lp)
    ii = idx
    # bsn0 may be a scalar (expMLbase**NS, the alipfold.c per-column reading)
    # or an (Lp,) per-column vector (expMLbase**(non-gap count), the gap-aware
    # reading; DAFS_TPU_ALIFOLD_MLBASE=base) — see consensus_bp.
    vector_bsn = getattr(bsn0, "ndim", 0) == 1
    bsn = bsn0 * sc

    # ---- diag-major conversions (one-time iota gathers) -------------------
    dd_g = jnp.arange(Lp)[:, None]
    colg = jnp.clip(ii[None, :] + dd_g, 0, Lp - 1)
    inb = (ii[None, :] + dd_g) <= (Lp - 1)

    def to_ldiag(M, fill=0.0):
        zfill = jnp.asarray(fill, M.dtype)
        body = jnp.where(inb, M[ii[None, :], colg], zfill)
        out = jnp.full((NROWS, Lp), zfill, M.dtype)
        return out.at[RP : RP + Lp].set(body)

    to_ldiag_s = jax.vmap(to_ldiag)  # over seq axis

    P = planes
    HPL = to_ldiag(P["HP"])
    EXTL = to_ldiag(P["EXT"])
    MLSTEML = to_ldiag(P["MLSTEM"])
    MLCLOSEL = to_ldiag(P["MLCLOSE"])
    PSCL = to_ldiag(psc_fac.astype(f))
    APL = to_ldiag(allow_pair.astype(f))
    # A-group planes: stack the stencil-side channels [4 cats x NS]
    IN_ST = jnp.concatenate(
        [to_ldiag_s(P["MMI_IN"]), to_ldiag_s(P["MM1N_IN"]),
         to_ldiag_s(P["MM23_IN"]), to_ldiag_s(P["TAU_IN"])], axis=0
    )  # (4NS, NROWS, Lp)
    OUT_ST = jnp.concatenate(
        [to_ldiag_s(P["MMI_OUT"]), to_ldiag_s(P["MM1N_OUT"]),
         to_ldiag_s(P["MM23_OUT"]), to_ldiag_s(P["TAU_OUT"])], axis=0
    )
    # per-diag row reads (outer side inside / inner side outside)
    OUTROWS = OUT_ST     # same buffer; read rows per diagonal
    INROWS = IN_ST
    TP7L = to_ldiag_s(P["TP7"])    # (NS, NROWS, Lp) int
    RT7L = to_ldiag_s(P["RT7"])
    C175OL = to_ldiag_s(P["C175_OUT"])
    C35OL = to_ldiag_s(P["C35_OUT"])
    C175IL = to_ldiag_s(P["C175_IN"])
    C35IL = to_ldiag_s(P["C35_IN"])

    T7 = spec_tabs["T7"]
    Ti11 = spec_tabs["Ti11"]
    Ti21a = spec_tabs["Ti21a"]
    Ti21b = spec_tabs["Ti21b"]       # (35, 5, 35)
    Ti22 = spec_tabs["Ti22"]         # (175, 5, 35)
    Ti21b_o = spec_tabs["Ti21b_o"]   # (35, 175)
    Ti22_o = spec_tabs["Ti22_o"]     # (175, 175)
    blg1 = spec_tabs["blg1"]

    # ---- static shift tensors (no d dependence) ---------------------------
    base_a2s = jax.lax.dynamic_slice(A2Sb, (0, PAD), (NS, Lp))
    U1 = jnp.stack(
        [jax.lax.dynamic_slice(A2Sb, (0, PAD + u), (NS, Lp)) - base_a2s
         for u in range(SW)], axis=1
    ).clip(0)                                     # (NS, SW, Lp) int
    SP1u = jnp.stack(
        [jax.lax.dynamic_slice(S5b, (0, PAD + 1 + u), (NS, Lp))
         for u in range(SW)], axis=1
    )                                             # S5[s, i+1+u]
    base_m1 = jax.lax.dynamic_slice(A2Sb, (0, PAD - 1), (NS, Lp))
    U1o = jnp.stack(
        [base_m1 - jax.lax.dynamic_slice(A2Sb, (0, PAD - 1 - u), (NS, Lp))
         for u in range(SW)], axis=1
    ).clip(0)                                     # a2s[i-1] - a2s[i-1-u]
    SI1ou = jnp.stack(
        [jax.lax.dynamic_slice(S3b, (0, PAD - 1 - u), (NS, Lp))
         for u in range(SW)], axis=1
    )                                             # S3[s, i-1-u]

    OH31U1 = _oh(U1, SW)
    OH5SP1u = _oh(SP1u, 5)
    OH31U1o = _oh(U1o, SW)
    OH5SI1ou = _oh(SI1ou, 5)

    Tg = {k: jnp.asarray(v) for k, v in loop_tabs.items()}
    # pre-contract the u1 side of the loop-size sandwiches
    W1 = {k: jnp.einsum("suia,ab->suib", OH31U1, Tg[k]) for k in Tg}
    W1o = {k: jnp.einsum("suia,ab->suib", OH31U1o, Tg[k]) for k in Tg}

    SCP = jnp.asarray(
        np.fromfunction(
            lambda u, v: np.where(u + v <= MAXLOOP, 1.0, 0.0), (SW, SW)
        ),
        f,
    ) * sc ** (
        jnp.arange(SW)[:, None] + jnp.arange(SW)[None, :] + 2
    ).astype(f)

    # blocked-segment factors (consensus level; matches ops/alifold.py:110-116)
    logv = jnp.where((idx >= 1) & (idx <= n) & allow_unpaired, 1.0, 0.0)
    blocked_pref = jnp.cumsum(jnp.where(idx >= 1, 1.0 - logv, 0.0))
    seg_len = idx[None, :] - idx[:, None] + 1
    seg_blocked = blocked_pref[None, :] - blocked_pref[jnp.maximum(idx[:, None] - 1, 0)]
    if vector_bsn:
        # product over the segment's per-column factors via log prefix sums
        lb = jnp.cumsum(jnp.where(idx >= 1, jnp.log(jnp.maximum(bsn, 1e-30)), 0.0))
        seg_pow = jnp.exp(lb[None, :] - lb[jnp.maximum(idx[:, None] - 1, 0)])
    else:
        seg_pow = bsn ** seg_len.astype(f)
    bs_seg = jnp.where(
        seg_len <= 0, 1.0,
        jnp.where(seg_blocked > 0, 0.0, seg_pow),
    )

    def pad_rows(x, top, bottom):
        return jnp.concatenate(
            [jnp.zeros((top, x.shape[1]), x.dtype), x,
             jnp.zeros((bottom, x.shape[1]), x.dtype)], axis=0
        )

    def ldiag_row(B, d):
        return _dyn_rows(B, d + RP, 1)[0]

    def ldiag_row3(B, d):
        return _dyn_rows3(B, d + RP, 1)[:, 0]

    def write_row(B, d, vec):
        return jax.lax.dynamic_update_slice(B, vec[None, :], (d + RP, 0))

    def stencil_in(CH, d):
        """CH (C, NROWS, Lp) -> (C, SW, SW, Lp): [c,u,v,i] = CH[c, d-2-u-v, i+1+u]."""
        s61 = _dyn_rows3(CH, d + RP - 62, 61)
        padc = jnp.concatenate(
            [s61, jnp.zeros((CH.shape[0], 61, SW + 2), CH.dtype)], axis=2
        )
        blocks = [
            padc[:, 30 - u : 61 - u][:, ::-1, 1 + u : 1 + u + Lp]
            for u in range(SW)
        ]
        return jnp.stack(blocks, axis=1)

    def stencil_out(CH, d):
        """[c,u,v,i] = CH[c, d+2+u+v, i-1-u]."""
        s61 = _dyn_rows3(CH, d + RP + 2, 61)
        padc = jnp.concatenate(
            [jnp.zeros((CH.shape[0], 61, SW + 2), CH.dtype), s61], axis=2
        )
        blocks = [
            padc[:, u : u + SW][:, :, SW + 1 - u : SW + 1 - u + Lp]
            for u in range(SW)
        ]
        return jnp.stack(blocks, axis=1)

    def dwin(big, d, off):
        """w[x] = big[:, PAD + d + off - 30 + x], x in [0, 30+Lp)."""
        return jax.lax.dynamic_slice(big, (0, PAD + d + off - 30), (NS, 30 + Lp))

    def interior_K(d, U2, SQ1v, OUTrow, INst, TP2st, Dl):
        """Per-seq interior factors K (NS, SW, SW, Lp) for this diagonal.

        U2/SQ1v: (NS, SW, Lp) v-indexed; OUTrow: (4NS, Lp) per-diag A-group
        outer rows; INst: (4NS, SW, SW, Lp) A-group stencil; TP2st:
        (NS, SW, SW, Lp) inner pair types 0..6; Dl: dict of per-diag
        B-group contractions.
        """
        OH31U2 = _oh(U2, SW)
        OH5SQ1v = _oh(SQ1v, 5)
        # A group: sum over categories of out * T[u1,u2] * in.
        # All contractions against one-hot operands are explicit
        # broadcast-multiply-reduces, NOT dots: exactly one term per sum is
        # nonzero (bitwise order-independent), and XLA would otherwise pad
        # each tiny batched 31x31x31 dot to 128^3 MXU tiles (~1% utilization
        # -- measured ~7.7ms/dot/diagonal at L=300).
        def cat(kname, ci):
            W = Dl["W1"][kname]                          # (NS, SW, Lp, 31)
            Tval = jnp.sum(
                W[:, :, None, :, :] * OH31U2[:, None, :, :, :], axis=-1
            )                                            # (NS, SW, SW, Lp)
            outr = OUTrow[ci * NS : (ci + 1) * NS]      # (NS, Lp)
            inst = INst[ci * NS : (ci + 1) * NS]        # (NS, SW, SW, Lp)
            return outr[:, None, None, :] * Tval * inst

        if "noA" in _ABLATE:
            K = jnp.zeros((NS, SW, SW, INst.shape[-1]), f)
        else:
            K = cat("T_gen", 0) + cat("T_1n", 1) + cat("T_23", 2) + cat("T_blg", 3)
        if "noB" in _ABLATE:
            return K

        # B group: category masks from per-seq loop sizes
        U1l = Dl["U1"]
        m_u = [(U1l == a).astype(f) for a in range(3)]   # (NS, SW, Lp)
        m_v = [(U2 == b).astype(f) for b in range(3)]

        def mm(a, b):
            return m_u[a][:, :, None, :] * m_v[b][:, None, :, :]

        m00, m01, m10 = mm(0, 0), mm(0, 1), mm(1, 0)
        m11, m12, m21, m22 = mm(1, 1), mm(1, 2), mm(2, 1), mm(2, 2)

        Bv = jnp.zeros_like(K)
        for t2 in range(7):
            sel = (TP2st == t2).astype(f)
            # stack / 1-bulges / 1x1 (inner alphabet: pair type only)
            v_sb = (
                Dl["Dstack"][:, :, t2][:, None, None, :]
                * (m00 + blg1 * (m01 + m10))
                + Dl["Di11"][:, :, t2][:, None, None, :] * m11
            )
            # i21a: inner (t2, sq1); no u-dependence
            Da = Dl["Di21a"][:, :, t2 * 5 : t2 * 5 + 5]  # (NS, Lp, 5)
            Ea = jnp.sum(OH5SQ1v * Da[:, None, :, :], axis=-1)
            # i21b / i22: u-dependent (sp1) contractions
            Db = Dl["D21b"][:, :, :, t2 * 5 : t2 * 5 + 5]  # (NS, SW, Lp, 5)
            Eb = jnp.sum(
                OH5SQ1v[:, None, :, :, :] * Db[:, :, None, :, :], axis=-1
            )
            D2 = Dl["D22"][:, :, :, t2 * 5 : t2 * 5 + 5]
            E2 = jnp.sum(
                OH5SQ1v[:, None, :, :, :] * D2[:, :, None, :, :], axis=-1
            )
            Bv = Bv + sel * (
                v_sb + Ea[:, None, :, :] * m12 + Eb * m21 + E2 * m22
            )
        return K + Bv

    # =========================== INSIDE ====================================
    def inside_step(carry, d):
        qb_mat, qm, qm1, qm1_prev, QBL = carry
        j_vec = ii + d
        jc = jnp.clip(j_vec, 0, Lp - 1)
        cell_ok = (ii >= 1) & (j_vec <= n)
        pair_ok = cell_ok & (d > TURN) & (ldiag_row(APL, d) > 0)

        hp = ldiag_row(HPL, d) * sc ** (d + 1).astype(f)

        # interior stencil
        win_a2s = dwin(A2Sb, d, -1)
        z0 = win_a2s[:, 30:30 + Lp]
        U2 = jnp.stack(
            [z0 - win_a2s[:, 30 - v : 30 - v + Lp] for v in range(SW)], axis=1
        ).clip(0)
        win_s3 = dwin(S3b, d, -1)
        SQ1v = jnp.stack(
            [win_s3[:, 30 - v : 30 - v + Lp] for v in range(SW)], axis=1
        )
        OUTrow = ldiag_row3(OUTROWS, d)           # (4NS, Lp)
        INst = stencil_in(IN_ST, d)               # (4NS, SW, SW, Lp)
        TP2st = stencil_in(RT7L, d)               # (NS, SW, SW, Lp) int
        # per-diag B-group pre-contractions (outer side)
        oh7 = _oh(ldiag_row3(TP7L, d), 7)          # (NS, Lp, 7)
        oh175 = _oh(ldiag_row3(C175OL, d), 175)
        oh35 = _oh(ldiag_row3(C35OL, d), 35)
        Dl = dict(
            W1=W1, U1=U1,
            Dstack=jnp.einsum("sit,tc->sic", oh7, T7),
            Di11=jnp.einsum("sia,ac->sic", oh175, Ti11),
            Di21a=jnp.einsum("sia,ac->sic", oh175, Ti21a),
            D21b=jnp.sum(
                OH5SP1u[..., None]
                * jnp.einsum("sia,abc->sibc", oh35, Ti21b)[:, None], axis=3
            ),
            D22=jnp.sum(
                OH5SP1u[..., None]
                * jnp.einsum("sia,abc->sibc", oh175, Ti22)[:, None], axis=3
            ),
        )
        if "noint" in _ABLATE:
            interior = jnp.zeros((Lp,), f)
        else:
            K = interior_K(d, U2, SQ1v, OUTrow, INst, TP2st, Dl)
            Kp = jnp.prod(K, axis=0)               # (SW, SW, Lp)
            M2qb = stencil_in(QBL[None], d)[0]
            interior = jnp.einsum("uvi,uvi,uv->i", M2qb, Kp, SCP)

        # multiloop closing (mccaskill_kernel.py pattern, consensus factors)
        qm_sh = jnp.zeros((Lp, Lp), f).at[: Lp - 1, 1:].set(qm[1:, : Lp - 1])
        qm1T_big = pad_rows(qm1.T, 4, Lp + 4)
        qm1_rows = _dyn_rows(qm1T_big, d - 1 + 4, Lp)
        kk = ii[None, :]
        mlk = (kk >= ii[:, None] + 2) & (kk <= j_vec[:, None] - 1)
        mlsum = jnp.sum(jnp.where(mlk, qm_sh * qm1_rows, 0.0), axis=1)
        ml = mlsum * ldiag_row(MLCLOSEL, d) * sc * sc

        qb_new = jnp.where(
            pair_ok, (hp + interior + ml) * ldiag_row(PSCL, d), 0.0
        )

        gate_j = jnp.where((j_vec <= n) & allow_unpaired[jc], 1.0, 0.0)
        bsn_j = bsn[jc] if vector_bsn else bsn
        qm1_new = jnp.where(
            cell_ok,
            qm1_prev * bsn_j * gate_j + qb_new * ldiag_row(MLSTEML, d),
            0.0,
        )
        # diagonal writes as mask-selects: TPU lowers scatters to slow
        # sequential loops, while a (Lp, Lp) where() is pure VPU work
        dmask = (ii[None, :] - ii[:, None]) == d
        qm1 = jnp.where(dmask, qm1_new[:, None], qm1)

        pre = jnp.zeros((Lp, Lp), f).at[:, 1:].set(
            bs_seg[:, : Lp - 1] + qm[:, : Lp - 1]
        )
        qm1T2_big = pad_rows(qm1.T, 4, Lp + 4)
        qm1_rows2 = _dyn_rows(qm1T2_big, d + 4, Lp)
        kmask = (kk >= ii[:, None]) & (kk <= j_vec[:, None])
        qm_new = jnp.where(
            cell_ok, jnp.sum(jnp.where(kmask, pre * qm1_rows2, 0.0), axis=1), 0.0
        )
        qm = jnp.where(dmask, qm_new[:, None], qm)
        qb_mat = jnp.where(dmask, qb_new[:, None], qb_mat)
        QBL = write_row(QBL, d, qb_new)
        return (qb_mat, qm, qm1, qm1_new, QBL), None

    Z0 = jnp.zeros((Lp, Lp), f)
    B0 = jnp.zeros((NROWS, Lp), f)
    carry0 = (Z0, Z0, Z0, jnp.zeros((Lp,), f), B0)
    (qb_mat, qm, qm1, _, QBL), _ = jax.lax.scan(
        inside_step, carry0, jnp.arange(1, Lp - 1)
    )

    # =========================== EXTERIOR ==================================
    ext_m = P["EXT"]
    qb_ext = qb_mat * ext_m

    def q1_step(carry, j):
        q1 = carry
        gate_j = jnp.where(allow_unpaired[jnp.clip(j, 0, Lp - 1)], 1.0, 0.0)
        col = jax.lax.dynamic_slice(qb_ext, (0, j), (Lp, 1))[:, 0]
        stems = jnp.sum(
            jnp.where((ii >= 1) & (ii <= j), jnp.roll(q1, 1) * col, 0.0)
        )
        val = q1[jnp.clip(j - 1, 0, Lp - 1)] * sc * gate_j + stems
        q1 = q1.at[j].set(jnp.where(j <= n, val, q1[jnp.clip(j, 0, Lp - 1)]), mode="drop")
        return q1, None

    q1, _ = jax.lax.scan(
        q1_step, jnp.zeros((Lp,), f).at[0].set(1.0), jnp.arange(1, Lp - 1)
    )

    def qn_step(carry, i):
        qn = carry
        gate_i = jnp.where(allow_unpaired[jnp.clip(i, 0, Lp - 1)], 1.0, 0.0)
        rowv = jax.lax.dynamic_slice(qb_ext, (i, 0), (1, Lp))[0]
        stems = jnp.sum(
            jnp.where((ii >= i) & (ii <= n), rowv * jnp.roll(qn, -1), 0.0)
        )
        val = qn[jnp.clip(i + 1, 0, Lp - 1)] * sc * gate_i + stems
        qn = qn.at[i].set(jnp.where(i <= n, val, qn[jnp.clip(i, 0, Lp - 1)]), mode="drop")
        return qn, None

    qn_init = jnp.zeros((Lp,), f).at[jnp.clip(n + 1, 0, Lp - 1)].set(1.0)
    qn, _ = jax.lax.scan(qn_step, qn_init, jnp.arange(Lp - 2, 0, -1))
    Q = q1[jnp.clip(n, 0, Lp - 1)]

    # =========================== OUTSIDE ===================================
    EXL = to_ldiag(ext_m)
    qmT_big = pad_rows(qm.T, 4, Lp + 4)
    bsT_big = pad_rows(bs_seg.T, 4, Lp + 4)
    qm_rows_big = pad_rows(qm, 4, Lp + 4)
    bs_rows_big = pad_rows(bs_seg, 4, Lp + 4)
    q1_big = jnp.concatenate([jnp.zeros(4, f), q1, jnp.zeros(Lp + 4, f)])
    qn_big = jnp.concatenate([jnp.zeros(4, f), qn, jnp.zeros(Lp + 4, f)])
    # outside A-group stencil channels: OUT planes (outer cells) + psc
    OUT_PSC = jnp.concatenate([OUT_ST, PSCL[None]], axis=0)

    def pad_cols2(x, left, right):
        return jnp.concatenate(
            [jnp.zeros((x.shape[0], left), x.dtype), x,
             jnp.zeros((x.shape[0], right), x.dtype)], axis=1
        )

    def outside_step(carry, d):
        pout, A1, A2, CL = carry
        j_vec = ii + d
        jc = jnp.clip(j_vec, 0, Lp - 1)
        pair_ok = (ii >= 1) & (j_vec <= n) & (d > TURN) & (ldiag_row(APL, d) > 0)

        w_ext = (
            jax.lax.dynamic_slice(q1_big, (4 - 1,), (Lp,))
            * jax.lax.dynamic_slice(qn_big, (d + 1 + 4,), (Lp,))
            * ldiag_row(EXL, d)
            / Q
        )

        # interior (outer pairs above): per-seq loop sizes, outside roles
        win_a2s = dwin(A2Sb, d, 0)      # w[x] = a2s[i + d - 30 + x]
        z0o = win_a2s[:, 30:30 + Lp]    # a2s[i+d] = a2s[j]
        U2o = jnp.stack(
            [jax.lax.dynamic_slice(A2Sb, (0, PAD + d + v), (NS, Lp)) - z0o
             for v in range(SW)], axis=1
        ).clip(0)                        # a2s[j+v] - a2s[j] (v'th: a2s[l-1]-a2s[j])
        SJ1ov = jnp.stack(
            [jax.lax.dynamic_slice(S5b, (0, PAD + d + 1 + v), (NS, Lp))
             for v in range(SW)], axis=1
        )                                # S5[s, j+1+v] = S5[s, l]
        INrow = ldiag_row3(INROWS, d)    # (4NS, Lp): inner-side factors here
        OUTst_all = stencil_out(OUT_PSC, d)
        OUTst = OUTst_all[: 4 * NS]
        PSCst = OUTst_all[4 * NS]
        TPst = stencil_out(TP7L, d)      # outer pair types (NS,SW,SW,Lp)

        OH31U2o = _oh(U2o, SW)
        OH5SJ1ov = _oh(SJ1ov, 5)
        # per-diag inner-side contractions
        oh7rt = _oh(ldiag_row3(RT7L, d), 7)       # tp2 = RT[tp(i,j)]
        oh175in = _oh(ldiag_row3(C175IL, d), 175)
        oh35in = _oh(ldiag_row3(C35IL, d), 35)
        Dstack_o = jnp.einsum("sic,tc->sit", oh7rt, T7)     # (NS, Lp, 7)
        Di11_o = jnp.einsum("sit,ct->sic", oh7rt, Ti11)     # (NS, Lp, 175)
        Di21a_o = jnp.einsum("sim,cm->sic", oh35in, Ti21a)  # (NS, Lp, 175)
        D21b_o = jnp.einsum("sim,cm->sic", oh175in, Ti21b_o)  # (NS, Lp, 35)
        D22_o = jnp.einsum("sim,cm->sic", oh175in, Ti22_o)    # (NS, Lp, 175)

        def catv(kname, ci):
            W = W1o[kname]                               # (NS, SW, Lp, 31)
            Tval = jnp.sum(
                W[:, :, None, :, :] * OH31U2o[:, None, :, :, :], axis=-1
            )
            inr = INrow[ci * NS : (ci + 1) * NS]
            outst = OUTst[ci * NS : (ci + 1) * NS]
            return inr[:, None, None, :] * Tval * outst

        if "noA" in _ABLATE:
            K = jnp.zeros((NS, SW, SW, Lp), f)
        else:
            K = catv("T_gen", 0) + catv("T_1n", 1) + catv("T_23", 2) + catv("T_blg", 3)

        m_u = [(U1o == a).astype(f) for a in range(3)]
        m_v = [(U2o == b).astype(f) for b in range(3)]

        def mmk(a, b):
            return m_u[a][:, :, None, :] * m_v[b][:, None, :, :]

        m00, m01, m10 = mmk(0, 0), mmk(0, 1), mmk(1, 0)
        m11, m12, m21, m22 = mmk(1, 1), mmk(1, 2), mmk(2, 1), mmk(2, 2)

        Bv = jnp.zeros_like(K)
        for t in range(7) if "noB" not in _ABLATE else ():
            sel = (TPst == t).astype(f)
            v_sb = Dstack_o[:, :, t][:, None, None, :] * (
                m00 + blg1 * (m01 + m10)
            )
            # i11/i21a: stencil (t, si1, sj1) staged via (b, c); all one-hot
            # contractions as explicit broadcast-reduces (see cat())
            def _ec(Dv):  # (s,v,i,b) = sum_c OH5SJ1ov[s,v,i,c] * Dv[s,i,b,c]
                return jnp.sum(
                    OH5SJ1ov[:, :, :, None, :] * Dv[:, None, :, :, :], axis=-1
                )

            def _eu(Ec):  # (s,u,v,i) = sum_b OH5SI1ou[s,u,i,b] * Ec[s,v,i,b]
                return jnp.sum(
                    OH5SI1ou[:, :, None, :, :] * Ec[:, None, :, :, :], axis=-1
                )

            Dv11 = Di11_o[:, :, t * 25 : (t + 1) * 25].reshape(NS, Lp, 5, 5)
            E11 = _eu(_ec(Dv11))
            Dva = Di21a_o[:, :, t * 25 : (t + 1) * 25].reshape(NS, Lp, 5, 5)
            Ea = _eu(_ec(Dva))
            # i21b: stencil (t, si1) only
            Db_o = D21b_o[:, :, t * 5 : t * 5 + 5]       # (NS, Lp, 5)
            Eb = jnp.sum(OH5SI1ou * Db_o[:, None, :, :], axis=-1)
            # i22: stencil (t, si1, sj1)
            Dv2 = D22_o[:, :, t * 25 : (t + 1) * 25].reshape(NS, Lp, 5, 5)
            E2 = _eu(_ec(Dv2))
            Bv = Bv + sel * (
                v_sb + E11 * m11 + Ea * m12 + Eb[:, :, None, :] * m21 + E2 * m22
            )
        if "noint" in _ABLATE:
            w_int = jnp.zeros((Lp,), f)
        else:
            Kp = jnp.prod(K + Bv, axis=0) * PSCst
            M2C = stencil_out(CL[None], d)[0]
            w_int = jnp.einsum("uvi,uvi,uv->i", M2C, Kp, SCP)

        # multiloop outside (mccaskill_kernel.py pattern)
        qm_r = _dyn_rows(qm_rows_big, d + 1 + 4, Lp)
        qm_r = jnp.zeros((Lp, Lp), f).at[:, 1:].set(qm_r[:, : Lp - 1])
        e_r = _dyn_rows(bs_rows_big, d + 1 + 4, Lp)
        e_r = jnp.zeros((Lp, Lp), f).at[:, 1:].set(e_r[:, : Lp - 1])
        ll = ii[None, :]
        lmask = (ll >= j_vec[:, None] + 1) & (ll <= n)
        mlsum = jnp.sum(jnp.where(lmask, (A1 + A2) * qm_r + A1 * e_r, 0.0), axis=1)
        w_ml = mlsum * ldiag_row(MLSTEML, d)

        qb_vec = ldiag_row(QBL, d)
        pnew = jnp.where(pair_ok, qb_vec * (w_ext + w_int + w_ml), 0.0)
        dmask = (ii[None, :] - ii[:, None]) == d
        pout = jnp.where(dmask, pnew[:, None], pout)

        qb_safe_vec = jnp.where(qb_vec > 0, qb_vec, 1.0)
        Cvec_i = (
            pnew / qb_safe_vec * ldiag_row(PSCL, d)
            * ldiag_row(MLCLOSEL, d) * sc * sc
        )
        Cvec_big = jnp.concatenate([jnp.zeros(Lp + 4, f), Cvec_i, jnp.zeros(Lp + 4, f)])
        Cvec_ld = jax.lax.dynamic_slice(Cvec_big, (Lp + 4 - d,), (Lp,))
        qmT_sh = _dyn_rows(qmT_big, 4 - 1, Lp)
        qmT_sh_big = pad_cols2(qmT_sh, Lp, Lp)
        U1qm = jax.lax.dynamic_slice(qmT_sh_big, (0, Lp + 1 - d), (Lp, Lp))
        bsT_sh = _dyn_rows(bsT_big, 4 - 1, Lp)
        bsT_sh_big = pad_cols2(bsT_sh, Lp, Lp)
        U2bs = jax.lax.dynamic_slice(bsT_sh_big, (0, Lp + 1 - d), (Lp, Lp))
        kd_of_ld = ll - d
        iok = (ii[:, None] > kd_of_ld) & (ii[:, None] < ll) & (kd_of_ld >= 1) & (ll <= n)
        A1 = A1 + jnp.where(iok, Cvec_ld[None, :] * U1qm, 0.0)
        A2 = A2 + jnp.where(iok, Cvec_ld[None, :] * U2bs, 0.0)

        CL = write_row(CL, d, pnew / qb_safe_vec)
        return (pout, A1, A2, CL), None

    carry1 = (Z0, Z0, Z0, B0)
    (pout, _, _, _), _ = jax.lax.scan(
        outside_step, carry1, jnp.arange(Lp - 2, 0, -1)
    )
    return pout, Q
