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

# Staircase decomposition of the interior stencil's valid triangle
# (u + v <= MAXLOOP): (v0, v1, u_ext) blocks jointly covering every valid
# (u, v) cell (u < u_ext = SW - v0 suffices since u <= MAXLOOP - v <= 30 - v0).
# Cells inside a block with u + v > 30 are zeroed by SCP / the loop tables,
# exactly as in the full-square evaluation; only the f32 reduction
# association changes (4 partial sums).  This cuts the dense stencil work
# ~1.6x and, because u2 <= v < v1, lets every one-hot loop-size contraction
# truncate its 31-wide table axis to v1 (~3.2x on the Tval term).
# Disable with DAFS_TPU_ABLATE=nostair (full-square reference path).
STAIR = ((0, 8, 31), (8, 16, 23), (16, 24, 15), (24, 31, 7))

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
    # Separable forms of the three non-general categories (used by the fast
    # A-group path): each lives on u1/u2 lines, so
    #   T_blg[u1,u2] = [u1==0]*BU[u2] + BU[u1]*[u2==0]        (BU = bulge, >=2)
    #   T_1n [u1,u2] = [u1==1]*F1N[u2] + F1N[u1]*[u2==1]      (F1N gated >=3)
    #   T_23 [u1,u2] = C23*([u1==2][u2==3] + [u1==3][u2==2])
    # replacing their 31-wide one-hot table contractions with elementwise
    # products of per-(s,u,i)/(s,v,j) planes.  Zero-gating reproduces the
    # category partition exactly (B-group cells excluded by construction).
    BU = np.where(np.arange(SW) >= 2, bulge[:SW], 0.0).astype(F)
    F1N = np.array(
        [
            internal[min(x + 1, MAXLOOP)] * ninio[min(x - 1, MAXLOOP)]
            if x >= 3 else 0.0
            for x in range(SW)
        ],
        F,
    )
    C23 = F(internal[5] * ninio[1])
    return dict(T_gen=T_gen, T_1n=T_1n, T_23=T_23, T_blg=T_blg,
                BU=BU, F1N=F1N, C23=C23)


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


def build_gtabs(t: dict) -> dict:
    """(25, 25) side-code tables for the per-seq A-group/code planes.

    Every per-sequence (NS, Lp, Lp) plane that build_planes used to
    materialize host-side is a pure function of a 25-state i-side code and a
    25-state j-side code (base x nearest-non-gap neighbor), so the kernel
    builds them ON DEVICE as two exact one-hot contractions per plane
    (HBM-resident, zero host->device transfer; ~55 MB/call saved at NS=10
    L=320, which dominated wall time over the axon relay).  Codes:

      OUT-side planes index [u = S_i*5 + S3_i, v = S_j*5 + S5_j]
      IN-side  planes index [u = S_i*5 + S5_i, v = S_j*5 + S3_j]

    Values are identical to the old host np.take lookups; one-hot matmuls
    at HIGHEST precision reproduce them bitwise (exactly one nonzero term
    per output element).
    """
    RT = np.asarray(ep.RTYPE)
    mmI175 = np.ascontiguousarray(np.asarray(t["mmI"], F)[1:8].reshape(175))
    mm1n175 = np.ascontiguousarray(np.asarray(t["mm1n"], F)[1:8].reshape(175))
    mm23175 = np.ascontiguousarray(np.asarray(t["mm23"], F)[1:8].reshape(175))
    tau = F(t["tau"])

    bi = (np.arange(25) // 5)[:, None]   # base at i (0..4)
    xi = (np.arange(25) % 5)[:, None]    # neighbor letter on the i side
    bj = (np.arange(25) // 5)[None, :]
    yj = (np.arange(25) % 5)[None, :]
    tp = np.asarray(ep.BP_PAIR)[bi, bj].astype(np.int32)
    tp[tp == 0] = 7
    rt = RT[tp]

    # OUT: xi = S3_i, yj = S5_j  (outer pair mismatch letters)
    c175_out = ((tp - 1) * 25 + xi * 5 + yj).astype(np.int32)
    c35_out = ((tp - 1) * 5 + xi).astype(np.int32)
    # IN: xi = S5_i, yj = S3_j  (inner pair, reversed type)
    c175_in = ((rt - 1) * 25 + yj * 5 + xi).astype(np.int32)
    c35_in = ((rt - 1) * 5 + yj).astype(np.int32)

    def tau_of(x):
        return np.where(x > 2, tau, F(1.0)).astype(F)

    return dict(
        G_MMI_OUT=np.take(mmI175, c175_out),
        G_MM1N_OUT=np.take(mm1n175, c175_out),
        G_MM23_OUT=np.take(mm23175, c175_out),
        G_TAU_OUT=tau_of(tp),
        G_MMI_IN=np.take(mmI175, c175_in),
        G_MM1N_IN=np.take(mm1n175, c175_in),
        G_MM23_IN=np.take(mm23175, c175_in),
        G_TAU_IN=tau_of(rt),
        G_C175_OUT=c175_out.astype(F),
        G_C35_OUT=c35_out.astype(F),
        G_C175_IN=c175_in.astype(F),
        G_C35_IN=c35_in.astype(F),
        G_TP7=(tp - 1).astype(F),
        G_RT7=(rt - 1).astype(F),
    )


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
    """Consensus-level host planes (numpy, row-major (Lp, Lp)): the
    sequential-over-s f32 products (MLSTEM/MLCLOSE/EXT, whose multiply order
    is bitwise-significant) and the hairpin product.  The per-sequence
    A-group/code planes moved on-device (build_gtabs + alifold_fast)."""
    RT = np.asarray(ep.RTYPE)
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
    # (tp in 1..7); one np.take per plane replaces a 3-index fancy gather
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
    TAU_OUT = tau_of(tp).astype(F)
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
    return dict(MLSTEM=MLSTEM, MLCLOSE=MLCLOSE, EXT=EXT, HP=HP)


# =============================== device kernel =============================

def _dyn_rows(x, start, nrows):
    return jax.lax.dynamic_slice(x, (start, 0), (nrows, x.shape[1]))


def _dyn_rows3(x, start, nrows):
    return jax.lax.dynamic_slice(x, (0, start, 0), (x.shape[0], nrows, x.shape[2]))


def _oh(x, n):
    return (x[..., None] == jnp.arange(n)).astype(jnp.float32)


@aot.persistent_jit(static_argnames=("L", "NS"))
def build_seq_planes(gtabs, Sb, S5b, S3b, valid, *, L, NS):
    """Per-sequence A-group/code planes, built ON DEVICE.

    Each plane value is G[u_i, v_j] over 25-state side codes (build_gtabs),
    so two exact one-hot contractions per plane replace the old host-side
    (NS, Lp, Lp) numpy builds + transfers (~55 MB/call at NS=10 L=320,
    which dominated wall time over the axon relay).  One-hot matmuls at
    HIGHEST precision are bitwise-identical to np.take lookups (exactly one
    nonzero term per output).  valid: (NS,) f32, 0.0 marks NS-bucketing pad
    rows (A-group planes force 0.0, code planes their neutral fills,
    matching the old host-side padding exactly).  Kept separate from
    alifold_fast so the big kernel's compile time is unaffected; the
    outputs stay device-resident between the two jit calls.
    """
    f = jnp.float32
    Lp = L + 2
    hi = jax.lax.Precision.HIGHEST
    Scol = jax.lax.dynamic_slice(Sb, (0, PAD), (NS, Lp))
    S5col = jax.lax.dynamic_slice(S5b, (0, PAD), (NS, Lp))
    S3col = jax.lax.dynamic_slice(S3b, (0, PAD), (NS, Lp))
    OHa = _oh(Scol * 5 + S3col, 25)          # (NS, Lp, 25): (base, S3)
    OHb = _oh(Scol * 5 + S5col, 25)          # (NS, Lp, 25): (base, S5)

    def glook(key, OHx, OHy):
        G = gtabs[key].astype(f)
        W = jnp.einsum("sic,cd->sid", OHx, G, precision=hi)
        return jnp.einsum("sid,sjd->sij", W, OHy, precision=hi)

    vmask = valid[:, None, None]
    vbool = vmask > 0.0

    def gf32(key, OHx, OHy):          # f32 plane; pad rows force 0.0
        return glook(key, OHx, OHy) * vmask

    def gint(key, OHx, OHy, fill):    # int code plane; pad rows get `fill`
        p = glook(key, OHx, OHy)
        return jnp.where(vbool, p, f(fill)).astype(jnp.int32)

    return dict(
        MMI_IN=gf32("G_MMI_IN", OHb, OHa),
        MM1N_IN=gf32("G_MM1N_IN", OHb, OHa),
        MM23_IN=gf32("G_MM23_IN", OHb, OHa),
        TAU_IN=gf32("G_TAU_IN", OHb, OHa),
        MMI_OUT=gf32("G_MMI_OUT", OHa, OHb),
        MM1N_OUT=gf32("G_MM1N_OUT", OHa, OHb),
        MM23_OUT=gf32("G_MM23_OUT", OHa, OHb),
        TAU_OUT=gf32("G_TAU_OUT", OHa, OHb),
        TP7=gint("G_TP7", OHa, OHb, 6),
        RT7=gint("G_RT7", OHb, OHa, 6),
        C175_OUT=gint("G_C175_OUT", OHa, OHb, 0),
        C35_OUT=gint("G_C35_OUT", OHa, OHb, 0),
        C175_IN=gint("G_C175_IN", OHb, OHa, 0),
        C35_IN=gint("G_C35_IN", OHb, OHa, 0),
    )


@aot.persistent_jit(static_argnames=("L", "NS", "BCUT"))
def alifold_fast(
    planes, loop_tabs, spec_tabs, psc_fac, allow_pair, allow_unpaired,
    S5b, S3b, A2Sb, n, sc, bsn0, valid=None, *, L, NS, BCUT=SW,
):
    """Consensus inside+outside, gather-free.  Returns (pout, Q).

    planes: dict of (NS?, Lp, Lp) planes — the consensus-level ones built
    host-side (HP/EXT/MLSTEM/MLCLOSE) and the per-seq A-group/code planes
    built on device by build_seq_planes; S5b/S3b/A2Sb: (NS, PAD+Lp+PAD)
    padded per-seq vectors; bsn0 = expMLbase**NS (no sc).

    BCUT (static): host-proven support bound for the small-loop-size terms
    — the caller guarantees that every alignment window of BCUT or more
    columns contains >= 4 non-gap positions in every sequence, so all
    per-seq loop sizes at offsets >= BCUT exceed 3: the B-group masks
    (sizes <= 2) and the separable A-category indicators (sizes <= 3)
    vanish there.  The B-group (round-3's dominant block cost) is
    then evaluated only on the (u, v < BCUT) corner; skipped terms are
    exact zeros, outputs bitwise identical.  valid: (NS,) f32 marking
    NS-bucketing pad rows (0.0) — their neutral K = 1.0 came from the
    always-firing (0,0) B category, so outside the B sub-block it is
    re-added explicitly.
    """
    f = jnp.float32
    # NS-bucketing pad rows (valid == 0.0) have a2s identically 0, so the
    # old full-block B evaluation gave them K = stack[NN][NN] = 1.0 at EVERY
    # stencil cell; with the B sub-block cut, cells outside the sub-block
    # must re-add that 1.0 to keep pad rows neutral in the prod over NS.
    # valid=None (no bucketing) skips the fix statically.
    pad_neutral = None if valid is None else (1.0 - valid)[:, None, None, None]

    def _pad_outside_fix(K, u_ext, v0, v1):
        if pad_neutral is None:
            return K
        bu = min(u_ext, BCUT)
        bv1 = min(v1, BCUT)
        inside = np.zeros((u_ext, v1 - v0), np.float32)
        if bv1 > v0 and bu > 0:
            inside[:bu, : bv1 - v0] = 1.0
        outside = jnp.asarray(1.0 - inside)
        return K + pad_neutral * outside[None, :, :, None]
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
    OH31U1o = _oh(U1o, SW)
    # neighbor-base one-hots, i-last layout (see B-group comment below)
    OHpT = jnp.stack([(SP1u == p).astype(f) for p in range(5)], 1)
    OHpoT = jnp.stack([(SI1ou == p).astype(f) for p in range(5)], 1)

    # pre-contract the u1 side of the general-category sandwich; the three
    # separable categories (T_blg/T_1n/T_23, see build_loop_tables) instead
    # use 1-D value planes, so only T_gen pays a per-diagonal 31-wide
    # one-hot contraction.
    Tgen2d = jnp.asarray(loop_tabs["T_gen"])
    W1 = {"T_gen": jnp.einsum("suia,ab->suib", OH31U1, Tgen2d)}
    W1o = {"T_gen": jnp.einsum("suia,ab->suib", OH31U1o, Tgen2d)}

    BU1d = jnp.asarray(loop_tabs["BU"])
    F1N1d = jnp.asarray(loop_tabs["F1N"])
    C23 = jnp.float32(loop_tabs["C23"])
    # u-side (d-independent) separable-category planes and masks
    BU_u = jnp.einsum("suia,a->sui", OH31U1, BU1d)        # (NS, SW, Lp)
    F1N_u = jnp.einsum("suia,a->sui", OH31U1, F1N1d)
    IND_U = [(U1 == a).astype(f) for a in range(4)]
    BU_uo = jnp.einsum("suia,a->sui", OH31U1o, BU1d)
    F1N_uo = jnp.einsum("suia,a->sui", OH31U1o, F1N1d)
    IND_UO = [(U1o == a).astype(f) for a in range(4)]

    # v-side planes indexed by alignment column j (read per diagonal at
    # j = i + d with one dynamic lane slice).  Inside direction:
    # V2J[s, v, y] = a2s[y+SW-1] - a2s[y+SW-1-v]  (lane y+SW == big lane m);
    # outside: V2OJ[s, v, y] = a2s[y+v] - a2s[y].
    Wbig = A2Sb.shape[1]
    V2J = jnp.stack(
        [
            jax.lax.dynamic_slice(A2Sb, (0, SW - 1), (NS, Wbig - SW))
            - jax.lax.dynamic_slice(A2Sb, (0, SW - 1 - v), (NS, Wbig - SW))
            for v in range(SW)
        ],
        axis=1,
    ).clip(0)                                              # (NS, SW, Wbig-SW)
    V2OJ = jnp.stack(
        [
            jax.lax.dynamic_slice(A2Sb, (0, v), (NS, Wbig - SW))
            - jax.lax.dynamic_slice(A2Sb, (0, 0), (NS, Wbig - SW))
            for v in range(SW)
        ],
        axis=1,
    ).clip(0)
    OHV2J = _oh(V2J, SW)
    OHV2OJ = _oh(V2OJ, SW)
    BU_vJ = jnp.einsum("svya,a->svy", OHV2J, BU1d)
    F1N_vJ = jnp.einsum("svya,a->svy", OHV2J, F1N1d)
    IND_VJ = jnp.stack([(V2J == b).astype(f) for b in range(4)])
    BU_vOJ = jnp.einsum("svya,a->svy", OHV2OJ, BU1d)
    F1N_vOJ = jnp.einsum("svya,a->svy", OHV2OJ, F1N1d)
    IND_VOJ = jnp.stack([(V2OJ == b).astype(f) for b in range(4)])

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

    def stencil_in(CH, d, u_ext=SW, v0=0, v1=SW):
        """CH (C, NROWS, Lp) -> (C, u_ext, v1-v0, Lp):
        [c,u,v',i] = CH[c, d-2-u-(v0+v'), i+1+u]."""
        s61 = _dyn_rows3(CH, d + RP - 62, 61)
        padc = jnp.concatenate(
            [s61, jnp.zeros((CH.shape[0], 61, SW + 2), CH.dtype)], axis=2
        )
        blocks = [
            padc[:, 61 - u - v1 : 61 - u - v0][:, ::-1, 1 + u : 1 + u + Lp]
            for u in range(u_ext)
        ]
        return jnp.stack(blocks, axis=1)

    def stencil_out(CH, d, u_ext=SW, v0=0, v1=SW):
        """[c,u,v',i] = CH[c, d+2+u+(v0+v'), i-1-u]."""
        s61 = _dyn_rows3(CH, d + RP + 2, 61)
        padc = jnp.concatenate(
            [jnp.zeros((CH.shape[0], 61, SW + 2), CH.dtype), s61], axis=2
        )
        blocks = [
            padc[:, u + v0 : u + v1][:, :, SW + 1 - u : SW + 1 - u + Lp]
            for u in range(u_ext)
        ]
        return jnp.stack(blocks, axis=1)

    def dwin(big, d, off):
        """w[x] = big[:, PAD + d + off - 30 + x], x in [0, 30+Lp)."""
        return jax.lax.dynamic_slice(big, (0, PAD + d + off - 30), (NS, 30 + Lp))

    def interior_K(d, U2b, SQ1vb, OUTrow, INst, TP2stB, Dl, u_ext, v0, v1,
                   BCUT):
        """Per-seq interior factors K (NS, u_ext, v1-v0, Lp), one staircase
        block per call.

        U2b/SQ1vb: (NS, v1-v0, Lp) v-block-indexed; OUTrow: (4NS, Lp)
        per-diag A-group outer rows; INst: (4NS, u_ext, v1-v0, Lp) A-group
        stencil block; TP2stB: (NS, bu, bvb, Lp) inner pair types 0..6 on
        the B sub-block only (None when the block has no B support);
        Dl: dict of per-diag B-group contractions (u axes pre-cut to BCUT).
        The loop-size one-hot axis truncates to v1 (u2 <= v < v1).

        BCUT (static): host-proven bound — every per-seq loop size U1/U2
        at column offsets >= BCUT exceeds 3 (no alignment window of BCUT
        columns has <= 3 non-gap positions in any sequence), so the B-group
        masks (loop sizes <= 2) and the separable-category indicators
        (sizes <= 3) are identically zero for u or v >= BCUT.  The B group
        is evaluated only on the [0:bu) x [v0:bv1) sub-block, the
        separable A categories collapse to u-slabs in blocks with
        v0 >= BCUT, and skipped terms are exact zeros — results bitwise
        identical to the full-block evaluation.
        """
        OH31U2 = _oh(U2b, v1)                            # (NS, vb, Lp, v1)

        def oi(ci):
            outr = OUTrow[ci * NS : (ci + 1) * NS]      # (NS, Lp)
            inst = INst[ci * NS : (ci + 1) * NS]        # (NS, u_ext, vb, Lp)
            return outr[:, None, None, :] * inst

        # A group: sum over categories of out * T[u1,u2] * in.  Only the
        # general category contracts a loop-size one-hot (explicit
        # broadcast-multiply-reduce, NOT a dot: exactly one term per sum is
        # nonzero, and XLA would otherwise pad each tiny batched 31^3 dots to
        # 128^3 MXU tiles); the other three categories are separable
        # (build_loop_tables) and use precomputed u-/v-side value planes.
        iu = Dl["IND_U"]
        iv = Dl["IND_V"]
        bu_u = Dl["BU_u"][:, :u_ext, None, :]
        bu_v = Dl["BU_v"][:, None, v0:v1, :]
        f1_u = Dl["F1N_u"][:, :u_ext, None, :]
        f1_v = Dl["F1N_v"][:, None, v0:v1, :]

        def ind_u(a):
            return iu[a][:, :u_ext, None, :]

        def ind_v(b):
            return iv[b][:, None, v0:v1, :]

        if "noA" in _ABLATE:
            K = jnp.zeros((NS, u_ext, v1 - v0, INst.shape[-1]), f)
        else:
            W = Dl["W1"]["T_gen"][:, :u_ext, :, :v1]     # (NS, u_ext, Lp, v1)
            Tgen = jnp.sum(
                W[:, :, None, :, :] * OH31U2[:, None, :, :, :], axis=-1
            )                                            # (NS, u_ext, vb, Lp)
            if v0 < BCUT:
                T1n = ind_u(1) * f1_v + f1_u * ind_v(1)
                T23 = Dl["C23"] * (ind_u(2) * ind_v(3) + ind_u(3) * ind_v(2))
                Tblg = ind_u(0) * bu_v + bu_u * ind_v(0)
                K = (oi(0) * Tgen + oi(1) * T1n + oi(2) * T23 + oi(3) * Tblg)
            else:
                # v >= BCUT: ind_v(a<=3) is identically zero (host-proven),
                # so T23 dies and T1n/Tblg reduce to their u-side indicator
                # terms, which live on the u < BCUT slab only.  The slab
                # terms are mutually exclusive per cell (u1==1 vs u1==0), so
                # the re-associated add stays bitwise identical.
                K = oi(0) * Tgen
                su = min(u_ext, BCUT)
                if su > 0:
                    def oi_slab(ci):
                        outr = OUTrow[ci * NS : (ci + 1) * NS]
                        return (outr[:, None, None, :]
                                * INst[ci * NS : (ci + 1) * NS][:, :su])

                    slab = (
                        oi_slab(1) * (iu[1][:, :su, None, :] * f1_v)
                        + oi_slab(3) * (iu[0][:, :su, None, :] * bu_v)
                    )
                    K = K.at[:, :su].add(slab)
        if "noB" in _ABLATE:
            return K

        # B group on its host-proven support sub-block only
        bu = min(u_ext, BCUT)
        bv1 = min(v1, BCUT)
        if TP2stB is None or bv1 <= v0 or bu <= 0:
            return K
        bvb = bv1 - v0

        m_u = [iu[a][:, :bu] for a in range(3)]          # (NS, bu, Lp)
        m_v = [iv[b][:, v0:bv1] for b in range(3)]

        def mm(a, b):
            return m_u[a][:, :, None, :] * m_v[b][:, None, :, :]

        m00, m01, m10 = mm(0, 0), mm(0, 1), mm(1, 0)
        m11, m12, m21, m22 = mm(1, 1), mm(1, 2), mm(2, 1), mm(2, 2)

        # Unrolled FMA chains over the tiny inner alphabets (t2 in 0..6,
        # p/q in 0..4); every operand keeps i as the lane axis and nothing
        # larger than one (NS, bu, bvb, Lp) accumulator materializes.
        OHq = Dl["OHqT"][:, :, v0:bv1]               # (NS, 5, bvb, Lp)
        m_sb = m00 + blg1 * (m01 + m10)
        # masks are mutually exclusive per cell (loop-size categories), so
        # batched evaluation over a stacked category axis followed by one
        # reduce adds only exact zeros in a different association — results
        # stay bitwise identical to the per-category accumulation.
        M2122 = jnp.stack([m21, m22], axis=1)        # (NS, 2, bu, bvb, Lp)
        Bv = jnp.zeros((NS, bu, bvb, INst.shape[-1]), f)
        # D21/D22 are u-side quantities recomputed identically by every
        # staircase block (u always starts at 0); Dl["D2A"] hoists both to
        # one stacked per-diagonal contraction over u < BCUT (inside_step).
        D2A = Dl["D2A"]                              # (NS, 2, 35, BCUT, Lp)
        for t2 in range(7):
            sel = (TP2stB == t2).astype(f)
            acc = (
                Dl["DstackT"][:, t2][:, None, None, :] * m_sb
                + Dl["Di11T"][:, t2][:, None, None, :] * m11
            )
            # i21a: inner (t2, sq1); no u-dependence
            Ea = sum(
                OHq[:, q] * Dl["Di21aT"][:, t2 * 5 + q][:, None, :]
                for q in range(5)
            )                                        # (NS, bvb, Lp)
            S2 = jnp.zeros((NS, 2, bu, bvb, INst.shape[-1]), f)
            for q in range(5):
                D2 = D2A[:, :, t2 * 5 + q, :bu]      # (NS, 2, bu, Lp)
                S2 = S2 + OHq[:, q][:, None, None] * D2[:, :, :, None]
            Bv = Bv + sel * (
                acc + Ea[:, None, :, :] * m12 + (S2 * M2122).sum(axis=1)
            )
        return K.at[:, :bu, :bvb, :].add(Bv)

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
        OHqT = jnp.stack([(SQ1v == q).astype(f) for q in range(5)], 1)
        OUTrow = ldiag_row3(OUTROWS, d)           # (4NS, Lp)
        # per-diag B-group pre-contractions (outer side).  All arrays keep
        # the long i axis LAST (lane dimension) — a small trailing axis
        # (5/7/35) would pad its lanes to 128 and waste most of the VPU —
        # and the code-table contractions run as dot_generals with i as the
        # matmul N dimension.
        tp7row = ldiag_row3(TP7L, d)               # (NS, Lp) int
        c175row = ldiag_row3(C175OL, d)
        c35row = ldiag_row3(C35OL, d)
        oh7T = jnp.stack([(tp7row == t).astype(f) for t in range(7)], 1)
        oh35T = jnp.stack([(c35row == c).astype(f) for c in range(35)], 1)
        oh175T = jnp.stack([(c175row == c).astype(f) for c in range(175)], 1)
        y0v = PAD + d - SW
        T21bcT = jnp.einsum("sci,cpm->spmi", oh35T, Ti21b)      # (NS,5,35,Lp)
        T22cT = jnp.einsum("sci,cpm->spmi", oh175T, Ti22)       # (NS,5,35,Lp)
        Dl = dict(
            W1=W1, C23=C23,
            BU_u=BU_u, F1N_u=F1N_u, IND_U=IND_U,
            BU_v=jax.lax.dynamic_slice(BU_vJ, (0, 0, y0v), (NS, SW, Lp)),
            F1N_v=jax.lax.dynamic_slice(F1N_vJ, (0, 0, y0v), (NS, SW, Lp)),
            IND_V=jax.lax.dynamic_slice(
                IND_VJ, (0, 0, 0, y0v), (4, NS, SW, Lp)
            ),
            DstackT=jnp.einsum("sti,tc->sci", oh7T, T7),        # (NS,7,Lp)
            Di11T=jnp.einsum("sci,ct->sti", oh175T, Ti11),      # (NS,7,Lp)
            Di21aT=jnp.einsum("sci,cm->smi", oh175T, Ti21a),    # (NS,35,Lp)
            # u-side contractions over u < BCUT (the B-group's host-proven
            # support), hoisted out of the staircase blocks (exact: OHpT is
            # one-hot over p, so each output element has exactly one nonzero
            # term regardless of reduction order).  Explicit
            # broadcast-multiply-sums, NOT einsum/dot: XLA lowers the
            # equivalent batched (35x5)@(5xSW) dots with catastrophic
            # MXU tile padding (measured 13x kernel slowdown at L=310).
            D2A=sum(
                OHpT[:, p, :BCUT][:, None, None, :, :]
                * jnp.stack([T21bcT, T22cT], axis=1)[:, :, p][:, :, :, None, :]
                for p in range(5)
            ),                                              # (NS,2,35,BCUT,Lp)
            OHpT=OHpT, OHqT=OHqT,
        )
        if "noint" in _ABLATE:
            interior = jnp.zeros((Lp,), f)
        else:
            stair = ((0, SW, SW),) if "nostair" in _ABLATE else STAIR
            interior = jnp.zeros((Lp,), f)
            for v0, v1, u_ext in stair:
                INst = stencil_in(IN_ST, d, u_ext, v0, v1)
                bu = min(u_ext, BCUT)
                bv1 = min(v1, BCUT)
                TP2stB = (
                    stencil_in(RT7L, d, bu, v0, bv1)
                    if bv1 > v0 and bu > 0 else None
                )
                K = interior_K(d, U2[:, v0:v1], SQ1v[:, v0:v1], OUTrow,
                               INst, TP2stB, Dl, u_ext, v0, v1, BCUT)
                K = _pad_outside_fix(K, u_ext, v0, v1)
                Kp = jnp.prod(K, axis=0)           # (u_ext, vb, Lp)
                M2qb = stencil_in(QBL[None], d, u_ext, v0, v1)[0]
                interior = interior + jnp.einsum(
                    "uvi,uvi,uv->i", M2qb, Kp, SCP[:u_ext, v0:v1]
                )

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
        # per-diag inner-side contractions (i-last layouts + dot_generals
        # with i as the matmul N dim — see the inside-direction comment)
        rt7row = ldiag_row3(RT7L, d)              # tp2 = RT[tp(i,j)]
        c175irow = ldiag_row3(C175IL, d)
        c35irow = ldiag_row3(C35IL, d)
        oh7rtT = jnp.stack([(rt7row == t).astype(f) for t in range(7)], 1)
        oh35iT = jnp.stack([(c35irow == c).astype(f) for c in range(35)], 1)
        oh175iT = jnp.stack(
            [(c175irow == c).astype(f) for c in range(175)], 1
        )
        # remaining axis = the OUTER (stencil-side) code
        DstackoT = jnp.einsum("sci,tc->sti", oh7rtT, T7)       # (NS,7,Lp)
        Di11oT = jnp.einsum("sti,ct->sci", oh7rtT, Ti11)       # (NS,175,Lp)
        Di21aoT = jnp.einsum("smi,cm->sci", oh35iT, Ti21a)     # (NS,175,Lp)
        D21boT = jnp.einsum("smi,cm->sci", oh175iT, Ti21b_o)   # (NS,35,Lp)
        D22oT = jnp.einsum("smi,cm->sci", oh175iT, Ti22_o)     # (NS,175,Lp)
        # u-side i21b contraction over u < BCUT, hoisted out of the
        # staircase blocks (exact: OHpoT one-hot over b; broadcast form,
        # not einsum — see the D21A comment)
        D21bo4 = D21boT.reshape(NS, 7, 5, Lp)
        EbA = sum(
            OHpoT[:, b, :BCUT][:, None, :, :] * D21bo4[:, :, b][:, :, None, :]
            for b in range(5)
        )                                                      # (NS,7,BCUT,Lp)

        y0o = PAD + d
        BU_vo = jax.lax.dynamic_slice(BU_vOJ, (0, 0, y0o), (NS, SW, Lp))
        F1N_vo = jax.lax.dynamic_slice(F1N_vOJ, (0, 0, y0o), (NS, SW, Lp))
        IND_VO = jax.lax.dynamic_slice(
            IND_VOJ, (0, 0, 0, y0o), (4, NS, SW, Lp)
        )

        OHjvT = jnp.stack([(SJ1ov == c).astype(f) for c in range(5)], 1)

        def interior_out_blk(u_ext, v0, v1):
            """One staircase block of the outside interior stencil."""
            OUTst_all = stencil_out(OUT_PSC, d, u_ext, v0, v1)
            OUTst = OUTst_all[: 4 * NS]
            PSCst = OUTst_all[4 * NS]
            OH31U2o = _oh(U2o[:, v0:v1], v1)            # (NS, vb, Lp, v1)

            def oiv(ci):
                inr = INrow[ci * NS : (ci + 1) * NS]
                outst = OUTst[ci * NS : (ci + 1) * NS]
                return inr[:, None, None, :] * outst

            # A group, outside roles: T_gen one-hot contraction + separable
            # category planes (see interior_K)
            def ind_uo(a):
                return IND_UO[a][:, :u_ext, None, :]

            def ind_vo(b):
                return IND_VO[b][:, None, v0:v1, :]

            if "noA" in _ABLATE:
                K = jnp.zeros((NS, u_ext, v1 - v0, Lp), f)
            elif v0 < BCUT:
                W = W1o["T_gen"][:, :u_ext, :, :v1]     # (NS, u_ext, Lp, v1)
                Tgen = jnp.sum(
                    W[:, :, None, :, :] * OH31U2o[:, None, :, :, :], axis=-1
                )
                T1n = (ind_uo(1) * F1N_vo[:, None, v0:v1, :]
                       + F1N_uo[:, :u_ext, None, :] * ind_vo(1))
                T23 = C23 * (ind_uo(2) * ind_vo(3) + ind_uo(3) * ind_vo(2))
                Tblg = (ind_uo(0) * BU_vo[:, None, v0:v1, :]
                        + BU_uo[:, :u_ext, None, :] * ind_vo(0))
                K = (oiv(0) * Tgen + oiv(1) * T1n + oiv(2) * T23
                     + oiv(3) * Tblg)
            else:
                # v >= BCUT: separable categories collapse to u-slabs
                # (exclusive masks, bitwise-safe — see interior_K)
                W = W1o["T_gen"][:, :u_ext, :, :v1]
                Tgen = jnp.sum(
                    W[:, :, None, :, :] * OH31U2o[:, None, :, :, :], axis=-1
                )
                K = oiv(0) * Tgen
                su = min(u_ext, BCUT)
                if su > 0:
                    def oiv_slab(ci):
                        inr = INrow[ci * NS : (ci + 1) * NS]
                        return (inr[:, None, None, :]
                                * OUTst[ci * NS : (ci + 1) * NS][:, :su])

                    slab = (
                        oiv_slab(1)
                        * (IND_UO[1][:, :su, None, :]
                           * F1N_vo[:, None, v0:v1, :])
                        + oiv_slab(3)
                        * (IND_UO[0][:, :su, None, :]
                           * BU_vo[:, None, v0:v1, :])
                    )
                    K = K.at[:, :su].add(slab)

            # B group on its host-proven support sub-block (see interior_K)
            bu = min(u_ext, BCUT)
            bv1 = min(v1, BCUT)
            if "noB" in _ABLATE or bv1 <= v0 or bu <= 0:
                Kp = jnp.prod(_pad_outside_fix(K, u_ext, v0, v1), axis=0) \
                    * PSCst
                M2C = stencil_out(CL[None], d, u_ext, v0, v1)[0]
                return jnp.einsum("uvi,uvi,uv->i", M2C, Kp,
                                  SCP[:u_ext, v0:v1])
            bvb = bv1 - v0
            TPst = stencil_out(TP7L, d, bu, v0, bv1)    # outer pair types
            OHjv = OHjvT[:, :, v0:bv1]                  # (NS, 5, bvb, Lp)
            OHpo = OHpoT[:, :, :bu]                     # (NS, 5, bu, Lp)

            m_u = [IND_UO[a][:, :bu] for a in range(3)]
            m_v = [IND_VO[b][:, v0:bv1] for b in range(3)]

            def mmk(a, b):
                return m_u[a][:, :, None, :] * m_v[b][:, None, :, :]

            m00, m01, m10 = mmk(0, 0), mmk(0, 1), mmk(1, 0)
            m11, m12, m21, m22 = mmk(1, 1), mmk(1, 2), mmk(2, 1), mmk(2, 2)

            m_sb = m00 + blg1 * (m01 + m10)
            # stacked-category evaluation (masks mutually exclusive per
            # cell, so the re-associated sums add only exact zeros and the
            # result is bitwise identical — see interior_K)
            M3 = jnp.stack([m11, m12, m22], axis=1)  # (NS, 3, bu, bvb, Lp)
            TAB3 = jnp.stack([Di11oT, Di21aoT, D22oT], axis=1)  # (NS,3,175,Lp)
            Bv = jnp.zeros((NS, bu, bvb, Lp), f)
            for t in range(7):
                sel = (TPst == t).astype(f)
                acc = DstackoT[:, t][:, None, None, :] * m_sb

                # outer code c175 = (t, b=si1(u-side), c=sj1(v-side)):
                # stage the v-side contraction per b (small (NS, 3, bvb, Lp)
                # arrays), then 5 stacked block-FMAs over the u-side one-hot
                out3 = jnp.zeros((NS, 3, bu, bvb, Lp), f)
                for b in range(5):
                    Fb3 = sum(
                        OHjv[:, c][:, None]
                        * TAB3[:, :, t * 25 + b * 5 + c][:, :, None, :]
                        for c in range(5)
                    )                                # (NS, 3, bvb, Lp)
                    out3 = out3 + OHpo[:, b][:, None, :, None, :] \
                        * Fb3[:, :, None]
                acc = acc + (out3 * M3).sum(axis=1)
                # i21b: outer code (t, si1) only (EbA hoisted per diagonal)
                Eb = EbA[:, t, :bu]                      # (NS, bu, Lp)
                acc = acc + Eb[:, :, None, :] * m21
                Bv = Bv + sel * acc
            Ktot = _pad_outside_fix(
                K.at[:, :bu, :bvb, :].add(Bv), u_ext, v0, v1
            )
            Kp = jnp.prod(Ktot, axis=0) * PSCst
            M2C = stencil_out(CL[None], d, u_ext, v0, v1)[0]
            return jnp.einsum("uvi,uvi,uv->i", M2C, Kp, SCP[:u_ext, v0:v1])

        if "noint" in _ABLATE:
            w_int = jnp.zeros((Lp,), f)
        else:
            stair = ((0, SW, SW),) if "nostair" in _ABLATE else STAIR
            w_int = jnp.zeros((Lp,), f)
            for v0, v1, u_ext in stair:
                w_int = w_int + interior_out_blk(u_ext, v0, v1)

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
