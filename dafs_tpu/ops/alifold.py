"""RNAalifold consensus partition function (ViennaRNA 2.4.x alipf_fold).

The reference mixes RNAalifold consensus base-pair probabilities into every
progressive-merge step and the final decode (src/alifold.cpp:49-84,
src/dafs.cpp:561-607).  This is the TPU-native equivalent: the McCaskill
wavefront of ops/mccaskill.py extended with
- a per-sequence axis: loop energies are evaluated per sequence with
  gap-aware loop sizes (a2s), sequence-local neighbor bases (S5/S3) and
  NN (type 7) handling for gapped pairs, then multiplied across sequences;
- the covariance pair score pscore[i,j] (conservation/compensation measure,
  Vienna's make_pscores with the default distance matrix, cv_fact=nc_fact=1),
  gating pairs at MINPSCORE=-200 and contributing exp(pscore/(kT/10*n_seq));
- column-based multiloop unpaired costs (expMLbase^n_seq per column) and
  column-based interior stencil bounds, as in alipfold.c.
"""

from __future__ import annotations

import contextlib
import functools
import os
import threading
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.ops import energy_params as ep
from dafs_tpu.typedefs import AlnRow

TURN = ep.TURN
MAXLOOP = ep.MAXLOOP
UNIT = 100.0
MINPSCORE = -2.0 * UNIT

# pair-type distance matrix (alifold.c, ribo=0 default)
DM = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0],
        [0, 0, 2, 2, 1, 2, 2],
        [0, 2, 0, 1, 2, 2, 2],
        [0, 2, 1, 0, 2, 1, 2],
        [0, 1, 2, 2, 0, 2, 1],
        [0, 2, 2, 1, 2, 0, 2],
        [0, 2, 2, 2, 1, 2, 0],
    ],
    dtype=np.float64,
)

_EXP_CACHE: dict = {}
_KTAB_CACHE: dict = {}  # (bl, n_seq) -> (loop_tabs, spec_tabs, gtabs)


@jax.jit
def _pack_pout_q(pout, Q):
    """Pack the consensus posterior plane and Q into one device array so
    the retry ladder pays ONE ~26 ms host-readback round trip per attempt
    instead of two (float(Q) + np.asarray(pout))."""
    return jnp.concatenate([pout.reshape(-1), Q.reshape(1)])


_SC_CACHE: dict = {}  # (n_seq, L_bucket) -> last successful pf scale
# When set (pipeline._align's threaded layer prep), warm-start READS come
# from this immutable snapshot so they are independent of thread timing.
# Successful scales from worker threads are staged in _SC_PENDING (under
# _SC_LOCK, combined with a fixed min() policy so the staged value does not
# depend on thread completion order) and committed to _SC_CACHE only when
# the layer joins — the NEXT layer's warm-starts are therefore deterministic
# even when two merges share a (n_seq, L_bucket) key.
_SC_FROZEN: dict | None = None
_SC_PENDING: dict = {}
_SC_LOCK = threading.Lock()
# Guards the (global) jax.config persistent-cache toggle below when merge
# prep runs multi-threaded (pipeline._align overlaps per-merge consensus
# calls); only the CPU backend takes this lock.  NOTE: while one thread
# holds the 1e9 min-compile-time override, compiles issued by sibling
# threads for OTHER kernels also skip persistent-cache writes — an accepted
# cost; on the CPU backend pipeline._align therefore preps serially.
_CFG_LOCK = threading.Lock()


@contextlib.contextmanager
def sc_cache_frozen():
    """Freeze pf-scale warm-start reads for the duration of a threaded merge
    layer (see pipeline._align): all threads see the same snapshot, so the
    0.8x/1.25x retry ladder is deterministic regardless of thread timing.
    Writes are staged and committed once, after the layer joins."""
    global _SC_FROZEN
    with _SC_LOCK:
        _SC_PENDING.clear()
    _SC_FROZEN = dict(_SC_CACHE)
    try:
        yield
    finally:
        _SC_FROZEN = None
        with _SC_LOCK:
            _SC_CACHE.update(_SC_PENDING)
            _SC_PENDING.clear()


def _special_hp() -> bool:
    """Whether the comparative hairpin applies tri/tetra/hexaloop bonuses
    (open ViennaRNA-2.4.18 reading; default on).  Toggle with
    DAFS_TPU_ALIFOLD_SPECIAL_HP=0."""
    return os.environ.get("DAFS_TPU_ALIFOLD_SPECIAL_HP", "1") != "0"


def _mlbase_per_base() -> bool:
    """ML unpaired cost per non-gap base (expMLbase**count[col], gap columns
    free for gapped sequences) instead of per column (expMLbase**n_seq, the
    alipfold.c reading; default).  Toggle with DAFS_TPU_ALIFOLD_MLBASE=base."""
    return os.environ.get("DAFS_TPU_ALIFOLD_MLBASE", "col") == "base"


def _tables(bl: bool, nseq: int = 1) -> dict:
    """Comparative pf tables: per-sequence factors with kTn = kT * n_seq
    (Vienna get_scaled_alipf_parameters), so the product over sequences
    weighs the AVERAGE energy."""
    if (bl, nseq) not in _EXP_CACHE:
        _EXP_CACHE[(bl, nseq)] = ep.exp_tables(bl, kt_mult=nseq)
    return _EXP_CACHE[(bl, nseq)]


def _round_up(n, m):
    return -(-n // m) * m


def make_pscores(S: np.ndarray, n: int, cv_fact=1.0, nc_fact=1.0) -> np.ndarray:
    """Covariance scores (alifold.c make_pscores, default dm), vectorized:
    per-cell pair-type counts as one-hot sums, the dm double sum as an
    einsum (dm is symmetric with zero diagonal, so sum_{k<=l} == full/2)."""
    nseq = S.shape[0]
    pt = ep.BP_PAIR[S[:, :, None], S[:, None, :]]  # (nseq, n+2, n+2)
    both_gap = (S[:, :, None] == 0) & (S[:, None, :] == 0)
    types = np.where(pt == 0, np.where(both_gap, 7, 0), pt)  # (nseq, ., .)
    counts = np.zeros((8,) + pt.shape[1:], dtype=np.int64)
    for k in range(8):
        counts[k] = (types == k).sum(axis=0)
    cf = counts[1:7].astype(np.float64)
    score = 0.5 * np.einsum("kij,lij,kl->ij", cf, cf, DM[1:7, 1:7])
    pscore_all = cv_fact * (
        (UNIT * score) / nseq
        - nc_fact * UNIT * (counts[0] + counts[7] * 0.25)
    )
    none_v = -2.0 * UNIT * 10
    ii = np.arange(pt.shape[1])
    valid = (
        (counts[0] * 2 + counts[7] <= nseq)
        & (ii[:, None] >= 1)
        & (ii[None, :] - ii[:, None] > TURN)
        & (ii[None, :] <= n)
    )
    return np.where(valid, pscore_all, none_v)


@functools.partial(jax.jit, static_argnames=("L", "NS"))
def _ali_inside_outside(
    S, S5, S3, pt7, psc_fac, allow_pair, allow_unpaired, a2s,
    tri_code, tetra_code, hexa_code, n, sc,
    t_stack, t_hairpin, t_bulge, t_internal,
    t_mmH, t_mmI, t_mm1n, t_mm23, t_mmExt, t_mmM,
    t_d5, t_d3, t_i11, t_i21, t_i22,
    t_mlb, t_mlc, t_mli, t_tau, t_ninio, t_lxc,
    t_tetra, t_tri, t_hexa,
    *, L, NS,
):
    """Consensus inside+outside.  Shapes: S,S5,S3,a2s (NS, L+2); pt7
    (NS, L+2, L+2) per-seq types with 0->7 remap; psc_fac (L+2, L+2) the
    exp(pscore/kTn) factor; tri/tetra/hexa codes (NS, L+2) per-seq k-mer
    codes in SEQUENCE coordinates indexed by a2s (value -1 => no bonus)."""
    f = jnp.float32
    idx = jnp.arange(L + 2)
    RT = jnp.asarray(ep.RTYPE)

    bsn = t_mlb ** NS * sc  # per-column multiloop unpaired factor
    logv = jnp.where((idx >= 1) & (idx <= n) & allow_unpaired, 1.0, 0.0)
    blocked = jnp.cumsum(jnp.where(idx >= 1, 1.0 - logv, 0.0))
    seg_len = idx[None, :] - idx[:, None] + 1
    seg_blocked = blocked[None, :] - blocked[jnp.maximum(idx[:, None] - 1, 0)]
    bs_seg = jnp.where(
        seg_len <= 0, 1.0, jnp.where(seg_blocked > 0, 0.0, bsn ** seg_len.astype(f))
    )

    ss = jnp.arange(NS)

    def mlstem_prod(tp_s, s5_s, s3_s):
        # prod over seqs of exp_E_MLstem with both neighbors
        v = t_mmM[tp_s, s5_s, s3_s] * jnp.where(tp_s > 2, t_tau, 1.0) * t_mli
        return jnp.prod(v, axis=0)

    def hairpin_prod(i_vec, j_vec):
        # (cells,) product over sequences of exp_E_Hairpin with gap-aware u
        ic = jnp.clip(i_vec, 0, L + 1)
        jc = jnp.clip(j_vec, 0, L + 1)
        u = a2s[:, jnp.clip(jc - 1, 0, L + 1)] - a2s[:, ic]  # (NS, cells)
        u = jnp.maximum(u, 0)
        tp = pt7[:, ic, jc]
        uc = jnp.clip(u, 0, MAXLOOP)
        base = t_hairpin[uc] * jnp.where(
            u > MAXLOOP, t_lxc ** (jnp.log(u.astype(f) / 30.0)), 1.0
        )
        s5 = S3[:, ic]  # 3' neighbor of i in seq coords = 5' loop base
        s3 = S5[:, jc]  # 5' neighbor of j = 3' loop base
        mm = t_mmH[tp, s5, s3]
        tau = jnp.where(tp > 2, t_tau, 1.0)
        tri = t_tri[tri_code[:, ic]]
        tetra = t_tetra[tetra_code[:, ic]]
        hexa = t_hexa[hexa_code[:, ic]]
        val = jnp.where(
            u == 3,
            jnp.where(tri >= 0, tri, base * tau),
            jnp.where(
                (u == 4) & (tetra >= 0),
                tetra,
                jnp.where((u == 6) & (hexa >= 0), hexa, base * mm),
            ),
        )
        # exp_E_Hairpin: u < 3 -> exphairpin[u] which is exp(-INF)=0
        val = jnp.where(u < 3, 0.0, val)
        # skip factor entirely when the sequence has no bases before i
        val = jnp.where(a2s[:, ic] < 1, 1.0, val)
        return jnp.prod(val, axis=0)

    uu = jnp.arange(MAXLOOP + 1)

    def intloop_K(tp, tp2, u1, u2, si1, sj1, sp1, sq1):
        """per-seq exp_E_IntLoop factor; u1/u2 are gap-aware sizes >= 0."""
        ns_ = jnp.minimum(u1, u2)
        nl_ = jnp.maximum(u1, u2)
        nlc = jnp.clip(nl_, 0, MAXLOOP)
        usum = jnp.clip(u1 + u2, 0, MAXLOOP)
        lxc_f = jnp.where(
            u1 + u2 > MAXLOOP,
            t_lxc ** (jnp.log((u1 + u2).astype(f) / 30.0)),
            1.0,
        )
        stack = t_stack[tp, tp2]
        bulge = t_bulge[nlc] * jnp.where(
            nl_ == 1,
            t_stack[tp, tp2],
            jnp.where(tp > 2, t_tau, 1.0) * jnp.where(tp2 > 2, t_tau, 1.0),
        )
        i11 = t_i11[tp, tp2, si1, sj1]
        i21a = t_i21[tp, tp2, si1, sq1, sj1]
        i21b = t_i21[tp2, tp, sq1, si1, sp1]
        i22 = t_i22[tp, tp2, si1, sp1, sq1, sj1]
        asym = jnp.clip(nl_ - ns_, 0, MAXLOOP)
        mm1n = (
            t_internal[jnp.clip(nl_ + 1, 0, MAXLOOP)]
            * t_ninio[asym]
            * t_mm1n[tp, si1, sj1]
            * t_mm1n[tp2, sq1, sp1]
        )
        mm23 = (
            t_internal[5] * t_ninio[1] * t_mm23[tp, si1, sj1] * t_mm23[tp2, sq1, sp1]
        )
        generic = (
            t_internal[usum]
            * lxc_f
            * t_ninio[asym]
            * t_mmI[tp, si1, sj1]
            * t_mmI[tp2, sq1, sp1]
        )
        return jnp.where(
            nl_ == 0,
            stack,
            jnp.where(
                ns_ == 0,
                bulge,
                jnp.where(
                    (ns_ == 1) & (nl_ == 1),
                    i11,
                    jnp.where(
                        (ns_ == 1) & (nl_ == 2),
                        jnp.where(u1 == 1, i21a, i21b),
                        jnp.where(
                            (ns_ == 2) & (nl_ == 2),
                            i22,
                            jnp.where(
                                ns_ == 1,
                                mm1n,
                                jnp.where((ns_ == 2) & (nl_ == 3), mm23, generic),
                            ),
                        ),
                    ),
                ),
            ),
        )

    def interior_terms(i_vec, j_vec, inner, outer_mode, qmat):
        """sum over the column stencil of qmat[k,l] * prod_s K_s.

        outer_mode=False: (i,j) outer, (k,l)=(i+1+u, j-1-v) inner (inside pass)
        outer_mode=True:  (i,j) inner, (k,l)=(i-1-u, j+1+v) outer (outside)
        """
        i_ = i_vec[:, None, None]
        j_ = j_vec[:, None, None]
        u = uu[None, :, None]
        v = uu[None, None, :]
        if not outer_mode:
            k = i_ + 1 + u
            l = j_ - 1 - v
            valid = (u + v <= MAXLOOP) & (l - k > TURN) & (l >= 1) & (k <= L)
        else:
            k = i_ - 1 - u
            l = j_ + 1 + v
            valid = (u + v <= MAXLOOP) & (k >= 1) & (l <= n)
        kc = jnp.clip(k, 0, L + 1)
        lc = jnp.clip(l, 0, L + 1)
        if not outer_mode:
            valid &= allow_pair[kc, lc]
        qkl = qmat[kc, lc]

        # per-seq factors; broadcast over (NS, cells, 31, 31)
        if not outer_mode:
            oi, oj, ik, il = i_, j_, k, l  # outer (i,j), inner (k,l)
        else:
            oi, oj, ik, il = k, l, i_, j_
        oic = jnp.clip(oi, 0, L + 1)
        ojc = jnp.clip(oj, 0, L + 1)
        ikc = jnp.clip(ik, 0, L + 1)
        ilc = jnp.clip(il, 0, L + 1)
        tp = pt7[:, oic, ojc]
        tp2 = RT[pt7[:, ikc, ilc]]
        u1 = jnp.maximum(a2s[:, jnp.clip(ikc - 1, 0, L + 1)] - a2s[:, oic], 0)
        u2 = jnp.maximum(a2s[:, jnp.clip(ojc - 1, 0, L + 1)] - a2s[:, ilc], 0)
        si1 = S3[:, oic]
        sj1 = S5[:, ojc]
        sp1 = S5[:, ikc]
        sq1 = S3[:, ilc]
        K = intloop_K(tp, tp2, u1, u2, si1, sj1, sp1, sq1)
        Kp = jnp.prod(K, axis=0)
        # column-count scale
        du = (ik - oi - 1) + (oj - il - 1)
        Kp = Kp * sc ** (du + 2).astype(f)
        if outer_mode:
            # qmat is pout/qb of the outer pair: dividing by qb stripped the
            # outer pair's covariance factor, so re-apply it on this path
            Kp = Kp * psc_fac[oic, ojc]
        term = jnp.where(valid, qkl * Kp, 0.0)
        return jnp.sum(term, axis=(1, 2))

    ii_all = jnp.arange(L + 2)

    def inside_step(carry, d):
        qb, qm, qm1 = carry
        i_vec = ii_all
        j_vec = i_vec + d
        ok = (i_vec >= 1) & (j_vec <= n)
        jc = jnp.clip(j_vec, 0, L + 1)
        pair_ok = ok & allow_pair[i_vec, jc] & (d > TURN)

        hp = hairpin_prod(i_vec, j_vec)
        hp = hp * sc ** (d + 1).astype(f)
        interior = interior_terms(i_vec, j_vec, True, False, qb)

        kk = ii_all[None, :]
        qm_l = qm[jnp.clip(i_vec + 1, 0, L + 1)[:, None], jnp.clip(kk - 1, 0, L + 1)]
        qm1_r = qm1[kk, jnp.clip(j_vec - 1, 0, L + 1)[:, None]]
        mlk = (kk >= i_vec[:, None] + 2) & (kk <= j_vec[:, None] - 1)
        mlsum = jnp.sum(jnp.where(mlk, qm_l * qm1_r, 0.0), axis=1)
        tp_cells = pt7[:, i_vec, jc]
        close = (
            t_mmM[RT[tp_cells], S5[:, jc], S3[:, i_vec]]
            * jnp.where(RT[tp_cells] > 2, t_tau, 1.0)
            * t_mli
        )
        # t_mlc is already expMLclosing^n_seq (host-side)
        ml = mlsum * jnp.prod(close, axis=0) * t_mlc * sc * sc

        qb_new = jnp.where(pair_ok, (hp + interior + ml) * psc_fac[i_vec, jc], 0.0)
        qb = qb.at[i_vec, j_vec].set(qb_new, mode="drop")

        gate_j = jnp.where(allow_unpaired[jc], 1.0, 0.0)
        qm1_prev = qm1[i_vec, jnp.clip(j_vec - 1, 0, L + 1)]
        stem_f = mlstem_prod(tp_cells, S5[:, i_vec], S3[:, jc])
        qm1_new = jnp.where(ok, qm1_prev * bsn * gate_j + qb_new * stem_f, 0.0)
        qm1 = qm1.at[i_vec, j_vec].set(qm1_new, mode="drop")

        qm1_col = qm1[kk, jc[:, None]]
        pre = bs_seg[i_vec[:, None], jnp.clip(kk - 1, 0, L + 1)] + qm[
            i_vec[:, None], jnp.clip(kk - 1, 0, L + 1)
        ]
        kmask = (kk >= i_vec[:, None]) & (kk <= j_vec[:, None])
        qm_new = jnp.where(ok, jnp.sum(jnp.where(kmask, pre * qm1_col, 0.0), axis=1), 0.0)
        qm = qm.at[i_vec, j_vec].set(qm_new, mode="drop")
        return (qb, qm, qm1), None

    Z = jnp.zeros((L + 2, L + 2), f)
    (qb, qm, qm1), _ = jax.lax.scan(inside_step, (Z, Z, Z), jnp.arange(1, L + 1))

    # exterior factors per pair: prod over seqs of exp_E_ExtLoop
    i_g = ii_all[:, None]
    j_g = ii_all[None, :]
    tp_g = pt7  # (NS, L+2, L+2)
    s5g = S5[:, :, None]  # base before i (seq coords)
    s3g = S3[:, None, :]  # base after j
    has5 = (i_g > 1)[None]
    has3 = (j_g < n)[None]
    s5e = jnp.broadcast_to(s5g, (NS, L + 2, L + 2))
    s3e = jnp.broadcast_to(s3g, (NS, L + 2, L + 2))
    mm = jnp.where(
        has5 & has3,
        t_mmExt[tp_g, s5e, s3e],
        jnp.where(has5, t_d5[tp_g, s5e], jnp.where(has3, t_d3[tp_g, s3e], 1.0)),
    ) * jnp.where(tp_g > 2, t_tau, 1.0)
    ext_m = jnp.prod(mm, axis=0)
    qb_ext = qb * ext_m

    def q1_step(carry, j):
        q1 = carry
        gate_j = jnp.where(allow_unpaired[jnp.clip(j, 0, L + 1)], 1.0, 0.0)
        stems = jnp.sum(
            jnp.where(
                (ii_all >= 1) & (ii_all <= j),
                q1[jnp.clip(ii_all - 1, 0, L + 1)] * qb_ext[ii_all, jnp.clip(j, 0, L + 1)],
                0.0,
            )
        )
        val = q1[jnp.clip(j - 1, 0, L + 1)] * sc * gate_j + stems
        q1 = q1.at[j].set(jnp.where(j <= n, val, q1[jnp.clip(j, 0, L + 1)]), mode="drop")
        return q1, None

    q1, _ = jax.lax.scan(
        q1_step, jnp.zeros((L + 2,), f).at[0].set(1.0), jnp.arange(1, L + 1)
    )

    def qn_step(carry, i):
        qn = carry
        gate_i = jnp.where(allow_unpaired[jnp.clip(i, 0, L + 1)], 1.0, 0.0)
        stems = jnp.sum(
            jnp.where(
                (ii_all >= i) & (ii_all <= n),
                qb_ext[jnp.clip(i, 0, L + 1), ii_all] * qn[jnp.clip(ii_all + 1, 0, L + 1)],
                0.0,
            )
        )
        val = qn[jnp.clip(i + 1, 0, L + 1)] * sc * gate_i + stems
        qn = qn.at[i].set(jnp.where(i <= n, val, qn[jnp.clip(i, 0, L + 1)]), mode="drop")
        return qn, None

    qn_init = jnp.zeros((L + 2,), f).at[jnp.clip(n + 1, 0, L + 1)].set(1.0)
    qn, _ = jax.lax.scan(qn_step, qn_init, jnp.arange(L, 0, -1))
    Q = q1[jnp.clip(n, 0, L + 1)]

    qb_safe = jnp.where(qb > 0, qb, 1.0)

    def outside_step(carry, d):
        pout, A1, A2 = carry
        i_vec = ii_all
        j_vec = i_vec + d
        ok = (i_vec >= 1) & (j_vec <= n)
        jc = jnp.clip(j_vec, 0, L + 1)
        pair_ok = ok & allow_pair[i_vec, jc] & (d > TURN)

        w_ext = (
            q1[jnp.clip(i_vec - 1, 0, L + 1)]
            * qn[jnp.clip(j_vec + 1, 0, L + 1)]
            * ext_m[i_vec, jc]
            / Q
        )

        C_out = pout / qb_safe
        w_int = interior_terms(i_vec, j_vec, False, True, C_out)

        ll = ii_all[None, :]
        qm_r = qm[jnp.clip(j_vec + 1, 0, L + 1)[:, None], jnp.clip(ll - 1, 0, L + 1)]
        e_r = bs_seg[jnp.clip(j_vec + 1, 0, L + 1)[:, None], jnp.clip(ll - 1, 0, L + 1)]
        lmask = (ll >= j_vec[:, None] + 1) & (ll <= n)
        mlsum = jnp.sum(
            jnp.where(
                lmask,
                (A1[i_vec[:, None], ll] + A2[i_vec[:, None], ll]) * qm_r
                + A1[i_vec[:, None], ll] * e_r,
                0.0,
            ),
            axis=1,
        )
        tp_cells = pt7[:, i_vec, jc]
        stem_f = mlstem_prod(tp_cells, S5[:, i_vec], S3[:, jc])
        w_ml = mlsum * stem_f

        pnew = jnp.where(pair_ok, qb[i_vec, jc] * (w_ext + w_int + w_ml), 0.0)
        pout = pout.at[i_vec, j_vec].set(pnew, mode="drop")

        ld = ii_all
        kd = ld - d
        okd = (kd >= 1) & (ld <= n)
        kdc = jnp.clip(kd, 0, L + 1)
        tp_kl = pt7[:, kdc, ld]
        close = (
            t_mmM[RT[tp_kl], S5[:, ld], S3[:, kdc]]
            * jnp.where(RT[tp_kl] > 2, t_tau, 1.0)
            * t_mli
        )
        Ccell = jnp.where(
            okd,
            pout[kdc, ld] / qb_safe[kdc, ld] * psc_fac[kdc, ld]
            * jnp.prod(close, axis=0) * t_mlc * sc * sc,
            0.0,
        )
        irow = ii_all[:, None]
        upd1 = Ccell[None, :] * qm[jnp.clip(kd + 1, 0, L + 1)[None, :], jnp.clip(irow - 1, 0, L + 1)]
        upd2 = Ccell[None, :] * bs_seg[jnp.clip(kd + 1, 0, L + 1)[None, :], jnp.clip(irow - 1, 0, L + 1)]
        iok = (irow > kd[None, :]) & (irow < ld[None, :])
        A1 = A1 + jnp.where(iok, upd1, 0.0)
        A2 = A2 + jnp.where(iok, upd2, 0.0)
        return (pout, A1, A2), None

    P0 = jnp.zeros((L + 2, L + 2), f)
    (pout, A1, A2), _ = jax.lax.scan(outside_step, (P0, P0, P0), jnp.arange(L, 0, -1))
    return pout, Q, dict(qb=qb, qm=qm, qm1=qm1, q1=q1, qn=qn, ext_m=ext_m, A1=A1, A2=A2)


class Alifold:
    """Adapter mirroring class Alifold (src/alifold.h:29-35)."""

    def __init__(self, th: float, bl: bool = True):
        self.th = th
        self.bl = bl

    def consensus_bp(self, aln: list[AlnRow], fa, constraint: str | None = None):
        seqs = []
        for row in aln:
            s = fa[row.seq_id].seq
            out = []
            k = 0
            for m in row.mask:
                out.append(s[k] if m else "-")
                k += bool(m)
            seqs.append("".join(out))
        return consensus_bp(seqs, self.th, bl=self.bl, constraint=constraint)

    def warm_shapes(self, shapes, sample_seq: str) -> None:
        """Prefetch the consensus executables for upcoming (n_seq, n_cols)
        shapes (deserialize + first dispatch, the expensive part under a
        remote runtime).  Each shape is warmed for BOTH B-group support
        buckets production merges produce (BCUT=8: scattered short gap
        runs; BCUT=16: one longer run) — the executable is specialized on
        that static bound.  pf-scale cache writes are suppressed so
        production retry ladders are unaffected.  Safe to call from a
        background thread (pipeline._align overlaps it with the early
        merge layers)."""
        for ns, ncols in shapes:
            s = (sample_seq * (ncols // len(sample_seq) + 1))[:ncols]
            mid = ncols // 2
            variants = [
                # scattered 2-col runs -> maxw2 <= 7 -> BCUT 8
                s[: mid - 6] + "--" + s[mid - 6 : mid] + "--"
                + s[mid : ncols - 4],
                # one 12-col run -> BCUT 16
                s[: mid - 6] + "-" * 12 + s[mid - 6 : ncols - 12],
            ] if ns > 1 and ncols > 40 else [s]
            for row0 in variants:
                aln = [row0[:ncols]] + [s] * (ns - 1)
                try:
                    consensus_bp(aln, self.th, bl=self.bl, _warm=True)
                except Exception:
                    pass  # warm-up only; production surfaces real errors


def consensus_bp(seqs: list[str], th: float, bl=True, constraint=None,
                 fast=True, _warm=False) -> np.ndarray:
    """(L, L) upper-triangular consensus pair probabilities (entries > th).

    _warm=True marks an executable-prefetch call (Alifold.warm_shapes): the
    pf-scale warm-start cache is not written, so production retry ladders
    are byte-for-byte unaffected by whether a prefetch ran."""
    nseq = len(seqs)
    if nseq == 1 and "-" not in seqs[0] and "_" not in seqs[0] and fast:
        # A single ungapped sequence reduces exactly to the McCaskill
        # partition function: every per-seq loop size equals the column
        # offset, kTn = kT, the covariance factor is exp(0) = 1, and the
        # pscore >= MINPSCORE gate admits exactly the canonical pairs
        # (pfreq[0]*2 > 1 rejects all non-pairs).  Route to the (much
        # faster) single-sequence kernel; Vienna's plist 1e-6 cutoff is
        # applied the same way.
        from dafs_tpu.ops import mccaskill

        pm = mccaskill.bp_posterior_fast(seqs[0], th, bl=bl,
                                         constraint=constraint,
                                         special_hp=_special_hp())
        pm[pm <= 1e-6] = 0.0
        return pm
    t = _tables(bl, nseq)
    n = len(seqs[0])
    L = _round_up(n, 32)
    NS = nseq

    S = np.zeros((NS, L + 2), dtype=np.int32)
    for s_i, s in enumerate(seqs):
        enc = ep.encode_rna(s.replace("-", "\0").replace("_", "\0"))
        S[s_i, 1 : n + 1] = enc
    # Vienna S5[s][i] = the base preceding i (skipping gaps), S3[s][i] = the
    # base following i; a2s = non-gap prefix counts.  Vectorized with
    # forward/backward index fills (exact integer ops; S[:,0] == S[:,L+1]
    # == 0 serve as the "no base" sentinels).
    nz = S > 0
    a2s = np.cumsum(nz, axis=1, dtype=np.int32)
    a2s[:, n + 1 :] = a2s[:, n : n + 1]
    cols = np.arange(L + 2)
    ff = np.maximum.accumulate(np.where(nz, cols[None, :], 0), axis=1)
    S5 = np.zeros((NS, L + 2), dtype=np.int32)
    S5[:, 1 : n + 1] = np.take_along_axis(S, ff, axis=1)[:, 0:n]
    bpos = np.where(nz, cols[None, :], L + 1)
    bf = np.minimum.accumulate(bpos[:, ::-1], axis=1)[:, ::-1]
    S3 = np.zeros((NS, L + 2), dtype=np.int32)
    S3[:, 1 : n + 1] = np.take_along_axis(
        S, np.minimum(bf, L + 1), axis=1
    )[:, 2 : n + 2]

    psc_n = make_pscores(S[:, : n + 2], n)
    psc = np.full((L + 2, L + 2), -2.0 * UNIT * 10, dtype=np.float64)
    psc[: n + 2, : n + 2] = psc_n
    # t["kt"] is already kT * n_seq (comparative params)
    kTn = t["kt"] / 10.0
    psc_fac = np.exp(np.where(psc >= MINPSCORE, psc, -1e9) / kTn)

    pt7 = ep.BP_PAIR[S[:, :, None], S[:, None, :]].astype(np.int32)
    pt7[pt7 == 0] = 7

    ii = np.arange(L + 2)
    allow_pair = psc >= MINPSCORE
    allow_pair &= (ii[None, :] - ii[:, None]) > TURN
    allow_pair &= (ii[:, None] >= 1) & (ii[None, :] <= n)
    allow_unpaired = np.ones(L + 2, dtype=bool)
    if constraint is not None:
        assert len(constraint) == n
        stack = []
        for k, ch in enumerate(constraint):
            pos = k + 1
            if ch == "x":
                allow_pair[pos, :] = False
                allow_pair[:, pos] = False
            elif ch == "(":
                stack.append(pos)
            elif ch == ")":
                a = stack.pop()
                keep = allow_pair[a, pos]
                allow_pair[a, :] = False
                allow_pair[:, a] = False
                allow_pair[pos, :] = False
                allow_pair[:, pos] = False
                allow_pair[a, pos] = keep

    # per-seq k-mer codes at alignment position i: built over the UNGAPPED
    # sequence starting at sequence position a2s[i] (alipfold.c loopseq)
    def seq_kmer(seq_codes, k):
        ung = seq_codes[seq_codes > 0]
        out = np.zeros(L + 2, dtype=np.int32)
        tbl = np.full(len(ung) + 2, 0, dtype=np.int32)
        for p0 in range(1, len(ung) - k + 2):
            v = 0
            for dd in range(k):
                v = v * 4 + int(ung[p0 + dd - 1]) - 1
            tbl[p0] = v
        return tbl, ung

    tri_code = np.zeros((NS, L + 2), dtype=np.int32)
    tetra_code = np.zeros((NS, L + 2), dtype=np.int32)
    hexa_code = np.zeros((NS, L + 2), dtype=np.int32)
    for s_i in range(NS):
        ung = S[s_i][S[s_i] > 0].astype(np.int64)
        m = len(ung)
        # vectorized k-mer codes over the ungapped sequence: vals[p] =
        # base-4 packing of ung[p .. p+k-1] (exact integer arithmetic,
        # identical to the old per-position loop); mapped back to non-gap
        # alignment columns via a2s
        cols_ng = np.nonzero(S[s_i, 1 : n + 1] > 0)[0] + 1  # (m,) columns
        for k, arr in ((5, tri_code), (6, tetra_code), (8, hexa_code)):
            if m < k:
                continue
            vals = np.zeros(m - k + 1, dtype=np.int64)
            for dd in range(k):
                vals = vals * 4 + (ung[dd : m - k + 1 + dd] - 1)
            # column of the p0-th base (p0 = 1..m-k+1) gets vals[p0-1]
            arr[s_i, cols_ng[: m - k + 1]] = vals.astype(np.int32)

    if not _special_hp():
        # open 2.4.18 question (STATUS.md "fold parity"): whether the
        # comparative hairpin eval applies tri/tetra/hexaloop bonuses.
        # Code 0 = the all-A k-mer, absent from every bonus table.
        tri_code[:] = 0
        tetra_code[:] = 0
        hexa_code[:] = 0

    f32 = np.float32
    tab = {
        "t_stack": t["stack"], "t_hairpin": t["hairpin"], "t_bulge": t["bulge"],
        "t_internal": t["internal"], "t_mmH": t["mismatchH"], "t_mmI": t["mismatchI"],
        "t_mm1n": t["mismatch1nI"], "t_mm23": t["mismatch23I"],
        "t_mmExt": t["mismatchExt"], "t_mmM": t["mismatchM"],
        "t_d5": t["dangle5"], "t_d3": t["dangle3"],
        "t_i11": t["int11"], "t_i21": t["int21"], "t_i22": t["int22"],
        "t_mlb": f32(t["ml_base"]), "t_mlc": f32(t["ml_closing"] ** nseq),
        "t_mli": f32(t["ml_intern"]), "t_tau": f32(t["terminal_au"]),
        "t_ninio": t["ninio"], "t_lxc": f32(np.exp(-t["lxc"] * 10.0 / t["kt"])),
        "t_tetra": t["tetraloop"], "t_tri": t["triloop"], "t_hexa": t["hexaloop"],
    }
    tab = {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in tab.items()}

    args = dict(
        S=jnp.asarray(S), S5=jnp.asarray(S5), S3=jnp.asarray(S3),
        pt7=jnp.asarray(pt7), psc_fac=jnp.asarray(psc_fac, jnp.float32),
        allow_pair=jnp.asarray(allow_pair),
        allow_unpaired=jnp.asarray(allow_unpaired),
        a2s=jnp.asarray(a2s),
        tri_code=jnp.asarray(tri_code), tetra_code=jnp.asarray(tetra_code),
        hexa_code=jnp.asarray(hexa_code), n=jnp.int32(n),
    )

    # Per-column growth factor (Vienna pf_scale analog).  Vienna picks
    # pf_scale adaptively from the consensus MFE (src/alifold.cpp:59-67);
    # we warm-start from the last scale that stabilized Q for this
    # (n_seq, length-bucket) — progressive merges fold closely related
    # alignments, so the first attempt almost always succeeds and the
    # 0.8x/1.25x ladder only runs on cold keys.  pm = pout/Q is
    # scale-invariant up to f32 rounding.
    _sc_key = (nseq, L)
    # capture the global once: the main thread may clear _SC_FROZEN between
    # two reads issued from the background warm_shapes thread
    _frozen = _SC_FROZEN
    _sc_src = _frozen if _frozen is not None else _SC_CACHE
    sc = f32(_sc_src.get(_sc_key, np.exp(-0.6)))
    ok = False
    _timing = bool(os.environ.get("DAFS_TPU_TIMING"))
    _t0 = _time.perf_counter() if _timing else 0.0
    if fast:
        from dafs_tpu.ops import alifold_kernel as ak

        t2 = dict(
            stack=t["stack"], i11=t["int11"], i21=t["int21"], i22=t["int22"],
            internal=t["internal"], ninio=t["ninio"], bulge=t["bulge"],
            hairpin=t["hairpin"], mmH=t["mismatchH"], mmI=t["mismatchI"],
            mm1n=t["mismatch1nI"], mm23=t["mismatch23I"], mmM=t["mismatchM"],
            mmExt=t["mismatchExt"], d5=t["dangle5"], d3=t["dangle3"],
            tau=t["terminal_au"], mli=t["ml_intern"],
            mlc=t["ml_closing"] ** nseq, tri=t["triloop"],
            tetra=t["tetraloop"], hexa=t["hexaloop"],
            lxc=np.exp(-t["lxc"] * 10.0 / t["kt"]),
        )
        Lp = L + 2
        planes = ak.build_planes(
            t2, S, S5, S3, a2s, pt7, tri_code, tetra_code, hexa_code,
            n, NS, Lp,
        )
        # NS-bucketing: pad the per-sequence stencil inputs with NEUTRAL
        # rows so one trace/compile covers a range of group sizes.  A pad
        # row contributes exactly 1.0 everywhere: its A-group OUT/IN planes
        # are 0, its loop sizes are 0 (a2s = 0 -> m00 = 1), and its pair
        # codes select stack[NN][NN], whose Boltzmann factor is exactly 1.0
        # (boltzmann_param.c NST = 0).  Each 1.0 multiply is exact in f32,
        # but the wider prod-over-NS reduction TREE pairs the real factors
        # differently, so results agree only to ~1 ulp (tested at rtol 1e-6
        # in tests/test_alifold_fast.py) — which is why bucketing stays OFF
        # for the <=10-seq golden families.  Consensus planes
        # (HP/EXT/MLSTEM/MLCLOSE/pscores) and the host scalars (kTn tables,
        # expMLbase^n_seq) keep the TRUE n_seq.
        # Default: exact NS for small groups (pad rows cost device time, and
        # the 10-seq benchmark families keep their exact shapes), power-of-two
        # bucketing above that — a 50-seq family's progressive merges would
        # otherwise trace/compile one kernel per distinct group size.
        # DAFS_TPU_NS_BUCKETS=1/0 forces bucketing on/off.
        import os as _os

        # Small-loop support bound (static): the pair-coupled B-group
        # categories (stack/1-bulge/1x1/2x1/2x2) need a per-seq loop size
        # <= 2 and the separable A-category indicators (1xN/2x3/bulge
        # lines) a loop size <= 3 — i.e. an alignment window with <= 3
        # non-gap positions.  The longest such window over all sequences
        # bounds the (u, v) corner where those terms can fire; everything
        # beyond is exact zero and is skipped
        # (alifold_kernel.alifold_fast BCUT).
        maxw3 = 3  # a gapless alignment: any 4-column window has 4 non-gaps
        for s_i in range(NS):
            pos = np.nonzero(S[s_i, 1 : n + 1] > 0)[0] + 1
            # sentinels: column 0 below, four n+1 above — len(q) >= 5 always,
            # and a gap-only sequence correctly yields the full-width window
            q = np.concatenate([[0], pos, [n + 1] * 4])
            maxw3 = max(maxw3, int((q[4:] - q[:-4]).max() - 1))
        # buckets {8, 16, 31}: merging the rare near-gapless case into 8
        # keeps the executable-variant count low (Alifold.warm_shapes
        # prefetches the 8 and 16 variants per shape)
        BCUT = ak.SW
        for b in (8, 16):
            if maxw3 + 1 <= b:
                BCUT = b
                break
        _bcut_env = os.environ.get("DAFS_TPU_BCUT")
        if _bcut_env:
            # dev override (tests/bitwise A/B): never below the proven bound
            BCUT = max(BCUT, min(ak.SW, int(_bcut_env)))

        _knob = _os.environ.get("DAFS_TPU_NS_BUCKETS")
        if _knob == "0":
            bucket = False
        elif _knob:
            bucket = True
        else:
            bucket = NS > 10
        if bucket:
            NS_pad = 2
            while NS_pad < NS:
                NS_pad *= 2
        else:
            NS_pad = NS
        valid = np.ones(NS_pad, np.float32)
        if NS_pad > NS:
            padn = NS_pad - NS
            valid[NS:] = 0.0  # kernel forces pad rows' planes to neutral
            zrow = np.zeros((padn, S5.shape[1]), np.int32)
            S = np.concatenate([S, zrow])
            S5 = np.concatenate([S5, zrow])
            S3 = np.concatenate([S3, zrow])
            a2s = np.concatenate([a2s, zrow])
            NS = NS_pad
        # pure functions of the kT(n_seq)-scaled tables: cache per key
        # (rebuilding build_special_tables alone cost ~32 ms per call)
        _tk = (bl, nseq)
        if _tk not in _KTAB_CACHE:
            # cache the DEVICE-resident table dicts: re-uploading the ~30
            # arrays per call (jnp.asarray creates a fresh buffer each time)
            # cost ~2-5 ms per transfer over the axon relay — a large part
            # of the measured ~150 ms fixed per-call share
            loop_np = ak.build_loop_tables(t2)
            spec_np = ak.build_special_tables(t2)
            gtabs_np = ak.build_gtabs(t2)
            _KTAB_CACHE[_tk] = (
                {k: jnp.asarray(v) for k, v in loop_np.items()},
                {
                    k: (jnp.asarray(v) if hasattr(v, "shape") else jnp.float32(v))
                    for k, v in spec_np.items()
                },
                {k: jnp.asarray(v) for k, v in gtabs_np.items()},
            )
        loop_tabs, spec_tabs, gtabs = _KTAB_CACHE[_tk]
        PADC = ak.PAD
        RIGHT = Lp + PADC
        def bigvec(arr, repl_last=False):
            out = np.zeros((NS, PADC + Lp + RIGHT), np.int32)
            out[:, PADC:PADC + Lp] = arr
            if repl_last:
                out[:, PADC + Lp:] = arr[:, -1:]
            return out
        Sb = jnp.asarray(bigvec(S[:, :Lp]))
        S5b = jnp.asarray(bigvec(S5))
        S3b = jnp.asarray(bigvec(S3))
        A2Sb = jnp.asarray(bigvec(a2s, repl_last=True))
        # per-seq A-group/code planes: built on device from tiny inputs
        # (the old host numpy builds + (NS, Lp, Lp) transfers dominated
        # per-call wall time over the axon relay); results stay
        # device-resident into alifold_fast
        seq_planes = ak.build_seq_planes(
            gtabs, Sb, S5b, S3b, jnp.asarray(valid), L=L, NS=NS,
        )
        planes_j = {k: jnp.asarray(v) for k, v in planes.items()}
        planes_j.update(seq_planes)
        loop_j = loop_tabs
        spec_j = spec_tabs
        psc_j = jnp.asarray(psc_fac, jnp.float32)
        ap_j = jnp.asarray(allow_pair)
        au_j = jnp.asarray(allow_unpaired)
        # per-column ML base factor uses the TRUE sequence count (the pad
        # rows are neutral and must not enter expMLbase^n_seq)
        if _mlbase_per_base():
            cnt = (S > 0).sum(axis=0).astype(np.float32)  # non-gap seqs per col
            bsn0 = jnp.asarray(np.float32(t["ml_base"]) ** cnt)
        else:
            bsn0 = jnp.float32(np.float32(t["ml_base"]) ** nseq)
        if _timing:
            _t1 = _time.perf_counter()
            jax.block_until_ready((planes_j, loop_j, spec_j, psc_j, S5b, S3b, A2Sb))
            _t2 = _time.perf_counter()
        # XLA:CPU's executable.serialize() segfaults on this kernel's large
        # consensus executables (observed repeatedly in the test suite, jax
        # compilation_cache.put_executable_and_time), so persistent-cache
        # WRITES are suppressed for its compiles on the CPU backend; reads
        # and every other kernel's caching are unaffected, and the TPU
        # backend serializes these executables fine.
        _no_persist = jax.default_backend() == "cpu"

        _valid_kw = (
            dict(valid=jnp.asarray(valid)) if NS_pad > len(seqs) else {}
        )

        def _call(sc):
            # alifold_fast goes through the persistent AOT trace cache
            # (utils/aot.py): warm processes skip ~5s/shape of tracing
            return ak.alifold_fast(
                planes_j, loop_j, spec_j, psc_j, ap_j, au_j,
                S5b, S3b, A2Sb, jnp.int32(n), jnp.float32(sc), bsn0,
                L=L, NS=NS, BCUT=BCUT, **_valid_kw,
            )

        for _ in range(24):
            if _no_persist:
                with _CFG_LOCK:
                    _old_min = (
                        jax.config.jax_persistent_cache_min_compile_time_secs
                    )
                    jax.config.update(
                        "jax_persistent_cache_min_compile_time_secs", 1e9
                    )
                    try:
                        pout, Q = _call(sc)
                    finally:
                        jax.config.update(
                            "jax_persistent_cache_min_compile_time_secs",
                            _old_min,
                        )
            else:
                pout, Q = _call(sc)
            # one host readback per attempt: pout and Q packed into a single
            # device array (the async relay charges a ~26 ms round trip per
            # readback; float(Q) + np.asarray(pout) separately paid two)
            buf = np.asarray(_pack_pout_q(pout, Q))
            Qv = float(buf[-1])
            pout_h = buf[:-1].reshape(pout.shape)
            if np.isfinite(Qv) and 1e-25 < Qv < 1e25 and np.isfinite(pout_h).all():
                ok = True
                if not _warm:
                    if _frozen is not None:
                        # threaded layer: stage under a fixed min() policy;
                        # committed to _SC_CACHE when the layer joins
                        with _SC_LOCK:
                            prev = _SC_PENDING.get(_sc_key)
                            _SC_PENDING[_sc_key] = (
                                float(sc) if prev is None
                                else min(prev, float(sc))
                            )
                    else:
                        _SC_CACHE[_sc_key] = float(sc)
                break
            if not np.isfinite(Qv) or Qv >= 1e25:
                sc = f32(sc * 0.8)
            else:
                sc = f32(sc * 1.25)
        if not ok:
            raise FloatingPointError(
                f"alifold: partition function did not stabilize (L={n}, nseq={nseq})"
            )
        if _timing:
            from dafs_tpu.utils.log import logger as _lg

            _lg.info(
                "alifold L=%d NS=%d BCUT=%d: host_prep %.3fs xfer %.3fs "
                "kernel %.3fs",
                n, nseq, BCUT, _t1 - _t0, _t2 - _t1,
                _time.perf_counter() - _t2,
            )
        pm = pout_h[1 : n + 1, 1 : n + 1].astype(np.float32)
        pm[pm <= th] = 0.0
        pm[pm <= 1e-6] = 0.0
        np.clip(pm, 0.0, 1.0, out=pm)
        return pm
    # Reference kernel (fast=False): retained for oracle tests only.  It
    # uses large gathers, which are pathologically slow on TPU, so it runs
    # on the CPU backend; the gather-free production path is
    # ops/alifold_kernel.py (fast=True, default).
    import contextlib

    if jax.default_backend() != "cpu":
        try:
            cpu_dev = jax.devices("cpu")[0]
            ctx = jax.default_device(cpu_dev)
        except RuntimeError:
            ctx = contextlib.nullcontext()
    else:
        ctx = contextlib.nullcontext()
    for _ in range(24):
        with ctx:
            pout, Q, _dbg = _ali_inside_outside(**args, sc=jnp.float32(sc), **tab, L=L, NS=NS)
        Qv = float(Q)
        if np.isfinite(Qv) and 1e-25 < Qv < 1e25 and np.isfinite(np.asarray(pout)).all():
            ok = True
            break
        if not np.isfinite(Qv) or Qv >= 1e25:
            sc = f32(sc * 0.8)
        else:
            sc = f32(sc * 1.25)
    if not ok:
        raise FloatingPointError(
            f"alifold: partition function did not stabilize (L={n}, nseq={nseq})"
        )
    pm = np.asarray(pout)[1 : n + 1, 1 : n + 1].astype(np.float32)
    pm[pm <= th] = 0.0
    # Vienna's plist export keeps entries with p > 1e-6
    pm[pm <= 1e-6] = 0.0
    np.clip(pm, 0.0, 1.0, out=pm)
    return pm
