"""McCaskill partition function with ViennaRNA 2.4.x energy semantics.

TPU-native reimplementation of the behavior the reference obtains from
Vienna's `pf_fold` (src/fold.cpp:78-116): base-pair probabilities under the
Turner-2004 nearest-neighbor model with dangles=2 (both-sided mismatches on
exterior/multiloop stems), tetraloop/triloop/hexaloop bonuses, NINIO
asymmetry, lxc log extrapolation — with the Andronescu BL* overrides when
`bl=True` (the `-s Boltzmann` default).

Design (TPU-first, no port of Vienna's rolling arrays):
- inside pass: one `lax.scan` over anti-diagonals updating dense (L+2)^2
  matrices qb/qm/qm1; interior loops are a bounded 31x31 stencil gather; the
  multiloop split and qm recursions are masked row-gather dot products.
- exterior: 1-D recurrences q1[j] = q[1..j], qn[i] = q[i..n].
- outside pass: a reverse diagonal scan producing pair probabilities, with
  the O(L^3) multiloop outside term maintained incrementally via two running
  tensors A1[i,l], A2[i,l] (sums over already-processed outer pairs) instead
  of Vienna's prm_l/prml rolling arrays.
- scaling: per-base scale factor (Vienna's pf_scale^-1) chosen adaptively
  and retried on over/underflow; probabilities are scale-invariant, so this
  deviates from Vienna's MFE-derived pf_scale only in float rounding.

Deviations from the reference binary (documented):
- no MFE prefold: pf_scale comes from an adaptive estimate (see above).
- float32 by default (Vienna uses double); pass dtype=float64 under
  jax_enable_x64 for tighter parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.ops import energy_params as ep

TURN = ep.TURN
MAXLOOP = ep.MAXLOOP

_EXP_CACHE: dict = {}


def _tables(bl: bool) -> dict:
    if bl not in _EXP_CACHE:
        _EXP_CACHE[bl] = ep.exp_tables(bl)
    return _EXP_CACHE[bl]


def _round_up(n, m):
    return -(-n // m) * m


def _kmer_codes(s_codes: np.ndarray, k: int, L: int) -> np.ndarray:
    """code of the k-mer starting at 1-based position i (0 if out of range).

    s_codes: (L+2,) Vienna base codes (1..4); code digits are base-1 in base 4.
    """
    out = np.zeros(L + 2, dtype=np.int32)
    n = len(s_codes) - 2
    for i in range(1, n - k + 2):
        v = 0
        ok = True
        for d in range(k):
            b = int(s_codes[i + d]) - 1
            if b < 0:
                ok = False
                break
            v = v * 4 + b
        out[i] = v if ok else 0
    return out


@functools.partial(jax.jit, static_argnames=("L", "dtype"))
def _inside_outside(
    S, ptype_mat, allow_pair, allow_unpaired,
    tri_code, tetra_code, hexa_code, n, sc,
    t_stack, t_hairpin, t_bulge, t_internal,
    t_mmH, t_mmI, t_mm1n, t_mm23, t_mmExt, t_mmM,
    t_d5, t_d3, t_i11, t_i21, t_i22,
    t_mlb, t_mlc, t_mli, t_tau, t_ninio, t_lxc_hp, t_lxc_int, t_lxc_bulge,
    t_tetra, t_tri, t_hexa,
    *, L, dtype=jnp.float32,
):
    """Returns (pout, Q). All index math is 1-based over padded length L.

    dtype=float64 (under jax_enable_x64, with f64 table/sc inputs) runs the
    whole recursion in double — the Vienna-precision replay used by
    tools/f64_replay.py to test whether f32 accumulation explains the
    residual RF00005 parity gap."""
    f = dtype
    idx = jnp.arange(L + 2)
    RT = jnp.asarray(ep.RTYPE)

    bs = t_mlb * sc  # multiloop unpaired base factor incl. scale
    # bs_seg[a, b] = prod_{p=a}^{b} (bs * [allow_unpaired[p]]); 1 for a > b.
    # A segment containing any constrained-paired position contributes 0.
    logv = jnp.where((idx >= 1) & (idx <= n) & allow_unpaired, 1.0, 0.0)
    blocked = jnp.cumsum(jnp.where(idx >= 1, 1.0 - logv, 0.0))
    seg_len = idx[None, :] - idx[:, None] + 1
    # blocked positions within [a, b]: blocked[b] - blocked[a-1]
    seg_blocked = blocked[None, :] - blocked[jnp.maximum(idx[:, None] - 1, 0)]
    bs_seg = jnp.where(
        seg_len <= 0,
        1.0,
        jnp.where(seg_blocked > 0, 0.0, bs ** seg_len.astype(f)),
    )
    # plain scale powers with unpaired gates (exterior segments)
    sc_seg = jnp.where(
        seg_len <= 0,
        1.0,
        jnp.where(seg_blocked > 0, 0.0, sc ** seg_len.astype(f)),
    )

    Sp = S  # (L+2,) base codes, 1-based, 0-padded
    pt = ptype_mat  # (L+2, L+2) pair types

    def mlstem(tp, s5, s3):
        # exp_E_MLstem with both neighbors present
        return t_mmM[tp, s5, s3] * jnp.where(tp > 2, t_tau, 1.0) * t_mli

    def extstem(tp, i, j):
        # exp_E_ExtLoop: 5' neighbor only if i>1, 3' only if j<n
        s5 = jnp.where(i > 1, Sp[jnp.maximum(i - 1, 0)], 0)
        s3 = jnp.where(j < n, Sp[jnp.minimum(j + 1, L + 1)], 0)
        both = (i > 1) & (j < n)
        m = jnp.where(
            both,
            t_mmExt[tp, s5, s3],
            jnp.where(
                i > 1, t_d5[tp, s5], jnp.where(j < n, t_d3[tp, s3], 1.0)
            ),
        )
        return m * jnp.where(tp > 2, t_tau, 1.0)

    # ---------------- hairpin factor per cell -----------------------------
    def hairpin_factor(i, j, tp):
        u = (j - i - 1).astype(jnp.int32)
        uc = jnp.clip(u, 0, MAXLOOP)
        base = t_hairpin[uc] * jnp.where(u > MAXLOOP, t_lxc_hp ** (jnp.log(u.astype(f) / 30.0)), 1.0)
        s5 = Sp[jnp.clip(i + 1, 0, L + 1)]
        s3 = Sp[jnp.clip(j - 1, 0, L + 1)]
        mm = t_mmH[tp, s5, s3]
        tau = jnp.where(tp > 2, t_tau, 1.0)
        tri = t_tri[tri_code[jnp.clip(i, 0, L + 1)]]
        tetra = t_tetra[tetra_code[jnp.clip(i, 0, L + 1)]]
        hexa = t_hexa[hexa_code[jnp.clip(i, 0, L + 1)]]
        val = jnp.where(
            u == 3,
            jnp.where(tri >= 0, tri, base * tau),
            jnp.where(
                (u == 4) & (tetra >= 0),
                tetra,
                jnp.where((u == 6) & (hexa >= 0), hexa, base * mm),
            ),
        )
        # all loop bases must be allowed unpaired
        loop_ok = bs_seg[jnp.clip(i + 1, 0, L + 1), jnp.clip(j - 1, 0, L + 1)] > 0
        return jnp.where(loop_ok, val, 0.0) * sc ** (u + 2).astype(f)

    # ---------------- interior loop factor ---------------------------------
    uu = jnp.arange(MAXLOOP + 1)

    def interior_sum(i_vec, j_vec, tp_vec, qb):
        # sum over u, v of qb[k, l] * K;  k = i+1+u, l = j-1-v
        i_ = i_vec[:, None, None]
        j_ = j_vec[:, None, None]
        u = uu[None, :, None]
        v = uu[None, None, :]
        k = i_ + 1 + u
        l = j_ - 1 - v
        valid = (u + v <= MAXLOOP) & (l - k > TURN) & (l >= 1) & (k <= L)
        kc = jnp.clip(k, 0, L + 1)
        lc = jnp.clip(l, 0, L + 1)
        tp2 = RT[pt[kc, lc]]
        valid &= tp2 > 0
        qbkl = qb[kc, lc]

        si1 = Sp[jnp.clip(i_ + 1, 0, L + 1)]
        sj1 = Sp[jnp.clip(j_ - 1, 0, L + 1)]
        sp1 = Sp[jnp.clip(k - 1, 0, L + 1)]
        sq1 = Sp[jnp.clip(l + 1, 0, L + 1)]
        tp = tp_vec[:, None, None]

        ns = jnp.minimum(u, v)
        nl = jnp.maximum(u, v)
        nlc = jnp.clip(nl, 0, MAXLOOP)
        usum = jnp.clip(u + v, 0, MAXLOOP)

        stack = t_stack[tp, tp2]
        bulge = t_bulge[nlc] * jnp.where(
            nl == 1,
            t_stack[tp, tp2],
            jnp.where(tp > 2, t_tau, 1.0) * jnp.where(tp2 > 2, t_tau, 1.0),
        )
        i11 = t_i11[tp, tp2, si1, sj1]
        i21a = t_i21[tp, tp2, si1, sq1, sj1]
        i21b = t_i21[tp2, tp, sq1, si1, sp1]
        i22 = t_i22[tp, tp2, si1, sp1, sq1, sj1]
        asym = jnp.clip(nl - ns, 0, MAXLOOP)
        mm1n = (
            t_internal[jnp.clip(nl + 1, 0, MAXLOOP)]
            * t_ninio[asym]
            * t_mm1n[tp, si1, sj1]
            * t_mm1n[tp2, sq1, sp1]
        )
        mm23 = (
            t_internal[5]
            * t_ninio[1]
            * t_mm23[tp, si1, sj1]
            * t_mm23[tp2, sq1, sp1]
        )
        generic = (
            t_internal[usum]
            * t_ninio[asym]
            * t_mmI[tp, si1, sj1]
            * t_mmI[tp2, sq1, sp1]
        )

        K = jnp.where(
            nl == 0,
            stack,
            jnp.where(
                ns == 0,
                bulge,
                jnp.where(
                    (ns == 1) & (nl == 1),
                    i11,
                    jnp.where(
                        (ns == 1) & (nl == 2),
                        jnp.where(u == 1, i21a, i21b),
                        jnp.where(
                            (ns == 2) & (nl == 2),
                            i22,
                            jnp.where(
                                ns == 1,
                                mm1n,
                                jnp.where((ns == 2) & (nl == 3), mm23, generic),
                            ),
                        ),
                    ),
                ),
            ),
        )
        # unpaired gates on both loop strands
        g1 = bs_seg[jnp.clip(i_ + 1, 0, L + 1), jnp.clip(k - 1, 0, L + 1)] > 0
        g2 = bs_seg[jnp.clip(l + 1, 0, L + 1), jnp.clip(j_ - 1, 0, L + 1)] > 0
        K = K * sc ** (u + v + 2).astype(f)
        term = jnp.where(valid & g1 & g2, qbkl * K, 0.0)
        return jnp.sum(term, axis=(1, 2))

    # ---------------- inside scan -------------------------------------------
    ii_all = jnp.arange(L + 2)

    def inside_step(carry, d):
        qb, qm, qm1 = carry
        i_vec = ii_all
        j_vec = i_vec + d
        ok = (i_vec >= 1) & (j_vec <= n)
        jc = jnp.clip(j_vec, 0, L + 1)
        tp_vec = pt[i_vec, jc]
        pair_ok = ok & (allow_pair[i_vec, jc]) & (d > TURN)

        hp = hairpin_factor(i_vec, j_vec, tp_vec)
        interior = interior_sum(i_vec, j_vec, tp_vec, qb)

        # multiloop closing: sum_k qm[i+1, k-1] * qm1[k, j-1]
        kk = ii_all[None, :]
        qm_l = qm[jnp.clip(i_vec + 1, 0, L + 1)[:, None], jnp.clip(kk - 1, 0, L + 1)]
        qm1_r = qm1[kk, jnp.clip(j_vec - 1, 0, L + 1)[:, None]]
        mlk = (kk >= i_vec[:, None] + 2) & (kk <= j_vec[:, None] - 1)
        mlsum = jnp.sum(jnp.where(mlk, qm_l * qm1_r, 0.0), axis=1)
        s5c = Sp[jnp.clip(j_vec - 1, 0, L + 1)]
        s3c = Sp[jnp.clip(i_vec + 1, 0, L + 1)]
        ml = mlsum * t_mlc * mlstem(RT[tp_vec], s5c, s3c) * sc * sc

        qb_new_diag = jnp.where(pair_ok, hp + interior + ml, 0.0)
        qb = qb.at[i_vec, j_vec].set(qb_new_diag, mode="drop")

        # qm1[i][j] = qm1[i][j-1]*bs*gate(j) + qb[i][j]*mlstem(type, S[i-1], S[j+1])
        gate_j = jnp.where(allow_unpaired[jc], 1.0, 0.0)
        qm1_prev = qm1[i_vec, jnp.clip(j_vec - 1, 0, L + 1)]
        stem = qb_new_diag * mlstem(
            tp_vec, Sp[jnp.clip(i_vec - 1, 0, L + 1)], Sp[jnp.clip(j_vec + 1, 0, L + 1)]
        )
        qm1_new = jnp.where(ok, qm1_prev * bs * gate_j + stem, 0.0)
        qm1 = qm1.at[i_vec, j_vec].set(qm1_new, mode="drop")

        # qm[i][j] = sum_k (bs_seg[i, k-1] + qm[i][k-1]) * qm1[k][j]
        qm1_col = qm1[kk, jc[:, None]]
        pre = bs_seg[i_vec[:, None], jnp.clip(kk - 1, 0, L + 1)] + qm[
            i_vec[:, None], jnp.clip(kk - 1, 0, L + 1)
        ]
        kmask = (kk >= i_vec[:, None]) & (kk <= j_vec[:, None])
        qm_new = jnp.where(ok, jnp.sum(jnp.where(kmask, pre * qm1_col, 0.0), axis=1), 0.0)
        qm = qm.at[i_vec, j_vec].set(qm_new, mode="drop")

        return (qb, qm, qm1), None

    Z = jnp.zeros((L + 2, L + 2), f)
    (qb, qm, qm1), _ = jax.lax.scan(
        inside_step, (Z, Z, Z), jnp.arange(1, L + 1)
    )

    # ---------------- exterior 1-D recurrences ------------------------------
    ext_w = jnp.zeros((L + 2, L + 2), f)
    tp_all = pt
    # precompute expExt for all pairs
    i_g = ii_all[:, None]
    j_g = ii_all[None, :]
    s5g = jnp.where(i_g > 1, Sp[jnp.clip(i_g - 1, 0, L + 1)], 0)
    s3g = jnp.where(j_g < n, Sp[jnp.clip(j_g + 1, 0, L + 1)], 0)
    both_g = (i_g > 1) & (j_g < n)
    ext_m = jnp.where(
        both_g,
        t_mmExt[tp_all, s5g, s3g],
        jnp.where(
            i_g > 1,
            t_d5[tp_all, s5g],
            jnp.where(j_g < n, t_d3[tp_all, s3g], 1.0),
        ),
    ) * jnp.where(tp_all > 2, t_tau, 1.0)
    qb_ext = qb * ext_m  # qb with exterior stem factor

    def q1_step(carry, j):
        q1 = carry  # (L+2,) q[1..x]
        # q1[j] = q1[j-1]*sc*gate(j) + sum_k q1[k-1]*qb_ext[k, j]
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

    q1_init = jnp.zeros((L + 2,), f).at[0].set(1.0)
    q1, _ = jax.lax.scan(q1_step, q1_init, jnp.arange(1, L + 1))

    def qn_step(carry, i):
        qn = carry  # qn[x] = q[x..n]
        gate_i = jnp.where(allow_unpaired[jnp.clip(i, 0, L + 1)], 1.0, 0.0)
        stems = jnp.sum(
            jnp.where(
                (ii_all >= i) & (ii_all <= n),
                qb_ext[jnp.clip(i, 0, L + 1), ii_all] * qn[jnp.clip(ii_all + 1, 0, L + 1)],
                0.0,
            )
        )
        val = qn[jnp.clip(i + 1, 0, L + 1)] * sc * gate_i + stems
        qn = qn.at[i].set(
            jnp.where(i <= n, val, qn[jnp.clip(i, 0, L + 1)]), mode="drop"
        )
        return qn, None

    qn_init = jnp.zeros((L + 2,), f).at[L + 1].set(1.0)
    # ensure qn[n+1] = 1
    qn_init = qn_init.at[jnp.clip(n + 1, 0, L + 1)].set(1.0)
    qn, _ = jax.lax.scan(qn_step, qn_init, jnp.arange(L, 0, -1))

    Q = q1[jnp.clip(n, 0, L + 1)]

    # ---------------- outside scan ------------------------------------------
    qb_safe = jnp.where(qb > 0, qb, 1.0)

    def outside_step(carry, d):
        pout, A1, A2 = carry
        i_vec = ii_all
        j_vec = i_vec + d
        ok = (i_vec >= 1) & (j_vec <= n)
        jc = jnp.clip(j_vec, 0, L + 1)
        tp_vec = pt[i_vec, jc]
        pair_ok = ok & allow_pair[i_vec, jc] & (d > TURN)

        # exterior
        w_ext = q1[jnp.clip(i_vec - 1, 0, L + 1)] * qn[jnp.clip(j_vec + 1, 0, L + 1)] * ext_m[
            i_vec, jc
        ] / Q

        # interior: outer pairs (k, l), k = i-1-u, l = j+1+v
        i_ = i_vec[:, None, None]
        j_ = j_vec[:, None, None]
        u = uu[None, :, None]
        v = uu[None, None, :]
        k = i_ - 1 - u
        l = j_ + 1 + v
        valid = (u + v <= MAXLOOP) & (k >= 1) & (l <= n)
        kc = jnp.clip(k, 0, L + 1)
        lc = jnp.clip(l, 0, L + 1)
        tpo = pt[kc, lc]
        valid &= tpo > 0
        C_int = pout[kc, lc] / qb_safe[kc, lc]
        si1 = Sp[jnp.clip(k + 1, 0, L + 1)]
        sj1 = Sp[jnp.clip(l - 1, 0, L + 1)]
        sp1 = Sp[jnp.clip(i_ - 1, 0, L + 1)]
        sq1 = Sp[jnp.clip(j_ + 1, 0, L + 1)]
        tp2 = RT[tp_vec][:, None, None]

        ns = jnp.minimum(u, v)
        nl = jnp.maximum(u, v)
        nlc = jnp.clip(nl, 0, MAXLOOP)
        usum = jnp.clip(u + v, 0, MAXLOOP)
        stack = t_stack[tpo, tp2]
        bulge = t_bulge[nlc] * jnp.where(
            nl == 1,
            t_stack[tpo, tp2],
            jnp.where(tpo > 2, t_tau, 1.0) * jnp.where(tp2 > 2, t_tau, 1.0),
        )
        i11 = t_i11[tpo, tp2, si1, sj1]
        i21a = t_i21[tpo, tp2, si1, sq1, sj1]
        i21b = t_i21[tp2, tpo, sq1, si1, sp1]
        i22 = t_i22[tpo, tp2, si1, sp1, sq1, sj1]
        asym = jnp.clip(nl - ns, 0, MAXLOOP)
        mm1n = (
            t_internal[jnp.clip(nl + 1, 0, MAXLOOP)]
            * t_ninio[asym]
            * t_mm1n[tpo, si1, sj1]
            * t_mm1n[tp2, sq1, sp1]
        )
        mm23 = (
            t_internal[5]
            * t_ninio[1]
            * t_mm23[tpo, si1, sj1]
            * t_mm23[tp2, sq1, sp1]
        )
        generic = (
            t_internal[usum]
            * t_ninio[asym]
            * t_mmI[tpo, si1, sj1]
            * t_mmI[tp2, sq1, sp1]
        )
        K = jnp.where(
            nl == 0,
            stack,
            jnp.where(
                ns == 0,
                bulge,
                jnp.where(
                    (ns == 1) & (nl == 1),
                    i11,
                    jnp.where(
                        (ns == 1) & (nl == 2),
                        jnp.where(u == 1, i21a, i21b),
                        jnp.where(
                            (ns == 2) & (nl == 2),
                            i22,
                            jnp.where(
                                ns == 1,
                                mm1n,
                                jnp.where((ns == 2) & (nl == 3), mm23, generic),
                            ),
                        ),
                    ),
                ),
            ),
        )
        g1 = bs_seg[jnp.clip(k + 1, 0, L + 1), jnp.clip(i_ - 1, 0, L + 1)] > 0
        g2 = bs_seg[jnp.clip(j_ + 1, 0, L + 1), jnp.clip(l - 1, 0, L + 1)] > 0
        K = K * sc ** (u + v + 2).astype(f)
        w_int = jnp.sum(jnp.where(valid & g1 & g2, C_int * K, 0.0), axis=(1, 2))

        # multiloop: W_ml[i,j] = mlstem(i,j) *
        #   sum_{l>j} ((A1+A2)[i,l]*qm[j+1][l-1] + A1[i,l]*bs_seg[j+1][l-1])
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
        w_ml = mlsum * mlstem(
            tp_vec, Sp[jnp.clip(i_vec - 1, 0, L + 1)], Sp[jnp.clip(j_vec + 1, 0, L + 1)]
        )

        pnew = jnp.where(pair_ok, qb[i_vec, jc] * (w_ext + w_int + w_ml), 0.0)
        pout = pout.at[i_vec, j_vec].set(pnew, mode="drop")

        # update A1/A2 with this diagonal's outer pairs: cell (kd, ld) with
        # kd = ld - d; A1[i, ld] += C * qm[kd+1, i-1]; A2[i, ld] += C * bs_seg[kd+1, i-1]
        ld = ii_all
        kd = ld - d
        okd = (kd >= 1) & (ld <= n)
        kdc = jnp.clip(kd, 0, L + 1)
        Ccell = jnp.where(
            okd,
            pout[kdc, ld]
            / qb_safe[kdc, ld]
            * t_mlc
            * mlstem(RT[pt[kdc, ld]], Sp[jnp.clip(ld - 1, 0, L + 1)], Sp[jnp.clip(kdc + 1, 0, L + 1)])
            * sc
            * sc,
            0.0,
        )
        irow = ii_all[:, None]  # i
        upd1 = Ccell[None, :] * qm[jnp.clip(kd + 1, 0, L + 1)[None, :], jnp.clip(irow - 1, 0, L + 1)]
        upd2 = Ccell[None, :] * bs_seg[jnp.clip(kd + 1, 0, L + 1)[None, :], jnp.clip(irow - 1, 0, L + 1)]
        iok = (irow > kd[None, :] + 0) & (irow < ld[None, :])
        A1 = A1 + jnp.where(iok, upd1, 0.0)
        A2 = A2 + jnp.where(iok, upd2, 0.0)

        return (pout, A1, A2), None

    P0 = jnp.zeros((L + 2, L + 2), f)
    (pout, _, _), _ = jax.lax.scan(
        outside_step, (P0, P0, P0), jnp.arange(L, 0, -1)
    )
    return pout, Q


_VMAPPED: dict = {}


def _batched_inside_outside(L):
    """vmap of the single-sequence kernel over the leading batch axis."""
    if L not in _VMAPPED:
        def call(S, ptype_mat, allow_pair, allow_unpaired, tri_code, tetra_code,
                 hexa_code, n, sc, tab):
            return _inside_outside(
                S=S, ptype_mat=ptype_mat, allow_pair=allow_pair,
                allow_unpaired=allow_unpaired, tri_code=tri_code,
                tetra_code=tetra_code, hexa_code=hexa_code, n=n, sc=sc,
                **tab, L=L,
            )

        _VMAPPED[L] = jax.jit(
            jax.vmap(call, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))
        )
    return _VMAPPED[L]


def _prepare(seq: str, L: int, constraint: str | None):
    n = len(seq)
    s = np.zeros(L + 2, dtype=np.int32)
    s[1 : n + 1] = ep.encode_rna(seq)
    pt = ep.BP_PAIR[s[:, None], s[None, :]].astype(np.int32)
    allow_pair = pt > 0
    allow_unpaired = np.ones(L + 2, dtype=bool)
    ii = np.arange(L + 2)
    allow_pair &= (ii[None, :] - ii[:, None]) > TURN
    allow_pair &= (ii[:, None] >= 1) & (ii[None, :] <= n)
    if constraint is not None:
        assert len(constraint) == n
        stack = []
        forced = []
        for k, ch in enumerate(constraint):
            pos = k + 1
            if ch == "x":
                allow_pair[pos, :] = False
                allow_pair[:, pos] = False
            elif ch == "(":
                stack.append(pos)
            elif ch == ")":
                forced.append((stack.pop(), pos))
        for (a, b) in forced:
            keep = allow_pair[a, b]
            allow_pair[a, :] = False
            allow_pair[:, a] = False
            allow_pair[b, :] = False
            allow_pair[:, b] = False
            allow_pair[a, b] = keep
    return s, pt, allow_pair, allow_unpaired


_VMAPPED_FAST: dict = {}


def _batched_fast(L):
    """vmap of the gather-free kernel over a length bucket."""
    if L not in _VMAPPED_FAST:
        from dafs_tpu.ops import mccaskill_kernel as MK

        def call(S, pt, ap, au, tri, tet, hexa, n, sc, base):
            tabs = dict(base)
            tabs["tri_code"] = tri
            tabs["tetra_code"] = tet
            tabs["hexa_code"] = hexa
            return MK.mccaskill_fast(S, pt, ap, au, n, sc, tabs, L=L)

        _VMAPPED_FAST[L] = jax.jit(
            jax.vmap(call, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))
        )
    return _VMAPPED_FAST[L]


def batch_bp_posteriors_fast(seqs, th, bl=True, constraints=None, put=None,
                             b_mult=1):
    """Batched gather-free kernel: one launch per length bucket, vmapped over
    the sequences (shardable along the batch axis on a device mesh).

    put: optional device_put-like callable applied to every batched array
    (e.g. a NamedSharding placement); b_mult: pad the batch to a multiple of
    this (the mesh size) so the work axis divides evenly."""
    base = _fast_tabs(bl)
    f32 = np.float32
    out: list = [None] * len(seqs)
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(seqs):
        buckets.setdefault(_round_up(len(s), 32), []).append(i)
    for L, idxs in buckets.items():
        B = -(-len(idxs) // b_mult) * b_mult
        S = np.zeros((B, L + 2), np.int32)
        PT = np.zeros((B, L + 2, L + 2), np.int32)
        AP = np.zeros((B, L + 2, L + 2), bool)
        AU = np.zeros((B, L + 2), bool)
        TRI = np.zeros((B, L + 2), np.int32)
        TET = np.zeros((B, L + 2), np.int32)
        HEX = np.zeros((B, L + 2), np.int32)
        ns = np.zeros(B, np.int32)
        ns[:] = 1  # padded rows: trivial length-1 problems
        for bi, i in enumerate(idxs):
            c = constraints[i] if constraints is not None else None
            s_, pt_, ap_, au_ = _prepare(seqs[i], L, c)
            S[bi], PT[bi], AP[bi], AU[bi] = s_, pt_, ap_, au_
            TRI[bi] = _kmer_codes(s_, 5, L)
            TET[bi] = _kmer_codes(s_, 6, L)
            HEX[bi] = _kmer_codes(s_, 8, L)
            ns[bi] = len(seqs[i])
        fn = _batched_fast(L)
        unsharded = put is None
        if put is None:
            put = jnp.asarray
        sc = np.full(B, np.exp(-0.6), np.float32)
        for _ in range(16):
            args_dev = (
                put(jnp.asarray(S)), put(jnp.asarray(PT)), put(jnp.asarray(AP)),
                put(jnp.asarray(AU)), put(jnp.asarray(TRI)),
                put(jnp.asarray(TET)), put(jnp.asarray(HEX)),
                put(jnp.asarray(ns)), put(jnp.asarray(sc)), base,
            )
            if unsharded:
                # single-device path: persistent AOT trace cache
                from dafs_tpu.utils import aot

                pout, Q = aot.cached_call(
                    fn, *args_dev, salt=f"mccaskill_batched L={L}"
                )
            else:
                pout, Q = fn(*args_dev)
            Qv = np.asarray(Q)
            pm = np.asarray(pout)
            good = (
                np.isfinite(Qv) & (Qv > 1e-25) & (Qv < 1e25)
                & np.isfinite(pm).all(axis=(1, 2))
            )
            if good[: len(idxs)].all():
                break
            over = ~np.isfinite(Qv) | (Qv >= 1e25)
            sc = np.where(good, sc, np.where(over, f32(sc * 0.8), f32(sc * 1.25)))
        else:
            raise FloatingPointError("mccaskill_fast: batch did not stabilize")
        for bi, i in enumerate(idxs):
            n = len(seqs[i])
            p = pm[bi, 1 : n + 1, 1 : n + 1].astype(np.float32).copy()
            p[p <= th] = 0.0
            np.clip(p, 0.0, 1.0, out=p)
            out[i] = p
    return out


def batch_bp_posteriors(seqs, th, bl=True, constraints=None, fast=True):
    """BP posteriors for a batch of sequences.

    fast=True uses the gather-free kernel (ops/mccaskill_kernel.py) vmapped
    per length bucket; fast=False uses the straightforward kernel vmapped per
    length bucket (kept as a cross-validation reference).
    """
    if fast:
        return batch_bp_posteriors_fast(seqs, th, bl=bl, constraints=constraints)
    t = _tables(bl)
    f32 = np.float32
    tab = _jax_tables(t)
    out: list = [None] * len(seqs)
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(seqs):
        buckets.setdefault(_round_up(len(s), 32), []).append(i)
    for L, idxs in buckets.items():
        B = len(idxs)
        S = np.zeros((B, L + 2), np.int32)
        PT = np.zeros((B, L + 2, L + 2), np.int32)
        AP = np.zeros((B, L + 2, L + 2), bool)
        AU = np.zeros((B, L + 2), bool)
        TRI = np.zeros((B, L + 2), np.int32)
        TET = np.zeros((B, L + 2), np.int32)
        HEX = np.zeros((B, L + 2), np.int32)
        ns = np.zeros(B, np.int32)
        for bi, i in enumerate(idxs):
            c = constraints[i] if constraints is not None else None
            s_, pt_, ap_, au_ = _prepare(seqs[i], L, c)
            S[bi], PT[bi], AP[bi], AU[bi] = s_, pt_, ap_, au_
            TRI[bi] = _kmer_codes(s_, 5, L)
            TET[bi] = _kmer_codes(s_, 6, L)
            HEX[bi] = _kmer_codes(s_, 8, L)
            ns[bi] = len(seqs[i])
        fn = _batched_inside_outside(L)
        sc = np.full(B, np.exp(-0.6), np.float32)
        for _ in range(16):
            pout, Q = fn(
                jnp.asarray(S), jnp.asarray(PT), jnp.asarray(AP), jnp.asarray(AU),
                jnp.asarray(TRI), jnp.asarray(TET), jnp.asarray(HEX),
                jnp.asarray(ns), jnp.asarray(sc), tab,
            )
            Qv = np.asarray(Q)
            pm = np.asarray(pout)
            good = (
                np.isfinite(Qv) & (Qv > 1e-25) & (Qv < 1e25)
                & np.isfinite(pm).all(axis=(1, 2))
            )
            if good.all():
                break
            over = ~np.isfinite(Qv) | (Qv >= 1e25)
            sc = np.where(good, sc, np.where(over, f32(sc * 0.8), f32(sc * 1.25)))
        else:
            raise FloatingPointError("mccaskill: batch did not stabilize")
        for bi, i in enumerate(idxs):
            n = len(seqs[i])
            p = pm[bi, 1 : n + 1, 1 : n + 1].astype(np.float32).copy()
            p[p <= th] = 0.0
            np.clip(p, 0.0, 1.0, out=p)
            out[i] = p
    return out


def _jax_tables(t):
    f32 = np.float32
    tab = {
        "t_stack": t["stack"], "t_hairpin": t["hairpin"], "t_bulge": t["bulge"],
        "t_internal": t["internal"], "t_mmH": t["mismatchH"], "t_mmI": t["mismatchI"],
        "t_mm1n": t["mismatch1nI"], "t_mm23": t["mismatch23I"],
        "t_mmExt": t["mismatchExt"], "t_mmM": t["mismatchM"],
        "t_d5": t["dangle5"], "t_d3": t["dangle3"],
        "t_i11": t["int11"], "t_i21": t["int21"], "t_i22": t["int22"],
        "t_mlb": f32(t["ml_base"]), "t_mlc": f32(t["ml_closing"]),
        "t_mli": f32(t["ml_intern"]), "t_tau": f32(t["terminal_au"]),
        "t_ninio": t["ninio"],
        "t_lxc_hp": f32(np.exp(-t["lxc"] * 10.0 / t["kt"])),
        "t_lxc_int": f32(np.exp(-t["lxc"] * 10.0 / t["kt"])),
        "t_lxc_bulge": f32(np.exp(-t["lxc"] * 10.0 / t["kt"])),
        "t_tetra": t["tetraloop"], "t_tri": t["triloop"], "t_hexa": t["hexaloop"],
    }
    return {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in tab.items()}


def bp_posterior(seq: str, th: float, bl: bool = True, constraint: str | None = None,
                 dtype=np.float32):
    """Dense (L, L) upper-triangular base-pair probability matrix, entries
    kept strictly greater than th (src/fold.cpp:108-114).

    dtype=np.float64 (requires jax_enable_x64) runs the partition function
    in double precision; the returned matrix is still f32 (the pipeline's
    working precision)."""
    t = _tables(bl)
    n = len(seq)
    L = _round_up(n, 32)
    s = np.zeros(L + 2, dtype=np.int32)
    s[1 : n + 1] = ep.encode_rna(seq)

    pt = ep.BP_PAIR[s[:, None], s[None, :]].astype(np.int32)
    allow_pair = pt > 0
    allow_unpaired = np.ones(L + 2, dtype=bool)
    ii = np.arange(L + 2)
    allow_pair &= (ii[None, :] - ii[:, None]) > TURN
    allow_pair &= (ii[:, None] >= 1) & (ii[None, :] <= n)

    if constraint is not None:
        # Vienna 2.x hard-constraint semantics for DAFS's mapped strings
        # ('x' = forced unpaired, '.' = free, matched '()' = this exact pair
        # allowed and both bases excluded from any other pair).
        assert len(constraint) == n
        stack = []
        forced = []
        for k, ch in enumerate(constraint):
            pos = k + 1
            if ch == "x":
                allow_pair[pos, :] = False
                allow_pair[:, pos] = False
            elif ch == "(":
                stack.append(pos)
            elif ch == ")":
                forced.append((stack.pop(), pos))
        for (a, b) in forced:
            keep = allow_pair[a, b]
            allow_pair[a, :] = False
            allow_pair[:, a] = False
            allow_pair[b, :] = False
            allow_pair[:, b] = False
            allow_pair[a, b] = keep

    args = dict(
        S=jnp.asarray(s),
        ptype_mat=jnp.asarray(pt),
        allow_pair=jnp.asarray(allow_pair),
        allow_unpaired=jnp.asarray(allow_unpaired),
        tri_code=jnp.asarray(_kmer_codes(s, 5, L)),
        tetra_code=jnp.asarray(_kmer_codes(s, 6, L)),
        hexa_code=jnp.asarray(_kmer_codes(s, 8, L)),
        n=jnp.int32(n),
    )
    dt = dtype
    tab = {
        "t_stack": t["stack"], "t_hairpin": t["hairpin"], "t_bulge": t["bulge"],
        "t_internal": t["internal"], "t_mmH": t["mismatchH"], "t_mmI": t["mismatchI"],
        "t_mm1n": t["mismatch1nI"], "t_mm23": t["mismatch23I"],
        "t_mmExt": t["mismatchExt"], "t_mmM": t["mismatchM"],
        "t_d5": t["dangle5"], "t_d3": t["dangle3"],
        "t_i11": t["int11"], "t_i21": t["int21"], "t_i22": t["int22"],
        "t_mlb": dt(t["ml_base"]), "t_mlc": dt(t["ml_closing"]),
        "t_mli": dt(t["ml_intern"]), "t_tau": dt(t["terminal_au"]),
        "t_ninio": t["ninio"],
        "t_lxc_hp": dt(np.exp(-t["lxc"] * 10.0 / t["kt"])),
        "t_lxc_int": dt(np.exp(-t["lxc"] * 10.0 / t["kt"])),
        "t_lxc_bulge": dt(np.exp(-t["lxc"] * 10.0 / t["kt"])),
        "t_tetra": t["tetraloop"], "t_tri": t["triloop"], "t_hexa": t["hexaloop"],
    }
    tab = {k: (jnp.asarray(np.asarray(v, dtype))) for k, v in tab.items()}
    jdt = jnp.float64 if dtype == np.float64 else jnp.float32

    # adaptive scale (Vienna's pf_scale^-1): downweight each column by the
    # expected per-base Boltzmann growth so q stays in float range; retry
    # smaller on overflow, larger on underflow.  Probabilities are
    # scale-invariant, so this only affects rounding.
    sc = dtype(np.exp(-0.6))  # ~ exp(+1.07 * (-0.35 kcal/base) * 10 / kT)
    ok = False
    for _ in range(16):
        pout, Q = _inside_outside(**args, sc=jdt(sc), **tab, L=L, dtype=jdt)
        Qv = float(Q)
        if np.isfinite(Qv) and 1e-25 < Qv < 1e25:
            pm = np.asarray(pout)
            if np.isfinite(pm).all():
                ok = True
                break
        if not np.isfinite(Qv) or Qv >= 1e25:
            sc = dt(sc * 0.8)
        else:
            sc = dt(sc * 1.25)
    if not ok:
        raise FloatingPointError(
            f"mccaskill: partition function did not stabilize (L={n})"
        )
    pm = np.asarray(pout)[1 : n + 1, 1 : n + 1].astype(np.float32)
    pm[pm <= th] = 0.0
    np.clip(pm, 0.0, 1.0, out=pm)
    return pm


# ---------------------------------------------------------------------------
# fast (gather-free) kernel wiring — see ops/mccaskill_kernel.py
# ---------------------------------------------------------------------------

_FAST_TABLES: dict = {}


def _fast_tabs(bl: bool):
    if bl not in _FAST_TABLES:
        t = _tables(bl)
        f32 = np.float32
        lxc = f32(np.exp(-t["lxc"] * 10.0 / t["kt"]))
        tabs = {
            "stack": t["stack"], "hairpin": t["hairpin"], "bulge": t["bulge"],
            "mmH": t["mismatchH"], "mmI": t["mismatchI"],
            "mm1n": t["mismatch1nI"], "mm23": t["mismatch23I"],
            "mmExt": t["mismatchExt"], "d5": t["dangle5"], "d3": t["dangle3"],
            "mmM": t["mismatchM"],
            "i11": t["int11"], "i21": t["int21"], "i22": t["int22"],
            "mlb": f32(t["ml_base"]), "mlc": f32(t["ml_closing"]),
            "mli": f32(t["ml_intern"]), "tau": f32(t["terminal_au"]),
            "lxc": lxc,
            "tetra": t["tetraloop"], "tri": t["triloop"], "hexa": t["hexaloop"],
        }
        tabs = {k: (jnp.asarray(np.asarray(v, np.float32)) if not np.isscalar(v) else jnp.float32(v)) for k, v in tabs.items()}
        # static per-(u, s) stencil constants (s = u + v)
        SW = MAXLOOP + 1
        uu = np.arange(SW).astype(np.float64)
        u_g = uu[:, None] + np.zeros((1, SW))
        s_g = np.zeros((SW, 1)) + uu[None, :]
        v_g = s_g - u_g
        valid_uv = (v_g >= 0) & (s_g <= MAXLOOP)
        internal = np.asarray(t["internal"], np.float64)
        bulge_np = np.asarray(t["bulge"], np.float64)
        ninio = np.asarray(t["ninio"], np.float64)
        si_ = np.clip(s_g.astype(int), 0, MAXLOOP)
        asym = np.clip(np.abs(u_g - v_g).astype(int), 0, MAXLOOP)
        nl_uv = np.maximum(u_g, v_g).astype(int)
        special = (
            ((u_g == 0) & (v_g == 0))
            | ((u_g == 0) & (v_g == 1)) | ((u_g == 1) & (v_g == 0))
            | ((u_g == 1) & (v_g == 1))
            | ((u_g == 1) & (v_g == 2)) | ((u_g == 2) & (v_g == 1))
            | ((u_g == 2) & (v_g == 2))
        )
        mask_1n = valid_uv & (((u_g == 1) & (v_g >= 3)) | ((v_g == 1) & (u_g >= 3)))
        mask_23 = valid_uv & (((u_g == 2) & (v_g == 3)) | ((u_g == 3) & (v_g == 2)))
        mask_bul = valid_uv & (((u_g == 0) & (v_g >= 2)) | ((v_g == 0) & (u_g >= 2)))
        mask_gen = valid_uv & (u_g >= 1) & (v_g >= 1) & ~special & ~mask_1n & ~mask_23
        tabs["C_gen"] = jnp.asarray(np.where(mask_gen, internal[si_] * ninio[asym], 0.0), jnp.float32)
        tabs["C_1n"] = jnp.asarray(
            np.where(mask_1n, internal[np.clip(nl_uv + 1, 0, MAXLOOP)] * ninio[np.clip(nl_uv - 1, 0, MAXLOOP)], 0.0),
            jnp.float32,
        )
        tabs["C_23"] = jnp.asarray(np.where(mask_23, internal[5] * ninio[1], 0.0), jnp.float32)
        tabs["C_tau"] = jnp.asarray(np.where(mask_bul, bulge_np[np.clip(nl_uv, 0, MAXLOOP)], 0.0), jnp.float32)
        _FAST_TABLES[bl] = tabs
    return _FAST_TABLES[bl]


def bp_posterior_fast(seq: str, th: float, bl: bool = True, constraint=None,
                      special_hp: bool = True):
    """Gather-free kernel path; numerically equivalent to bp_posterior.

    special_hp=False disables tri/tetra/hexaloop bonuses (the alifold
    single-sequence route under DAFS_TPU_ALIFOLD_SPECIAL_HP=0)."""
    from dafs_tpu.ops import mccaskill_kernel as MK

    base = _fast_tabs(bl)
    n = len(seq)
    L = _round_up(n, 32)
    s, pt, allow_pair, allow_unpaired = _prepare(seq, L, constraint)
    tabs = dict(base)
    zc = np.zeros(L + 2, np.int32)
    tabs["tri_code"] = jnp.asarray(_kmer_codes(s, 5, L) if special_hp else zc)
    tabs["tetra_code"] = jnp.asarray(_kmer_codes(s, 6, L) if special_hp else zc)
    tabs["hexa_code"] = jnp.asarray(_kmer_codes(s, 8, L) if special_hp else zc)

    f32 = np.float32
    sc = f32(np.exp(-0.6))
    ok = False
    for _ in range(16):
        pout, Q = MK.mccaskill_fast(
            jnp.asarray(s), jnp.asarray(pt), jnp.asarray(allow_pair),
            jnp.asarray(allow_unpaired), jnp.int32(n), jnp.float32(sc),
            tabs, L=L,
        )
        Qv = float(Q)
        if np.isfinite(Qv) and 1e-25 < Qv < 1e25:
            pm = np.asarray(pout)
            if np.isfinite(pm).all():
                ok = True
                break
        sc = f32(sc * (0.8 if (not np.isfinite(Qv) or Qv >= 1e25) else 1.25))
    if not ok:
        raise FloatingPointError(f"mccaskill_fast did not stabilize (L={n})")
    pm = np.asarray(pout)[1 : n + 1, 1 : n + 1].astype(np.float32)
    pm[pm <= th] = 0.0
    np.clip(pm, 0.0, 1.0, out=pm)
    return pm
