"""CONTRAfold v2 inside-outside on TPU (contrafold/InferenceEngine.ipp).

TPU-native reformulation of ComputeInside (:3356-3722), ComputeOutside
(:3731-4490) and ComputePosterior (:4498+) for the DAFS configuration
(helix-length/isolated-bp features off, max_bp_dist=0, complementary pairs
only): diagonal-wavefront scans over dense (L+2)^2 log-domain matrices
FC/FM/FM1, a bounded 31x31 stencil for single-branch loops, masked dot
products for the FM2 multiloop split, and an outside pass that maintains the
O(L^3) FM2-adjoint terms via two running accumulators instead of the
reference's rolling pointers.

The pair posterior is exp(FCi + FCo - Z) at the pair's FC cell — every pair
production routes through FC, with the pair's own scores applied by the
producing context, so this equals the reference's per-production sum.

Deviation: reductions use exact log-sum-exp rather than the reference's
piecewise-cubic Fast_LogPlusEquals (differences ~1e-5 in log space).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.ops import contrafold_params as CF

from dafs_tpu.utils import aot

NEG = jnp.float32(-2e20)
MAXS = 30  # C_MAX_SINGLE_LENGTH


def _round_up(n, m):
    return -(-n // m) * m


def _lse(a, b):
    """logaddexp guarded for NEG sentinels."""
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    safe = lo > jnp.float32(-1e19)
    return jnp.where(safe, hi + jnp.log1p(jnp.exp(lo - hi)), hi)


def _lse_reduce(x, axis):
    hi = jnp.max(x, axis=axis, keepdims=True)
    hi_safe = jnp.maximum(hi, jnp.float32(-1e19))
    out = jnp.squeeze(hi, axis) + jnp.log(
        jnp.sum(jnp.exp(x - hi_safe), axis=axis)
    )
    return jnp.where(jnp.squeeze(hi, axis) > jnp.float32(-1e19), out, NEG)


@aot.persistent_jit(static_argnames=("L",))
def _contrafold_inside_outside(
    S, allow_pair, allow_unpaired_pos, n,
    t_bp, t_tm, t_hs, t_hc, t_dl, t_dr, t_b0x1, t_i1x1,
    t_hairpin_len, t_single,
    mb, mp_, mu, ep_, eu,
    *, L,
):
    """S: (L+2,) codes 1-based (index 0 and >n are 4); allow_pair (L+2, L+2);
    allow_unpaired_pos (L+2,). Returns (posterior (L+2, L+2), Z)."""
    f = jnp.float32
    idx = jnp.arange(L + 2)

    # segment-unpaired gates: blocked count in [a, b]
    logv = jnp.where((idx >= 1) & (idx <= n) & allow_unpaired_pos, 1.0, 0.0)
    blocked = jnp.cumsum(jnp.where(idx >= 1, 1.0 - logv, 0.0))
    seg_len = idx[None, :] - idx[:, None] + 1
    seg_blocked = blocked[None, :] - blocked[jnp.maximum(idx[:, None] - 1, 0)]
    seg_ok = (seg_len <= 0) | (seg_blocked == 0)  # [a..b] all unpaired-allowed

    Sc = S
    ii_all = jnp.arange(L + 2)

    def JB(i, j):
        # hc[s_i][s_{j+1}] + tm[s_i][s_{j+1}][s_{i+1}][s_j]
        si = Sc[jnp.clip(i, 0, L + 1)]
        sj1 = Sc[jnp.clip(j + 1, 0, L + 1)]
        si1 = Sc[jnp.clip(i + 1, 0, L + 1)]
        sj = Sc[jnp.clip(j, 0, L + 1)]
        return t_hc[si, sj1] + t_tm[si, sj1, si1, sj]

    def JA(i, j):
        si = Sc[jnp.clip(i, 0, L + 1)]
        sj1 = Sc[jnp.clip(j + 1, 0, L + 1)]
        si1 = Sc[jnp.clip(i + 1, 0, L + 1)]
        sj = Sc[jnp.clip(j, 0, L + 1)]
        v = t_hc[si, sj1]
        v = v + jnp.where(i < n, t_dl[si, sj1, si1], 0.0)
        v = v + jnp.where(j > 0, t_dr[si, sj1, sj], 0.0)
        return v

    def BP(a, b):
        return t_bp[Sc[jnp.clip(a, 0, L + 1)], Sc[jnp.clip(b, 0, L + 1)]]

    uu = jnp.arange(MAXS + 1)

    # ---------------- inside ------------------------------------------------
    def inside_step(carry, d):
        FC, FM, FM1 = carry
        i_vec = ii_all
        j_vec = i_vec + d
        jc = jnp.clip(j_vec, 0, L + 1)
        # FC cell (i,j) represents pair (i, j+1)
        fc_ok = (i_vec >= 1) & (j_vec <= n - 1) & allow_pair[i_vec, jnp.clip(j_vec + 1, 0, L + 1)]

        # FM2
        kk = ii_all[None, :]
        fm1_l = FM1[i_vec[:, None], jnp.clip(kk, 0, L + 1)]
        fm_r = FM[kk, jc[:, None]]
        kmask = (kk > i_vec[:, None]) & (kk < j_vec[:, None])
        FM2 = _lse_reduce(jnp.where(kmask, fm1_l + fm_r, NEG), axis=1)

        # hairpin
        hp = jnp.where(
            seg_ok[jnp.clip(i_vec + 1, 0, L + 1), jc],
            JB(i_vec, j_vec) + t_hairpin_len[jnp.minimum(d, MAXS)],
            NEG,
        )

        # single-branch loops incl. stacking: (p, q) = (i + l1, j - l2)
        i_ = i_vec[:, None, None]
        j_ = j_vec[:, None, None]
        l1 = uu[None, :, None]
        l2 = uu[None, None, :]
        p = i_ + l1
        q = j_ - l2
        ok = (l1 + l2 <= MAXS) & (p + 2 <= q)
        pc = jnp.clip(p, 0, L + 1)
        qc = jnp.clip(q, 0, L + 1)
        ok &= allow_pair[jnp.clip(p + 1, 0, L + 1), qc]
        ok &= seg_ok[jnp.clip(i_ + 1, 0, L + 1), pc]
        ok &= seg_ok[jnp.clip(q + 1, 0, L + 1), jnp.clip(j_, 0, L + 1)]
        fc_in = FC[jnp.clip(p + 1, 0, L + 1), jnp.clip(q - 1, 0, L + 1)]

        si = Sc[jnp.clip(i_, 0, L + 1)]
        sj1 = Sc[jnp.clip(j_ + 1, 0, L + 1)]
        si1 = Sc[jnp.clip(i_ + 1, 0, L + 1)]
        sj = Sc[jnp.clip(j_, 0, L + 1)]
        sp1 = Sc[jnp.clip(p + 1, 0, L + 1)]
        sq = Sc[qc]
        sq1 = Sc[jnp.clip(q + 1, 0, L + 1)]
        sp = Sc[pc]
        stack_sc = t_bp[si1, sj] + t_hs[si, sj1, si1, sj]
        jb_out = t_hc[si, sj1] + t_tm[si, sj1, si1, sj]
        jb_in = t_hc[sq, sp1] + t_tm[sq, sp1, sq1, sp]
        nts = (
            jnp.where((l1 == 0) & (l2 == 1), t_b0x1[sj], 0.0)
            + jnp.where((l1 == 1) & (l2 == 0), t_b0x1[si1], 0.0)
            + jnp.where((l1 == 1) & (l2 == 1), t_i1x1[si1, sj], 0.0)
        )
        gen_sc = t_single[l1, l2] + t_bp[sp1, sq] + jb_out + jb_in + nts
        sc = jnp.where((l1 == 0) & (l2 == 0), stack_sc, gen_sc)
        single_terms = jnp.where(ok, fc_in + sc, NEG)
        single_sum = _lse_reduce(
            single_terms.reshape(single_terms.shape[0], -1), axis=1
        )

        multi = FM2 + JA(i_vec, j_vec) + mp_ + mb

        fc_new = _lse(_lse(hp, single_sum), multi)
        fc_new = jnp.where(fc_ok, fc_new, NEG)
        FC = FC.at[i_vec, j_vec].set(fc_new, mode="drop")

        # FM1(i,j): pair (i+1, j)
        fm1_ok = (i_vec >= 1) & (i_vec + 2 <= j_vec) & (j_vec <= n - 1)
        stem = jnp.where(
            allow_pair[jnp.clip(i_vec + 1, 0, L + 1), jc],
            FC[jnp.clip(i_vec + 1, 0, L + 1), jnp.clip(j_vec - 1, 0, L + 1)]
            + JA(j_vec, i_vec) + mp_ + BP(i_vec + 1, j_vec),
            NEG,
        )
        shift = jnp.where(
            allow_unpaired_pos[jnp.clip(i_vec + 1, 0, L + 1)],
            FM1[jnp.clip(i_vec + 1, 0, L + 1), jc] + mu,
            NEG,
        )
        fm1_new = jnp.where(fm1_ok, _lse(stem, shift), NEG)
        FM1 = FM1.at[i_vec, j_vec].set(fm1_new, mode="drop")

        # FM(i,j)
        fm_new = FM2
        fm_new = _lse(
            fm_new,
            jnp.where(
                allow_unpaired_pos[jc],
                FM[i_vec, jnp.clip(j_vec - 1, 0, L + 1)] + mu,
                NEG,
            ),
        )
        fm_new = _lse(fm_new, fm1_new)
        fm_new = jnp.where(fm1_ok, fm_new, NEG)
        FM = FM.at[i_vec, j_vec].set(fm_new, mode="drop")

        return (FC, FM, FM1), None

    Zm = jnp.full((L + 2, L + 2), NEG)
    (FC, FM, FM1), _ = jax.lax.scan(inside_step, (Zm, Zm, Zm), jnp.arange(0, L))

    # ---------------- F5 ----------------------------------------------------
    def f5_step(carry, j):
        F5 = carry
        jc2 = jnp.clip(j, 0, L + 1)
        unp = jnp.where(
            allow_unpaired_pos[jc2], F5[jnp.clip(j - 1, 0, L + 1)] + eu, NEG
        )
        kk2 = ii_all
        terms = jnp.where(
            (kk2 < j) & (kk2 >= 0) & allow_pair[jnp.clip(kk2 + 1, 0, L + 1), jc2],
            F5[jnp.clip(kk2, 0, L + 1)]
            + FC[jnp.clip(kk2 + 1, 0, L + 1), jnp.clip(j - 1, 0, L + 1)]
            + ep_ + BP(kk2 + 1, j) + JA(j, kk2),
            NEG,
        )
        val = _lse(unp, _lse_reduce(terms, axis=0))
        F5 = F5.at[j].set(jnp.where(j <= n, val, NEG), mode="drop")
        return F5, None

    F5 = jnp.full((L + 2,), NEG).at[0].set(0.0)
    F5, _ = jax.lax.scan(f5_step, F5, jnp.arange(1, L + 1))
    Z = F5[jnp.clip(n, 0, L + 1)]

    # ---------------- outside ----------------------------------------------
    def f5o_step(carry, k):
        F5o = carry
        kc = jnp.clip(k, 0, L + 1)
        unp = jnp.where(
            allow_unpaired_pos[jnp.clip(k + 1, 0, L + 1)],
            F5o[jnp.clip(k + 1, 0, L + 1)] + eu,
            NEG,
        )
        jj2 = ii_all
        terms = jnp.where(
            (jj2 > k) & (jj2 <= n) & allow_pair[jnp.clip(k + 1, 0, L + 1), jnp.clip(jj2, 0, L + 1)],
            F5o[jnp.clip(jj2, 0, L + 1)]
            + FC[jnp.clip(k + 1, 0, L + 1), jnp.clip(jj2 - 1, 0, L + 1)]
            + ep_ + BP(k + 1, jj2) + JA(jj2, k),
            NEG,
        )
        val = _lse(unp, _lse_reduce(terms, axis=0))
        # padding iterations (k >= n) must not clobber the init at k = n
        F5o = F5o.at[k].set(
            jnp.where(k < n, val, F5o[jnp.clip(k, 0, L + 1)]), mode="drop"
        )
        return F5o, None

    F5o = jnp.full((L + 2,), NEG).at[jnp.clip(n, 0, L + 1)].set(0.0)
    F5o, _ = jax.lax.scan(f5o_step, F5o, jnp.arange(L - 1, -1, -1))

    # FCo seeded by the external-stem production
    a_g = ii_all[:, None]
    b_g = ii_all[None, :]
    fco_init = jnp.where(
        (a_g >= 1) & (b_g >= a_g) & (b_g <= n - 1)
        & allow_pair[a_g, jnp.clip(b_g + 1, 0, L + 1)],
        F5o[jnp.clip(b_g + 1, 0, L + 1)]
        + F5[jnp.clip(a_g - 1, 0, L + 1)]
        + ep_
        + t_bp[Sc[a_g], Sc[jnp.clip(b_g + 1, 0, L + 1)]]
        + JA(b_g + 1, a_g - 1),
        NEG,
    )

    def outside_step(carry, d):
        FCo, FMo, FM1o, A_FM1, A_FM = carry
        i_vec = ii_all
        j_vec = i_vec + d
        jc = jnp.clip(j_vec, 0, L + 1)
        fc_ok = (i_vec >= 1) & (j_vec <= n - 1) & allow_pair[i_vec, jnp.clip(j_vec + 1, 0, L + 1)]

        # FCo: ext seed + single-loop from outer FC + FM1 production
        fco = fco_init[i_vec, jc]

        i_ = i_vec[:, None, None]
        j_ = j_vec[:, None, None]
        l1 = uu[None, :, None]
        l2 = uu[None, None, :]
        I = i_ - 1 - l1
        J = j_ + 1 + l2
        ok = (l1 + l2 <= MAXS) & (I >= 1) & (J <= n - 1)
        Ic = jnp.clip(I, 0, L + 1)
        Jc = jnp.clip(J, 0, L + 1)
        ok &= allow_pair[Ic, jnp.clip(J + 1, 0, L + 1)]
        # unpaired gates on both strands: [I+1, i-1], [j+1, J-1]
        ok &= seg_ok[jnp.clip(I + 1, 0, L + 1), jnp.clip(i_ - 1, 0, L + 1)]
        ok &= seg_ok[jnp.clip(j_ + 1, 0, L + 1), jnp.clip(J - 1, 0, L + 1)]
        fco_out = FCo[Ic, Jc]

        sI = Sc[Ic]
        sJ1 = Sc[jnp.clip(J + 1, 0, L + 1)]
        sI1 = Sc[jnp.clip(I + 1, 0, L + 1)]
        sJ = Sc[Jc]
        s_i = Sc[jnp.clip(i_, 0, L + 1)]
        s_j1 = Sc[jnp.clip(j_ + 1, 0, L + 1)]
        s_im1 = Sc[jnp.clip(i_ - 1, 0, L + 1)]
        s_j2 = Sc[jnp.clip(j_ + 2, 0, L + 1)]
        stack_sc = t_bp[s_i, s_j1] + t_hs[sI, sJ1, sI1, sJ]
        jb_out = t_hc[sI, sJ1] + t_tm[sI, sJ1, sI1, sJ]
        jb_in = t_hc[s_j1, s_i] + t_tm[s_j1, s_i, s_j2, s_im1]
        nts = (
            jnp.where((l1 == 0) & (l2 == 1), t_b0x1[sJ], 0.0)
            + jnp.where((l1 == 1) & (l2 == 0), t_b0x1[sI1], 0.0)
            + jnp.where((l1 == 1) & (l2 == 1), t_i1x1[sI1, sJ], 0.0)
        )
        gen_sc = t_single[l1, l2] + t_bp[s_i, s_j1] + jb_out + jb_in + nts
        sc2 = jnp.where((l1 == 0) & (l2 == 0), stack_sc, gen_sc)
        terms = jnp.where(ok, fco_out + sc2, NEG)
        fco = _lse(fco, _lse_reduce(terms.reshape(terms.shape[0], -1), axis=1))

        # FM1 production: FM1(i-1, j+1) -> FC(i, j)
        fm1_src = jnp.where(
            (i_vec - 1 >= 1) & allow_pair[i_vec, jnp.clip(j_vec + 1, 0, L + 1)],
            FM1o[jnp.clip(i_vec - 1, 0, L + 1), jnp.clip(j_vec + 1, 0, L + 1)]
            + JA(j_vec + 1, i_vec - 1) + mp_ + BP(i_vec, j_vec + 1),
            NEG,
        )
        fco = _lse(fco, fm1_src)
        fco = jnp.where(fc_ok, fco, NEG)
        FCo = FCo.at[i_vec, j_vec].set(fco, mode="drop")

        cell_ok = (i_vec >= 1) & (i_vec + 2 <= j_vec) & (j_vec <= n - 1)
        # FMo(i,j) = lse(A_FM[i,j], FMo(i, j+1) + mu(j+1))
        fmo = A_FM[i_vec, jc]
        fmo = _lse(
            fmo,
            jnp.where(
                allow_unpaired_pos[jnp.clip(j_vec + 1, 0, L + 1)],
                FMo[i_vec, jnp.clip(j_vec + 1, 0, L + 1)] + mu,
                NEG,
            ),
        )
        fmo = jnp.where(cell_ok, fmo, NEG)
        FMo = FMo.at[i_vec, j_vec].set(fmo, mode="drop")

        # FM1o(i,j) = lse(A_FM1[i,j], FMo(i,j), FM1o(i-1, j) + mu(i))
        fm1o = _lse(A_FM1[i_vec, jc], fmo)
        fm1o = _lse(
            fm1o,
            jnp.where(
                allow_unpaired_pos[jnp.clip(i_vec, 0, L + 1)],
                FM1o[jnp.clip(i_vec - 1, 0, L + 1), jc] + mu,
                NEG,
            ),
        )
        fm1o = jnp.where(cell_ok, fm1o, NEG)
        FM1o = FM1o.at[i_vec, j_vec].set(fm1o, mode="drop")

        # G and accumulator updates (target cells have strictly smaller span)
        G = _lse(fmo, jnp.where(fc_ok, fco + JA(i_vec, j_vec) + mp_ + mb, NEG))
        kk = ii_all[None, :]
        gmask = (kk > i_vec[:, None]) & (kk < j_vec[:, None])
        upd1 = jnp.where(gmask, G[:, None] + FM[kk, jc[:, None]], NEG)
        # A_FM1[i, k] lse= G(i,j) + FM(k, j): row i fixed per cell
        A_FM1 = _lse(A_FM1, jnp.full_like(A_FM1, NEG).at[i_vec[:, None], kk].max(
            upd1, mode="drop"
        ))
        upd2 = jnp.where(gmask, G[:, None] + FM1[i_vec[:, None], kk], NEG)
        # A_FM[k, j] lse= G(i,j) + FM1(i, k): scatter into (k, j) — for a
        # fixed diagonal each cell has distinct j, so build a dense update
        U2 = jnp.full((L + 2, L + 2), NEG)
        U2 = U2.at[kk, jc[:, None]].max(upd2, mode="drop")
        A_FM = _lse(A_FM, U2)

        return (FCo, FMo, FM1o, A_FM1, A_FM), None

    init = (Zm, Zm, Zm, Zm, Zm)
    (FCo, FMo, FM1o, _, _), _ = jax.lax.scan(
        outside_step, init, jnp.arange(L - 1, -1, -1)
    )

    # ---------------- posterior --------------------------------------------
    a_g2 = ii_all[:, None]
    b_g2 = ii_all[None, :]
    pair_ok = (a_g2 >= 1) & (b_g2 > a_g2) & (b_g2 <= n) & allow_pair[a_g2, b_g2]
    fci = FC[a_g2, jnp.clip(b_g2 - 1, 0, L + 1)]
    fcov = FCo[a_g2, jnp.clip(b_g2 - 1, 0, L + 1)]
    logp = fci + fcov - Z
    post = jnp.where(pair_ok & (logp > -60.0), jnp.exp(jnp.minimum(logp, 0.0)), 0.0)
    post = jnp.clip(post, 0.0, 1.0)
    return post, Z, FC, FCo, F5, F5o


_DEV_TABLES = None


def _dev_tables():
    """Device-resident parameter tables, uploaded once per process (the
    per-call jnp.asarray uploads cost ~0.5 s/call over the axon relay)."""
    global _DEV_TABLES
    if _DEV_TABLES is None:
        import jax.numpy as jnp

        t = CF.tables()
        _DEV_TABLES = (
            jnp.asarray(t["base_pair"]), jnp.asarray(t["terminal_mismatch"]),
            jnp.asarray(t["helix_stacking"]), jnp.asarray(t["helix_closing"]),
            jnp.asarray(t["dangle_left"]), jnp.asarray(t["dangle_right"]),
            jnp.asarray(t["bulge_0x1"]), jnp.asarray(t["internal_1x1"]),
            jnp.asarray(t["hairpin_len"]), jnp.asarray(t["single"]),
            t["multi_base"], t["multi_paired"], t["multi_unpaired"],
            t["external_paired"], t["external_unpaired"],
        )
    return _DEV_TABLES


def _prep_one(seq: str, n: int, L: int, constraint: str | None):
    """Host prep of one sequence's codes and constraint masks."""
    s = np.full(L + 2, 4, dtype=np.int32)
    s[1 : n + 1] = CF.encode(seq)

    allow_pair = CF.COMPLEMENTARY[s[:, None], s[None, :]].copy()
    ii = np.arange(L + 2)
    allow_pair &= ii[None, :] > ii[:, None]
    allow_pair &= (ii[:, None] >= 1) & (ii[None, :] <= n)
    allow_unpaired_pos = np.ones(L + 2, dtype=bool)

    if constraint is not None:
        # SetConstraint/UseConstraints: '(' ')' matched = forced pair,
        # '.' = forced unpaired, '?' = free (contrafold/SStruct mapping)
        assert len(constraint) == n
        stack = []
        for k, ch in enumerate(constraint):
            pos = k + 1
            if ch == ".":
                allow_unpaired_pos[pos] = True
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
                allow_unpaired_pos[a] = False
                allow_unpaired_pos[pos] = False
    return s, allow_pair, allow_unpaired_pos


@aot.persistent_jit(static_argnames=("L",))
def _cf_batch(sB, apB, auB, nB, *tables, L):
    """vmapped inside/outside over a bucket-padded batch of sequences —
    one device dispatch per length bucket instead of one per sequence."""
    import jax

    def one(s, ap, au, n):
        post, Z, *_ = _contrafold_inside_outside(s, ap, au, n, *tables, L=L)
        return post

    return jax.vmap(one)(sB, apB, auB, nB)


def bp_posterior(seq: str, th: float, constraint: str | None = None) -> np.ndarray:
    """(L, L) upper-triangular pair posterior, entries kept > th
    (src/fold.cpp:174-207 adapter semantics)."""
    return batch_bp_posteriors([seq], th, constraints=[constraint])[0]


def batch_bp_posteriors(seqs, th, constraints=None):
    """Batched posteriors: sequences grouped by 32-length bucket, each
    bucket one vmapped device dispatch (src/fold.cpp:174-207 adapter,
    applied per sequence)."""
    import jax.numpy as jnp

    if not seqs:
        return []
    tables = _dev_tables()
    out: list = [None] * len(seqs)
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(seqs):
        buckets.setdefault(_round_up(len(s), 32), []).append(i)
    for L, idxs in buckets.items():
        preps = [
            _prep_one(
                seqs[i], len(seqs[i]), L,
                constraints[i] if constraints is not None else None,
            )
            for i in idxs
        ]
        sB = jnp.asarray(np.stack([p[0] for p in preps]))
        apB = jnp.asarray(np.stack([p[1] for p in preps]))
        auB = jnp.asarray(np.stack([p[2] for p in preps]))
        nB = jnp.asarray(np.array([len(seqs[i]) for i in idxs], np.int32))
        posts = np.asarray(_cf_batch(sB, apB, auB, nB, *tables, L=L))
        for b, i in enumerate(idxs):
            n = len(seqs[i])
            pm = posts[b, 1 : n + 1, 1 : n + 1].astype(np.float32)
            pm[pm <= th] = 0.0
            out[i] = pm
    return out
