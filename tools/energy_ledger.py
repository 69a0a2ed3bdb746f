#!/usr/bin/env python
"""Per-term energy ledger for the RF00005 golden-parity deviation.

Round-2 established (STATUS.md "Fold-parity investigation") that nodes
12/15/17 deviate through a register competition in per-sequence McCaskill
ensembles, and that no single-table sweep fixes all three.  This tool stops
sweeping and measures: for each deviating node it extracts the ours-only /
gold-only pair sets from the exact-ILP replay (tools/merge_diagnose.py
semantics), maps them into per-sequence coordinates, and then for each
energy-term class c computes the EXPECTED USAGE COUNT of c in the
register-A (ours) vs register-B (golden) sub-ensembles:

    E_R[count_c] = -(kT/10) * d ln Z_R / d delta_c

by central finite differences, where Z_R is the partition function
restricted to structures containing register R's distinguishing pairs
(constrained via the kernel's allow_pair/allow_unpaired gates) and delta_c
is a uniform additive shift (dcal) on every entry of table class c.

The reference weighs register B higher by ~log(2); first-order, a shift
delta_c on class c moves ln(Z_B/Z_A) by -(10 delta_c / kT) * dcount_c, so

    delta_c needed = -ln(2) * (kT/10) / dcount_c,   dcount_c = E_B - E_A.

Classes with |dcount| >= ~0.5 are the candidate homes of the discrepancy;
their sign says whether the fix stabilizes B or destabilizes A.  Cross-node
consistency then narrows to the term whose Vienna-2.4.18 convention must be
re-audited.

Usage: python tools/energy_ledger.py [node ...]   (default: 12 15 17)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tests.golden_rf00005 import restrict, setup_engine  # noqa: E402

DELTA = 2.0  # dcal finite-difference step

# table classes probed with a uniform additive shift (arrays + scalars)
ARRAY_CLASSES = [
    "stack", "hairpin", "bulge", "internal",
    "mismatchH", "mismatchI", "mismatch1nI", "mismatch23I",
    "mismatchExt", "mismatchM", "dangle5", "dangle3",
    "int11", "int21", "int22",
]
SCALAR_CLASSES = ["ml_base", "ml_closing", "ml_intern", "terminal_au", "ninio"]
DICT_CLASSES = ["tetraloops", "triloops", "hexaloops"]


def _shift_overrides(cls: str, delta: float) -> dict:
    from dafs_tpu.ops import energy_params as ep

    base = ep.params(True)
    v = base[cls]
    if cls in DICT_CLASSES:
        return {cls: {k: e + delta for k, e in v.items()}}
    if np.isscalar(v) or isinstance(v, (int, float)):
        return {cls: v + delta}
    a = np.asarray(v).astype(np.float64)
    out = a + delta
    out[a >= ep.INF] = ep.INF  # keep forbidden entries forbidden
    return {cls: out}


class SeqPF:
    """Single-sequence partition function with register constraints, at a
    FIXED rescale factor so ln Q differences equal ln Z differences."""

    def __init__(self, seq: str):
        from dafs_tpu.ops import mccaskill as MC

        self.MC = MC
        self.seq = seq
        self.n = len(seq)
        self.L = MC._round_up(self.n, 32)
        self.sc = np.float32(np.exp(-0.6))
        self._jit = None

    def _kernel(self):
        if self._jit is None:
            from dafs_tpu.ops import mccaskill_kernel as MK

            L = self.L

            def call(S, pt, ap, au, tri, tet, hexa, n, sc, base):
                tabs = dict(base)
                tabs["tri_code"] = tri
                tabs["tetra_code"] = tet
                tabs["hexa_code"] = hexa
                return MK.mccaskill_fast(S, pt, ap, au, n, sc, tabs, L=L)

            self._jit = jax.jit(call)
        return self._jit

    def run(self, force_pairs=()):
        """(ln Q, posterior matrix).  force_pairs: 1-based (a,b) pairs that
        must be PRESENT (a/b may pair only with each other and may not be
        unpaired)."""
        MC = self.MC
        s, pt, ap, au = MC._prepare(self.seq, self.L, None)
        ap = ap.copy()
        au = au.copy()
        for (a, b) in force_pairs:
            if not ap[a, b]:
                raise ValueError(f"pair {(a, b)} not allowed for this seq")
            keep = ap[a, b]
            ap[a, :] = False
            ap[:, a] = False
            ap[b, :] = False
            ap[:, b] = False
            ap[a, b] = keep
            au[a] = False
            au[b] = False
        import jax.numpy as jnp

        base = MC._fast_tabs(True)
        tri = MC._kmer_codes(s, 5, self.L)
        tet = MC._kmer_codes(s, 6, self.L)
        hexa = MC._kmer_codes(s, 8, self.L)
        pout, Q = self._kernel()(
            jnp.asarray(s), jnp.asarray(pt), jnp.asarray(ap), jnp.asarray(au),
            jnp.asarray(tri), jnp.asarray(tet), jnp.asarray(hexa),
            jnp.int32(self.n), jnp.float32(self.sc), base,
        )
        Qv = float(Q)
        if not (np.isfinite(Qv) and Qv > 0):
            raise FloatingPointError(f"Q={Qv} (constrained ensemble empty?)")
        return np.log(Qv), np.asarray(pout)[1 : self.n + 1, 1 : self.n + 1]


def expected_counts(pf: SeqPF, force_pairs, classes=None):
    """{class: E[count]} in the (constrained) ensemble."""
    from dafs_tpu.ops import energy_params as ep

    kT = (ep.TEMP37 + ep.K0) * ep.GASCONST / 10.0  # dcal units
    out = {}
    for cls in classes or (ARRAY_CLASSES + SCALAR_CLASSES + DICT_CLASSES):
        lnZ = {}
        for sgn in (+1, -1):
            ep.set_param_overrides(_shift_overrides(cls, sgn * DELTA))
            lnZ[sgn], _ = pf.run(force_pairs)
        out[cls] = -kT * (lnZ[+1] - lnZ[-1]) / (2 * DELTA)
    ep.set_param_overrides({})
    return out


def node_registers(eng, rows_by_id, leaves, node):
    """{seq_id: (pairs_ours_only, pairs_gold_only)} in 1-based seq coords,
    from the exact-ILP merge replay with golden-restricted inputs."""
    from dafs_tpu import dd, projection
    from dafs_tpu.pipeline import AlnRow

    _score, (l, r) = eng.tree[node]
    ids1, ids2 = leaves[l], leaves[r]
    g1 = restrict(rows_by_id, ids1)
    g2 = restrict(rows_by_id, ids2)
    aln1 = [AlnRow(i, g1[i]) for i in ids1]
    aln2 = [AlnRow(i, g2[i]) for i in ids2]
    p_x = eng._avg_bp(aln1, eng.o.use_alifold)
    p_y = eng._avg_bp(aln2, eng.o.use_alifold)
    p_z = projection.average_matching_probability(eng.mp, aln1, aln2)

    gm = restrict(rows_by_id, ids1 + ids2)
    m1 = np.stack([gm[i] for i in ids1]).any(axis=0)
    m2 = np.stack([gm[i] for i in ids2]).any(axis=0)
    zg = set()
    c1 = c2 = 0
    for a, b in zip(m1, m2):
        if a and b:
            zg.add((c1, c2))
        c1 += int(a)
        c2 += int(b)

    kw = dict(w=eng.o.w, th_s=list(eng.o.th_s), th_a=eng.o.th_a)
    _sf, x_f, y_f, _zf = dd.solve_by_ip(p_x, p_y, p_z, len(ids1), len(ids2), **kw)
    _sg, x_g, y_g, _zg2 = dd.solve_by_ip(
        p_x, p_y, p_z, len(ids1), len(ids2), fix_z=zg, **kw
    )

    def pairs(x):
        return {(i, int(j)) for i, j in enumerate(x) if int(j) > i}

    regs = {}
    for rows, ids, xa, xb in ((aln1, ids1, x_f, x_g), (aln2, ids2, y_f, y_g)):
        pa, pb = pairs(xa), pairs(xb)
        if pa == pb:
            continue
        for row in rows:
            # merged col -> 1-based seq position (or None at a gap)
            pos = np.where(row.mask, np.cumsum(row.mask), 0)
            mapped = lambda ps: {
                (int(pos[i]), int(pos[j]))
                for (i, j) in ps
                if row.mask[i] and row.mask[j]
            }
            ours, gold = mapped(pa - pb), mapped(pb - pa)
            if ours or gold:
                regs[row.seq_id] = (sorted(ours), sorted(gold))
    return regs


def pct_donor_decomposition(eng, bp_raw, mp_raw, sim, x, i, j, top=6):
    """Decompose the bp-PCT value p'_x(i, j) (0-based) into donor-(y, k, l)
    contributions (src/dafs.cpp:326-375 formula).  Returns (total, rows)
    with rows = [(contrib, y, k, l, bp_y[k,l])]."""
    N = len(eng.fa)
    f = np.float32
    w_pct_s = eng.o.w_pct_s
    scale = np.full(N, f(w_pct_s) / f(N - 1), np.float32)
    scale[x] = f(1.0 - w_pct_s)
    w = np.float32(sim[:, x]) * scale
    sum_w = np.float32(np.sum(w, dtype=np.float32))
    rows = []
    total = 0.0
    for y in range(N):
        if w[y] == 0.0:
            continue
        M = mp_raw[y, x]          # (Ly, Lx) match posterior
        B = bp_raw[y]             # (Ly, Ly)
        contrib_kl = (
            M[:, i][:, None] * B * M[:, j][None, :]
        ) * (w[y] / sum_w)
        total += float(contrib_kl.sum())
        for k, l in zip(*np.nonzero(contrib_kl > 1e-5)):
            rows.append((float(contrib_kl[k, l]), y, int(k), int(l),
                         float(B[k, l])))
    rows.sort(reverse=True)
    return total, rows[:top]


def ledger_for_pair(seq, pair_1b, kT, label=""):
    """Per-term leverage on ln p(pair) in this sequence's own ensemble."""
    pf = SeqPF(seq)
    lnZ_free, post = pf.run()
    a, b = pair_1b
    print(f"    {label}: p({a},{b}) = {post[a - 1, b - 1]:.5f}")
    cF = expected_counts(pf, [])
    lnZ_A, _ = pf.run([pair_1b])
    cA = expected_counts(pf, [pair_1b])
    print(f"    ln p = {lnZ_A - lnZ_free:+.4f}; class leverage "
          f"(dcount = E[pair] - E[free]; delta_c to halve p):")
    rows = []
    for cls in cA:
        d = cA[cls] - cF[cls]
        need = np.log(2.0) * kT / d if abs(d) > 1e-3 else np.inf
        rows.append((abs(d), cls, cA[cls], cF[cls], d, need))
    for _a, cls, av, fv, d, need in sorted(rows, reverse=True)[:10]:
        mark = " <<<" if abs(d) >= 0.5 else ""
        print(f"      {cls:<14}{av:>10.3f}{fv:>10.3f}{d:>9.3f}"
              f"{need:>12.1f}{mark}")
    return post[a - 1, b - 1]


def main() -> None:
    nodes = [int(a) for a in sys.argv[1:]] or [12, 15, 17]
    from dafs_tpu.ops import energy_params as ep

    kT = (ep.TEMP37 + ep.K0) * ep.GASCONST / 10.0
    eng, fa, rows_by_id, leaves = setup_engine()
    # raw (pre-PCT) posteriors for the donor decomposition
    from dafs_tpu import consistency as _cons

    bp_raw = eng.s_model.all_seqs(fa)
    mp_raw = eng.a_model.all_pairs(fa)
    lens = [len(f_) for f_ in fa]
    sim = _cons.similarity_matrix(mp_raw, lens)

    for node in nodes:
        print(f"\n=== node {node} ===")
        regs = node_registers(eng, rows_by_id, leaves, node)
        for sid, (ours, gold) in regs.items():
            name = eng.fa[sid].name
            seq = eng.fa[sid].seq
            print(f"\nseq {sid} ({name}), L={len(seq)}")
            print(f"  register A (ours-only pairs, 1-based): {ours}")
            print(f"  register B (gold-only pairs, 1-based): {gold}")
            if not ours and not gold:
                continue
            for direction, prs in (("ours-only (must DROP)", ours),
                                   ("gold-only (must RISE)", gold)):
                for (a, b) in prs:
                    i, j = a - 1, b - 1
                    tp = int(ep.BP_PAIR[
                        ep.encode_rna(seq)[i], ep.encode_rna(seq)[j]
                    ])
                    print(f"\n  pair ({a},{b}) 1-based [{direction}], "
                          f"{seq[i]}-{seq[j]} type {tp}")
                    if tp > 0:
                        ledger_for_pair(seq, (a, b), kT, label="own ensemble")
                    else:
                        print("    non-canonical in this seq: probability is "
                              "PCT-borrowed; donor decomposition:")
                    total, donors = pct_donor_decomposition(
                        eng, bp_raw, mp_raw, sim, sid, i, j
                    )
                    print(f"    PCT p'({a},{b}) = {total:.5f}; top donors:")
                    seen = set()
                    for contrib, y, k, l, byp in donors:
                        print(f"      y={y} ({eng.fa[y].name}) "
                              f"(k,l)=({k},{l}) 0-based  bp_y={byp:.4f}  "
                              f"contrib={contrib:.5f}")
                    for contrib, y, k, l, byp in donors[:3]:
                        if (y, k, l) in seen or contrib < 0.1 * max(
                            d[0] for d in donors
                        ):
                            continue
                        seen.add((y, k, l))
                        ledger_for_pair(
                            eng.fa[y].seq, (k + 1, l + 1), kT,
                            label=f"donor y={y} pair ({k + 1},{l + 1})",
                        )


if __name__ == "__main__":
    main()
