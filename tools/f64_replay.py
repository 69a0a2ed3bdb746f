#!/usr/bin/env python
"""Round-4 parity experiment (a): float64 replay of RF00005 nodes 12/15/17.

The round-3 gap attribution localized the residual golden deviation to the
raw per-sequence McCaskill posteriors (tools/gap_attrib.py; STATUS.md).  Two
explanations remain: (1) f32 accumulation in our partition function vs
Vienna's double, or (2) a semantic difference in the recursion/tables.  This
tool falsifies (1) directly: it recomputes every per-sequence posterior with
the full recursion in float64 (ops/mccaskill.bp_posterior dtype=float64
under jax_enable_x64), reruns the BP-PCT stage on those, and replays the
three deviating merges with golden-restricted inputs exactly like
tests/test_golden_merges.py.

If any node flips to matching, f32 precision was load-bearing and the f32
story reopens.  If none flips, precision is excluded and the deviation is
semantic — reachable only with ViennaRNA ground truth (--fold-aux / -P).

Usage: python tools/f64_replay.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tests.golden_rf00005 import restrict, setup_engine  # noqa: E402

NODES = [12, 15, 17]


def main():
    from dafs_tpu import consistency
    from dafs_tpu.ops import mccaskill
    from dafs_tpu.pipeline import AlnRow
    from dafs_tpu.typedefs import CUTOFF

    eng, fa, rows_by_id, leaves = setup_engine()
    lens = [len(f) for f in fa]
    L = max(lens)

    # recompute the per-seq posteriors in double precision (slow reference
    # kernel, f64 tables, f64 scan) and push them through the same BP-PCT
    print("computing f64 per-seq McCaskill posteriors...", flush=True)
    bp64 = np.zeros((len(fa), L, L), np.float32)
    bp32 = np.zeros((len(fa), L, L), np.float32)
    for i, f in enumerate(fa):
        # x64 is scoped to the f64 fold only: every production kernel
        # (pair-HMM, PCT, alifold, DD) keeps its exact f32/int32 types
        jax.config.update("jax_enable_x64", True)
        try:
            p64 = mccaskill.bp_posterior(f.seq, CUTOFF, bl=True,
                                         dtype=np.float64)
        finally:
            jax.config.update("jax_enable_x64", False)
        p32 = mccaskill.bp_posterior(f.seq, CUTOFF, bl=True, dtype=np.float32)
        bp64[i, : lens[i], : lens[i]] = p64
        bp32[i, : lens[i], : lens[i]] = p32
        d = np.abs(p64.astype(np.float64) - p32.astype(np.float64))
        print(
            f"  {f.name}: max|p64-p32| = {d.max():.3e} "
            f"at {np.unravel_index(d.argmax(), d.shape)}",
            flush=True,
        )

    prod = eng.bp  # production (f32 kernel) PCT'd posteriors

    # PCT on the f64-derived posteriors: the PCT itself stays production f32
    # (round 3 ablated it away without closing the gap; the question here is
    # the per-seq ensemble).  eng.mp was already PCT'd in setup_engine, so
    # rebuild the pre-PCT mp/sim stages cleanly.
    from dafs_tpu.models import align_models
    from dafs_tpu.pipeline import Options

    opts = Options()
    a_model = align_models.ProbCons(opts.th_a)
    mp = a_model.all_pairs(fa)
    sim = consistency.similarity_matrix(mp, lens)
    bp_pct64 = consistency.relax_basepairing_probability(
        bp64, mp, sim, lens, opts.w_pct_s
    )
    results = {}
    for node in NODES:
        eng.bp = bp_pct64
        _score, (l, r) = eng.tree[node]
        ids1, ids2 = leaves[l], leaves[r]
        g1 = restrict(rows_by_id, ids1)
        g2 = restrict(rows_by_id, ids2)
        aln1 = [AlnRow(i, g1[i]) for i in ids1]
        aln2 = [AlnRow(i, g2[i]) for i in ids2]
        _s, _ss, aln = eng._align_alignments(aln1, aln2)
        gm = restrict(rows_by_id, ids1 + ids2)
        ours = {row.seq_id: row.mask for row in aln}
        match = all(
            len(ours[i]) == len(gm[i]) and (ours[i] == gm[i]).all() for i in gm
        )
        results[node] = match
        print(f"node {node}: f64 replay {'MATCHES GOLDEN (FLIP!)' if match else 'still deviates'}",
              flush=True)

    eng.bp = prod
    flips = [n for n, m in results.items() if m]
    if flips:
        print(f"\nRESULT: nodes {flips} FLIPPED under f64 — f32 precision "
              "was load-bearing; reopen the precision investigation.")
    else:
        print("\nRESULT: no node flips under float64 — f32 accumulation is "
              "excluded as the cause; the residual deviation is semantic "
              "(needs ViennaRNA ground truth via --fold-aux or -P).")
    return results


if __name__ == "__main__":
    main()
