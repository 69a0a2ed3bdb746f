#!/usr/bin/env python
"""Attribute each deviating node's golden-gap to an input component.

avg_bp feeding every merge is (sum of per-seq PCT'd posteriors projected to
group coords + alifold consensus) / (n_seq + 1) (src/dafs.cpp:561-607).  The
round-3 energy ledger (tools/energy_ledger.py) shows the deviating registers
draw weight from all three ingredients, so this tool replays the exact-ILP
golden comparison (merge_diagnose.deep_dive semantics) for nodes 12/15/17
under ablations:

  full        : production inputs
  noali       : alifold consensus term removed from avg_bp
  nopct       : per-seq BP PCT skipped (raw McCaskill posteriors)
  noali+nopct : both

For each variant it reports the score gap (our free ILP optimum minus the
golden-z-pinned optimum, under OUR probabilities) and whether the free
solution's alignment now matches the golden one.  A variant whose gap
collapses to ~0 (or flips to matching) localizes the model deviation to the
removed component.

Usage: python tools/gap_attrib.py [node ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tests.golden_rf00005 import restrict, setup_engine  # noqa: E402


def gap_for(eng, rows_by_id, leaves, node, use_alifold):
    from dafs_tpu import dd, projection
    from dafs_tpu.pipeline import AlnRow

    _score, (l, r) = eng.tree[node]
    ids1, ids2 = leaves[l], leaves[r]
    g1 = restrict(rows_by_id, ids1)
    g2 = restrict(rows_by_id, ids2)
    aln1 = [AlnRow(i, g1[i]) for i in ids1]
    aln2 = [AlnRow(i, g2[i]) for i in ids2]
    p_x = eng._avg_bp(aln1, use_alifold)
    p_y = eng._avg_bp(aln2, use_alifold)
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
    s_f, x_f, y_f, z_f = dd.solve_by_ip(p_x, p_y, p_z, len(ids1), len(ids2), **kw)
    s_g, *_ = dd.solve_by_ip(
        p_x, p_y, p_z, len(ids1), len(ids2), fix_z=zg, **kw
    )
    zf = {(i, int(k)) for i, k in enumerate(z_f) if int(k) >= 0}
    return s_f - s_g, zf == zg


def main() -> None:
    nodes = [int(a) for a in sys.argv[1:]] or [12, 15, 17]
    eng, fa, rows_by_id, leaves = setup_engine()
    bp_pct = eng.bp
    bp_raw = eng.s_model.all_seqs(fa)

    print(f"{'node':>5} {'variant':<14}{'gap':>10}  z==golden")
    for node in nodes:
        for variant in ("full", "noali", "nopct", "noali+nopct"):
            eng.bp = bp_raw if "nopct" in variant else bp_pct
            use_ali = "noali" not in variant
            gap, match = gap_for(eng, rows_by_id, leaves, node, use_ali)
            print(f"{node:>5} {variant:<14}{gap:>10.4f}  {match}")
    eng.bp = bp_pct


if __name__ == "__main__":
    main()
