#!/usr/bin/env python
"""Node-15 parity microscope: where does the TerminalAU probe act?

Golden-merge node 15 (K00228 + AC009395, both single-seq groups) flips to
the reference's alignment when TerminalAU is raised from BL*'s 56 to ~100
(tools/model_sweep.py), without breaking any other merge.  tau=56 is verified
against boltzmann_param.c, so the real model must achieve the same effect
through some OTHER term.  This tool compares the merge's p_x/p_y inputs
(avg_bp = 0.5*PCT-bp + 0.5*single-seq alifold) under tau=56 vs tau=100 and
prints the cells that move the most, plus the competitor pairs' components —
pointing at the loop context (exterior stem closure / hairpin / multiloop)
where the discrepancy with ViennaRNA 2.4.18 must live.

Usage: python tools/node15_microscope.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from tests.golden_rf00005 import restrict, setup_engine  # noqa: E402

NODE = 15
KEY_X = (7, 73)   # ours-only x pair (p=0.011, just above CUTOFF)
KEY_Y = (7, 63)   # ours-only y pair (p=0.56)


def merge_inputs(eng, rows_by_id, leaves):
    from dafs_tpu import projection
    from dafs_tpu.pipeline import AlnRow

    _s, (l, r) = eng.tree[NODE]
    ids1, ids2 = leaves[l], leaves[r]
    g1 = restrict(rows_by_id, ids1)
    g2 = restrict(rows_by_id, ids2)
    aln1 = [AlnRow(i, g1[i]) for i in ids1]
    aln2 = [AlnRow(i, g2[i]) for i in ids2]
    p_x = eng._avg_bp(aln1, eng.o.use_alifold)
    p_y = eng._avg_bp(aln2, eng.o.use_alifold)
    return ids1, ids2, p_x, p_y


def main() -> None:
    from dafs_tpu.ops import energy_params as ep

    results = {}
    for tau in (56, 100):
        ep.set_param_overrides({} if tau == 56 else {"terminal_au": tau})
        eng, fa, rows_by_id, leaves = setup_engine()
        ids1, ids2, p_x, p_y = merge_inputs(eng, rows_by_id, leaves)
        results[tau] = (p_x, p_y)
        print(f"tau={tau}: x{KEY_X}={p_x[KEY_X]:.4f}  y{KEY_Y}={p_y[KEY_Y]:.4f}")
    ep.set_param_overrides({})

    for name, idx in (("x", 0), ("y", 1)):
        a, b = results[56][idx], results[100][idx]
        d = b - a
        flat = np.argsort(np.abs(d).ravel())[::-1][:12]
        sid = (ids1 if name == "x" else ids2)[0]
        seq = eng.fa[sid].seq
        print(f"\n{name} (seq {sid} = {eng.fa[sid].name}): top moved cells")
        for f in flat:
            i, j = np.unravel_index(f, d.shape)
            if abs(d[i, j]) < 1e-3:
                break
            ctx5 = seq[max(0, i - 1): i + 2]
            ctx3 = seq[max(0, j - 1): j + 2]
            print(f"  ({i:3d},{j:3d}) {seq[i]}-{seq[j]} [{ctx5}|{ctx3}] "
                  f"{a[i, j]:.4f} -> {b[i, j]:.4f}  (d={d[i, j]:+.4f})")


if __name__ == "__main__":
    main()
