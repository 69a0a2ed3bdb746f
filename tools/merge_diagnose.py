#!/usr/bin/env python
"""Localize the output deviation to specific progressive merges.

Progressive merging never reorders columns within a group: project_alignment
(reference src/dafs.cpp:766-825) only inserts gap columns.  Hence the golden
final alignment restricted to the sequences under any guide-tree node (with
all-gap columns stripped) IS the reference's intermediate alignment at that
node.  This tool replays every merge of the (bit-exact) guide tree with
golden-restricted INPUTS, so each merge is tested in isolation, and reports
which merges reproduce the reference's output and which deviate.

Usage: python tools/merge_diagnose.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.golden_rf00005 import FASTA, load_golden_rows, restrict, setup_engine  # noqa: E402


def deep_dive(node: int) -> None:
    """Exact-ILP analysis of one merge: our optimum vs the golden solution
    scored under OUR probabilities (z pinned to the golden matching)."""
    from dafs_tpu import dd, projection
    from dafs_tpu.pipeline import AlnRow

    eng, fa, rows_by_id, leaves = setup_engine()
    score, (l, r) = eng.tree[node]
    ids1, ids2 = leaves[l], leaves[r]
    g1 = restrict(rows_by_id, ids1)
    g2 = restrict(rows_by_id, ids2)
    aln1 = [AlnRow(i, g1[i]) for i in ids1]
    aln2 = [AlnRow(i, g2[i]) for i in ids2]
    p_x = eng._avg_bp(aln1, eng.o.use_alifold)
    p_y = eng._avg_bp(aln2, eng.o.use_alifold)
    p_z = projection.average_matching_probability(eng.mp, aln1, aln2)

    # golden z: merged restriction maps each merged column to (col1, col2)
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
    s_free, x_f, y_f, z_f = dd.solve_by_ip(p_x, p_y, p_z, len(ids1), len(ids2), **kw)
    s_gold, x_g, y_g, z_g = dd.solve_by_ip(
        p_x, p_y, p_z, len(ids1), len(ids2), fix_z=zg, **kw
    )
    print(f"node {node}: ids {ids1} + {ids2}")
    print(f"  our exact optimum: {s_free:.6f}")
    print(f"  golden-z optimum:  {s_gold:.6f}   (gap {s_free - s_gold:.6f})")
    zf = {(i, int(k)) for i, k in enumerate(z_f) if k >= 0}
    print(f"  z cells ours-only: {sorted(zf - zg)}")
    print(f"  z cells gold-only: {sorted(zg - zf)}")

    def pairs(x):
        return {(i, int(j)) for i, j in enumerate(x) if j >= 0 and int(j) > i}

    for nm, a, b, p in (("x", x_f, x_g, p_x), ("y", y_f, y_g, p_y)):
        pa, pb = pairs(a), pairs(b)
        if pa != pb:
            print(f"  {nm} pairs ours-only: "
                  f"{[(i, j, round(float(p[i, j]), 4)) for i, j in sorted(pa - pb)]}")
            print(f"  {nm} pairs gold-only: "
                  f"{[(i, j, round(float(p[i, j]), 4)) for i, j in sorted(pb - pa)]}")


def main() -> None:
    from dafs_tpu.pipeline import AlnRow

    eng, fa, rows_by_id, leaves = setup_engine()
    tree = eng.tree

    n_ok = 0
    n_bad = 0
    for node in range(len(fa), len(tree)):
        score, (l, r) = tree[node]
        ids1, ids2 = leaves[l], leaves[r]
        g1 = restrict(rows_by_id, ids1)
        g2 = restrict(rows_by_id, ids2)
        aln1 = [AlnRow(i, g1[i]) for i in ids1]
        aln2 = [AlnRow(i, g2[i]) for i in ids2]
        s, ss, aln = eng._align_alignments(aln1, aln2)
        gm = restrict(rows_by_id, ids1 + ids2)
        ours = {r.seq_id: r.mask for r in aln}
        match = all(
            len(ours[i]) == len(gm[i]) and (ours[i] == gm[i]).all() for i in gm
        )
        ncols_ours = len(aln[0].mask)
        ncols_gold = len(next(iter(gm.values())))
        tag = "OK  " if match else "DIFF"
        print(
            f"node {node:2d} merge {ids1}+{ids2}: {tag} "
            f"cols {ncols_ours} vs golden {ncols_gold} (s={s:.4f})"
        )
        if match:
            n_ok += 1
        else:
            n_bad += 1
    print(f"{n_ok} merges match, {n_bad} deviate")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        deep_dive(int(sys.argv[1]))
    else:
        main()
