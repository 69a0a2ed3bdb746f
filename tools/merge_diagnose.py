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

FASTA = "/root/reference/examples/RF00005:0.fa"


def load_golden_rows():
    lines = open("/root/reference/README.md").read().splitlines()
    block = [l[1:] for l in lines if l.startswith("\t")]
    start = next(i for i, l in enumerate(block) if l.startswith("% dafs"))
    block = block[start:]
    rows = {}
    i = 4
    while i + 1 < len(block) and block[i].startswith("> "):
        rows[block[i][2:]] = block[i + 1]
        i += 2
    return rows


def restrict(rows_by_id, ids):
    """Golden alignment restricted to ids, all-gap columns stripped.
    Returns {seq_id: bool mask}."""
    sub = {i: np.array([c != "-" for c in rows_by_id[i]]) for i in ids}
    keep = np.zeros(len(next(iter(sub.values()))), dtype=bool)
    for m in sub.values():
        keep |= m
    return {i: m[keep] for i, m in sub.items()}


def setup_engine():
    """Build the pipeline engine through the PCT stage (bit-exact tree)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dafs_tpu_jax_cache")
    from dafs_tpu import consistency, fasta, guide_tree, pipeline
    from dafs_tpu.models import align_models, fold_models
    from dafs_tpu.typedefs import CUTOFF

    fa = fasta.load_fasta(FASTA)
    golden = load_golden_rows()
    name2id = {f.name: i for i, f in enumerate(fa)}
    rows_by_id = {name2id[n]: r for n, r in golden.items()}

    from dafs_tpu.ops import alifold as alifold_ops

    opts = pipeline.Options()
    eng = pipeline.Dafs(
        align_models.ProbCons(opts.th_a),
        fold_models.RNAfold(True, CUTOFF),
        opts,
        alifold_model=alifold_ops.Alifold(0.0, bl=True),
    )
    eng.fa = fa
    lens = [len(f) for f in fa]
    eng.bp = eng.s_model.all_seqs(fa)
    eng.mp = eng.a_model.all_pairs(fa)
    sim = consistency.similarity_matrix(eng.mp, lens)
    if opts.w_pct_s != 0.0:
        eng.bp = consistency.relax_basepairing_probability(
            eng.bp, eng.mp, sim, lens, opts.w_pct_s
        )
    if opts.w_pct_a != 0.0:
        eng.mp = consistency.relax_matching_probability(
            eng.mp, sim, lens, opts.w_pct_a
        )
    eng.tree = guide_tree.build_tree(sim)

    # post-order walk: leaf ids under each node
    tree = eng.tree
    leaves = {}

    def collect(node):
        score, (l, r) = tree[node]
        if l == -1:
            leaves[node] = [node]
            return [node]
        leaves[node] = collect(l) + collect(r)
        return leaves[node]

    collect(len(tree) - 1)
    return eng, fa, rows_by_id, leaves


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
