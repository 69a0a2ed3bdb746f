"""Shared helpers for RF00005 golden-output replay (tests + tools).

The golden output is the README "Example" of the reference
(/root/reference/README.md): the exact stdout of `dafs RF00005:0.fa`.
Progressive merging never reorders columns within a group — project_alignment
(reference src/dafs.cpp:766-825) only inserts gap columns — so the golden
final alignment restricted to the sequences under any guide-tree node (with
all-gap columns stripped) IS the reference's intermediate alignment at that
node.  This lets every merge be replayed in isolation with golden inputs.
"""

from __future__ import annotations

import numpy as np

FASTA = "/root/reference/examples/RF00005:0.fa"
README = "/root/reference/README.md"


def load_golden_rows() -> dict[str, str]:
    """Golden gapped rows keyed by sequence name, from the README example."""
    lines = open(README).read().splitlines()
    block = [l[1:] for l in lines if l.startswith("\t")]
    start = next(i for i, l in enumerate(block) if l.startswith("% dafs"))
    block = block[start:]
    rows = {}
    i = 4
    while i + 1 < len(block) and block[i].startswith("> "):
        rows[block[i][2:]] = block[i + 1]
        i += 2
    return rows


def restrict(rows_by_id: dict[int, str], ids) -> dict[int, np.ndarray]:
    """Golden alignment restricted to ids, all-gap columns stripped.
    Returns {seq_id: bool gap mask}."""
    sub = {i: np.array([c != "-" for c in rows_by_id[i]]) for i in ids}
    keep = np.zeros(len(next(iter(sub.values()))), dtype=bool)
    for m in sub.values():
        keep |= m
    return {i: m[keep] for i, m in sub.items()}


def setup_engine():
    """Build the pipeline engine through the PCT stage (bit-exact tree).

    Returns (engine, fasta records, golden rows by seq id, leaves-under-node).
    """
    import jax

    from dafs_tpu.utils.aot import setup_compile_cache; setup_compile_cache()
    from dafs_tpu import consistency, fasta, guide_tree, pipeline
    from dafs_tpu.models import align_models, fold_models
    from dafs_tpu.ops import alifold as alifold_ops
    from dafs_tpu.typedefs import CUTOFF

    fa = fasta.load_fasta(FASTA)
    golden = load_golden_rows()
    name2id = {f.name: i for i, f in enumerate(fa)}
    rows_by_id = {name2id[n]: r for n, r in golden.items()}

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

    tree = eng.tree
    leaves: dict[int, list[int]] = {}

    def collect(node):
        _score, (l, r) = tree[node]
        if l == -1:
            leaves[node] = [node]
            return [node]
        leaves[node] = collect(l) + collect(r)
        return leaves[node]

    collect(len(tree) - 1)
    return eng, fa, rows_by_id, leaves
