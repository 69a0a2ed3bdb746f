"""Mesh-sharded all-pairs workloads at family scale (BASELINE.json config 4:
"Batched all-pairs Rfam family set (50+ seqs) sharded data-parallel").

Runs on the virtual 8-device CPU mesh (tests/conftest.py).  The reference has
no counterpart: it runs the N*(N-1)/2 pair posteriors serially on one core
(SURVEY §2.5, src/align.cpp:35-52).
"""

import numpy as np
import pytest

import dafs_tpu
from dafs_tpu.models import probcons_params as PP
from dafs_tpu.ops import pairhmm
from dafs_tpu.parallel import mesh as pmesh


def _mutate(seq: str, rng, sub=0.08, indel=0.02) -> str:
    out = []
    for c in seq:
        r = rng.random()
        if r < indel / 2:
            continue  # deletion
        if r < indel:
            out.append(str(rng.choice(list("ACGU"))))  # insertion
        if rng.random() < sub:
            out.append(str(rng.choice(list("ACGU"))))
        else:
            out.append(c)
    return "".join(out)


def _family(n: int, seed: int = 7) -> list[str]:
    fa = dafs_tpu.load_fasta("/root/reference/examples/RF00005:0.fa")
    rng = np.random.default_rng(seed)
    seeds = [r.seq for r in fa]
    return [_mutate(seeds[i % len(seeds)], rng) for i in range(n)]


def _unsharded_pair_posteriors(seqs1, seqs2, th):
    import jax.numpy as jnp

    def rup(n, m):
        return -(-n // m) * m

    B = len(seqs1)
    l1max = rup(max(map(len, seqs1)), 32)
    l2max = rup(max(map(len, seqs2)), 32)
    codes1 = np.zeros((B, l1max + 1), np.int32)
    codes2 = np.zeros((B, l2max + 1), np.int32)
    len1 = np.array([len(s) for s in seqs1], np.int32)
    len2 = np.array([len(s) for s in seqs2], np.int32)
    for b, s in enumerate(seqs1):
        codes1[b, 1 : len(s) + 1] = PP.encode(s)
    for b, s in enumerate(seqs2):
        codes2[b, 1 : len(s) + 1] = PP.encode(s)
    post = np.asarray(
        pairhmm.forward_backward_posterior(
            jnp.asarray(codes1), jnp.asarray(len1),
            jnp.asarray(codes2), jnp.asarray(len2),
            l1max=l1max, l2max=l2max,
        )
    )
    out = []
    for b in range(B):
        p = post[b, : len1[b], : len2[b]].copy()
        p[p <= th] = 0.0
        out.append(p)
    return out


def test_sharded_matches_unsharded():
    seqs = _family(6)
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    s1 = [seqs[i] for i, _ in pairs]
    s2 = [seqs[j] for _, j in pairs]
    ref = _unsharded_pair_posteriors(s1, s2, 0.01)
    got = pmesh.sharded_pair_posteriors(s1, s2, 0.01)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_fifty_seq_family_allpairs_sharded():
    n = 50
    seqs = _family(n)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    assert len(pairs) == 1225
    posts = pmesh.sharded_pair_posteriors(
        [seqs[i] for i, _ in pairs], [seqs[j] for _, j in pairs], 0.01
    )
    assert len(posts) == 1225
    # every posterior has the right shape and lives in [0, 1]
    for (i, j), p in zip(pairs, posts):
        assert p.shape == (len(seqs[i]), len(seqs[j]))
        assert float(p.max(initial=0.0)) <= 1.0 + 1e-6
    # related sequences must show strong matches somewhere
    strong = sum(float(p.max(initial=0.0)) > 0.5 for p in posts)
    assert strong > 1000, strong


def test_fifty_seq_family_fold_sharded():
    seqs = _family(50)
    bps = pmesh.sharded_bp_posteriors(seqs, 0.01)
    assert len(bps) == 50
    for s, b in zip(seqs, bps):
        assert b.shape == (len(s), len(s))
        assert float(b.max(initial=0.0)) <= 1.0 + 1e-6


def test_similarity_and_guide_tree_at_fifty():
    from dafs_tpu import consistency, guide_tree

    n = 50
    seqs = _family(n)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    posts = pmesh.sharded_pair_posteriors(
        [seqs[i] for i, _ in pairs], [seqs[j] for _, j in pairs], 0.01
    )
    sim = np.zeros((n, n), np.float64)
    for (i, j), p in zip(pairs, posts):
        sim[i, j] = sim[j, i] = consistency.similarity(
            p, p > 0, p.shape[0], p.shape[1]
        )
    tree = guide_tree.build_tree(sim)
    # a full binary merge tree over n leaves has 2n-1 nodes
    assert len(tree) == 2 * n - 1
    root_score, (l, r) = tree[-1]
    assert l != -1 and r != -1
