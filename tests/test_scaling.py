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


def _tiny_family(n: int, seed: int = 11) -> list:
    """n mutated copies of a short hairpin (keeps 49 DD merges fast on CPU)."""
    from dafs_tpu.fasta import Fasta

    rng = np.random.default_rng(seed)
    base = "GGGCAACGACGUUCGUCGAAACCC"

    def mut(s):
        out = []
        for c in s:
            r = rng.random()
            if r < 0.02:
                continue
            out.append(str(rng.choice(list("ACGU"))) if rng.random() < 0.10 else c)
        return "".join(out)

    return [Fasta(f"seq{i:02d}", mut(base)) for i in range(n)]


def test_pct_sharded_matches_unsharded():
    """PCT shard_map path == single-device scan path, bitwise."""
    import jax

    from dafs_tpu import consistency

    n = 6
    seqs = _family(n)
    lens = [len(s) for s in seqs]
    L = max(lens)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    posts = pmesh.sharded_pair_posteriors(
        [seqs[i] for i, _ in pairs], [seqs[j] for _, j in pairs], 0.01
    )
    mp = np.zeros((n, n, L, L), np.float32)
    for (i, j), p in zip(pairs, posts):
        mp[i, j, : lens[i], : lens[j]] = p
        mp[j, i, : lens[j], : lens[i]] = p.T
    for i in range(n):
        mp[i, i][np.arange(lens[i]), np.arange(lens[i])] = 1.0
    bps = pmesh.sharded_bp_posteriors(seqs, 0.01)
    bp = np.zeros((n, L, L), np.float32)
    for i, b in enumerate(bps):
        bp[i, : lens[i], : lens[i]] = b
    sim = consistency.similarity_matrix(mp, lens)

    assert jax.device_count() > 1  # conftest virtual mesh
    mp_sharded = consistency.relax_matching_probability(mp, sim, lens, 0.25)
    bp_sharded = consistency.relax_basepairing_probability(bp, mp, sim, lens, 0.25)
    # force the unsharded scan path
    orig = consistency._maybe_mesh
    consistency._maybe_mesh = lambda: None
    try:
        mp_serial = consistency.relax_matching_probability(mp, sim, lens, 0.25)
        bp_serial = consistency.relax_basepairing_probability(bp, mp, sim, lens, 0.25)
    finally:
        consistency._maybe_mesh = orig
    np.testing.assert_array_equal(mp_sharded, mp_serial)
    np.testing.assert_array_equal(bp_sharded, bp_serial)


def test_fifty_seq_family_pct_sharded():
    """BASELINE config 4: the PCT stage at N=50 runs as O(1)-size sharded
    scans (the old unrolled formulation compiled 1225 einsums)."""
    from dafs_tpu import consistency

    n = 50
    seqs = [f.seq for f in _tiny_family(n)]
    lens = [len(s) for s in seqs]
    L = max(lens)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    posts = pmesh.sharded_pair_posteriors(
        [seqs[i] for i, _ in pairs], [seqs[j] for _, j in pairs], 0.01
    )
    mp = np.zeros((n, n, L, L), np.float32)
    for (i, j), p in zip(pairs, posts):
        mp[i, j, : lens[i], : lens[j]] = p
        mp[j, i, : lens[j], : lens[i]] = p.T
    for i in range(n):
        mp[i, i][np.arange(lens[i]), np.arange(lens[i])] = 1.0
    bps = pmesh.sharded_bp_posteriors(seqs, 0.01)
    bp = np.zeros((n, L, L), np.float32)
    for i, b in enumerate(bps):
        bp[i, : lens[i], : lens[i]] = b
    sim = consistency.similarity_matrix(mp, lens)
    bp2 = consistency.relax_basepairing_probability(bp, mp, sim, lens, 0.25)
    mp2 = consistency.relax_matching_probability(mp, sim, lens, 0.25)
    assert mp2.shape == mp.shape and bp2.shape == bp.shape
    assert float(mp2.max()) <= 1.0 + 1e-5
    # identity diagonals preserved, transforms nontrivial
    assert mp2[0, 0][np.arange(lens[0]), np.arange(lens[0])].min() == 1.0
    assert not np.array_equal(mp2, mp)


_N50_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
from dafs_tpu.utils.aot import setup_compile_cache
setup_compile_cache()
import sys
sys.path.insert(0, {root!r})
from tests.test_scaling import _tiny_family
from dafs_tpu import pipeline
from dafs_tpu.models import align_models, fold_models
from dafs_tpu.ops import alifold as alifold_ops
from dafs_tpu.typedefs import CUTOFF

fam = _tiny_family(50)
opts = pipeline.Options(t_max=50)
eng = pipeline.Dafs(
    align_models.ProbCons(opts.th_a),
    fold_models.RNAfold(True, CUTOFF),
    opts,
    alifold_model=alifold_ops.Alifold(0.0, bl=True),
)
out = eng.run(fam)
lines = out.splitlines()
assert lines[1] == ">SS_cons"
assert sum(l.startswith("> seq") for l in lines) == 50
width = len(lines[2])
for name, row in zip(lines[3::2], lines[4::2]):
    assert len(row) == width
print("N50_PIPELINE_OK", len(lines))
"""


@pytest.mark.slow
def test_fifty_seq_family_full_pipeline():
    """End-to-end 50-seq family on the 8-device mesh: fold + all-pairs +
    PCT sharded, guide tree, 49 layered DD merges, final decode.

    Runs in a FRESH python subprocess: compiling this test's alifold shapes
    after ~130 prior tests segfaults the XLA:CPU compiler (accumulated
    process state; the same compiles succeed standalone — reproduced 3x at
    the identical suite position, 2026-08)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    res = subprocess.run(
        [sys.executable, "-c", _N50_CHILD.format(root=root)],
        capture_output=True, text=True, cwd=root, env=env, timeout=2400,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert "N50_PIPELINE_OK" in res.stdout
