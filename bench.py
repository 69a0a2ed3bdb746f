#!/usr/bin/env python
"""Benchmark: RF00005 all-pairs pair-HMM throughput on the current backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is therefore
MEASURED on this machine against the native single-core C++ pair-HMM
forward/backward in dafs_tpu/native (a scalar mirror of the reference's
probconsRNA/ProbabilisticModel.h:105-259 with the same ScoreType.h log-space
approximations, agreeing with the TPU kernel to ~4e-6).  >1.0 means faster
than one CPU core running the reference's DP.
"""

import json
import time

import numpy as np


def measure_native_baseline(seqs1, seqs2, reps=3) -> float:
    """Single-core C++ pair-HMM throughput (cell-state-updates/s), measured."""
    from dafs_tpu import native

    native.pairhmm_posterior(seqs1[0], seqs2[0])  # build/load the .so
    t0 = time.perf_counter()
    for _ in range(reps):
        for s1, s2 in zip(seqs1, seqs2):
            native.pairhmm_posterior(s1, s2)
    dt = (time.perf_counter() - t0) / reps
    cells = sum((len(a) + 1) * (len(b) + 1) * 3 * 2 for a, b in zip(seqs1, seqs2))
    return cells / dt


def main() -> None:
    import jax

    from dafs_tpu.utils.aot import setup_compile_cache; setup_compile_cache()
    import dafs_tpu
    from dafs_tpu.models import probcons_params as PP
    from dafs_tpu.ops import pairhmm
    import jax.numpy as jnp

    fa = dafs_tpu.load_fasta("/root/reference/examples/RF00005:0.fa")
    pairs = [(i, j) for i in range(len(fa)) for j in range(i + 1, len(fa))]
    seqs1 = [fa[i].seq for i, _ in pairs]
    seqs2 = [fa[j].seq for _, j in pairs]

    def rup(n, m):
        return -(-n // m) * m

    l1max = rup(max(map(len, seqs1)), 32)
    l2max = rup(max(map(len, seqs2)), 32)
    B = len(pairs)
    codes1 = np.zeros((B, l1max + 1), np.int32)
    codes2 = np.zeros((B, l2max + 1), np.int32)
    len1 = np.array([len(s) for s in seqs1], np.int32)
    len2 = np.array([len(s) for s in seqs2], np.int32)
    for b, s in enumerate(seqs1):
        codes1[b, 1 : len(s) + 1] = PP.encode(s)
    for b, s in enumerate(seqs2):
        codes2[b, 1 : len(s) + 1] = PP.encode(s)
    args = (
        jnp.asarray(codes1), jnp.asarray(len1),
        jnp.asarray(codes2), jnp.asarray(len2),
    )

    # warmup/compile (best path: Pallas kernel on TPU, lax.scan elsewhere)
    fbp = pairhmm.best_forward_backward_posterior
    out = fbp(*args, l1max=l1max, l2max=l2max)
    out.block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fbp(*args, l1max=l1max, l2max=l2max)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    # effective (unpadded) DP cell-state updates: forward + backward sweeps,
    # 3 states per cell
    cells = int(np.sum((len1 + 1).astype(np.int64) * (len2 + 1)) * 3 * 2)
    cells_per_s = cells / dt

    # long-sequence pair-HMM throughput (RF00017, ~300 nt SRP RNAs)
    fa17 = dafs_tpu.load_fasta("/root/reference/examples/RF00017:4.fa")
    p17 = [(i, j) for i in range(len(fa17)) for j in range(i + 1, len(fa17))]
    s1 = [fa17[i].seq for i, _ in p17]
    s2 = [fa17[j].seq for _, j in p17]
    L1, L2 = rup(max(map(len, s1)), 32), rup(max(map(len, s2)), 32)
    B17 = len(p17)
    c1 = np.zeros((B17, L1 + 1), np.int32)
    c2 = np.zeros((B17, L2 + 1), np.int32)
    n1 = np.array([len(s) for s in s1], np.int32)
    n2 = np.array([len(s) for s in s2], np.int32)
    for b, s in enumerate(s1):
        c1[b, 1 : len(s) + 1] = PP.encode(s)
    for b, s in enumerate(s2):
        c2[b, 1 : len(s) + 1] = PP.encode(s)
    a17 = (jnp.asarray(c1), jnp.asarray(n1), jnp.asarray(c2), jnp.asarray(n2))
    out17 = fbp(*a17, l1max=L1, l2max=L2)
    out17.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out17 = fbp(*a17, l1max=L1, l2max=L2)
    out17.block_until_ready()
    dt17 = (time.perf_counter() - t0) / reps
    cells17 = int(np.sum((n1 + 1).astype(np.int64) * (n2 + 1)) * 3 * 2)

    # folding stage: McCaskill partition function (gather-free kernel),
    # O(L^3)-equivalent cell updates (interior stencil dominates: ~961 terms
    # per qb cell, inside + outside)
    from dafs_tpu.ops import mccaskill

    seqs = [f.seq for f in fa]
    _ = mccaskill.batch_bp_posteriors(seqs, 0.01)  # warmup/compile
    t0 = time.perf_counter()
    _ = mccaskill.batch_bp_posteriors(seqs, 0.01)
    dt_fold = time.perf_counter() - t0
    fold_cells = int(sum(len(s) ** 2 for s in seqs)) * 961 * 2

    # consensus folding: gather-free alifold kernel on a gapped alignment
    # (the per-merge hot path of the progressive joiner)
    from dafs_tpu.ops import alifold as ali

    aln = [s + "-" * (max(map(len, seqs)) - len(s)) for s in seqs[:6]]
    _ = ali.consensus_bp(aln, 0.01)  # warmup/compile
    t0 = time.perf_counter()
    _ = ali.consensus_bp(aln, 0.01)
    dt_ali = time.perf_counter() - t0

    # measured single-core baseline: native C++ scalar pair-HMM on the same
    # RF00005 all-pairs workload
    ref_cells_per_s = measure_native_baseline(seqs1, seqs2)

    # end-to-end RF00005 default pipeline (guide tree + layered DD merges +
    # final alifold decode); warm = in-process rerun (steady-state serving)
    from dafs_tpu import pipeline
    from dafs_tpu.models import align_models, fold_models
    from dafs_tpu.ops import alifold as ali_mod
    from dafs_tpu.typedefs import CUTOFF

    def run_e2e():
        opts = pipeline.Options()
        eng = pipeline.Dafs(
            align_models.ProbCons(opts.th_a),
            fold_models.RNAfold(True, CUTOFF),
            opts,
            alifold_model=ali_mod.Alifold(0.0, bl=True),
        )
        t0 = time.perf_counter()
        eng.run(fa)
        return time.perf_counter() - t0

    e2e_cold = run_e2e()
    e2e_warm = run_e2e()
    print(
        json.dumps(
            {
                "metric": "rf00005_allpairs_pairhmm_cell_updates_per_s",
                "value": round(cells_per_s, 1),
                "unit": "cell-state-updates/s/chip",
                "vs_baseline": round(cells_per_s / ref_cells_per_s, 3),
                "detail": {
                    "seq_pairs_per_s": round(B / dt, 2),
                    "wall_s_per_allpairs_batch": round(dt, 5),
                    "rf00017_pairhmm_cell_updates_per_s": round(cells17 / dt17, 1),
                    "rf00017_seq_pairs_per_s": round(B17 / dt17, 2),
                    "mccaskill_seqs_per_s": round(len(seqs) / dt_fold, 2),
                    "mccaskill_stencil_terms_per_s": round(fold_cells / dt_fold, 1),
                    "alifold_consensus_s_per_call": round(dt_ali, 4),
                    "baseline_cells_per_s_measured_native_cpp": round(ref_cells_per_s, 1),
                    "rf00005_e2e_first_s": round(e2e_cold, 2),
                    "rf00005_e2e_warm_s": round(e2e_warm, 2),
                    "backend": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
