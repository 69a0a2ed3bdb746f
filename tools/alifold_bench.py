#!/usr/bin/env python
"""Device-only microbenchmark of the alifold consensus kernel.

Measures ops/alifold_kernel.py at RF00017-scale shapes (L-bucket 320) for a
range of group sizes NS, median of N reps with the inputs pre-staged on
device.  Run on the TPU (default backend) — compare against STATUS.md's
round-2 numbers (NS=2 139 ms, NS=10 626 ms) and the VERDICT r2 target
(NS=10 <= 250 ms).

Usage: python tools/alifold_bench.py [--L 320] [--ns 2,6,10] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=320)
    ap.add_argument("--ns", default="2,6,10")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from dafs_tpu.utils.aot import setup_compile_cache

    setup_compile_cache()
    import jax

    from dafs_tpu import fasta
    from dafs_tpu.ops import alifold as ali

    if os.environ.get("DAFS_TPU_TIMING"):
        from dafs_tpu.utils.log import set_verbosity

        set_verbosity(1)  # surface the host_prep/xfer/kernel INFO split

    fa = fasta.load_fasta("/root/reference/examples/RF00017:4.fa")
    print(f"backend: {jax.default_backend()}  L-bucket target: {args.L}")

    from tools.benchutil import spread_gap_aln

    def build_aln(ns, spread: bool):
        """spread=True: distribute each short row's gap deficit as scattered
        short runs (the realistic merged-alignment shape — small BCUT);
        spread=False: the old trailing-run padding (worst case, BCUT=31)."""
        seqs = [fa[i % len(fa)].seq for i in range(ns)]
        ncols = max(args.L - 10, max(len(s) for s in seqs))
        if spread:
            return spread_gap_aln(seqs, ncols)
        return [s + "-" * (ncols - len(s)) for s in seqs]

    for ns in (int(x) for x in args.ns.split(",")):
        for spread in (True, False):
            aln = build_aln(ns, spread)
            t0 = time.perf_counter()
            ali.consensus_bp(aln, 0.01)
            t_first = time.perf_counter() - t0
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                ali.consensus_bp(aln, 0.01)
                times.append(time.perf_counter() - t0)
            med = statistics.median(times)
            tag = "spread-gaps" if spread else "tail-gaps  "
            print(
                f"NS={ns:>2}  L={len(aln[0])} {tag} first {t_first*1e3:8.1f} ms   "
                f"median-of-{args.reps} {med*1e3:8.1f} ms   "
                f"(min {min(times)*1e3:.1f}, max {max(times)*1e3:.1f})"
            )


if __name__ == "__main__":
    main()
