#!/usr/bin/env python
"""Characterize the RF00017 DD merges that hit the t_max=600 cap.

Round-2 left the live RF00017 output unanchored because several merges do
not converge in 600 subgradient iterations, making the decoded output
sensitive to f32 reduction order (STATUS.md "Snapshot policy").  This tool
answers the open questions (VERDICT r2 "next round" #6) on the frozen
posteriors (tests/snapshots/rf00017_replay.npz), entirely host-side:

  1. per-merge Step/Violated trace of the host DD loop (an exact mirror of
     src/dafs.cpp:1087-1291 with native C++ decoders): does the violation
     count decay or oscillate?  does the eta schedule stall?
  2. does t_max=5000 converge what t_max=600 does not?
  3. the exact ILP optimum (-m 0) on each non-converging merge: is the DD
     primal already optimal (pure certificate gap) or strictly worse, and by
     how much?

Because the loop is the reference's algorithm with the reference's eta
schedule on (our) posteriors of the same input, a merge whose violation
count oscillates around a nonzero floor here is strong evidence the
reference's own loop also hits its cap on this input (its -m 600 default,
src/dafs.cpp:1615).

Usage: python tools/rf00017_dd.py [--tmax-long 5000] [--skip-ip]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

SNAP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "snapshots", "rf00017_replay.npz")
FASTA = "/root/reference/examples/RF00017:4.fa"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tmax-long", type=int, default=5000)
    ap.add_argument("--skip-ip", action="store_true")
    args = ap.parse_args()

    from dafs_tpu import dd, fasta, guide_tree, pipeline
    from dafs_tpu.models import align_models, fold_models
    from dafs_tpu.typedefs import CUTOFF

    data = np.load(SNAP)
    fa = fasta.load_fasta(FASTA)
    calls = iter(range(int(data["n_ali_calls"])))

    import hashlib

    def aln_key(aln, constraint=None) -> str:
        h = hashlib.sha256()
        for row in aln:
            h.update(str(row.seq_id).encode())
            h.update(np.asarray(row.mask, np.uint8).tobytes())
        if constraint:
            h.update(constraint.encode())
        return h.hexdigest()[:16]

    class ReplayAlifold:
        def consensus_bp(self, aln, fa_, constraint=None):
            i = next(calls)
            assert str(data[f"ali_key_{i}"]) == aln_key(aln, constraint)
            return data[f"ali_out_{i}"]

    opts = pipeline.Options(dd_host=True)
    eng = pipeline.Dafs(
        align_models.ProbCons(opts.th_a),
        fold_models.RNAfold(True, CUTOFF),
        opts,
        alifold_model=ReplayAlifold(),
    )
    eng.fa = fa
    eng.mp = data["mp"]
    eng.bp = data["bp"]
    eng.tree = guide_tree.build_tree(data["sim"])

    # EXACTLY pipeline._align's serial recursion (left child first, then
    # right, then merge) so the alifold replay keys match the recorded
    # trace; downstream merges consume the standard 600-iter DD result.
    from dafs_tpu.typedefs import AlnRow

    kw = dict(w=eng.o.w, th_s=list(eng.o.th_s), th_a=eng.o.th_a)
    report = []

    def walk(n):
        _sc, (a, b) = eng.tree[n]
        if a == -1:
            return [AlnRow(n, np.ones(len(eng.fa[n]), dtype=bool))]
        aln1 = walk(a)
        aln2 = walk(b)
        return analyze_merge(n, aln1, aln2)

    def analyze_merge(n, aln1, aln2):
        p_x, p_y, p_z = eng._merge_inputs(aln1, aln2)
        n1, n2 = len(aln1), len(aln2)

        trace = []
        t0 = time.perf_counter()
        s600, x, y, z = dd.solve_by_dd_ipknot(
            p_x, p_y, p_z, n1, n2, **kw, eta0=eng.o.eta0, t_max=600,
            structure_decoder="nussinov", trace_cb=lambda *r: trace.append(r),
        )
        t_dd = time.perf_counter() - t0
        conv600 = trace[-1][2] == 0

        row = {
            "node": n, "n1": n1, "n2": n2, "L1": p_z.shape[0],
            "L2": p_z.shape[1], "iters_600": trace[-1][0] + 1,
            "violated_600": trace[-1][2], "converged_600": conv600,
            "bound_600": s600, "t_dd_s": round(t_dd, 1),
        }
        v = np.array([r[2] for r in trace])
        row["violated_min"] = int(v.min())
        row["violated_last50_mean"] = float(v[-50:].mean())
        row["violated_last50_std"] = float(v[-50:].std())
        row["eta_last"] = trace[-1][3]

        if not conv600:
            tr2 = []
            s_long, xl, yl, zl = dd.solve_by_dd_ipknot(
                p_x, p_y, p_z, n1, n2, **kw, eta0=eng.o.eta0,
                t_max=args.tmax_long, structure_decoder="nussinov",
                trace_cb=lambda *r: tr2.append(r),
            )
            row["iters_long"] = tr2[-1][0] + 1
            row["violated_long"] = tr2[-1][2]
            row["converged_long"] = tr2[-1][2] == 0
            if not args.skip_ip:
                t0 = time.perf_counter()
                s_ip, xi, yi, zi = dd.solve_by_ip(p_x, p_y, p_z, n1, n2, **kw)
                row["t_ip_s"] = round(time.perf_counter() - t0, 1)
                row["ip_opt"] = s_ip
                row["dd_bound_minus_ip"] = s600 - s_ip
                row["dd_solution_equals_ip"] = bool(
                    (x == xi).all() and (y == yi).all() and (z == zi).all()
                )
        report.append(row)
        print(row, flush=True)

        _ss, aln = eng._merge_finish(x, y, z, aln1, aln2)
        return aln

    walk(len(eng.tree) - 1)

    print("\nsummary:")
    nonconv = [r for r in report if not r["converged_600"]]
    print(f"  {len(report)} merges, {len(nonconv)} hit the 600-iter cap")
    for r in nonconv:
        osc = r["violated_last50_std"] > 0.5
        print(
            f"  node {r['node']}: violated floor {r['violated_min']}, "
            f"last-50 mean {r['violated_last50_mean']:.1f} "
            f"(std {r['violated_last50_std']:.1f} -> "
            f"{'oscillating' if osc else 'stuck'}), "
            f"eta {r['eta_last']:.4f}, "
            f"long run ({r.get('iters_long')}) violated={r.get('violated_long')}, "
            f"IP gap {r.get('dd_bound_minus_ip')}, "
            f"DD==IP solution: {r.get('dd_solution_equals_ip')}"
        )


if __name__ == "__main__":
    main()
