"""Capture the ILP workloads of an --ipknot run for offline iteration.

Wraps BOTH IPknot solve paths — ipknot.decode (final/bp-update decodes) and
IPknotModel.solve (the DD loop's persistent per-iteration models) — to
record every (p, th, w, q) input plus wall time, then runs the RF00005
--ipknot pipeline once and pickles the workload to
/tmp/ipknot_workload.pkl.
"""
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from dafs_tpu.decoders_ip import ipknot  # noqa: E402

records = []
orig_decode = ipknot.decode
orig_solve = ipknot.IPknotModel.solve


def wrapped(p, th, w=None, q=None, levelwise=True):
    t0 = time.perf_counter()
    out = orig_decode(p, th, w=w, q=q, levelwise=levelwise)
    records.append(dict(
        p=np.asarray(p).copy(), th=list(th), w=w,
        q=None if q is None else np.asarray(q).copy(),
        levelwise=levelwise, wall=time.perf_counter() - t0,
    ))
    return out


def wrapped_solve(self, q=None):
    t0 = time.perf_counter()
    out = orig_solve(self, q)
    records.append(dict(
        p=np.asarray(self.p).copy(), th=[float(t) for t in self.th],
        w=float(self.w),
        q=None if q is None else np.asarray(q).copy(),
        levelwise=self.levelwise, wall=time.perf_counter() - t0,
        persistent=True,
    ))
    return out


ipknot.decode = wrapped
ipknot.IPknotModel.solve = wrapped_solve

from dafs_tpu import cli  # noqa: E402

t0 = time.perf_counter()
rc = cli.main(["--ipknot", sys.argv[1] if len(sys.argv) > 1
               else "/root/reference/examples/RF00005:0.fa"])
wall = time.perf_counter() - t0
with open("/tmp/ipknot_workload.pkl", "wb") as fh:
    pickle.dump(records, fh)
walls = sorted(r["wall"] for r in records)
print(f"\n# calls={len(records)} e2e={wall:.1f}s "
      f"ilp_total={sum(walls):.1f}s max={walls[-1]:.2f}s "
      f"p90={walls[int(0.9*len(walls))]:.3f}s", file=sys.stderr)
