#!/usr/bin/env python
"""Multi-process (DCN-style) execution of the posterior + PCT + similarity
stages (SURVEY §2.5 "distributed communication backend"; BASELINE ≥80%
scaling target).

The reference has no distributed execution at all; this is the framework's
new design.  A TPU pod runs one process per host with jax.distributed
stitching their meshes together over DCN; the identical mechanism works on
CPU with the gloo collectives backend, which is what this tool exercises —
REAL cross-process collectives (the shard_map'ed PCT gathers its worklist
chunks across process boundaries), not the single-process virtual mesh of
the test suite.

Parent mode (no DAFS_TPU_MP_RANK): spawns N child processes, each owning K
local CPU devices; waits; writes MULTIPROC json to stdout/--out.
Child mode: jax.distributed.initialize into the global 1-D "work" mesh, run:
  1. all-pairs pair-HMM posteriors, batch sharded over the global mesh
  2. similarity matrix (replicated host-side, deterministic per process)
  3. PCT (match + base-pair) via the production shard_map path
     (consistency._sharded_pct) over the GLOBAL mesh
then rank 0 re-runs everything unsharded on one local device and asserts
bitwise equality (deterministic f32 reductions end to end).

Scaling note: this host has 2 physical cores, so wall-clock "speedup" from
2 processes is not meaningful here; what this demonstrates is correctness of
the cross-process collective path and the per-process work division (each
process touches only its 1/N of the pair batch).  Efficiency on real
hardware is bounded by the same collective pattern, measured in
tests/test_scaling.py on the virtual mesh.

Usage: python tools/multiproc.py [--nprocs 2] [--local-devices 4] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FASTA = "/root/reference/examples/RF00005:0.fa"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def parent(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    outs = [os.path.join("/tmp", f"dafs_mp_{os.getpid()}_{r}.json")
            for r in range(args.nprocs)]
    for r in range(args.nprocs):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={args.local_devices}",
            DAFS_TPU_MP_RANK=str(r),
            DAFS_TPU_MP_NPROCS=str(args.nprocs),
            DAFS_TPU_MP_COORD=coord,
            DAFS_TPU_MP_OUT=outs[r],
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate()[0].decode() for p in procs]
    rcs = [p.returncode for p in procs]
    result = {"ok": all(rc == 0 for rc in rcs), "rcs": rcs,
              "nprocs": args.nprocs, "local_devices": args.local_devices}
    if result["ok"] and os.path.exists(outs[0]):
        result.update(json.load(open(outs[0])))
    else:
        result["logs"] = [l[-4000:] for l in logs]
    for f in outs:
        if os.path.exists(f):
            os.unlink(f)
    text = json.dumps(result)
    print(text)
    if args.out:
        open(args.out, "w").write(text + "\n")
    return 0 if result["ok"] else 1


def child() -> int:
    rank = int(os.environ["DAFS_TPU_MP_RANK"])
    nprocs = int(os.environ["DAFS_TPU_MP_NPROCS"])
    coord = os.environ["DAFS_TPU_MP_COORD"]

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=rank
    )
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import dafs_tpu
    from dafs_tpu import consistency
    from dafs_tpu.models import probcons_params as PP
    from dafs_tpu.ops import pairhmm

    ndev_global = jax.device_count()
    ndev_local = jax.local_device_count()
    assert ndev_global == ndev_local * nprocs
    mesh = Mesh(np.array(jax.devices()), ("work",))
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("work"))

    fa = dafs_tpu.load_fasta(FASTA)
    N = len(fa)
    lens = [len(f) for f in fa]
    pairs = [(i, j) for i in range(N) for j in range(i + 1, N)]
    rup = lambda n, m: -(-n // m) * m
    L = rup(max(lens), 32)
    B = rup(len(pairs), ndev_global)
    codes1 = np.zeros((B, L + 1), np.int32)
    codes2 = np.zeros((B, L + 1), np.int32)
    len1 = np.ones(B, np.int32)
    len2 = np.ones(B, np.int32)
    for b, (i, j) in enumerate(pairs):
        codes1[b, 1 : lens[i] + 1] = PP.encode(fa[i].seq)
        codes2[b, 1 : lens[j] + 1] = PP.encode(fa[j].seq)
        len1[b], len2[b] = lens[i], lens[j]

    # ---- stage 1: all-pairs pair-HMM, batch sharded over the global mesh
    def put(x, s):
        return jax.device_put(jnp.asarray(x), s)

    t0 = time.perf_counter()
    post_g = pairhmm.forward_backward_posterior(
        put(codes1, shd), put(len1, shd), put(codes2, shd), put(len2, shd),
        l1max=L, l2max=L,
    )
    post = multihost_utils.process_allgather(post_g, tiled=True)
    t_pairs_sharded = time.perf_counter() - t0

    # ---- stage 2: similarity (tiny; replicated host-side computation)
    mp = np.zeros((N, N, L, L), np.float32)
    for b, (i, j) in enumerate(pairs):
        p = np.asarray(post[b, : lens[i], : lens[j]]).copy()
        p[p <= 0.01] = 0.0
        mp[i, j, : lens[i], : lens[j]] = p
        mp[j, i, : lens[j], : lens[i]] = p.T
    for i in range(N):
        mp[i, i, : lens[i], : lens[i]] = np.eye(lens[i], dtype=np.float32)
    sim = consistency.similarity_matrix(mp, lens)

    # ---- stage 3: PCT via the production shard_map path on the GLOBAL mesh
    bp0 = np.zeros((N, L, L), np.float32)  # fold side exercised in bp-PCT
    rng = np.random.default_rng(0)
    for i in range(N):
        t = np.triu(rng.random((lens[i], lens[i]), dtype=np.float32), 5)
        bp0[i, : lens[i], : lens[i]] = np.where(t > 0.97, t, 0.0)

    pct_pairs = [(x, y) for x in range(N - 1) for y in range(x + 1, N)]
    Bp = rup(len(pct_pairs), ndev_global)
    xs = np.zeros(Bp, np.int32)
    ys = np.zeros(Bp, np.int32)
    W = np.zeros((Bp, N), np.float32)
    sum_w = np.ones(Bp, np.float32)
    for b, (x, y) in enumerate(pct_pairs):
        w = consistency._pct_weights_match(sim, x, y, 0.25)
        xs[b], ys[b] = x, y
        W[b] = w
        sum_w[b] = np.float32(np.sum(w, dtype=np.float32))
    t0 = time.perf_counter()
    mp_fn = consistency._sharded_pct("mp", mesh)
    posts_mp_g = mp_fn(put(mp, rep), put(xs, shd), put(ys, shd),
                       put(W, shd), put(sum_w, shd))
    posts_mp = multihost_utils.process_allgather(posts_mp_g, tiled=True)

    xsb = np.arange(rup(N, ndev_global), dtype=np.int32) % N
    Wb = np.zeros((len(xsb), N), np.float32)
    swb = np.ones(len(xsb), np.float32)
    for x in range(N):
        w = np.float32(sim[:, x]).copy()
        scale = np.full(N, np.float32(0.25) / np.float32(N - 1), np.float32)
        scale[x] = np.float32(0.75)
        w = np.float32(w * scale)
        Wb[x] = w
        swb[x] = np.float32(np.sum(w, dtype=np.float32))
    bp_fn = consistency._sharded_pct("bp", mesh)
    posts_bp_g = bp_fn(put(bp0, rep), put(mp, rep), put(xsb, shd),
                       put(Wb, shd), put(swb, shd))
    posts_bp = multihost_utils.process_allgather(posts_bp_g, tiled=True)
    t_pct_sharded = time.perf_counter() - t0

    result = {}
    if rank == 0:
        # ---- unsharded single-device reference, same process ------------
        dev = jax.local_devices()[0]
        lput = lambda x: jax.device_put(jnp.asarray(x), dev)  # noqa: E731
        t0 = time.perf_counter()
        post_ref = np.asarray(
            pairhmm.forward_backward_posterior(
                lput(codes1), lput(len1), lput(codes2), lput(len2),
                l1max=L, l2max=L,
            )
        )
        t_pairs_local = time.perf_counter() - t0
        t0 = time.perf_counter()
        mp_ref = np.asarray(consistency._relax_mp_scan(
            lput(mp), lput(xs), lput(ys), lput(W), lput(sum_w)))
        bp_ref = np.asarray(consistency._relax_bp_scan(
            lput(bp0), lput(mp), lput(xsb), lput(Wb), lput(swb)))
        t_pct_local = time.perf_counter() - t0

        eq_pairs = bool((np.asarray(post) == post_ref).all())
        eq_mp = bool((np.asarray(posts_mp) == mp_ref).all())
        eq_bp = bool((np.asarray(posts_bp) == bp_ref).all())
        result = {
            "global_devices": ndev_global,
            "processes": nprocs,
            "collectives": str(
                jax.config.jax_cpu_collectives_implementation
            ) if hasattr(jax.config, "jax_cpu_collectives_implementation")
            else "default",
            "bitwise_equal_pairhmm": eq_pairs,
            "bitwise_equal_pct_mp": eq_mp,
            "bitwise_equal_pct_bp": eq_bp,
            "t_pairs_sharded_s": round(t_pairs_sharded, 3),
            "t_pairs_local_1dev_s": round(t_pairs_local, 3),
            "t_pct_sharded_s": round(t_pct_sharded, 3),
            "t_pct_local_1dev_s": round(t_pct_local, 3),
            "note": "2 physical cores on this host: sharded wall-times "
                    "include heavy oversubscription; the assertion of record "
                    "is bitwise equality through cross-process collectives",
        }
        ok = eq_pairs and eq_mp and eq_bp
        with open(os.environ["DAFS_TPU_MP_OUT"], "w") as f:
            json.dump(result, f)
        if not ok:
            print("MISMATCH", result, flush=True)
            return 1
    multihost_utils.sync_global_devices("dafs_mp_done")
    return 0


if __name__ == "__main__":
    if "DAFS_TPU_MP_RANK" in os.environ:
        raise SystemExit(child())
    raise SystemExit(parent())
