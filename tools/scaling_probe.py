"""Quantitative scaling evidence for the 50-seq family (SURVEY §2.5).

The virtual 8-device CPU mesh proves *correctness* of the shardings
(dryrun_multichip: n-device output == 1-device output, byte-exact), but its
oversubscribed wall-clock says nothing about real scaling.  This probe
produces the transferable prediction instead, from two measured/derived
quantities per pipeline stage:

1. **Per-device shard compute time, measured on the one real TPU chip**:
   each data-parallel stage of the family-50 pipeline (fold, all-pairs
   align, similarity, PCT-mp, PCT-bp) is executed at the shard sizes an
   N-device mesh would give each device (ceil(work/N) for N = 1, 2, 4, 8).
   This is real device time for exactly the work one device of an N-mesh
   would run — no oversubscription artifacts.
2. **Communication bytes per stage**, from the array shapes the sharded
   implementation exchanges (all-gather of each stage's output so the next
   stage sees the full tensor; PCT additionally consumes the full mp/bp
   tensors, which arrive replicated from the previous stage's gather).

Combined with an assumed effective per-chip interconnect bandwidth (v5e ICI;
the default 45 GB/s is conservative for a 2D-torus all-gather), the probe
prints predicted stage times, the serial share (guide tree + progressive DD
merges, which run layer-batched on one device today), and the predicted
end-to-end scaling efficiency at each N.

Usage: python tools/scaling_probe.py [--ici-gbps 45] [--out SCALING_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafs_tpu.utils.aot import setup_compile_cache

setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sync(x):
    """Force a real device round trip (the async relay's block_until_ready
    returns at enqueue — round-5 finding, see ops/logspace.py)."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.ravel(leaves[0])[0]) if leaves else 0.0


def timeit(fn, reps=5, warm=2):
    for _ in range(warm):
        _sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def family(n=50, seed=0):
    import dafs_tpu

    fa = dafs_tpu.load_fasta("/root/reference/examples/RF00005:0.fa")
    seqs = [f.seq for f in fa]
    rng = np.random.default_rng(seed)

    def mutate(s):
        out = []
        for c in s:
            r = rng.random()
            if r < 0.01:
                continue
            if r < 0.02:
                out.append("ACGU"[rng.integers(4)])
            out.append("ACGU"[rng.integers(4)] if rng.random() < 0.08 else c)
        return "".join(out)

    return [mutate(seqs[i % len(seqs)]) for i in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ici-gbps", type=float, default=45.0)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--out", default="SCALING_r05.json")
    ap.add_argument("--no-e2e", action="store_true", help="skip the full-pipeline serial-share run (large families compile new merge shapes)")
    args = ap.parse_args()

    from dafs_tpu.models import probcons_params as PP
    from dafs_tpu.ops import mccaskill, pairhmm
    from dafs_tpu import consistency

    fam = family(args.n)
    N_SEQ = len(fam)
    pairs = [(x, y) for x in range(N_SEQ - 1) for y in range(x + 1, N_SEQ)]
    NP_ = len(pairs)
    Lmax = max(map(len, fam))
    L = -(-Lmax // 32) * 32
    print(f"family: {N_SEQ} seqs, {NP_} pairs, L bucket {L}, "
          f"backend {jax.default_backend()}")

    ns = [1, 2, 4, 8]
    stages: dict = {}

    # ---- stage: fold (per-seq McCaskill), sharded over sequences ---------
    def fold_chunk(k):
        seqs = fam[:k]
        return lambda: mccaskill.batch_bp_posteriors(seqs, 0.01, bl=True)

    stages["fold"] = {
        "work_items": N_SEQ,
        "out_bytes": N_SEQ * L * L * 4,
        "dev_s": {n: timeit(fold_chunk(-(-N_SEQ // n))) for n in ns},
    }

    # ---- stage: align (all-pairs pair-HMM), sharded over pairs -----------
    def enc(seqs1, seqs2):
        B = len(seqs1)
        c1 = np.zeros((B, L + 1), np.int32)
        c2 = np.zeros((B, L + 1), np.int32)
        l1 = np.array([len(s) for s in seqs1], np.int32)
        l2 = np.array([len(s) for s in seqs2], np.int32)
        for b, s in enumerate(seqs1):
            c1[b, 1 : len(s) + 1] = PP.encode(s)
        for b, s in enumerate(seqs2):
            c2[b, 1 : len(s) + 1] = PP.encode(s)
        return (jnp.asarray(c1), jnp.asarray(l1), jnp.asarray(c2),
                jnp.asarray(l2))

    def align_chunk(k):
        ch = pairs[:k]
        a = enc([fam[x] for x, _ in ch], [fam[y] for _, y in ch])
        return lambda: pairhmm.best_forward_backward_posterior(
            *a, l1max=L, l2max=L
        )

    stages["align"] = {
        "work_items": NP_,
        "out_bytes": NP_ * L * L * 4,
        "dev_s": {n: timeit(align_chunk(-(-NP_ // n))) for n in ns},
    }

    # ---- stage: similarity DP, sharded over pairs -------------------------
    # (uses the batched device path via similarity_matrix's internals; probe
    # with the pairwise batched call on k pairs)
    from dafs_tpu.consistency import _similarity_batched

    P1 = P2 = L + 1
    simfn = _similarity_batched(P1, P2)
    mp_dummy = jnp.asarray(
        np.random.default_rng(1).random((NP_, P1, P2), np.float32) * 0.02
    )
    pres = jnp.ones((NP_, P1, P2), bool)
    lens = jnp.full((NP_,), Lmax, jnp.int32)

    def sim_chunk(k):
        return lambda: simfn(
            mp_dummy[:k], pres[:k], lens[:k], lens[:k]
        )

    stages["similarity"] = {
        "work_items": NP_,
        "out_bytes": NP_ * 4,
        "dev_s": {n: timeit(sim_chunk(-(-NP_ // n))) for n in ns},
    }

    # ---- stage: PCT (match + bp), sharded over the worklists --------------
    rngp = np.random.default_rng(2)
    mp_t = (rngp.random((N_SEQ, N_SEQ, L, L)) < 0.02).astype(np.float32) * 0.5
    bp_t = (rngp.random((N_SEQ, L, L)) < 0.02).astype(np.float32) * 0.5
    mp_j = jnp.asarray(mp_t)
    bp_j = jnp.asarray(bp_t)

    def pct_mp_chunk(k):
        xs = jnp.asarray(np.array([p[0] for p in pairs[:k]], np.int32))
        ys = jnp.asarray(np.array([p[1] for p in pairs[:k]], np.int32))
        W = jnp.asarray(np.full((k, N_SEQ), 0.02, np.float32))
        sw = jnp.asarray(np.ones(k, np.float32))
        return lambda: consistency._relax_mp_scan(mp_j, xs, ys, W, sw)

    def pct_bp_chunk(k):
        xs = jnp.asarray(np.arange(k, dtype=np.int32) % N_SEQ)
        W = jnp.asarray(np.full((k, N_SEQ), 0.02, np.float32))
        sw = jnp.asarray(np.ones(k, np.float32))
        return lambda: consistency._relax_bp_scan(bp_j, mp_j, xs, W, sw)

    stages["pct_mp"] = {
        "work_items": NP_,
        "out_bytes": NP_ * L * L * 4,
        # PCT consumes the FULL mp tensor: the align stage's sharded output
        # must be all-gathered first (counted once, here)
        "extra_in_bytes": N_SEQ * N_SEQ * L * L * 4,
        "dev_s": {n: timeit(pct_mp_chunk(-(-NP_ // n))) for n in ns},
    }
    stages["pct_bp"] = {
        "work_items": N_SEQ,
        "out_bytes": N_SEQ * L * L * 4,
        "extra_in_bytes": N_SEQ * L * L * 4,  # bp tensor gather
        "dev_s": {n: timeit(pct_bp_chunk(-(-N_SEQ // n))) for n in ns},
    }

    # ---- serial share: guide tree + progressive merges --------------------
    # measured from the e2e phase split (single-device today; the layered
    # DD batch is the natural next sharding axis, width up to 17 merges on
    # this family)
    phases: dict = {}
    e2e = 0.0
    serial_s = 0.0
    if not args.no_e2e:
        import logging
        import dafs_tpu
        from dafs_tpu.utils.log import logger

        r1 = dafs_tpu.align_and_fold(fam)  # warm

        class _Grab(logging.Handler):
            def emit(self, rec):
                m = rec.getMessage()
                if m.startswith("phase "):
                    name, _, val = m[6:].rpartition(": ")
                    phases[name] = float(val[:-1])

        h = _Grab()
        logger.addHandler(h)
        lvl = logger.level
        logger.setLevel(logging.INFO)
        try:
            t0 = time.perf_counter()
            r2 = dafs_tpu.align_and_fold(fam)
            e2e = time.perf_counter() - t0
        finally:
            logger.removeHandler(h)
            logger.setLevel(lvl)
        assert str(r1) == str(r2)
        serial_s = phases.get("progressive merges", 0.0) + phases.get(
            "final avg_bp (+alifold)", 0.0
        ) + phases.get("final decode", 0.0)

    # ---- prediction --------------------------------------------------------
    bw = args.ici_gbps * 1e9
    table = {}
    print(f"\nper-device shard compute time (measured on the real chip), "
          f"comm at {args.ici_gbps:.0f} GB/s effective all-gather:")
    print(f"{'stage':12s} {'N=1':>9s} {'N=2':>9s} {'N=4':>9s} {'N=8':>9s} "
          f"{'comm@8':>9s}")
    tot = {n: 0.0 for n in ns}
    comm_tot = {n: 0.0 for n in ns}
    for name, st in stages.items():
        row = []
        for n in ns:
            dev = st["dev_s"][n]
            bytes_moved = (st["out_bytes"] + st.get("extra_in_bytes", 0)) * (
                (n - 1) / n
            )
            comm = bytes_moved / bw
            tot[n] += dev
            comm_tot[n] += comm
            row.append(dev)
        comm8 = (st["out_bytes"] + st.get("extra_in_bytes", 0)) * (7 / 8) / bw
        print(f"{name:12s} " + " ".join(f"{v*1e3:8.1f}m" for v in row)
              + f" {comm8*1e3:8.1f}m")
        table[name] = {
            "dev_s": {str(n): round(st["dev_s"][n], 4) for n in ns},
            "out_bytes": st["out_bytes"],
            "extra_in_bytes": st.get("extra_in_bytes", 0),
        }

    print(f"\nserial share today (guide tree + layer-batched DD merges + "
          f"final decode): {serial_s:.2f}s of e2e {e2e:.2f}s")
    eff = {}
    for n in ns:
        t_n = tot[n] + comm_tot[n] + serial_s
        t_1 = tot[1] + serial_s
        eff[n] = t_1 / (n * t_n)
        print(f"N={n}: predicted parallel-stage time {tot[n]+comm_tot[n]:.2f}s "
              f"(+{serial_s:.2f}s serial) -> e2e {t_n:.2f}s, "
              f"scaling efficiency {eff[n]*100:.0f}%"
              + ("" if n == 1 else "  (vs >= 80% target: "
                 + ("MET for parallel stages" if
                    (tot[1] / (n * (tot[n] + comm_tot[n]))) >= 0.8 else "not met")
                 + f"; parallel-only {tot[1]/(n*(tot[n]+comm_tot[n]))*100:.0f}%)"))

    out = {
        "n_seqs": N_SEQ,
        "stages": table,
        "phases_e2e_s": phases,
        "e2e_warm_s": round(e2e, 2),
        "serial_s": round(serial_s, 2),
        "ici_gbps_assumed": args.ici_gbps,
        "efficiency": {str(n): round(eff[n], 3) for n in ns},
        "parallel_only_efficiency": {
            str(n): round(tot[1] / (n * (tot[n] + comm_tot[n])), 3) for n in ns
        },
        "note": (
            "dev_s are measured single-chip times of exactly the shard an "
            "N-device mesh gives each device (ceil(work/N)); comm bytes are "
            "the all-gathers the sharded implementation performs; merges "
            "run layer-batched on one device today (the vmapped DD batch "
            "axis is the natural next sharding axis, layer widths up to 17 "
            "on this family)"
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
