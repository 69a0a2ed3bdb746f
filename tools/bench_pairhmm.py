"""Microbench + bitwise check: pair-HMM Pallas kernel vs lax.scan on TPU.

Usage: python tools/bench_pairhmm.py [B] [L]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.utils.aot import setup_compile_cache

setup_compile_cache()


def _sync(x):
    # force a real device round trip: the async relay's block_until_ready
    # returns at enqueue (see ops/logspace.py round-5 note)
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timeit(fn, reps=10, warm=3):
    for _ in range(warm):
        _sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from dafs_tpu.ops import pairhmm, pairhmm_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 45
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 303
    l1max = l2max = -(-L // 32) * 32
    rng = np.random.default_rng(0)
    codes1 = np.zeros((B, l1max + 1), np.int32)
    codes2 = np.zeros((B, l2max + 1), np.int32)
    len1 = rng.integers(L - 9, L + 1, B).astype(np.int32)
    len2 = rng.integers(L - 9, L + 1, B).astype(np.int32)
    for b in range(B):
        codes1[b, 1 : len1[b] + 1] = rng.integers(1, 5, len1[b])
        codes2[b, 1 : len2[b] + 1] = rng.integers(1, 5, len2[b])
    args = (
        jnp.asarray(codes1), jnp.asarray(len1),
        jnp.asarray(codes2), jnp.asarray(len2),
    )

    ref = np.asarray(
        pairhmm.forward_backward_posterior(*args, l1max=l1max, l2max=l2max)
    )
    got = np.asarray(
        pairhmm_pallas.forward_backward_posterior(*args, l1max=l1max, l2max=l2max)
    )
    nbad = int((ref != got).sum())
    print(f"B={B} L={L}: bitwise mismatches vs lax.scan: {nbad} / {ref.size}")
    assert nbad == 0, "NOT bitwise equal"

    # in-executable slope: immune to the relay's fixed dispatch stall and
    # most of its run-to-run drift
    import functools as ft

    def make_loop(n):
        @jax.jit
        def run():
            def body(t, acc):
                p = pairhmm_pallas.forward_backward_posterior(
                    codes1_j, len1_j + (acc * 0.0).astype(jnp.int32),
                    codes2_j, len2_j, l1max=l1max, l2max=l2max,
                )
                return acc + jnp.sum(p[0, 0])

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    codes1_j, len1_j, codes2_j, len2_j = args
    f1, f2 = make_loop(3), make_loop(13)
    t_1 = timeit(lambda: f1())
    t_2 = timeit(lambda: f2())
    slope = (t_2 - t_1) / 10
    cells = float(np.sum((len1.astype(np.int64) + 1) * (len2 + 1)) * 3)
    print(f"in-loop slope B={B}: {slope*1e3:.2f} ms/call "
          f"({cells/slope:.3e} cell-updates/s)")

    t1 = timeit(
        lambda: pairhmm_pallas.forward_backward_posterior(
            *args, l1max=l1max, l2max=l2max
        )
    )
    # x8 replication amortizes the fixed relay dispatch stall
    args8 = tuple(jnp.concatenate([a] * 8, axis=0) for a in args)
    t8 = timeit(
        lambda: pairhmm_pallas.forward_backward_posterior(
            *args8, l1max=l1max, l2max=l2max
        )
    )
    cells = float(np.sum((len1.astype(np.int64) + 1) * (len2 + 1)) * 3)
    print(f"pallas B={B}: {t1*1e3:.2f} ms  ({cells/t1:.3e} cell-updates/s)")
    print(f"pallas B={B*8}: {t8*1e3:.2f} ms  ({cells*8/t8:.3e} cell-updates/s)")
    print(f"marginal: {(t8-t1)/7*1e3:.2f} ms per {B}-batch "
          f"({cells/((t8-t1)/7):.3e} cells/s)")


if __name__ == "__main__":
    main()
