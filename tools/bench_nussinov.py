"""Microbench: Nussinov/NW Pallas decode kernels + DD iteration cost.

The axon relay adds a fixed ~28 ms in-executable stall per dispatch, so all
kernels are timed via an in-executable fori_loop at two counts and the
marginal per-iteration cost is the slope — the number the DD while_loop
actually pays (dd.py runs the decodes inside one executable).

Run on the real TPU chip (axon).  Usage: python tools/bench_nussinov.py
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


def timeit(fn, reps=10, warm=2):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def slope_ms(make_fn, n1=20, n2=100):
    """Marginal per-iteration cost from an in-executable fori_loop.

    Timing forces a scalar READBACK: with the captured-constant bug fixed
    (round 5, ops/logspace.py) the relay is fully async and
    block_until_ready returns at enqueue."""
    f1, f2 = make_fn(n1), make_fn(n2)
    t1 = timeit(lambda: float(f1()))
    t2 = timeit(lambda: float(f2()))
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    from dafs_tpu.ops import nussinov, nussinov_pallas, nw, nw_pallas

    rng = np.random.default_rng(0)
    L = 320
    p = np.float32(rng.random((L, L)) * (rng.random((L, L)) < 0.05))
    p = np.triu(p, 3)
    sm = np.float32(4.0 * (p - np.float32(0.2)))
    smj = jnp.asarray(sm)
    l = jnp.int32(L - 7)

    def make_nus(n, B=1):
        smB = jnp.stack([smj] * B)
        lB = jnp.stack([l] * B)

        @jax.jit
        def run():
            def body(t, acc):
                s, ss = jax.vmap(
                    lambda a, b: nussinov_pallas.decode(a + acc * 0.0, b, L=L)
                )(smB, lB)
                return acc + jnp.sum(s)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    for B in (1, 2):
        ms = slope_ms(lambda n, B=B: make_nus(n, B))
        print(f"L={L} nussinov pallas B={B}: {ms:.3f} ms/iter ({ms/B:.3f}/decode)")

    def make_nus_lax(n):
        @jax.jit
        def run():
            def body(t, acc):
                s, ss = nussinov._decode_ldiag_impl(
                    nussinov._to_ldiag_dev(smj + acc * 0.0, L), l, L=L
                )
                return acc + s

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    print(f"L={L} nussinov lax.scan: {slope_ms(make_nus_lax):.3f} ms/iter")

    pz = np.float32(rng.random((L, L)) * (rng.random((L, L)) < 0.15))
    env = nw.envelope(pz, np.float32(0.01))
    smz = jnp.asarray(np.float32(pz - np.float32(0.01)))
    envf = jnp.asarray(env[:, 0].astype(np.int32))
    envl = jnp.asarray(env[:, 1].astype(np.int32))

    def make_nw(n):
        @jax.jit
        def run():
            def body(t, acc):
                s, al = nw_pallas.decode(
                    smz + acc * 0.0, envf, envl, jnp.int32(L), jnp.int32(L),
                    L1=L, L2=L,
                )
                return acc + s

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    print(f"L={L} nw pallas: {slope_ms(make_nw):.3f} ms/iter")


if __name__ == "__main__":
    main()
