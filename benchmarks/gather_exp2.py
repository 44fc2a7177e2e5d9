"""Gather micro-variants: find the per-row floor for atlas fetches.

Run: python benchmarks/gather_exp2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

N = 408_000
P = 1_242_977


def slope(f, args, r1=4, r2=12, reps=3):
    def timed(r):
        jf = jax.jit(lambda *a: jax.lax.scan(
            lambda c, _: (jnp.sum(f(*a, c)) * 1e-20, None),
            jnp.float32(0.0), None, length=r)[0])
        float(jf(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(r2) - timed(r1)) / (r2 - r1)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
    idx2 = jnp.asarray(rng.integers(0, P, 2 * N).astype(np.int32))
    idx_half = jnp.asarray(rng.integers(0, P, N // 2).astype(np.int32))
    d3 = jnp.asarray(rng.random((P, 3), np.float32))
    d4 = jnp.asarray(rng.random((P, 4), np.float32))
    d8 = jnp.asarray(rng.random((P, 8), np.float32))
    d6 = jnp.asarray(rng.random((P, 6), np.float32))
    d3s = jnp.asarray(rng.random((4096, 3), np.float32))
    d3u8 = jnp.asarray((rng.random((P, 3)) * 255).astype(np.uint8))
    idx_small = jnp.asarray(rng.integers(0, 4096, N).astype(np.int32))

    def g(data, P_):
        def f(data, i, c):
            return data[jnp.clip(i + c.astype(jnp.int32), 0, P_ - 1)]
        return f

    def g_nb(data, P_):
        def f(data, i, c):
            return jnp.take(data, i + (c.astype(jnp.int32) * 0),
                            axis=0, mode="promise_in_bounds")
        return f

    cases = [
        ("[P,3] idx[N]", g(d3, P), (d3, idx), N),
        ("[P,4] idx[N]", g(d4, P), (d4, idx), N),
        ("[P,6] idx[N]", g(d6, P), (d6, idx), N),
        ("[P,8] idx[N]", g(d8, P), (d8, idx), N),
        ("[P,3] idx[2N] (merged calls)", g(d3, P), (d3, idx2), 2 * N),
        ("[P,3] idx[N/2]", g(d3, P), (d3, idx_half), N // 2),
        ("[P,3] promise_in_bounds", g_nb(d3, P), (d3, idx), N),
        ("[4096,3] idx[N] small table", g(d3s, 4096), (d3s, idx_small), N),
        ("[P,3]u8 idx[N]", g(d3u8, P), (d3u8, idx), N),
    ]
    print(f"device={jax.devices()[0]}")
    for name, f, a, n_rows in cases:
        dt = slope(f, a)
        print(f"{name:32s} {dt*1e3:8.3f} ms  "
              f"({n_rows/max(dt,1e-12)/1e6:7.1f} Mrows/s)")


if __name__ == "__main__":
    main()
