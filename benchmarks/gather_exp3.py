"""Gather scaling in N (does mega-batching samples amortize fixed cost?)
plus small-table threshold. Run: python benchmarks/gather_exp3.py"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

P = 1_242_977


def slope(f, args, r1=3, r2=9, reps=3):
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
    d3 = jnp.asarray(rng.random((P, 3), np.float32))

    def g(data, P_):
        def f(data, i, c):
            return data[jnp.clip(i + c.astype(jnp.int32), 0, P_ - 1)]
        return f

    print(f"device={jax.devices()[0]}")
    for n in (102_000, 408_000, 1_632_000, 6_528_000):
        idx = jnp.asarray(rng.integers(0, P, n).astype(np.int32))
        dt = slope(g(d3, P), (d3, idx))
        print(f"[P,3] idx[{n:>8d}]  {dt*1e3:8.3f} ms "
              f"({n/max(dt,1e-12)/1e6:7.1f} Mrows/s, "
              f"{dt/n*1e9:5.2f} ns/row)")
    for tp in (1024, 16384, 262144):
        dsmall = jnp.asarray(rng.random((tp, 3), np.float32))
        idx = jnp.asarray(rng.integers(0, tp, 408_000).astype(np.int32))
        dt = slope(g(dsmall, tp), (dsmall, idx))
        print(f"[{tp:>7d},3] idx[408000]  {dt*1e3:8.3f} ms "
              f"({408000/max(dt,1e-12)/1e6:7.1f} Mrows/s)")


if __name__ == "__main__":
    main()
