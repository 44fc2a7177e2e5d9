"""Gather experiments, round 4: what actually moves the atlas-fetch needle.

1. sorted/coherent vs random indices (HBM locality)
2. two independent gathers vs one fused double-length gather (op overhead
   vs per-row cost)
3. narrow-int (u32-packed texel) element gather vs [P,3] f32 row gather
4. index-windowing: restrict each gather to a contiguous slice of the
   atlas (per-texture windows) — does a smaller addressed range help?

Run: python benchmarks/gather_exp4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

P = 1_242_977
P2 = 1_572_865
N = 408_000


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
    d3b = jnp.asarray(rng.random((P2, 3), np.float32))
    du = jnp.asarray(rng.integers(0, 1 << 31, P).astype(np.int32))

    idx_r = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
    idx_r2 = jnp.asarray(rng.integers(0, P2, N).astype(np.int32))
    idx_s = jnp.sort(idx_r)
    # "coherent": consecutive rays hit consecutive texels with small jitter
    base = np.repeat(np.arange(N // 8) * 8 % P, 8)
    idx_c = jnp.asarray(((base + rng.integers(0, 4, N)) % P).astype(np.int32))

    def g_row(data, idx, c):
        return data[jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)]

    def g_two(a, b, ia, ib, c):
        cc = c.astype(jnp.int32)
        return (a[jnp.clip(ia + cc, 0, P - 1)]
                + b[jnp.clip(ib + cc, 0, P2 - 1)])

    def g_fused(ab, ia, ib, c):
        cc = c.astype(jnp.int32)
        i2 = jnp.concatenate([jnp.clip(ia + cc, 0, P - 1),
                              jnp.clip(ib + cc, 0, P2 - 1) + P])
        return ab[i2]

    def g_u32(data, idx, c):
        return data[jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)]

    print(f"device={jax.devices()[0]}, N={N}")
    for name, idx in (("random", idx_r), ("sorted", idx_s),
                      ("coherent", idx_c)):
        dt = slope(g_row, (d3, idx))
        print(f"row [P,3] {name:9s} {dt*1e3:7.3f} ms ({dt/N*1e9:5.2f} ns/row)")

    dt2 = slope(g_two, (d3, d3b, idx_r, idx_r2))
    print(f"two gathers (P + P2)        {dt2*1e3:7.3f} ms")
    ab = jnp.concatenate([d3, d3b], axis=0)
    dtf = slope(g_fused, (ab, idx_r, idx_r2))
    print(f"one fused 2N gather         {dtf*1e3:7.3f} ms")

    dtu = slope(g_u32, (du, idx_r))
    print(f"u32 element gather          {dtu*1e3:7.3f} ms ({dtu/N*1e9:5.2f} ns)")

    # windowed: same N but indices confined to a 64K-row window
    idx_w = jnp.asarray(rng.integers(0, 65536, N).astype(np.int32))
    dtw = slope(g_row, (d3, idx_w))
    print(f"row gather, 64K-row window  {dtw*1e3:7.3f} ms ({dtw/N*1e9:5.2f} ns)")
    idx_w2 = jnp.asarray(rng.integers(0, 4096, N).astype(np.int32))
    dtw2 = slope(g_row, (d3, idx_w2))
    print(f"row gather, 4K-row window   {dtw2*1e3:7.3f} ms ({dtw2/N*1e9:5.2f} ns)")


if __name__ == "__main__":
    main()
