"""Gather exp 6: narrow-row f32 blocked gather + one-hot select — can it
match the packed-u32 speed while staying exactly differentiable?

Run: python benchmarks/gather_exp6.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

P = 1_242_977
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
    flat = rng.random((P, 3), np.float32)
    idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
    print(f"device={jax.devices()[0]}, N={N}, P={P}")

    # f32 interleaved blocks: B texels (3B floats) per row, one-hot select
    for B, pad in ((4, 4), (5, 1), (8, 8), (10, 2)):
        rows = (P + B - 1) // B
        width = 3 * B + pad
        blk = np.zeros((rows, width), np.float32)
        blk[:, :3 * B].reshape(rows, B, 3)[:] = np.resize(flat, (rows, B, 3))
        blk = jnp.asarray(blk)

        def f(tab, idx, c, B=B, width=width):
            i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
            r = tab[i // B]                               # [N, width]
            oh = ((i % B)[:, None] ==
                  jnp.arange(B, dtype=jnp.int32)[None]).astype(jnp.float32)
            r3 = r[:, :3 * B].reshape(-1, B, 3)
            return jnp.sum(r3 * oh[:, :, None], axis=1)

        dt = slope(f, (blk, idx))
        print(f"f32 blocked B={B:2d} width={width:2d} "
              f"({width*4:3d}B rows={rows}) {dt*1e3:7.3f} ms")

    # u32-packed narrow rows for reference
    for B, width in ((8, 8), (16, 16)):
        rows = (P + B - 1) // B
        vals = rng.integers(0, 1 << 24, (rows, width)).astype(np.int32)
        tab = jnp.asarray(vals)

        def f(tab, idx, c, B=B):
            i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
            r = tab[i // B]
            oh = ((i % B)[:, None] ==
                  jnp.arange(B, dtype=jnp.int32)[None]).astype(jnp.int32)
            v = jnp.sum(r[:, :B] * oh, axis=1)
            r8 = jax.lax.shift_right_logical(v, 16) & 0xFF
            return r8.astype(jnp.float32)

        dt = slope(f, (tab, idx))
        print(f"u32 packed  B={B:2d} width={width:2d} "
              f"({width*4:3d}B rows={rows}) {dt*1e3:7.3f} ms")

    # gradient cost of the f32 blocked path (scatter in bwd)
    B = 5
    rows = (P + B - 1) // B
    width = 16
    blk = np.zeros((rows, width), np.float32)
    blk[:, :15].reshape(rows, B, 3)[:] = np.resize(flat, (rows, B, 3))
    blk = jnp.asarray(blk)

    def loss(tab, idx, c):
        i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
        r = tab[i // B]
        oh = ((i % B)[:, None] ==
              jnp.arange(B, dtype=jnp.int32)[None]).astype(jnp.float32)
        r3 = r[:, :15].reshape(-1, B, 3)
        return jnp.sum(jnp.sum(r3 * oh[:, :, None], axis=1))

    def g(tab, idx, c):
        return jax.grad(loss)(tab, idx, c)

    dt = slope(g, (blk, idx))
    print(f"f32 blocked B=5 GRAD (scatter bwd)      {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
