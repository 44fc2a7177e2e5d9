"""Gather experiments, round 5: block-packed atlas fetch.

Hypothesis (from exp3/exp4): XLA TPU row-gather cost/row falls steeply with
table ROW COUNT (1.9 ns @16K rows vs 6.9 ns @1.24M rows), independent of
row width or total bytes. So pack B texels per row: gather row idx>>lg(B)
(table rows P/B), then select texel idx&(B-1) in-register.

Run: python benchmarks/gather_exp5.py
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

    def base(d3, idx, c):
        return d3[jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)]

    dt = slope(base, (jnp.asarray(flat), idx))
    print(f"baseline [P,3] row gather      {dt*1e3:7.3f} ms")

    for B in (4, 8, 16, 32, 64):
        rows = (P + B - 1) // B
        blk = np.zeros((rows * B, 3), np.float32)
        blk[:P] = flat
        blk = jnp.asarray(blk.reshape(rows, B * 3))

        def f_blocked(tab, idx, c, B=B, rows=rows):
            i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
            r = tab[i // B]                       # [N, B*3]
            s = i % B
            r3 = r.reshape(-1, B, 3)
            out = jnp.take_along_axis(r3, s[:, None, None], axis=1)
            return out[:, 0, :]

        dt = slope(f_blocked, (blk, idx))
        print(f"blocked B={B:3d} rows={rows:>7d} f32  {dt*1e3:7.3f} ms")

    # one-hot select instead of take_along_axis (in case TAA lowers badly)
    for B in (8, 16, 32):
        rows = (P + B - 1) // B
        blk = np.zeros((rows * B, 3), np.float32)
        blk[:P] = flat
        blk = jnp.asarray(blk.reshape(rows, B * 3))

        def f_onehot(tab, idx, c, B=B):
            i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
            r = tab[i // B].reshape(-1, B, 3)
            oh = (i % B)[:, None] == jnp.arange(B, dtype=jnp.int32)[None]
            return jnp.sum(r * oh[:, :, None].astype(jnp.float32), axis=1)

        dt = slope(f_onehot, (blk, idx))
        print(f"blocked B={B:3d} onehot-select f32  {dt*1e3:7.3f} ms")

    # u32-packed texels (4B each): B texels/row as int32 columns
    for B in (16, 32, 64, 128):
        rows = (P + B - 1) // B
        vals = (rng.integers(0, 1 << 24, rows * B)).astype(np.int32)
        blk = jnp.asarray(vals.reshape(rows, B))

        def f_packed(tab, idx, c, B=B):
            i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
            r = tab[i // B]                        # [N, B] i32
            oh = ((i % B)[:, None] ==
                  jnp.arange(B, dtype=jnp.int32)[None]).astype(jnp.int32)
            v = jnp.sum(r * oh, axis=1)            # exact: one nonzero
            # decode 3 channels u8 -> f32/255
            r8 = jax.lax.shift_right_logical(v, 16) & 0xFF
            g8 = jax.lax.shift_right_logical(v, 8) & 0xFF
            b8 = v & 0xFF
            return jnp.stack([r8, g8, b8], -1).astype(jnp.float32) / 255.0

        dt = slope(f_packed, (blk, idx))
        print(f"packed-u32 B={B:3d} rows={rows:>6d}   {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
