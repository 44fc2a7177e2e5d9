"""Atlas-gather strategy shootout (the measured bottleneck: a random
[N]-index gather from the [P,3] texture atlas costs ~11 ms at N=408K,
P=1.24M — ~70% of the whole Cornell bounce loop).

Strategies:
  s0  data[idx]            — baseline ([P,3] fancy index)
  s1  planar 3x data[idx]  — three [P] gathers
  s2  two-level 128        — row-gather [P/128,128] + take_along_axis
  s3  two-level 8          — row-gather [P/8,8] + take_along_axis
  s4  two-level 16/32/64   — sweep row width
  s5  sorted idx           — baseline with coherent (sorted) indices

Run: python benchmarks/gather_exp.py
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
        v = float(jf(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            v = float(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(r2) - timed(r1)) / (r2 - r1)


def main():
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, P, N).astype(np.int32)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np))
    data = jnp.asarray(rng.random((P, 3), np.float32))

    def s0(data, idx, c):
        return data[jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)]

    def s1(data, idx, c):
        i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
        return data[:, 0][i] + data[:, 1][i] + data[:, 2][i]

    def make_two_level(width):
        rows = (P + width - 1) // width
        pad = rows * width - P

        def s(data, idx, c):
            i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
            q, r = i // width, i % width
            out = []
            for ch in range(3):
                plane = jnp.pad(data[:, ch], (0, pad)).reshape(rows, width)
                block = plane[q]                        # [N, width]
                out.append(jnp.take_along_axis(block, r[:, None],
                                               axis=1)[:, 0])
            return out[0] + out[1] + out[2]
        return s

    def s_onegather(data, idx, c):
        # single [N,3] row gather but via dynamic_slice-free lax.gather
        i = jnp.clip(idx + c.astype(jnp.int32), 0, P - 1)
        return jnp.take(data, i, axis=0)

    print(f"N={N} P={P} device={jax.devices()[0]}")
    for name, f, a in [
        ("s0 data[idx] random", s0, (data, idx)),
        ("s0 data[idx] sorted", s0, (data, idx_sorted)),
        ("s1 planar3 random", s1, (data, idx)),
        ("s2 two-level w=128", make_two_level(128), (data, idx)),
        ("s3 two-level w=8", make_two_level(8), (data, idx)),
        ("s4 two-level w=32", make_two_level(32), (data, idx)),
        ("s5 jnp.take axis0", s_onegather, (data, idx)),
    ]:
        dt = slope(f, a)
        print(f"{name:24s} {dt*1e3:8.3f} ms  ({N/max(dt,1e-12)/1e6:7.1f} M/s)")


if __name__ == "__main__":
    main()
