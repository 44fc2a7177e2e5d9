"""Gather exp 7: cost breakdown of the PRODUCTION packed fetch
(shading.atlas_fetch_rows_p with pack=) vs its parts.

Run: python benchmarks/gather_exp7.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from tracer.render import shading
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

N = 408_000


def slope(f, args, r1=3, r2=9, reps=3):
    def timed(r):
        jf = jax.jit(lambda *a: jax.lax.scan(
            lambda c, _: (jnp.sum(sum(jax.tree.leaves(f(*a, c)))) * 1e-20,
                          None),
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
    scene = compile_scene(zoo.setup_cornell_box(850 / 480))
    rng = np.random.default_rng(0)
    P = scene.tex_data.shape[0]
    idx = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
    u = jnp.asarray(rng.random(N, np.float32))
    v = jnp.asarray(rng.random(N, np.float32))
    print(f"device={jax.devices()[0]}, N={N}, P={P}")

    def decode_only(pack, idx, c):
        return shading._packed_decode(pack, idx + (c * 0).astype(jnp.int32))

    dt = slope(decode_only, (scene.tex_pack, idx))
    print(f"_packed_decode (gather+select)    {dt*1e3:7.3f} ms")

    def gather_only(pack, idx, c):
        return pack[(idx + (c * 0).astype(jnp.int32)) // 16]

    dt = slope(gather_only, (scene.tex_pack, idx))
    print(f"row gather only [N,16]            {dt*1e3:7.3f} ms")

    def full_fetch(data, pack, u, v, c):
        off = jnp.zeros(N, jnp.int32)
        W = jnp.full(N, 1024, jnp.int32)
        H = jnp.full(N, 1024, jnp.int32)
        (r, g, b), pres = shading.atlas_fetch_rows_p(
            data, off, W, H, u + c * 0, v, jnp.float32(2.0),
            jnp.float32(2.0), pack=pack)
        return r, g, b

    dt = slope(full_fetch, (scene.tex_data, scene.tex_pack, u, v))
    print(f"atlas_fetch_rows_p (packed)       {dt*1e3:7.3f} ms")

    def full_fetch_row(data, u, v, c):
        off = jnp.zeros(N, jnp.int32)
        W = jnp.full(N, 1024, jnp.int32)
        H = jnp.full(N, 1024, jnp.int32)
        (r, g, b), pres = shading.atlas_fetch_rows_p(
            data, off, W, H, u + c * 0, v, jnp.float32(2.0),
            jnp.float32(2.0))
        return r, g, b

    dt = slope(full_fetch_row, (scene.tex_data, u, v))
    print(f"atlas_fetch_rows_p (row path)     {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
