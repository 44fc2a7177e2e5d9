"""HONEST amortized profiling: every scan iteration uses a different RNG
sub-stream (salted by the iteration index), so gather indices / ray paths
change per iteration exactly like real spp — no warm-row flattery.

(The first amortized harness perturbed inputs by ~1e-15, which never flips
a texel index; it measured warm-HBM gathers 3-4x faster than a real frame.)

Run: python benchmarks/profile_honest.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.renderer import _render_batch
from tracer.render.camera import default_camera
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H
cfg = RenderConfig(width=W, height=H)


def slope(body, args, r1=2, r2=8, reps=3):
    """body(s, c, *args) -> array; s = iteration index (vary RNG with it)."""
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                return jnp.sum(body(s, c, *a)) * 1e-20, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(r, dtype=jnp.int32))
            return c
        float(jf(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(r2) - timed(r1)) / (r2 - r1)


def main():
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)

    def part(name, body, args):
        dt = slope(body, args)
        print(f"{name:36s} {dt * 1e3:9.2f} ms/iter "
              f"({N / max(dt, 1e-9) / 1e6:8.2f} M rays/s)")
        return dt

    # full per-sample product path (raygen + 6-bounce trace)
    def b_sample(s, c, scene, cam, pid, base):
        return _render_batch(scene, cam, cfg, W, H, pid, s, base)[:, 0] + c

    # texture atlas row-gather with genuinely fresh indices per iteration
    def b_tex_row(s, c, scene, pid, base):
        k = rng.salted(rng.ray_keys(base, pid), s)
        u = rng.uniform(k)
        v = rng.uniform(rng.salted(k, 1))
        P = scene.tex_data.shape[0]
        idx = (u * (P - 1)).astype(jnp.int32) + (v * 0).astype(jnp.int32)
        out = scene.tex_data[idx]
        return out[:, 0] + c

    # same but planar 3-column gather
    def b_tex_planar(s, c, scene, pid, base):
        k = rng.salted(rng.ray_keys(base, pid), s)
        u = rng.uniform(k)
        P = scene.tex_data.shape[0]
        idx = (u * (P - 1)).astype(jnp.int32)
        return (scene.tex_data[:, 0][idx] + scene.tex_data[:, 1][idx]
                + scene.tex_data[:, 2][idx] + c)

    # nm-atlas row gather (fresh indices)
    def b_nm_row(s, c, scene, pid, base):
        k = rng.salted(rng.ray_keys(base, pid), s)
        u = rng.uniform(k)
        P = scene.nm_data.shape[0]
        idx = (u * (P - 1)).astype(jnp.int32)
        return scene.nm_data[idx][:, 0] + c

    # per-sample cost with textures statically removed
    notex = dataclasses.replace(
        scene,
        tex_data=jnp.zeros((1, 3), jnp.float32),
        nm_data=jnp.zeros((1, 3), jnp.float32),
        tex_off=jnp.zeros_like(scene.tex_off),
        tex_w=jnp.zeros_like(scene.tex_w), tex_h=jnp.zeros_like(scene.tex_h),
        nm_off=jnp.zeros_like(scene.nm_off),
        nm_w=jnp.zeros_like(scene.nm_w), nm_h=jnp.zeros_like(scene.nm_h))

    print(f"N = {N}, device = {jax.devices()[0]}")
    part("product sample (6b, tex+nm)", b_sample, (scene, cam, pid, base))
    part("product sample (6b, NO textures)", b_sample,
         (notex, cam, pid, base))
    part("tex row gather (fresh idx)", b_tex_row, (scene, pid, base))
    part("tex planar3 gather (fresh idx)", b_tex_planar, (scene, pid, base))
    part("nm row gather (fresh idx)", b_nm_row, (scene, pid, base))


if __name__ == "__main__":
    main()
