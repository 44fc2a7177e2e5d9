"""Backward-pass cost split on Cornell: full grad vs no-texture grad vs
remat'd bounce body. Run: python benchmarks/profile_bwd.py"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from tracer.core.config import RenderConfig
from tracer.render.renderer import _render_batch
from tracer.render.camera import default_camera
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H
cfg = RenderConfig(width=W, height=H)


def slope(body, args, r1=2, r2=6, reps=3):
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


def no_tex(scene):
    return dataclasses.replace(
        scene, tex_data=jnp.zeros((1, 3), jnp.float32),
        tex_pack=jnp.zeros((1, 16), jnp.int32),
        nm_data=jnp.zeros((1, 3), jnp.float32),
        nm_pack=jnp.zeros((1, 16), jnp.int32),
        tex_off=jnp.zeros_like(scene.tex_off),
        tex_w=jnp.zeros_like(scene.tex_w), tex_h=jnp.zeros_like(scene.tex_h),
        nm_off=jnp.zeros_like(scene.nm_off),
        nm_w=jnp.zeros_like(scene.nm_w), nm_h=jnp.zeros_like(scene.nm_h))


def main():
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)

    def fwd(s_i, c, scene, cam, pid, base):
        return _render_batch(scene, cam, cfg, W, H, pid, s_i, base)[:, 0] + c

    def make_g(remat):
        def g(s_i, c, scene, cam, pid, base):
            def loss(diff, center):
                s2 = dataclasses.replace(scene, mat_diffuse=diff,
                                         sph_center=center)
                f = _render_batch
                if remat:
                    f = jax.checkpoint(f, static_argnums=(2, 3, 4))
                return jnp.mean(f(s2, cam, cfg, W, H, pid, s_i, base)) + c * 0
            gd, gc = jax.grad(loss, argnums=(0, 1))(scene.mat_diffuse,
                                                    scene.sph_center)
            return jnp.sum(gd) + jnp.sum(gc) + c
        return g

    print(f"N = {N}, device = {jax.devices()[0]}")
    for name, sc in (("full scene", scene), ("no textures", no_tex(scene))):
        dtf = slope(fwd, (sc, cam, pid, base))
        dtg = slope(make_g(False), (sc, cam, pid, base))
        print(f"{name:12s} fwd {dtf*1e3:7.2f} ms   fwd+bwd {dtg*1e3:7.2f} ms "
              f"(ratio {dtf/max(dtg,1e-9):.2f})")
    dtr = slope(make_g(True), (scene, cam, pid, base))
    print(f"full scene fwd+bwd REMAT {dtr*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
