"""Backward bisection: grad cost vs bounce depth and per-stage, on the
no-texture Cornell (the texture scatter is measured separately).
Run: python benchmarks/profile_bwd2.py"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from tracer.core import rng, vec3p as vp
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H


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
    scene = no_tex(compile_scene(zoo.setup_cornell_box(W / H)))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)
    print(f"N = {N}, device = {jax.devices()[0]}")

    def rays(s_i, pid, base, cam):
        keys = rng.salted(rng.ray_keys(base, pid), s_i)
        jit_uv = rng.uniform(rng.salted(keys, rng.PIXEL_JITTER), (2,))
        x = (pid % W).astype(jnp.float32)
        y = (pid // W).astype(jnp.float32)
        o, d = generate_rays(cam, (x + jit_uv[:, 0]) / W,
                             (y + jit_uv[:, 1]) / H)
        return o, d, keys

    for b in (1, 2, 4, 6):
        cfg = RenderConfig(width=W, height=H, max_bounces=b)

        def fwd(s_i, c, scene, cam, pid, base, cfg=cfg):
            o, d, keys = rays(s_i, pid, base, cam)
            return integrator.trace(scene, cfg, o, d,
                                    jnp.zeros(N) + c * 0, keys)[:, 0]

        def g(s_i, c, scene, cam, pid, base, cfg=cfg):
            def loss(diff, center):
                s2 = dataclasses.replace(scene, mat_diffuse=diff,
                                         sph_center=center)
                o, d, keys = rays(s_i, pid, base, cam)
                return jnp.mean(integrator.trace(
                    s2, cfg, o, d, jnp.zeros(N) + c * 0, keys))
            gd, gc = jax.grad(loss, argnums=(0, 1))(scene.mat_diffuse,
                                                    scene.sph_center)
            return jnp.sum(gd) + jnp.sum(gc) + c
        dtf = slope(fwd, (scene, cam, pid, base))
        dtg = slope(g, (scene, cam, pid, base))
        print(f"bounces={b}  fwd {dtf*1e3:7.2f} ms  fwd+bwd {dtg*1e3:7.2f} "
              f"ms  bwd/fwd {(dtg-dtf)/dtf:5.1f}x")

    # stage-level: gather_hit alone under grad (b-independent)
    cfg = RenderConfig(width=W, height=H)

    def stage_gather(s_i, c, scene, cam, pid, base):
        def loss(diff, center):
            s2 = dataclasses.replace(scene, mat_diffuse=diff,
                                     sph_center=center)
            o, d, keys = rays(s_i, pid, base, cam)
            op, dp = vp.splat(o), vp.splat(d)
            a2 = vp.dot(dp, dp)
            t_all, tri = integrator._scene_candidates_p(
                s2, op, dp, a2, jnp.zeros(N), 1e-5)
            j = jnp.argmin(t_all, axis=0)
            h = integrator._gather_hit_p(s2, op, dp, a2, jnp.zeros(N), j,
                                         tri, 1e-5)
            return jnp.mean(h["p"][0] + h["diffuse"][0] + h["n"][1]) + c * 0
        gd, gc = jax.grad(loss, argnums=(0, 1))(scene.mat_diffuse,
                                                scene.sph_center)
        return jnp.sum(gd) + jnp.sum(gc) + c

    dt = slope(stage_gather, (scene, cam, pid, base))
    print(f"grad(candidates+gather_hit) once   {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
