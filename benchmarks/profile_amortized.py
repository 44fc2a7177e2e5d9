"""Honest per-component timing: each part runs R times inside ONE jit via
lax.scan with a data dependency (so XLA can't CSE or DCE the iterations),
and the per-iteration cost is the slope between R and 2R runs — the ~29 ms
axon-tunnel sync overhead cancels.

Run: python benchmarks/profile_amortized.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from tracer.core import rng
from tracer.core import vec3p as vp
from tracer.core.config import RenderConfig
from tracer.render import integrator, shading
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H
cfg = RenderConfig(width=W, height=H)
EPS = cfg.epsilon


def slope(fn_builder, scene, args, r1=4, r2=12, reps=3):
    """Build jit(scan fn r times), time r1 vs r2, return per-iter seconds."""
    def timed(r):
        f = fn_builder(r)
        v = float(f(scene, *args))  # compile + run
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            v = float(f(scene, *args))
            best = min(best, time.perf_counter() - t0)
        return best
    t1 = timed(r1)
    t2 = timed(r2)
    return (t2 - t1) / (r2 - r1)


def scan_wrap(body, r):
    """jit fn: carry a perturbation scalar through r iterations of body."""
    @jax.jit
    def f(scene, *args):
        def step(c, _):
            out = body(scene, c, *args)
            return jnp.sum(out) * 1e-20, None
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=r)
        return c
    return f


def main():
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)

    keys = jax.jit(rng.ray_keys)(base, pid)
    ko = jax.jit(lambda b, c, p: generate_rays(
        c, (p % W).astype(jnp.float32) / W,
        (p // W).astype(jnp.float32) / H))
    o, d = ko(base, cam, pid)
    tm = jnp.zeros(N)
    op_, dp_ = vp.splat(o), vp.splat(d)
    t_all, tri = jax.jit(
        lambda s, o, d, t: integrator._scene_candidates(s, o, d, t, EPS)
    )(scene, o, d, tm)
    j = jnp.argmin(t_all, axis=1)

    def part(name, body, args):
        dt = slope(lambda r: scan_wrap(body, r), scene, args)
        print(f"{name:34s} {dt * 1e3:9.3f} ms/iter "
              f"({N / max(dt, 1e-12) / 1e6:8.1f} M rays/s)")
        return dt

    # each body takes (scene, c, *args) and perturbs an input with c
    def b_cand(scene, c, o, d, tm):
        t_all, _ = integrator._scene_candidates(scene, o + c, d, tm, EPS)
        return jnp.min(t_all, axis=1)

    def b_argmin(scene, c, t_all):
        return jnp.argmin(t_all + c, axis=1).astype(jnp.float32)

    def b_gather(scene, c, o, d, tm, j):
        op, dp = vp.splat(o + c), vp.splat(d)
        h = integrator._gather_hit_p(scene, op, dp, vp.dot(dp, dp), tm, j,
                                     jnp.full((0, N), -1, jnp.int32), EPS)
        return h["p"][0] + h["diffuse"][0] + h["n"][0] + h["emission"][0]

    def b_scatter(scene, c, o, d, tm, j, keys):
        op, dp = vp.splat(o + c), vp.splat(d)
        n = (dp[0] * 0 + 1.0, dp[1] * 0, dp[2] * 0)
        mtype = jnp.zeros(N, jnp.int32)
        ior = jnp.ones(N, jnp.float32)
        o2, d2 = integrator._scatter_p(scene, cfg, dp, n, op, mtype, ior,
                                       keys)
        return o2[0] + d2[0]

    def b_rng_cube(scene, c, keys):
        v = rng.cube_unit_vector_p(keys ^ jnp.uint32(1))
        return v[0] + c

    def b_sky(scene, c, d):
        dp = vp.splat(d)
        s = shading.skybox_color_p(scene, (dp[0] + c, dp[1], dp[2]),
                                   jnp.full(N, 3.0), True)
        return s[0] + s[1] + s[2]

    def b_texture(scene, c, j, keys):
        u = rng.uniform(keys) + c
        v = rng.uniform(rng.salted(keys, 1))
        mid = jnp.clip(j, 0, scene.mat_diffuse.shape[0] - 1)
        base = vp.gather(vp.cols(scene.mat_diffuse), mid)
        out = shading.texture_color_p(scene, mid, u, v, base)
        return out[0] + out[1] + out[2]

    def b_bounce(scene, c, o, d, tm, keys):
        rad = integrator.trace(scene, cfg1b, o + c, d, tm, keys)
        return rad[:, 0]

    global cfg1b
    import dataclasses
    cfg1b = dataclasses.replace(cfg, max_bounces=1)

    def b_trace6(scene, c, o, d, tm, keys):
        rad = integrator.trace(scene, cfg, o + c, d, tm, keys)
        return rad[:, 0]

    print(f"N = {N} rays, device = {jax.devices()[0]}")
    part("candidates (8 sph + 16 quad)", b_cand, (o, d, tm))
    part("argmin [24,N]", b_argmin, (t_all,))
    part("gather_hit (detail+tex+nm)", b_gather, (o, d, tm, j))
    part("scatter (rng+reflect+refract)", b_scatter, (o, d, tm, j, keys))
    part("rng cube_unit_vector", b_rng_cube, (keys,))
    part("skybox", b_sky, (d,))
    part("texture_color", b_texture, (j, keys))
    part("1-bounce trace", b_bounce, (o, d, tm, keys))
    part("6-bounce trace", b_trace6, (o, d, tm, keys))


if __name__ == "__main__":
    main()
