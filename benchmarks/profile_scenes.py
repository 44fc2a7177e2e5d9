"""Amortized per-sample forward cost across the baseline scenes.

Run: python benchmarks/profile_scenes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H


def slope(f, args, r1=2, r2=6, reps=3):
    def timed(r):
        jf = jax.jit(lambda s, *a: jax.lax.scan(
            lambda c, _: (jnp.sum(f(s, c, *a)) * 1e-20, None),
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
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)
    keys = jax.jit(rng.ray_keys)(base, pid)
    u = ((pid % W).astype(jnp.float32) + 0.5) / W
    v = ((pid // W).astype(jnp.float32) + 0.5) / H
    o, d = jax.jit(generate_rays)(cam, u, v)
    tm = jnp.zeros(N)

    names = ["setup_cornell_box", "setup_rt_in_a_weekend",
             "setup_random_spheres", "setup_single_sphere",
             "setup_backrooms_pool"]
    if os.environ.get("PROFILE_MESH", "0") == "1":
        names.append("setup_flamingo")
    print(f"N = {N} rays/sample, 6 bounces, device = {jax.devices()[0]}")
    for name in names:
        fn = getattr(zoo, name)
        sb = fn(W / H) if name == "setup_cornell_box" else fn()
        scene = compile_scene(sb)

        def body(scene, c, o, d, tm, keys):
            return integrator.trace(scene, cfg, o + c, d, tm, keys)[:, 0]

        dt = slope(body, (scene, o, d, tm, keys))
        print(f"{name:26s} {dt * 1e3:9.2f} ms/sample "
              f"({N / max(dt, 1e-9) / 1e6:7.2f} M rays/s) "
              f"[S={scene.n_spheres} Q={scene.n_quads} L={scene.n_lights} "
              f"T={scene.n_tris}]")


if __name__ == "__main__":
    main()
