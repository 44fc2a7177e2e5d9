"""Why is render_pixels slower than 16x trace? Isolate the frame structure.

Run: python benchmarks/profile_frame.py
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
from tracer.render.renderer import _render_batch
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H
SPP = 16


def timeit(jf, args, reps=3):
    v = float(jf(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        v = float(jf(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = RenderConfig(width=W, height=H, nsamples=SPP)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)

    u = ((pid % W).astype(jnp.float32) + 0.5) / W
    v = ((pid // W).astype(jnp.float32) + 0.5) / H
    o, d = jax.jit(generate_rays)(cam, u, v)
    tm = jnp.zeros(N)
    keys = jax.jit(rng.ray_keys)(base, pid)

    # A: 16x trace via lax.map over a dummy sample axis (same rays)
    def frame_traces(scene, o, d, tm, keys):
        def one(s):
            return integrator.trace(scene, cfg, o, d,
                                    tm + s.astype(jnp.float32) * 0, keys)
        rad = jax.lax.map(one, jnp.arange(SPP, dtype=jnp.int32))
        return jnp.mean(rad)

    # B: product path body (raygen + trace per sample)
    def frame_product(scene, cam, pid, base):
        def one(s):
            return _render_batch(scene, cam, cfg, W, H, pid, s, base)
        rad = jax.lax.map(one, jnp.arange(SPP, dtype=jnp.int32))
        return jnp.mean(rad)

    # C: single render_batch (1 sample, raygen included)
    def one_batch(scene, cam, pid, base):
        return jnp.mean(_render_batch(scene, cam, cfg, W, H, pid,
                                      jnp.int32(0), base))

    # D: product body unrolled x2 only (map overhead probe)
    def frame_product2(scene, cam, pid, base):
        def one(s):
            return _render_batch(scene, cam, cfg, W, H, pid, s, base)
        rad = jax.lax.map(one, jnp.arange(2, dtype=jnp.int32))
        return jnp.mean(rad)

    print(f"device={jax.devices()[0]}  N={N} spp={SPP}")
    dt = timeit(jax.jit(frame_traces), (scene, o, d, tm, keys))
    print(f"A 16x trace lax.map      {dt*1e3:9.1f} ms "
          f"({N*SPP/dt/1e6:6.1f} M rays/s)")
    dt = timeit(jax.jit(frame_product), (scene, cam, pid, base))
    print(f"B product frame          {dt*1e3:9.1f} ms "
          f"({N*SPP/dt/1e6:6.1f} M rays/s)")
    dt = timeit(jax.jit(one_batch), (scene, cam, pid, base))
    print(f"C 1-sample render_batch  {dt*1e3:9.1f} ms "
          f"({N/dt/1e6:6.1f} M rays/s)")
    dt = timeit(jax.jit(frame_product2), (scene, cam, pid, base))
    print(f"D 2-sample product       {dt*1e3:9.1f} ms "
          f"({N*2/dt/1e6:6.1f} M rays/s)")


if __name__ == "__main__":
    main()
