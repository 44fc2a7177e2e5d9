"""Component-level timing of the Cornell forward path on the attached
accelerator: candidates / gather / lighting / scatter / RNG, to direct
optimization work. Run: python benchmarks/profile_parts.py

Every jitted function takes ALL device arrays as explicit arguments — a
closure-captured device array makes this environment's TPU runtime fall
back to synchronous dispatch for the rest of the process (one full
host<->device round trip per launch), which silently inflates every
subsequent measurement by ~25 ms.
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


def bench(name, fn, *args, reps=5):
    # block_until_ready is a NO-OP under the axon tunnel — the only honest
    # sync is fetching a value, so reduce to a scalar and float() it.
    jfn = jax.jit(lambda *a: jnp.sum(jnp.stack(
        [jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x)
         for x in jax.tree.leaves(fn(*a))])))
    v = float(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(jfn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    W, H = 850, 480
    N = W * H
    cfg = RenderConfig(width=W, height=H)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)

    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)

    def keys_only(base, pid):
        k = rng.ray_keys(base, pid)
        k = rng.salted(k, 3)
        u = rng.uniform(rng.salted(k, rng.PIXEL_JITTER), (2,))
        return u

    def raygen(base, cam, pid):
        k = rng.ray_keys(base, pid)
        uv = rng.uniform(rng.salted(k, rng.PIXEL_JITTER), (2,))
        x = (pid % W).astype(jnp.float32)
        y = (pid // W).astype(jnp.float32)
        o, d = generate_rays(cam, (x + uv[:, 0]) / W, (y + uv[:, 1]) / H)
        return o, d

    o, d = jax.jit(raygen)(base, cam, pid)
    tm = jnp.zeros(N)
    keys = jax.jit(rng.ray_keys)(base, pid)

    def candidates(scene, o, d, tm):
        return integrator._scene_candidates(scene, o, d, tm, 1e-5)[0]

    t_all = jax.jit(candidates)(scene, o, d, tm)
    j = jnp.argmin(t_all, axis=1)

    from tracer.core import vec3p as vp

    # the tri placeholder below is only valid for mesh-less scenes
    assert int(np.asarray(scene.mesh_mat).shape[0]) == 0, \
        "profiled scene must have no meshes (tri placeholder is 0-width)"

    def gather(scene, o, d, tm, j):
        tri = jnp.full((0, N), -1, jnp.int32)
        op, dp = vp.splat(o), vp.splat(d)
        return integrator._gather_hit_p(scene, op, dp, vp.dot(dp, dp), tm,
                                        j, tri, 1e-5)["p"]

    def scatter(scene, o, d, tm, j, keys):
        tri = jnp.full((0, N), -1, jnp.int32)
        op, dp = vp.splat(o), vp.splat(d)
        h = integrator._gather_hit_p(scene, op, dp, vp.dot(dp, dp), tm, j,
                                     tri, 1e-5)
        return integrator._scatter_p(scene, cfg, dp, h["n"], h["p"],
                                     h["mtype"], h["ior"], keys)[1]

    def full_trace(scene, o, d, tm, keys):
        return integrator.trace(scene, cfg, o, d, tm, keys)

    print(f"N = {N} rays, device = {jax.devices()[0]}")
    bench("rng keys+jitter", keys_only, base, pid)
    bench("raygen (keys + camera)", raygen, base, cam, pid)
    bench("candidates (sph+quad ts)", candidates, scene, o, d, tm)
    bench("gather_hit (detail+texture)", gather, scene, o, d, tm, j)
    bench("gather+scatter", scatter, scene, o, d, tm, j, keys)
    dt = bench("full trace (6 bounces)", full_trace, scene, o, d, tm, keys)
    print(f"-> {N / dt / 1e6:.2f} M primary rays/s (1 sample)")


if __name__ == "__main__":
    main()
