"""Round-5: decompose the hand-written-backward protocol time.

Pieces: plain forward, record forward (with states), full fwd+bwd without
texel grads, full protocol (with tex_data), and the fold alone — all
amortized on the real chip. Run: python benchmarks/profile_bwd4.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import dataclasses
import jax, jax.numpy as jnp

from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H


def slope(name, f, args, r1=2, r2=6, reps=3):
    def timed(r):
        jf = jax.jit(lambda *a: jax.lax.scan(
            lambda c, s: (c + jnp.sum(f(s, *a)) * 1e-20, None),
            jnp.float32(0.0), jnp.arange(r, dtype=jnp.int32))[0])
        float(jf(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); float(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (timed(r2) - timed(r1)) / (r2 - r1)
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    keys = jax.jit(rng.ray_keys)(jax.random.key(0), pid)
    u = ((pid % W).astype(jnp.float32) + 0.5) / W
    v = ((pid // W).astype(jnp.float32) + 0.5) / H
    o, d = jax.jit(generate_rays)(cam, u, v)
    tm = jnp.zeros(N)
    scene = compile_scene(zoo.setup_cornell_box(W / H))

    def fwd(salt, scene, o, d, tm, keys):
        return integrator.trace(scene, cfg, o + salt * 1e-9, d, tm,
                                keys)[:, 0]

    slope("plain forward (1 sample)", fwd, (scene, o, d, tm, keys))

    def fwd_rec(salt, scene, o, d, tm, keys):
        out, rec, st = integrator._trace_record(
            scene, cfg, o + salt * 1e-9, d, tm, keys, with_states=True)
        return out[:, 0]

    slope("record forward (with states)", fwd_rec,
          (scene, o, d, tm, keys))

    def fb_nt(salt, diff, scene, o, d, tm, keys):
        def loss(diff):
            s2 = dataclasses.replace(scene, mat_diffuse=diff + salt * 1e-9)
            return jnp.sum(integrator.trace(s2, cfg, o, d, tm, keys))
        return jax.grad(loss)(diff)

    slope("fwd+bwd (mat_diffuse only)", fb_nt,
          (scene.mat_diffuse, scene, o, d, tm, keys))

    def fb_tex(salt, diff, tex, scene, o, d, tm, keys):
        def loss(diff, tex):
            s2 = dataclasses.replace(scene, mat_diffuse=diff + salt * 1e-9,
                                     tex_data=tex)
            return jnp.sum(integrator.trace(s2, cfg, o, d, tm, keys))
        g1, g2 = jax.grad(loss, argnums=(0, 1))(diff, tex)
        # consume BOTH grads or XLA dead-code-eliminates the texel fold
        return jnp.stack([jnp.sum(g1), jnp.sum(g2)])

    slope("fwd+bwd (+tex_data protocol)", fb_tex,
          (scene.mat_diffuse, scene.tex_data, scene, o, d, tm, keys))


if __name__ == "__main__":
    main()
