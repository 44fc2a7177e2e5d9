"""Decompose the fwd+bwd cost on Cornell: record forward, replay forward,
replay backward (all args-passed, amortized in-scan).
Run: python benchmarks/profile_bwd3.py"""
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
from tracer.kernels import common as kc

W, H = 850, 480
N = kc.pad_rows(W * H)


def slope(name, body, args, r1=4, r2=16, reps=3):
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                out = body(s, *a)
                return c + sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree.leaves(out)) * 1e-20, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(r, dtype=jnp.int32))
            return c
        float(jf(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); float(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (timed(r2) - timed(r1)) / (r2 - r1)
    print(f"{name:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    cfg = RenderConfig(width=W, height=H)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32) % (W * H)
    base = jax.random.key(0)

    def rays(pid, base, cam, s):
        keys = rng.salted(rng.ray_keys(base, pid), s)
        uv = rng.uniform(rng.salted(keys, rng.PIXEL_JITTER), (2,))
        x = (pid % W).astype(jnp.float32)
        y = (pid // W).astype(jnp.float32)
        o, d = generate_rays(cam, (x + uv[:, 0]) / W, (y + uv[:, 1]) / H)
        return o, d, keys
    o, d, keys = jax.jit(lambda *a: rays(*a, jnp.int32(0)))(pid, base, cam)
    tm = jnp.zeros(N)

    def record(s, sc, o, d, tm, keys):
        ks = rng.salted(keys, s)
        return integrator._trace_record(sc, cfg, o, d, tm, ks)
    slope("record forward", record, (scene, o, d, tm, keys))
    _, rec = jax.jit(lambda *a: record(jnp.int32(0), *a))(
        scene, o, d, tm, keys)

    def replay_fwd(s, sc, o, d, tm, keys, rec):
        ks = rng.salted(keys, s * 0)  # keys must match the record
        return integrator._trace_replay(
            sc, cfg, o + s.astype(jnp.float32) * 0, d, tm, ks, rec)
    slope("replay forward", replay_fwd, (scene, o, d, tm, keys, rec))

    def replay_vjp(s, sc, o, d, tm, keys, rec):
        texvals0, skel = integrator._rec_split_tex(rec)

        def f(sc, o, d, tm, texvals):
            return integrator._trace_replay(
                sc, cfg, o, d, tm, keys, integrator._rec_join_tex(
                    skel, texvals))
        out, vjp = jax.vjp(f, sc, o + s.astype(jnp.float32) * 0, d, tm,
                           texvals0)
        gs = vjp(jnp.ones_like(out))
        return (gs[0].mat_diffuse, gs[0].sph_center, gs[0].tex_data)
    slope("replay fwd+bwd (vjp)", replay_vjp,
          (scene, o, d, tm, keys, rec))

    def full_grad(s, sc, o, d, tm, keys):
        ks = rng.salted(keys, s)

        def loss(diff, center, tex):
            s2 = dataclasses.replace(sc, mat_diffuse=diff,
                                     sph_center=center, tex_data=tex)
            c2 = dataclasses.replace(cfg, packed_atlas="off")
            out = integrator.trace(s2, c2, o, d, tm, ks)
            return jnp.mean(out)
        return jax.grad(loss, argnums=(0, 1, 2))(
            sc.mat_diffuse, sc.sph_center, sc.tex_data)
    slope("full grad (record+replay bwd, atlas off)",
          full_grad, (scene, o, d, tm, keys))

    def full_grad_packed(s, sc, o, d, tm, keys):
        ks = rng.salted(keys, s)

        def loss(diff, center):
            s2 = dataclasses.replace(sc, mat_diffuse=diff,
                                     sph_center=center)
            out = integrator.trace(s2, cfg, o, d, tm, ks)
            return jnp.mean(out)
        return jax.grad(loss, argnums=(0, 1))(
            sc.mat_diffuse, sc.sph_center)
    slope("full grad (packed fwd, diff+center)",
          full_grad_packed, (scene, o, d, tm, keys))


if __name__ == "__main__":
    main()
