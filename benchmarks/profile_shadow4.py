"""Round-5: which piece of the fused mesh-scene bounce costs 120+ ms?
(profile_shadow3: one full bounce = 132 ms; walk 4.4 + shadow 0.8.)
Times first_hits, mesh_detail, shade_scatter and sub-combos for flamingo.
Run: python benchmarks/profile_shadow4.py [scene]"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
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
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "flamingo"
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    keys = jax.jit(rng.ray_keys)(jax.random.key(0), pid)
    u = ((pid % W).astype(jnp.float32) + 0.5) / W
    v = ((pid // W).astype(jnp.float32) + 0.5) / H
    o, d = jax.jit(generate_rays)(cam, u, v)
    tm = jnp.zeros(N)
    fn = zoo.BY_NAME[scene_name]
    scene = compile_scene(fn(W / H) if scene_name == "cornell_box" else fn())
    from tracer.kernels import intersect as kintersect
    from tracer.kernels import traverse as ktraverse
    active = jnp.ones(N, bool)

    def planar(salt, o):
        return (o[:, 0] + salt * 1e-9, o[:, 1], o[:, 2])

    def fh(salt, scene, o, d, tm):
        op, dp = planar(salt, o), planar(0, d)
        t_raw, tri_raw = ktraverse.mesh_closest_hits(scene, op, dp,
                                                     live=None)
        k1 = kintersect.first_hits(scene, op, dp, tm, t_raw.T, tri_raw.T,
                                   live=None, eps=cfg.epsilon)
        return k1["p"][0]

    slope("walk + first_hits kernel", fh, (scene, o, d, tm))

    def md(salt, scene, o, d):
        op, dp = planar(salt, o), planar(0, d)
        tid = jnp.zeros(N, jnp.int32)
        j = jnp.full(N, scene.sph_center.shape[0]
                     + scene.quad_v0.shape[0], jnp.int32)
        p_m, n_m, col_m, has_col = integrator._mesh_detail_p(
            scene, op, dp, j, tid)
        return p_m[0]

    slope("mesh_detail (gathers)", md, (scene, o, d))

    def full_nosort(salt, scene, o, d, tm, keys):
        cfg2 = RenderConfig(width=W, height=H, ray_sort="off")
        op = jnp.stack(planar(salt, o), -1)
        st = integrator._init_state(op, d, tm)
        st, _, _ = integrator._bounce_core(scene, cfg2, keys, st,
                                           jnp.int32(0))
        return st["acc"][0]

    slope("one bounce, ray_sort=off", full_nosort,
          (scene, o, d, tm, keys))

    def full_k1(salt, scene, o, d, tm, keys):
        cfg2 = RenderConfig(width=W, height=H, shadow_rays=1)
        op = jnp.stack(planar(salt, o), -1)
        st = integrator._init_state(op, d, tm)
        st, _, _ = integrator._bounce_core(scene, cfg2, keys, st,
                                           jnp.int32(0))
        return st["acc"][0]

    slope("one bounce, shadow_rays=1", full_k1,
          (scene, o, d, tm, keys))


if __name__ == "__main__":
    main()
