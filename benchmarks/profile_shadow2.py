"""Round-5 mesh-scene cost breakdown: time each bounce phase of flamingo /
raccoon / backrooms_pool in isolation — first-hit traverse (sorted and
unsorted), shadow kernel, mesh detail, shade glue — to find where the
~950 ms/sample actually goes (PERF.md attributed it to shadow walks; the
lowpoly flamingo stand-in mesh is only 832 tris, so that attribution needs
a re-measure). Run: python benchmarks/profile_shadow2.py [scene]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

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
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
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
    print(f"{scene_name}: S={scene.n_spheres} Q={scene.n_quads} "
          f"L={scene.n_lights} T={scene.n_tris} Nm={len(scene.mesh_root)} "
          f"nodes={scene.bvh_lo.shape[0]}")
    op = tuple(o[:, a] for a in range(3))
    dp = tuple(d[:, a] for a in range(3))
    active = jnp.ones(N, bool)

    from tracer.kernels import traverse as ktraverse

    def walk_salt(salt, scene_, op_, dp_, lv):
        o2 = (op_[0] + salt * 1e-9, op_[1], op_[2])
        t, _ = ktraverse.mesh_closest_hits(scene_, o2, dp_, live=lv)
        return t

    slope("first-hit walk (unsorted, primary rays)", walk_salt,
          (scene, op, dp, active))

    def sorted_walk(salt, scene_, op_, dp_, lv):
        o2 = (op_[0] + salt * 1e-9, op_[1], op_[2])
        t, _ = integrator._mesh_hits_sorted(scene_, o2, dp_, lv)
        return t

    slope("first-hit walk (sorted queue)", sorted_walk,
          (scene, op, dp, active))

    L = scene.light_pos.shape[0]
    if L > 0:
        from tracer.kernels import shadow as kshadow

        def shadows(salt, scene_, op_, tm_, keys_, lv):
            p2 = (op_[0] + salt * 1e-9, op_[1], op_[2])
            out = kshadow.shadow_factors(scene_, cfg, p2, tm_, keys_,
                                         cfg.epsilon, live=lv)
            return out[0]

        slope(f"shadow kernel (L={L}, K={cfg.shadow_rays})", shadows,
              (scene, op, tm, keys, active))

    # full bounce for scale
    def full(salt, scene_, o_, d_, tm_, keys_):
        return integrator.trace(scene_, cfg, o_ + salt * 1e-9, d_, tm_,
                                keys_)[:, 0]

    slope("full 6-bounce sample", full, (scene, o, d, tm, keys))


if __name__ == "__main__":
    main()
