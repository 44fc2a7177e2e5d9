"""Round-5: incremental fused-bounce composition cost for a mesh scene —
the parts (walk 4.4 ms, shadow 0.8 ms) sum to ~37 ms/sample yet the full
flamingo trace costs ~980 ms. Compose the bounce piece by piece to find
the cliff. Run: python benchmarks/profile_shadow3.py [scene]"""
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

    def state0(salt, o, d, tm):
        op = (o[:, 0] + salt * 1e-9, o[:, 1], o[:, 2])
        dp = (d[:, 0], d[:, 1], d[:, 2])
        return integrator._init_state(
            jnp.stack(op, -1), jnp.stack(dp, -1), tm)

    def one_bounce(salt, scene, o, d, tm, keys):
        st = state0(salt, o, d, tm)
        st, occ, _ = integrator._bounce_core(scene, cfg, keys, st,
                                             jnp.int32(0))
        return st["acc"][0]

    slope("one full fused bounce (b=0)", one_bounce,
          (scene, o, d, tm, keys))

    for nb in (2, 3, 6):
        cfgn = RenderConfig(width=W, height=H, max_bounces=nb)

        def tr(salt, scene, o, d, tm, keys, cfgn=cfgn):
            o2 = o.at[:, 0].add(salt * 1e-9)
            return integrator.trace(scene, cfgn, o2, d, tm, keys)[:, 0]

        slope(f"trace max_bounces={nb}", tr, (scene, o, d, tm, keys))


if __name__ == "__main__":
    main()
