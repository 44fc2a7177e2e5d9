"""Dead-tile granularity experiment (VERDICT r4 item 2): product-sample
throughput on the few-%-occupancy scenes at different kernel tile sizes.
Run: python benchmarks/profile_occupancy.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

W, H = 850, 480


def slope(name, body, args, r1=2, r2=8, reps=3):
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
    print(f"{name:52s} {dt*1e3:9.3f} ms "
          f"({W*H/dt/1e6:7.1f} M rays/s)", flush=True)
    return dt


def main():
    from tracer.core import rng
    from tracer.core.config import RenderConfig
    from tracer.kernels import common as kc
    from tracer.render.renderer import _render_batch
    from tracer.render.camera import default_camera
    from tracer.scene.device import compile_scene
    from tracer.scenes import zoo

    cfg = RenderConfig(width=W, height=H)
    base = jax.random.key(0)

    for scene_name in ("backrooms_pool", "rt_in_a_weekend",
                       "cornell_box"):
        fn = zoo.BY_NAME[scene_name]
        sb = fn(W / H) if scene_name == "cornell_box" else fn()
        scene = compile_scene(sb)
        cam = default_camera(aspect=W / H)
        for tr in (128, 32, 8):
            kc.TILE_ROWS = tr
            N = kc.pad_rows(W * H, tr)
            pid = jnp.arange(N, dtype=jnp.int32) % (W * H)

            def sample(s, sc, cam, pid, base):
                return _render_batch(sc, cam, cfg, W, H, pid, s, base)
            slope(f"{scene_name:18s} TILE_ROWS={tr:3d}", sample,
                  (scene, cam, pid, base))
        kc.TILE_ROWS = 128


if __name__ == "__main__":
    main()
