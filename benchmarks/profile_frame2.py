"""Where do the non-trace ms of a frame sample go? raygen / film sum /
lax.map bookkeeping. Run: python benchmarks/profile_frame2.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.renderer import _render_batch, render_pixels
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H

def slope(name, body, args, r1=4, r2=16, reps=4):
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                out = body(s, *a)
                return c + jnp.sum(jnp.stack(
                    [jnp.sum(x.astype(jnp.float32))
                     for x in jax.tree.leaves(out)])) * 1e-20, None
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
    print(f"{name:36s} {dt*1e3:9.3f} ms", flush=True)
    return dt

def main():
    cfg = RenderConfig(width=W, height=H)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)

    def raygen(s, pid, base, cam):
        keys = rng.salted(rng.ray_keys(base, pid), s)
        jkey = rng.salted(keys, rng.PIXEL_JITTER)
        uv = rng.uniform(jkey, (2,))
        x = (pid % W).astype(jnp.float32)
        y = (pid // W).astype(jnp.float32)
        o, d = generate_rays(cam, (x+uv[:,0])/W, (y+uv[:,1])/H)
        t = rng.uniform(rng.salted(keys, rng.RAY_TIME))
        return o, d, t, keys
    slope("raygen+keys per sample", raygen, (pid, base, cam))

    def sample(s, scene, cam, pid, base):
        return _render_batch(scene, cam, cfg, W, H, pid, s, base)
    slope("one full sample (_render_batch)", sample,
          (scene, cam, pid, base))

    # whole frame via render_pixels (includes lax.map + film sum)
    def frame(s, scene, cam, pid, base):
        return jnp.sum(render_pixels(scene, cam, cfg, W, H, pid, 16,
                                     jax.random.fold_in(base, s)))
    t0 = time.perf_counter()
    jf = jax.jit(frame)
    v = float(jf(jnp.int32(0), scene, cam, pid, base))
    print(f"frame compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        v = float(jf(jnp.int32(1), scene, cam, pid, base))
        best = min(best, time.perf_counter() - t0)
    print(f"{'frame 16spp (render_pixels)':36s} {best*1e3:9.3f} ms "
          f"-> {N*16/best/1e6:.1f}M rays/s", flush=True)

if __name__ == "__main__":
    main()
