"""Amortized (in-jit scan) timing of fwd and grad paths on Cornell b6 —
robust to this tunnel's ~26 ms dispatch jitter. Run: python benchmarks/profile_cv2.py"""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, numpy as np, jax.numpy as jnp
from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H

def slope(name, body, args, r1=2, r2=6, reps=3):
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
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return dt

def main():
    cfg = RenderConfig(width=W, height=H)
    cfg_ad = dataclasses.replace(cfg, custom_vjp="off")
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)

    def rays(s, pid, base, cam):
        keys = rng.salted(rng.ray_keys(base, pid), s)
        uv = rng.uniform(rng.salted(keys, rng.PIXEL_JITTER), (2,))
        x = (pid % W).astype(jnp.float32); y = (pid // W).astype(jnp.float32)
        o, d = generate_rays(cam, (x+uv[:,0])/W, (y+uv[:,1])/H)
        return o, d, keys

    def fwd(s, scene, cam, pid, base, cfgx=cfg):
        o, d, keys = rays(s, pid, base, cam)
        return integrator.trace(scene, cfgx, o, d, jnp.zeros(N), keys)
    slope("fwd (trace, kernels on)", fwd, (scene, cam, pid, base))

    def g(s, scene, cam, pid, base, cfgx=cfg):
        def loss(diff, center):
            s2 = dataclasses.replace(scene, mat_diffuse=diff,
                                     sph_center=center)
            o, d, keys = rays(s, pid, base, cam)
            return jnp.mean(integrator.trace(s2, cfgx, o, d,
                                             jnp.zeros(N), keys))
        gd, gc = jax.grad(loss, argnums=(0, 1))(scene.mat_diffuse,
                                                scene.sph_center)
        return gd, gc
    dt = slope("grad (custom vjp)", g, (scene, cam, pid, base))
    print(f"   -> fwd+bwd {N/dt/1e6:.2f}M primary rays/s", flush=True)
    def g_ad(s, scene, cam, pid, base):
        return g(s, scene, cam, pid, base, cfgx=cfg_ad)
    dt = slope("grad (remat autodiff)", g_ad, (scene, cam, pid, base))
    print(f"   -> fwd+bwd {N/dt/1e6:.2f}M primary rays/s", flush=True)

if __name__ == "__main__":
    main()
