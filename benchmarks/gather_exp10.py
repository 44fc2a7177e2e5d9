"""Does the per-fetch cost drop with bigger batches? Gather + full trace
at N = 408K / 816K / 1.63M. Run: python benchmarks/gather_exp10.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

def slope(name, body, args, r1=8, r2=32, reps=4):
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
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt

def main():
    R = 122750
    tab = jnp.arange(R * 32, dtype=jnp.int32).reshape(R, 32)
    for N in (408000, 816000, 1632000):
        idx = jax.random.randint(jax.random.key(1), (N,), 0, R)
        dt = slope(f"pairlike gather N={N}",
                   lambda s, t, i: t[(i + s) % R], (tab, idx))
        print(f"   -> {dt/N*1e9:.2f} ns/fetch", flush=True)

    W, H = 850, 480
    cfg = RenderConfig(width=W, height=H)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    base = jax.random.key(0)
    for mult in (1, 4):
        N = W * H * mult
        pid = jnp.arange(N, dtype=jnp.int32) % (W * H)
        sid = jnp.arange(N, dtype=jnp.int32) // (W * H)
        def rays(pid, sid, base, cam):
            keys = rng.salted(rng.ray_keys(base, pid), sid)
            uv = rng.uniform(rng.salted(keys, rng.PIXEL_JITTER), (2,))
            x = (pid % W).astype(jnp.float32)
            y = (pid // W).astype(jnp.float32)
            o, d = generate_rays(cam, (x+uv[:,0])/W, (y+uv[:,1])/H)
            return o, d, keys
        o, d, keys = jax.jit(rays)(pid, sid, base, cam)
        tm = jnp.zeros(N)
        def six(s, scene, o, d, tm, keys):
            return integrator._trace_scan(
                scene, cfg, o + s.astype(jnp.float32) * 1e-12, d, tm, keys)
        dt = slope(f"trace b6 N={N}", six, (scene, o, d, tm, keys),
                   r1=2, r2=8 if mult == 1 else 4)
        print(f"   -> {N/dt/1e6:.1f}M rays/s", flush=True)

if __name__ == "__main__":
    main()
