"""Stage timing of the record-replay custom VJP on Cornell @ b6:
plain fwd / record fwd / replay fwd / grad(replay) / full grad via
custom VJP / full grad via remat autodiff. Run on the attached device."""
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

def bench(name, fn, *args, reps=3):
    jfn = jax.jit(lambda *a: jnp.sum(jnp.stack(
        [jnp.sum(x) for x in jax.tree.leaves(fn(*a))
         if jnp.issubdtype(x.dtype, jnp.floating)])))
    t0 = time.perf_counter(); v = float(jfn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(jfn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:32s} {dt*1e3:9.2f} ms   (compile {tc:.1f}s)", flush=True)
    return dt

def main():
    cfg = RenderConfig(width=W, height=H)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)

    def rays(pid, base, cam):
        keys = rng.salted(rng.ray_keys(base, pid), 0)
        uv = rng.uniform(rng.salted(keys, rng.PIXEL_JITTER), (2,))
        x = (pid % W).astype(jnp.float32); y = (pid // W).astype(jnp.float32)
        o, d = generate_rays(cam, (x+uv[:,0])/W, (y+uv[:,1])/H)
        return o, d, keys

    o, d, keys = jax.jit(rays)(pid, base, cam)
    tm = jnp.zeros(N)

    bench("fwd _trace_scan", lambda s,o,d,t,k:
          integrator._trace_scan(s,cfg,o,d,t,k), scene,o,d,tm,keys)
    bench("fwd _trace_record", lambda s,o,d,t,k:
          integrator._trace_record(s,cfg,o,d,t,k)[0], scene,o,d,tm,keys)
    rec = jax.jit(lambda s,o,d,t,k:
                  integrator._trace_record(s,cfg,o,d,t,k)[1])(
                      scene,o,d,tm,keys)
    bench("fwd _trace_replay", lambda s,o,d,t,k,r:
          integrator._trace_replay(s,cfg,o,d,t,k,r),
          scene,o,d,tm,keys,rec)

    def grad_replay(s,o,d,t,k,r):
        def loss(diff, center):
            s2 = dataclasses.replace(s, mat_diffuse=diff, sph_center=center)
            return jnp.mean(integrator._trace_replay(s2,cfg,o,d,t,k,r))
        return jax.grad(loss, argnums=(0,1))(s.mat_diffuse, s.sph_center)
    bench("grad(replay) diff+center", grad_replay, scene,o,d,tm,keys,rec)

    def grad_full(s,o,d,t,k,cfg2):
        def loss(diff, center):
            s2 = dataclasses.replace(s, mat_diffuse=diff, sph_center=center)
            return jnp.mean(integrator.trace(s2,cfg2,o,d,t,k))
        return jax.grad(loss, argnums=(0,1))(s.mat_diffuse, s.sph_center)
    bench("grad full (custom vjp)", lambda s,o,d,t,k:
          grad_full(s,o,d,t,k,cfg), scene,o,d,tm,keys)
    cfg_off = dataclasses.replace(cfg, custom_vjp="off")
    bench("grad full (remat autodiff)", lambda s,o,d,t,k:
          grad_full(s,o,d,t,k,cfg_off), scene,o,d,tm,keys)

if __name__ == "__main__":
    main()
