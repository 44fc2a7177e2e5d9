"""Amortized per-stage timing (scan-over-reps inside ONE jit) of the
Cornell bounce on the attached device — resolves sub-ms stages under the
~26 ms dispatch overhead of this tunnel. Run: python benchmarks/profile_bounce2.py"""
import os, sys, time, dataclasses, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, numpy as np, jax.numpy as jnp
from tracer.core import rng, vec3p as vp
from tracer.core.config import RenderConfig
from tracer.render import integrator, shading
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H

def slope(name, body, args, r1=4, r2=16, reps=3):
    """body(salt, *args) -> pytree; returns per-iteration seconds."""
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                out = body(s, *a)
                red = jnp.sum(jnp.stack(
                    [jnp.sum(x.astype(jnp.float32))
                     for x in jax.tree.leaves(out)]))
                return c + red * 1e-20, None
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
    print(f"{name:38s} {dt*1e3:9.3f} ms", flush=True)
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
    op = tuple(jnp.asarray(o[:, a]) for a in range(3))
    dp = tuple(jnp.asarray(d[:, a]) for a in range(3))

    from tracer.kernels import intersect as ki
    t_raw = jnp.full((0, N), integrator.INF)
    tri_raw = jnp.full((0, N), -1, jnp.int32)

    def fh(s, scene, o0,o1,o2,d0,d1,d2, tm):
        k1 = ki.first_hits(scene, (o0,o1,o2), (d0+s*0.0,d1,d2), tm,
                           jnp.full((0, N), integrator.INF),
                           jnp.full((0, N), -1, jnp.int32),
                           live=None, eps=1e-5)
        return k1["j"], k1["p"], k1["u"]
    slope("first_hits kernel", fh, (scene, *op, *dp, tm))

    k1 = jax.jit(lambda sc,o0,o1,o2,d0,d1,d2,t: ki.first_hits(
        sc,(o0,o1,o2),(d0,d1,d2),t,
        jnp.full((0, N), integrator.INF),
        jnp.full((0, N), -1, jnp.int32),live=None,eps=1e-5))(
        scene, *op, *dp, tm)
    j = jnp.maximum(k1["j"], 0)
    a2 = jax.jit(lambda d0,d1,d2: d0*d0+d1*d1+d2*d2)(*dp)

    def sky(s, scene, d0,d1,d2, tm):
        return shading.skybox_color_p(scene, (d0+s*0.0,d1,d2), tm + 6.0,
                                      True, packed=True)
    slope("sky (packed)", sky, (scene, *dp, tm))

    def gather(s, scene, o0,o1,o2,d0,d1,d2, a2, tm, j, k1):
        return integrator._gather_hit_p(
            scene, (o0,o1,o2), (d0+s*0.0,d1,d2), a2, tm, j, k1["tid"],
            1e-5, kernels_on=True, packed_on=True, k1=k1)
    slope("gather_hit (with k1)", gather,
          (scene, *op, *dp, a2, tm, j, k1))

    def rows2(s, matf, mati, mid):
        return (integrator._rows(matf, mid + s*0),
                integrator._rows_i(mati, mid))
    matf, mati = jax.jit(lambda sc: integrator._geo_packs(sc)[2:])(scene)
    slope("material rows (one-hot x2)", rows2, (matf, mati, k1["mid"]))

    hit = jax.jit(lambda sc,o0,o1,o2,d0,d1,d2,a2,tm,j,k1:
                  integrator._gather_hit_p(sc,(o0,o1,o2),(d0,d1,d2),a2,tm,
                                           j,k1["tid"],1e-5,True,True,k1))(
        scene, *op, *dp, a2, tm, j, k1)
    def scat(s, scene, d0,d1,d2, n, p, mt, ior, keys):
        return integrator._scatter_p(scene, cfg, (d0+s*0.0,d1,d2), n, p,
                                     mt, ior, keys)
    slope("scatter", scat, (scene, *dp, hit["n"], hit["p"],
                            hit["mtype"], hit["ior"], keys))

    def bounce(s, scene, o0,o1,o2,d0,d1,d2, tm, keys):
        st = integrator._init_state(jnp.stack([o0,o1,o2],-1),
                                    jnp.stack([d0+s*0.0,d1,d2],-1), tm)
        st, occ, rec = integrator._bounce_core(scene, cfg, keys, st,
                                               jnp.int32(0))
        return st["acc"], st["d"], st["throughput"]
    slope("full bounce (1x)", bounce, (scene, *op, *dp, tm, keys))

    def six(s, scene, o0,o1,o2,d0,d1,d2, tm, keys):
        return integrator._trace_scan(
            scene, cfg, jnp.stack([o0,o1,o2],-1),
            jnp.stack([d0+s*0.0,d1,d2],-1), tm, keys)
    slope("trace b6", six, (scene, *op, *dp, tm, keys), r1=2, r2=8)

if __name__ == "__main__":
    main()
