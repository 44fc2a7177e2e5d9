"""Per-stage timing of one Cornell bounce on the attached device:
first_hits kernel / sky / gather_hit(k1) / material rows / scatter /
full bounce. Directs the round-3 fusion work. Run: python benchmarks/profile_bounce.py"""
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

def bench(name, fn, *args, reps=5):
    jfn = jax.jit(lambda *a: jnp.sum(jnp.stack(
        [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))])))
    float(jfn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best*1e3:9.2f} ms", flush=True)
    return best

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

    # baseline: null launch (measures the tunnel's fixed dispatch+fetch)
    bench("null (dispatch overhead)", lambda x: x * 2.0, tm)

    from tracer.kernels import intersect as ki
    t_raw = jnp.full((0, N), integrator.INF)
    tri_raw = jnp.full((0, N), -1, jnp.int32)
    def fh(scene, op0, op1, op2, dp0, dp1, dp2, tm, t_raw, tri_raw):
        k1 = ki.first_hits(scene, (op0,op1,op2), (dp0,dp1,dp2), tm,
                           t_raw, tri_raw, live=None, eps=1e-5)
        return k1["j"], k1["p"], k1["n"], k1["u"], k1["v"]
    bench("first_hits kernel", fh, scene, *op, *dp, tm, t_raw, tri_raw)

    k1 = jax.jit(lambda s,o0,o1,o2,d0,d1,d2,t,tr,ti: ki.first_hits(
        s,(o0,o1,o2),(d0,d1,d2),t,tr,ti,live=None,eps=1e-5))(
        scene, *op, *dp, tm, t_raw, tri_raw)
    j = jnp.maximum(k1["j"], 0)
    a2 = jax.jit(lambda d0,d1,d2: d0*d0+d1*d1+d2*d2)(*dp)

    def sky(scene, d0, d1, d2, tm):
        return shading.skybox_color_p(scene, (d0,d1,d2), tm + 6.0, True,
                                      packed=True)
    bench("sky (packed)", sky, scene, *dp, tm)

    def gather(scene, o0,o1,o2, d0,d1,d2, a2, tm, j, k1):
        return integrator._gather_hit_p(
            scene, (o0,o1,o2), (d0,d1,d2), a2, tm, j, k1["tid"], 1e-5,
            kernels_on=True, packed_on=True, k1=k1)
    bench("gather_hit (with k1)", gather, scene, *op, *dp, a2, tm, j, k1)

    def gather_nok1(scene, o0,o1,o2, d0,d1,d2, a2, tm, j, tid):
        return integrator._gather_hit_p(
            scene, (o0,o1,o2), (d0,d1,d2), a2, tm, j, tid, 1e-5,
            kernels_on=False, packed_on=False, k1=None)
    bench("gather_hit (replay, no k1)", gather_nok1, scene, *op, *dp, a2,
          tm, j, k1["tid"])

    matf_mati = jax.jit(lambda s: integrator._geo_packs(s)[2:])(scene)
    def rows2(matf, mati, mid):
        return (integrator._rows(matf, mid), integrator._rows_i(mati, mid))
    bench("material rows (one-hot x2)", rows2, *matf_mati, k1["mid"])

    hit = jax.jit(functools.partial(gather))(scene, *op, *dp, a2, tm, j, k1)
    def scat(scene, d0,d1,d2, n, p, mt, ior, keys):
        return integrator._scatter_p(scene, cfg, (d0,d1,d2), n, p, mt,
                                     ior, keys)
    bench("scatter", scat, scene, *dp, hit["n"], hit["p"], hit["mtype"],
          hit["ior"], keys)

    def bounce(scene, o0,o1,o2, d0,d1,d2, tm, keys):
        st = integrator._init_state(jnp.stack([o0,o1,o2],-1),
                                    jnp.stack([d0,d1,d2],-1), tm)
        st, occ, rec = integrator._bounce_core(scene, cfg, keys, st,
                                               jnp.int32(0))
        return st["acc"], st["d"]
    bench("full bounce (1x)", bounce, scene, *op, *dp, tm, keys)

    def six(scene, o0,o1,o2, d0,d1,d2, tm, keys):
        return integrator._trace_scan(
            scene, cfg, jnp.stack([o0,o1,o2],-1),
            jnp.stack([d0,d1,d2],-1), tm, keys)
    bench("trace b6", six, scene, *op, *dp, tm, keys)

if __name__ == "__main__":
    main()
