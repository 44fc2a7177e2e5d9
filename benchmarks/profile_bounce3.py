"""Stage timing with data-flowing salts (nothing hoists): gather_hit,
pair atlas fetch, scatter, state arithmetic. Run: python benchmarks/profile_bounce3.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from tracer.core import rng, vec3p as vp
from tracer.core.config import RenderConfig
from tracer.render import integrator, shading
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

W, H = 850, 480
N = W * H

def slope(name, body, args, r1=8, r2=64, reps=4):
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
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)
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
    k1 = jax.jit(lambda sc,o0,o1,o2,d0,d1,d2,t: ki.first_hits(
        sc,(o0,o1,o2),(d0,d1,d2),t,
        jnp.full((0, N), integrator.INF),
        jnp.full((0, N), -1, jnp.int32),live=None,eps=1e-5))(
        scene, *op, *dp, tm)
    j = jnp.maximum(k1["j"], 0)
    a2 = jax.jit(lambda d0,d1,d2: d0*d0+d1*d1+d2*d2)(*dp)

    def salt_k1(s, k1):
        e = s.astype(jnp.float32) * 1e-12
        k = dict(k1)
        k["u"] = k1["u"] + e
        k["v"] = k1["v"] + e
        k["p"] = tuple(x + e for x in k1["p"])
        k["n"] = tuple(x + e for x in k1["n"])
        return k

    def gather(s, scene, o0,o1,o2,d0,d1,d2, a2, tm, j, k1):
        k = salt_k1(s, k1)
        return integrator._gather_hit_p(
            scene, (o0+s.astype(jnp.float32)*1e-12,o1,o2), (d0,d1,d2), a2,
            tm, j, k1["tid"], 1e-5, kernels_on=True, packed_on=True, k1=k)
    slope("gather_hit (with k1, salted)", gather,
          (scene, *op, *dp, a2, tm, j, k1))

    def gather_replay(s, scene, o0,o1,o2,d0,d1,d2, a2, tm, j, k1):
        return integrator._gather_hit_p(
            scene, (o0+s.astype(jnp.float32)*1e-12,o1,o2), (d0,d1,d2), a2,
            tm, j, k1["tid"], 1e-5, kernels_on=False, packed_on=False,
            k1=None)
    slope("gather_hit (replay path, salted)", gather_replay,
          (scene, *op, *dp, a2, tm, j, k1))

    # pair atlas fetch alone
    P = int(scene.pair_pack.shape[0])
    print(f"pair_pack rows = {P}, tex_data rows = {scene.tex_data.shape[0]}",
          flush=True)
    idx = jax.random.randint(jax.random.key(2), (N,), 0, max(P, 1))
    sub = jax.random.randint(jax.random.key(3), (N,), 0, 16)
    it = jax.random.randint(jax.random.key(4), (N,), 0,
                            scene.tex_data.shape[0])
    inn = jax.random.randint(jax.random.key(5), (N,), 0,
                             scene.nm_data.shape[0])
    ok = jnp.ones((N,), bool)
    def pairf(s, scene, idx, sub, it, inn, ok):
        return shading.paired_fetch(scene.tex_data, scene.nm_data,
                                    scene.pair_pack, (idx + s) % P, sub,
                                    it, inn, ok, ok)
    slope("paired_fetch alone", pairf, (scene, idx, sub, it, inn, ok))

    hit = jax.jit(lambda sc,o0,o1,o2,d0,d1,d2,a2,tm,j,k1:
                  integrator._gather_hit_p(sc,(o0,o1,o2),(d0,d1,d2),a2,tm,
                                           j,k1["tid"],1e-5,True,True,k1))(
        scene, *op, *dp, a2, tm, j, k1)
    def scat(s, scene, d0,d1,d2, n, p, mt, ior, keys):
        e = s.astype(jnp.float32) * 1e-12
        return integrator._scatter_p(scene, cfg, (d0+e,d1,d2),
                                     tuple(x+e for x in n),
                                     tuple(x+e for x in p), mt, ior,
                                     keys + s)
    slope("scatter (salted)", scat, (scene, *dp, hit["n"], hit["p"],
                                     hit["mtype"], hit["ior"], keys))

    def shade_only(s, scene, j, k1, tm, keys):
        # everything in _gather_hit_p AFTER the mat-row fetch, approximated
        # by calling with salted u/v only
        k = salt_k1(s, k1)
        mrf = integrator._rows(integrator._geo_packs(scene)[2], k1["mid"])
        return mrf[:, 0] * k["u"]
    slope("rows via geo_packs (hoist check)", shade_only,
          (scene, j, k1, tm, keys))

if __name__ == "__main__":
    main()
