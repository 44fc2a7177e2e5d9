"""Stage timing of the fused A->gather->B bounce on Cornell (tile-multiple
ray count, all device arrays passed as jit args — a closure-captured table
makes XLA embed it as a constant whose gather path is 2.2x slower).
Run: python benchmarks/profile_fused.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo
from tracer.kernels import common as kc

W, H = 850, 480
N = kc.pad_rows(W * H)


def slope(name, body, args, r1=8, r2=40, reps=4):
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
    print(f"{name:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    cfg = RenderConfig(width=W, height=H)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32) % (W * H)
    base = jax.random.key(0)

    def rays(pid, base, cam):
        keys = rng.salted(rng.ray_keys(base, pid), 0)
        uv = rng.uniform(rng.salted(keys, rng.PIXEL_JITTER), (2,))
        x = (pid % W).astype(jnp.float32)
        y = (pid // W).astype(jnp.float32)
        o, d = generate_rays(cam, (x + uv[:, 0]) / W, (y + uv[:, 1]) / H)
        return o, d, keys
    o, d, keys = jax.jit(rays)(pid, base, cam)
    op = tuple(jnp.asarray(o[:, a]) for a in range(3))
    dp = tuple(jnp.asarray(d[:, a]) for a in range(3))
    tm = jnp.zeros(N)

    from tracer.kernels import intersect as ki
    from tracer.kernels import shade as ks
    from tracer.render import shading

    def raygen(s, pid, base, cam):
        return rays(pid, rng.salted(base_w(base), s), cam)

    def base_w(b):
        return jax.random.key_data(b)[..., -1].astype(jnp.uint32)

    def rays_salted(s, pid, bw, cam):
        keys = rng.salted(rng._mix(jnp.broadcast_to(bw, pid.shape), pid), s)
        uv = rng.uniform(rng.salted(keys, rng.PIXEL_JITTER), (2,))
        x = (pid % W).astype(jnp.float32)
        y = (pid // W).astype(jnp.float32)
        o, d = generate_rays(cam, (x + uv[:, 0]) / W, (y + uv[:, 1]) / H)
        return o, d
    slope("raygen (keys+jitter+camera)", rays_salted,
          (pid, jnp.uint32(7), cam))

    def kA(sc, s, *a):
        op_, dp_, tm_, ks_ = a[:3], a[3:6], a[6], a[7]
        dps = tuple(x + s.astype(jnp.float32) * 1e-9 for x in dp_)
        empty_t = jnp.full((0, N), integrator.INF)
        empty_i = jnp.full((0, N), -1, jnp.int32)
        return ki.first_hits(sc, op_, dps, tm_, empty_t, empty_i,
                             live=None, eps=1e-5, tex_out=True)
    slope("kernel A (tex_out, salted dirs)",
          lambda s, sc, *a: kA(sc, s, *a), (scene, *op, *dp, tm, keys))
    k1 = jax.jit(lambda sc, *a: kA(sc, jnp.int32(0), *a))(
        scene, *op, *dp, tm, keys)

    PB = shading.PACK_BLOCK

    def gather_sel(s, pp, row, sub):
        prows = pp[(row + s) % pp.shape[0]]
        oh = (sub[:, None] == jnp.arange(PB, dtype=jnp.int32)[None]
              ).astype(jnp.int32)
        vt = jnp.sum(prows[:, :PB] * oh, axis=1)
        vn = jnp.sum(prows[:, PB:] * oh, axis=1)
        return vt, vn
    slope("pair gather + one-hot select",
          gather_sel, (scene.pair_pack, k1["row"], k1["sub"]))
    vt, vn = jax.jit(gather_sel)(jnp.int32(0), scene.pair_pack,
                                 k1["row"], k1["sub"])

    def matrows(s, sc, mid):
        return integrator._rows(ks.shade_mat_table(sc),
                                (mid + s) % sc.mat_diffuse.shape[0])
    slope("mat one-hot rows", matrows, (scene, k1["mid"]))
    mr = jax.jit(matrows)(jnp.int32(0), scene, k1["mid"])

    def kB(s, sc, mr, vt, vn, *a):
        st = dict(o=a[0:3], d=a[3:6], time=a[6],
                  throughput=a[7:10], active=a[10], acc=a[11:14])
        bk = rng.salted(a[14], s)
        k1l = dict(k1, j=jax.lax.stop_gradient(k1["j"]))
        return ks.shade_scatter(sc, cfg, st, bk, k1l, mr,
                                jnp.int32(6),
                                rows=(vt, vn, k1["ptex"], k1["pnm"]),
                                last=False)
    ones = tuple(jnp.ones(N) for _ in range(3))
    zeros = tuple(jnp.zeros(N) for _ in range(3))
    slope("kernel B (shade+scatter)", kB,
          (scene, mr, vt, vn, *op, *dp, tm, *ones,
           jnp.ones(N, bool), *zeros, keys))

    def bounce(s, sc, *a):
        st = dict(o=a[0:3], d=a[3:6], time=a[6],
                  throughput=a[7:10], active=a[10], acc=a[11:14])
        ks2 = rng.salted(a[14], s)
        st2, occ, _ = integrator._bounce_core(sc, cfg, ks2, st,
                                              jnp.int32(0))
        return st2
    slope("full fused bounce", bounce,
          (scene, *op, *dp, tm, *ones, jnp.ones(N, bool), *zeros, keys))

    from tracer.render.renderer import _render_batch

    def sample(s, sc, cam, pid, base):
        return _render_batch(sc, cam, cfg, W, H, pid, s, base)
    dt = slope("full product sample (6 bounces)", sample,
               (scene, cam, pid, base))
    print(f"  -> {N / dt / 1e6:.1f} M rays/s")


if __name__ == "__main__":
    main()
