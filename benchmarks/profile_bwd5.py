"""Round-5: split the hand-written backward's per-bounce cost into the
Pallas adjoint kernel, the one-hot row fetches, and the accumulation
matmuls. Run: python benchmarks/profile_bwd5.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.render import integrator, replay_bwd
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.device import compile_scene
from tracer.scenes import zoo
from tracer.kernels import shade_bwd as kbwd

W, H = 850, 480
N = W * H


def slope(name, f, args, r1=2, r2=8, reps=3):
    def timed(r):
        jf = jax.jit(lambda *a: jax.lax.scan(
            lambda c, s: (c + sum(jnp.sum(x) for x in
                                  jax.tree.leaves(f(s, *a))) * 1e-20,
                          None),
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
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(aspect=W / H)
    pid = jnp.arange(N, dtype=jnp.int32)
    keys = jax.jit(rng.ray_keys)(jax.random.key(0), pid)
    u = ((pid % W).astype(jnp.float32) + 0.5) / W
    v = ((pid // W).astype(jnp.float32) + 0.5) / H
    o, d = jax.jit(generate_rays)(cam, u, v)
    tm = jnp.zeros(N)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    S = scene.sph_center.shape[0]
    Q = scene.quad_v0.shape[0]

    out, rec, states = jax.jit(
        lambda s, o, d, t, k: integrator._trace_record(
            s, cfg, o, d, t, k, with_states=True),
        static_argnums=())(scene, o, d, tm, keys)
    (reci_s, recf_s, _), _ = rec
    st_scan, _ = states
    st0 = st_scan[0]
    reci0, recf0 = reci_s[0], recf_s[0]

    sph_pack, quad_pack, matf, mati = integrator._geo_packs(scene)
    matif = mati.astype(jnp.float32)

    def rows(salt, j_enc):
        j = jnp.maximum(j_enc + salt * 0, 0)
        js = jnp.clip(j, 0, S - 1)
        jq = jnp.clip(j - S, 0, Q - 1)
        srow = replay_bwd._rows_t(sph_pack, js)
        qrow = replay_bwd._rows_t(quad_pack, jq)
        mid = jnp.where(j < S, srow[7], qrow[18]).astype(jnp.int32)
        mrf = replay_bwd._rows_t(matf, mid)
        mri = replay_bwd._rows_t(matif, mid)
        return srow, qrow, mrf, mri

    slope("row fetches x4 (one bounce)", rows, (reci0[0],))

    srow, qrow, mrf, mri = jax.jit(lambda j: rows(0, j))(reci0[0])
    mr21 = jnp.concatenate([mrf, mri[0:1], mri[7:8], mri[8:9]])
    bk = jax.lax.bitcast_convert_type(rng.salted(keys, 2), jnp.int32)
    z = jnp.zeros(N)
    g3 = (z + 1e-3, z + 1e-3, z + 1e-3)

    def kern(salt, st0, reci0, recf0, mr21, srow, qrow, bk, tm):
        return kbwd.bounce_bwd_tiles(
            st0, reci0[0], recf0, mr21 + salt * 0.0, srow, qrow, bk, tm,
            g3, g3, g3, g3, jnp.float32(4.0), scene.dark_sky,
            S=S, Q=Q, ref=True, eps=1e-5, has_pair=True, last=False)

    slope("bwd adjoint kernel (one bounce)", kern,
          (st0, reci0, recf0, mr21, srow, qrow, bk, tm))

    mid = jnp.where(jnp.maximum(reci0[0], 0) < S, srow[7],
                    qrow[18]).astype(jnp.int32)
    gm = [z + 1e-3] * 18

    def accum(salt, mid, gmatf):
        return replay_bwd._onehot_accum(gmatf + salt * 0.0, mid, gm)

    slope("one-hot accum [18 x M] (one bounce)", accum,
          (mid, jnp.zeros((18, matf.shape[0]))))


if __name__ == "__main__":
    main()
