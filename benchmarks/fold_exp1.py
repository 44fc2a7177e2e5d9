"""Texel-cotangent fold round 5: can a sort + run-length compact + capped
scatter beat the ~7 ns/scalar flat XLA scatter (PERF.md floor #2)?

Pieces measured on the real chip:
  (a) lax.sort cost at per-bounce (409.6K) and fold (2.05M) sizes, with
      1 and 3 payload operands;
  (b) cumsum / flag / gather glue costs;
  (c) end-to-end candidate: sort -> run flags -> cumsum -> 2nd sort to
      compact run-end positions -> gather run totals -> scatter U_cap
      rows, numerically checked against the flat scatter;
  (d) the real Cornell record's unique-texel count U (decides U_cap).

Run: python benchmarks/fold_exp1.py [stats]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

M_BOUNCE = 409600
M_FOLD = 5 * M_BOUNCE
P3 = 3 * 1242977          # cornell tex_data flat scalars


def slope(name, body, args, r1=4, r2=16, reps=4):
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                out = body(s, *a)
                leaves = jax.tree.leaves(out)
                return c + sum(jnp.sum(x.astype(jnp.float32))
                               for x in leaves) * 1e-20, None
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
    print(f"{name:58s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def candidate_fold(ids, gx, gy, gz, u_cap, p3):
    """sort -> compact runs -> scatter U_cap rows (flat interleaved)."""
    M = ids.shape[0]
    ids_s, gx_s, gy_s, gz_s = jax.lax.sort(
        (ids, gx, gy, gz), num_keys=1)
    iota = jnp.arange(M, dtype=jnp.int32)
    # run ENDS: last position of each equal-id run
    re = jnp.concatenate([ids_s[1:] != ids_s[:-1],
                          jnp.ones((1,), bool)])
    csx = jnp.cumsum(gx_s)
    csy = jnp.cumsum(gy_s)
    csz = jnp.cumsum(gz_s)
    # compact run-end positions to a U_cap prefix (2nd sort, stable)
    poskey = jnp.where(re, iota, jnp.int32(M))
    pos = jax.lax.sort(poskey)[:u_cap]
    valid = pos < M
    posc = jnp.minimum(pos, M - 1)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), posc[:-1]])
    prev = jnp.maximum(prev, -1)
    def seg(cs):
        hi = cs[posc]
        lo = jnp.where(prev >= 0, cs[jnp.maximum(prev, 0)], 0.0)
        return jnp.where(valid, hi - lo, 0.0)
    tx, ty, tz = seg(csx), seg(csy), seg(csz)
    out_ids = jnp.where(valid, ids_s[posc], 0)
    flat = jnp.zeros((p3,), jnp.float32)
    i3 = jnp.concatenate([out_ids * 3, out_ids * 3 + 1, out_ids * 3 + 2])
    v3 = jnp.concatenate([tx, ty, tz])
    return flat.at[i3].add(v3)


def baseline_fold(ids, gx, gy, gz, p3):
    flat = jnp.zeros((p3,), jnp.float32)
    i3 = jnp.concatenate([ids * 3, ids * 3 + 1, ids * 3 + 2])
    v3 = jnp.concatenate([gx, gy, gz])
    return flat.at[i3].add(v3)


def main():
    key = jax.random.key(0)
    sizes = {"small": (M_BOUNCE,), "big": (M_FOLD,)}.get(
        os.environ.get("FOLD_SIZES", ""), (M_BOUNCE, M_FOLD))
    only = os.environ.get("FOLD_ONLY", "")
    for M in sizes:
        ids = jax.random.randint(key, (M,), 0, P3 // 3, jnp.int32)
        g = jax.random.normal(key, (3, M), jnp.float32)
        gx, gy, gz = g[0], g[1], g[2]

        def salt_ids(s, ids):
            return ids ^ (s & 1)

        if only in ("", "sort"):
            slope(f"sort {M//1000}K keys only",
                  lambda s, ids: jax.lax.sort(salt_ids(s, ids)), (ids,))
            slope(f"sort {M//1000}K keys + 1 payload",
                  lambda s, ids, gx: jax.lax.sort(
                      (salt_ids(s, ids), gx), num_keys=1), (ids, gx))
            slope(f"sort {M//1000}K keys + 3 payloads",
                  lambda s, ids, gx, gy, gz: jax.lax.sort(
                      (salt_ids(s, ids), gx, gy, gz), num_keys=1),
                  (ids, gx, gy, gz))
        if only in ("", "glue"):
            slope(f"cumsum {M//1000}K f32 x3",
                  lambda s, gx, gy, gz: (jnp.cumsum(gx + s),
                                         jnp.cumsum(gy),
                                         jnp.cumsum(gz)), (gx, gy, gz))
            slope(f"baseline flat scatter {M//1000}K x3 scalars",
                  lambda s, ids, gx, gy, gz: baseline_fold(
                      salt_ids(s, ids), gx, gy, gz, P3),
                  (ids, gx, gy, gz))
        if only in ("", "cand"):
            for u_cap in (1 << 18, 1 << 20):
                slope(f"candidate fold {M//1000}K  U_cap={u_cap//1024}K",
                      lambda s, ids, gx, gy, gz, u_cap=u_cap:
                      candidate_fold(salt_ids(s, ids), gx, gy, gz,
                                     u_cap, P3),
                      (ids, gx, gy, gz))

    # numerical check (small, duplicated ids so runs exist)
    Mc = 1 << 16
    idc = jax.random.randint(key, (Mc,), 0, 5000, jnp.int32)
    gc = jax.random.normal(key, (3, Mc), jnp.float32)
    a = baseline_fold(idc, gc[0], gc[1], gc[2], 15000 * 3)
    b = candidate_fold(idc, gc[0], gc[1], gc[2], 8192, 15000 * 3)
    err = float(jnp.max(jnp.abs(a - b)))
    rel = err / float(jnp.max(jnp.abs(a)))
    print(f"check: max abs err {err:.3e} rel {rel:.3e}")


def stats():
    """Real Cornell record: how many unique texels per sample?"""
    from tracer.core.config import RenderConfig
    from tracer.core import rng
    from tracer.render import integrator
    from tracer.render.camera import default_camera, generate_rays
    from tracer.scene.device import compile_scene
    from tracer.scenes import zoo
    from tracer.kernels import common as kc

    W, H = 850, 480
    cfg = RenderConfig(width=W, height=H, nsamples=1)
    scene = compile_scene(zoo.setup_cornell_box(W / H))
    cam = default_camera(aspect=W / H)
    n_pix = W * H
    n_pad = kc.pad_rows(n_pix)
    pix = jnp.arange(n_pad, dtype=jnp.int32) % n_pix
    keys = rng.salted(rng.ray_keys(jax.random.key(0), pix), 0)
    jit_uv = rng.uniform(rng.salted(keys, rng.PIXEL_JITTER), (2,))
    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    o, d = generate_rays(cam, (x + jit_uv[:, 0]) / W,
                         (y + jit_uv[:, 1]) / H)
    time_ = rng.uniform(rng.salted(keys, rng.RAY_TIME))

    @jax.jit
    def rec(scene, o, d, t, keys):
        _, r = integrator._trace_record(scene, cfg, o, d, t, keys)
        return r

    (rec_scan, rec_last) = jax.device_get(rec(scene, o, d, time_, keys))
    reci = np.asarray(rec_scan[0])          # [B-1, 4, N]
    idx_t = reci[:, 2, :].reshape(-1)
    idx_n = reci[:, 3, :].reshape(-1)
    j_enc = reci[:, 0, :].reshape(-1)
    for nm, idx in (("tex", idx_t), ("nm", idx_n)):
        u = np.unique(idx)
        print(f"{nm}: M={idx.size} unique={u.size} "
              f"dup_factor={idx.size/u.size:.1f}")
    print("live fraction per bounce:",
          [(reci[b, 0, :] >= 0).mean().round(3)
           for b in range(reci.shape[0])])


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "stats":
        stats()
    else:
        main()
