"""Gather exp 8: honest (fresh-index) cost of the production fused
packed fetch vs bigger pack blocks / merged tables / coherent indices.

Every variant salts its indices with the scan iteration index so no
gather row is warm across iterations (profile_honest.py discipline).

Run: python benchmarks/gather_exp8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from tracer.core import rng
from tracer.render import shading
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

N = 408_000


def slope(body, args, r1=2, r2=10, reps=3):
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                return jnp.sum(body(s, *a)) * 1e-20 + c, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(r, dtype=jnp.int32))
            return c
        float(jf(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(r2) - timed(r1)) / (r2 - r1)


def part(name, body, args):
    dt = slope(body, args)
    print(f"{name:44s} {dt * 1e3:8.3f} ms")
    return dt


def repack(data_u8, block):
    """[P,3] f32 (u8-grid) -> packed u32 rows of `block` texels."""
    P = data_u8.shape[0]
    v = (np.asarray(data_u8) * 255.0 + 0.5).astype(np.uint32)
    word = (v[:, 0] << 16) | (v[:, 1] << 8) | v[:, 2]
    rows = (P + block - 1) // block
    w = np.zeros(rows * block, np.uint32)
    w[:P] = word
    return jnp.asarray(w.reshape(rows, block).view(np.int32))


def main():
    scene = compile_scene(zoo.setup_cornell_box(850 / 480))
    pid = jnp.arange(N, dtype=jnp.int32)
    base = jax.random.key(0)
    keys0 = jax.jit(rng.ray_keys)(base, pid)

    Pt = scene.tex_data.shape[0]
    Pn = scene.nm_data.shape[0]
    print(f"device={jax.devices()[0]}  Pt={Pt}  Pn={Pn}")

    def fresh_idx(s, P, salt):
        u = rng.uniform(rng.salted(rng.salted(keys0, s), salt))
        return (u * (P - 1)).astype(jnp.int32)

    def coh_idx(s, P, salt):
        # spatially coherent: blocks of 128 consecutive lanes share a
        # neighborhood of ~2048 texels (like primary rays on a wall)
        u = rng.uniform(rng.salted(rng.salted(keys0, s), salt + 90))
        blk = (pid // 128) * 0  # lane-major layout: same order as pixels
        centr = rng.uniform(rng.salted(rng.salted(keys0, s // 1 + 7), salt))
        c0 = (centr[0] * (P - 2048)).astype(jnp.int32)
        return jnp.clip(c0 + (u * 2048).astype(jnp.int32) + blk, 0, P - 1)

    # A: production fused packed_fetch2 (fresh)
    def a(s, scene):
        it = fresh_idx(s, Pt, 1)
        inn = fresh_idx(s, Pn, 2)
        (t, n) = shading.packed_fetch2(scene.tex_data, scene.nm_data,
                                       scene.tex_pack, scene.nm_pack,
                                       it, inn)
        return t[0] + n[0]
    part("A fused packed_fetch2 B=16 (fresh)", a, (scene,))

    # B: two separate packed_fetch
    def b(s, scene):
        it = fresh_idx(s, Pt, 1)
        inn = fresh_idx(s, Pn, 2)
        t = shading.packed_fetch(scene.tex_data, scene.tex_pack, it)
        n = shading.packed_fetch(scene.nm_data, scene.nm_pack, inn)
        return t[0] + n[0]
    part("B 2x packed_fetch B=16 (fresh)", b, (scene,))

    # C: raw merged row gather only (no decode)
    merged = jnp.concatenate([scene.tex_pack, scene.nm_pack], axis=0)
    rt = scene.tex_pack.shape[0]

    def c(s, merged):
        i2 = jnp.concatenate([fresh_idx(s, Pt, 1) // 16,
                              fresh_idx(s, Pn, 2) // 16 + rt])
        return merged[i2][:, 0].astype(jnp.float32)
    part("C raw merged row gather [2N,16] (fresh)", c, (merged,))

    # D: big blocks — repack at 64 / 128 / 256 texels per row
    for blk in (64, 128, 256):
        pt = repack(scene.tex_data, blk)
        pn = repack(scene.nm_data, blk)
        mg = jnp.concatenate([pt, pn], axis=0)
        rt2 = pt.shape[0]

        def d(s, mg):
            it = fresh_idx(s, Pt, 1)
            inn = fresh_idx(s, Pn, 2)
            i2 = jnp.concatenate([it // blk, inn // blk + rt2])
            sub = jnp.concatenate([it % blk, inn % blk])
            rows = mg[i2]                                    # [2N, blk]
            oh = (sub[:, None] ==
                  jnp.arange(blk, dtype=jnp.int32)[None]).astype(jnp.int32)
            v = jnp.sum(rows * oh, axis=1)
            return v.astype(jnp.float32)
        part(f"D merged fused B={blk} rows={mg.shape[0]} (fresh)", d, (mg,))

    # E: coherence effect at production B=16
    def e(s, scene):
        it = coh_idx(s, Pt, 1)
        inn = coh_idx(s, Pn, 2)
        (t, n) = shading.packed_fetch2(scene.tex_data, scene.nm_data,
                                       scene.tex_pack, scene.nm_pack,
                                       it, inn)
        return t[0] + n[0]
    part("E fused packed_fetch2 B=16 (coherent)", e, (scene,))

    # F: one BIG merged gather, B=128, decode included
    pt = repack(scene.tex_data, 128)
    pn = repack(scene.nm_data, 128)
    mg = jnp.concatenate([pt, pn], axis=0)
    rtf = pt.shape[0]

    def f(s, mg):
        it = fresh_idx(s, Pt, 1)
        inn = fresh_idx(s, Pn, 2)
        i2 = jnp.concatenate([it // 128, inn // 128 + rtf])
        sub = jnp.concatenate([it % 128, inn % 128])
        rows = mg[i2]
        oh = (sub[:, None] ==
              jnp.arange(128, dtype=jnp.int32)[None]).astype(jnp.int32)
        v = jnp.sum(rows * oh, axis=1)
        k = jnp.float32(1.0 / 255.0)
        r = (jax.lax.shift_right_logical(v, 16) & 0xFF).astype(
            jnp.float32) * k
        g = (jax.lax.shift_right_logical(v, 8) & 0xFF).astype(
            jnp.float32) * k
        bl = (v & 0xFF).astype(jnp.float32) * k
        n = it.shape[0]
        return r[:n] + g[:n] + bl[n:]
    part(f"F merged fused+decode B=128 rows={mg.shape[0]} (fresh)",
         f, (mg,))


if __name__ == "__main__":
    main()
