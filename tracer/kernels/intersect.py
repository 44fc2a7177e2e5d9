"""Pallas fused first-hit kernel: the sphere+quad candidate pass, the
closest-hit argmin (merged with the mesh BVH results), and the winning
primitive's hit detail in ONE VMEM-resident kernel.

This is the recast of `Scene::computeIntersection` + the per-hit fetch
switch (`/root/reference/src/Scene.h:202-230, 270-304`): the jnp path
materializes [S+Q+Nm, N] candidate tensors in HBM, argmins them, then
re-fetches the winner's parameters through one-hot matmuls; here a
(TILE_ROWS x 128) ray tile keeps everything in vector registers — scene
tables are SMEM scalars, the winner's raw parameters are cached in
registers during the candidate loop, and the hit detail (position,
normal, quad uv, tangent frame) is derived once post-loop with the same
expressions as primitives.sphere_hit_detail_planar /
quad_hit_detail_planar, so results are bit-identical to the jnp path.

Semantics notes (all mirrored from the jnp path):
- selection is strict-< in (spheres, squares, meshes) order == argmin's
  first-minimum tie-break (Scene.h:202-230 accumulation order);
- mesh candidates enter as the traverse kernel's per-mesh closest hits
  with the scene-level eps cut (a mesh whose closest raw hit is below
  eps contributes nothing, Scene.h:224); their detail (barycentric
  vertex-gather) stays in XLA — only (j, tid, mid) are decided here;
- sphere theta/phi (arccos/atan2 — unsupported by Mosaic) are derived in
  XLA from the returned normal;
- outputs are selection+detail records; gradients flow through the XLA
  re-derivation in the record-replay backward (integrator custom VJP),
  so inputs are stop_gradient'ed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.kernels import common as kc

GLASS = 1
NCACHE = 35  # winner-parameter cache registers (see _kernel)


def intersect_tables(scene):
    """SMEM tables (same XLA expressions as the planar candidate pass, so
    per-object scalars are bit-identical).

    sph [S, 9]:  0:3 c, 3 r, 4:7 mb, 7 valid, 8 midf
    quad [Q, 41]: 0:3 v0, 3:6 er, 6:9 eu, 9:12 n(stored), 12:15 mb,
       15 v0_n, 16 mb_n, 17 v0_er, 18 mb_er, 19 v0_eu, 20 mb_eu,
       21 er2, 22 eu2, 23 glass, 24 valid, 25 midf, 26:29 tan,
       29:32 bitan, 32 sx, 33 sy, 34 pair_wa, 35 pair_ha, 36 pair_wb,
       37 pair_hb, 38 pair_off, 39 pair_tex, 40 pair_nm, 41 tex_off,
       42 tex_w, 43 tex_h, 44 nm_off, 45 nm_w, 46 nm_h (texel-index
       fields for the in-kernel pair-atlas / true-atlas index
       computation; all-zero when the material is untextured)
    mesh [max(Nm,1), 1]: 0 midf
    """
    mbs = scene.mat_mb[scene.sph_mat]
    sph = jnp.concatenate([
        scene.sph_center, scene.sph_radius[:, None], mbs,
        scene.sph_valid[:, None],
        scene.sph_mat.astype(jnp.float32)[:, None]], axis=1)

    n, er, eu = scene.quad_normal, scene.quad_er, scene.quad_eu
    v0 = scene.quad_v0
    mbq = scene.mat_mb[scene.quad_mat]
    is_glass = (scene.mat_type[scene.quad_mat] == GLASS).astype(jnp.float32)
    qm = scene.quad_mat
    f = lambda a: a.astype(jnp.float32)[:, None]  # noqa: E731
    quad = jnp.concatenate([
        v0, er, eu, n, mbq,
        jnp.sum(v0 * n, axis=-1)[:, None],
        jnp.sum(mbq * n, axis=-1)[:, None],
        jnp.sum(v0 * er, axis=-1)[:, None],
        jnp.sum(mbq * er, axis=-1)[:, None],
        jnp.sum(v0 * eu, axis=-1)[:, None],
        jnp.sum(mbq * eu, axis=-1)[:, None],
        jnp.sum(er * er, axis=-1)[:, None],
        jnp.sum(eu * eu, axis=-1)[:, None],
        is_glass[:, None], scene.quad_valid[:, None],
        f(qm),
        scene.quad_tan, scene.quad_bitan,
        scene.mat_texscale[qm],
        f(scene.mat_pair_wa[qm]), f(scene.mat_pair_ha[qm]),
        f(scene.mat_pair_wb[qm]), f(scene.mat_pair_hb[qm]),
        f(scene.mat_pair_off[qm]),
        f(scene.mat_pair_tex[qm]), f(scene.mat_pair_nm[qm]),
        f(scene.tex_off[scene.mat_tex[qm]]),
        f(scene.tex_w[scene.mat_tex[qm]]),
        f(scene.tex_h[scene.mat_tex[qm]]),
        f(scene.nm_off[scene.mat_nm[qm]]),
        f(scene.nm_w[scene.mat_nm[qm]]),
        f(scene.nm_h[scene.mat_nm[qm]])], axis=1)

    Nm = scene.mesh_mat.shape[0]
    mesh = (scene.mesh_mat.astype(jnp.float32)[:, None] if Nm > 0
            else jnp.zeros((1, 1), jnp.float32))
    return sph, quad, mesh


def _staircase(u, v, sx, sy, wf, hf):
    """In-kernel twin of shading._texel_xy (Material.cpp:82-88): image-
    relative nearest-texel (x, y) as i32. All inputs f32 tiles; u*sx >= 0 at
    every call site, so fmod(x, 1) == x - floor(x) and trunc == floor —
    both exact, bit-identical to the XLA jnp.fmod/jnp.trunc path."""
    xs = u * sx
    uu = xs - jnp.floor(xs)
    ys = v * sy
    vv = 1.0 - (ys - jnp.floor(ys))
    x = jnp.floor(uu * (wf - 1.0)).astype(jnp.int32)
    y = jnp.floor(vv * (hf - 1.0)).astype(jnp.int32)
    wi = wf.astype(jnp.int32)
    hi = hf.astype(jnp.int32)
    zero = jnp.zeros_like(x)
    x = jnp.clip(x, 0, jnp.maximum(wi - 1, zero))
    y = jnp.clip(y, 0, jnp.maximum(hi - 1, zero))
    return x, y


def _kernel(sph_ref, quad_ref, mesh_ref, *rest, S, Q, S_real,
            Q_real, Nm, eps, tex_out, p_tex=1, p_nm=1):
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref, lv_ref) = \
        rest[:8]
    rest = rest[8:]
    tmesh_refs = rest[:Nm]
    trimesh_refs = rest[Nm:2 * Nm]
    (j_ref, tid_ref, mid_ref, px_ref, py_ref, pz_ref,
     nx_ref, ny_ref, nz_ref, u_ref, v_ref,
     tx_ref, ty_ref, tz_ref, bx_ref, by_ref, bz_ref,
     row_ref, sub_ref, ptex_ref, pnm_ref, idxt_ref, idxn_ref) = \
        rest[2 * Nm:]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]
    a2 = dx * dx + dy * dy + dz * dz

    def default_outputs():
        j_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
        tid_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
        mid_ref[:] = jnp.zeros(ox.shape, jnp.int32)
        row_ref[:] = jnp.zeros(ox.shape, jnp.int32)
        sub_ref[:] = jnp.zeros(ox.shape, jnp.int32)
        idxt_ref[:] = jnp.zeros(ox.shape, jnp.int32)
        idxn_ref[:] = jnp.zeros(ox.shape, jnp.int32)
        for r in (px_ref, py_ref, pz_ref, nx_ref, ny_ref, u_ref, v_ref,
                  tx_ref, ty_ref, tz_ref, bx_ref, by_ref, bz_ref,
                  ptex_ref, pnm_ref):
            r[:] = jnp.zeros(ox.shape, jnp.float32)
        nz_ref[:] = jnp.ones(ox.shape, jnp.float32)

    default_outputs()

    @pl.when(jnp.sum(lv_ref[:]) > 0.0)
    def _():
        INF = kc.INF
        zero = jnp.zeros(ox.shape, jnp.float32)

        def upd_cache(cache, upd, vals):
            # vals: NCACHE scalars (python floats or traced scalars)
            return [jnp.where(upd, v, c) for c, v in zip(cache, vals)]

        best = jnp.full(ox.shape, INF, jnp.float32)
        j = jnp.full(ox.shape, -1, jnp.int32)
        tid = jnp.full(ox.shape, -1, jnp.int32)
        cache = [zero] * NCACHE
        # cache layout: 0:3 c|v0, 3 r, 4:7 mb, 7:10 er, 10:13 eu,
        # 13:16 tan, 16:19 bitan, 19 midf, 20 sx, 21 sy, 22 pair_wa,
        # 23 pair_ha, 24 pair_wb, 25 pair_hb, 26 pair_off, 27 ptex,
        # 28 pnm, 29 tex_off, 30 tex_w, 31 tex_h, 32 nm_off, 33 nm_w,
        # 34 nm_h

        def sph_body(s, carry):
            best, j, tid, cache = carry
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            r = sph_ref[s, 3]
            mx = sph_ref[s, 4]
            my = sph_ref[s, 5]
            mz = sph_ref[s, 6]
            valid = sph_ref[s, 7]
            midf = sph_ref[s, 8]
            # sphere_ts_planar expressions
            ocx = ox - (cx + tm * mx)
            ocy = oy - (cy + tm * my)
            ocz = oz - (cz + tm * mz)
            b = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
            cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            delta = b * b - 4.0 * a2 * cc
            t = (-b - jnp.sqrt(jnp.maximum(delta, 0.0))) / (2.0 * a2)
            ok = (delta >= 0.0) & (t >= eps) & (valid > 0.5)
            upd = ok & (t < best)
            best = jnp.where(upd, t, best)
            j = jnp.where(upd, s, j)
            # update ONLY the sphere slots (8 selects, not 35): stale
            # quad/tex slots on sphere-winner lanes are gated off by the
            # post-loop is_q masks — this is the 79-sphere scenes' hot
            # spot (random_spheres: the candidate loop dominates)
            for ci, v in zip((0, 1, 2, 3, 4, 5, 6, 19),
                             (cx, cy, cz, r, mx, my, mz, midf)):
                cache[ci] = jnp.where(upd, v, cache[ci])
            return best, j, tid, cache

        def quad_body(q, carry):
            best, j, tid, cache = carry
            nsx = quad_ref[q, 9]
            nsy = quad_ref[q, 10]
            nsz = quad_ref[q, 11]
            # quad_ts_planar expressions (stored normal + precomputed dots)
            dotRN = dx * nsx + dy * nsy + dz * nsz
            o_n = ox * nsx + oy * nsy + oz * nsz
            D = quad_ref[q, 15] + tm * quad_ref[q, 16]
            t = (D - o_n) / jnp.where(dotRN == 0.0, 1e-30, dotRN)
            ex = quad_ref[q, 3]
            ey = quad_ref[q, 4]
            ez = quad_ref[q, 5]
            o_er = ox * ex + oy * ey + oz * ez
            d_er = dx * ex + dy * ey + dz * ez
            s1 = o_er + t * d_er - (quad_ref[q, 17] + tm * quad_ref[q, 18])
            ux = quad_ref[q, 6]
            uy = quad_ref[q, 7]
            uz = quad_ref[q, 8]
            o_eu = ox * ux + oy * uy + oz * uz
            d_eu = dx * ux + dy * uy + dz * uz
            s2 = o_eu + t * d_eu - (quad_ref[q, 19] + tm * quad_ref[q, 20])
            er2 = quad_ref[q, 21]
            eu2 = quad_ref[q, 22]
            front = dotRN < 0.0
            two_sided = quad_ref[q, 23] > 0.5
            ok = (dotRN != 0.0) & (front | two_sided) & (t >= eps)
            ok &= (s1 >= 0.0) & (s1 <= er2) & (s2 >= 0.0) & (s2 <= eu2)
            ok &= quad_ref[q, 24] > 0.5
            upd = ok & (t < best)
            best = jnp.where(upd, t, best)
            j = jnp.where(upd, S + q, j)
            cache = upd_cache(cache, upd, [
                quad_ref[q, 0], quad_ref[q, 1], quad_ref[q, 2], 0.,
                quad_ref[q, 12], quad_ref[q, 13], quad_ref[q, 14],
                ex, ey, ez, ux, uy, uz,
                quad_ref[q, 26], quad_ref[q, 27], quad_ref[q, 28],
                quad_ref[q, 29], quad_ref[q, 30], quad_ref[q, 31],
                quad_ref[q, 25],
                quad_ref[q, 32], quad_ref[q, 33], quad_ref[q, 34],
                quad_ref[q, 35], quad_ref[q, 36], quad_ref[q, 37],
                quad_ref[q, 38], quad_ref[q, 39], quad_ref[q, 40],
                quad_ref[q, 41], quad_ref[q, 42], quad_ref[q, 43],
                quad_ref[q, 44], quad_ref[q, 45], quad_ref[q, 46]])
            return best, j, tid, cache

        # loop only over REAL rows (pads carry valid=0 and can never win)
        carry = jax.lax.fori_loop(0, S_real, sph_body,
                                  (best, j, tid, cache))
        best, j, tid, cache = jax.lax.fori_loop(0, Q_real, quad_body,
                                                carry)

        # mesh candidates: per-mesh closest raw hit (VMEM inputs from the
        # traverse kernel), scene-level eps cut (Scene.h:224)
        for m in range(Nm):
            traw = tmesh_refs[m][:]
            t = jnp.where(traw >= eps, traw, INF)
            upd = t < best
            best = jnp.where(upd, t, best)
            j = jnp.where(upd, S + Q + m, j)
            tid = jnp.where(upd, trimesh_refs[m][:], tid)
            # only the material id: mesh winners' p/n/u/v/tex outputs are
            # all replaced or is_q-gated downstream (stale slots unused)
            cache[19] = jnp.where(upd, mesh_ref[m, 0], cache[19])

        # ---- post-loop hit detail from the winner's cached params ------
        # sphere (sphere_hit_detail_planar)
        tcx = cache[0] + tm * cache[4]
        tcy = cache[1] + tm * cache[5]
        tcz = cache[2] + tm * cache[6]
        ocx = ox - tcx
        ocy = oy - tcy
        ocz = oz - tcz
        b = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
        cc = ocx * ocx + ocy * ocy + ocz * ocz - cache[3] * cache[3]
        delta = b * b - 4.0 * a2 * cc
        sq = jnp.sqrt(jnp.maximum(delta, 1e-12))
        ts = (-b - sq) / (2.0 * a2)
        psx = ox + ts * dx
        psy = oy + ts * dy
        psz = oz + ts * dz
        nsx0 = psx - tcx
        nsy0 = psy - tcy
        nsz0 = psz - tcz
        inv = 1.0 / jnp.maximum(
            jnp.sqrt(nsx0 * nsx0 + nsy0 * nsy0 + nsz0 * nsz0), 1e-20)
        nsx, nsy, nsz = nsx0 * inv, nsy0 * inv, nsz0 * inv

        # quad (quad_hit_detail_planar): normal recomputed from er x eu
        ex, ey, ez = cache[7], cache[8], cache[9]
        ux, uy, uz = cache[10], cache[11], cache[12]
        cxq = ey * uz - ez * uy
        cyq = ez * ux - ex * uz
        czq = ex * uy - ey * ux
        invq = 1.0 / jnp.maximum(
            jnp.sqrt(cxq * cxq + cyq * cyq + czq * czq), 1e-20)
        nqx, nqy, nqz = cxq * invq, cyq * invq, czq * invq
        blx = cache[0] + tm * cache[4]
        bly = cache[1] + tm * cache[5]
        blz = cache[2] + tm * cache[6]
        dotRN = dx * nqx + dy * nqy + dz * nqz
        safe = jnp.where(jnp.abs(dotRN) < 1e-9,
                         jnp.where(dotRN < 0, -1e-9, 1e-9), dotRN)
        tq = ((blx * nqx + bly * nqy + blz * nqz)
              - (ox * nqx + oy * nqy + oz * nqz)) / safe
        pqx = ox + tq * dx
        pqy = oy + tq * dy
        pqz = oz + tq * dz
        qx, qy, qz = pqx - blx, pqy - bly, pqz - blz
        uq = (qx * ex + qy * ey + qz * ez) / jnp.maximum(
            ex * ex + ey * ey + ez * ez, 1e-30)
        vq = (qx * ux + qy * uy + qz * uz) / jnp.maximum(
            ux * ux + uy * uy + uz * uz, 1e-30)

        is_q = (j >= S) & (j < S + Q)
        miss = best >= INF * 0.5
        j_ref[:] = jnp.where(miss, -1, j)
        tid_ref[:] = tid
        mid_ref[:] = cache[19].astype(jnp.int32)

        if tex_out:
            # pair-atlas texel index (integrator._gather_hit_p use_pair
            # branch): xa/ya from the primary dims, xb/yb the product-
            # region staircase; rel = (ya+yb)*wc + xa+xb. Only quad
            # winners can be textured here (sphere u/v need theta/phi —
            # scenes with textured spheres are routed to the XLA path by
            # scene.sphere_uv_needed). Sphere/mesh winners carry an
            # all-zero cache -> row pair_off=0, sub 0, ptex=pnm=0.
            # sphere/mesh winners may carry STALE quad tex slots (the
            # candidate loops only write their own slots) — gate every
            # tex output on is_q so they read as untextured, exactly as
            # the old all-zero cache did
            izero = jnp.zeros(ox.shape, jnp.int32)
            sx, sy = cache[20], cache[21]
            xa, ya = _staircase(uq, vq, sx, sy, cache[22], cache[23])
            xb, yb = _staircase(uq, vq, sx, sy, cache[24], cache[25])
            wc = cache[22].astype(jnp.int32) + jnp.maximum(
                cache[24].astype(jnp.int32) - 1, 0)
            rel = (ya + yb) * wc + xa + xb
            row_ref[:] = jnp.where(
                is_q, cache[26].astype(jnp.int32)
                + jax.lax.shift_right_logical(rel, 4), izero)
            sub_ref[:] = jnp.where(is_q, rel & 15, izero)
            ptex_ref[:] = jnp.where(is_q, cache[27], zero)
            pnm_ref[:] = jnp.where(is_q, cache[28], zero)
            if tex_out >= 2:
                # true atlas indices for the record path (the replay
                # backward's texel-cotangent fold): same staircase as the
                # XLA shading._texel_xy path (integrator record branch)
                xt, yt = _staircase(uq, vq, sx, sy, cache[30], cache[31])
                it = cache[29].astype(jnp.int32) \
                    + yt * cache[30].astype(jnp.int32) + xt
                idxt_ref[:] = jnp.where(is_q,
                                        jnp.clip(it, 0, p_tex - 1), izero)
                xn, yn = _staircase(uq, vq, sx, sy, cache[33], cache[34])
                inn = cache[32].astype(jnp.int32) \
                    + yn * cache[33].astype(jnp.int32) + xn
                idxn_ref[:] = jnp.where(is_q,
                                        jnp.clip(inn, 0, p_nm - 1), izero)
        px_ref[:] = jnp.where(is_q, pqx, psx)
        py_ref[:] = jnp.where(is_q, pqy, psy)
        pz_ref[:] = jnp.where(is_q, pqz, psz)
        nx_ref[:] = jnp.where(is_q, nqx, nsx)
        ny_ref[:] = jnp.where(is_q, nqy, nsy)
        nz_ref[:] = jnp.where(is_q, nqz, nsz)
        u_ref[:] = uq
        v_ref[:] = vq
        tx_ref[:] = cache[13]
        ty_ref[:] = cache[14]
        tz_ref[:] = cache[15]
        bx_ref[:] = cache[16]
        by_ref[:] = cache[17]
        bz_ref[:] = cache[18]


def first_hits(scene, o, d, time, t_mesh, tri_mesh, live=None, eps=1e-5,
               tex_out=False):
    """Fused closest-hit + detail for planar rays.

    o, d, time planar [N]; t_mesh/tri_mesh: [Nm, N] per-mesh closest raw
    hits (traverse kernel outputs; pass empty [0, N] when no meshes).
    Returns dict(j [-1=miss], tid, mid, p, n, u, v, tan, bitan) — p/n/u/v
    valid for sphere/quad winners (mesh detail is re-derived in XLA).
    `tex_out` (static int; requires scene.pair_mode and not
    scene.sphere_uv_needed): level >= 1 additionally returns the
    pair-atlas texel index record (row, sub, ptex, pnm) computed
    in-kernel for quad winners — the input of the fused-bounce pair
    gather; level >= 2 also returns the true atlas indices (idx_t,
    idx_n) for the record path's texel-cotangent fold.
    Selection-only + detail record: non-differentiable (stop_gradient'ed);
    gradients flow through the XLA/replay re-derivation."""
    N = o[0].shape[0]
    S = scene.sph_center.shape[0]
    Q = scene.quad_v0.shape[0]
    Nm = scene.mesh_mat.shape[0]
    sph_tab, quad_tab, mesh_tab = intersect_tables(scene)

    tr = kc.TILE_ROWS
    n_pad = kc.pad_rows(N, tr)
    rows = n_pad // kc.LANES
    sg = jax.lax.stop_gradient
    tiles = [kc.to_tiles(sg(x), n_pad, fill=1.0) for x in d]
    otiles = [kc.to_tiles(sg(x), n_pad) for x in o]
    tmt = kc.to_tiles(sg(time), n_pad)
    if live is None:
        lv = jnp.ones((rows, kc.LANES), jnp.float32)
    else:
        lv = kc.to_tiles(sg(jnp.where(live, 1.0, 0.0)), n_pad)
    mesh_in = []
    for m in range(Nm):
        mesh_in.append(kc.to_tiles(sg(t_mesh[m]), n_pad, fill=kc.INF))
    for m in range(Nm):
        mesh_in.append(kc.to_tiles(sg(tri_mesh[m]), n_pad, fill=-1))

    kern = functools.partial(_kernel, S=S, Q=Q,
                             S_real=min(scene.n_sph_real, S),
                             Q_real=min(scene.n_quad_real, Q),
                             Nm=Nm, eps=float(eps), tex_out=int(tex_out),
                             p_tex=scene.tex_data.shape[0],
                             p_nm=scene.nm_data.shape[0])
    ray_spec = pl.BlockSpec((tr, kc.LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    i32 = jnp.int32
    out_dtypes = [i32, i32, i32] + [f32] * 14 + [i32, i32, f32, f32,
                                                  i32, i32]
    outs = pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [ray_spec] * (8 + 2 * Nm),
        out_specs=tuple([ray_spec] * 23),
        out_shape=tuple(jax.ShapeDtypeStruct((rows, kc.LANES), dt)
                        for dt in out_dtypes),
        interpret=kc.interpret(),
    )(sg(sph_tab), sg(quad_tab), sg(mesh_tab),
      *otiles, *tiles, tmt, lv, *mesh_in)
    f = [kc.from_tiles(x, N) for x in outs]
    out = dict(j=f[0], tid=f[1], mid=f[2],
               p=(f[3], f[4], f[5]), n=(f[6], f[7], f[8]),
               u=f[9], v=f[10], tan=(f[11], f[12], f[13]),
               bitan=(f[14], f[15], f[16]))
    if tex_out:
        out.update(row=f[17], sub=f[18], ptex=f[19], pnm=f[20])
    if int(tex_out) >= 2:
        out.update(idx_t=f[21], idx_n=f[22])
    return out
