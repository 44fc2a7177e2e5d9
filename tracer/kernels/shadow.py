"""Pallas soft-shadow kernel: the reference's per-light NB_ECH-sample
stochastic-transparency shadow loop (`/root/reference/src/Scene.h:319-334` +
`computeShadow` Scene.h:235-255) fused into VMEM.

The jnp path materializes [S+Q, K*N] candidate tensors per light per bounce
(~260 MB at 850x480 — it OOM-compiles backrooms_pool and runs
random_spheres at 0.7 M rays/s). Here each (light, sample, occluder) pass
lives in vector registers over a (TILE_ROWS, 128) ray tile; scene tables
sit in SMEM and are read as scalars inside fori loops.

Mesh scenes use a K-AMORTIZED UNION WALK: instead of K full BVH walks per
(light, mesh) — the round-4 structure, and the dominant cost on every mesh
scene (PERF.md) — ONE packet walk serves all K shadow samples of a light.
All K jittered targets sit within one light radius of the light center, so
the union of the K sample segments lies within distance rho = delta + eps
of the central segment hit-point -> light-center (interpolate at equal
fractions: |x_k(s) - c(s)| <= (1-s)*eps + s*delta). The walk therefore
descends nodes via a slab test of the CENTRAL ray against the rho-inflated
AABB, bounded by max_k min(bt_k, t_light_k) rescaled to central parameters
(t_central = t_k * T_c / T_k with T_k in [T_c - rho, T_c + rho]), with a
generous slack factor so float rounding can only ADD node visits. Inside a
leaf, each sample k keeps its OWN slab gate and its own triangle
arithmetic — bit-identical to the per-sample walk by the same
superset-visits + per-lane-gate argument as kernels/traverse.py. The walk
also early-exits per the reference's own optimization (Scene.h:244-249
`return true`): lanes already blocked by spheres/quads/earlier meshes are
masked out of the drive mask and the bound, so a fully-blocked packet
falls straight down the skip chain.

Semantics mirror `integrator._direct_lighting_p`/`_shadow_blocked_p`
op-for-op, including the RNG sub-streams (int32 PCG twin — bit-identical,
see kernels/common.py): light-position jitter keys (purpose 4, light i,
lane k*3+a+2 cube / k*2+a+2 sphere), Bernoulli keys (purpose 5, light i,
lane k+2, occluder row o+2 with quads at rows S..S+Q-1). Because every
occluder's Bernoulli draw is independently keyed by (ray, k, occluder
row), the blocked OR is evaluation-order independent — restructuring the
loops cannot change a single bit of the output.

Outputs are shadow FACTORS (1 - blocked_mean): discrete Bernoulli outcomes
whose gradient is zero by construction in the jnp path too — inputs are
stop_gradient'ed so autodiff never differentiates the pallas call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.kernels import common as kc
from tracer.kernels.traverse import TRI_COLS

GLASS = 1


def shadow_tables(scene):
    """Pack occluder/light tables (computed in XLA with the SAME expressions
    as the jnp candidate path, so per-object scalars are bit-identical)."""
    light_tab = jnp.concatenate(
        [scene.light_pos, (scene.light_radius / 2.0)[:, None]], axis=1)

    mbs = scene.mat_mb[scene.sph_mat]
    transp_s = scene.mat_transparency[scene.sph_mat]
    sph_tab = jnp.concatenate([
        scene.sph_center,                                   # 0:3
        (scene.sph_radius * scene.sph_radius)[:, None],     # 3
        mbs,                                                # 4:7
        scene.sph_valid[:, None],                           # 7
        transp_s[:, None],                                  # 8
    ], axis=1)

    n, er, eu = scene.quad_normal, scene.quad_er, scene.quad_eu
    v0 = scene.quad_v0
    mbq = scene.mat_mb[scene.quad_mat]
    is_glass = (scene.mat_type[scene.quad_mat] == GLASS).astype(jnp.float32)
    transp_q = scene.mat_transparency[scene.quad_mat]
    quad_tab = jnp.concatenate([
        n,                                                  # 0:3
        er,                                                 # 3:6
        eu,                                                 # 6:9
        jnp.sum(v0 * n, axis=-1)[:, None],                  # 9  v0_n
        jnp.sum(mbq * n, axis=-1)[:, None],                 # 10 mb_n
        jnp.sum(v0 * er, axis=-1)[:, None],                 # 11 v0_er
        jnp.sum(mbq * er, axis=-1)[:, None],                # 12 mb_er
        jnp.sum(v0 * eu, axis=-1)[:, None],                 # 13 v0_eu
        jnp.sum(mbq * eu, axis=-1)[:, None],                # 14 mb_eu
        jnp.sum(er * er, axis=-1)[:, None],                 # 15 er2
        jnp.sum(eu * eu, axis=-1)[:, None],                 # 16 eu2
        is_glass[:, None],                                  # 17
        scene.quad_valid[:, None],                          # 18
        transp_q[:, None],                                  # 19
    ], axis=1)
    return light_tab, sph_tab, quad_tab


def _sample_ray(reference_sampler, skey, k, delta, lpx, lpy, lpz,
                px, py, pz, eps):
    """Shadow sample k's (so, sd, t_light) — the exact expressions of the
    jnp megabatch path (integrator._shadow_factor_jnp), in order."""
    if reference_sampler:
        comps = []
        for a in range(3):
            u = kc.to_unit_i32(kc.pcg_i32(
                kc.mix_i32(skey, k * 3 + a + 2)))
            comps.append(-1.0 + 2.0 * u)
        rx, ry, rz = comps
        rn = jnp.maximum(jnp.sqrt(rx * rx + ry * ry + rz * rz),
                         1e-20)
        rx, ry, rz = rx / rn, ry / rn, rz / rn
    else:
        u0 = kc.to_unit_i32(kc.pcg_i32(kc.mix_i32(skey, k * 2 + 2)))
        u1 = kc.to_unit_i32(kc.pcg_i32(kc.mix_i32(skey, k * 2 + 3)))
        rz = 1.0 - 2.0 * u0
        rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - rz * rz))
        phi = 2.0 * jnp.pi * u1
        rx, ry = rr * jnp.cos(phi), rr * jnp.sin(phi)

    # lp = lpos + delta*ruv ; off = lp - p (vp.axpy/vp.sub order)
    offx = (delta * rx + lpx) - px
    offy = (delta * ry + lpy) - py
    offz = (delta * rz + lpz) - pz
    t_light = jnp.sqrt(offx * offx + offy * offy + offz * offz)
    inv = 1.0 / jnp.maximum(t_light, 1e-20)
    sdx, sdy, sdz = inv * offx, inv * offy, inv * offz
    sox = eps * sdx + px
    soy = eps * sdy + py
    soz = eps * sdz + pz
    return sox, soy, soz, sdx, sdy, sdz, t_light


def _table_pass(sph_ref, quad_ref, S_real, Q_real, S, eps, tm,
                sox, soy, soz, sdx, sdy, sdz, t_light, bk, blocked0):
    """Sphere + quad occluder scan for ONE shadow sample — the reference's
    computeShadow table half (Scene.h:236-243). tm: per-lane ray time."""
    a2 = sdx * sdx + sdy * sdy + sdz * sdz

    def sph_body(s, blocked):
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        r2 = sph_ref[s, 3]
        mx = sph_ref[s, 4]
        my = sph_ref[s, 5]
        mz = sph_ref[s, 6]
        valid = sph_ref[s, 7]
        transp = sph_ref[s, 8]
        ocx = sox - (cx + tm * mx)
        ocy = soy - (cy + tm * my)
        ocz = soz - (cz + tm * mz)
        b = 2.0 * (sdx * ocx + sdy * ocy + sdz * ocz)
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        dl = b * b - 4.0 * a2 * cc
        t = (-b - jnp.sqrt(jnp.maximum(dl, 0.0))) / (2.0 * a2)
        hit = (dl >= 0.0) & (t >= eps) & (valid > 0.5) \
            & (t < t_light)
        u_o = kc.to_unit_i32(kc.pcg_i32(kc.mix_i32(bk, s + 2)))
        # f32 0/1 carry: Mosaic cannot legalize scf.for with
        # i1-vector carries on this toolchain
        return jnp.maximum(blocked,
                           jnp.where(hit & (u_o > transp),
                                     1.0, 0.0))

    def quad_body(q, blocked):
        nx = quad_ref[q, 0]
        ny = quad_ref[q, 1]
        nz = quad_ref[q, 2]
        ex = quad_ref[q, 3]
        ey = quad_ref[q, 4]
        ez = quad_ref[q, 5]
        ux = quad_ref[q, 6]
        uy = quad_ref[q, 7]
        uz = quad_ref[q, 8]
        v0_n = quad_ref[q, 9]
        mb_n = quad_ref[q, 10]
        v0_er = quad_ref[q, 11]
        mb_er = quad_ref[q, 12]
        v0_eu = quad_ref[q, 13]
        mb_eu = quad_ref[q, 14]
        er2 = quad_ref[q, 15]
        eu2 = quad_ref[q, 16]
        is_glass = quad_ref[q, 17]
        valid = quad_ref[q, 18]
        transp = quad_ref[q, 19]
        dotRN = sdx * nx + sdy * ny + sdz * nz
        o_n = sox * nx + soy * ny + soz * nz
        D = v0_n + tm * mb_n
        t = (D - o_n) / jnp.where(dotRN == 0.0, 1e-30, dotRN)
        o_er = sox * ex + soy * ey + soz * ez
        d_er = sdx * ex + sdy * ey + sdz * ez
        s1 = o_er + t * d_er - (v0_er + tm * mb_er)
        o_eu = sox * ux + soy * uy + soz * uz
        d_eu = sdx * ux + sdy * uy + sdz * uz
        s2 = o_eu + t * d_eu - (v0_eu + tm * mb_eu)
        front = dotRN < 0.0
        two_sided = is_glass > 0.5
        ok = (dotRN != 0.0) & (front | two_sided) & (t >= eps)
        ok &= (s1 >= 0.0) & (s1 <= er2) & (s2 >= 0.0) & (s2 <= eu2)
        ok &= valid > 0.5
        hit = ok & (t < t_light)
        u_o = kc.to_unit_i32(kc.pcg_i32(kc.mix_i32(bk, S + q + 2)))
        return jnp.maximum(blocked,
                           jnp.where(hit & (u_o > transp),
                                     1.0, 0.0))

    blocked = jax.lax.fori_loop(0, S_real, sph_body, blocked0)
    blocked = jax.lax.fori_loop(0, Q_real, quad_body, blocked)
    return blocked


def _kernel(light_ref, sph_ref, quad_ref, *rest, L, S, Q, S_real,
            Q_real, K, eps, reference_sampler, mesh_ranges,
            leaf_width=4):
    if mesh_ranges:
        (mesh_ref, nodes_f_ref, nodes_i_ref, leaf_ref,
         px_ref, py_ref, pz_ref, tm_ref, key_ref, lv_ref, out_ref,
         so_s, sd_s, is_s, tl_s, bk_s, blk_s, bts_s) = rest
    else:
        (px_ref, py_ref, pz_ref, tm_ref, key_ref, lv_ref, out_ref) = rest
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    tm = tm_ref[:]
    keys = key_ref[:]

    def one_light(i):
        """Table-only scenes: K-sample fori, all state in registers."""
        lpx = light_ref[i, 0]
        lpy = light_ref[i, 1]
        lpz = light_ref[i, 2]
        delta = light_ref[i, 3]
        skey = kc.mix_i32(kc.mix_i32(keys, 4), i)   # SHADOW_LIGHT_POS
        bkey = kc.mix_i32(kc.mix_i32(keys, 5), i)   # SHADOW_BERNOULLI

        def sample_k(k, acc):
            sox, soy, soz, sdx, sdy, sdz, t_light = _sample_ray(
                reference_sampler, skey, k, delta, lpx, lpy, lpz,
                px, py, pz, eps)
            bk = kc.mix_i32(bkey, k + 2)
            blocked = _table_pass(sph_ref, quad_ref, S_real, Q_real, S,
                                  eps, tm, sox, soy, soz, sdx, sdy, sdz,
                                  t_light, bk, jnp.zeros_like(px))
            return acc + blocked

        acc = jax.lax.fori_loop(0, K, sample_k, jnp.zeros_like(px))
        out_ref[i] = 1.0 - acc / jnp.float32(K)

    def one_light_mesh(i):
        """Mesh scenes: precompute the K sample rays + table blocked state
        into VMEM scratch, then ONE union packet walk per mesh serves all
        K samples (module docstring)."""
        lpx = light_ref[i, 0]
        lpy = light_ref[i, 1]
        lpz = light_ref[i, 2]
        delta = light_ref[i, 3]
        skey = kc.mix_i32(kc.mix_i32(keys, 4), i)
        bkey = kc.mix_i32(kc.mix_i32(keys, 5), i)

        def prep_k(k, _):
            sox, soy, soz, sdx, sdy, sdz, t_light = _sample_ray(
                reference_sampler, skey, k, delta, lpx, lpy, lpz,
                px, py, pz, eps)
            bk = kc.mix_i32(bkey, k + 2)
            so_s[0, k] = sox
            so_s[1, k] = soy
            so_s[2, k] = soz
            sd_s[0, k] = sdx
            sd_s[1, k] = sdy
            sd_s[2, k] = sdz
            is_s[0, k] = 1.0 / sdx
            is_s[1, k] = 1.0 / sdy
            is_s[2, k] = 1.0 / sdz
            tl_s[k] = t_light
            bk_s[k] = bk
            blk_s[k] = _table_pass(sph_ref, quad_ref, S_real, Q_real, S,
                                   eps, tm, sox, soy, soz, sdx, sdy, sdz,
                                   t_light, bk, jnp.zeros_like(px))
            return 0

        jax.lax.fori_loop(0, K, prep_k, 0)

        # central segment hit-point -> light CENTER; every sample segment
        # stays within rho of it (docstring bound). Slack terms make the
        # prune strictly conservative under f32 rounding.
        live = lv_ref[:] > 0.5
        cx0 = lpx - px
        cy0 = lpy - py
        cz0 = lpz - pz
        t_c = jnp.sqrt(cx0 * cx0 + cy0 * cy0 + cz0 * cz0)
        rho = delta + 2.0 * eps + 1e-4
        inv_tc = 1.0 / jnp.maximum(t_c, 1e-20)
        icx = 1.0 / (cx0 * inv_tc)
        icy = 1.0 / (cy0 * inv_tc)
        icz = 1.0 / (cz0 * inv_tc)
        force = t_c <= 2.0 * rho        # hit point inside/near the light
        scale = jnp.where(force, 1e30,
                          t_c / jnp.maximum(t_c - rho, 1e-20)) * 1.0001

        def near_union():
            """max_k over unblocked samples of min(bt_k, t_light_k) — the
            only bound any live sample still needs. Stale-high values are
            conservative, so it is refreshed only after leaf updates."""
            def nm_body(k, nm):
                nk = jnp.minimum(bts_s[k], tl_s[k])
                return jnp.maximum(nm, jnp.where(blk_s[k] > 0.5, 0.0, nk))
            return jax.lax.fori_loop(0, K, nm_body,
                                     jnp.zeros_like(px))

        for m, (root, end) in enumerate(mesh_ranges):
            def init_k(k, _):
                bts_s[k] = jnp.full(px.shape, kc.INF, jnp.float32)
                return 0
            jax.lax.fori_loop(0, K, init_k, 0)
            drive0 = live & (near_union() > 0.0)

            def cond(carry):
                return carry[0] < end

            def body(carry):
                node, nearm, drive = carry
                nf = nodes_f_ref[pl.ds(node, 1), :]        # (1, 8)
                t0x = (nf[0, 0] - rho - px) * icx
                t1x = (nf[0, 3] + rho - px) * icx
                t0y = (nf[0, 1] - rho - py) * icy
                t1y = (nf[0, 4] + rho - py) * icy
                t0z = (nf[0, 2] - rho - pz) * icz
                t1z = (nf[0, 5] + rho - pz) * icz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                near_c = nearm * scale + 1e-5
                lane_hit = (jnp.minimum(near_c, tf) + 1e-6
                            > jnp.maximum(0.0, tn)) | force
                lane_hit &= drive
                any_hit = jnp.any(lane_hit)
                ni = nodes_i_ref[pl.ds(node, 1), :]        # (1, 2)
                leaf_row = ni[0, 0]
                skip = ni[0, 1]
                is_leaf = leaf_row >= 0

                def do_leaf(nearm):
                    row = leaf_ref[pl.ds(leaf_row, 1), :]

                    def leaf_k(k, _):
                        sox = so_s[0, k]
                        soy = so_s[1, k]
                        soz = so_s[2, k]
                        sdx = sd_s[0, k]
                        sdy = sd_s[1, k]
                        sdz = sd_s[2, k]
                        invx = is_s[0, k]
                        invy = is_s[1, k]
                        invz = is_s[2, k]
                        bt = bts_s[k]
                        tlk = tl_s[k]
                        # sample k's OWN slab gate of THIS node — the
                        # exact expressions of traverse.packet_walk
                        s0x = (nf[0, 0] - sox) * invx
                        s1x = (nf[0, 3] - sox) * invx
                        s0y = (nf[0, 1] - soy) * invy
                        s1y = (nf[0, 4] - soy) * invy
                        s0z = (nf[0, 2] - soz) * invz
                        s1z = (nf[0, 5] - soz) * invz
                        stn = jnp.maximum(
                            jnp.maximum(jnp.minimum(s0x, s1x),
                                        jnp.minimum(s0y, s1y)),
                            jnp.minimum(s0z, s1z))
                        stf = jnp.minimum(
                            jnp.minimum(jnp.maximum(s0x, s1x),
                                        jnp.maximum(s0y, s1y)),
                            jnp.maximum(s0z, s1z))
                        near = jnp.minimum(bt, tlk)
                        lhit = jnp.minimum(near, stf) \
                            > jnp.maximum(0.0, stn)
                        for s in range(leaf_width):
                            o = s * TRI_COLS
                            nx = row[0, o + 3]
                            ny = row[0, o + 4]
                            nz = row[0, o + 5]
                            D = row[0, o + 6]
                            dotRN = sdx * nx + sdy * ny + sdz * nz
                            o_n = sox * nx + soy * ny + soz * nz
                            t = (D - o_n) / jnp.where(dotRN == 0.0,
                                                      1e-30, dotRN)
                            hx = sox + t * sdx
                            hy = soy + t * sdy
                            hz = soz + t * sdz
                            ax = row[0, o + 0]
                            ay = row[0, o + 1]
                            az = row[0, o + 2]
                            v2x, v2y, v2z = hx - ax, hy - ay, hz - az
                            v0x = row[0, o + 7]
                            v0y = row[0, o + 8]
                            v0z = row[0, o + 9]
                            v1x = row[0, o + 10]
                            v1y = row[0, o + 11]
                            v1z = row[0, o + 12]
                            d20 = v2x * v0x + v2y * v0y + v2z * v0z
                            d21 = v2x * v1x + v2y * v1y + v2z * v1z
                            d00 = row[0, o + 13]
                            d01 = row[0, o + 14]
                            d11 = row[0, o + 15]
                            den = row[0, o + 16]
                            w1 = (d11 * d20 - d01 * d21) / den
                            w2 = (d00 * d21 - d01 * d20) / den
                            w0 = 1.0 - w1 - w2
                            ok = (dotRN < 0.0) & (t >= 0.0)
                            for w in (w0, w1, w2):
                                ok &= (w >= 0.0) & (w <= 1.0)
                            upd = lhit & ok & (t < bt)
                            bt = jnp.where(upd, t, bt)
                        bts_s[k] = bt
                        return 0

                    jax.lax.fori_loop(0, K, leaf_k, 0)
                    return near_union()

                nearm = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                     lambda nm: nm, nearm)
                nxt = jnp.where(any_hit,
                                jnp.where(is_leaf, skip, node + 1), skip)
                return nxt, nearm, drive

            nearm0 = near_union()
            jax.lax.while_loop(cond, body,
                               (jnp.int32(root), nearm0, drive0))

            transp_m = mesh_ref[m, 0]

            def bern_k(k, _):
                bt = bts_s[k]
                cand = (bt >= eps) & (bt < tl_s[k])
                u_o = kc.to_unit_i32(kc.pcg_i32(
                    kc.mix_i32(bk_s[k], S + Q + m + 2)))
                blk_s[k] = jnp.maximum(
                    blk_s[k],
                    jnp.where(cand & (u_o > transp_m), 1.0, 0.0))
                return 0

            jax.lax.fori_loop(0, K, bern_k, 0)

        def acc_k(k, acc):
            return acc + blk_s[k]
        acc = jax.lax.fori_loop(0, K, acc_k, jnp.zeros_like(px))
        out_ref[i] = 1.0 - acc / jnp.float32(K)

    # Wavefront work-skipping: rays die together spatially, so whole
    # (TILE_ROWS x 128) tiles go dead by bounce 2-3 (occupancy counters:
    # rt_in_a_weekend b6 is 3% live from bounce 3). A dead tile writes the
    # default and skips all L x K x (S+Q) shadow tests.
    for i in range(L):
        out_ref[i] = jnp.ones_like(px)

    @pl.when(jnp.sum(lv_ref[:]) > 0.0)
    def _():
        for i in range(L):
            if mesh_ranges:
                one_light_mesh(i)
            else:
                one_light(i)


def shadow_factors(scene, cfg, p, time, keys, eps, live=None):
    """Shadow factor per light for planar hit points p: returns a list of
    L planar [N] float32 arrays (1 = fully lit). Non-differentiable (the
    Bernoulli outcomes carry zero gradient in the jnp path too).

    `live` [N] bool/f32: lanes whose result is consumed — fully-dead tiles
    skip the whole shadow loop and return the default 1.0 (their outputs
    are where-masked away by the integrator), and on mesh scenes dead
    lanes are masked out of the union walk's drive set."""
    N = p[0].shape[0]
    L = scene.light_pos.shape[0]
    if L == 0:
        return []
    light_tab, sph_tab, quad_tab = shadow_tables(scene)
    S = sph_tab.shape[0]
    Q = quad_tab.shape[0]
    K = cfg.shadow_rays
    Nm = scene.mesh_mat.shape[0]

    # Mesh scenes walk the BVH once per (light, mesh): 32x128-ray packets
    # amortize the walk's per-node scalar overhead (same tuning as
    # traverse.TILE); scene-table-only kernels use big tiles (fewer grid
    # steps).
    tr = 32 if Nm > 0 else kc.TILE_ROWS
    n_pad = kc.pad_rows(N, tr)
    rows = n_pad // kc.LANES
    sg = jax.lax.stop_gradient
    px = kc.to_tiles(sg(p[0]), n_pad)
    py = kc.to_tiles(sg(p[1]), n_pad)
    pz = kc.to_tiles(sg(p[2]), n_pad)
    tm = kc.to_tiles(sg(time), n_pad)
    ki = kc.to_tiles(jax.lax.bitcast_convert_type(keys, jnp.int32), n_pad)
    if live is None:
        lv = jnp.ones((rows, kc.LANES), jnp.float32)
    else:
        lv = kc.to_tiles(sg(jnp.where(live, 1.0, 0.0)), n_pad)

    mesh_inputs = []
    mesh_specs = []
    mesh_ranges = ()
    scratch = []
    if Nm > 0:
        from tracer.kernels.traverse import traverse_tables
        nodes_f, nodes_i, leaf = traverse_tables(scene)
        mesh_tab = scene.mat_transparency[scene.mesh_mat][:, None]  # [Nm,1]
        mesh_inputs = [sg(mesh_tab), sg(nodes_f), sg(nodes_i), sg(leaf)]
        mesh_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] \
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        mesh_ranges = tuple(zip(scene.mesh_root, scene.mesh_end))
        scratch = [
            pltpu.VMEM((3, K, tr, kc.LANES), jnp.float32),  # so_s
            pltpu.VMEM((3, K, tr, kc.LANES), jnp.float32),  # sd_s
            pltpu.VMEM((3, K, tr, kc.LANES), jnp.float32),  # is_s (1/sd)
            pltpu.VMEM((K, tr, kc.LANES), jnp.float32),     # tl_s
            pltpu.VMEM((K, tr, kc.LANES), jnp.int32),       # bk_s
            pltpu.VMEM((K, tr, kc.LANES), jnp.float32),     # blk_s
            pltpu.VMEM((K, tr, kc.LANES), jnp.float32),     # bts_s
        ]

    kern = functools.partial(
        _kernel, L=L, S=S, Q=Q, S_real=min(scene.n_sph_real, S),
        Q_real=min(scene.n_quad_real, Q), K=K, eps=float(eps),
        reference_sampler=(cfg.compat == "reference"),
        mesh_ranges=mesh_ranges, leaf_width=scene.leaf_width)
    grid = rows // tr
    ray_spec = pl.BlockSpec((tr, kc.LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + mesh_specs + [ray_spec] * 6,
        out_specs=pl.BlockSpec((L, tr, kc.LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, rows, kc.LANES), jnp.float32),
        scratch_shapes=scratch,
        interpret=kc.interpret(),
    )(sg(light_tab), sg(sph_tab), sg(quad_tab), *mesh_inputs,
      px, py, pz, tm, ki, lv)
    return [kc.from_tiles(out[i], N) for i in range(L)]
