"""Pallas soft-shadow kernel: the reference's per-light NB_ECH-sample
stochastic-transparency shadow loop (`/root/reference/src/Scene.h:319-334` +
`computeShadow` Scene.h:235-255) fused into VMEM.

The jnp path materializes [S+Q, K*N] candidate tensors per light per bounce
(~260 MB at 850x480 — it OOM-compiles backrooms_pool and runs
random_spheres at 0.7 M rays/s). Here each (light, sample, occluder) pass
lives in vector registers over a (TILE_ROWS, 128) ray tile; scene tables
sit in SMEM and are read as scalars inside fori loops.

Semantics mirror `integrator._direct_lighting_p`/`_shadow_blocked_p`
op-for-op, including the RNG sub-streams (int32 PCG twin — bit-identical,
see kernels/common.py): light-position jitter keys (purpose 4, light i,
lane k*3+a+2 cube / k*2+a+2 sphere), Bernoulli keys (purpose 5, light i,
lane k+2, occluder row o+2 with quads at rows S..S+Q-1).

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


def _kernel(light_ref, sph_ref, quad_ref, *rest, L, S, Q, S_real,
            Q_real, K, eps, reference_sampler, mesh_ranges,
            leaf_width=4):
    if mesh_ranges:
        (mesh_ref, nodes_f_ref, nodes_i_ref, leaf_ref,
         px_ref, py_ref, pz_ref, tm_ref, key_ref, lv_ref, out_ref) = rest
    else:
        (px_ref, py_ref, pz_ref, tm_ref, key_ref, lv_ref, out_ref) = rest
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    tm = tm_ref[:]
    keys = key_ref[:]

    def one_light(i):
        lpx = light_ref[i, 0]
        lpy = light_ref[i, 1]
        lpz = light_ref[i, 2]
        delta = light_ref[i, 3]
        skey = kc.mix_i32(kc.mix_i32(keys, 4), i)   # SHADOW_LIGHT_POS
        bkey = kc.mix_i32(kc.mix_i32(keys, 5), i)   # SHADOW_BERNOULLI

        def sample_k(k, acc):
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
            a2 = sdx * sdx + sdy * sdy + sdz * sdz
            bk = kc.mix_i32(bkey, k + 2)

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

            # loop only over REAL rows (pads carry valid=0)
            blocked = jax.lax.fori_loop(
                0, S_real, sph_body, jnp.zeros_like(px))
            blocked = jax.lax.fori_loop(0, Q_real, quad_body, blocked)

            # Mesh occluders (Scene::computeShadow scans meshes too,
            # Scene.h:244-249): ONE candidate per mesh — its closest raw
            # hit, rejected wholesale below eps (quirk parity with
            # integrator._scene_candidates_p's eps cut). The packet walk
            # prunes nodes beyond the light distance (hits there can't
            # block).
            from tracer.kernels.traverse import packet_walk
            for m, (root, end) in enumerate(mesh_ranges):
                bt, _ = packet_walk(nodes_f_ref, nodes_i_ref, leaf_ref,
                                    root, end, sox, soy, soz,
                                    sdx, sdy, sdz, tmax=t_light,
                                    leaf_width=leaf_width)
                transp_m = mesh_ref[m, 0]
                cand = (bt >= eps) & (bt < t_light)
                u_o = kc.to_unit_i32(kc.pcg_i32(
                    kc.mix_i32(bk, S + Q + m + 2)))
                blocked = jnp.maximum(
                    blocked, jnp.where(cand & (u_o > transp_m), 1.0, 0.0))
            return acc + blocked

        acc = jax.lax.fori_loop(0, K, sample_k, jnp.zeros_like(px))
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
            one_light(i)


def shadow_factors(scene, cfg, p, time, keys, eps, live=None):
    """Shadow factor per light for planar hit points p: returns a list of
    L planar [N] float32 arrays (1 = fully lit). Non-differentiable (the
    Bernoulli outcomes carry zero gradient in the jnp path too).

    `live` [N] bool/f32: lanes whose result is consumed — fully-dead tiles
    skip the whole shadow loop and return the default 1.0 (their outputs
    are where-masked away by the integrator)."""
    N = p[0].shape[0]
    L = scene.light_pos.shape[0]
    if L == 0:
        return []
    light_tab, sph_tab, quad_tab = shadow_tables(scene)
    S = sph_tab.shape[0]
    Q = quad_tab.shape[0]
    K = cfg.shadow_rays
    Nm = scene.mesh_mat.shape[0]

    # Mesh scenes walk the BVH per (light, sample): 32x128-ray packets
    # amortize the walk's per-node scalar overhead 4x better than the
    # original 8x128 (same tuning as traverse.TILE — the walk is
    # node-visit bound, and K shadow samples each re-walk the tree);
    # scene-table-only kernels use big tiles (fewer grid steps).
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
    if Nm > 0:
        from tracer.kernels.traverse import traverse_tables
        nodes_f, nodes_i, leaf = traverse_tables(scene)
        mesh_tab = scene.mat_transparency[scene.mesh_mat][:, None]  # [Nm,1]
        mesh_inputs = [sg(mesh_tab), sg(nodes_f), sg(nodes_i), sg(leaf)]
        mesh_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] \
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        mesh_ranges = tuple(zip(scene.mesh_root, scene.mesh_end))

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
        interpret=kc.interpret(),
    )(sg(light_tab), sg(sph_tab), sg(quad_tab), *mesh_inputs,
      px, py, pz, tm, ki, lv)
    return [kc.from_tiles(out[i], N) for i in range(L)]
