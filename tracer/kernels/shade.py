"""Pallas fused shade+scatter kernel: everything a bounce does AFTER the
first-hit kernel — texel decode, checker/emission select, normal mapping,
direct lighting, BSDF scatter and the wavefront state update — in ONE
VMEM-resident pass over the ray tile.

This is the recast of the shading half of `Scene::rayTraceRecursive`
(`/root/reference/src/Scene.h:270-342`) + `Material::{scatter, emit,
texture, get_normal}` (`Material.cpp:13-130`): the jnp path runs this
chain as ~10 XLA fusions with every intermediate round-tripping HBM; here
a (TILE_ROWS x 128) ray tile is read once and written once. The only XLA
work left per bounce is the pair-atlas row gather (hard per-row floor,
benchmarks/gather_exp11.py), a near-free [N,32]->[32,N] transpose that
delivers the rows in planar layout, and the one-hot MXU material-row
fetch (integrator._rows — 0.08 ms/bounce measured, and exact: its 0/1
matmul reproduces table values bitwise).

Semantics mirror `integrator.{_gather_hit_p, _direct_lighting_p,
_scatter_p}` and `shading.skybox_color_p` op-for-op (same expression
order, same RNG sub-streams via the int32 PCG twin — kernels/common.py),
so results are bit-identical to the jnp path. Inputs are
stop_gradient'ed: gradients flow through the record-replay custom VJP
(integrator._trace_cv), never through this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.kernels import common as kc

DIFFUSE, GLASS, MIRROR = 0, 1, 2
TEX_NONE, TEX_CHECKERBOARD, TEX_IMAGE = 0, 1, 2
PACK_BLOCK = 16
MAT_COLS = 20


def shade_mat_table(scene):
    """[M, 20] f32 material table for the XLA one-hot row fetch feeding
    the shade kernel: 0:3 diffuse, 3:6 check1, 6:9 check2,
    9:12 light_color, 12 k_emit (= light_intensity * emissive, the same
    f32 product the jnp path forms per-lane), 13 transp, 14 ior,
    15 mtypef, 16 textypef, 17 use_nm (mat_nm > 0), 18 sx, 19 sy."""
    f = lambda a: a.astype(jnp.float32)[:, None]  # noqa: E731
    return jnp.concatenate([
        scene.mat_diffuse, scene.mat_check1, scene.mat_check2,
        scene.mat_light_color,
        (scene.mat_light_intensity * scene.mat_emissive)[:, None],
        scene.mat_transparency[:, None], scene.mat_ior[:, None],
        f(scene.mat_type), f(scene.mat_textype),
        f((scene.mat_nm > 0).astype(jnp.int32)),
        scene.mat_texscale], axis=1)


def _light_table(scene):
    L = scene.light_pos.shape[0]
    if L > 0:
        return jnp.concatenate([scene.light_pos, scene.light_color],
                               axis=1)
    return jnp.zeros((1, 6), jnp.float32)


def _trunc_mod2(x):
    """mathutils.trunc_mod2 for x >= 0: fmod(trunc(x), 2). trunc == floor
    and the remainder arithmetic is exact, so this is bit-identical to the
    XLA jnp.fmod(jnp.trunc(x), 2.0) at every call site (u, v >= 0)."""
    t = jnp.floor(x)
    return t - 2.0 * jnp.floor(t * 0.5)


def _dec(v):
    """Packed-u32 texel word -> planar rgb (shading._packed_decode)."""
    k = jnp.float32(1.0 / 255.0)
    to = lambda c: c.astype(jnp.float32) * k  # noqa: E731
    return (to(jax.lax.shift_right_logical(v, 16) & 0xFF),
            to(jax.lax.shift_right_logical(v, 8) & 0xFF),
            to(v & 0xFF))


def _normalize3(x, y, z):
    """vec3p.normalize: inv = 1/max(sqrt(dot), 1e-20)."""
    inv = 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-20)
    return x * inv, y * inv, z * inv


def _kernel(light_ref, misc_ref, *rest, S, Q, Nm, L, eps,
            ref, has_pair, has_sky, last, rec_out):
    it = iter(rest)
    nxt = lambda: next(it)  # noqa: E731
    dx_ref, dy_ref, dz_ref = nxt(), nxt(), nxt()
    ox_ref, oy_ref, oz_ref = nxt(), nxt(), nxt()
    tx_ref, ty_ref, tz_ref = nxt(), nxt(), nxt()        # throughput
    ax_ref, ay_ref, az_ref = nxt(), nxt(), nxt()        # acc
    av_ref = nxt()
    bk_ref = nxt()
    j_ref = nxt()
    px_ref, py_ref, pz_ref = nxt(), nxt(), nxt()
    nx_ref, ny_ref, nz_ref = nxt(), nxt(), nxt()
    u_ref, v_ref = nxt(), nxt()
    tnx_ref, tny_ref, tnz_ref = nxt(), nxt(), nxt()     # tangent
    btx_ref, bty_ref, btz_ref = nxt(), nxt(), nxt()     # bitangent
    mr_ref = nxt()                                      # [20, tr, 128]
    if has_pair:
        ptex_ref, pnm_ref = nxt(), nxt()
        vt_ref, vn_ref = nxt(), nxt()
    if Nm > 0:
        pmx_ref, pmy_ref, pmz_ref = nxt(), nxt(), nxt()
        nmx_ref, nmy_ref, nmz_ref = nxt(), nxt(), nxt()
        cmx_ref, cmy_ref, cmz_ref = nxt(), nxt(), nxt()
        hc_ref = nxt()
    if has_sky:
        skx_ref, sky_ref_, skz_ref = nxt(), nxt(), nxt()
    if L > 0:
        sh_ref = nxt()
    outs = list(it)
    if rec_out:
        (imx_ref, imy_ref, imz_ref, rnx_ref, rny_ref, rnz_ref) = outs[-6:]
        outs = outs[:-6]
    if last:
        (oax_ref, oay_ref, oaz_ref) = outs
    else:
        (o2x_ref, o2y_ref, o2z_ref, d2x_ref, d2y_ref, d2z_ref,
         t2x_ref, t2y_ref, t2z_ref, oax_ref, oay_ref, oaz_ref,
         av2_ref) = outs

    av = av_ref[:]
    accx, accy, accz = ax_ref[:], ay_ref[:], az_ref[:]

    # pass-through defaults (fully-dead tile: acc/state unchanged)
    oax_ref[:] = accx
    oay_ref[:] = accy
    oaz_ref[:] = accz
    if not last:
        o2x_ref[:] = ox_ref[:]
        o2y_ref[:] = oy_ref[:]
        o2z_ref[:] = oz_ref[:]
        d2x_ref[:] = dx_ref[:]
        d2y_ref[:] = dy_ref[:]
        d2z_ref[:] = dz_ref[:]
        t2x_ref[:] = tx_ref[:]
        t2y_ref[:] = ty_ref[:]
        t2z_ref[:] = tz_ref[:]
        av2_ref[:] = jnp.zeros(av.shape, jnp.float32)
    if rec_out:
        for r in (imx_ref, imy_ref, imz_ref, rnx_ref, rny_ref, rnz_ref):
            r[:] = jnp.zeros(av.shape, jnp.float32)

    @pl.when(jnp.sum(av) > 0.0)
    def _():
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        thx, thy, thz = tx_ref[:], ty_ref[:], tz_ref[:]
        active = av > 0.5
        j_enc = j_ref[:]
        miss = j_enc < 0
        j = jnp.maximum(j_enc, 0)
        live = active & jnp.logical_not(miss)
        is_quad = (j >= S) & (j < S + Q)
        is_mesh = j >= S + Q
        u = u_ref[:]
        v = v_ref[:]

        # ---- sky on miss (shading.skybox_color_p) -----------------------
        if has_sky:
            skx, sky_, skz = skx_ref[:], sky_ref_[:], skz_ref[:]
        else:
            nremf = misc_ref[0, 0]
            dark = misc_ref[0, 1]
            a = 0.5 * (dy + 1.0)
            scale = nremf + 1.0 if ref else 1.0
            w = 1.0 - a
            k = 1.0 - dark
            skx = k * (w + a * 0.5 * scale)
            sky_ = k * (w + a * 0.7 * scale)
            skz = k * (w + a * 1.0 * scale)
        amiss = active & miss
        zero = jnp.zeros(av.shape, jnp.float32)
        ax = accx + jnp.where(amiss, thx * skx, zero)
        ay = accy + jnp.where(amiss, thy * sky_, zero)
        az = accz + jnp.where(amiss, thz * skz, zero)

        # ---- material row (XLA one-hot fetch, planar-stacked input) -----
        (dfx, dfy, dfz, c1x, c1y, c1z, c2x, c2y, c2z, lcx, lcy, lcz,
         k_emit, transp, ior, mtypef, textypef, use_nmf, sx, sy) = \
            [mr_ref[c] for c in range(MAT_COLS)]
        mtype = mtypef.astype(jnp.int32)
        textype = textypef.astype(jnp.int32)

        # ---- p / n select (mesh detail is an XLA input) -----------------
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
        nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
        if Nm > 0:
            px = jnp.where(is_mesh, pmx_ref[:], px)
            py = jnp.where(is_mesh, pmy_ref[:], py)
            pz = jnp.where(is_mesh, pmz_ref[:], pz)
            nx = jnp.where(is_mesh, nmx_ref[:], nx)
            ny = jnp.where(is_mesh, nmy_ref[:], ny)
            nz = jnp.where(is_mesh, nmz_ref[:], nz)

        # ---- texturing (integrator._gather_hit_p pair path) -------------
        same = _trunc_mod2(u * sx) == _trunc_mod2(v * sy)
        chx = jnp.where(same, c1x, c2x)
        chy = jnp.where(same, c1y, c2y)
        chz = jnp.where(same, c1z, c2z)
        same8 = _trunc_mod2(u * 8.0) == _trunc_mod2(v * 8.0)
        on = jnp.where(same8, 0.0, 1.0)  # magenta (Material.cpp:74-81)
        if has_pair:
            imx, imy, imz = _dec(vt_ref[:])
            if rec_out:
                imx_ref[:] = imx
                imy_ref[:] = imy
                imz_ref[:] = imz
            present = ptex_ref[:] > 0.5
            fbx = jnp.where(present, imx, on)
            fby = jnp.where(present, imy, zero)
            fbz = jnp.where(present, imz, on)
        else:
            # fetch_tex=False last-bounce path: img dead (see integrator
            # _gather_hit_p fetch_tex contract); magenta fallback
            fbx, fby, fbz = on, zero, on

        is_check = textype == TEX_CHECKERBOARD
        is_img = textype == TEX_IMAGE
        txx = jnp.where(is_img, fbx, jnp.where(is_check, chx, dfx))
        txy = jnp.where(is_img, fby, jnp.where(is_check, chy, dfy))
        txz = jnp.where(is_img, fbz, jnp.where(is_check, chz, dfz))
        if Nm > 0:
            hascol = hc_ref[:] > 0.5
            dcx = jnp.where(is_mesh,
                            jnp.where(hascol, cmx_ref[:], dfx), txx)
            dcy = jnp.where(is_mesh,
                            jnp.where(hascol, cmy_ref[:], dfy), txy)
            dcz = jnp.where(is_mesh,
                            jnp.where(hascol, cmz_ref[:], dfz), txz)
        else:
            dcx, dcy, dcz = txx, txy, txz

        # ---- normal mapping (squares only, Scene.h:284) -----------------
        if has_pair:
            rnx, rny, rnz = _dec(vn_ref[:])
            if rec_out:
                rnx_ref[:] = rnx
                rny_ref[:] = rny
                rnz_ref[:] = rnz
            nmxv = 2.0 * rnx - 1.0
            nmyv = 2.0 * rny - 1.0
            nmzv = 2.0 * rnz - 1.0
            tnx, tny, tnz = tnx_ref[:], tny_ref[:], tnz_ref[:]
            btx, bty, btz = btx_ref[:], bty_ref[:], btz_ref[:]
            n2x, n2y, n2z = _normalize3(
                nmxv * tnx + nmyv * btx + nmzv * nx,
                nmxv * tny + nmyv * bty + nmzv * ny,
                nmxv * tnz + nmyv * btz + nmzv * nz)
            use = (pnm_ref[:] > 0.5) & (use_nmf > 0.5)
            upd = is_quad & use
            nx = jnp.where(upd, n2x, nx)
            ny = jnp.where(upd, n2y, ny)
            nz = jnp.where(upd, n2z, nz)

        # ---- emission (spheres and squares only, Scene.h:277,285) -------
        ecx = jnp.where(is_img, fbx, jnp.where(is_check, chx, lcx))
        ecy = jnp.where(is_img, fby, jnp.where(is_check, chy, lcy))
        ecz = jnp.where(is_img, fbz, jnp.where(is_check, chz, lcz))
        is_none = textype == TEX_NONE
        ecx = jnp.where(is_none, lcx, ecx)
        ecy = jnp.where(is_none, lcy, ecy)
        ecz = jnp.where(is_none, lcz, ecz)
        kem = jnp.where(is_mesh, zero, k_emit)
        emx = kem * ecx
        emy = kem * ecy
        emz = kem * ecz

        # ---- direct lighting (integrator._direct_lighting_p) ------------
        clx = cly = clz = zero
        for i in range(L):
            ldx0 = light_ref[i, 0] - px
            ldy0 = light_ref[i, 1] - py
            ldz0 = light_ref[i, 2] - pz
            ldx, ldy, ldz = _normalize3(ldx0, ldy0, ldz0)
            dotLN = ldx * nx + ldy * ny + ldz * nz
            li = 0 if ref else i   # lights[0] color quirk (Scene.h:311)
            lam = jnp.maximum(0.0, dotLN) * (1.0 - transp)
            cxi = light_ref[li, 3] * dcx * lam
            cyi = light_ref[li, 4] * dcy * lam
            czi = light_ref[li, 5] * dcz * lam
            shadow = sh_ref[i]
            if ref:
                clx = shadow * (clx + cxi)
                cly = shadow * (cly + cyi)
                clz = shadow * (clz + czi)
            else:
                clx = clx + cxi * shadow
                cly = cly + cyi * shadow
                clz = clz + czi * shadow

        oax_ref[:] = ax + jnp.where(live, thx * (clx + emx), zero)
        oay_ref[:] = ay + jnp.where(live, thy * (cly + emy), zero)
        oaz_ref[:] = az + jnp.where(live, thz * (clz + emz), zero)

        if not last:
            # ---- BSDF scatter (integrator._scatter_p) -------------------
            bk = bk_ref[:]
            ddn = dx * nx + dy * ny + dz * nz
            going_out = ddn > 0.0
            ior_inv = 1.0 / jnp.where(ior > 1e-12, ior, 1.0)
            if ref:
                ri = jnp.where(going_out, ior_inv, ior)
            else:
                ri = jnp.where(going_out, ior, ior_inv)
            cos_t = jnp.minimum(-ddn, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            if ref:
                cannot = (ri * sin_t - 0.6) > 1.0
            else:
                cannot = (ri * sin_t) > 1.0
            u_glass = kc.to_unit_i32(kc.pcg_i32(
                kc.mix_i32(kc.mix_i32(bk, 3), 0)))   # SCATTER_GLASS
            # schlick (mathutils.schlick_reflectance, multiply form)
            r0 = (1.0 - ri) / (1.0 + ri)
            r0 = r0 * r0
            mm = jnp.maximum(1.0 - cos_t, 0.0)
            m2 = mm * mm
            schlick = r0 + (1.0 - r0) * (m2 * m2 * mm)
            use_reflect = cannot | (schlick > u_glass)
            # reflect (vec3p.reflect)
            kr = 2.0 * ddn
            rfx = dx - kr * nx
            rfy = dy - kr * ny
            rfz = dz - kr * nz
            # refract (vec3p.refract)
            cth = jnp.minimum(ddn, 1.0)
            ppx = ri * (cth * nx + dx)
            ppy = ri * (cth * ny + dy)
            ppz = ri * (cth * nz + dz)
            kk = jnp.abs(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz))
            par = -jnp.sqrt(jnp.maximum(kk, 1e-12))
            rrx = par * nx + ppx
            rry = par * ny + ppy
            rrz = par * nz + ppz
            gx = jnp.where(use_reflect, rfx, rrx)
            gy = jnp.where(use_reflect, rfy, rry)
            gz = jnp.where(use_reflect, rfz, rrz)
            # diffuse lobe
            skey = kc.mix_i32(bk, 2)                 # SCATTER_DIR
            if ref:
                rux, ruy, ruz = kc.cube_unit_vector_lane(skey, 0)
            else:
                rux, ruy, ruz = kc.sphere_unit_vector_lane(skey, 0)
            ddfx = nx + rux
            ddfy = ny + ruy
            ddfz = nz + ruz
            tiny = jnp.sqrt(ddfx * ddfx + ddfy * ddfy
                            + ddfz * ddfz) <= eps
            ddfx = jnp.where(tiny, nx, ddfx)
            ddfy = jnp.where(tiny, ny, ddfy)
            ddfz = jnp.where(tiny, nz, ddfz)
            is_glass = mtype == GLASS
            is_mirror = mtype == MIRROR
            dox = jnp.where(is_glass, gx, jnp.where(is_mirror, rfx, ddfx))
            doy = jnp.where(is_glass, gy, jnp.where(is_mirror, rfy, ddfy))
            doz = jnp.where(is_glass, gz, jnp.where(is_mirror, rfz, ddfz))
            dox, doy, doz = _normalize3(dox, doy, doz)
            o2x = eps * dox + px
            o2y = eps * doy + py
            o2z = eps * doz + pz

            o2x_ref[:] = jnp.where(live, o2x, ox_ref[:])
            o2y_ref[:] = jnp.where(live, o2y, oy_ref[:])
            o2z_ref[:] = jnp.where(live, o2z, oz_ref[:])
            d2x_ref[:] = jnp.where(live, dox, dx)
            d2y_ref[:] = jnp.where(live, doy, dy)
            d2z_ref[:] = jnp.where(live, doz, dz)
            t2x_ref[:] = jnp.where(live, thx * dcx, thx)
            t2y_ref[:] = jnp.where(live, thy * dcy, thy)
            t2z_ref[:] = jnp.where(live, thz * dcz, thz)
            av2_ref[:] = jnp.where(live, 1.0, 0.0)


def shade_scatter(scene, cfg, state, bkeys, k1, mat_rows, n_rem,
                  mesh_detail=None, sky=None, shadows=None, rows=None,
                  last=False, rec_out=False):
    """Run the fused shade+scatter kernel over planar ray state.

    state: the integrator bounce-scan carry (o, d, time, throughput,
    active, acc). k1: first_hits output dict (j, p, n, u, v, tan,
    bitan). mat_rows: [N, 20] hit-material rows (XLA one-hot fetch of
    shade_mat_table — exact). rows: (vt, vn, ptex, pnm) — the selected
    packed texel words (integrator pair-gather + one-hot select; feeding
    the raw 32-wide rows through a rank-3 Pallas block measured +0.7
    ms/bounce of DMA overhead, while the XLA select adds only ~0.3) and
    per-lane atlas-validity masks; None = no atlas / statically-dead
    fetch. mesh_detail: (p_m, n_m, col_m, has_col) planar when the scene
    has meshes. sky: planar image-skybox color (scenes with a sky image —
    equirect atan2/asin cannot run in Mosaic). shadows: list of L planar
    shadow factors. Returns the next state dict (or just acc (3 planar)
    when last=True)."""
    N = state["o"][0].shape[0]
    S = scene.sph_center.shape[0]
    Q = scene.quad_v0.shape[0]
    Nm = scene.mesh_mat.shape[0]
    L = scene.light_pos.shape[0]
    ref = cfg.compat == "reference"
    has_pair = rows is not None
    has_sky = scene.has_sky_image

    light_tab = _light_table(scene)
    misc = jnp.stack([jnp.asarray(n_rem, jnp.float32),
                      scene.dark_sky]).reshape(1, 2)

    tr = kc.TILE_ROWS
    n_pad = kc.pad_rows(N, tr)
    n_rows = n_pad // kc.LANES
    sg = jax.lax.stop_gradient
    t = lambda x, fill=0.0: kc.to_tiles(sg(x), n_pad, fill)  # noqa: E731
    ray_spec = pl.BlockSpec((tr, kc.LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def stack_in(arrs):
        """[K] planar arrays -> one (K, n_rows, 128) input + spec."""
        K = len(arrs)
        a = jnp.stack([kc.to_tiles(sg(x), n_pad) for x in arrs])
        return a.reshape(K, n_rows, kc.LANES), pl.BlockSpec(
            (K, tr, kc.LANES), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM)

    ins = []
    ins += [t(x) for x in state["d"]]
    ins += [t(x) for x in state["o"]]
    ins += [t(x) for x in state["throughput"]]
    ins += [t(x) for x in state["acc"]]
    ins.append(t(jnp.where(state["active"], 1.0, 0.0)))
    ins.append(t(jax.lax.bitcast_convert_type(bkeys, jnp.int32)))
    ins.append(t(k1["j"], fill=-1))
    ins += [t(x) for x in k1["p"]]
    ins += [t(x) for x in k1["n"]]
    ins += [t(k1["u"]), t(k1["v"])]
    ins += [t(x) for x in k1["tan"]]
    ins += [t(x) for x in k1["bitan"]]
    specs = [ray_spec] * len(ins)

    mr = sg(mat_rows).T                                # [20, N]
    mr = jnp.pad(mr, ((0, 0), (0, n_pad - N))) if n_pad != N else mr
    ins.append(mr.reshape(MAT_COLS, n_rows, kc.LANES))
    specs.append(pl.BlockSpec((MAT_COLS, tr, kc.LANES),
                              lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM))
    if has_pair:
        vt, vn, ptex, pnm = rows
        ins += [t(ptex), t(pnm), t(vt), t(vn)]
        specs += [ray_spec] * 4
    if Nm > 0:
        p_m, n_m, col_m, has_col = mesh_detail
        ins += [t(x) for x in p_m] + [t(x) for x in n_m] \
            + [t(x) for x in col_m] + [t(has_col)]
        specs += [ray_spec] * 10
    if has_sky:
        ins += [t(x) for x in sky]
        specs += [ray_spec] * 3
    if L > 0:
        shin, shspec = stack_in(shadows)
        ins.append(shin)
        specs.append(shspec)

    rec_out = rec_out and has_pair
    kern = functools.partial(
        _kernel, S=S, Q=Q, Nm=Nm, L=L, eps=float(cfg.epsilon),
        ref=ref, has_pair=has_pair, has_sky=has_sky, last=last,
        rec_out=rec_out)
    n_out = (3 if last else 13) + (6 if rec_out else 0)
    outs = pl.pallas_call(
        kern,
        grid=(n_rows // tr,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + specs,
        out_specs=tuple([ray_spec] * n_out),
        out_shape=tuple(jax.ShapeDtypeStruct((n_rows, kc.LANES),
                                             jnp.float32)
                        for _ in range(n_out)),
        interpret=kc.interpret(),
    )(sg(light_tab), sg(misc), *ins)
    f = [kc.from_tiles(x, N) for x in outs]
    texrec = ((f[-6], f[-5], f[-4]), (f[-3], f[-2], f[-1])) \
        if rec_out else None
    if last:
        out = (f[0], f[1], f[2])
    else:
        out = dict(
            o=(f[0], f[1], f[2]), d=(f[3], f[4], f[5]),
            time=state["time"],
            throughput=(f[6], f[7], f[8]),
            acc=(f[9], f[10], f[11]),
            active=f[12] > 0.5,
        )
    if rec_out:
        return out, texrec
    return out
