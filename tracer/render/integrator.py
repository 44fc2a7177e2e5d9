"""The wavefront path-tracing integrator.

TPU-native recast of `Scene::rayTraceRecursive` / `rayTrace`
(`/root/reference/src/Scene.h:258-350`): the depth-6 recursion becomes a
`lax.scan` over bounces carrying a SoA ray-batch state
(origin, direction, time, throughput, active, accumulated radiance); per
bounce, one fused pass does closest-hit (MXU contractions over the sphere /
quad tables + stackless BVH walks per mesh), branchless material fetch,
direct lighting with NB_ECH jittered shadow rays per light, and BSDF
scatter. All reference quirks are replicated under compat=reference:

- `lights[0].material` used as the color for every light (Scene.h:311);
- each light's soft-shadow factor multiplies the *accumulated* direct color
  of all lights so far (Scene.h:333 `color *= shadow` inside the loop);
- the final radiance is divided by MAXBOUNCES (Scene.h:347-349);
- glass: `cannot_refract = ri*sin - 0.6 > 1` fudge and the inverted
  eta ratio (Material.cpp:32-39: entering uses `index_medium`, leaving
  `1/index_medium`);
- emission only for spheres and squares (Scene.h:277,285 — mesh hits skip
  `emit`);
- skybox scaled by remaining bounces (Scene.h:153,160);
- "unit" vectors are normalized cube samples (Functions.cpp:14-18);
- stochastic transparency shadows: an occluder blocks unless a fresh
  uniform draw is <= its transparency (Scene.h:235-255).

compat=physical fixes all of the above.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.core.mathutils import (dot, normalize, reflect, refract,
                                   schlick_reflectance)
from tracer.geometry import primitives as prim
from tracer.render import shading

INF = prim.INF
DIFFUSE, GLASS, MIRROR = 0, 1, 2


def _scene_candidates(scene, o, d, time, eps):
    """All candidate ts in (spheres, squares, meshes) order: [N, S+Q+Nm].
    Also returns per-mesh tri ids [N, Nm]."""
    t_sph = prim.sphere_ts(o, d, time, scene.sph_center, scene.sph_radius,
                           scene.mat_mb[scene.sph_mat], scene.sph_valid, eps)
    is_glass = (scene.mat_type[scene.quad_mat] == GLASS).astype(jnp.float32)
    t_quad = prim.quad_ts(o, d, time, scene.quad_v0, scene.quad_er,
                          scene.quad_eu, scene.quad_normal,
                          scene.mat_mb[scene.quad_mat], is_glass,
                          scene.quad_valid, eps)
    t_mesh_raw, tri_mesh = prim.mesh_closest_hits(o, d, scene, eps)
    # Scene-level eps cut: a mesh whose *closest* hit is below eps is
    # rejected wholesale (Scene.h:224) — quirk parity.
    t_mesh = jnp.where(t_mesh_raw >= eps, t_mesh_raw, INF)
    return jnp.concatenate([t_sph, t_quad, t_mesh], axis=1), tri_mesh


def _shadow_blocked(scene, o, d, time, t_light, keys, eps):
    """Stochastic-transparency shadow test (Scene::computeShadow,
    Scene.h:235-255): blocked iff ANY occluder with eps <= t < t_light
    passes `uniform() > transparency`. One independent draw per occluder
    (equivalent in distribution to the reference's early-out loop).

    o,d,time,t_light: [K] shadow rays; keys: [K]. Returns blocked [K] f32.
    """
    t_all, _ = _scene_candidates(scene, o, d, time, eps)
    S = scene.sph_center.shape[0]
    Q = scene.quad_v0.shape[0]
    mat_ids = jnp.concatenate([scene.sph_mat, scene.quad_mat,
                               scene.mesh_mat])
    transp = scene.mat_transparency[mat_ids]          # [S+Q+Nm]
    hit = t_all < t_light[:, None]
    u = rng.uniform(keys, (t_all.shape[1],))
    blocked = jnp.any(hit & (u > transp[None, :]), axis=1)
    return blocked.astype(jnp.float32)


def _gather_hit(scene, o, d, time, j, tri_mesh, eps):
    """Recompute the selected hit differentiably and fetch shading inputs.

    j: [N] winning candidate index into (spheres | squares | meshes).
    Returns dict of per-ray fields. Discrete selection (j, tri ids) is
    non-differentiable by construction; gradients flow through the analytic
    re-evaluation of the winning primitive (SURVEY.md §7 'hard parts').
    """
    N = o.shape[0]
    S = scene.sph_center.shape[0]
    Q = scene.quad_v0.shape[0]
    is_sph = j < S
    is_quad = (j >= S) & (j < S + Q)
    is_mesh = j >= S + Q

    # --- sphere branch ---------------------------------------------------
    js = jnp.clip(j, 0, S - 1)
    sc = scene.sph_center[js]
    sr = scene.sph_radius[js]
    smb = scene.mat_mb[scene.sph_mat[js]]
    _, p_s, n_s, theta, phi = prim.sphere_hit_detail(o, d, time, sc, sr,
                                                     smb, eps)
    mid_s = scene.sph_mat[js]

    # --- quad branch -----------------------------------------------------
    jq = jnp.clip(j - S, 0, Q - 1)
    qmb = scene.mat_mb[scene.quad_mat[jq]]
    _, p_q, n_q, u_q, v_q = prim.quad_hit_detail(
        o, d, time, scene.quad_v0[jq], scene.quad_er[jq], scene.quad_eu[jq],
        qmb)
    mid_q = scene.quad_mat[jq]

    # --- mesh branch -----------------------------------------------------
    Nm = scene.mesh_mat.shape[0]
    if Nm > 0:
        jm = jnp.clip(j - S - Q, 0, Nm - 1)
        tid = jnp.take_along_axis(tri_mesh, jm[:, None], axis=1)[:, 0]
        tid = jnp.clip(tid, 0, scene.tri_a.shape[0] - 1)
        _, p_m, n_m, w0, w1, w2 = prim.triangle_hit_detail(
            o, d, scene.tri_a[tid], scene.tri_b[tid], scene.tri_c[tid])
        mid_m = scene.mesh_mat[jm]
        col_m = (w0[:, None] * scene.tri_col_a[tid]
                 + w1[:, None] * scene.tri_col_b[tid]
                 + w2[:, None] * scene.tri_col_c[tid])
        has_col = scene.tri_has_col[tid]
    else:
        p_m = jnp.zeros_like(o)
        n_m = jnp.zeros_like(o)
        mid_m = jnp.zeros(N, jnp.int32)
        col_m = jnp.zeros_like(o)
        has_col = jnp.zeros(N, jnp.float32)

    # --- select ----------------------------------------------------------
    mid = jnp.where(is_sph, mid_s, jnp.where(is_quad, mid_q, mid_m))
    p = jnp.where(is_sph[:, None], p_s,
                  jnp.where(is_quad[:, None], p_q, p_m))
    n = jnp.where(is_sph[:, None], n_s,
                  jnp.where(is_quad[:, None], n_q, n_m))

    # texture coordinates: spheres use (phi/2pi, theta/pi) for both texture
    # and emission (Scene.h:275-277); squares use (u, v).
    u_tex = jnp.where(is_sph, phi / (2.0 * jnp.pi), u_q)
    v_tex = jnp.where(is_sph, theta / jnp.pi, v_q)

    # diffuse after texturing (Scene.h:275/283) — meshes ignore textures and
    # use interpolated vertex/face colors when present (Scene.h:291-298).
    base = scene.mat_diffuse[mid]
    textured = shading.texture_color(scene, mid, u_tex, v_tex, base)
    diffuse = jnp.where(is_mesh[:, None],
                        jnp.where(has_col[:, None] > 0.5, col_m, base),
                        textured)

    # normal mapping — squares only (Scene.h:284, sphere call commented out)
    n_mapped = shading.perturb_normal(scene, mid, u_tex, v_tex,
                                      scene.quad_tan[jq],
                                      scene.quad_bitan[jq], n)
    n = jnp.where(is_quad[:, None], n_mapped, n)

    # emission — spheres and squares only (Scene.h:277,285)
    emis = shading.emission_color(scene, mid, u_tex, v_tex)
    emis = jnp.where(is_mesh[:, None], 0.0, emis)

    return dict(mid=mid, p=p, n=n, diffuse=diffuse, emission=emis,
                u=u_tex, v=v_tex)


def _direct_lighting(scene, cfg: RenderConfig, p, n, d_in, time, mid, diffuse,
                     keys, eps):
    """Per-light Lambert + NB_ECH soft-shadow rays (Scene.h:305-334)."""
    N = p.shape[0]
    L = scene.light_pos.shape[0]
    K = cfg.shadow_rays
    ref = cfg.compat == "reference"
    color = jnp.zeros((N, 3), jnp.float32)
    transp = scene.mat_transparency[mid]
    for i in range(L):
        lpos = scene.light_pos[i]
        ldir = normalize(lpos[None, :] - p)
        dotLN = dot(ldir, n)
        lcol = scene.light_color[0] if ref else scene.light_color[i]
        contrib = (lcol[None, :] * diffuse
                   * jnp.maximum(0.0, dotLN)[:, None]
                   * (1.0 - transp)[:, None])

        # soft shadows: K jittered samples toward the light sphere
        skeys = rng.salted(keys, rng.SHADOW_LIGHT_POS, i)
        if ref:
            ruv = rng.cube_unit_vector(skeys, (K,))          # [N,K,3]
        else:
            ruv = rng.sphere_unit_vector(skeys, (K,))
        delta = scene.light_radius[i] / 2.0
        lp = lpos[None, None, :] + ruv * delta               # [N,K,3]
        off = lp - p[:, None, :]
        t_light = jnp.linalg.norm(off, axis=-1)              # [N,K]
        sdir = off / jnp.maximum(t_light, 1e-20)[..., None]
        so = p[:, None, :] + sdir * cfg.epsilon
        bkeys = rng.lane_keys(rng.salted(keys, rng.SHADOW_BERNOULLI, i), K)
        blocked = _shadow_blocked(
            scene, so.reshape(N * K, 3), sdir.reshape(N * K, 3),
            jnp.repeat(time, K), t_light.reshape(N * K),
            bkeys.reshape(N * K), eps).reshape(N, K)
        shadow = 1.0 - jnp.mean(blocked, axis=1)
        if ref:
            # quirk: multiplies everything accumulated so far (Scene.h:333)
            color = (color + contrib) * shadow[:, None]
        else:
            color = color + contrib * shadow[:, None]
    return color


def _scatter(scene, cfg: RenderConfig, d, n, p, mid, keys):
    """Material::scatter (Material.cpp:26-60), branchless."""
    ref = cfg.compat == "reference"
    mtype = scene.mat_type[mid]
    ior = scene.mat_ior[mid]

    # glass
    going_out = dot(d, n) > 0.0
    if ref:
        ri = jnp.where(going_out, 1.0 / ior, ior)     # inverted-eta quirk
    else:
        ri = jnp.where(going_out, ior, 1.0 / ior)
    cos_t = jnp.minimum(dot(-d, n), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    if ref:
        cannot = (ri * sin_t - 0.6) > 1.0             # -0.6 fudge quirk
    else:
        cannot = (ri * sin_t) > 1.0
    u_glass = rng.uniform(rng.salted(keys, rng.SCATTER_GLASS))
    use_reflect = cannot | (schlick_reflectance(cos_t, ri) > u_glass)
    d_glass = jnp.where(use_reflect[:, None], reflect(d, n),
                        refract(d, n, ri))

    # diffuse
    ruv = (rng.cube_unit_vector(rng.salted(keys, rng.SCATTER_DIR)) if ref
           else rng.sphere_unit_vector(rng.salted(keys, rng.SCATTER_DIR)))
    d_diff = n + ruv
    tiny = jnp.linalg.norm(d_diff, axis=-1) <= cfg.epsilon
    d_diff = jnp.where(tiny[:, None], n, d_diff)

    d_mirror = reflect(d, n)

    d_out = jnp.where((mtype == GLASS)[:, None], d_glass,
                      jnp.where((mtype == MIRROR)[:, None], d_mirror,
                                d_diff))
    d_out = normalize(d_out)
    o_out = p + cfg.epsilon * d_out
    return o_out, d_out


def trace(scene, cfg: RenderConfig, o, d, time, keys):
    """Trace a ray batch to radiance [N,3].

    o,d: [N,3]; time: [N]; keys: [N] per-ray PRNG keys (pixel+sample
    folded). Equivalent of Scene::rayTrace (Scene.h:345-350) over a batch.
    """
    N = o.shape[0]
    eps = cfg.epsilon
    B = cfg.max_bounces

    # The initial carry is derived from the ray inputs (not fresh
    # constants) so that under shard_map it carries the same
    # varying-manual-axes type as the per-bounce outputs — otherwise the
    # scan rejects the carry (sharded-typing mismatch). `d` is the one
    # input guaranteed to vary over every mesh axis (o may be a broadcast
    # camera position, which is replicated), so everything is promoted
    # through a zero multiple of it.
    zero3 = d * 0.0 + o * 0.0
    zero1 = zero3[:, 0] + time * 0.0
    state = dict(
        o=o + zero3, d=d, time=time + zero1,
        throughput=zero3 + 1.0,
        active=zero1 == 0.0,
        acc=zero3,
    )

    def bounce(state, b):
        o, d, time = state["o"], state["d"], state["time"]
        active = state["active"]
        throughput = state["throughput"]
        acc = state["acc"]
        n_rem = B - b  # NRemainingBounces at this depth

        bkeys = rng.salted(keys, b)

        t_all, tri_mesh = _scene_candidates(scene, o, d, time, eps)
        j = jnp.argmin(t_all, axis=1)
        tmin = jnp.take_along_axis(t_all, j[:, None], axis=1)[:, 0]
        miss = tmin >= INF * 0.5

        # sky on miss (Scene.h:300-303)
        sky = shading.skybox_color(scene, d, jnp.full(N, n_rem),
                                   cfg.compat == "reference")
        acc = acc + jnp.where((active & miss)[:, None],
                              throughput * sky, 0.0)

        hit = _gather_hit(scene, o, d, time, j, tri_mesh, eps)
        live = active & ~miss

        direct = _direct_lighting(scene, cfg, hit["p"], hit["n"], d, time,
                                  hit["mid"], hit["diffuse"], bkeys, eps)
        acc = acc + jnp.where(live[:, None],
                              throughput * (direct + hit["emission"]), 0.0)

        o2, d2 = _scatter(scene, cfg, d, hit["n"], hit["p"], hit["mid"],
                          bkeys)
        state = dict(
            o=jnp.where(live[:, None], o2, o),
            d=jnp.where(live[:, None], d2, d),
            time=time,
            throughput=jnp.where(live[:, None],
                                 throughput * hit["diffuse"], throughput),
            active=live,
            acc=acc,
        )
        return state, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(B))
    out = state["acc"]
    if cfg.compat == "reference":
        out = out / jnp.float32(B)  # Scene.h:347-349 quirk
    return out
