"""Gradient fidelity: AD pixel-gradients vs central finite differences
(the BASELINE.json north-star metric).

Configurations are chosen away from visibility discontinuities (SURVEY.md §7
'hard parts'): FD probes geometry/material parameters whose perturbation
does not flip any hit decision at the probed pixels.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tracer.core import rng as trng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.builder import SceneBuilder, Material
from tracer.scene.device import compile_scene

CFG = RenderConfig(max_bounces=1)


def _simple_scene():
    sb = SceneBuilder()
    sb.add_light((-2., 4., 3.), radius=0.0)
    sb.add_sphere((0., 0., 0.), 1.0, Material(diffuse=(0.8, 0.3, 0.2)))
    s = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 8., 8.,
                      Material(diffuse=(0.3, 0.6, 0.9)))
    s.rotate_x(-90).translate((0., -1.5, 0.))
    return compile_scene(sb)


def _center_rays(n=6):
    """Rays through the sphere's interior region (away from silhouette)."""
    cam = default_camera(aspect=1.0)
    u = jnp.linspace(0.47, 0.53, n)
    v = jnp.full(n, 0.5)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(0), jnp.arange(n, dtype=jnp.int32))
    return o, d, jnp.zeros(n), keys


def _loss_fn(scene, o, d, t, keys):
    return jnp.sum(integrator.trace(scene, CFG, o, d, t, keys))


def _fd_check(param_get, param_set, eps_fd, atol, rtol=5e-2):
    scene = _simple_scene()
    o, d, t, keys = _center_rays()

    def loss_of(p):
        return _loss_fn(param_set(scene, p), o, d, t, keys)

    p0 = param_get(scene)
    g_ad = jax.grad(loss_of)(p0)
    g_ad = np.asarray(g_ad).reshape(-1)
    p0f = np.asarray(p0, np.float64).reshape(-1)
    g_fd = np.zeros_like(p0f)
    for i in range(p0f.size):
        dp = np.zeros_like(p0f)
        dp[i] = eps_fd
        lp = float(loss_of(jnp.asarray((p0f + dp).reshape(np.shape(p0)),
                                       jnp.float32)))
        lm = float(loss_of(jnp.asarray((p0f - dp).reshape(np.shape(p0)),
                                       jnp.float32)))
        g_fd[i] = (lp - lm) / (2 * eps_fd)
    err = np.abs(g_ad - g_fd)
    scale = np.maximum(np.abs(g_fd), 1.0)
    assert (err < atol + rtol * scale).all(), (g_ad, g_fd)


def test_grad_sphere_center():
    import dataclasses

    def get(s):
        return s.sph_center[0]

    def set_(s, p):
        return dataclasses.replace(s, sph_center=s.sph_center.at[0].set(p))

    _fd_check(get, set_, eps_fd=1e-3, atol=2e-2)


def test_grad_sphere_radius():
    import dataclasses

    def get(s):
        return s.sph_radius[0]

    def set_(s, p):
        return dataclasses.replace(s, sph_radius=s.sph_radius.at[0].set(p))

    _fd_check(get, set_, eps_fd=1e-3, atol=2e-2)


def test_grad_albedo():
    import dataclasses

    def get(s):
        return s.mat_diffuse[1]  # the sphere's material row

    def set_(s, p):
        return dataclasses.replace(s, mat_diffuse=s.mat_diffuse.at[1].set(p))

    _fd_check(get, set_, eps_fd=1e-3, atol=1e-2)


def _mesh_scene():
    """Two triangles sharing an edge (verts 1,2), facing the camera, so the
    shared-vertex gradient accumulates from both faces."""
    from tracer.scene.builder import MeshObject
    sb = SceneBuilder()
    sb.add_light((-2., 4., 3.), radius=0.0)
    verts = [(-1.5, -1.0, 0.0), (0.0, -1.0, 0.0), (0.0, 1.0, 0.0),
             (1.5, -1.0, 0.0)]
    tris = [(0, 1, 2), (1, 3, 2)]
    sb.add_mesh(MeshObject(verts, tris,
                           material=Material(diffuse=(0.7, 0.4, 0.2))))
    return compile_scene(sb)


def test_grad_mesh_vertices():
    """FD vs AD for shared mesh vertex positions (BASELINE.json lists
    vertex positions first among differentiable parameters)."""
    import dataclasses
    scene = _mesh_scene()
    # rays through both triangles' interiors (x = -0.4 .. +0.4 around the
    # shared edge at x=0), away from silhouettes
    cam = default_camera(aspect=1.0)
    u = jnp.linspace(0.44, 0.56, 8)
    v = jnp.full(8, 0.45)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(0), jnp.arange(8, dtype=jnp.int32))

    def loss_of(verts):
        s = dataclasses.replace(scene, mesh_verts=verts)
        return jnp.sum(integrator.trace(s, CFG, o, d, jnp.zeros(8), keys))

    p0 = scene.mesh_verts
    g_ad = np.asarray(jax.grad(loss_of)(p0), np.float64)
    # FD over the 4 real vertices (skip the sentinel row)
    eps = 1e-3
    g_fd = np.zeros_like(g_ad)
    p0n = np.asarray(p0, np.float64)
    for i in range(4):
        for a in range(3):
            dp = np.zeros_like(p0n)
            dp[i, a] = eps
            lp = float(loss_of(jnp.asarray(p0n + dp, jnp.float32)))
            lm = float(loss_of(jnp.asarray(p0n - dp, jnp.float32)))
            g_fd[i, a] = (lp - lm) / (2 * eps)
    err = np.abs(g_ad[:4] - g_fd[:4])
    assert (err < 2e-2 + 5e-2 * np.maximum(np.abs(g_fd[:4]), 1.0)).all(), \
        (g_ad[:4], g_fd[:4])
    # the shared vertices (1, 2) must see gradient from BOTH faces: their
    # grads are nonzero and the AD grad sums contributions (FD agrees above)
    assert np.abs(g_ad[1]).max() > 0 and np.abs(g_ad[2]).max() > 0


def test_grad_texels():
    """FD vs AD for texture-atlas texels (BASELINE config 4:
    differentiable texel gradients, Material.cpp:82-88)."""
    import dataclasses
    sb = SceneBuilder()
    sb.add_light((0., 0., 5.), radius=0.0)
    img = (np.arange(4 * 4 * 3).reshape(4, 4, 3) * 5 + 16).astype(np.uint8)
    tex = sb.add_texture(img)
    m = Material(diffuse=(1.0, 1.0, 1.0))
    m.texture_type = 2  # TEX_IMAGE
    m.texture_id = tex
    sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 4., 4., m)
    scene = compile_scene(sb)

    cam = default_camera(aspect=1.0)
    u = jnp.linspace(0.35, 0.65, 6)
    v = jnp.full(6, 0.5)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(0), jnp.arange(6, dtype=jnp.int32))

    def loss_of(tex_data):
        s = dataclasses.replace(scene, tex_data=tex_data)
        return jnp.sum(integrator.trace(s, CFG, o, d, jnp.zeros(6), keys))

    p0 = scene.tex_data
    g_ad = np.asarray(jax.grad(loss_of)(p0), np.float64)
    assert np.abs(g_ad).max() > 0, "no texel gradient at all"
    # FD on the texels AD says are touched (nearest-texel gather: only a few)
    touched = np.argwhere(np.abs(g_ad).sum(axis=1) > 0)[:, 0]
    assert touched.size >= 2
    p0n = np.asarray(p0, np.float64)
    eps = 1e-3
    for i in touched[:4]:
        for a in range(3):
            dp = np.zeros_like(p0n)
            dp[i, a] = eps
            lp = float(loss_of(jnp.asarray(p0n + dp, jnp.float32)))
            lm = float(loss_of(jnp.asarray(p0n - dp, jnp.float32)))
            fd = (lp - lm) / (2 * eps)
            assert abs(g_ad[i, a] - fd) < 1e-2 + 5e-2 * max(abs(fd), 1.0), \
                (i, a, g_ad[i, a], fd)


def test_grad_camera_position():
    scene = _simple_scene()
    cam = default_camera(aspect=1.0)
    n = 6
    u = jnp.linspace(0.47, 0.53, n)
    v = jnp.full(n, 0.5)
    keys = trng.ray_keys(jax.random.key(0), jnp.arange(n, dtype=jnp.int32))

    def loss_of(pos):
        import dataclasses
        c = dataclasses.replace(cam, position=pos)
        o, d = generate_rays(c, u, v)
        return jnp.sum(integrator.trace(scene, CFG, o, d, jnp.zeros(n), keys))

    p0 = cam.position
    g_ad = np.asarray(jax.grad(loss_of)(p0))
    eps = 1e-3
    g_fd = np.zeros(3)
    for i in range(3):
        dp = np.zeros(3, np.float32)
        dp[i] = eps
        g_fd[i] = (float(loss_of(p0 + dp)) - float(loss_of(p0 - dp))) / (2 * eps)
    assert np.abs(g_ad - g_fd).max() < 3e-2 + 5e-2 * np.abs(g_fd).max(), \
        (g_ad, g_fd)


def test_grad_camera_orientation():
    """FD check of the pose quaternion (SURVEY §2.22: the full pose is a
    differentiable parameter; reference src/Camera.cpp:41-132 +
    Trackball.cpp). generate_rays normalizes the quaternion internally, so
    the tangent stays on the unit sphere and FD of the raw 4-vector is
    well-defined."""
    import dataclasses
    scene = _simple_scene()
    cam = default_camera(aspect=1.0)
    n = 6
    u = jnp.linspace(0.45, 0.55, n)
    v = jnp.full(n, 0.48)
    keys = trng.ray_keys(jax.random.key(0), jnp.arange(n, dtype=jnp.int32))
    # tilt slightly so the rotation isn't at the identity's symmetry point
    q0 = jnp.asarray([0.99, 0.08, 0.05, 0.03], jnp.float32)

    def loss_of(q):
        c = dataclasses.replace(cam, quaternion=q)
        o, d = generate_rays(c, u, v)
        return jnp.sum(integrator.trace(scene, CFG, o, d, jnp.zeros(n),
                                        keys))

    g_ad = np.asarray(jax.grad(loss_of)(q0))
    assert np.isfinite(g_ad).all()
    eps = 1e-3
    g_fd = np.zeros(4)
    for i in range(4):
        dq = np.zeros(4, np.float32)
        dq[i] = eps
        g_fd[i] = (float(loss_of(q0 + dq))
                   - float(loss_of(q0 - dq))) / (2 * eps)
    assert np.abs(g_ad - g_fd).max() < 3e-2 + 5e-2 * np.abs(g_fd).max(), \
        (g_ad, g_fd)


# ---------------------------------------------------------------------------
# Multi-bounce chains: gradients THROUGH mirror / glass scatter paths
# (VERDICT r1 weak #5 — the NaN-clamp sites in primitives/vec3p only bite
# beyond bounce 1; these FD-check depth-3 chains).
# ---------------------------------------------------------------------------

CFG3 = RenderConfig(max_bounces=3)


def _mirror_chain_scene():
    """Camera ray -> mirror quad (45°) -> diffuse sphere -> light.

    The mirror (normal rotated to (sin45, 0, cos45)) redirects -z-going
    view rays to +x toward a sphere off to the side; gradients w.r.t. the
    sphere center/albedo must flow through the reflected (bounce-2) hit.
    """
    from tracer.scene.builder import MIRROR
    sb = SceneBuilder()
    sb.add_light((3., 5., 2.), radius=0.0)
    mq = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 2., 2.,
                       Material(diffuse=(0.95, 0.95, 0.95), mtype=MIRROR))
    mq.rotate_y(45.0)
    sb.add_sphere((3.0, 0.0, 0.0), 0.9,
                  Material(diffuse=(0.7, 0.3, 0.2)))
    return compile_scene(sb)


def _glass_chain_scene(ior=1.5):
    """Camera ray -> glass sphere (refract in/out) -> diffuse wall."""
    from tracer.scene.builder import GLASS
    sb = SceneBuilder()
    sb.add_light((0., 4., 4.), radius=0.0)
    sb.add_sphere((0.0, 0.0, 1.0), 0.8,
                  Material(diffuse=(1.0, 1.0, 1.0), mtype=GLASS,
                           index_medium=ior, transparency=1.0))
    w = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 10., 10.,
                      Material(diffuse=(0.2, 0.5, 0.8)))
    w.translate((0., 0., -2.0))
    return compile_scene(sb)


def _fd_vs_ad(scene, loss_of, p0, idx_iter, eps, atol, rtol=8e-2):
    g_ad = np.asarray(jax.grad(loss_of)(p0), np.float64)
    p0n = np.asarray(p0, np.float64)
    for ix in idx_iter:
        dp = np.zeros_like(p0n)
        dp[ix] = eps
        lp = float(loss_of(jnp.asarray(p0n + dp, jnp.float32)))
        lm = float(loss_of(jnp.asarray(p0n - dp, jnp.float32)))
        fd = (lp - lm) / (2 * eps)
        ad = g_ad[ix]
        assert abs(ad - fd) < atol + rtol * max(abs(fd), 1.0), \
            (ix, ad, fd)
    return g_ad


def test_grad_through_mirror_chain():
    import dataclasses
    scene = _mirror_chain_scene()
    cam = default_camera(aspect=1.0)
    n = 5
    u = jnp.linspace(0.48, 0.52, n)
    v = jnp.full(n, 0.5)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(3), jnp.arange(n, dtype=jnp.int32))

    def loss_of(center):
        s = dataclasses.replace(scene,
                                sph_center=scene.sph_center.at[0].set(center))
        return jnp.sum(integrator.trace(s, CFG3, o, d, jnp.zeros(n), keys))

    g = _fd_vs_ad(scene, loss_of, scene.sph_center[0],
                  [(0,), (1,), (2,)], eps=1e-3, atol=3e-2)
    assert np.abs(g).max() > 1e-4, "no gradient through the mirror bounce"

    # albedo of the sphere, reached only via the mirror
    sph_mid = int(np.asarray(scene.sph_mat)[0])

    def loss_alb(diff):
        s = dataclasses.replace(
            scene, mat_diffuse=scene.mat_diffuse.at[sph_mid].set(diff))
        return jnp.sum(integrator.trace(s, CFG3, o, d, jnp.zeros(n), keys))

    g2 = _fd_vs_ad(scene, loss_alb, scene.mat_diffuse[sph_mid],
                   [(0,), (2,)], eps=1e-3, atol=2e-2)
    assert np.abs(g2).max() > 1e-4


def test_grad_through_glass_chain():
    import dataclasses
    scene = _glass_chain_scene()
    cam = default_camera(aspect=1.0)
    n = 5
    u = jnp.linspace(0.49, 0.51, n)
    v = jnp.full(n, 0.5)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(11), jnp.arange(n, dtype=jnp.int32))

    def loss_center(center):
        s = dataclasses.replace(scene,
                                sph_center=scene.sph_center.at[0].set(center))
        return jnp.sum(integrator.trace(s, CFG3, o, d, jnp.zeros(n), keys))

    g = _fd_vs_ad(scene, loss_center, scene.sph_center[0],
                  [(0,), (1,)], eps=5e-4, atol=5e-2)
    assert np.isfinite(g).all()

    # index of refraction: flows through the refract() direction math
    glass_mid = int(np.asarray(scene.sph_mat)[0])

    def loss_ior(ior):
        s = dataclasses.replace(scene,
                                mat_ior=scene.mat_ior.at[glass_mid].set(ior))
        return jnp.sum(integrator.trace(s, CFG3, o, d, jnp.zeros(n), keys))

    g_ad = float(jax.grad(loss_ior)(scene.mat_ior[glass_mid]))
    eps = 5e-4
    i0 = float(scene.mat_ior[glass_mid])
    fd = (float(loss_ior(jnp.float32(i0 + eps)))
          - float(loss_ior(jnp.float32(i0 - eps)))) / (2 * eps)
    assert np.isfinite(g_ad) and np.isfinite(fd)
    assert abs(g_ad - fd) < 5e-2 + 8e-2 * max(abs(fd), 1.0), (g_ad, fd)


def test_custom_vjp_matches_autodiff():
    """The record-replay custom VJP (integrator._trace_cv) must produce
    the same gradients as the plain remat'd-scan autodiff path for every
    differentiable input class (materials, geometry, texels, rays), on a
    lit multi-lobe textured scene. The FORWARD is bit-identical; the
    backward is compared at fp32-reassociation tolerance (the replay
    saves residuals instead of rematerializing, so XLA schedules its
    backward sums in a different order)."""
    import dataclasses
    from tracer.scenes import zoo
    from tracer.render.camera import default_camera as dc

    sb = zoo.setup_cornell_box(1.0)
    sb.add_light((0., 0.9, 0.), radius=0.4)
    scene = compile_scene(sb)
    n = 256
    cam = dc(aspect=1.0)
    u = (jnp.arange(n) % 23) / 23.0
    v = (jnp.arange(n) % 17) / 17.0
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(3), jnp.arange(n, dtype=jnp.int32))
    tm = jnp.linspace(0., 1., n)
    cfg_cv = RenderConfig(max_bounces=3, shadow_rays=2, custom_vjp="on")
    cfg_ad = dataclasses.replace(cfg_cv, custom_vjp="off")

    f_cv = jax.jit(lambda s: integrator.trace(s, cfg_cv, o, d, tm, keys))
    f_ad = jax.jit(lambda s: integrator.trace(s, cfg_ad, o, d, tm, keys))
    np.testing.assert_array_equal(np.asarray(f_cv(scene)),
                                  np.asarray(f_ad(scene)))

    def loss(diffuse, center, tex, dd, cfgx):
        s = dataclasses.replace(scene, mat_diffuse=diffuse,
                                sph_center=center, tex_data=tex)
        return jnp.sum(integrator.trace(s, cfgx, o, dd, tm, keys))

    args = (scene.mat_diffuse, scene.sph_center, scene.tex_data, d)
    g_cv = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)),
                   static_argnums=4)(*args, cfg_cv)
    g_ad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)),
                   static_argnums=4)(*args, cfg_ad)
    for name, a, b in zip(("diffuse", "center", "tex", "raydir"),
                          g_cv, g_ad):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7,
                                   err_msg=f"grad {name}")
    assert float(jnp.sum(jnp.abs(g_ad[0]))) > 0
