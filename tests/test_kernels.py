"""Pallas kernel parity vs the jnp reference implementations (interpret
mode on the CPU test mesh). The jnp path stays the semantic spec; kernels
must match it to float tolerance (RNG streams are bit-identical — see
tests via benchmarks/pallas_caps2.py int32 PCG twin)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracer.core import rng as trng
from tracer.core import vec3p as vp
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.render.camera import default_camera, generate_rays
from tracer.scene.builder import SceneBuilder, Material
from tracer.scene.device import compile_scene
from tracer.scenes import zoo


def _lit_scene():
    sb = SceneBuilder()
    sb.add_light((-2., 4., 3.), radius=1.0)
    sb.add_light((3., 2., 1.), radius=0.5)
    sb.add_sphere((0., 0., 0.), 1.0, Material(diffuse=(0.8, 0.3, 0.2)))
    sb.add_sphere((1.5, 0.4, -1.0), 0.5,
                  Material(diffuse=(0.2, 0.2, 0.9), transparency=0.5,
                           mtype=1))
    s = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 8., 8.,
                      Material(diffuse=(0.3, 0.6, 0.9)))
    s.rotate_x(-90).translate((0., -1.5, 0.))
    return compile_scene(sb)


def _rays(n=192):
    cam = default_camera(aspect=1.0)
    u = jnp.linspace(0.2, 0.8, n)
    v = jnp.linspace(0.35, 0.65, n)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(7), jnp.arange(n, dtype=jnp.int32))
    return o, d, jnp.linspace(0.0, 1.0, n), keys


@pytest.mark.parametrize("compat", ["reference", "physical"])
def test_shadow_kernel_matches_jnp(compat):
    from tracer.kernels import shadow as kshadow

    scene = _lit_scene()
    cfg = RenderConfig(shadow_rays=4, compat=compat, kernels="on")
    _, _, time, keys = _rays()
    # hit points on the floor crossing the unit sphere's shadow from
    # light 0 at (-2,4,3): some lit, some occluded, some penumbral
    t = jnp.linspace(-1.0, 3.0, 192)
    p = (t, jnp.full_like(t, -1.4), -t * 0.75)
    eps = cfg.epsilon

    got = kshadow.shadow_factors(scene, cfg, p, time, keys, eps)
    want = [integrator._shadow_factor_jnp(scene, cfg, p, time, keys, eps, i)
            for i in range(scene.n_lights)]
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6, rtol=0)
        # shadows must actually vary (not degenerate all-1s)
        assert np.asarray(w).std() > 0


def test_trace_with_kernels_matches_jnp():
    """Full trace radiance: kernels=on (interpret) == kernels=off."""
    scene = _lit_scene()
    o, d, time, keys = _rays(96)
    cfg_on = RenderConfig(shadow_rays=3, max_bounces=3, kernels="on")
    cfg_off = dataclasses.replace(cfg_on, kernels="off")
    r_on = integrator.trace(scene, cfg_on, o, d, time, keys)
    r_off = integrator.trace(scene, cfg_off, o, d, time, keys)
    np.testing.assert_allclose(np.asarray(r_on), np.asarray(r_off),
                               atol=2e-5, rtol=0)


def test_shadow_kernel_gradients_are_zero_and_flow():
    """Gradients still flow through the lighting CONTRIB with kernels on,
    and the kernel itself contributes zero gradient (like the jnp path)."""
    scene = _lit_scene()
    o, d, time, keys = _rays(32)
    cfg = RenderConfig(shadow_rays=2, max_bounces=1, kernels="on")

    def loss(diffuse):
        s = dataclasses.replace(scene, mat_diffuse=diffuse)
        return jnp.sum(integrator.trace(s, cfg, o, d, time, keys))

    g = jax.grad(loss)(scene.mat_diffuse)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0

    cfg_off = dataclasses.replace(cfg, kernels="off")

    def loss_off(diffuse):
        s = dataclasses.replace(scene, mat_diffuse=diffuse)
        return jnp.sum(integrator.trace(s, cfg_off, o, d, time, keys))

    g_off = jax.grad(loss_off)(scene.mat_diffuse)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_off),
                               atol=2e-5, rtol=1e-4)


def test_traverse_kernel_matches_jnp():
    """Packet BVH kernel vs the per-ray while_loop walk: identical (t, tri)
    for coherent AND incoherent rays over a multi-mesh scene."""
    from tracer.geometry import primitives as prim
    from tracer.kernels import traverse as ktraverse

    scene = compile_scene(zoo.setup_flamingo_pond())  # 2 meshes, 11.9K tris
    assert scene.n_meshes == 2
    n = 257  # deliberately not a tile multiple (padding path)
    cam = default_camera(aspect=1.0)
    u = jnp.linspace(0.05, 0.95, n)
    v = jnp.linspace(0.1, 0.9, n)
    o, d = generate_rays(cam, u, v)
    # add incoherent rays: random directions from inside the scene
    k = jax.random.split(jax.random.key(3), 2)
    d2 = jax.random.normal(k[0], (n, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    o2 = jax.random.uniform(k[1], (n, 3), minval=-2.0, maxval=2.0)
    o = jnp.concatenate([o, o2])
    d = jnp.concatenate([d, d2])

    import tracer.core.vec3p as vp2
    t_k, tri_k = ktraverse.mesh_closest_hits(scene, vp2.splat(o),
                                             vp2.splat(d))
    t_j, tri_j = prim.mesh_closest_hits(o, d, scene, 1e-5)
    hit_k = np.asarray(t_k) < 1e30
    hit_j = np.asarray(t_j) < 1e30
    np.testing.assert_array_equal(hit_k, hit_j)
    assert hit_j.any(), "test rays must actually hit the meshes"
    # t agrees to 1 ULP (the jnp path's dot() reduce may fuse FMAs where
    # the kernel's explicit adds don't); tri ids must be identical
    np.testing.assert_allclose(np.asarray(t_k)[hit_j],
                               np.asarray(t_j)[hit_j], rtol=1e-6, atol=0)
    np.testing.assert_array_equal(np.asarray(tri_k), np.asarray(tri_j))


def test_trace_mesh_scene_with_kernels_matches_jnp():
    scene = compile_scene(zoo.setup_mesh())
    o, d, time, keys = _rays(64)
    cfg_on = RenderConfig(shadow_rays=2, max_bounces=2, kernels="on")
    cfg_off = dataclasses.replace(cfg_on, kernels="off")
    r_on = integrator.trace(scene, cfg_on, o, d, time, keys)
    r_off = integrator.trace(scene, cfg_off, o, d, time, keys)
    np.testing.assert_allclose(np.asarray(r_on), np.asarray(r_off),
                               atol=2e-5, rtol=0)


@pytest.mark.parametrize("compat", ["reference", "physical"])
def test_shadow_kernel_mesh_occluders(compat):
    """Shadow kernel with MESH occluders (in-kernel BVH packet walk) vs the
    jnp megabatch path, on a scene mixing mesh + sphere + quad occluders
    and a transparent mesh (stochastic shadows)."""
    from tracer.kernels import shadow as kshadow
    from tracer.scene.builder import SceneBuilder, Material

    from tracer.scene.builder import MeshObject

    sb = SceneBuilder()
    sb.add_light((-2., 4., 3.), radius=1.0)
    sb.add_light((3., 2., 1.), radius=0.5)
    # icosphere-ish occluder between light 0 and the sample line
    th = np.linspace(0, 2 * np.pi, 9)[:-1]
    ring = np.stack([np.cos(th), np.sin(th), 0 * th], -1).astype(np.float32)
    verts = np.concatenate([[[0, 0, 1.]], ring, [[0, 0, -1.]]],
                           0).astype(np.float32)
    tris = np.concatenate([
        [[0, 1 + i, 1 + (i + 1) % 8] for i in range(8)],
        [[9, 1 + (i + 1) % 8, 1 + i] for i in range(8)]]).astype(np.int32)
    m1 = MeshObject(verts, tris, material=Material(diffuse=(.8, .8, .8)))
    m1.translate((-0.5, 0.8, 0.8))
    sb.add_mesh(m1)
    m2 = MeshObject(
        np.array([[0, .5, 1.2], [1, .4, 1.1], [.5, 1.4, 1.3]], np.float32),
        np.array([[0, 1, 2]], np.int32),
        material=Material(diffuse=(.5, .5, .9), transparency=0.5, mtype=1))
    sb.add_mesh(m2)
    sb.add_sphere((1.5, 0.4, -1.0), 0.5, Material(diffuse=(.2, .2, .9)))
    s = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 8., 8.,
                      Material(diffuse=(.3, .6, .9)))
    s.rotate_x(-90).translate((0., -1.5, 0.))
    scene = compile_scene(sb)
    assert scene.n_meshes == 2

    cfg = RenderConfig(shadow_rays=4, compat=compat, kernels="on")
    _, _, time, keys = _rays()
    t = jnp.linspace(-1.0, 3.0, 192)
    p = (t, jnp.full_like(t, -1.4), -t * 0.75)
    eps = cfg.epsilon

    got = kshadow.shadow_factors(scene, cfg, p, time, keys, eps)
    want = [integrator._shadow_factor_jnp(scene, cfg, p, time, keys, eps, i)
            for i in range(scene.n_lights)]
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6, rtol=0)
    # light 0 must actually be occluded (the mesh sits in its path)
    assert np.asarray(want[0]).std() > 0


def test_packed_atlas_bit_parity_and_grads():
    """The packed-u32 atlas fast path (shading.packed_fetch) must be
    BIT-identical to the [P,3] row-gather path on a textured+normal-mapped
    scene (Cornell), and texel gradients must flow identically to tex_data
    through its custom VJP."""
    scene = compile_scene(zoo.setup_cornell_box(1.0))
    cam = default_camera(aspect=1.0)
    n = 128
    u = jnp.linspace(0.05, 0.95, n)
    v = (jnp.arange(n) % 13) / 13.0
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(0), jnp.arange(n, dtype=jnp.int32))
    t = jnp.zeros(n)
    cfg_off = RenderConfig(kernels="off", max_bounces=3)
    # kernels='on' would also turn on Pallas interpret mode (slow on CPU);
    # the packed-atlas path alone is exercised via _gather_hit_p directly
    # below plus a full-trace comparison at shallow depth.
    cfg_on = RenderConfig(kernels="on", max_bounces=3)

    a = integrator.trace(scene, cfg_off, o, d, t, keys)
    b = integrator.trace(scene, cfg_on, o, d, t, keys)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(tex_data, cfg):
        s = dataclasses.replace(scene, tex_data=tex_data)
        return jnp.sum(integrator.trace(s, cfg, o, d, t, keys))

    g1 = jax.grad(loss)(scene.tex_data, cfg_off)
    g2 = jax.grad(loss)(scene.tex_data, cfg_on)
    assert int(jnp.sum(jnp.any(g1 != 0, -1))) > 0
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_sorted_ray_queue_parity():
    """cfg.ray_sort: the direction-octant + position-bucket sorted walk
    must return the same radiance as the in-order walk (the walk visits a
    superset of nodes per packet either way; per-lane results depend only
    on the lane's own ray)."""
    from tracer.scenes import zoo as _zoo

    scene = compile_scene(_zoo.setup_mesh())
    o, d, time, keys = _rays(96)
    cfg_sorted = RenderConfig(shadow_rays=2, max_bounces=3, kernels="on",
                              ray_sort="auto")
    cfg_plain = dataclasses.replace(cfg_sorted, ray_sort="off")
    r_s = integrator.trace(scene, cfg_sorted, o, d, time, keys)
    r_p = integrator.trace(scene, cfg_plain, o, d, time, keys)
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_p),
                               atol=2e-5, rtol=0)


def test_sphere_uv_fused_path_parity():
    """Textured-sphere scenes ride the fused kernel path through an XLA
    sphere-UV splice; radiance and record-path gradients must match the
    jnp path."""
    from tracer.scenes import zoo as _zoo

    scene = compile_scene(_zoo.setup_rt_in_a_weekend())
    assert scene.sphere_uv_needed and scene.pair_mode
    o, d, time, keys = _rays(96)
    cfg_on = RenderConfig(shadow_rays=2, max_bounces=3, kernels="on")
    cfg_off = dataclasses.replace(cfg_on, kernels="off")
    r_on = integrator.trace(scene, cfg_on, o, d, time, keys)
    r_off = integrator.trace(scene, cfg_off, o, d, time, keys)
    np.testing.assert_allclose(np.asarray(r_on), np.asarray(r_off),
                               atol=2e-5, rtol=0)

    def loss(tex, cfg):
        s = dataclasses.replace(scene, tex_data=tex)
        return jnp.sum(integrator.trace(s, cfg, o, d, time, keys))

    g_on = jax.grad(loss)(scene.tex_data, cfg_on)
    g_off = jax.grad(loss)(
        scene.tex_data, dataclasses.replace(cfg_off, packed_atlas="off"))
    assert np.abs(np.asarray(g_on)).max() > 0
    np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                               atol=2e-5, rtol=1e-4)
