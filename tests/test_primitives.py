"""Batched intersection kernels vs the scalar oracle on random rays."""

import numpy as np
import jax.numpy as jnp

from tracer.core.config import RenderConfig
from tracer.geometry import primitives as prim
from tracer.scene.builder import SceneBuilder, Material, MeshObject, GLASS
from tracer.scene.device import compile_scene
from tests.oracle import Oracle

EPS = 1e-5


def _rand_rays(n, seed=0, spread=3.0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = rng.rand(n).astype(np.float32)
    return o, d, t


def _scene_spheres():
    sb = SceneBuilder()
    sb.add_sphere((0., 0., 0.), 1.0, Material())
    sb.add_sphere((2., 0.5, -1.), 0.7,
                  Material(motion_blur_translation=(0., 1., 0.)))
    sb.add_sphere((-1., -1., 1.), 0.4, Material())
    return sb


def test_sphere_ts_match_oracle():
    sb = _scene_spheres()
    scene = compile_scene(sb)
    orc = Oracle(sb)
    o, d, tm = _rand_rays(200)
    ts = np.asarray(prim.sphere_ts(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), scene.sph_center,
        scene.sph_radius, scene.mat_mb[scene.sph_mat], scene.sph_valid, EPS))
    def root_sep(s, oi, di, ti):
        tc = s.center + ti * s.material.motion_blur_translation
        oc = oi - tc
        a = np.dot(di, di)
        b = 2 * np.dot(di, oc)
        c = np.dot(oc, oc) - s.radius ** 2
        delta = b * b - 4 * a * c
        return np.sqrt(max(delta, 0.0)) / (2 * a)

    for i in range(o.shape[0]):
        for j, s in enumerate(sb.spheres):
            oi = o[i].astype(np.float64)
            di = d[i].astype(np.float64)
            h = orc.isect_sphere(s, oi, di, tm[i])
            want = h["t"] if (h and h["t"] >= EPS) else None
            grazing = root_sep(s, oi, di, tm[i]) < 0.1
            if want is None:
                assert grazing or ts[i, j] > 1e30, (i, j, ts[i, j])
            elif ts[i, j] > 1e30:
                assert grazing, (i, j, want)
            else:
                # f32 quadratic (like the reference's C++ float path) vs the
                # f64 oracle loses precision near tangency.
                tol = 5e-2 if grazing else 2e-2
                assert abs(ts[i, j] - want) < tol * max(1, abs(want)), \
                    (i, j, ts[i, j], want)


def test_quad_ts_match_oracle():
    sb = SceneBuilder()
    sq = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 2., 2.,
                       Material())
    sq.rotate_x(35).translate((0.3, -0.2, -1.0))
    sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 3., 1.,
                  Material(mtype=GLASS))  # two-sided
    scene = compile_scene(sb)
    orc = Oracle(sb)
    o, d, tm = _rand_rays(200, seed=1)
    is_glass = (scene.mat_type[scene.quad_mat] == 1).astype(jnp.float32)
    ts = np.asarray(prim.quad_ts(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), scene.quad_v0,
        scene.quad_er, scene.quad_eu, scene.quad_normal,
        scene.mat_mb[scene.quad_mat], is_glass, scene.quad_valid, EPS))
    for i in range(o.shape[0]):
        for j, q in enumerate(sb.squares):
            oi = o[i].astype(np.float64)
            di = d[i].astype(np.float64)
            h = orc.isect_quad(q, oi, di, tm[i])
            want = h["t"] if h else None
            # conditioning: t error scales with 1/|d.n| near-parallel rays
            v = q.verts
            n = np.cross(v[1] - v[0], v[3] - v[0])
            n = n / np.linalg.norm(n)
            cond = abs(np.dot(di, n))
            tol = 2e-3 if cond > 1e-2 else 5e-2
            if want is None:
                assert ts[i, j] > 1e30 or cond <= 1e-2, (i, j, ts[i, j])
            elif ts[i, j] > 1e30:
                assert cond <= 1e-2, (i, j, want)
            else:
                assert abs(ts[i, j] - want) < tol * max(1, abs(want)), \
                    (i, j, ts[i, j], want)


def _tetra_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    return MeshObject(verts, tris)


def _filter_degenerate(verts, tris, min_area=1e-2):
    """Drop near-degenerate triangles: f32 vs f64 barycentrics flip on them
    (the reference rejects exactly-degenerate ones via NaN compares; real
    meshes contain neither)."""
    v = verts.astype(np.float64)[tris]
    area = 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1)
    return tris[area > min_area]


def test_bvh_matches_bruteforce_oracle():
    rng = np.random.RandomState(3)
    verts = rng.randn(60, 3).astype(np.float32)
    tris = rng.randint(0, 60, (80, 3)).astype(np.int32)
    tris = _filter_degenerate(verts, tris)
    sb = SceneBuilder()
    sb.add_mesh(MeshObject(verts, tris))
    scene = compile_scene(sb)
    orc = Oracle(sb)
    o, d, tm = _rand_rays(150, seed=4)
    t_mesh, tri_mesh = prim.mesh_closest_hits(
        jnp.asarray(o), jnp.asarray(d), scene, EPS)
    t_mesh = np.asarray(t_mesh)[:, 0]
    tri_mesh = np.asarray(tri_mesh)[:, 0]
    for i in range(o.shape[0]):
        h = orc.isect_mesh(sb.meshes[0], o[i].astype(np.float64),
                           d[i].astype(np.float64), tm[i])
        if h is None:
            assert t_mesh[i] > 1e30, (i, t_mesh[i], tri_mesh[i])
        else:
            assert abs(t_mesh[i] - h["t"]) < 2e-3 * max(1, abs(h["t"])), \
                (i, t_mesh[i], h["t"])


def test_closest_hit_priority_order():
    """Equal-t candidates resolve in (spheres, squares, meshes) order."""
    sb = SceneBuilder()
    # sphere and quad touching the same plane z=0, ray straight down z
    sb.add_sphere((0., 0., -1.), 1.0, Material())   # front point at z=0
    sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 2., 2.,
                  Material())
    scene = compile_scene(sb)
    from tracer.render import integrator
    o = jnp.asarray([[0., 0., 5.]])
    d = jnp.asarray([[0., 0., -1.]])
    tm = jnp.zeros(1)
    t_all, _ = integrator._scene_candidates(scene, o, d, tm, EPS)
    j = int(jnp.argmin(t_all, axis=1)[0])
    assert j < scene.sph_center.shape[0]  # sphere wins the tie
