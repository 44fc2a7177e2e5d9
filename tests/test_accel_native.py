"""Native (C++) BVH builder vs the numpy builder and brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from tracer.accel.bvh import build_bvh, triangle_bounds
from tracer.accel.native import build_bvh_native


def _random_tris(n=200, seed=0):
    rng = np.random.RandomState(seed)
    verts = rng.randn(n, 3, 3).astype(np.float32)
    lo = verts.min(axis=1) - 1e-5
    hi = verts.max(axis=1) + 1e-5
    return lo, hi


def _validate(bvh, lo, hi):
    n = lo.shape[0]
    # every triangle appears exactly once across the leaves
    tris = bvh.leaf_tris[bvh.leaf_tris >= 0]
    assert sorted(tris.tolist()) == list(range(n))
    # every leaf's triangles are inside the leaf box
    for i in range(bvh.n_nodes):
        ls = bvh.node_leaf_start[i]
        if ls < 0:
            continue
        ids = bvh.leaf_tris[ls:ls + bvh.leaf_width]
        ids = ids[ids >= 0]
        assert (bvh.node_lo[i][None] <= lo[ids] + 1e-4).all()
        assert (bvh.node_hi[i][None] >= hi[ids] - 1e-4).all()
    # skip links frame valid subtrees
    assert (bvh.node_skip > np.arange(bvh.n_nodes)).all()
    assert (bvh.node_skip <= bvh.n_nodes).all()


def test_numpy_builder_valid():
    lo, hi = _random_tris()
    bvh = build_bvh(lo, hi, leaf_width=4)
    _validate(bvh, lo, hi)


def test_native_builder_valid():
    lo, hi = _random_tris(500, seed=2)
    bvh = build_bvh_native(lo, hi, leaf_width=4)
    if bvh is None:
        pytest.skip("native builder unavailable (no g++?)")
    _validate(bvh, lo, hi)


def test_native_traversal_matches_numpy_traversal():
    """Same closest hit through either builder's tree."""
    from tracer.scene.builder import SceneBuilder, MeshObject
    from tracer.scene.device import compile_scene
    from tracer.geometry import primitives as prim

    from tests.test_primitives import _filter_degenerate

    rng = np.random.RandomState(5)
    verts = rng.randn(80, 3).astype(np.float32)
    tris = rng.randint(0, 80, (120, 3)).astype(np.int32)
    tris = _filter_degenerate(verts, tris)

    sb = SceneBuilder()
    sb.add_mesh(MeshObject(verts, tris))
    scene_np = compile_scene(sb, use_native=False)
    scene_cc = compile_scene(sb, use_native=True)

    o = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    d = rng.randn(64, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t1, _ = prim.mesh_closest_hits(jnp.asarray(o), jnp.asarray(d), scene_np,
                                   1e-5)
    t2, _ = prim.mesh_closest_hits(jnp.asarray(o), jnp.asarray(d), scene_cc,
                                   1e-5)
    assert np.allclose(np.asarray(t1), np.asarray(t2), rtol=1e-5, atol=1e-5)
