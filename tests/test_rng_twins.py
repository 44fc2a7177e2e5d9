"""Exact-equality tests pinning the planar RNG twins to their array
counterparts (ADVICE r1: the twins hand-encode uniform()'s lane-key layout
— i+2, k*3+a+2, k*2+a+2 — so any change to lane_keys / reshape order must
fail HERE, not silently desynchronize the production planar path)."""

import numpy as np
import jax.numpy as jnp

from tracer.core import rng
from tracer.core import vec3p as vp


KEYS = rng.ray_keys(1234, jnp.arange(97, dtype=jnp.int32))


def eq(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_uniform_lanes_p_matches_uniform_columns():
    n = 7
    arr = rng.uniform(KEYS, (n,), minval=-2.0, maxval=3.0)
    pl = rng.uniform_lanes_p(KEYS, n, minval=-2.0, maxval=3.0)
    for i in range(n):
        eq(pl[i], arr[:, i])


def test_cube_unit_vector_p_matches_array():
    arr = rng.cube_unit_vector(KEYS)
    p = rng.cube_unit_vector_p(KEYS)
    for a in range(3):
        eq(p[a], arr[:, a])


def test_sphere_unit_vector_p_matches_array():
    arr = rng.sphere_unit_vector(KEYS)
    p = rng.sphere_unit_vector_p(KEYS)
    for a in range(3):
        eq(p[a], arr[:, a])


def test_cube_unit_vector_lane_p_matches_suffix_lane():
    K = 5
    arr = rng.cube_unit_vector(KEYS, (K,))       # [N, K, 3]
    for k in range(K):
        p = rng.cube_unit_vector_lane_p(KEYS, k)
        for a in range(3):
            eq(p[a], arr[:, k, a])


def test_sphere_unit_vector_lane_p_matches_suffix_lane():
    K = 4
    arr = rng.sphere_unit_vector(KEYS, (K,))
    for k in range(K):
        p = rng.sphere_unit_vector_lane_p(KEYS, k)
        for a in range(3):
            eq(p[a], arr[:, k, a])


def test_uniform_lane_key_p_matches_lane_keys():
    K = 6
    lk = rng.lane_keys(KEYS, K)                  # [N, K]
    for k in range(K):
        eq(rng.uniform_lane_key_p(KEYS, k), lk[:, k])


def test_uniform_lanes_leading_p_matches_uniform():
    n = 9
    arr = rng.uniform(KEYS, (n,))                # [N, n]
    lead = rng.uniform_lanes_leading_p(KEYS, n)  # [n, N]
    eq(lead, arr.T)
