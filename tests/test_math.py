"""Unit tests: shading math vs hand-derived values and the numpy oracle."""

import numpy as np
import jax.numpy as jnp

from tracer.core import mathutils as mu
from tests import oracle as orc


def test_reflect_matches_reference_form():
    d = np.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = np.array([[0.0, 1.0, 0.0]])
    r = np.asarray(mu.reflect(jnp.asarray(d), jnp.asarray(n)))
    assert np.allclose(r, [[1 / np.sqrt(2), 1 / np.sqrt(2), 0.0]], atol=1e-6)
    r2 = orc.reflect(d[0], n[0])
    assert np.allclose(r, r2[None], atol=1e-6)


def test_refract_matches_oracle():
    rng = np.random.RandomState(0)
    for _ in range(50):
        d = rng.randn(3)
        d /= np.linalg.norm(d)
        n = rng.randn(3)
        n /= np.linalg.norm(n)
        eta = rng.uniform(0.5, 2.0)
        got = np.asarray(mu.refract(jnp.asarray(d[None]), jnp.asarray(n[None]),
                                    jnp.asarray([eta])))[0]
        want = orc.refract(d, n, eta)
        assert np.allclose(got, want, atol=1e-5), (d, n, eta)


def test_schlick_matches_oracle():
    for cos, idx in [(0.1, 1.5), (0.9, 1.33), (1.0, 2.0), (0.0, 1.4)]:
        got = float(mu.schlick_reflectance(jnp.float32(cos), jnp.float32(idx)))
        want = orc.reflectance(cos, idx)
        assert abs(got - want) < 1e-5


def test_gamma_correct():
    c = np.array([0.25, 0.5, 1.0])
    got = np.asarray(mu.gamma_correct(jnp.asarray(c)))
    assert np.allclose(got, c ** (1 / 2.2), atol=1e-6)


def test_trunc_mod2_matches_cpp_int_cast():
    # C++: (int)(u) % 2 — truncation toward zero, remainder keeps the sign
    # of the dividend (so -1.5 -> -1, not +1 as Python's % would give).
    for u, cpp in [(0.3, 0), (1.7, 1), (2.1, 0), (-0.5, 0), (-1.5, -1),
                   (3.999, 1), (-2.5, 0), (-3.2, -1)]:
        got = float(mu.trunc_mod2(jnp.float32(u)))
        assert got == float(cpp), (u, got, cpp)
