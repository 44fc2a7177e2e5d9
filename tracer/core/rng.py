"""Counter-based RNG for the wavefront tracer.

The reference uses a global / thread-local mt19937 stream
(`/root/reference/src/Functions.cpp:4-8`, `main.cpp:181`). On TPU we need a
stateless counter-based design: every random draw is a pure function of
(seed, pixel, sample, bounce, purpose), so forward and backward replay the
identical Bernoulli/jitter decisions — which is what makes the stochastic
shadow and glass paths differentiable-consistent and the renderer
reproducible under any sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Purpose salts — one sub-stream per use site.
PIXEL_JITTER = 0
RAY_TIME = 1
SCATTER_DIR = 2
SCATTER_GLASS = 3
SHADOW_LIGHT_POS = 4
SHADOW_BERNOULLI = 5


def ray_keys(base_key, ray_ids):
    """Vectorized per-ray keys: fold the flat ray id into the base key.

    `ray_ids` is int32 `[N]`; returns keys `[N]`.
    """
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(ray_ids)


def salted(keys, *salts):
    """Fold one or more scalar salts into a batch of keys `[N]`."""
    for s in salts:
        keys = jax.vmap(lambda k: jax.random.fold_in(k, s))(keys)
    return keys


def uniform(keys, shape_suffix=(), minval=0.0, maxval=1.0):
    """Per-key uniforms: keys `[N]` -> `[N, *shape_suffix]` float32."""
    def draw(k):
        return jax.random.uniform(k, shape_suffix, jnp.float32, minval, maxval)
    return jax.vmap(draw)(keys)


def cube_unit_vector(keys, shape_suffix=()):
    """The reference's `random_unit_vector` (Functions.cpp:14-18):
    a normalized uniform cube sample — NOT uniform on the sphere. Replicated
    exactly for distribution parity under compat=reference.
    """
    p = uniform(keys, shape_suffix + (3,), -1.0, 1.0)
    n = jnp.linalg.norm(p, axis=-1, keepdims=True)
    return p / jnp.maximum(n, 1e-20)


def sphere_unit_vector(keys, shape_suffix=()):
    """Uniform-on-sphere sample (compat=physical)."""
    u = uniform(keys, shape_suffix + (2,))
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
