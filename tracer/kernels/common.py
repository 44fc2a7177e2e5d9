"""Shared Pallas-TPU kernel utilities.

RNG: Mosaic cannot cast uint32->float32, so the kernels run the SAME PCG
hash as tracer/core/rng.py on int32 with logical shifts — bit-identical to
the uint32 jnp path (verified on-chip: benchmarks/pallas_caps2.py
`int32 pcg bit-parity vs jnp rng: max|diff|=0.0`). Keys enter kernels as a
bitcast int32 view of the uint32 key arrays.

Layout: kernels take planar ray components reshaped to [rows, 128] f32
(rays in the lane dimension), tiled (TILE_ROWS, 128) over a 1-D grid.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

INF = 3.0e38          # matches tracer/geometry/primitives.py
_GOLDEN = 0x9E3779B9  # rng._GOLDEN
LANES = 128
TILE_ROWS = 128       # 16384 rays per kernel tile


def _i32(x: int) -> int:
    """Python int -> signed-int32 value with the same 32-bit pattern."""
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x >= (1 << 31) else x


GOLDEN_I32 = _i32(_GOLDEN)


def pcg_i32(v):
    """rng._pcg on int32 (bit-identical to the uint32 version)."""
    v = v * jnp.int32(747796405) + jnp.int32(_i32(2891336453))
    sh = jax.lax.shift_right_logical(v, jnp.int32(28)) + jnp.int32(4)
    w = (jax.lax.shift_right_logical(v, sh) ^ v) * jnp.int32(277803737)
    return jax.lax.shift_right_logical(w, jnp.int32(22)) ^ w


def mix_i32(key, salt):
    """rng._mix on int32. `salt` may be a traced int32 or a python int."""
    if isinstance(salt, int):
        c = jnp.int32(_i32(salt * _GOLDEN + 1))
    else:
        c = salt * jnp.int32(GOLDEN_I32) + jnp.int32(1)
    return pcg_i32(key ^ c)


def to_unit_i32(bits):
    """rng._to_unit_float on int32 bits: top 24 bits -> [0, 1)."""
    return jax.lax.shift_right_logical(bits, jnp.int32(8)).astype(
        jnp.float32) * jnp.float32(1.0 / 16777216.0)


def uniform_i32(key, salt):
    """One uniform draw from a sub-stream (== rng lane draw pattern)."""
    return to_unit_i32(pcg_i32(mix_i32(key, salt)))


def cube_unit_vector_lane(skey, k):
    """rng.cube_unit_vector_lane_p(skeys, k), int32 (static k)."""
    comps = []
    for a in range(3):
        u = to_unit_i32(pcg_i32(mix_i32(skey, k * 3 + a + 2)))
        comps.append(-1.0 + 2.0 * u)
    x, y, z = comps
    n = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-20)
    return x / n, y / n, z / n


def sphere_unit_vector_lane(skey, k):
    """rng.sphere_unit_vector_lane_p(skeys, k), int32 (static k)."""
    u0 = to_unit_i32(pcg_i32(mix_i32(skey, k * 2 + 2)))
    u1 = to_unit_i32(pcg_i32(mix_i32(skey, k * 2 + 3)))
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u1
    return r * jnp.cos(phi), r * jnp.sin(phi), z


def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def use_kernels(cfg) -> bool:
    """Resolve cfg.kernels ('auto'|'on'|'off'): 'auto' = real TPU only;
    'on' forces interpret mode off-TPU (tests)."""
    mode = getattr(cfg, "kernels", "auto")
    if mode == "off":
        return False
    if mode == "on":
        return True
    return on_tpu()


def interpret() -> bool:
    return not on_tpu()


def pad_rows(n: int, tile_rows: int = TILE_ROWS) -> int:
    """Padded ray count: a whole number of (tile_rows x 128) tiles."""
    per = tile_rows * LANES
    return ((n + per - 1) // per) * per


def to_tiles(x, n_pad: int, fill=0.0):
    """[N] -> [n_pad/128, 128], padded with `fill`."""
    n = x.shape[0]
    if n_pad != n:
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
    return x.reshape(n_pad // LANES, LANES)


def from_tiles(x, n: int):
    """[rows, 128] -> [N] (drop padding)."""
    return x.reshape(-1)[:n]
