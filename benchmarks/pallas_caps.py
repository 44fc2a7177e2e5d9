"""Capability probes for Pallas TPU in this environment.

Answers, empirically, the questions that shape the megakernel design:
1. How much VMEM can a single pallas_call actually hold (atlas residency)?
2. Does a per-lane dynamic gather from a VMEM table compile, and at what
   table sizes / layouts?
3. How fast are uint32 PCG hash chains on the VPU inside a kernel?

Run: python benchmarks/pallas_caps.py
"""

import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync_scalar(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def try_case(name, fn):
    try:
        t0 = time.perf_counter()
        v = fn()
        dt = time.perf_counter() - t0
        print(f"OK   {name}: {v} (compile+run {dt:.1f}s)")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


# ---------------------------------------------------------------------------
# 1. VMEM capacity
# ---------------------------------------------------------------------------

def vmem_probe(rows):
    x = jnp.ones((rows, 128), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x)
    return sync_scalar(out)


# ---------------------------------------------------------------------------
# 2. Dynamic gather inside a kernel
# ---------------------------------------------------------------------------

def gather_probe(table_size, idx_shape, mode):
    table = jnp.arange(table_size, dtype=jnp.float32)
    idx = jnp.arange(np.prod(idx_shape), dtype=jnp.int32).reshape(idx_shape) \
        % table_size

    def kernel(t_ref, i_ref, o_ref):
        ii = i_ref[:]
        if mode == "bracket":
            o_ref[:] = t_ref[ii]
        elif mode == "take":
            o_ref[:] = jnp.take(t_ref[:], ii, axis=0)
        elif mode == "take_along":
            t2 = t_ref[:].reshape(1, -1)
            o_ref[:] = jnp.take_along_axis(
                jnp.broadcast_to(t2, (ii.shape[0], table_size)),
                ii, axis=1).astype(jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(idx_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)
    return sync_scalar(jnp.sum(out))


# ---------------------------------------------------------------------------
# 3. PCG hash throughput in-kernel
# ---------------------------------------------------------------------------

def pcg_probe(tile, iters):
    x = jnp.arange(tile[0] * tile[1], dtype=jnp.uint32).reshape(tile)

    def kernel(x_ref, o_ref):
        def body(i, v):
            v = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
            w = ((v >> ((v >> jnp.uint32(28)) + jnp.uint32(4))) ^ v) \
                * jnp.uint32(277803737)
            return (w >> jnp.uint32(22)) ^ w
        v = jax.lax.fori_loop(0, iters, body, x_ref[:])
        o_ref[0, 0] = jnp.sum(v.astype(jnp.float32))

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    jf = jax.jit(f)
    sync_scalar(jf(x))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        sync_scalar(jf(x))
    dt = (time.perf_counter() - t0) / reps
    n_hash = tile[0] * tile[1] * iters
    return f"{n_hash / dt / 1e9:.1f} Ghash/s ({dt*1e3:.1f} ms)"


# ---------------------------------------------------------------------------
# 4. transcendentals throughput in-kernel (arccos/atan2/sqrt mix)
# ---------------------------------------------------------------------------

def transc_probe(tile, iters):
    x = jnp.linspace(-0.9, 0.9, tile[0] * tile[1],
                     dtype=jnp.float32).reshape(tile)

    def kernel(x_ref, o_ref):
        def body(i, v):
            a = jnp.arccos(jnp.clip(v, -0.99, 0.99))
            b = jnp.arctan2(v, a + 1.0)
            return jnp.sin(b) * 0.9
        v = jax.lax.fori_loop(0, iters, body, x_ref[:])
        o_ref[0, 0] = jnp.sum(v)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    jf = jax.jit(f)
    sync_scalar(jf(x))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        sync_scalar(jf(x))
    dt = (time.perf_counter() - t0) / reps
    n = tile[0] * tile[1] * iters
    return f"{n / dt / 1e9:.2f} G(acos+atan2+sin)/s ({dt*1e3:.1f} ms)"


def main():
    print(f"device: {jax.devices()[0]}")
    for mb in (8, 16, 32, 64, 96):
        rows = mb * 1024 * 1024 // (128 * 4)
        if not try_case(f"vmem {mb}MB", functools.partial(vmem_probe, rows)):
            break
    for size in (1024, 65536, 1 << 20):
        for mode in ("bracket", "take"):
            try_case(f"gather[{mode}] table={size} idx=(8,128)",
                     functools.partial(gather_probe, size, (8, 128), mode))
    try_case("gather[bracket] table=1M idx=(256,128)",
             functools.partial(gather_probe, 1 << 20, (256, 128), "bracket"))
    try_case("pcg (256,128)x200", functools.partial(pcg_probe, (256, 128), 200))
    try_case("transc (256,128)x200",
             functools.parametrize if False else functools.partial(
                 transc_probe, (256, 128), 200))


if __name__ == "__main__":
    main()
