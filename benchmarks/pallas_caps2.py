"""Pallas TPU capability probes, round 2: the ops the megakernel needs.

Run: python benchmarks/pallas_caps2.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def try_case(name, fn):
    try:
        t0 = time.perf_counter()
        v = fn()
        print(f"OK   {name}: {v} ({time.perf_counter()-t0:.1f}s)")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def run1(kernel, *arrays, out=jnp.float32):
    res = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), out),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in arrays],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(*arrays)
    return sync(res)


def probe_uint32_ops():
    x = (jnp.arange(8 * 128, dtype=jnp.uint32) * 2654435761).reshape(8, 128)

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        v = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
        w = ((v >> ((v >> jnp.uint32(28)) + jnp.uint32(4))) ^ v) \
            * jnp.uint32(277803737)
        v = (w >> jnp.uint32(22)) ^ w
        # to float via int32 path: top-24-bit mantissa scale
        f = (v >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
        o_ref[0, 0] = jnp.sum(f * jnp.float32(1.0 / 16777216.0))

    return run1(kernel, x)


def probe_int32_pcg_parity():
    """PCG on int32 with logical shifts: must match the uint32 jnp result."""
    from tracer.core import rng
    ids = jnp.arange(8 * 128, dtype=jnp.int32)
    want = np.asarray(rng.uniform(rng.ray_keys(0, ids))).reshape(8, 128)

    x = ids.reshape(8, 128)

    def kernel(x_ref, o_ref):
        def pcg_i32(v):
            v = v * jnp.int32(747796405) + jnp.int32(-1403630843)  # 2891336453
            sh = jax.lax.shift_right_logical(v, jnp.int32(28)) + jnp.int32(4)
            w = (jax.lax.shift_right_logical(v, sh) ^ v) \
                * jnp.int32(277803737)
            return jax.lax.shift_right_logical(w, jnp.int32(22)) ^ w

        def mix(k, salt):
            return pcg_i32(k ^ (salt * jnp.int32(0x9E3779B9 - (1 << 32))
                                + jnp.int32(1)))

        seed = jnp.int32(rng_seed_word)
        keys = mix(jnp.full_like(x_ref[:], seed) ^ jnp.int32(0), x_ref[:])
        # ray_keys = _mix(seed_broadcast, ray_ids)
        bits = pcg_i32(mix(keys, jnp.int32(0)))
        f = jax.lax.shift_right_logical(bits, jnp.int32(8)).astype(
            jnp.float32) * jnp.float32(1.0 / 16777216.0)
        o_ref[:] = f

    global rng_seed_word
    from tracer.core.rng import _seed_word
    rng_seed_word = int(np.asarray(_seed_word(0)))

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    got = np.asarray(got)
    return f"max|diff|={np.abs(got - want).max()}"


def probe_transcendental(opname, op):
    x = jnp.linspace(0.1, 0.9, 8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kernel(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(op(x_ref[:]))

    return functools.partial(run1, kernel, x)


def probe_f32_to_i32():
    x = jnp.linspace(0.0, 100.0, 8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kernel(x_ref, o_ref):
        i = jnp.trunc(x_ref[:]).astype(jnp.int32)
        o_ref[0, 0] = jnp.sum(i)

    return run1(kernel, x, out=jnp.int32)


def probe_take_along_axis():
    table = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    idx = (jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128) * 7) % 128

    def kernel(t_ref, i_ref, o_ref):
        o_ref[0, 0] = jnp.sum(jnp.take_along_axis(t_ref[:], i_ref[:], axis=1))

    return run1(kernel, table, idx)


def probe_smem_table_loop():
    """Scalar SMEM reads in a python loop over objects + select carries."""
    tab = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8)
    x = jnp.ones((256, 128), jnp.float32)

    def kernel(tab_ref, x_ref, o_ref):
        v = x_ref[:]
        best = jnp.full_like(v, 1e30)
        arg = jnp.zeros_like(v)
        for k in range(16):
            c = tab_ref[k, 0]
            t = v * c + tab_ref[k, 1]
            better = t < best
            best = jnp.where(better, t, best)
            arg = jnp.where(better, jnp.float32(k), arg)
        o_ref[0, 0] = jnp.sum(best) + jnp.sum(arg)

    res = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(tab, x)
    return sync(res)


def probe_vpu_flops():
    """Raw VPU f32 FMA throughput on a (256,128) tile."""
    x = jnp.ones((256, 128), jnp.float32) * 0.5

    def kernel(x_ref, o_ref):
        def body(i, v):
            return v * jnp.float32(0.9999) + jnp.float32(1e-6)
        v = jax.lax.fori_loop(0, 3000, body, x_ref[:])
        o_ref[0, 0] = jnp.sum(v)

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM)))
    sync(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(f(x))
    dt = (time.perf_counter() - t0) / 10
    ops = 256 * 128 * 3000
    return f"{ops / dt / 1e9:.0f} G fma-lane-ops/s ({dt*1e3:.2f} ms)"


def main():
    print(f"device: {jax.devices()[0]}")
    try_case("uint32 pcg + i32 cast", probe_uint32_ops)
    try_case("int32 pcg bit-parity vs jnp rng", probe_int32_pcg_parity)
    for name, op in [
        ("atan2", lambda v: jnp.arctan2(v, v + 0.3)),
        ("sin", jnp.sin), ("cos", jnp.cos), ("sqrt", jnp.sqrt),
        ("rsqrt", jax.lax.rsqrt), ("exp", jnp.exp), ("log", jnp.log),
        ("pow", lambda v: jnp.power(v, jnp.float32(2.2))),
        ("arcsin", jnp.arcsin),
        ("floor", jnp.floor), ("trunc", jnp.trunc), ("sign", jnp.sign),
        ("abs", jnp.abs), ("min", lambda v: jnp.minimum(v, 0.5)),
    ]:
        try_case(name, probe_transcendental(name, op))
    try_case("f32->i32 trunc cast", probe_f32_to_i32)
    try_case("take_along_axis axis=1 (256,128)", probe_take_along_axis)
    try_case("smem table loop (16 objs)", probe_smem_table_loop)
    try_case("vpu fma throughput", probe_vpu_flops)


if __name__ == "__main__":
    main()
