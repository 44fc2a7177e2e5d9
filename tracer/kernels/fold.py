"""Pallas texel-cotangent fold: sorted segment accumulation of nearest-texel
gradient updates onto a [P, 3] atlas, replacing the flat XLA scatter-add.

The record-replay backward (integrator._trace_cv_bwd) must fold ~2M
(texel id, rgb cotangent) updates per Cornell sample onto the texture
atlas — differentiating the nearest-texel fetch of
`/root/reference/src/Material.cpp:82-88`. An XLA scatter processes every
scalar serially at ~7 ns (PERF.md floor #2: ~41 ms/sample, flat w.r.t.
sortedness/uniqueness because static shapes make dedup impossible). This
module vectorizes the fold instead:

1. sort the update stream by texel id (lax.sort, 4 operands: ~5 ms at 2M);
2. split the atlas into fixed windows of W = W1*W2 texels; the sorted
   stream's slice for window w is [bnd[w], bnd[w+1]) via one tiny
   searchsorted;
3. a Pallas kernel (sequential grid over windows) double-buffer-DMAs the
   slice in C-row chunks and accumulates each chunk with a HIERARCHICAL
   ONE-HOT MXU contraction: local id = hi*W2 + lo decomposes the scatter
   into out[hi, lo] += sum_c g[c] * [hi_c == hi] * [lo_c == lo], i.e. one
   [W1, C] x [C, W2] matmul per channel — C*(W1+W2) vector compares + MXU
   MACs per chunk instead of C serial scalar RMWs.

Measured on v5e at Cornell's 2.05M updates: 7.6 ms vs 41.7 ms for the
flat scatter (sort 5.0 of it) — see benchmarks/fold_exp1.py.

TPU lowering notes (each learned the hard way, benchmarks/fold_exp1.py):
- ids CANNOT ride as an f32 bitcast: small int bit patterns are DENORMAL
  floats and the TPU flushes them to zero in transit. They ride as the
  exact float value id + 2^23 instead (exact for id < 2^23; atlases are
  ~1.6M texels) and decode by float subtraction in the kernel;
- the update stream is DMA'd as whole [4, C] chunks indexed on the
  LEADING axis of a [NC, 4, C] view — minor-dim dynamic slices need
  128-alignment proofs and middle-dim slicing violates the (8,128)
  tiling;
- scalar window bounds live in a 2-D SMEM array (scalars must be 2-D).

Accumulation order differs from the XLA scatter (per-window matmul partial
sums vs stream order), so results agree to f32 summation tolerance, not
bitwise; gradients are tolerance-checked anyway (tests/test_grad.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.kernels import common as kc

W1 = 32
W2 = 128
W = W1 * W2           # texels per output window
C = 2048              # updates per DMA chunk
F24 = 8388608.0       # 2^23: id <-> float offset (exact integer range)
MIN_M = 1 << 16       # below this the flat scatter wins (sort overhead)


def _kernel(bnd_ref, pk_ref, out_ref, buf, sem):
    w = pl.program_id(0)
    # chunk-granular range: chunk c0 may start with head rows of window
    # w-1 — they decode to local < 0 and self-mask in the one-hot compare
    c0 = bnd_ref[w, 0] // C
    hi = bnd_ref[w + 1, 0]
    out_ref[:] = jnp.zeros_like(out_ref)
    n_it = pl.cdiv(hi - c0 * C, C)

    iota1 = jax.lax.broadcasted_iota(jnp.int32, (W1, 1), 0)    # [W1, 1]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1)    # [1, W2]
    base_f = F24 + (w * W).astype(jnp.float32)

    def dma(slot, j):
        return pltpu.make_async_copy(
            pk_ref.at[c0 + j], buf.at[slot], sem.at[slot])

    @pl.when(n_it > 0)
    def _():
        dma(0, 0).start()

        def loop(j, _):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_it)
            def _():
                dma(1 - slot, j + 1).start()

            dma(slot, j).wait()
            chunk = buf[slot]                                # [4, C]
            # head rows of the previous window, tail rows of the next
            # and zero-padded slack all decode outside [0, W): hi1 then
            # matches no window row -> contribution 0. (In-window ids of
            # other chunks cannot appear: the stream is sorted.)
            local = (chunk[3:4, :] - base_f).astype(jnp.int32)  # [1, C]
            hi1 = jax.lax.shift_right_arithmetic(local, 7)   # local//W2
            lo2 = jnp.bitwise_and(local, W2 - 1)             # local% W2
            oh2 = (lo2.reshape(C, 1) == iota2).astype(jnp.float32)
            for ch in range(3):
                g = chunk[ch:ch + 1, :]                      # [1, C]
                ohg = jnp.where(hi1 == iota1, g, 0.0)        # [W1, C]
                # HIGHEST: one-hot entries are exact 0/1, so full-f32
                # passes make each product exact (same rationale as
                # integrator._rows); DEFAULT's bf16 passes cost ~5e-3
                # absolute error on O(1) grads — measured, not guessed
                out_ref[ch, 0] += jax.lax.dot_general(
                    ohg, oh2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            return 0

        jax.lax.fori_loop(0, n_it, loop, 0)


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sorted_fold(data_g, idx, gx, gy, gz, interpret=False):
    """data_g [P, 3] + scatter_add(idx [M], (gx, gy, gz) [M] each).

    Drop-in for `data_g.reshape(-1).at[i3].add(v3).reshape(...)` with the
    3 channels planar; same result up to f32 summation order. Requires
    P < 2^23 - W (id+2^23 float encoding, module docstring)."""
    P = data_g.shape[0]
    M = idx.shape[0]
    NW = _cdiv(P, W)
    assert NW * W < (1 << 23), "atlas too large for the f24 id encoding"
    sent = jnp.int32(NW * W - 1)

    ids_s, gx_s, gy_s, gz_s = jax.lax.sort(
        (idx.astype(jnp.int32), gx, gy, gz), num_keys=1)
    Mp = _cdiv(M, C) * C
    pad = Mp - M

    def padded(a, fill):
        return jnp.pad(a, (0, pad), constant_values=fill)

    ids_p = padded(ids_s, sent)
    pk = jnp.stack([padded(gx_s, 0.0), padded(gy_s, 0.0),
                    padded(gz_s, 0.0),
                    ids_p.astype(jnp.float32) + F24])        # [4, Mp]
    pk4 = pk.reshape(4, Mp // C, C).transpose(1, 0, 2)       # [NC, 4, C]
    bnd = jnp.searchsorted(
        ids_p, (jnp.arange(NW + 1, dtype=jnp.int32) * W)).astype(jnp.int32)

    out = pl.pallas_call(
        _kernel,
        grid=(NW,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((3, 1, W1, W2), lambda w: (0, w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, NW, W1, W2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 4, C), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(bnd[:, None], pk4)
    res = out.reshape(3, NW * W)[:, :P].T                    # [P, 3]
    return data_g + res


def fold_updates(data_g, idxs, gs, use_kernel):
    """Fold per-bounce texel-cotangent updates onto a [P, 3] atlas grad.

    idxs: list of [...]-shaped i32 index arrays; gs: matching list of
    planar (gx, gy, gz) cotangents. `use_kernel` routes to the sorted
    Pallas fold (TPU) or the flat interleaved XLA scatter (CPU fallback /
    tiny batches)."""
    idx = jnp.concatenate([ix.reshape(-1) for ix in idxs])
    if (use_kernel and kc.on_tpu() and idx.shape[0] >= MIN_M
            and _cdiv(data_g.shape[0], W) * W < (1 << 23)):
        ch = [jnp.concatenate([gg[a].reshape(-1) for gg in gs])
              for a in range(3)]
        return sorted_fold(data_g, idx, ch[0], ch[1], ch[2])
    # Flat scalar scatter: XLA-TPU scatters rows at ~40 ns/row but
    # scalars at ~7 ns, so interleaving the 3 channels into one flat
    # scatter halves the fold cost (benchmarks: 49 vs 100 ms at 2.46M
    # updates).
    i3 = jnp.concatenate([idx * 3, idx * 3 + 1, idx * 3 + 2])
    v3 = jnp.concatenate(
        [jnp.concatenate([gg[a].reshape(-1) for gg in gs])
         for a in range(3)])
    return data_g.reshape(-1).at[i3].add(v3).reshape(data_g.shape)
