"""Round-5 judge item: is the 0.89 ms/bounce pair-atlas row gather an XLA
floor or a silicon floor? The untried alternative was a HAND-ROLLED
in-kernel DMA row-fetch pipeline (pltpu.make_async_copy per row, double
buffered) over sorted texel indices. This probe measures exactly that:
per-row dynamic DMAs from an HBM-resident [R, 32] i32 atlas into VMEM at
data-dependent row indices, N rows per kernel, vs the XLA gather.

Run: python benchmarks/gather_dma_probe.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 122750          # pair-atlas rows
# NOTE: Mosaic cannot DMA-slice sub-128-lane rows of an HBM table (the
# (1,128) tiling forbids a [1,32] slice), so the in-kernel pipeline is
# probed on 128-col (512B) rows — 4x the bytes of the real 32-col atlas
# row; the XLA gather is measured on BOTH widths for comparison.
WID = 128
N = 409600          # rays per bounce
PER_TILE = 1024     # rows fetched per grid step


def _kernel(idx_ref, tab_ref, out_ref, buf, sem, *, nbuf):
    def dma(slot, i):
        return pltpu.make_async_copy(
            tab_ref.at[idx_ref[i]], buf.at[slot], sem.at[slot])

    for i in range(nbuf):
        dma(i, i).start()

    def body(i, _):
        slot = jax.lax.rem(i, nbuf)
        dma(slot, i).wait()
        out_ref[i] = buf[slot]

        @pl.when(i + nbuf < PER_TILE)
        def _():
            dma(slot, i + nbuf).start()
        return 0

    jax.lax.fori_loop(0, PER_TILE, body, 0)


def dma_gather(tab, idx, nbuf):
    n = idx.shape[0]
    grid = n // PER_TILE
    return pl.pallas_call(
        functools.partial(_kernel, nbuf=nbuf),
        grid=(grid,),
        in_specs=[pl.BlockSpec((PER_TILE,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((PER_TILE, WID), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, WID), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nbuf, WID), jnp.int32),
                        pltpu.SemaphoreType.DMA((nbuf,))],
    )(idx, tab)


def slope(name, f, args, r1=2, r2=6, reps=3):
    def timed(r):
        jf = jax.jit(lambda *a: jax.lax.scan(
            lambda c, s: (c + jnp.sum(f(s, *a)) * 1e-20, None),
            jnp.float32(0.0), jnp.arange(r, dtype=jnp.int32))[0])
        float(jf(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); float(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (timed(r2) - timed(r1)) / (r2 - r1)
    print(f"{name:46s} {dt*1e3:9.3f} ms ({dt/N*1e9:.2f} ns/row)",
          flush=True)
    return dt


def main():
    key = jax.random.key(0)
    tab = jax.random.randint(key, (R, WID), 0, 1 << 20, jnp.int32)
    idx = jnp.sort(jax.random.randint(key, (N,), 0, R, jnp.int32))

    import numpy as np
    got = np.asarray(dma_gather(tab, idx[:4096], 4))
    want = np.asarray(tab[idx[:4096]])
    assert np.array_equal(got, want), "dma gather wrong"
    print("dma gather correct on 4096 rows", flush=True)

    tab32 = tab[:, :32]

    def xg(s, tab, idx):
        return tab[(idx + s) % R]

    slope("XLA gather 409.6K x 128B rows (real atlas)", xg, (tab32, idx))
    slope("XLA gather 409.6K x 512B rows", xg, (tab, idx))
    for nbuf in (4, 8, 16):
        slope(f"in-kernel DMA pipeline nbuf={nbuf}",
              lambda s, tab, idx, nbuf=nbuf: dma_gather(tab,
                                                        (idx + s) % R,
                                                        nbuf),
              (tab, idx))


if __name__ == "__main__":
    main()
