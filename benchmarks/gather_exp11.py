"""Gather cost landscape round 4: does row-gather cost depend on
(a) index locality/duplication, (b) sortedness, (c) gather size (one big
vs many small), (d) table size? Directs the forward-50M work.
Run: python benchmarks/gather_exp11.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

N = 408000
ROWS = 122750   # pair_pack rows
W = 32          # pair row width (i32)


def slope(name, body, args, r1=8, r2=64, reps=4):
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                out = body(s, *a)
                return c + jnp.sum(out.astype(jnp.float32)) * 1e-20, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(r, dtype=jnp.int32))
            return c
        float(jf(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); float(jf(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (timed(r2) - timed(r1)) / (r2 - r1)
    print(f"{name:48s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    tab = jax.random.randint(key, (ROWS, W), 0, 1 << 20, jnp.int32)
    idx_rand = jax.random.randint(key, (N,), 0, ROWS, jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    # local: blocks of 128 lanes share a small neighborhood
    nb = (N + 127) // 128
    base = jax.random.randint(key, (nb,), 0, ROWS - 128, jnp.int32)
    off = jax.random.randint(jax.random.key(1), (N,), 0, 128, jnp.int32)
    idx_local = jnp.repeat(base, 128)[:N] + off
    idx_same = jnp.zeros((N,), jnp.int32)  # all one row
    half = jnp.where(jnp.arange(N) % 2 == 0, idx_rand, 0)  # 50% row 0

    def g(s, tab, idx):
        i = (idx + s) % ROWS
        return tab[i]

    def g_shift(s, tab, idx):
        # add the same salt to every index: locality structure preserved,
        # but values change per iteration so nothing hoists
        return tab[(idx + s) % ROWS]

    slope("gather 408K random rows", g, (tab, idx_rand))
    slope("gather 408K sorted rows", g_shift, (tab, idx_sorted))
    slope("gather 408K local-block rows", g_shift, (tab, idx_local))
    slope("gather 408K all-same row", g_shift, (tab, idx_same))
    slope("gather 408K 50% row-0", g_shift, (tab, half))

    # one big gather vs six small
    idx6 = jax.random.randint(key, (6 * N,), 0, ROWS, jnp.int32)
    slope("gather 2.45M random rows (one op)", g, (tab, idx6))

    def g6(s, tab, idx):
        acc = jnp.zeros((N, W), jnp.int32)
        for b in range(6):
            i = (idx[b * N:(b + 1) * N] + s) % ROWS
            acc = acc + tab[i]
        return acc
    slope("gather 6x408K random rows (six ops)", g6, (tab, idx6))

    # table-size scaling at fixed gather count
    for rows2 in (1024, 8192, 32768, 122750, 500000):
        t2 = jax.random.randint(key, (rows2, W), 0, 1 << 20, jnp.int32)
        i2 = jax.random.randint(key, (N,), 0, rows2, jnp.int32)
        slope(f"gather 408K rows, table {rows2}x{W}", g, (t2, i2))

    # row-width scaling
    for w2 in (1, 8, 16, 64):
        t2 = jax.random.randint(key, (ROWS, w2), 0, 1 << 20, jnp.int32)
        slope(f"gather 408K rows, table {ROWS}x{w2}", g, (t2, idx_rand))

    # narrow f32x3 row (the unpacked path)
    t3 = jax.random.normal(key, (1242977, 3), jnp.float32)
    i3 = jax.random.randint(key, (N,), 0, 1242977, jnp.int32)
    slope("gather 408K rows, table 1.24Mx3 f32",
          lambda s, t, i: t[(i + s) % 1242977], (t3, i3))


if __name__ == "__main__":
    main()
