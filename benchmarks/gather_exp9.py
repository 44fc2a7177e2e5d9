"""Gather law on this chip: N=408K row fetches vs table row-width,
table size, and index locality. Run: python benchmarks/gather_exp9.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

N = 850 * 480

def slope(name, body, args, r1=8, r2=64, reps=4):
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                out = body(s, *a)
                return c + jnp.sum(jnp.stack(
                    [jnp.sum(x.astype(jnp.float32))
                     for x in jax.tree.leaves(out)])) * 1e-20, None
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
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt

def main():
    for W in (1, 2, 4, 8, 16, 32):
        R = (16 << 20) // (4 * W)          # ~16MB table
        tab = jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)
        idx = jax.random.randint(jax.random.key(1), (N,), 0, R)
        slope(f"16MB table W={W:2d} random idx",
              lambda s, t, i, R=R: t[(i + s) % R], (tab, idx))
    W = 2
    for MB, nm in [(0.0625, "64KB"), (1, "1MB"), (64, "64MB")]:
        R = int(MB * (1 << 20)) // (4 * W)
        tab = jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)
        idx = jax.random.randint(jax.random.key(1), (N,), 0, R)
        slope(f"{nm} table W=2 random idx",
              lambda s, t, i, R=R: t[(i + s) % R], (tab, idx))
    # locality: sorted / tile-local / constant indices, 16MB W=2
    R = (16 << 20) // 8
    tab = jnp.arange(R * 2, dtype=jnp.int32).reshape(R, 2)
    idx_r = jax.random.randint(jax.random.key(1), (N,), 0, R)
    idx_sorted = jnp.sort(idx_r)
    idx_const = jnp.zeros((N,), jnp.int32)
    idx_local = (jnp.arange(N, dtype=jnp.int32) % 1024)
    for nm, ix in [("sorted", idx_sorted), ("const", idx_const),
                   ("1K-local", idx_local)]:
        slope(f"16MB W=2 {nm} idx",
              lambda s, t, i, R=R: t[(i + s) % R], (tab, ix))
    # f32 [P,3] row gather (the exact-path shape) for comparison
    R3 = (16 << 20) // 12
    tab3 = jnp.arange(R3 * 3, dtype=jnp.float32).reshape(R3, 3)
    slope("16MB f32 [P,3] random idx",
          lambda s, t, i, R=R3: t[(i + s) % R],
          (tab3, jax.random.randint(jax.random.key(2), (N,), 0, R3)))

if __name__ == "__main__":
    main()
