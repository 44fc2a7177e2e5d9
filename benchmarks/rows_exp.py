"""Small-table row fetch strategies at N=408K on the attached device:
one-hot MXU matmul vs unrolled broadcast-select chain vs plain gather —
fwd and fwd+bwd. Directs the _rows rewrite. Run: python benchmarks/rows_exp.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

N = 850 * 480

def slope(name, body, args, r1=4, r2=16, reps=3):
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                out = body(s, *a)
                return c + jnp.sum(jnp.stack(
                    [jnp.sum(x) for x in jax.tree.leaves(out)])) * 1e-20, None
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
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)
    return dt

def fetch_mm(table, idx):
    K = table.shape[0]
    oh = (idx[:, None] == jnp.arange(K, dtype=idx.dtype)[None, :]).astype(
        table.dtype)
    return jnp.dot(oh, table, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

def fetch_sel(table, idx):
    K, F = table.shape
    cols = []
    for f in range(F):
        acc = jnp.zeros(idx.shape, table.dtype)
        for k in range(K):
            acc = jnp.where(idx == k, table[k, f], acc)
        cols.append(acc)
    return jnp.stack(cols, axis=-1)

def fetch_gather(table, idx):
    return table[idx]

def main():
    for K, F in [(16, 18), (32, 18), (64, 18)]:
        table = jax.random.normal(jax.random.key(0), (K, F))
        idx = jax.random.randint(jax.random.key(1), (N,), 0, K)
        # salt idx with s so nothing hoists out of the rep scan
        for nm, fn in [("matmul", fetch_mm), ("select", fetch_sel),
                       ("gather", fetch_gather)]:
            slope(f"K={K:3d} {nm} fwd",
                  lambda s, t, i, fn=fn, K=K: fn(t, (i + s) % K),
                  (table, idx))
        for nm, fn in [("matmul", fetch_mm), ("select", fetch_sel)]:
            def fb(s, t, i, fn=fn, K=K):
                def loss(t):
                    return jnp.sum(fn(t, (i + s) % K) ** 2)
                return jax.grad(loss)(t)
            slope(f"K={K:3d} {nm} fwd+bwd", fb, (table, idx))

if __name__ == "__main__":
    main()
