"""rows_exp with enough in-jit reps to beat dispatch jitter, plus a
hybrid custom-VJP fetch (select-chain fwd, one-hot-matmul bwd).
Run: python benchmarks/rows_exp2.py"""
import os, sys, time, functools
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

@functools.partial(jax.custom_vjp)
def fetch_hybrid(table, idx):
    return fetch_sel(table, idx)
def _h_fwd(table, idx):
    return fetch_sel(table, idx), (idx, table.shape[0])
def _h_bwd(res, g):
    idx, K = res
    oh = (idx[:, None] == jnp.arange(K, dtype=idx.dtype)[None, :]).astype(g.dtype)
    return (jnp.dot(oh.T, g, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), None)
fetch_hybrid.defvjp(_h_fwd, _h_bwd)

def main():
    K, F = 16, 18
    table = jax.random.normal(jax.random.key(0), (K, F))
    idx = jax.random.randint(jax.random.key(1), (N,), 0, K)
    cases = [("matmul", fetch_mm), ("select", fetch_sel),
             ("hybrid", fetch_hybrid)]
    for nm, fn in cases:
        slope(f"K=16 {nm} fwd",
              lambda s, t, i, fn=fn: fn(t, (i + s) % K), (table, idx))
    for nm, fn in cases:
        def fb(s, t, i, fn=fn):
            def loss(t):
                return jnp.sum(fetch := fn(t, (i + s) % K) ** 2)
            return jax.grad(loss)(t)
        slope(f"K=16 {nm} fwd+bwd", fb, (table, idx))

if __name__ == "__main__":
    main()
