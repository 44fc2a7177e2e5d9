"""Gather landscape round 4b: (a) where is the table-size cliff, (b) is it
rows or bytes, (c) bf16 pre-decoded pair rows (one row per texel-pair:
6 x bf16 byte values) + planar decode vs packed-u32 + one-hot decode,
(d) minor-dim transpose cost. Run: python benchmarks/gather_exp12.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

N = 408000


def slope(name, body, args, r1=8, r2=64, reps=4):
    def timed(r):
        @jax.jit
        def jf(*a):
            def step(c, s):
                out = body(s, *a)
                leaves = jax.tree.leaves(out)
                return c + sum(jnp.sum(x.astype(jnp.float32))
                               for x in leaves) * 1e-20, None
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
    print(f"{name:52s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.key(0)

    def g(s, tab, idx, rows):
        return tab[(idx + s) % rows]

    # (a)/(b) cliff shape: rows x width at fixed and varying bytes
    for rows, w, dt in [(122750, 32, jnp.int32), (200000, 32, jnp.int32),
                        (245000, 32, jnp.int32), (300000, 32, jnp.int32),
                        (400000, 32, jnp.int32), (500000, 16, jnp.int32),
                        (1000000, 8, jnp.int32), (2000000, 8, jnp.int32),
                        (2000000, 8, jnp.bfloat16),
                        (1000000, 8, jnp.bfloat16)]:
        if dt == jnp.int32:
            tab = jax.random.randint(key, (rows, w), 0, 1 << 20, jnp.int32)
        else:
            tab = jax.random.normal(key, (rows, w), jnp.float32).astype(dt)
        idx = jax.random.randint(key, (N,), 0, rows, jnp.int32)
        mb = rows * w * (4 if dt == jnp.int32 else 2) / 1e6
        slope(f"gather 408K, table {rows}x{w} {dt.__name__} ({mb:.0f}MB)",
              g, (tab, idx, rows))

    # (c) end-to-end texel fetch alternatives
    R32 = 122750
    tab32 = jax.random.randint(key, (R32, 32), 0, 1 << 24, jnp.int32)
    idx = jax.random.randint(key, (N,), 0, R32, jnp.int32)
    sub = jax.random.randint(key, (N,), 0, 16, jnp.int32)

    def fetch_oh(s, tab, idx, sub):
        rows = tab[(idx + s) % R32]
        oh = (sub[:, None] == jnp.arange(16, dtype=jnp.int32)[None]
              ).astype(jnp.int32)
        vt = jnp.sum(rows[:, :16] * oh, axis=1)
        vn = jnp.sum(rows[:, 16:] * oh, axis=1)
        k = jnp.float32(1.0 / 255.0)
        out = []
        for v in (vt, vn):
            out += [(jax.lax.shift_right_logical(v, 16) & 0xFF
                     ).astype(jnp.float32) * k,
                    (jax.lax.shift_right_logical(v, 8) & 0xFF
                     ).astype(jnp.float32) * k,
                    (v & 0xFF).astype(jnp.float32) * k]
        return tuple(out)
    slope("packed-u32 row + one-hot decode (current)", fetch_oh,
          (tab32, idx, sub))

    # bf16 pre-decoded pair rows: 1.96M texel-pairs x 8 bf16
    RP = 1963999
    tabp = (jax.random.randint(key, (RP, 8), 0, 256, jnp.int32)
            .astype(jnp.bfloat16))
    idxp = jax.random.randint(key, (N,), 0, RP, jnp.int32)

    def fetch_bf16(s, tab, idx):
        rows = tab[(idx + s) % RP].astype(jnp.float32)  # [N, 8]
        k = jnp.float32(1.0 / 255.0)
        return tuple(rows[:, c] * k for c in range(6))
    slope("bf16 pair row (1.96M x 8) + planar decode", fetch_bf16,
          (tabp, idxp))

    # same but via transpose to planar first
    def fetch_bf16_t(s, tab, idx):
        rows = tab[(idx + s) % RP]                       # [N, 8] bf16
        pl = rows.T.astype(jnp.float32)                  # [8, N]
        k = jnp.float32(1.0 / 255.0)
        return tuple(pl[c] * k for c in range(6))
    slope("bf16 pair row + transpose-to-planar decode", fetch_bf16_t,
          (tabp, idxp))

    # (d) transpose cost alone
    big = jax.random.randint(key, (N, 32), 0, 1 << 20, jnp.int32)
    slope("transpose [N,32] i32 -> [32,N]",
          lambda s, t: (t + s).T, (big,))
    small = jax.random.randint(key, (N, 8), 0, 1 << 20, jnp.int32)
    slope("transpose [N,8] i32 -> [8,N]",
          lambda s, t: (t + s).T, (small,))


if __name__ == "__main__":
    main()
