"""Layout experiment: [N,3] vectors vs planar x/y/z [N] components.

Hypothesis: [N,3] puts 3 in the TPU lane dim (128 lanes) -> ~2% lane
utilization on every elementwise op; planar [N] per component uses all
lanes. Timed with a scalar fetch (block_until_ready is a no-op under the
axon tunnel)."""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

def timeit(name, jfn, *args, reps=5):
    v = float(jfn(*args))  # compile+run
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(jfn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms   (val {v:.4g})")
    return dt

N = 1 << 19
S = 8
Q = 32
B = 6  # bounce-like repeat to amortize
key = jax.random.key(0)
ks = jax.random.split(key, 10)
o = jax.random.normal(ks[0], (N, 3))
d = jax.random.normal(ks[1], (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
tmv = jax.random.uniform(ks[2], (N,))
center = jax.random.normal(ks[3], (S, 3))
radius = jax.random.uniform(ks[4], (S,)) + 0.5
mb = jax.random.normal(ks[5], (S, 3)) * 0.1
valid = jnp.ones(S)
v0 = jax.random.normal(ks[6], (Q, 3))
er = jax.random.normal(ks[7], (Q, 3))
eu = jax.random.normal(ks[8], (Q, 3))
qn = jnp.cross(er, eu); qn = qn / jnp.linalg.norm(qn, axis=-1, keepdims=True)
qmb = jax.random.normal(ks[9], (Q, 3)) * 0.1
qglass = jnp.zeros(Q)
qvalid = jnp.ones(Q)

from tracer.geometry import primitives as prim

def cur(o, d, tmv, center, radius, mb, valid, v0, er, eu, qn, qmb, qglass, qvalid):
    acc = 0.0
    oo, dd = o, d
    for b in range(B):
        ts = prim.sphere_ts(oo, dd, tmv, center, radius, mb, valid, 1e-5)
        tq = prim.quad_ts(oo, dd, tmv, v0, er, eu, qn, qmb, qglass, qvalid, 1e-5)
        t_all = jnp.concatenate([ts, tq], axis=1)
        j = jnp.argmin(t_all, axis=1)
        tmin = jnp.take_along_axis(t_all, j[:, None], axis=1)[:, 0]
        acc = acc + jnp.sum(jnp.where(tmin < 1e30, tmin, 0.0))
        oo = oo + 1e-3 * dd
    return acc

# ---- planar: components [N]; tables as python lists of scalars-per-axis
INF = 3.0e38
def planar(ox, oy, oz, dx, dy, dz, tmv, center, radius, mb, v0, er, eu, qn, qmb):
    # center etc are np on host -> closed over as constants per object index
    acc = 0.0
    for b in range(B):
        d_o = dx*ox + dy*oy + dz*oz
        best = jnp.full(ox.shape, INF)
        bestj = jnp.zeros(ox.shape, jnp.int32)
        jidx = 0
        for s in range(S):
            cx, cy, cz = center[s]; mx, my, mz = mb[s]; r = radius[s]
            tcx = cx + tmv*mx; tcy = cy + tmv*my; tcz = cz + tmv*mz
            ocx = ox - tcx; ocy = oy - tcy; ocz = oz - tcz
            bq = 2.0*(dx*ocx + dy*ocy + dz*ocz)
            cc = ocx*ocx + ocy*ocy + ocz*ocz - r*r
            delta = bq*bq - 4.0*cc
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            t = (-bq - sq) * 0.5
            ok = (delta >= 0.0) & (t >= 1e-5)
            t = jnp.where(ok, t, INF)
            better = t < best
            best = jnp.where(better, t, best); bestj = jnp.where(better, jidx, bestj)
            jidx += 1
        for q in range(Q):
            vx, vy, vz = v0[q]; nx, ny, nz = qn[q]
            ex, ey, ez = er[q]; ux, uy, uz = eu[q]
            mxq, myq, mzq = qmb[q]
            dotRN = dx*nx + dy*ny + dz*nz
            D = (vx + tmv*mxq)*nx + (vy + tmv*myq)*ny + (vz + tmv*mzq)*nz
            t = (D - (ox*nx + oy*ny + oz*nz)) / jnp.where(dotRN == 0, 1e-30, dotRN)
            px = ox + t*dx - (vx + tmv*mxq); py = oy + t*dy - (vy + tmv*myq); pz = oz + t*dz - (vz + tmv*mzq)
            s1 = px*ex + py*ey + pz*ez
            s2 = px*ux + py*uy + pz*uz
            er2 = ex*ex + ey*ey + ez*ez; eu2 = ux*ux + uy*uy + uz*uz
            ok = (dotRN < 0.0) & (t >= 1e-5) & (s1 >= 0) & (s1 <= er2) & (s2 >= 0) & (s2 <= eu2)
            t = jnp.where(ok, t, INF)
            better = t < best
            best = jnp.where(better, t, best); bestj = jnp.where(better, jidx, bestj)
            jidx += 1
        acc = acc + jnp.sum(jnp.where(best < 1e30, best, 0.0))
        ox = ox + 1e-3*dx; oy = oy + 1e-3*dy; oz = oz + 1e-3*dz
    return acc

ox, oy, oz = [o[:, i] for i in range(3)]
dx, dy, dz = [d[:, i] for i in range(3)]
center_h, radius_h, mb_h = np.asarray(center), np.asarray(radius), np.asarray(mb)
v0_h, er_h, eu_h, qn_h, qmb_h = map(np.asarray, (v0, er, eu, qn, qmb))

jcur = jax.jit(cur)
jpl = jax.jit(lambda ox,oy,oz,dx,dy,dz,tmv: planar(ox,oy,oz,dx,dy,dz,tmv,
    center_h, radius_h, mb_h, v0_h, er_h, eu_h, qn_h, qmb_h))

t1 = timeit("current [N,3] tables", jcur, o, d, tmv, center, radius, mb, valid,
            v0, er, eu, qn, qmb, qglass, qvalid)
t2 = timeit("planar [N] unrolled objects", jpl, ox, oy, oz, dx, dy, dz, tmv)
print(f"speedup: {t1/t2:.2f}x ; rays/s cur {N*B/t1/1e6:.1f}M planar {N*B/t2/1e6:.1f}M")
