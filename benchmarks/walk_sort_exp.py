"""Round-5: backrooms walk tuning — the first-hit BVH walk on INCOHERENT
(post-bounce) rays dominates backrooms_pool (~600 ms/sample). Sweep the
ray-sort key design (bucket resolution, direction-vs-position major) and
the packet tile size on synthetic incoherent rays over the real scene.
Run: python benchmarks/walk_sort_exp.py"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from tracer.scene.device import compile_scene
from tracer.scenes import zoo
from tracer.kernels import traverse as ktraverse

N = 850 * 480


def slope(name, f, args, r1=1, r2=3, reps=3):
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
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def sorted_walk(scene, o, d, active, grid, dir_major, oct_w):
    """Parametrized copy of integrator._mesh_hits_sorted's key design."""
    sg = jax.lax.stop_gradient
    roots = jnp.asarray(scene.mesh_root, jnp.int32)
    lo = jnp.min(scene.bvh_lo[roots], axis=0)
    hi = jnp.max(scene.bvh_hi[roots], axis=0)
    inv_ext = (grid - 1e-3) / jnp.maximum(hi - lo, 1e-6)

    def bucket(c, lo_c, inv_c):
        return jnp.clip((sg(c) - lo_c) * inv_c, 0.0,
                        grid - 1e-3).astype(jnp.int32)

    octant = ((sg(d[0]) < 0).astype(jnp.int32)
              + 2 * (sg(d[1]) < 0).astype(jnp.int32)
              + 4 * (sg(d[2]) < 0).astype(jnp.int32))
    pos = (bucket(o[0], lo[0], inv_ext[0]) * grid * grid
           + bucket(o[1], lo[1], inv_ext[1]) * grid
           + bucket(o[2], lo[2], inv_ext[2]))
    if dir_major:
        key = octant * (grid ** 3) + pos
    else:
        key = pos * 8 + octant
    key = jnp.where(active, key, jnp.int32(1 << 28))
    order = jnp.argsort(key)
    inv_order = jnp.argsort(order)
    rays8 = jnp.stack([sg(o[0]), sg(o[1]), sg(o[2]),
                       sg(d[0]), sg(d[1]), sg(d[2]),
                       jnp.zeros_like(o[0]), jnp.zeros_like(o[0])],
                      axis=1)[order]
    o_s = (rays8[:, 0], rays8[:, 1], rays8[:, 2])
    d_s = (rays8[:, 3], rays8[:, 4], rays8[:, 5])
    n_live = jnp.sum(jnp.where(active, 1, 0))
    lv_s = jnp.arange(order.shape[0], dtype=jnp.int32) < n_live
    t_s, tri_s = ktraverse.mesh_closest_hits(scene, o_s, d_s, live=lv_s)
    both = jnp.concatenate([t_s, tri_s.astype(jnp.float32)], axis=1)
    pad = (-both.shape[1]) % 8
    if pad:
        both = jnp.pad(both, ((0, 0), (0, pad)))
    return both[inv_order]


def main():
    scene = compile_scene(zoo.setup_backrooms_pool())
    roots = jnp.asarray(scene.mesh_root, jnp.int32)
    lo = jnp.min(scene.bvh_lo[roots], axis=0)
    hi = jnp.max(scene.bvh_hi[roots], axis=0)
    k = jax.random.key(0)
    # incoherent rays: uniform origins in the scene box, uniform dirs
    o = tuple(jax.random.uniform(jax.random.fold_in(k, a), (N,),
                                 minval=float(lo[a]), maxval=float(hi[a]))
              for a in range(3))
    dv = jax.random.normal(jax.random.fold_in(k, 7), (3, N))
    dn = jnp.sqrt(dv[0]**2 + dv[1]**2 + dv[2]**2)
    d = (dv[0] / dn, dv[1] / dn, dv[2] / dn)
    active = jnp.ones(N, bool)

    def unsorted(s, scene, o, d, active):
        t, _ = ktraverse.mesh_closest_hits(
            scene, (o[0] + s * 0.0, o[1], o[2]), d, live=active)
        return t

    slope("unsorted walk (incoherent)", unsorted, (scene, o, d, active))
    for grid, dm in [(8, True), (16, True), (32, True), (16, False),
                     (32, False)]:
        slope(f"sorted grid={grid} {'dir' if dm else 'pos'}-major",
              lambda s, scene, o, d, active, grid=grid, dm=dm:
              sorted_walk(scene, (o[0] + s * 0.0, o[1], o[2]), d,
                          active, grid, dm, 8),
              (scene, o, d, active))


if __name__ == "__main__":
    main()
