"""Pallas BVH packet-traversal kernel — the TPU-native recast of the
reference's KD-tree query hot loop (`/root/reference/src/KDTree.cpp:31-69`,
via the flattened skip-link BVH of tracer/accel).

The jnp path walks one `lax.while_loop` PER RAY under vmap (lockstep over
the whole batch, per-ray dynamic-slice leaf gathers) — the worst shape for
XLA on TPU; at 850x480 it even OOMs compiling backrooms_pool. Here a TILE
of 1024 rays walks the tree together (packet traversal): the preorder
skip-link walk is scalar control flow, AABB slab tests and triangle tests
are vectorized over the tile, and leaf triangles are read as ONE contiguous
(1, 128) row from a leaf-ordered precomputed table (4 tris x 32 cols).

Parity with `primitives.bvh_closest_hit` is exact-by-construction:
- the packet visits a SUPERSET of each ray's nodes, but leaf updates are
  gated per lane on that lane's own slab test, and child AABBs are
  contained in their parent's, so a lane never tests a triangle its
  per-ray walk would not have tested, and extra nodes visited by the
  packet cannot produce better hits (slab prune uses the lane's best_t);
- per-triangle constants (normal, plane D, barycentric dots) are
  precomputed in XLA with the SAME mathutils expressions triangle_test
  uses, so the arithmetic is bit-identical;
- within a leaf, sequential strict-< keeps the first minimum — same as
  the jnp argmin-first tie-break.

Outputs (t, tri) are selection-only (the integrator re-derives the hit
differentiably from mesh_verts), so inputs are stop_gradient'ed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.core.mathutils import dot as mdot, normalize as mnormalize
from tracer.kernels import common as kc

TRI_COLS = 32     # padded per-triangle slot in the leaf table
# 32 x 128 = 4096 rays per packet: the preorder walk's per-node scalar
# overhead (SMEM loads, branch) amortizes over 4x more lanes than the
# original 1024-ray packets — measured 2.4x on backrooms_pool primaries
# (benchmarks: 59 -> 24 ms for the 3-mesh walk at 850x480).
TILE = 32


def traverse_tables(scene):
    """Scene-constant tables (computed in XLA; hoisted out of the scan).

    Returns (nodes_f [Bn,8], nodes_i [Bn,2], leaf [NL, leaf_width*32]).
    leaf row layout per triangle slot s (cols s*32+c):
      0:3 a, 3:6 n, 6 D, 7:10 v0, 10:13 v1, 13 d00, 14 d01, 15 d11,
      16 denom_safe, 17 tid (f32). Row width follows the scene's
      compile-time leaf_width (cfg.bvh_leaf_size)."""
    LEAF_W = scene.leaf_width
    a, b, c = scene.tri_a, scene.tri_b, scene.tri_c
    nn = jnp.cross(b - a, c - a)
    n = mnormalize(nn)
    D = mdot(a, n)
    v0 = b - a
    v1 = c - a
    d00 = mdot(v0, v0)
    d01 = mdot(v0, v1)
    d11 = mdot(v1, v1)
    denom = d00 * d11 - d01 * d01
    denom_s = jnp.where(denom == 0.0, 1e-30, denom)
    T1 = a.shape[0]
    tidf = jnp.arange(T1, dtype=jnp.float32)
    pre = jnp.concatenate([
        a, n, D[:, None], v0, v1, d00[:, None], d01[:, None], d11[:, None],
        denom_s[:, None], tidf[:, None]], axis=1)               # [T+1, 18]
    pre = jnp.pad(pre, ((0, 0), (0, TRI_COLS - pre.shape[1])))
    leaf = pre[scene.bvh_leaf_tris]                             # [NL*LW, 32]
    nl = leaf.shape[0] // LEAF_W
    leaf = leaf.reshape(nl, LEAF_W * TRI_COLS)

    nodes_f = jnp.concatenate([
        scene.bvh_lo, scene.bvh_hi,
        jnp.zeros((scene.bvh_lo.shape[0], 2), jnp.float32)], axis=1)
    ls = scene.bvh_leaf_start
    leaf_row = jnp.where(ls >= 0, ls // LEAF_W, -1)
    nodes_i = jnp.stack([leaf_row, scene.bvh_skip], axis=1)     # [Bn, 2]
    return nodes_f, nodes_i, leaf


def packet_walk(nodes_f_ref, nodes_i_ref, leaf_ref, root, end,
                ox, oy, oz, dx, dy, dz, tmax=None, leaf_width=4,
                live=None):
    """Stackless skip-link packet walk over one mesh's node range: the
    whole ray tile advances through the preorder together; leaf updates are
    gated per lane on that lane's own slab test. Returns (closest t, tri id)
    per lane (INF / -1 on miss) — identical to primitives.bvh_closest_hit
    (see module docstring for the parity argument).

    `tmax` (optional per-lane bound, e.g. a shadow ray's light distance)
    tightens the slab prune: hits beyond it can only exist in nodes whose
    entry t exceeds tmax, and callers only consume t < tmax.

    `live` (optional per-lane bool): DEAD lanes carry stale rays whose
    slab tests still pass and force node visits for the whole packet;
    masking them out lets a mostly-dead packet walk only the live lanes'
    union (the dominant win on emissive scenes whose occupancy collapses
    to a few % — their hits are masked away by the caller anyway)."""
    # slab_hit computes inv = 1/d per node — identical value, hoisted
    invx, invy, invz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    def cond(carry):
        return carry[0] < end

    def body(carry):
        i, bt, btri = carry
        nf = nodes_f_ref[pl.ds(i, 1), :]                 # (1, 8)
        t0x = (nf[0, 0] - ox) * invx
        t1x = (nf[0, 3] - ox) * invx
        t0y = (nf[0, 1] - oy) * invy
        t1y = (nf[0, 4] - oy) * invy
        t0z = (nf[0, 2] - oz) * invz
        t1z = (nf[0, 5] - oz) * invz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        near = bt if tmax is None else jnp.minimum(bt, tmax)
        lane_hit = jnp.minimum(near, tf) > jnp.maximum(0.0, tn)
        if live is not None:
            lane_hit &= live
        any_hit = jnp.any(lane_hit)
        ni = nodes_i_ref[pl.ds(i, 1), :]                 # (1, 2)
        leaf_row = ni[0, 0]
        skip = ni[0, 1]
        is_leaf = leaf_row >= 0

        def do_leaf(args):
            bt, btri = args
            row = leaf_ref[pl.ds(leaf_row, 1), :]        # (1, leaf_width*32)
            for s in range(leaf_width):
                o = s * TRI_COLS
                nx, ny, nz = row[0, o + 3], row[0, o + 4], row[0, o + 5]
                D = row[0, o + 6]
                dotRN = dx * nx + dy * ny + dz * nz
                o_n = ox * nx + oy * ny + oz * nz
                t = (D - o_n) / jnp.where(dotRN == 0.0, 1e-30, dotRN)
                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz
                ax, ay, az = row[0, o + 0], row[0, o + 1], row[0, o + 2]
                v2x, v2y, v2z = px - ax, py - ay, pz - az
                v0x, v0y, v0z = (row[0, o + 7], row[0, o + 8],
                                 row[0, o + 9])
                v1x, v1y, v1z = (row[0, o + 10], row[0, o + 11],
                                 row[0, o + 12])
                d20 = v2x * v0x + v2y * v0y + v2z * v0z
                d21 = v2x * v1x + v2y * v1y + v2z * v1z
                d00, d01, d11 = (row[0, o + 13], row[0, o + 14],
                                 row[0, o + 15])
                den = row[0, o + 16]
                w1 = (d11 * d20 - d01 * d21) / den
                w2 = (d00 * d21 - d01 * d20) / den
                w0 = 1.0 - w1 - w2
                ok = (dotRN < 0.0) & (t >= 0.0)
                for w in (w0, w1, w2):
                    ok &= (w >= 0.0) & (w <= 1.0)
                upd = lane_hit & ok & (t < bt)
                bt = jnp.where(upd, t, bt)
                btri = jnp.where(
                    upd, row[0, o + 17].astype(jnp.int32), btri)
            return bt, btri

        bt, btri = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                lambda x: x, (bt, btri))
        nxt = jnp.where(any_hit, jnp.where(is_leaf, skip, i + 1), skip)
        return nxt, bt, btri

    init = (jnp.int32(root),
            jnp.full(ox.shape, kc.INF, jnp.float32),
            jnp.full(ox.shape, -1, jnp.int32))
    _, bt, btri = jax.lax.while_loop(cond, body, init)
    return bt, btri


def _kernel(nodes_f_ref, nodes_i_ref, leaf_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, lv_ref,
            t_ref, tri_ref, *, mesh_ranges, leaf_width):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # dead-tile skip: a fully-dead ray packet writes the defaults and
    # never walks the trees (emissive scenes collapse to a few % live
    # lanes by bounce 2-3 and the BVH walk dominates their bounce cost)
    for m in range(len(mesh_ranges)):
        t_ref[m] = jnp.full(ox.shape, kc.INF, jnp.float32)
        tri_ref[m] = jnp.full(ox.shape, -1, jnp.int32)

    @pl.when(jnp.sum(lv_ref[:]) > 0.0)
    def _():
        live = lv_ref[:] > 0.5
        for m, (root, end) in enumerate(mesh_ranges):
            bt, btri = packet_walk(nodes_f_ref, nodes_i_ref, leaf_ref,
                                   root, end, ox, oy, oz, dx, dy, dz,
                                   leaf_width=leaf_width, live=live)
            t_ref[m] = bt
            tri_ref[m] = btri


def mesh_closest_hits(scene, o, d, live=None):
    """Closest mesh hits for planar rays o, d: returns (t [N, Nm],
    tri [N, Nm] i32) — drop-in for primitives.mesh_closest_hits (which
    takes/returns [N,...] arrays). Selection-only: non-differentiable.
    `live` [N] bool: fully-dead packets skip the walk entirely (their
    outputs are masked away by the integrator)."""
    N = o[0].shape[0]
    Nm = len(scene.mesh_root)
    nodes_f, nodes_i, leaf = traverse_tables(scene)
    sg = jax.lax.stop_gradient

    n_pad = kc.pad_rows(N, TILE)
    rows = n_pad // kc.LANES
    tiles = [kc.to_tiles(sg(x), n_pad, fill=1.0)
             for x in (d[0], d[1], d[2])]
    otiles = [kc.to_tiles(sg(x), n_pad) for x in (o[0], o[1], o[2])]
    if live is None:
        lv = jnp.ones((rows, kc.LANES), jnp.float32)
    else:
        lv = kc.to_tiles(sg(jnp.where(live, 1.0, 0.0)), n_pad)

    kern = functools.partial(
        _kernel,
        mesh_ranges=tuple(zip(scene.mesh_root, scene.mesh_end)),
        leaf_width=scene.leaf_width)
    ray_spec = pl.BlockSpec((TILE, kc.LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((Nm, TILE, kc.LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    t, tri = pl.pallas_call(
        kern,
        grid=(rows // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [ray_spec] * 7,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((Nm, rows, kc.LANES), jnp.float32),
                   jax.ShapeDtypeStruct((Nm, rows, kc.LANES), jnp.int32)),
        interpret=kc.interpret(),
    )(sg(nodes_f), sg(nodes_i), sg(leaf), *otiles, *tiles, lv)
    t_n = jnp.stack([kc.from_tiles(t[m], N) for m in range(Nm)], axis=1)
    tri_n = jnp.stack([kc.from_tiles(tri[m], N) for m in range(Nm)], axis=1)
    return t_n, tri_n
