"""Pallas twin of the hand-written replay-backward bounce
(render/replay_bwd.bounce_bwd): the whole one-bounce adjoint — forward
recompute + cotangent chains — in ONE VMEM pass over the ray tile.

The math IS replay_bwd.bounce_bwd (planar jnp, shared source of truth —
the function is called here on (TILE_ROWS x 128) tile views instead of
[N] arrays); this module only handles the tiling, the stacked I/O layout
and the dead-tile fast path. The XLA fallback in replay_bwd runs the same
function, so the kernel is verified by the same leaf-by-leaf equivalence
test (tests/test_replay_bwd.py) in interpret mode.

Per-bounce inputs arrive as stacked planar blocks (each separate scan
output/input measured ~0.1 ms of per-array overhead at 400K lanes):
  st10  [10, N]: o(3), d(3), throughput(3), active
  recf  [8, N]:  img(3), raw nm(3), present masks(2)
  rows:  mrf [18, N], sr [8, N], qr [19, N] (XLA one-hot row fetches)
  gcar  [12, N]: go2(3), gd2(3), gtp2(3), gpix(3)
Outputs:
  out_a [11, N]: go(3), gd(3), gtp(3), gtm, gdark
  out_b [6, N]:  gimg(3), grnm(3)
  out_c [45, N]: gmrf(18), gsrow(8), gqrow(19)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.kernels import common as kc


def _kernel(misc_ref, st_ref, j_ref, recf_ref, mr_ref, sr_ref, qr_ref,
            bk_ref, tm_ref, gc_ref, a_ref, b_ref, c_ref, *, S, Q, ref,
            eps, has_pair, last):
    from tracer.render import replay_bwd as rb

    av = st_ref[9]
    go2 = (gc_ref[0], gc_ref[1], gc_ref[2])
    gd2 = (gc_ref[3], gc_ref[4], gc_ref[5])
    gtp2 = (gc_ref[6], gc_ref[7], gc_ref[8])
    gpix = (gc_ref[9], gc_ref[10], gc_ref[11])

    # dead tile: pure cotangent pass-through (o'=o, d'=d, tp'=tp on every
    # lane; no hit, no sky, no params)
    for i in range(3):
        a_ref[i] = go2[i]
        a_ref[3 + i] = gd2[i]
        a_ref[6 + i] = gtp2[i]
    a_ref[9] = jnp.zeros_like(av)
    a_ref[10] = jnp.zeros_like(av)
    b_ref[:] = jnp.zeros_like(b_ref)
    c_ref[:] = jnp.zeros_like(c_ref)

    @pl.when(jnp.sum(av) > 0.0)
    def _():
        n_rem = misc_ref[0, 0]
        dark = misc_ref[0, 1]
        o = (st_ref[0], st_ref[1], st_ref[2])
        d = (st_ref[3], st_ref[4], st_ref[5])
        tp = (st_ref[6], st_ref[7], st_ref[8])
        active = av > 0.5
        img = (recf_ref[0], recf_ref[1], recf_ref[2])
        rnm = (recf_ref[3], recf_ref[4], recf_ref[5])
        ptex, pnm = recf_ref[6], recf_ref[7]
        mrf = [mr_ref[c] for c in range(18)]
        srow = [sr_ref[c] for c in range(8)]
        qrow = [qr_ref[c] for c in range(19)]
        textype = mr_ref[18].astype(jnp.int32)
        mtype = mr_ref[19].astype(jnp.int32)
        use_nm = mr_ref[20].astype(jnp.int32)
        (go, gd, gtp, gtm, gimg, grnm, gmrf, gsr, gqr,
         gdark) = rb.bounce_bwd(
            o, d, tp, active, tm_ref[:], bk_ref[:], j_ref[:], img, rnm,
            ptex, pnm, mrf, textype, mtype, use_nm, srow, qrow,
            go2, gd2, gtp2, gpix, S=S, Q=Q, ref=ref, eps=eps,
            n_rem=n_rem, dark=dark, has_pair=has_pair, last=last)
        for i in range(3):
            a_ref[i] = go[i]
            a_ref[3 + i] = gd[i]
            a_ref[6 + i] = gtp[i]
            b_ref[i] = gimg[i]
            b_ref[3 + i] = grnm[i]
        a_ref[9] = gtm
        a_ref[10] = gdark
        for c in range(18):
            c_ref[c] = gmrf[c]
        for c in range(8):
            c_ref[18 + c] = gsr[c]
        for c in range(19):
            c_ref[26 + c] = gqr[c]


def bounce_bwd_tiles(st10, j_enc, recf, mr21, srow, qrow, bk, tm,
                     gcar, n_rem, dark, *, S, Q, ref,
                     eps, has_pair, last, interpret=None):
    """Run the bounce adjoint kernel over [*, N] stacked planar inputs.

    mr21 [21, N]: the 18 matf columns + (textype, mtype, use_nm) as f32;
    srow [8, N], qrow [19, N]; gcar [12, N]: go2, gd2, gtp2, gpix — all
    already planar-major (the driver's _rows_t fetches produce them with
    no relayout). Returns the STACKED blocks (a [11, N], b [6, N],
    c [45, N]) — see the module docstring for row layouts."""
    N = j_enc.shape[0]
    # 143 (tr,128) blocks live per grid step (81 in / 62 out, double
    # buffered): tr=128 needs 17.5 MB of VMEM and OOMs the 16 MB budget
    tr = 64
    n_pad = kc.pad_rows(N, tr)
    rows = n_pad // kc.LANES
    sg = jax.lax.stop_gradient

    def stk2(a):
        """[K, N] -> (K, rows, 128) block (pure pad + reshape)."""
        a = sg(a)
        if n_pad != N:
            a = jnp.pad(a, ((0, 0), (0, n_pad - N)))
        return a.reshape(a.shape[0], rows, kc.LANES)

    def spec(K):
        return pl.BlockSpec((K, tr, kc.LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    # pad d with 1.0: a zero direction makes a2 = d.d = 0 and the
    # sphere-adjoint divisions spray inf/NaN over PADDED lanes —
    # trimmed on exit, but JAX_DEBUG_NANS (CI tier A2) traps them
    st_p = stk2(st10)
    if n_pad != N:
        st_p = st_p.reshape(10, n_pad).at[3:6, N:].set(1.0).reshape(
            10, rows, kc.LANES)
    ins = [
        st_p,
        kc.to_tiles(sg(j_enc), n_pad, fill=-1),
        stk2(recf),
        stk2(mr21),
        stk2(srow),
        stk2(qrow),
        kc.to_tiles(bk, n_pad),
        kc.to_tiles(sg(tm), n_pad),
        stk2(gcar),
    ]
    specs = [spec(10), pl.BlockSpec((tr, kc.LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
             spec(8), spec(21), spec(8), spec(19),
             pl.BlockSpec((tr, kc.LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((tr, kc.LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM),
             spec(12)]

    misc = jnp.stack([jnp.asarray(n_rem, jnp.float32),
                      jnp.asarray(dark, jnp.float32)]).reshape(1, 2)
    kern = functools.partial(_kernel, S=S, Q=Q, ref=ref, eps=float(eps),
                             has_pair=has_pair, last=last)
    a, b, c = pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
        out_specs=(spec(11), spec(6), spec(45)),
        out_shape=(jax.ShapeDtypeStruct((11, rows, kc.LANES), jnp.float32),
                   jax.ShapeDtypeStruct((6, rows, kc.LANES), jnp.float32),
                   jax.ShapeDtypeStruct((45, rows, kc.LANES), jnp.float32)),
        interpret=kc.interpret() if interpret is None else interpret,
    )(misc, *ins)

    # un-tile each stack with ONE reshape+slice (not 62 separate
    # from_tiles ops — per-array glue measured ~7 ms/sample of the
    # backward before this)
    a = a.reshape(11, n_pad)[:, :N]
    b = b.reshape(6, n_pad)[:, :N]
    c = c.reshape(45, n_pad)[:, :N]
    return a, b, c
