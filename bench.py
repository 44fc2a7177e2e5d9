"""Benchmark: Cornell-box throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": "primary_rays_per_s_fwd_cornell", "value": N, "unit": "rays/s",
   "vs_baseline": N/50e6, ...extras}

Baseline: the BASELINE.md north star of >= 50M rays/s/chip forward on the
Cornell scene (the reference publishes no numbers — main.cpp:248-249 only
prints a per-run wall estimate). "Primary rays" = width*height*spp camera
rays; each one costs up to `max_bounces` scene traversals plus
`lights*shadow_rays*max_bounces` shadow traversals, reported separately as
`total_rays_per_s`.

Timing discipline (this environment): `jax.block_until_ready` is a NO-OP
under the axon TPU tunnel — it returns before the computation runs. The
only honest sync is fetching a value to the host, so every timed function
reduces to a scalar and we `float()` it. Sample loops use `lax.map`, not a
Python unroll (a 16x-unrolled frame took ~6 min to compile here).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import numpy as np
import jax.numpy as jnp


def timeit(jfn, args, reps):
    """Sustained throughput: queue all reps, sync once at the end.

    Device execution is in-order, so fetching the LAST result waits for
    every queued frame; syncing per rep would charge this environment's
    ~26 ms tunnel dispatch latency to every frame, which a real pipelined
    workload never pays."""
    v = float(jfn(*args))  # compile + first run
    t0 = time.perf_counter()
    rs = [jfn(*args) for _ in range(reps)]
    v = float(rs[-1])
    return (time.perf_counter() - t0) / reps, v


def main():
    from tracer.core.config import RenderConfig
    from tracer.core import rng
    from tracer.render.renderer import render_batch, render_pixels
    from tracer.render.camera import default_camera
    from tracer.scene.device import compile_scene
    from tracer.scenes import zoo

    width = int(os.environ.get("BENCH_WIDTH", 850))
    height = int(os.environ.get("BENCH_HEIGHT", 480))
    spp = int(os.environ.get("BENCH_SPP", 16))
    reps = int(os.environ.get("BENCH_REPS", 3))

    cfg = RenderConfig(width=width, height=height, nsamples=spp)
    scene = compile_scene(zoo.setup_cornell_box(width / height))
    camera = default_camera(aspect=width / height)

    n_pix = width * height
    # tile-multiple ray count: kernel-boundary pads become free reshapes
    from tracer.kernels import common as kc
    n_pad = kc.pad_rows(n_pix)
    pixel_ids = jnp.arange(n_pad, dtype=jnp.int32) % n_pix
    base_key = jax.random.key(0)

    # NB: pixel_ids/base_key are jit ARGUMENTS, never closure captures — a
    # captured device array flips this environment's TPU runtime into
    # synchronous dispatch for the rest of the process.
    # `render_pixels` IS the product path the CLI render uses (one compiled
    # frame chunk, lax.map over samples) — the bench measures that path.
    def frame(scene, camera, pixel_ids, base_key):
        acc = render_pixels(scene, camera, cfg, width, height, pixel_ids,
                            spp, base_key)
        # reduce to a scalar so the timed fetch is 4 bytes, not the frame
        return jnp.mean(acc / spp)

    dt, _ = timeit(jax.jit(frame), (scene, camera, pixel_ids, base_key), reps)

    primary = n_pix * spp
    n_lights = int(np.asarray(scene.light_pos).shape[0])  # cornell: 0
    per_primary = cfg.max_bounces * (1 + n_lights * cfg.shadow_rays)
    total = primary * per_primary
    rays_s = primary / dt

    # backward — the BASELINE.md protocol: fwd+bwd on Cornell @16spp with
    # the full flagship trainable set (mat_diffuse, sph_center, tex_data —
    # Cornell has no mesh). The packed-atlas forward stays valid here:
    # the bench atlases are pristine, so the recorded texel values are
    # bit-identical to data[idx] and the texel cotangents reach tex_data
    # through the custom-VJP top-level fold.
    def loss(diff, center, tex, scene, camera, pixel_ids, base_key):
        s2 = dataclasses.replace(scene, mat_diffuse=diff, sph_center=center,
                                 tex_data=tex)
        acc = render_pixels(s2, camera, cfg, width, height, pixel_ids,
                            spp, base_key)
        return jnp.mean(acc / spp)

    def gsum(*args):
        g = jax.grad(loss, argnums=(0, 1, 2))(*args)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    gargs = (scene.mat_diffuse, scene.sph_center, scene.tex_data, scene,
             camera, pixel_ids, base_key)
    dt_bwd, _ = timeit(jax.jit(gsum), gargs, reps)
    rays_s_fwdbwd = n_pix * spp / dt_bwd

    # companion metric without texel grads: the texel-cotangent fold is a
    # hardware-floor scatter (~7 ns/scalar on v5e — benchmarks/
    # gather_exp12.py probes), ~41 ms/sample of the full-protocol cost.
    def loss_nt(diff, center, scene, camera, pixel_ids, base_key):
        s2 = dataclasses.replace(scene, mat_diffuse=diff,
                                 sph_center=center)
        acc = render_pixels(s2, camera, cfg, width, height, pixel_ids,
                            spp, base_key)
        return jnp.mean(acc / spp)

    def gsum_nt(*args):
        g = jax.grad(loss_nt, argnums=(0, 1))(*args)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    dt_nt, _ = timeit(jax.jit(gsum_nt), gargs[:2] + gargs[3:], reps)
    rays_s_fwdbwd_nt = n_pix * spp / dt_nt

    out = {
        "metric": "primary_rays_per_s_fwd_cornell",
        "value": round(rays_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_s / 50e6, 4),
        "total_rays_per_s": round(rays_s * per_primary),
        "fwdbwd_primary_rays_per_s": round(rays_s_fwdbwd),
        "fwdbwd_no_texgrad_rays_per_s": round(rays_s_fwdbwd_nt),
        "config": f"{width}x{height}@{spp}spp b{cfg.max_bounces}",
        "device": str(jax.devices()[0]),
    }

    # BENCH_SCENES=1: per-scene forward rays/s so the mesh-scene cliff is
    # tracked round-over-round like Cornell (committed as
    # BENCH_SCENES.json; off by default — each scene pays a full compile)
    if os.environ.get("BENCH_SCENES"):
        from tracer.scenes import zoo as _zoo
        per_scene = {}
        for name in ("flamingo", "raccoon", "backrooms_pool",
                     "rt_in_a_weekend", "random_spheres"):
            sc = compile_scene(_zoo.BY_NAME[name]())
            cfg1 = dataclasses.replace(cfg, nsamples=1)

            def frame1(scene, camera, pixel_ids, base_key, cfg1=cfg1):
                acc = render_pixels(scene, camera, cfg1, width, height,
                                    pixel_ids, 1, base_key)
                return jnp.mean(acc)

            dt1, _ = timeit(jax.jit(frame1),
                            (sc, camera, pixel_ids, base_key), reps)
            per_scene[name] = round(n_pix / dt1)
        out["per_scene_fwd_rays_per_s"] = per_scene

    print(json.dumps(out))


if __name__ == "__main__":
    main()
