"""Command-line interface — the TPU-native replacement for the reference's
GLUT keyboard UI (`/root/reference/main.cpp:266-342`): `render` replaces the
`r` key, `benchmark` the FPS counter, `grad-check` the MONORAY debug probe,
`probe` is MONORAY itself (single-ray trace of one pixel, Constants.h:6 +
main.cpp:216-227).

    python -m tracer.cli render --scene cornell_box --out rendu.ppm
    python -m tracer.cli render --scene flamingo --spp 4 --width 320
    python -m tracer.cli probe --scene cornell_box --x 220 --y 270
    python -m tracer.cli benchmark
    python -m tracer.cli grad-check
    python -m tracer.cli scenes
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build(name: str, width: int, height: int, seed: int):
    from tracer.scene.device import compile_scene
    from tracer.scenes import zoo

    if name not in zoo.BY_NAME:
        raise SystemExit(f"unknown scene {name!r}; try: "
                         + ", ".join(sorted(zoo.BY_NAME)))
    fn = zoo.BY_NAME[name]
    if name == "cornell_box":
        sb = fn(width / height)
    elif name == "random_spheres":
        sb = fn(seed)
    else:
        sb = fn()
    return compile_scene(sb)


def cmd_render(args):
    from tracer.core.config import RenderConfig
    from tracer.render.camera import default_camera
    from tracer.render.renderer import render_image

    cfg = RenderConfig(nsamples=args.spp, width=args.width,
                       height=args.height, max_bounces=args.bounces,
                       shadow_rays=args.shadow_rays, compat=args.compat,
                       seed=args.seed)
    scene = _build(args.scene, args.width, args.height, args.seed)
    cam = default_camera(aspect=args.width / args.height)
    t0 = time.perf_counter()
    render_image(scene, cam, cfg, args.out, progress=args.progress,
                 ckpt_dir=args.ckpt_dir, tile=args.tile)
    dt = time.perf_counter() - t0
    n_rays = args.width * args.height * args.spp
    print(f"rendered {args.scene} {args.width}x{args.height}@{args.spp}spp "
          f"-> {args.out} in {dt:.2f}s ({n_rays / dt / 1e6:.2f} Mrays/s "
          f"incl. compile)")


def cmd_probe(args):
    """MONORAY: trace a single pixel's ray and print the radiance."""
    import jax
    import jax.numpy as jnp
    from tracer.core import rng as trng
    from tracer.core.config import RenderConfig
    from tracer.render import integrator
    from tracer.render.camera import default_camera, generate_rays

    cfg = RenderConfig(max_bounces=args.bounces, compat=args.compat,
                       seed=args.seed)
    scene = _build(args.scene, args.width, args.height, args.seed)
    cam = default_camera(aspect=args.width / args.height)
    u = jnp.asarray([args.x / args.width], jnp.float32)
    v = jnp.asarray([args.y / args.height], jnp.float32)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(cfg.seed),
                         jnp.asarray([args.y * args.width + args.x]))
    rad = integrator.trace(scene, cfg, o, d, jnp.zeros(1), keys)
    import numpy as np
    print(json.dumps({
        "pixel": [args.x, args.y],
        "origin": np.asarray(o)[0].tolist(),
        "direction": np.asarray(d)[0].tolist(),
        "radiance": np.asarray(rad)[0].tolist(),
    }))


def cmd_benchmark(args):
    import bench
    bench.main()


def cmd_grad_check(args):
    import dataclasses
    import jax.numpy as jnp
    from tracer.core import rng as trng
    from tracer.core.config import RenderConfig
    from tracer.diff.fd import compare_ad_fd
    from tracer.render import integrator
    from tracer.render.camera import default_camera, generate_rays
    from tracer.scene.builder import SceneBuilder, Material
    from tracer.scene.device import compile_scene
    import jax

    sb = SceneBuilder()
    sb.add_light((-2., 4., 3.), radius=0.0)
    sb.add_sphere((0., 0., 0.), 1.0, Material(diffuse=(0.8, 0.3, 0.2)))
    scene = compile_scene(sb)
    cfg = RenderConfig(max_bounces=1)
    cam = default_camera(aspect=1.0)
    n = 5
    u = jnp.linspace(0.48, 0.52, n)
    v = jnp.full(n, 0.5)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(0), jnp.arange(n, dtype=jnp.int32))

    results = {}
    for pname, field, idx in [("sphere_center", "sph_center", 0),
                              ("sphere_radius", "sph_radius", 0),
                              ("albedo", "mat_diffuse", 1)]:
        def loss(p, field=field, idx=idx):
            arr = getattr(scene, field).at[idx].set(p)
            s2 = dataclasses.replace(scene, **{field: arr})
            return jnp.sum(integrator.trace(s2, cfg, o, d, jnp.zeros(n),
                                            keys))
        p0 = getattr(scene, field)[idx]
        _, _, err, ok = compare_ad_fd(loss, p0)
        results[pname] = {"max_abs_err": err, "ok": ok}
    print(json.dumps(results, indent=2))
    if not all(r["ok"] for r in results.values()):
        sys.exit(1)


def cmd_scenes(args):
    from tracer.scenes import zoo
    for i, (name, _) in sorted(zoo.SCENES.items()):
        print(f"{i:2d}  {name}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="tracer", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--scene", default="cornell_box")
        sp.add_argument("--width", type=int, default=850)
        sp.add_argument("--height", type=int, default=480)
        sp.add_argument("--bounces", type=int, default=6)
        sp.add_argument("--compat", default="reference",
                        choices=["reference", "physical"])
        sp.add_argument("--seed", type=int, default=0)

    r = sub.add_parser("render", help="ray trace a scene to an image")
    common(r)
    r.add_argument("--spp", type=int, default=20)
    r.add_argument("--shadow-rays", type=int, default=10)
    r.add_argument("--out", default="rendu.ppm")
    r.add_argument("--progress", action="store_true")
    r.add_argument("--ckpt-dir", default=None,
                   help="tile-checkpoint dir: atomic per-tile saves; "
                        "re-running resumes, re-rendering only missing tiles")
    r.add_argument("--tile", type=int, default=128,
                   help="checkpoint tile size (with --ckpt-dir)")
    r.set_defaults(fn=cmd_render)

    pr = sub.add_parser("probe", help="MONORAY single-ray debug probe")
    common(pr)
    pr.add_argument("--x", type=int, default=220)
    pr.add_argument("--y", type=int, default=270)
    pr.set_defaults(fn=cmd_probe)

    b = sub.add_parser("benchmark", help="Cornell rays/s benchmark")
    b.set_defaults(fn=cmd_benchmark)

    g = sub.add_parser("grad-check", help="AD vs finite-difference check")
    g.set_defaults(fn=cmd_grad_check)

    s = sub.add_parser("scenes", help="list built-in scenes")
    s.set_defaults(fn=cmd_scenes)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
