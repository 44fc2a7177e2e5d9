"""Worker for tests/test_multiprocess.py: one of two jax.distributed
processes (CPU backend, 4 virtual devices each) rendering a lighted scene
over a global (dp, sp) mesh and comparing against its own single-process
render. Usage: python multiproc_worker.py <pid> <port> <out.json>"""

import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracer.core.config import RenderConfig  # noqa: E402
from tracer.dist import multihost as mh  # noqa: E402
from tracer.render.camera import default_camera  # noqa: E402
from tracer.render.renderer import render  # noqa: E402
from tracer.scene.builder import SceneBuilder, Material  # noqa: E402
from tracer.scene.device import compile_scene  # noqa: E402


def lit_scene():
    sb = SceneBuilder()
    sb.add_light((-2., 4., 3.), radius=1.0)   # finite radius: shadow path
    sb.add_sphere((0., 0., 0.), 1.0, Material(diffuse=(0.8, 0.3, 0.2)))
    s = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 8., 8.,
                      Material(diffuse=(0.3, 0.6, 0.9)))
    s.rotate_x(-90).translate((0., -1.5, 0.))
    return compile_scene(sb)


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    scene = lit_scene()
    W, H = 16, 8
    cfg = RenderConfig(width=W, height=H, nsamples=2, max_bounces=2,
                       shadow_rays=2)
    cam = default_camera(aspect=W / H)

    mesh = mh.make_pod_mesh(n_sp=2)     # dp = 2 hosts x 2 chips, sp = 2
    assert dict(mesh.shape) == {"dp": 4, "sp": 2}, mesh.shape
    img_multi = mh.render_image_multihost(scene, cam, cfg, mesh)

    img_single = render(scene, cam, cfg)   # local, unsharded
    diff = float(np.abs(img_multi - img_single).max())

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "processes": jax.process_count(),
                   "devices": len(jax.devices()),
                   "mesh": dict(mesh.shape), "max_diff": diff,
                   "mean": float(img_multi.mean()),
                   "ok": bool(diff == 0.0)}, f)
    print(f"worker {pid}: max_diff={diff} OK")


if __name__ == "__main__":
    main()
