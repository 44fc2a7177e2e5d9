"""Exploration: compare our renders against the reference's committed
renders (/root/reference/img/rendus/*.png, README.md:38-46) — downsampled
normalized cross-correlation + mean color. The reference images are
interactive-session screenshots (unknown trackball pose/spp), so only
scenes shot from the startup pose can be pinned as goldens.

Run: python benchmarks/golden_compare.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

import tracer
from tracer.core.config import RenderConfig
from tracer.render.camera import default_camera
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

REF = "/root/reference/img/rendus"


def load_ref(name):
    im = np.asarray(Image.open(f"{REF}/{name}")).astype(np.float32)
    return im[:, :, :3] / 255.0


def downsample(img, gh, gw):
    h, w = img.shape[:2]
    ys = (np.arange(gh) + 0.5) * h / gh
    xs = (np.arange(gw) + 0.5) * w / gw
    # box filter via block mean on a resampled grid
    out = np.zeros((gh, gw, 3), np.float32)
    yb = np.linspace(0, h, gh + 1).astype(int)
    xb = np.linspace(0, w, gw + 1).astype(int)
    for i in range(gh):
        for j in range(gw):
            out[i, j] = img[yb[i]:yb[i + 1], xb[j]:xb[j + 1]].mean((0, 1))
    return out


def ncc(a, b):
    a = a - a.mean()
    b = b - b.mean()
    return float((a * b).sum() / max(np.sqrt((a * a).sum() * (b * b).sum()),
                                     1e-9))


def main():
    cases = [
        ("cornell.png", "cornell_box", None),
        ("cornell3.png", "cornell_box", None),
        ("sun.png", "rt_in_a_weekend", None),
        ("flamingo.png", "flamingo", None),
        ("spheres.png", "random_spheres", None),
        ("motion_blur.png", "rt_in_a_weekend", None),
        ("raccoon.png", "raccoon", None),
        ("slimespace.png", "mesh", None),
        ("pool.png", "backrooms_pool", None),
    ]
    G = 24
    for ref_name, scene_name, _ in cases:
        ref = load_ref(ref_name)
        h, w = ref.shape[:2]
        aspect = w / h
        rw = min(int(round(160 * aspect)), 320)
        rh = 160
        if scene_name == "cornell_box":
            sb = zoo.setup_cornell_box(aspect)
        elif scene_name == "random_spheres":
            sb = zoo.setup_random_spheres(0)
        else:
            sb = getattr(zoo, f"setup_{scene_name}")()
        scene = compile_scene(sb)
        cfg = RenderConfig(width=rw, height=rh, nsamples=8)
        img = tracer.render(scene, default_camera(aspect=aspect), cfg)
        gw = int(round(G * aspect))
        a = downsample(img, G, gw)
        b = downsample(ref, G, gw)
        print(f"{ref_name:17s} vs {scene_name:16s} ncc={ncc(a, b):6.3f} "
              f"mean_ours={a.mean(axis=(0,1)).round(3)} "
              f"mean_ref={b.mean(axis=(0,1)).round(3)}")


if __name__ == "__main__":
    main()
