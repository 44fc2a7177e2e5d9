"""All 11 reference scenes compile and render tiny frames without NaNs."""

import numpy as np
import pytest

from tracer.core.config import RenderConfig
from tracer.render.camera import default_camera
from tracer.render.renderer import render
from tracer.scene.device import compile_scene
from tracer.scenes import zoo

# Mesh-heavy scenes are slow on the CPU test mesh; keep resolution tiny.
CASES = [(i, name) for i, (name, _) in zoo.SCENES.items()]


@pytest.mark.parametrize("idx,name", CASES)
def test_scene_renders(idx, name):
    fn = zoo.SCENES[idx][1]
    sb = fn(850 / 480) if name == "cornell_box" else fn()
    scene = compile_scene(sb)
    w, h = (32, 18)
    cfg = RenderConfig(nsamples=1, width=w, height=h, max_bounces=3,
                       shadow_rays=2)
    img = render(scene, default_camera(aspect=w / h), cfg)
    assert img.shape == (h, w, 3)
    assert np.isfinite(img).all(), f"{name}: non-finite pixels"
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_scene_counts_match_reference():
    """Object counts per scene mirror Scene.h builders."""
    sb = zoo.setup_cornell_box(850 / 480)
    # addBox: 5 faces; walls: 6 squares; spheres: glass + mirror
    assert len(sb.squares) == 11
    assert len(sb.spheres) == 2
    assert len(sb.lights) == 0      # cornell uses emissive geometry only
    sb = zoo.setup_rt_in_a_weekend()
    assert len(sb.spheres) == 3 and len(sb.lights) == 3
    sb = zoo.setup_random_spheres()
    assert len(sb.spheres) == 3 + 79
    sb = zoo.setup_backrooms_pool()
    # 4 ceiling lights + water + floor + ceiling + 4 side walls + 4 upper
    # floor/ceils (incl. the duplicated right-upper-ceil, Scene.h:1581) +
    # left upper ceil + 2 middle walls + 8 wall lights + front + back
    assert len(sb.squares) == 28
