"""Camera-pose control (CLI flags + look_at) and PNG output.

The reference renders from any trackball pose
(`/root/reference/src/Camera.cpp:41-132`, Trackball.cpp); here the pose is
an explicit (position, quaternion) pair reachable from the CLI. The
reference's startup framing (used by its rendu.ppm) is documented as
`--cam-pos 0,0,6.1 --cam-quat 1,0,0,0 --fov 45` (main.cpp:418,
Camera.cpp:24-37) and pinned by test_explicit_startup_pose_matches_default.
"""

import argparse
import types

import numpy as np
import jax.numpy as jnp

from tracer.cli import _camera
from tracer.core.config import RenderConfig
from tracer.render.camera import (default_camera, generate_rays,
                                  look_at_quaternion)


def _args(**kw):
    base = dict(width=160, height=90, cam_pos=None, cam_quat=None,
                look_at=None, fov=None)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_look_at_points_at_target():
    pos = (2.0, 1.0, 5.0)
    target = (-1.0, 0.5, -2.0)
    q = look_at_quaternion(pos, target)
    cam = default_camera(aspect=1.0)
    import dataclasses
    cam = dataclasses.replace(cam, position=jnp.asarray(pos, jnp.float32),
                              quaternion=q)
    o, d = generate_rays(cam, jnp.asarray([0.5]), jnp.asarray([0.5]))
    want = np.asarray(target, np.float32) - np.asarray(pos, np.float32)
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(np.asarray(d)[0], want, atol=1e-5)
    # up stays up: a pixel above the center leaves d.y larger
    _, d2 = generate_rays(cam, jnp.asarray([0.5]), jnp.asarray([0.25]))
    assert float(d2[0, 1]) > float(d[0, 1])


def test_explicit_startup_pose_matches_default():
    """--cam-pos 0,0,6.1 --cam-quat 1,0,0,0 --fov 45 IS the reference
    startup pose: the flags must reproduce the default camera exactly."""
    cam_flags = _camera(_args(cam_pos="0,0,6.1", cam_quat="1,0,0,0",
                              fov=45.0))
    cam_def = _camera(_args())
    for f in ("position", "quaternion", "fov_deg", "aspect"):
        np.testing.assert_array_equal(np.asarray(getattr(cam_flags, f)),
                                      np.asarray(getattr(cam_def, f)))


def test_cam_quat_and_look_at_exclusive():
    import pytest
    with pytest.raises(SystemExit):
        _camera(_args(cam_quat="1,0,0,0", look_at="0,0,0"))


def test_non_default_pose_render(tmp_path):
    """A render from a non-default pose differs from the default-pose
    render and writes a valid PNG (render --out *.png)."""
    from tracer.render.renderer import render_image
    from tracer.scene.builder import SceneBuilder, Material
    from tracer.scene.device import compile_scene

    sb = SceneBuilder()
    sb.add_light((-2.0, 4.0, 3.0), radius=0.0)
    sb.add_sphere((0.6, 0.0, 0.0), 0.6,
                  Material(diffuse=(0.8, 0.3, 0.2)))
    scene = compile_scene(sb)
    cfg = RenderConfig(width=32, height=24, nsamples=1, max_bounces=2)

    cam0 = _camera(_args(width=32, height=24))
    cam1 = _camera(_args(width=32, height=24, cam_pos="3,1,5",
                         look_at="0.6,0,0"))
    p0 = tmp_path / "a.png"
    p1 = tmp_path / "b.png"
    img0 = render_image(scene, cam0, cfg, str(p0))
    img1 = render_image(scene, cam1, cfg, str(p1))
    assert p0.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    assert not np.array_equal(np.asarray(img0), np.asarray(img1))
    # the sphere is visible from the new pose (look-at centers it)
    assert np.asarray(img1).std() > 0
