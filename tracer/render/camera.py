"""Pinhole camera with a differentiable pose.

The reference generates rays by unprojecting through inverted OpenGL
matrices (`/root/reference/src/matrixUtilities.h:53-74`, driven by the GLUT
trackball camera `Camera.cpp:125-132`: modelview = T(x,y,z)·T(0,0,-zoom)·R).
The closed form of that unprojection (GL_DEPTH_RANGE near = 0, i.e. z_ndc=0,
gluPerspective fov=45, near=4.1, far=1e4 — Camera.cpp:24-28) is the standard
pinhole:

    dir_cam ∝ ( (2u-1)·aspect·tan(fov/2),  (1-2v)·tan(fov/2),  -1 )
    origin  = camera position (modelviewInverse · 0, matrixUtilities.h:53-58)

so we implement exactly that, with the pose as a differentiable
(position, quaternion) pair instead of GL state. The default pose matches
the app at startup: `camera.move(0,0,-3.1)` with trackball zoom 3.0
(`main.cpp:418`, `Camera.cpp:37`) puts the eye at (0, 0, 6.1), identity
orientation.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from tracer.core.mathutils import normalize


@dataclasses.dataclass(frozen=True)
class Camera:
    position: jnp.ndarray        # [3]
    quaternion: jnp.ndarray      # [4] (w, x, y, z) camera->world rotation
    fov_deg: jnp.ndarray         # scalar
    aspect: jnp.ndarray          # scalar


jax.tree_util.register_dataclass(
    Camera, data_fields=["position", "quaternion", "fov_deg", "aspect"],
    meta_fields=[])


def default_camera(aspect: float = 850.0 / 480.0) -> Camera:
    return Camera(
        position=jnp.asarray([0.0, 0.0, 6.1], jnp.float32),
        quaternion=jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        fov_deg=jnp.float32(45.0),
        aspect=jnp.float32(aspect),
    )


def quat_to_matrix(q):
    """Unit quaternion (w,x,y,z) -> rotation matrix [3,3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-20)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def generate_rays(camera: Camera, u, v):
    """Screen (u, v) in [0,1]^2 (v down, as in trace_line main.cpp:189-190)
    -> world rays (origins [N,3], dirs [N,3])."""
    th = jnp.tan(jnp.deg2rad(camera.fov_deg) * 0.5)
    x = (2.0 * u - 1.0) * camera.aspect * th
    y = (1.0 - 2.0 * v) * th
    d_cam = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    R = quat_to_matrix(camera.quaternion)
    d_world = normalize(jnp.matmul(d_cam, R.T,
                                   precision=jax.lax.Precision.HIGHEST))
    o = jnp.broadcast_to(camera.position, d_world.shape)
    return o, d_world
