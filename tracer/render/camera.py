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


def matrix_to_quat(R):
    """Rotation matrix [3,3] -> unit quaternion (w,x,y,z). Shepperd's
    branch-free form via the trace (host-side camera setup: small, exact
    enough in f32 for pose control)."""
    t = R[0, 0] + R[1, 1] + R[2, 2]
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + t, 1e-12))
    k = 0.25 / jnp.maximum(w, 1e-12)
    q = jnp.stack([w, k * (R[2, 1] - R[1, 2]), k * (R[0, 2] - R[2, 0]),
                   k * (R[1, 0] - R[0, 1])])
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-20)


def look_at_quaternion(position, target, up=(0.0, 1.0, 0.0)):
    """Orientation quaternion so the camera at `position` looks at `target`
    (camera forward = -z in camera space, matching generate_rays'
    d_cam=(x,y,-1)). The trackball-free analog of the reference's pose
    control (`/root/reference/src/Camera.cpp:41-132`, Trackball.cpp)."""
    position = jnp.asarray(position, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = normalize(target - position)
    r = jnp.cross(f, up)
    # degenerate up || forward: pick any perpendicular right vector
    r = jnp.where(jnp.linalg.norm(r) < 1e-8,
                  jnp.cross(f, jnp.asarray([1.0, 0.0, 0.0], jnp.float32)),
                  r)
    r = normalize(r)
    u2 = jnp.cross(r, f)
    R = jnp.stack([r, u2, -f], axis=1)   # columns: right, up, -forward
    return matrix_to_quat(R)


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
