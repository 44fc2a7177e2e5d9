"""The optimization-loop product path (tracer/train.py): recovery of
perturbed parameters, EXACT checkpoint resume, and the stale-pack guard
(VERDICT r2 next-steps #5/#6)."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from tracer import train as T
from tracer.core.config import RenderConfig
from tracer.render.camera import default_camera
from tracer.render.renderer import render_pixels
from tracer.scene.builder import SceneBuilder, Material
from tracer.scene.device import compile_scene

W, H, SPP = 48, 32, 2


def _scene():
    sb = SceneBuilder()
    sb.dark_sky = False
    sb.add_light((-2., 4., 3.), radius=0.0)
    sb.add_sphere((0., 0., 0.), 1.0, Material(diffuse=(0.8, 0.3, 0.2)))
    s = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 8., 8.,
                      Material(diffuse=(0.3, 0.6, 0.9)))
    s.rotate_x(-90).translate((0., -1.5, 0.))
    return compile_scene(sb)


def _target(scene, cam, cfg):
    pid = jnp.arange(W * H, dtype=jnp.int32)
    return (render_pixels(scene, cam, cfg, W, H, pid, SPP,
                          jax.random.key(0)) / SPP)


def test_fit_recovers_albedo():
    """Albedo recovery: a pure shading parameter, fully covered by the
    detached-selection gradients (sphere-CENTER recovery would need
    visibility/edge gradients, which are out of scope by design —
    SURVEY.md section 7 'differentiating through traversal')."""
    scene = _scene()
    cam = default_camera(aspect=W / H)
    cfg = RenderConfig(width=W, height=H, nsamples=SPP, max_bounces=2,
                       shadow_rays=2)
    target = _target(scene, cam, cfg)
    true_d = scene.mat_diffuse

    s0 = dataclasses.replace(
        scene, mat_diffuse=jnp.clip(scene.mat_diffuse
                                    + jnp.asarray([[0.15, -0.1, 0.08]]),
                                    0.0, 1.0))
    err0 = float(jnp.abs(s0.mat_diffuse - true_d).max())
    s1, _, hist = T.fit(s0, cam, cfg, target, ["mat_diffuse"], steps=30,
                        lr=2e-2, width=W, height=H, nsamples=SPP,
                        base_key=jax.random.key(0))
    err1 = float(jnp.abs(s1.mat_diffuse - true_d).max())
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.5, hist
    assert err1 < err0 * 0.6, (err0, err1)
    assert all(np.isfinite(h["grad_norm"]) for h in hist)


def test_fit_recovers_camera_orientation():
    """Pose recovery through the differentiable quaternion (SURVEY §2.22:
    the full camera pose is a trainable parameter).

    Image-matching pose gradients are shading gradients only (visibility/
    edge selection is detached by design — SURVEY §7), so the recovery
    scene is the smooth procedural sky: pitch (x) and roll (z) are
    observable through the gradient's d.y dependence; yaw (y) is in its
    null space and must simply stay finite."""
    from tracer.scene.builder import SceneBuilder
    from tracer.scene.device import compile_scene
    sb = SceneBuilder()
    sb.dark_sky = False
    scene = compile_scene(sb)
    cam = default_camera(aspect=W / H)
    cfg = RenderConfig(width=W, height=H, nsamples=SPP, max_bounces=1)
    target = _target(scene, cam, cfg)

    q_off = jnp.asarray([0.9995, 0.025, 0.0, 0.015], jnp.float32)
    cam0 = dataclasses.replace(cam, quaternion=q_off)
    _, cam1, hist = T.fit(scene, cam0, cfg, target, ["cam_quaternion"],
                          steps=50, lr=2e-3, width=W, height=H,
                          nsamples=SPP, base_key=jax.random.key(0))
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.05, (hist[0], hist[-1])
    q1 = np.asarray(cam1.quaternion, np.float64)
    q1 = q1 / np.linalg.norm(q1)
    # observable components recovered toward identity
    assert abs(q1[1]) < 0.025 * 0.5, q1
    assert abs(q1[3]) < 0.015 * 0.5, q1
    assert np.isfinite(q1).all()


def test_fit_checkpoint_exact_resume(tmp_path):
    scene = _scene()
    cam = default_camera(aspect=W / H)
    cfg = RenderConfig(width=W, height=H, nsamples=SPP, max_bounces=2,
                       shadow_rays=2)
    target = _target(scene, cam, cfg)
    s0 = dataclasses.replace(
        scene, sph_center=scene.sph_center.at[0].add(0.1),
        mat_diffuse=scene.mat_diffuse + 0.05)
    kw = dict(trainable=["sph_center", "mat_diffuse"], lr=1e-2,
              width=W, height=H, nsamples=SPP,
              base_key=jax.random.key(1))

    # uninterrupted 6 steps
    sa, ca, _ = T.fit(s0, cam, cfg, target, steps=6, **kw)

    # 3 steps -> checkpoint -> resume to 6 (fresh fit() call)
    ck = str(tmp_path / "ck")
    T.fit(s0, cam, cfg, target, steps=3, ckpt_dir=ck, ckpt_every=3, **kw)
    assert os.path.exists(os.path.join(ck, "train.npz"))
    sb_, cb, hist_b = T.fit(s0, cam, cfg, target, steps=6, ckpt_dir=ck,
                            ckpt_every=3, **kw)
    assert hist_b[0]["step"] == 4, "resume must continue at step 4"
    np.testing.assert_array_equal(np.asarray(sa.sph_center),
                                  np.asarray(sb_.sph_center))
    np.testing.assert_array_equal(np.asarray(sa.mat_diffuse),
                                  np.asarray(sb_.mat_diffuse))


def test_texel_training_stale_pack_guard():
    """>= 2 texel-training steps with kernels='on': every forward during
    AND after training must match the exact kernels='off' path (the packed
    twins can no longer represent the off-grid texels — VERDICT r2 #5)."""
    from tracer.render import integrator
    from tracer.core import rng as trng
    from tracer.render.camera import generate_rays

    sb = SceneBuilder()
    sb.dark_sky = False
    sb.add_light((0., 0., 5.), radius=0.0)
    img = (np.arange(8 * 8 * 3).reshape(8, 8, 3) * 2 + 30).astype(np.uint8)
    mt = Material(diffuse=(1., 1., 1.))
    mt.texture_type = 2
    mt.texture_id = sb.add_texture(img)
    sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 4., 4., mt)
    scene = compile_scene(sb)
    cam = default_camera(aspect=W / H)
    cfg_on = RenderConfig(width=W, height=H, nsamples=SPP, max_bounces=1,
                          shadow_rays=1, kernels="on")
    target = _target(scene, cam, T.guard_config(cfg_on, ["tex_data"]))

    s0 = dataclasses.replace(scene, tex_data=scene.tex_data * 0.7)
    s1, _, hist = T.fit(s0, cam, cfg_on, target, ["tex_data"], steps=3,
                        lr=5e-2, width=W, height=H, nsamples=SPP,
                        base_key=jax.random.key(0))
    assert len(hist) == 3
    assert hist[-1]["loss"] < hist[0]["loss"]

    # the returned scene's packs are invalidated: a later forward with
    # kernels='on' must equal the exact kernels='off' forward
    n = 64
    u = jnp.linspace(0.3, 0.7, n)
    v = jnp.linspace(0.4, 0.6, n)
    o, d = generate_rays(cam, u, v)
    keys = trng.ray_keys(jax.random.key(2), jnp.arange(n, dtype=jnp.int32))
    r_on = integrator.trace(s1, cfg_on, o, d, jnp.zeros(n), keys)
    r_off = integrator.trace(
        s1, dataclasses.replace(cfg_on, kernels="off"), o, d,
        jnp.zeros(n), keys)
    np.testing.assert_array_equal(np.asarray(r_on), np.asarray(r_off))
    # and the texels actually moved off the u8 grid during training
    assert float(jnp.abs(s1.tex_data - scene.tex_data).max()) > 1e-4
