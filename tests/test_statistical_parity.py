"""Statistical parity of the STOCHASTIC paths vs the numpy oracle.

Round-1 tests only pinned deterministic degenerations (radius-0 lights,
opaque occluders); these compare many-sample MEAN radiance with live RNG on
both sides, so a wrong shadow-count denominator, sampler distribution,
Bernoulli rate, or motion-blur time distribution would show up as a mean
shift beyond sampling error (VERDICT r1 missing #5).

Covers: soft shadows from a finite-radius light (cube-jittered light
samples, Scene.h:319-334), stochastic-transparency shadows
(Scene.h:235-255), glass reflect/refract Bernoulli (Material.cpp:39-44),
the cube "unit"-vector scatter distribution (Functions.cpp:14-18), and
motion blur (Ray.h:6, Sphere.h:94).

Comparison: per-pixel z-test on the difference of means, plus a global
mean-of-means check. Thresholds are 5 sigma with a small absolute floor —
false-positive probability < 1e-5 per pixel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracer.core import rng as trng
from tracer.core.config import RenderConfig
from tracer.render import integrator
from tracer.scene.builder import SceneBuilder, Material, GLASS
from tracer.scene.device import compile_scene

from tests.oracle import Oracle


def _jax_mean(scene, cfg, o, d, n_samples, with_time=False, seed=0):
    """Mean + per-pixel std over n_samples traces with fresh sub-streams
    (the production per-sample salting pattern, renderer.py:41-52)."""
    n = o.shape[0]
    pid = jnp.arange(n, dtype=jnp.int32)
    base = jax.random.key(seed)

    @jax.jit
    def one(s):
        keys = trng.salted(trng.ray_keys(base, pid), s)
        t = (trng.uniform(trng.salted(keys, trng.RAY_TIME)) if with_time
             else jnp.zeros(n))
        return integrator.trace(scene, cfg, o, d, t, keys)

    acc = np.zeros((n, 3))
    acc2 = np.zeros((n, 3))
    for s in range(n_samples):
        r = np.asarray(one(jnp.int32(s)), np.float64)
        acc += r
        acc2 += r * r
    mean = acc / n_samples
    var = np.maximum(acc2 / n_samples - mean ** 2, 0.0)
    return mean, var


def _oracle_mean(sb, cfg, o, d, n_samples, with_time=False, seed=1):
    rs = np.random.RandomState(seed)
    orc = Oracle(sb, rand=lambda: rs.rand(), nb_ech=cfg.shadow_rays,
                 bounces=cfg.max_bounces)
    n = o.shape[0]
    acc = np.zeros((n, 3))
    acc2 = np.zeros((n, 3))
    for s in range(n_samples):
        for i in range(n):
            t = rs.rand() if with_time else 0.0
            r = orc.trace(o[i], d[i], time=t)
            acc[i] += r
            acc2[i] += r * r
    mean = acc / n_samples
    var = np.maximum(acc2 / n_samples - mean ** 2, 0.0)
    return mean, var


def _compare(scene_sb, cfg, o, d, nj=256, no=160, with_time=False):
    scene = compile_scene(scene_sb)
    oj = np.asarray(o, np.float64)
    dj = np.asarray(d, np.float64)
    mj, vj = _jax_mean(scene, cfg, jnp.asarray(o, jnp.float32),
                       jnp.asarray(d, jnp.float32), nj, with_time)
    mo, vo = _oracle_mean(scene_sb, cfg, oj, dj, no, with_time)
    se = np.sqrt(vj / nj + vo / no)
    z = np.abs(mj - mo) / np.maximum(se, 1e-4)
    assert z.max() < 5.0, (
        f"mean radiance differs beyond sampling error: max z={z.max():.2f} "
        f"at {np.unravel_index(z.argmax(), z.shape)}; "
        f"jax={mj.reshape(-1,3)[z.max(-1).argmax()]}, "
        f"oracle={mo.reshape(-1,3)[z.max(-1).argmax()]}")
    # global drift: mean of per-pixel differences must be ~0 too
    gdiff = np.abs((mj - mo).mean())
    gse = np.sqrt((vj / nj + vo / no).mean() / mj.shape[0])
    assert gdiff < 5.0 * gse + 1e-4, (gdiff, gse)


def _grid_rays(x0, x1, y0, y1, n, z=6.0, aim=(0.0, 0.0, 0.0)):
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    X, Y = np.meshgrid(xs, ys)
    o = np.stack([X.ravel(), Y.ravel(), np.full(n * n, z)], -1)
    tgt = np.asarray(aim) - o
    d = tgt / np.linalg.norm(tgt, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def test_soft_shadow_statistics():
    """Finite-radius light: the shadow factor is a mean of NB_ECH Bernoulli
    visibilities of cube-jittered light points — penumbra pixels pin the
    jitter distribution AND the /NB_ECH normalization."""
    sb = SceneBuilder()
    sb.add_light((0.0, 4.0, 0.0), radius=1.6)
    sb.add_sphere((0.0, 1.2, 0.0), 0.6, Material(diffuse=(0.6, 0.6, 0.6)))
    fl = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 6., 6.,
                       Material(diffuse=(0.8, 0.5, 0.3)))
    fl.rotate_x(-90)  # horizontal floor at y=0
    cfg = RenderConfig(max_bounces=1, shadow_rays=10)
    # rays aimed at the floor penumbra region around the sphere's shadow
    o, d = _grid_rays(-1.6, 1.6, 4.0, 5.0, 4, z=4.0, aim=(0.6, 0.0, 0.6))
    _compare(sb, cfg, o, d)


def test_transparency_shadow_statistics():
    """A transparency-0.6 occluder blocks each shadow ray with probability
    P(u > 0.6) per occluder test (Scene.h:247-251)."""
    sb = SceneBuilder()
    sb.add_light((0.0, 4.0, 0.0), radius=0.8)
    sb.add_sphere((0.0, 1.2, 0.0), 0.7,
                  Material(diffuse=(1., 1., 1.), mtype=GLASS,
                           transparency=0.6, index_medium=1.1))
    fl = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 6., 6.,
                       Material(diffuse=(0.7, 0.7, 0.2)))
    fl.rotate_x(-90)
    cfg = RenderConfig(max_bounces=1, shadow_rays=10)
    o, d = _grid_rays(-0.9, 0.9, 3.5, 4.5, 4, z=3.0, aim=(0.0, 0.0, 0.0))
    _compare(sb, cfg, o, d)


def test_glass_and_diffuse_scatter_statistics():
    """Multi-bounce: glass Bernoulli reflect/refract (Schlick vs uniform,
    incl. the -0.6 fudge under compat=reference) + the cube-sampled diffuse
    scatter of the floor it lands on."""
    sb = SceneBuilder()
    sb.add_light((2.0, 4.0, 2.0), radius=0.0)
    sb.add_sphere((0.0, 1.0, 0.0), 0.8,
                  Material(diffuse=(1., 1., 1.), mtype=GLASS,
                           transparency=1.0, index_medium=1.5))
    fl = sb.add_square((-1., -1., 0.), (1., 0., 0.), (0., 1., 0.), 8., 8.,
                       Material(diffuse=(0.2, 0.5, 0.8)))
    fl.rotate_x(-90)
    cfg = RenderConfig(max_bounces=3, shadow_rays=2)
    o, d = _grid_rays(-0.5, 0.5, 0.8, 1.6, 3, z=4.0, aim=(0.0, 1.0, 0.0))
    _compare(sb, cfg, o, d, nj=384, no=256)


def test_motion_blur_statistics():
    """Per-sample time ~ U(0,1) shifts the sphere center by t*mb
    (Sphere.h:94): the mean image over time is a directional smear."""
    sb = SceneBuilder()
    sb.add_light((0.0, 4.0, 4.0), radius=0.0)
    sb.add_sphere((-0.6, 0.0, 0.0), 0.5,
                  Material(diffuse=(0.9, 0.2, 0.2),
                           motion_blur_translation=(1.2, 0.0, 0.0)))
    cfg = RenderConfig(max_bounces=1, shadow_rays=1)
    o, d = _grid_rays(-1.2, 1.2, -0.4, 0.4, 4, z=5.0)
    # parallel rays straight down -z so the smear axis is clean
    d = np.tile(np.asarray([[0., 0., -1.]], np.float32), (o.shape[0], 1))
    _compare(sb, cfg, o, d, with_time=True)
