"""Top-level render driver — the TPU-native `ray_trace_from_camera`
(`/root/reference/main.cpp:200-263`).

The reference spawns one std::thread per scanline; here the whole
pixels x samples grid is a flat ray stream processed in jit-compiled
device batches (and, via tracer/dist, sharded over a device mesh). Samples
accumulate into a float film; per-pixel mean + gamma 1/2.2 + clamp
reproduce main.cpp:193-196 / 258-261.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from tracer.core import rng
from tracer.core.config import RenderConfig
from tracer.core.mathutils import gamma_correct
from tracer.render import integrator
from tracer.render.camera import Camera, generate_rays


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height"))
def render_batch(scene, camera: Camera, cfg: RenderConfig, width: int,
                 height: int, pixel_ids, sample_idx, base_key):
    """Radiance for one sample of a batch of pixels. pixel_ids: [N] i32
    (flat y*width + x). Returns [N, 3] linear radiance."""
    keys = rng.ray_keys(base_key, pixel_ids)
    keys = rng.salted(keys, sample_idx)

    jkey = rng.salted(keys, rng.PIXEL_JITTER)
    jit_uv = rng.uniform(jkey, (2,))
    x = (pixel_ids % width).astype(jnp.float32)
    y = (pixel_ids // width).astype(jnp.float32)
    u = (x + jit_uv[:, 0]) / width
    v = (y + jit_uv[:, 1]) / height

    tkey = rng.salted(keys, rng.RAY_TIME)
    time = rng.uniform(tkey)

    o, d = generate_rays(camera, u, v)
    return integrator.trace(scene, cfg, o, d, time, keys)


def render(scene, camera: Camera, cfg: RenderConfig, width=None, height=None,
           nsamples=None, progress=False):
    """Full-frame render -> float32 [H, W, 3] gamma-corrected image."""
    width = width or cfg.width
    height = height or cfg.height
    nsamples = nsamples or cfg.nsamples
    n_pix = width * height
    base_key = jax.random.key(cfg.seed)  # typed key: scalar per-ray keys

    chunk = min(cfg.rays_per_batch, n_pix)
    # pad pixel ids to a whole number of chunks
    n_chunks = (n_pix + chunk - 1) // chunk
    ids = np.arange(n_chunks * chunk, dtype=np.int32) % n_pix

    film = jnp.zeros((n_pix, 3), jnp.float32)
    for s in range(nsamples):
        for c in range(n_chunks):
            pid = jnp.asarray(ids[c * chunk:(c + 1) * chunk])
            rad = render_batch(scene, camera, cfg, width, height, pid,
                               jnp.int32(s), base_key)
            if n_chunks == 1:
                film = film + rad
            else:
                film = film.at[pid].add(
                    rad * (jnp.arange(pid.shape[0]) <
                           (n_pix - c * chunk))[:, None])
        if progress:
            print(f"  sample {s + 1}/{nsamples}", flush=True)

    img = film / jnp.float32(nsamples)
    img = gamma_correct(img)
    img = jnp.clip(img, 0.0, 1.0)
    return np.asarray(img).reshape(height, width, 3)


def render_image(scene, camera, cfg, path, **kw):
    """Render and write a PPM (and .png twin) like main.cpp:251-262."""
    from tracer.io.ppm import write_ppm, write_png
    img = render(scene, camera, cfg, **kw)
    if path.endswith(".png"):
        write_png(path, img)
    else:
        write_ppm(path, img)
    return img
