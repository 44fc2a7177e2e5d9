"""Film accumulation + tile checkpoint/resume exactness."""

import os

import numpy as np

from tracer.render.film import Film, TileManifest


def test_film_accumulate_and_gamma(tmp_path):
    f = Film(4, 2)
    r1 = np.full((8, 3), 0.5, np.float32)
    r2 = np.full((8, 3), 0.1, np.float32)
    f.add_sample(r1)
    f.add_sample(r2)
    img = f.image()
    assert np.allclose(img, 0.3 ** (1 / 2.2), atol=1e-6)
    p = os.path.join(tmp_path, "film.npz")
    f.save(p)
    g = Film.load(p)
    assert g.samples_done == 2
    assert np.allclose(g.sum, f.sum)


def test_tile_manifest_resume_exact(tmp_path):
    w, h, tile = 10, 6, 4
    rng = np.random.RandomState(0)
    full = rng.rand(h * w, 3).astype(np.float32)

    m = TileManifest(w, h, tile, str(tmp_path))
    assert m.n_tiles == 3 * 2
    # host assignment deterministic & partitioned
    a = sum((m.tiles_for_host(i, 3) for i in range(3)), [])
    assert sorted(a) == list(range(m.n_tiles))

    # "render" all tiles as 2-sample sums, crash after half
    for t in range(m.n_tiles // 2):
        pix = m.tile_pixels(t)
        m.save_tile(t, full[pix] * 2, 2)
    # resume: only missing tiles rendered
    todo = [t for t in range(m.n_tiles) if not m.done(t, 2)]
    assert todo == list(range(m.n_tiles // 2, m.n_tiles))
    for t in todo:
        pix = m.tile_pixels(t)
        m.save_tile(t, full[pix] * 2, 2)

    img = m.assemble(2, gamma=False)
    assert np.allclose(img.reshape(-1, 3), full, atol=1e-6)
