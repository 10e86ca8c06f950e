"""Device CDEF kernel vs the host batch (itself oracle-verified)."""

import numpy as np

from dav1d_tpu.recon import cdef as hc
from dav1d_tpu.ops import cdef as dc


def _canvas(rng, h, w, bitdepth):
    c = np.full((h + 4, w + 4), hc.INT16_MIN, dtype=np.int32)
    c[2:-2, 2:-2] = rng.integers(0, 1 << bitdepth, size=(h, w))
    return c


def test_cdef_filter_device_parity():
    rng = np.random.default_rng(0)
    for bitdepth, damping in ((8, 3 + 3), (10, 3 + 5)):
        canvas = _canvas(rng, 64, 128, bitdepth)
        n = 37
        ys = rng.integers(0, 64 - 8, n) + 2
        xs = rng.integers(0, 128 - 8, n) + 2
        pri = rng.integers(0, 16, n).astype(np.int64) << (bitdepth - 8)
        sec = rng.integers(0, 3, n).astype(np.int64) << (bitdepth - 8)
        pri[0] = 0
        sec[1] = 0
        pri[2] = 0  # both zero -> passthrough lane
        sec[2] = 0
        dirs = rng.integers(0, 8, n).astype(np.int64)
        want = hc.cdef_filter_batch(canvas.astype(np.int64), ys, xs, 8, 8,
                                    pri, sec, dirs, damping, bitdepth)
        got = dc.cdef_filter_batch(canvas, ys, xs, 8, 8, pri, sec, dirs,
                                   damping, bitdepth)
        assert np.array_equal(got, want), bitdepth


def test_cdef_dir_device_parity():
    rng = np.random.default_rng(1)
    for bitdepth in (8, 12):
        blocks = rng.integers(0, 1 << bitdepth, size=(41, 8, 8))
        d1, v1 = hc.cdef_find_dir_batch(blocks, bitdepth)
        d2, v2 = dc.cdef_find_dir_batch(blocks.astype(np.int32), bitdepth)
        assert np.array_equal(d1, d2)
        assert np.array_equal(v1, v2)


def test_cdef_dir_maps_parity():
    """Whole-plane reshape form == gathered-block form at every
    8-aligned unit position."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for bitdepth in (8, 10):
        ph, pw = 72, 136  # not multiples of 8 in both dims
        plane = rng.integers(0, 1 << bitdepth, size=(ph, pw)) \
            .astype(np.int32)
        jplane = jnp.asarray(plane)
        dmap, vmap = dc.cdef_find_dir_maps_dev(jplane, bitdepth)
        dmap, vmap = np.asarray(dmap), np.asarray(vmap)
        ys, xs = np.meshgrid(np.arange(ph // 8) * 8,
                             np.arange(pw // 8) * 8, indexing="ij")
        ys, xs = ys.ravel(), xs.ravel()
        d, v = dc.cdef_find_dir_plane_dev(jplane, ys, xs, bitdepth)
        assert np.array_equal(dmap[ys // 8, xs // 8], d)
        assert np.array_equal(vmap[ys // 8, xs // 8], v)
