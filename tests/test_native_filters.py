"""Native C filter kernels vs the golden numpy models (bit-identical).

The dispatchers in recon.mc_np / recon.cdef read dav1d_tpu.native.lib at
call time, so parity is checked by calling once natively and once with
the lib monkeypatched away.
"""

import numpy as np

import dav1d_tpu.native as nat
from dav1d_tpu.recon import cdef as hc
from dav1d_tpu.recon import mc_np


def _both(fn, *args, **kw):
    got = fn(*args, **kw)
    saved, nat.lib = nat.lib, None
    try:
        want = fn(*args, **kw)
    finally:
        nat.lib = saved
    return got, want


def test_put_prep_8tap_parity():
    rng = np.random.default_rng(11)
    for bd in (8, 10, 12):
        plane = rng.integers(0, 1 << bd, size=(120, 160)).astype(np.int32)
        for w, h in ((4, 4), (8, 16), (64, 32), (2, 2)):
            for mx, my in ((0, 0), (8, 0), (0, 9), (3, 15)):
                for ft in (0, 7, 15):
                    for fn in (mc_np.put_8tap, mc_np.prep_8tap):
                        got, want = _both(fn, plane, 160, 120, -5, -6,
                                          w, h, mx, my, ft, bd)
                        assert np.array_equal(got, want), \
                            (fn.__name__, bd, w, h, mx, my, ft)


def test_warp8x8_parity():
    rng = np.random.default_rng(12)
    for bd in (8, 10):
        plane = rng.integers(0, 1 << bd, size=(120, 160)).astype(np.int32)
        for prep in (False, True):
            for _ in range(8):
                abcd = rng.integers(-512, 512, 4)
                got, want = _both(
                    mc_np.warp8x8, plane, 160, 120,
                    int(rng.integers(-10, 110)), int(rng.integers(-10, 150)),
                    abcd, int(rng.integers(-10000, 10000)),
                    int(rng.integers(-10000, 10000)), bd, prep)
                assert np.array_equal(got, want), (bd, prep)


def test_ipred_native_parity():
    from dav1d_tpu.recon import ipred as ip
    rng = np.random.default_rng(21)
    bases = [90, 180, 45, 135, 113, 157, 203, 67]
    angs = sorted({b + 3 * d for b in bases for d in range(-3, 4)})
    z1a = [a for a in angs if 0 < a < 90]
    z2a = [a for a in angs if 90 < a < 180]
    z3a = [a for a in angs if 180 < a < 270]
    for bd in (8, 10, 12):
        for w, h in ((4, 4), (8, 4), (16, 16), (64, 64), (8, 32), (64, 16)):
            edge = rng.integers(0, 1 << bd, 257).astype(np.int32)
            for mode in range(14):
                if mode == 13 and (w > 32 or h > 32):
                    continue
                if mode == 6:
                    angles = [a + f for a in z1a[::4]
                              for f in (0, 512, 1024, 1536)]
                elif mode == 7:
                    angles = [a + f for a in z2a[::4]
                              for f in (0, 512, 1024, 1536)]
                elif mode == 8:
                    angles = [a + f for a in z3a[::4]
                              for f in (0, 512, 1024, 1536)]
                elif mode == 13:
                    angles = [0, 2, 4]
                else:
                    angles = [0]
                for ang in angles:
                    mw = int(rng.integers(1, w + 1))
                    mh = int(rng.integers(1, h + 1))
                    got = ip.ipred(mode, edge, 128, w, h, ang, mw, mh, bd)
                    want = ip.ipred_np(mode, edge, 128, w, h, ang, mw, mh,
                                       bd)
                    assert np.array_equal(got, want), (bd, w, h, mode, ang)


def test_cdef_native_parity():
    rng = np.random.default_rng(13)
    for bd, damping in ((8, 5), (10, 7), (12, 8)):
        canvas = np.full((104, 164), hc.INT16_MIN, dtype=np.int64)
        canvas[2:-2, 2:-2] = rng.integers(0, 1 << bd, size=(100, 160))
        canvas[40:44, :] = hc.INT16_MIN  # sentinel holes
        n = 300
        for w, h in ((8, 8), (4, 4), (4, 8)):
            ys = rng.integers(0, 100 - h, n) + 2
            xs = rng.integers(0, 160 - w, n) + 2
            pri = (rng.integers(0, 16, n) << (bd - 8)).astype(np.int64)
            sec = (rng.integers(0, 3, n) << (bd - 8)).astype(np.int64)
            pri[:5] = 0
            sec[3:8] = 0
            dirs = rng.integers(0, 8, n).astype(np.int64)
            want = hc.cdef_filter_batch_np(canvas, ys, xs, w, h, pri, sec,
                                           dirs, damping, bd)
            got = hc.cdef_filter_batch(canvas, ys, xs, w, h, pri, sec,
                                       dirs, damping, bd)
            assert np.array_equal(got, want), (bd, w, h)
        blocks = rng.integers(0, 1 << bd, size=(257, 8, 8))
        d1, v1 = hc.cdef_find_dir_batch_np(blocks, bd)
        d2, v2 = hc.cdef_find_dir_batch(blocks, bd)
        assert np.array_equal(d1, d2) and np.array_equal(v1, v2)


def test_cdef_filter_plane_parity():
    """Whole-plane native pass (incl. the int16 8-bit fast path) against
    the golden numpy batch on real-geometry canvases: random plane,
    units anywhere inside, taps reaching the sentinel borders."""
    from dav1d_tpu.native import lib
    if lib is None:
        pytest.skip("native lib unavailable")
    import ctypes
    rng = np.random.default_rng(29)
    for bd, damping in ((8, 5), (8, 3), (10, 7), (12, 8)):
        for w, h in ((8, 8), (4, 4), (4, 8)):
            ph, pw = 64, 96
            plane = rng.integers(0, 1 << bd, (ph, pw)).astype(np.int32)
            # unique unit positions (real CDEF units never overlap; with
            # duplicates the golden scatter's last-wins order differs
            # from the native pass's skip of zero-strength units)
            cells = np.arange(((ph - h) // h) * ((pw - w) // w))
            pick = rng.permutation(cells)[:120]
            # dense raster block: horizontally adjacent units exercise
            # the paired 4-wide AVX-512 kernel
            pick = np.unique(np.concatenate([pick, cells[:48]]))
            n = pick.size
            ys = (pick // ((pw - w) // w) * h).astype(np.int64)
            xs = (pick % ((pw - w) // w) * w).astype(np.int64)
            order = np.argsort(ys * pw + xs, kind="stable")
            ys, xs = ys[order], xs[order]
            pri = (rng.integers(0, 16, n) << (bd - 8)).astype(np.int64)
            sec = (rng.integers(0, 3, n) << (bd - 8)).astype(np.int64)
            pri[:5] = 0
            sec[3:8] = 0
            dirs = rng.integers(0, 8, n).astype(np.int64)
            canvas = np.full((ph + 4, pw + 4), hc.INT16_MIN, dtype=np.int64)
            canvas[2:-2, 2:-2] = plane
            want_units = hc.cdef_filter_batch_np(canvas, ys + 2, xs + 2,
                                                 w, h, pri, sec, dirs,
                                                 damping, bd)
            want = plane.copy()
            for i in range(n):
                want[ys[i]:ys[i] + h, xs[i]:xs[i] + w] = want_units[i]
            got = plane.copy()
            scratch = np.empty((ph + 4, pw + 4), np.int32)
            lib.dtpu_cdef_filter_plane(
                got.ctypes.data, pw, pw, ph, scratch.ctypes.data,
                ys.ctypes.data, xs.ctypes.data, n, w, h,
                pri.ctypes.data, sec.ctypes.data, dirs.ctypes.data,
                damping, bd)
            assert np.array_equal(got, want), (bd, w, h)
