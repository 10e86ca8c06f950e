"""Pallas CDEF band kernel vs the XLA unit-gather tier: identical
planes for random units/strengths/directions at every unit geometry
(interpret mode on the CPU backend; the real-TPU path is exercised by
the device chain + kernel_bench)."""

import numpy as np
import pytest

from dav1d_tpu.ops import cdef as dcdef
from dav1d_tpu.ops.pallas_cdef import cdef_filter_plane_pallas, supported

pytestmark = pytest.mark.skipif(not supported(), reason="pallas absent")


@pytest.mark.parametrize("w,h,ph,pw", [(8, 8, 64, 96), (4, 4, 32, 48),
                                       (4, 8, 64, 48), (8, 8, 60, 92)])
@pytest.mark.parametrize("bitdepth", [8, 10])
def test_matches_xla_tier(w, h, ph, pw, bitdepth):
    import jax.numpy as jnp

    rng = np.random.default_rng(42 + w + h + bitdepth)
    hi = (1 << bitdepth) - 1
    plane = rng.integers(0, hi + 1, (ph + 8, pw + 8)).astype(np.int32)
    nb_r, nb_c = ph // h, pw // w
    ys, xs, pri, sec, dirs = [], [], [], [], []
    for r in range(nb_r):
        for c in range(nb_c):
            roll = rng.integers(0, 4)
            if roll == 0:
                continue  # absent unit: must pass through
            ys.append(r * h)
            xs.append(c * w)
            p = int(rng.integers(0, 16)) << (bitdepth - 8)
            s = int(rng.integers(0, 5)) << (bitdepth - 8)
            if not (p | s):
                p = 1 << (bitdepth - 8)
            pri.append(p if roll != 1 else 0)
            sec.append(s if roll != 2 else max(s, 1 << (bitdepth - 8)))
            dirs.append(int(rng.integers(0, 8)))
    ys, xs = np.asarray(ys, np.int64), np.asarray(xs, np.int64)
    pri, sec = np.asarray(pri, np.int64), np.asarray(sec, np.int64)
    dirs = np.asarray(dirs, np.int64)
    damping = 5 + (bitdepth - 8)

    jplane = jnp.asarray(plane)
    ref = np.asarray(dcdef.cdef_filter_plane_dev(
        jplane, ph, pw, ys, xs, w, h, pri, sec, dirs, damping, bitdepth))
    got = np.asarray(cdef_filter_plane_pallas(
        jplane, ph, pw, ys, xs, w, h, pri, sec, dirs, damping, bitdepth,
        interpret=True))
    assert np.array_equal(ref, got), (
        f"mismatch at {np.argwhere(ref != got)[:4]}")
