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
@pytest.mark.parametrize("bitdepth", [8, 10, 12])
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


def test_resident_param_derivation():
    """Resident variant (in-graph dir gather + adjust_strength + UV
    remap) == the host-parameter flow device_chain used to run."""
    import jax.numpy as jnp

    from dav1d_tpu.ops import cdef as dc
    from dav1d_tpu.ops.pallas_cdef import cdef_filter_plane_resident
    from dav1d_tpu.recon.cdef import UV_DIRS_420

    rng = np.random.default_rng(9)
    bitdepth = 8
    ph, pw = 64, 128
    plane = rng.integers(0, 256, (ph, pw)).astype(np.int32)
    jplane = jnp.asarray(plane)
    n_r, n_c = ph // 8, pw // 8
    ys, xs = np.meshgrid(np.arange(n_r) * 8, np.arange(n_c) * 8,
                         indexing="ij")
    uys, uxs = ys.ravel(), xs.ravel()
    n = uys.size
    y_pri = rng.integers(0, 16, n) * (rng.integers(0, 3, n) > 0)
    y_sec = rng.integers(0, 5, n) * (rng.integers(0, 3, n) > 0)
    uv_pri = rng.integers(0, 16, n) * (rng.integers(0, 2, n) > 0)
    uv_sec = rng.integers(0, 5, n) * (rng.integers(0, 2, n) > 0)
    damping = 5

    dmap, vmap = dc.cdef_find_dir_maps_dev(jplane, bitdepth)
    dirs = np.asarray(dmap).astype(np.int64)[uys // 8, uxs // 8]
    variances = np.asarray(vmap).astype(np.int64)[uys // 8, uxs // 8]

    # host adjust_strength flow (as recon/device_chain.py ran it)
    v6 = variances >> 6
    i = np.zeros_like(variances)
    nz = v6 > 0
    i[nz] = np.minimum(np.frexp(v6[nz].astype(np.float64))[1] - 1, 12)
    y_adj = np.where(variances != 0, (y_pri * (4 + i) + 8) >> 4, 0)
    m_pri = y_pri > 0
    m = (m_pri & ((y_adj | y_sec) != 0)) | (~m_pri & (y_sec > 0))
    want_y = np.asarray(cdef_filter_plane_pallas(
        jplane, ph, pw, uys[m], uxs[m], 8, 8,
        np.where(m_pri, y_adj, 0)[m], y_sec[m],
        np.where(m_pri, dirs, 0)[m], damping, bitdepth, interpret=True))

    m2 = (y_pri | y_sec) != 0
    got_y = np.asarray(cdef_filter_plane_resident(
        jplane, dmap, vmap, ph, pw, uys[m2], uxs[m2],
        8, 8, y_pri[m2], y_sec[m2], damping, bitdepth,
        True, False, interpret=True))
    assert np.array_equal(want_y, got_y)

    # chroma (420): dirs remap through UV_DIRS_420, no adjustment
    cph, cpw = ph // 2, pw // 2
    cplane = rng.integers(0, 256, (cph, cpw)).astype(np.int32)
    jc = jnp.asarray(cplane)
    mc = (uv_pri | uv_sec) != 0
    uvdm = np.asarray(UV_DIRS_420, dtype=np.int64)
    want_c = np.asarray(cdef_filter_plane_pallas(
        jc, cph, cpw, (uys // 2)[mc], (uxs // 2)[mc], 4, 4,
        uv_pri[mc], uv_sec[mc],
        np.where(uv_pri > 0, uvdm[dirs], 0)[mc], damping - 1,
        bitdepth, interpret=True))
    got_c = np.asarray(cdef_filter_plane_resident(
        jc, dmap, vmap, cph, cpw, (uys // 2)[mc], (uxs // 2)[mc],
        4, 4, uv_pri[mc], uv_sec[mc],
        damping - 1, bitdepth, False, False, interpret=True))
    assert np.array_equal(want_c, got_c)


@pytest.mark.parametrize("w,h", [(8, 8), (4, 4)])
def test_empty_bands_pass_through(w, h):
    """Band culling (r5): steps whose unit rows carry no strength take
    the flag==0 copy path and must still equal the XLA tier exactly —
    units live only in the FIRST unit row, so every later band is
    culled."""
    import jax.numpy as jnp

    bitdepth = 8
    ph, pw = 96, 192  # Wp=256 -> OUT=32: bands 1..2 fully empty
    rng = np.random.default_rng(7 + w)
    plane = rng.integers(0, 256, (ph + 8, pw + 8)).astype(np.int32)
    n_c = pw // w
    ys = np.zeros(n_c, np.int64)
    xs = np.arange(n_c, dtype=np.int64) * w
    pri = rng.integers(1, 16, n_c).astype(np.int64)
    sec = rng.integers(0, 5, n_c).astype(np.int64)
    dirs = rng.integers(0, 8, n_c).astype(np.int64)
    damping = 5

    jplane = jnp.asarray(plane)
    ref = np.asarray(dcdef.cdef_filter_plane_dev(
        jplane, ph, pw, ys, xs, w, h, pri, sec, dirs, damping, bitdepth))
    got = np.asarray(cdef_filter_plane_pallas(
        jplane, ph, pw, ys, xs, w, h, pri, sec, dirs, damping, bitdepth,
        interpret=True))
    assert np.array_equal(ref, got)
