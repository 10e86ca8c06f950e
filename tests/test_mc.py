"""checkasm-style test for the batched MC subpel kernel: exact NumPy model
(transcribing reference put_8tap_c semantics, src/mc_tmpl.c:130-180) vs the
fused JAX kernel, across block sizes and bitdepths."""

import numpy as np
import pytest

from dav1d_tpu.ops import mc

IDENTITY = np.array([0, 0, 0, 64, 0, 0, 0, 0], dtype=np.int32)


def ref_put_8tap(src, fh, fv, w, h, bitdepth, mx, my):
    """Scalar model with the reference's per-path rounding (H+V, H-only,
    V-only, copy selected by mx/my)."""
    ib = 4 if bitdepth == 8 else 14 - bitdepth
    out = np.zeros((h, w), dtype=np.int64)
    maxp = (1 << bitdepth) - 1
    s64 = src.astype(np.int64)
    if mx and my:
        mid = np.zeros((h + 7, w), dtype=np.int64)
        for y in range(h + 7):
            for x in range(w):
                acc = sum(int(fh[t]) * int(s64[y, x + t]) for t in range(8))
                mid[y, x] = (acc + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
        for y in range(h):
            for x in range(w):
                acc = sum(int(fv[t]) * int(mid[y + t, x]) for t in range(8))
                out[y, x] = (acc + ((1 << (6 + ib)) >> 1)) >> (6 + ib)
    elif mx:
        rnd = 32 + ((1 << (6 - ib)) >> 1)
        for y in range(h):
            for x in range(w):
                acc = sum(int(fh[t]) * int(s64[y + 3, x + t]) for t in range(8))
                out[y, x] = (acc + rnd) >> 6
    elif my:
        for y in range(h):
            for x in range(w):
                acc = sum(int(fv[t]) * int(s64[y + t, x + 3]) for t in range(8))
                out[y, x] = (acc + 32) >> 6
    else:
        out = s64[3 : 3 + h, 3 : 3 + w].copy()
    return np.clip(out, 0, maxp)


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 8), (8, 32)])
def test_put_8tap_matches_model(bitdepth, w, h):
    rng = np.random.default_rng(42)
    n = 8
    maxp = (1 << bitdepth) - 1
    src = rng.integers(0, maxp + 1, size=(n, h + 7, w + 7)).astype(np.int32)
    # Random legal 8-tap filters (sum 64, taps in int8 range like the spec's).
    fhs, fvs, mxs, mys = [], [], [], []
    for i in range(n):
        mx = int(rng.integers(0, 16))
        my = int(rng.integers(0, 16))
        fh = rng.integers(-20, 40, size=8).astype(np.int32) if mx else IDENTITY
        fv = rng.integers(-20, 40, size=8).astype(np.int32) if my else IDENTITY
        if mx:
            fh[3] += 64 - fh.sum()
        if my:
            fv[3] += 64 - fv.sum()
        fhs.append(fh)
        fvs.append(fv)
        mxs.append(mx)
        mys.append(my)
    fhs = np.stack(fhs)
    fvs = np.stack(fvs)

    got = np.asarray(
        mc.put_8tap(src, fhs, fvs, w=w, h=h, bitdepth=bitdepth)
    )
    for i in range(n):
        want = ref_put_8tap(src[i], fhs[i], fvs[i], w, h, bitdepth, mxs[i], mys[i])
        np.testing.assert_array_equal(got[i], want, err_msg=f"block {i}")


def test_avg_and_masks():
    rng = np.random.default_rng(1)
    for bitdepth in (8, 10):
        ib = 4 if bitdepth == 8 else 14 - bitdepth
        bias = 0 if bitdepth == 8 else 8192
        t1 = rng.integers(-5000, 9000, size=(2, 8, 8)).astype(np.int32)
        t2 = rng.integers(-5000, 9000, size=(2, 8, 8)).astype(np.int32)
        m = rng.integers(0, 65, size=(2, 8, 8)).astype(np.int32)
        got = np.asarray(mc.avg(t1, t2, bitdepth=bitdepth))
        want = np.clip(
            (t1.astype(np.int64) + t2 + (1 << ib) + bias * 2) >> (ib + 1),
            0,
            (1 << bitdepth) - 1,
        )
        np.testing.assert_array_equal(got, want)
        got = np.asarray(mc.w_avg(t1, t2, np.int32(9), bitdepth=bitdepth))
        want = np.clip(
            (t1.astype(np.int64) * 9 + t2 * 7 + (8 << ib) + bias * 16) >> (ib + 4),
            0,
            (1 << bitdepth) - 1,
        )
        np.testing.assert_array_equal(got, want)
        got = np.asarray(mc.mask(t1, t2, m, bitdepth=bitdepth))
        want = np.clip(
            (t1.astype(np.int64) * m + t2 * (64 - m) + (32 << ib) + bias * 64)
            >> (ib + 6),
            0,
            (1 << bitdepth) - 1,
        )
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
def test_put_bilin_scaled_unity_matches_bilin(bitdepth):
    """At unit step (dx=dy=1024) the scaled bilinear kernel must reduce
    to the plain bilinear kernel at the same 4-bit phase (the plain
    kernel is oracle-validated e2e)."""
    from dav1d_tpu.recon import mc_np

    rng = np.random.default_rng(7)
    vw, vh = 48, 40
    plane = rng.integers(0, 1 << bitdepth, (vh, vw), dtype=np.int32)
    for mx4, my4 in [(0, 0), (5, 0), (0, 9), (7, 3), (15, 15)]:
        for prep in (False, True):
            got = mc_np.put_bilin_scaled(
                plane, vw, vh, 4, 6, 16, 8, mx4 << 6, my4 << 6,
                1024, 1024, bitdepth, prep=prep)
            if prep:
                want = mc_np.prep_bilin(plane, vw, vh, 4, 6, 16, 8,
                                        mx4, my4, bitdepth)
            else:
                want = mc_np.put_bilin(plane, vw, vh, 4, 6, 16, 8,
                                       mx4, my4, bitdepth)
            np.testing.assert_array_equal(got, want, err_msg=(
                f"bd={bitdepth} mx={mx4} my={my4} prep={prep}"))


def test_put_bilin_scaled_downscale_positions():
    """Non-unit step: source column positions must match the 8-tap scaled
    kernel's stepping (same 10-bit phase accumulator). With an identity
    2-tap (phase 0 at every tap) the output is the nearest-sample gather
    the accumulator implies."""
    from dav1d_tpu.recon import mc_np

    rng = np.random.default_rng(3)
    vw, vh = 64, 48
    plane = rng.integers(0, 256, (vh, vw), dtype=np.int32)
    w, h = 8, 8
    dx = dy = 2048  # 2x downscale, phase stays 0
    got = mc_np.put_bilin_scaled(plane, vw, vh, 2, 2, w, h, 0, 0,
                                 dx, dy, 8)
    ys = 2 + 2 * np.arange(h)
    xs = 2 + 2 * np.arange(w)
    np.testing.assert_array_equal(got, plane[np.ix_(ys, xs)])


def _scalar_8tap_scaled(plane, vw, vh, top, left, w, h, mx, my, dx, dy,
                        ftype, bitdepth, prep):
    """Reference-shaped scalar loop (the r4 implementation, kept as the
    golden model for the r5 vectorized put_8tap_scaled)."""
    from dav1d_tpu import tables
    from dav1d_tpu.recon.mc_np import _intermediate_bits, get_window

    ib = _intermediate_bits(bitdepth)
    tbl = tables.mc_subpel_filters
    ioffs = np.empty(w, dtype=np.int64)
    fh_idx = np.empty(w, dtype=np.int64)
    imx, ioff = mx, 0
    for x in range(w):
        fh_idx[x] = imx >> 6
        ioffs[x] = ioff
        imx += dx
        ioff += imx >> 10
        imx &= 0x3FF
    max_src_y = (my + (h - 1) * dy) >> 10
    n_rows = max_src_y + 8
    win = get_window(plane, vw, vh, top - 3, left - 3,
                     n_rows, int(ioffs[-1]) + 8)
    mid = np.empty((n_rows, w), dtype=np.int64)
    rnd_h = (1 << (6 - ib)) >> 1
    for x in range(w):
        sub = int(fh_idx[x])
        col = int(ioffs[x])
        if sub == 0:
            mid[:, x] = win[:, col + 3].astype(np.int64) << ib
        else:
            fh = (tbl[ftype & 3][sub - 1] if w > 4
                  else tbl[3 + (ftype & 1)][sub - 1]).astype(np.int64)
            mid[:, x] = (win[:, col:col + 8] @ fh + rnd_h) >> (6 - ib)
    out = np.empty((h, w), dtype=np.int64)
    irnd = (1 << ib) >> 1
    rnd_v = (1 << (6 + ib)) >> 1
    bias = 0 if bitdepth == 8 else 8192
    for y in range(h):
        myy = my + y * dy
        src_y = myy >> 10
        sub = (myy & 0x3FF) >> 6
        if sub == 0:
            row = mid[src_y + 3]
            out[y] = (row - bias) if prep else np.clip(
                (row + irnd) >> ib, 0, (1 << bitdepth) - 1)
        else:
            fv = (tbl[ftype >> 2][sub - 1] if h > 4
                  else tbl[3 + ((ftype >> 2) & 1)][sub - 1]) \
                .astype(np.int64)
            acc = fv @ mid[src_y:src_y + 8]
            out[y] = (((acc + 32) >> 6) - bias) if prep else np.clip(
                (acc + rnd_v) >> (6 + ib), 0, (1 << bitdepth) - 1)
    return out.astype(np.int32)


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
def test_put_8tap_scaled_vectorized_matches_scalar(bitdepth):
    """r5: the vectorized put_8tap_scaled must equal the scalar
    reference loop for randomized scale steps, phases and block
    geometries (incl. sub==0 rows/columns and the w<=4 filter table)."""
    from dav1d_tpu.recon import mc_np

    rng = np.random.default_rng(11 * bitdepth)
    vw, vh = 96, 80
    plane = rng.integers(0, 1 << bitdepth, (vh, vw), dtype=np.int32)
    cases = [
        (16, 8, 0, 0, 1024, 1024, 0),       # unity, zero phase
        (16, 16, 320, 192, 1433, 1433, 0),  # ~0.7x downscale
        (8, 4, 64, 0, 2048, 1024, 2),       # 2x horizontal only
        (4, 8, 960, 640, 3072, 2900, 1),    # w<=4 filter table
        (32, 16, 512, 512, 1100, 2048, 3),
        (16, 8, 0, 448, 1024, 1500, 2),     # sub==0 columns
    ]
    for w, h, mx, my, dx, dy, ftype in cases:
        for prep in (False, True):
            got = mc_np.put_8tap_scaled(plane, vw, vh, 6, 5, w, h,
                                        mx, my, dx, dy, ftype,
                                        bitdepth, prep=prep)
            want = _scalar_8tap_scaled(plane, vw, vh, 6, 5, w, h,
                                       mx, my, dx, dy, ftype,
                                       bitdepth, prep)
            np.testing.assert_array_equal(got, want, err_msg=(
                f"bd={bitdepth} w={w} h={h} mx={mx} my={my} "
                f"dx={dx} dy={dy} ft={ftype} prep={prep}"))
