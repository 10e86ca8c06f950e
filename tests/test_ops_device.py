"""checkasm-style parity for the device deblock / loop-restoration /
film-grain kernels vs their host golden models (SURVEY §4 tier 1)."""

import numpy as np
import pytest


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("wd", [4, 6, 8, 16])
@pytest.mark.parametrize("along_rows", [True, False])
def test_device_deblock_matches_host(bitdepth, wd, along_rows):
    from dav1d_tpu.ops.lf import loop_filter_batch
    from dav1d_tpu.recon.lf import _loop_filter_batch, calc_eih

    rng = np.random.default_rng(wd * 131 + bitdepth + along_rows)
    plane = rng.integers(0, 1 << bitdepth, (128, 160), dtype=np.int32)
    # mostly-smooth regions so the flat/hev branches all trigger
    plane[32:96, 32:128] = plane[32, 32]
    plane[40:80, 40:120] += rng.integers(-2, 3, (40, 80), dtype=np.int32)
    plane = np.clip(plane, 0, (1 << bitdepth) - 1).astype(np.int32)

    # edge positions: along the tap axis edges are spaced by the width
    # class's transform size (the geometry the decoder guarantees); along
    # the line axis segments are 4px cells
    tap_step4 = wd // 4 if wd != 6 else 2  # 4x4 cells between edges
    base4 = 8 if wd == 16 else 4
    if along_rows:
        ys4 = np.arange(2, 28, 1)
        xs4 = base4 + (np.arange(len(ys4)) % 4) * tap_step4 * 2
    else:
        xs4 = np.arange(2, 36, 1)
        ys4 = base4 + (np.arange(len(xs4)) % 3) * tap_step4 * 2
    n = min(len(ys4), len(xs4))
    ys = (ys4[:n] * 4).astype(np.int64)
    xs = (xs4[:n] * 4).astype(np.int64)
    reach = {4: 8, 6: 12, 8: 16, 16: 28}[wd]
    if along_rows:  # vertical edge: taps horizontal, lines vertical
        assert ys.max() + 4 <= plane.shape[0]
        assert reach <= xs.min() and xs.max() + reach < plane.shape[1]
    else:
        assert xs.max() + 4 <= plane.shape[1]
        assert reach <= ys.min() and ys.max() + reach < plane.shape[0]
    e_lut, i_lut = calc_eih(2)
    L = rng.integers(1, 64, n)
    E = e_lut[L].astype(np.int64)
    I = i_lut[L].astype(np.int64)
    H = (L >> 4).astype(np.int64)

    want = plane.copy()
    _loop_filter_batch(want, ys, xs, E, I, H, along_rows, wd, bitdepth)
    got = np.asarray(loop_filter_batch(plane.copy(), ys, xs, E, I, H,
                                       along_rows, wd, bitdepth))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("uw,sh", [(64, 64), (32, 16), (128, 8)])
def test_device_wiener_matches_host(bitdepth, uw, sh):
    from dav1d_tpu.ops.lr import wiener_batch
    from dav1d_tpu.recon.lr_apply import _wiener

    rng = np.random.default_rng(uw + sh + bitdepth)
    B = 5
    P = rng.integers(0, 1 << bitdepth, (B, sh + 6, uw + 6), dtype=np.int64)
    fh = rng.integers(-5, 6, (B, 3))
    fv = rng.integers(-5, 6, (B, 3))
    got = wiener_batch(P, fh, fv, bitdepth)
    for b in range(B):
        want = _wiener(P[b], list(fh[b]), list(fv[b]), uw, sh, bitdepth)
        np.testing.assert_array_equal(got[b], want, err_msg=f"unit {b}")


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_device_filmgrain_apply_matches_host(bitdepth):
    from dav1d_tpu.ops.fg import fg_apply_batch
    from dav1d_tpu.recon.filmgrain import _round2_arr

    rng = np.random.default_rng(bitdepth)
    h, w = 96, 160
    src = rng.integers(0, 1 << bitdepth, (h, w), dtype=np.int64)
    grain_ctr = 128 << (bitdepth - 8)
    grain = rng.integers(-grain_ctr, grain_ctr, (h, w), dtype=np.int64)
    lut = rng.integers(0, 256, 1 << bitdepth, dtype=np.int64)
    shift = 8
    minv, maxv = 16 << (bitdepth - 8), 235 << (bitdepth - 8)

    noise = _round2_arr(lut[src] * grain, shift)
    want = np.clip(src + noise, minv, maxv)
    got = fg_apply_batch(src, grain, lut, shift, minv, maxv)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("sgr_idx,variant",
                         [(0, 2), (14, 0), (10, 1)])  # mix, 5x5, 3x3
def test_device_sgr_matches_host(bitdepth, sgr_idx, variant):
    """Int32 split-multiply SGR device kernel vs the int64 host golden
    (ops/lr.py sgr_batch vs recon/lr_apply.py _sgr)."""
    from dav1d_tpu import tables
    from dav1d_tpu.ops.lr import sgr_batch
    from dav1d_tpu.recon.lr_apply import _sgr

    s0 = int(tables.sgr_params[sgr_idx][0])
    s1 = int(tables.sgr_params[sgr_idx][1])
    assert (2 if (s0 and s1) else (0 if s0 else 1)) == variant
    rng = np.random.default_rng(sgr_idx * 31 + bitdepth)
    B, uw, sh = 4, 64, 32
    # extreme pixels maximize the split-multiply operands
    P = rng.choice(
        np.array([0, 1, (1 << bitdepth) - 2, (1 << bitdepth) - 1]),
        size=(B, sh + 6, uw + 6)).astype(np.int64)
    src = P[:, 3 : 3 + sh, 3 : 3 + uw].copy()
    w0 = rng.integers(-96, 128, B)
    w1r = rng.integers(-32, 96, B)
    got = sgr_batch(P, src, [s0] * B, [s1] * B, w0,
                    128 - (w0 + w1r), bitdepth, variant)
    for b in range(B):
        lr = {"type": np.int16(int(RT_SGRPROJ) + sgr_idx),
              "sgr_weights": np.array([w0[b], w1r[b]], dtype=np.int16)}
        want = _sgr(P[b], src[b], lr, uw, sh, bitdepth)
        np.testing.assert_array_equal(got[b], want, err_msg=f"unit {b}")


from dav1d_tpu.headers import RestorationType as _RT  # noqa: E402

RT_SGRPROJ = int(_RT.SGRPROJ)
