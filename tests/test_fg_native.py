"""Native film grain (native/fg.c) vs the Python reference
(recon/filmgrain.py): randomized parameter sweeps over layouts,
bitdepths, AR lags, overlap, csfl and clipping, on odd-sized frames.
The Python path is itself oracle-parity-tested (tests/test_e2e_aom.py
denoise cases), so byte equality here pins the C port."""

import numpy as np
import pytest

from dav1d_tpu.headers import (FilmGrainData, FilmGrainInfo, FrameHeader,
                               PixelLayout, SequenceHeader)
from dav1d_tpu.recon import filmgrain as fg


class _Pic:
    def __init__(self, planes, w, h, layout, bitdepth, data, mtrx=2):
        self.planes = planes
        self.width = w
        self.height = h
        self.layout = layout
        self.bitdepth = bitdepth
        self.frame_hdr = FrameHeader()
        self.frame_hdr.film_grain = FilmGrainInfo()
        self.frame_hdr.film_grain.data = data
        self.seq_hdr = SequenceHeader()
        self.seq_hdr.mtrx = mtrx


def _rand_data(rng, *, lag, overlap, csfl, clip, num_y, num_uv):
    d = FilmGrainData()
    d.seed = int(rng.integers(0, 1 << 16))
    d.num_y_points = num_y
    xs = sorted(rng.choice(np.arange(0, 256), num_y, replace=False)
                .tolist()) if num_y else []
    d.y_points = [(int(x), int(rng.integers(0, 256))) for x in xs]
    d.chroma_scaling_from_luma = csfl
    d.num_uv_points = [0 if csfl else num_uv[0], 0 if csfl else num_uv[1]]
    d.uv_points = []
    for uv in range(2):
        n = d.num_uv_points[uv]
        xs = sorted(rng.choice(np.arange(0, 256), n, replace=False)
                    .tolist()) if n else []
        d.uv_points.append([(int(x), int(rng.integers(0, 256)))
                            for x in xs])
    d.scaling_shift = int(rng.integers(8, 12))
    d.ar_coeff_lag = lag
    n_y = 2 * lag * (lag + 1)
    d.ar_coeffs_y = rng.integers(-128, 128, n_y).tolist()
    d.ar_coeffs_uv = [rng.integers(-128, 128, n_y + 1).tolist()
                      for _ in range(2)]
    d.ar_coeff_shift = int(rng.integers(6, 10))
    d.grain_scale_shift = int(rng.integers(0, 3))
    d.uv_mult = rng.integers(-128, 128, 2).tolist()
    d.uv_luma_mult = rng.integers(-128, 128, 2).tolist()
    d.uv_offset = rng.integers(-256, 256, 2).tolist()
    d.overlap_flag = overlap
    d.clip_to_restricted_range = clip
    return d


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("layout", [PixelLayout.I420, PixelLayout.I422,
                                    PixelLayout.I444, PixelLayout.I400])
def test_fg_native_parity(layout, bitdepth):
    from dav1d_tpu.native import lib
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(bitdepth * 31 + int(layout))
    w, h = 131, 77  # odd dims exercise the edge clamps
    ss_y = int(layout == PixelLayout.I420)
    ss_x = int(layout != PixelLayout.I444)
    has_chroma = layout != PixelLayout.I400
    maxv = (1 << bitdepth) - 1

    for case in range(6):
        lag = int(rng.integers(0, 4))
        d = _rand_data(
            rng, lag=lag, overlap=int(rng.integers(0, 2)),
            csfl=int(case == 3), clip=int(rng.integers(0, 2)),
            num_y=(0 if case == 4 else int(rng.integers(2, 15))),
            num_uv=[int(rng.integers(0, 11)), int(rng.integers(0, 11))])
        planes = [np.ascontiguousarray(
            rng.integers(0, maxv + 1, (h, w)), dtype=np.int32)]
        if has_chroma:
            cw, ch = (w + ss_x) >> ss_x, (h + ss_y) >> ss_y
            planes += [np.ascontiguousarray(
                rng.integers(0, maxv + 1, (ch, cw)), dtype=np.int32)
                for _ in range(2)]
        pic_py = _Pic([p.copy() for p in planes], w, h, layout, bitdepth,
                      d, mtrx=int(rng.integers(0, 2)) * 2)
        pic_c = _Pic([p.copy() for p in planes], w, h, layout, bitdepth,
                     d, mtrx=pic_py.seq_hdr.mtrx)

        # Python reference path (native gated off)
        import dav1d_tpu.recon.filmgrain as fgmod
        orig = fgmod._apply_grain_native
        fgmod._apply_grain_native = lambda pic: False
        try:
            fg.apply_grain(pic_py)
        finally:
            fgmod._apply_grain_native = orig
        assert fgmod._apply_grain_native(pic_c)

        for pl in range(len(planes)):
            np.testing.assert_array_equal(
                pic_c.planes[pl], pic_py.planes[pl],
                err_msg=f"case={case} layout={layout} bd={bitdepth} "
                        f"pl={pl} lag={lag}")


def test_scaling_segments_exact():
    """The closed-form piecewise device evaluation reproduces
    generate_scaling exactly for every LUT index, bitdepth, and point
    count (ops/fg.scaling_segments + _jit_apply_pw)."""
    import jax.numpy as jnp
    import numpy as np

    from dav1d_tpu.ops.fg import _jit_apply_pw, scaling_segments
    from dav1d_tpu.recon.filmgrain import generate_scaling

    rng = np.random.default_rng(3)
    shift = 8
    for bitdepth in (8, 10, 12):
        for num in (0, 1, 2, 5, 14):
            xs = np.sort(rng.choice(255, num, replace=False)) if num \
                else np.zeros(0)
            pts = [(int(x), int(rng.integers(0, 256))) for x in xs]
            lut = generate_scaling(bitdepth, pts, num)
            size = 1 << bitdepth
            idx = np.arange(size, dtype=np.int32)
            src = np.zeros(size, np.int32)
            grain = np.full(size, 1 << shift, np.int32)
            bx, by, dl = scaling_segments(pts, num)
            fn = _jit_apply_pw(shift, -(1 << 30), 1 << 30, bitdepth - 8)
            got = np.asarray(fn(jnp.asarray(src), jnp.asarray(idx),
                                jnp.asarray(grain), jnp.asarray(bx),
                                jnp.asarray(by), jnp.asarray(dl)))
            assert np.array_equal(got, lut), (bitdepth, num, pts)
