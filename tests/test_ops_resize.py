"""Super-res resample kernel parity: scalar golden (resize_row_ref) vs
the vectorized host kernel vs the device kernel (ops/resize.py), across
denominators, bitdepths and odd widths (reference resize_c semantics,
src/mc_tmpl.c; geometry per src/decode.c:3524-3539)."""

import numpy as np
import pytest

from dav1d_tpu.recon.mc_np import resize_row, resize_row_ref


def _geometry(in_w, out_w):
    step = ((in_w << 14) + (out_w >> 1)) // out_w
    err = out_w * step - (in_w << 14)

    def cdiv(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    mx0 = (cdiv(-((out_w - in_w) << 13) + (out_w >> 1), out_w) + 128
           - cdiv(err, 2)) & 0x3FFF
    return step, mx0


CASES = [
    # (src_w coded width incl. padding, in_w, out_w, bitdepth)
    (128, 120, 240, 8),
    (256, 255, 510, 10),
    (64, 36, 63, 12),
    (192, 177, 320, 8),
]


@pytest.mark.parametrize("src_w,in_w,out_w,bd", CASES)
def test_host_vectorized_matches_scalar(src_w, in_w, out_w, bd):
    rng = np.random.default_rng(abs(hash((src_w, out_w, bd))) % 2**32)
    rows = rng.integers(0, 1 << bd, size=(13, src_w), dtype=np.int32)
    step, mx0 = _geometry(in_w, out_w)
    want = resize_row_ref(rows, out_w, src_w, step, mx0, bd)
    got = resize_row(rows, out_w, src_w, step, mx0, bd)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("src_w,in_w,out_w,bd", CASES)
def test_device_matches_scalar(src_w, in_w, out_w, bd):
    from dav1d_tpu.ops.resize import resize_rows

    rng = np.random.default_rng(abs(hash((out_w, src_w, bd))) % 2**32)
    rows = rng.integers(0, 1 << bd, size=(9, src_w), dtype=np.int32)
    step, mx0 = _geometry(in_w, out_w)
    want = resize_row_ref(rows, out_w, src_w, step, mx0, bd)
    got = np.asarray(resize_rows(rows, out_w, src_w, step, mx0, bd))
    np.testing.assert_array_equal(got, want)
