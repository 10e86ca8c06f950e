"""checkasm-style intra prediction tests: numpy kernels vs the reference DSP
table (oracle libdav1d via ctypes), all modes, random edges, 8/10-bit,
with and without edge-filter/smooth flags."""

import ctypes

import numpy as np
import pytest

from dav1d_tpu.recon import ipred
from dav1d_tpu.levels import IntraPredMode as M

N_IMPL_MODES = 14


@pytest.fixture(scope="module")
def dsp(oracle):
    lib = ctypes.CDLL(str(oracle.parent / "libdav1d.so"))

    class Ctx(ctypes.Structure):
        _fields_ = [
            ("intra_pred", ctypes.c_void_p * N_IMPL_MODES),
            ("cfl_ac", ctypes.c_void_p * 3),
            ("cfl_pred", ctypes.c_void_p * 6),
            ("pal_pred", ctypes.c_void_p),
        ]

    out = {}
    for bd, suffix in [(8, "8bpc"), (16, "16bpc")]:
        c = Ctx()
        getattr(lib, f"dav1d_intra_pred_dsp_init_{suffix}")(ctypes.byref(c))
        out[bd] = c
    return out


def _call_ref(dsp, bitdepth, mode, edge, ofs, w, h, angle, max_w, max_h):
    c = dsp[8 if bitdepth == 8 else 16]
    if bitdepth == 8:
        proto = ctypes.CFUNCTYPE(
            None, ctypes.c_void_p, ctypes.c_ssize_t, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int)
        dst = np.zeros((h, w), dtype=np.uint8)
        edge_px = edge.astype(np.uint8)
    else:
        proto = ctypes.CFUNCTYPE(
            None, ctypes.c_void_p, ctypes.c_ssize_t, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int)
        dst = np.zeros((h, w), dtype=np.uint16)
        edge_px = edge.astype(np.uint16)
    fn = proto(c.intra_pred[mode])
    args = [dst.ctypes.data, dst.strides[0],
            edge_px.ctypes.data + ofs * edge_px.itemsize,
            w, h, angle, max_w, max_h]
    if bitdepth != 8:
        args.append((1 << bitdepth) - 1)
    fn(*args)
    return dst.astype(np.int32)


SIZES = [(4, 4), (8, 8), (16, 16), (4, 16), (32, 8), (64, 64), (8, 32)]


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_ipred_all_modes(dsp, bitdepth):
    rng = np.random.default_rng(3)
    maxp = (1 << bitdepth) - 1
    for mode in range(N_IMPL_MODES):
        for w, h in SIZES:
            if mode == M.FILTER_PRED and (w > 32 or h > 32):
                continue
            for trial in range(3):
                edge = rng.integers(0, maxp + 1, size=257).astype(np.int32)
                ofs = 128
                # legal angles are base +/- 3*delta, delta in [-3,3]
                # (see prepare_intra_edges); bases: 45,67,90,113,135,157,180,203
                delta = 3 * int(rng.integers(-3, 4))
                if mode == M.Z1_PRED:
                    angle = int(rng.choice([45, 67])) + delta
                    if angle >= 90:
                        angle = 87
                elif mode == M.Z2_PRED:
                    angle = int(rng.choice([113, 135, 157])) + delta
                elif mode == M.Z3_PRED:
                    angle = int(rng.choice([203])) + delta
                    if angle <= 180:
                        angle = 194
                elif mode == M.FILTER_PRED:
                    angle = int(rng.integers(0, 5))
                else:
                    angle = 0
                if mode in (M.Z1_PRED, M.Z2_PRED, M.Z3_PRED):
                    angle |= int(rng.integers(0, 2)) << 9   # smooth flag
                    angle |= int(rng.integers(0, 2)) << 10  # edge filter
                max_w, max_h = w, h
                want = _call_ref(dsp, bitdepth, mode, edge, ofs, w, h,
                                 angle, max_w, max_h)
                got = ipred.ipred(mode, edge, ofs, w, h, angle, max_w, max_h,
                                  bitdepth)
                np.testing.assert_array_equal(
                    got, want,
                    err_msg=f"mode={mode} {w}x{h} bd={bitdepth} "
                            f"angle={angle} trial={trial}")
