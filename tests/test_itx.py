"""Inverse transform equivalence: numpy/python itx_add vs the reference
DSP table (oracle via ctypes) over all rect sizes x transform types,
full and partial eob, 8/10-bit."""

import ctypes

import numpy as np
import pytest

from dav1d_tpu import tables
from dav1d_tpu.levels import TxfmType as T, N_RECT_TX_SIZES
from dav1d_tpu.recon.itx import itx_add

N_TXTP_PLUS_LL = 17

# valid transform types per rect size (reference itx_tmpl.c assign macros)
ALL16 = list(range(16))
T12 = [T.DCT_DCT, T.ADST_DCT, T.DCT_ADST, T.ADST_ADST, T.FLIPADST_DCT,
       T.DCT_FLIPADST, T.FLIPADST_FLIPADST, T.ADST_FLIPADST, T.FLIPADST_ADST,
       T.IDTX, T.V_DCT, T.H_DCT]
T2 = [T.DCT_DCT, T.IDTX]
T1 = [T.DCT_DCT]
VALID_TXTP = {
    0: ALL16 + [16], 1: ALL16, 2: T12, 3: T2, 4: T1,  # 4x4..64x64
    5: ALL16, 6: ALL16, 7: ALL16, 8: ALL16,  # 4x8, 8x4, 8x16, 16x8
    9: T2, 10: T2, 11: T1, 12: T1,  # 16x32, 32x16, 32x64, 64x32
    13: ALL16, 14: ALL16, 15: T2, 16: T2, 17: T1, 18: T1,
}


@pytest.fixture(scope="module")
def dsp(oracle):
    lib = ctypes.CDLL(str(oracle.parent / "libdav1d.so"))

    class Ctx(ctypes.Structure):
        _fields_ = [("itxfm_add",
                     (ctypes.c_void_p * N_TXTP_PLUS_LL) * N_RECT_TX_SIZES)]

    out = {}
    for bd, suffix in [(8, "8bpc"), (16, "16bpc")]:
        c = Ctx()
        fn = getattr(lib, f"dav1d_itx_dsp_init_{suffix}")
        fn.argtypes = [ctypes.POINTER(Ctx), ctypes.c_int]
        fn(ctypes.byref(c), 10)
        out[bd] = c
    return out


def _ref_itx(dsp, bitdepth, tx, txtp, dst, cf, eob):
    c = dsp[8 if bitdepth == 8 else 16]
    if bitdepth == 8:
        proto = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_ssize_t,
                                 ctypes.c_void_p, ctypes.c_int)
        dst_px = dst.astype(np.uint8)
        cf_px = cf.astype(np.int16)
    else:
        proto = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_ssize_t,
                                 ctypes.c_void_p, ctypes.c_int, ctypes.c_int)
        dst_px = dst.astype(np.uint16)
        cf_px = cf.astype(np.int32)
    fn = proto(c.itxfm_add[tx][txtp])
    args = [dst_px.ctypes.data, dst_px.strides[0], cf_px.ctypes.data,
            int(eob)]
    if bitdepth != 8:
        args.append((1 << bitdepth) - 1)
    fn(*args)
    return dst_px.astype(np.int32)


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_itx_all(dsp, bitdepth):
    rng = np.random.default_rng(11)
    maxp = (1 << bitdepth) - 1
    cf_lim = 4096
    for tx in range(N_RECT_TX_SIZES):
        ti = tables.txfm_info()[tx]
        w, h = 4 * int(ti[0]), 4 * int(ti[1])
        sw, sh = min(w, 32), min(h, 32)
        for txtp in VALID_TXTP[tx]:
            for kind in ("full", "dconly", "partial"):
                if kind == "dconly" and txtp != T.DCT_DCT:
                    continue
                cf = np.zeros(sw * sh, dtype=np.int64)
                if kind == "full":
                    cf[:] = rng.integers(-cf_lim, cf_lim, size=sw * sh)
                    eob = sw * sh - 1
                elif kind == "dconly":
                    cf[0] = rng.integers(-cf_lim, cf_lim)
                    eob = 0
                else:
                    # nonzero only at scan positions <= eob
                    eob = int(rng.integers(1, sw * sh))
                    if txtp >= 16 or tables.tx_type_class[txtp] != 0:
                        continue  # non-2D classes order coefficients
                        # differently; covered by the full-eob case
                    scan = tables.scans()[tx]
                    idx = scan[: eob + 1]
                    cf[idx] = rng.integers(-cf_lim, cf_lim, size=len(idx))
                dst = rng.integers(0, maxp + 1, size=(h, w)).astype(np.int32)

                want = _ref_itx(dsp, bitdepth, tx, txtp, dst, cf, eob)
                mine = dst.copy()
                itx_add(mine, 0, 0, tx, T(txtp) if txtp < 17 else txtp,
                        cf, eob, bitdepth)
                np.testing.assert_array_equal(
                    mine, want,
                    err_msg=f"tx={tx} txtp={txtp} {w}x{h} bd={bitdepth} {kind}")
