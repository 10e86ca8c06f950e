"""Parity of the native-C batched inverse transforms (generated 1-D
kernels, native/itx.c + itx1d_gen.h) against the Python golden batch."""

import numpy as np
import pytest

from dav1d_tpu.levels import TxfmType
from dav1d_tpu.ops.itx import _txinfo, itx_batch_c, itx_batch_np
from dav1d_tpu.recon.itx import TX1D_TYPES


def _legal_txtps(tx):
    w, h, lw, lh = _txinfo(tx)
    out = []
    for t, (rt, ct) in TX1D_TYPES.items():
        if (rt in (1, 2) and w > 16) or (ct in (1, 2) and h > 16):
            continue  # ADST caps at 16
        if (rt == 3 and w > 32) or (ct == 3 and h > 32):
            continue  # identity caps at 32
        out.append(int(t))
    return out


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("tx", range(19))
def test_native_itx_matches_python(tx, bitdepth):
    if itx_batch_c(np.zeros((1, 16), np.int32), 0, 0, 8) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(tx * 31 + bitdepth)
    w, h, _, _ = _txinfo(tx)
    sw, sh = min(w, 32), min(h, 32)
    lim = 1 << (bitdepth + 7)  # the dequant clamp cf_max (recon/coef.py:421)
    for txtp in _legal_txtps(tx):
        cf = rng.integers(-lim, lim, (9, sw * sh), dtype=np.int32)
        want = itx_batch_np(cf, tx, txtp, bitdepth)
        got = itx_batch_c(cf, tx, txtp, bitdepth)
        np.testing.assert_array_equal(
            got, want, err_msg=f"tx={tx} txtp={txtp} bd={bitdepth}")


def test_native_itx_wht():
    if itx_batch_c(np.zeros((1, 16), np.int32), 0, 0, 8) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    cf = rng.integers(-4000, 4000, (7, 16), dtype=np.int32)
    want = itx_batch_np(cf, 0, int(TxfmType.WHT_WHT), 8)
    got = itx_batch_c(cf, 0, int(TxfmType.WHT_WHT), 8)
    np.testing.assert_array_equal(got, want)


def test_itx_batch_ptrs_parity():
    """Pointer-array form (blocks fed straight from the capture arena)
    matches the contiguous native batch on every legal (tx, txtp)."""
    import numpy as np
    from dav1d_tpu.ops.itx import itx_batch_c, itx_batch_c_list, _txinfo
    from dav1d_tpu.recon.itx import TX1D_TYPES, _1D_FNS
    from dav1d_tpu.levels import TxfmType

    rng = np.random.default_rng(0)
    for tx in range(19):
        w, h, lw, lh = _txinfo(tx)
        sw, sh = min(w, 32), min(h, 32)
        for txtp, (rt, ct) in TX1D_TYPES.items():
            if (lw, rt) not in _1D_FNS or (lh, ct) not in _1D_FNS:
                continue
            for bd in (8, 10):
                cfs = rng.integers(-(1 << 12), 1 << 12,
                                   size=(7, sw * sh)).astype(np.int32)
                a = itx_batch_c(cfs, tx, txtp, bd)
                b = itx_batch_c_list(list(cfs), tx, txtp, bd)
                assert np.array_equal(a, b), (tx, txtp, bd)
    cfs = rng.integers(-(1 << 10), 1 << 10, size=(5, 16)).astype(np.int32)
    assert np.array_equal(itx_batch_c(cfs, 0, TxfmType.WHT_WHT, 8),
                          itx_batch_c_list(list(cfs), 0, TxfmType.WHT_WHT, 8))


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("tx", range(19))
def test_native_itx_sparse_subkernels(tx, bitdepth):
    """eob-gated sub-kernel variants: coefficient patterns whose nonzero
    support is bounded at each power-of-two (per axis, independently)
    must match the dense Python golden batch.  This drives every
    generated _k{K} row/col variant plus the all-zero early-out."""
    if itx_batch_c(np.zeros((1, 16), np.int32), 0, 0, 8) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(tx * 131 + bitdepth)
    w, h, _, _ = _txinfo(tx)
    sw, sh = min(w, 32), min(h, 32)
    lim = 1 << (bitdepth + 7)  # the dequant clamp cf_max (recon/coef.py:421)
    xb = [b for b in (1, 2, 4, 8, 16, 32) if b <= sw]
    yb = [b for b in (1, 2, 4, 8, 16, 32) if b <= sh]
    for txtp in _legal_txtps(tx):
        blocks = []
        for bx in xb:
            for by in yb:
                blk = np.zeros((sw, sh), dtype=np.int32)
                blk[:bx, :by] = rng.integers(-lim, lim, (bx, by))
                # force the exact bound so the variant choice is pinned
                blk[bx - 1, by - 1] = lim - 1
                blocks.append(blk.reshape(-1))
        blocks.append(np.zeros(sw * sh, dtype=np.int32))  # all-zero lane
        cf = np.stack(blocks)
        want = itx_batch_np(cf, tx, txtp, bitdepth)
        got = itx_batch_c(cf, tx, txtp, bitdepth)
        np.testing.assert_array_equal(
            got, want, err_msg=f"tx={tx} txtp={txtp} bd={bitdepth}")


@pytest.mark.parametrize("bitdepth", [8, 10, 12])
@pytest.mark.parametrize("tx", range(19))
def test_native_itx_eob_bounds(tx, bitdepth):
    """The eob-bounded pointer path (scan-derived per-block coefficient
    bounds + the flat DC-only shortcut) must match the dense golden
    batch: random blocks truncated at random scan eobs, plus DC-only
    blocks at extreme magnitudes (clip-path coverage) and an all-zero
    lane, for every TWO_D-class txtp."""
    from dav1d_tpu import tables
    from dav1d_tpu.ops.itx import itx_batch_c_ptrs, scan_bounds_lut

    if itx_batch_c(np.zeros((1, 16), np.int32), 0, 0, 8) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(tx * 977 + bitdepth)
    w, h, _, _ = _txinfo(tx)
    sw, sh = min(w, 32), min(h, 32)
    n_coef = sw * sh
    scan = tables.scans()[tx]
    lim = 1 << (bitdepth + 7)  # the dequant clamp cf_max (recon/coef.py:421)
    for txtp in _legal_txtps(tx):
        if txtp == TxfmType.WHT_WHT or tables.tx_type_class[txtp] != 0:
            continue
        eobs, blocks = [], []
        # random eobs across the range, dense up to each eob
        for e in sorted(rng.integers(0, n_coef, 17).tolist()) + \
                [0, 1, n_coef - 1]:
            blk = np.zeros(n_coef, dtype=np.int32)
            blk[scan[: e + 1]] = rng.integers(-lim, lim, e + 1)
            blk[scan[e]] = int(rng.integers(1, lim))  # pin the eob coef
            eobs.append(e)
            blocks.append(blk)
        # DC-only at extreme magnitudes: the flat shortcut must clip
        # exactly like the staged pipeline
        for v in (lim - 1, -(lim - 1), 7, -7):
            blk = np.zeros(n_coef, dtype=np.int32)
            blk[scan[0]] = v
            eobs.append(0)
            blocks.append(blk)
        cf = np.ascontiguousarray(np.stack(blocks), dtype=np.int32)
        want = itx_batch_np(cf, tx, txtp, bitdepth)
        ptrs = np.fromiter((b.ctypes.data for b in cf), np.uint64,
                           len(blocks))
        got = itx_batch_c_ptrs(ptrs, tx, txtp, bitdepth,
                               eob=np.asarray(eobs, dtype=np.int64))
        np.testing.assert_array_equal(
            got, want, err_msg=f"tx={tx} txtp={txtp} bd={bitdepth}")
        assert scan_bounds_lut(tx)[0][-1] == sw - 1

        # a full 8-lane group of DC-only blocks pins the flat shortcut
        # branch itself (mixed groups take the staged path)
        dcs = np.asarray([lim - 1, -(lim - 1), 1, -1, 100, -100, 3, 0],
                         dtype=np.int32)
        cf = np.zeros((8, n_coef), dtype=np.int32)
        cf[:, scan[0]] = dcs
        want = itx_batch_np(cf, tx, txtp, bitdepth)
        ptrs = np.fromiter((b.ctypes.data for b in cf), np.uint64, 8)
        got = itx_batch_c_ptrs(ptrs, tx, txtp, bitdepth,
                               eob=np.zeros(8, dtype=np.int64))
        np.testing.assert_array_equal(
            got, want, err_msg=f"dc-only tx={tx} txtp={txtp} bd={bitdepth}")
