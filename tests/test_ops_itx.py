"""Batched device itx vs scalar golden model: exhaustive (size, type,
bitdepth) sweep with random coefficients (checkasm-style, reference
tests/checkasm/itx.c)."""

import numpy as np
import pytest

from dav1d_tpu import tables
from dav1d_tpu.levels import TxfmType
from dav1d_tpu.ops import itx as ditx
from dav1d_tpu.recon import itx as gitx

# which 1-D types exist per dimension (reference itx availability)
def _txtypes_for(tx):
    t_dim = tables.txfm_info()[tx]
    w, h = 4 * int(t_dim[0]), 4 * int(t_dim[1])
    out = []
    for txtp, (rt, ct) in gitx.TX1D_TYPES.items():
        wmax = {gitx.DCT: 64, gitx.ADST: 16, gitx.FLIPADST: 16,
                gitx.IDENTITY: 32}
        if w <= wmax[rt] and h <= wmax[ct]:
            out.append(txtp)
    return out


def _check(tx, txtp, bitdepth, rng, B=4):
    t_dim = tables.txfm_info()[tx]
    w, h = 4 * int(t_dim[0]), 4 * int(t_dim[1])
    sw, sh = min(w, 32), min(h, 32)
    cmax = 1 << (bitdepth + 7)
    cf = rng.integers(-cmax, cmax, size=(B, sh * sw), dtype=np.int32)
    got = np.asarray(ditx.itx_batch(cf, tx, txtp, bitdepth))
    mid = 1 << (bitdepth - 1)
    for b in range(B):
        plane = np.full((h, w), mid, dtype=np.int64)
        gitx.itx_add(plane, 0, 0, tx, txtp, cf[b], eob=sh * sw - 1,
                     bitdepth=bitdepth)
        resid = np.clip(mid + got[b].astype(np.int64), 0,
                        (1 << bitdepth) - 1)
        assert np.array_equal(resid, plane), (tx, txtp, bitdepth, b)


@pytest.mark.parametrize("tx", range(19))
def test_itx_batch_sizes(tx):
    """Every size at a rotating bitdepth with 3 representative tx types
    (full type coverage is in test_itx_batch_types; compile time bounds
    the sweep)."""
    rng = np.random.default_rng(tx)
    bitdepth = (8, 10, 12)[tx % 3]
    types = _txtypes_for(tx)
    pick = [types[0], types[len(types) // 2], types[-1]]
    for txtp in dict.fromkeys(pick):
        _check(tx, txtp, bitdepth, rng)


@pytest.mark.parametrize("tx", [0, 7])  # 4x4 + 8x16: cheap compiles
def test_itx_batch_types(tx):
    rng = np.random.default_rng(100 + tx)
    for txtp in _txtypes_for(tx):
        _check(tx, txtp, 8 if tx else 10, rng)


def test_itx_wht():
    rng = np.random.default_rng(7)
    cf = rng.integers(-500, 500, size=(8, 16), dtype=np.int32)
    got = np.asarray(ditx.itx_batch(cf, 0, TxfmType.WHT_WHT, 8))
    for b in range(8):
        plane = np.full((4, 4), 128, dtype=np.int64)
        gitx.itx_add(plane, 0, 0, 0, TxfmType.WHT_WHT, cf[b], 15, 8)
        assert np.array_equal(np.clip(128 + got[b].astype(np.int64), 0, 255),
                              plane)


def test_itx_dc_only():
    rng = np.random.default_rng(3)
    for tx in range(19):
        for bitdepth in (8, 10, 12):
            cmax = 1 << (bitdepth + 7)
            dc = rng.integers(-cmax, cmax, size=(16,), dtype=np.int32)
            got = np.asarray(ditx.dc_only_batch(dc, tx, bitdepth))
            t_dim = tables.txfm_info()[tx]
            w, h = 4 * int(t_dim[0]), 4 * int(t_dim[1])
            mid = 1 << (bitdepth - 1)
            for b in range(16):
                plane = np.full((h, w), mid, dtype=np.int64)
                cf = np.zeros(min(w, 32) * min(h, 32), dtype=np.int32)
                cf[0] = dc[b]
                gitx.itx_add(plane, 0, 0, tx, TxfmType.DCT_DCT, cf, -1,
                             bitdepth)
                want = plane[0, 0]
                assert np.clip(mid + int(got[b]), 0,
                               (1 << bitdepth) - 1) == want, \
                    (tx, bitdepth, b)
