"""Batched inverse transforms on device (JAX/XLA).

TPU-native pass-2 kernel: one jitted program per (tx size, tx type,
bitdepth) processes a whole batch of coefficient blocks at once — the
decoder's per-block scalar transform becomes (B, n)-lane integer vector
math that XLA maps onto the VPU. Bit-exact with the scalar golden model
(dav1d_tpu.recon.itx; reference src/itx_1d.c + src/itx_tmpl.c:44-121):
the 1-D butterfly kernels are shared — they are polymorphic over the
lane container, so the same code runs on Python ints (golden) and on
batched int32 jnp arrays (device).
"""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..levels import TxfmType
from ..recon import itx as _gitx
from ..recon.itx import _1D_FNS, TX1D_TYPES, TX_SHIFT, wht4


# ---- int32-safe 1-D kernels for 12-bit ----------------------------------
#
# At 12-bit the canonical rotations (a*ca + b*cb + 2048) >> 12 overflow
# int32 (|a| <= 2^19 intermediates x 12-bit constants, worst ~2^32.4 for
# adst4's four-term sums), which is why 12-bit previously ran on the
# host int64 path.  The split form below is algebraically EXACT
# (nested-floor identity floor((64u + v)/4096) == floor((u + v//64)/64)
# for any integers, with ca == 64*(ca>>6) + (ca&63) even for negative
# constants) and keeps every intermediate under ~2^28 — the analog of
# the reference's rewritten fixed-point forms (src/itx_1d.c comments on
# the int32-safe variants).


def _rr_i32(a, ca, b, cb):
    u = a * (ca >> 6) + b * (cb >> 6)
    v = a * (ca & 63) + b * (cb & 63) + 2048
    return (u + (v >> 6)) >> 6


def _quad_i32(c0, i0, c1, i1, c2, i2, c3, i3):
    u = i0 * (c0 >> 6) + i1 * (c1 >> 6) + i2 * (c2 >> 6) + i3 * (c3 >> 6)
    v = (i0 * (c0 & 63) + i1 * (c1 & 63) + i2 * (c2 & 63)
         + i3 * (c3 & 63) + 2048)
    return (u + (v >> 6)) >> 6


def _adst4_i32(cin, oi, si, cout, oo, so, clip):
    in0, in1 = cin[oi], cin[oi + si]
    in2, in3 = cin[oi + 2 * si], cin[oi + 3 * si]
    cout[oo + 0 * so] = _quad_i32(1321, in0, 3803, in2, 2482, in3,
                                  3344, in1)
    cout[oo + 1 * so] = _quad_i32(2482, in0, -1321, in2, -3803, in3,
                                  3344, in1)
    cout[oo + 2 * so] = (209 * (in0 - in2 + in3) + 128) >> 8
    cout[oo + 3 * so] = _quad_i32(3803, in0, 2482, in2, -1321, in3,
                                  -3344, in1)


@functools.lru_cache(maxsize=None)
def _safe_1d_fns():
    """recon.itx's 1-D kernel set recreated over patched globals so every
    rotation routes through the split forms (the kernels are shared
    code; only the arithmetic primitives change)."""
    g = dict(vars(_gitx))
    g["_rr"] = _rr_i32
    g["adst4"] = _adst4_i32
    dct_names = {4: "dct4", 8: "dct8", 16: "dct16", 32: "dct32",
                 64: "dct64"}
    for name in list(dct_names.values()) + ["adst8", "adst16"]:
        src = getattr(_gitx, name)
        g[name] = types.FunctionType(src.__code__, g, name,
                                     src.__defaults__, src.__closure__)
    fns = {}
    for lsz, n in ((0, 4), (1, 8), (2, 16), (3, 32), (4, 64)):
        fns[(lsz, _gitx.DCT)] = g[dct_names[n]]
        if n <= 16:
            base = g[{4: "adst4", 8: "adst8", 16: "adst16"}[n]]

            def _fwd(c, o, s, clip, base=base):
                base(c, o, s, c, o, s, clip)

            def _flip(c, o, s, clip, base=base, n=n):
                base(c, o, s, c, o + (n - 1) * s, -s, clip)

            fns[(lsz, _gitx.ADST)] = _fwd
            fns[(lsz, _gitx.FLIPADST)] = _flip
        if n <= 32:
            fns[(lsz, _gitx.IDENTITY)] = _gitx.identity(n)
    return fns


@functools.lru_cache(maxsize=None)
def _txinfo(tx):
    t_dim = tables.txfm_info()[tx]
    return (4 * int(t_dim[0]), 4 * int(t_dim[1]), int(t_dim[2]),
            int(t_dim[3]))


def _itx_core(cf, tx, txtp, bitdepth, xp=jnp, fns=None):
    """cf: (B, sh*sw) int32 column-major coefficients (as stored by the
    coefficient decoder). Returns (B, h, w) int32 residuals (pre-add,
    already (x + 8) >> 4 scaled). The 1-D kernels are polymorphic over
    the lane container; pass xp=numpy for the host-batched variant and
    fns=_safe_1d_fns() for the int32-safe 12-bit device forms."""
    w, h, lw, lh = _txinfo(tx)
    sw, sh = min(w, 32), min(h, 32)
    maxp = (1 << bitdepth) - 1
    B = cf.shape[0]

    if txtp == TxfmType.WHT_WHT:
        grid = (cf >> 2).reshape(B, 4, 4)  # [x][y]
        lanes = [grid[:, x, y] for y in range(4) for x in range(4)]
        for y in range(4):
            wht4(lanes, y * 4, 1)
        for x in range(4):
            wht4(lanes, x, 4)
        return xp.stack(lanes, axis=1).reshape(B, 4, 4)

    is_rect2 = (w * 2 == h) or (h * 2 == w)
    shift = TX_SHIFT[tx]
    rnd = (1 << shift) >> 1

    if bitdepth == 8:
        row_min = col_min = -(1 << 15)
    else:
        row_min = -(maxp + 1) << 7
        col_min = -(maxp + 1) << 5
    row_max, col_max = ~row_min, ~col_min

    def rclip(v):
        return xp.clip(v, row_min, row_max)

    def cclip(v):
        return xp.clip(v, col_min, col_max)

    row_t, col_t = TX1D_TYPES[txtp]
    table = fns if fns is not None else _1D_FNS
    first_fn = table[(lw, row_t)]
    second_fn = table[(lh, col_t)]

    grid = cf.reshape(B, sw, sh)  # [x][y]
    if is_rect2:
        grid = (grid * 181 + 128) >> 8

    # row pass: lanes indexed by x, each (B, sh)
    zero = xp.zeros((B, sh), dtype=cf.dtype)
    lanes = [grid[:, x, :] if x < sw else zero for x in range(w)]
    first_fn(lanes, 0, 1, rclip)
    lanes = [cclip((ln + rnd) >> shift) for ln in lanes]

    # column pass: lanes indexed by y, each (B, w)
    mid = xp.stack(lanes, axis=2)  # (B, sh, w)
    zero = xp.zeros((B, w), dtype=cf.dtype)
    lanes = [mid[:, y, :] if y < sh else zero for y in range(h)]
    second_fn(lanes, 0, 1, cclip)

    out = xp.stack(lanes, axis=1)  # (B, h, w)
    return (out + 8) >> 4


@functools.lru_cache(maxsize=None)
def _jit_itx(tx, txtp, bitdepth):
    # 8-bit coefficients and residuals both fit int16 (the reference's
    # 8bpc coef type), halving transfer volume to/from the device; the
    # widening/narrowing casts are free inside the fused program
    if bitdepth == 8:
        return jax.jit(lambda cf: _itx_core(
            cf.astype(jnp.int32), tx, txtp, bitdepth).astype(jnp.int16))
    # 12-bit: the int32-safe split-form kernels (see module top)
    fns = _safe_1d_fns() if bitdepth == 12 else None
    return jax.jit(lambda cf: _itx_core(cf, tx, txtp, bitdepth, fns=fns))


def itx_batch_np(cf, tx, txtp, bitdepth):
    """Host-batched inverse transform (same shared 1-D kernels, numpy
    lanes): (B, sh*sw) -> (B, h, w) int32 residuals. Always copies: the
    identity 1-D kernels update lanes in place, which with numpy views
    would write through to the caller's coefficient buffer."""
    dt = np.int64 if bitdepth == 12 else np.int32
    return _itx_core(np.array(cf, dtype=dt, copy=True), int(tx),
                     int(txtp), int(bitdepth), xp=np)


def itx_batch_c(cf, tx, txtp, bitdepth):
    """Native-C host batch (same 1-D arithmetic: the C kernels are
    generated from _itx_core's Python kernels by tools/gen_itx_c.py);
    None when the native library is unavailable."""
    from ..native import lib as _nlib

    if _nlib is None:
        return None
    w, h, lw, lh = _txinfo(tx)
    cf = np.ascontiguousarray(cf, dtype=np.int32)
    out = np.empty((cf.shape[0], h, w), dtype=np.int32)
    if txtp == TxfmType.WHT_WHT:
        _nlib.dtpu_itx_batch(cf.ctypes.data, cf.shape[0], 4, 4, 0, 0, 0,
                             0, bitdepth, 1, out.ctypes.data)
        return out
    row_t, col_t = TX1D_TYPES[TxfmType(txtp)]
    is_rect2 = int((w * 2 == h) or (h * 2 == w))
    _nlib.dtpu_itx_batch(cf.ctypes.data, cf.shape[0], w, h,
                         int(TX_SHIFT[tx]), int(row_t), int(col_t),
                         is_rect2, int(bitdepth), 0, out.ctypes.data)
    return out


def itx_batch_c_list(cfs, tx, txtp, bitdepth):
    """Native-C host batch over a LIST of int32 coefficient blocks —
    typically views straight into the pass-1 capture arena — via a
    per-block pointer array, skipping the (B, n) stacking copy of
    itx_batch_c.  None when unavailable or any block isn't contiguous
    int32 (caller falls back to the stacking path)."""
    from ..native import lib as _nlib

    if _nlib is None:
        return None
    for a in cfs:
        if a.dtype != np.int32 or not a.flags["C_CONTIGUOUS"]:
            return None
    n = len(cfs)
    ptrs = np.fromiter((a.ctypes.data for a in cfs), dtype=np.uint64,
                       count=n)
    w, h, lw, lh = _txinfo(tx)
    from ..bufpool import take as _take
    out = _take((n, h, w), np.int32)  # pooled: C writes every element
    if txtp == TxfmType.WHT_WHT:
        _nlib.dtpu_itx_batch_ptrs(ptrs.ctypes.data, n, 4, 4, 0, 0, 0,
                                  0, bitdepth, 1, out.ctypes.data)
        return out
    row_t, col_t = TX1D_TYPES[TxfmType(txtp)]
    is_rect2 = int((w * 2 == h) or (h * 2 == w))
    _nlib.dtpu_itx_batch_ptrs(ptrs.ctypes.data, n, w, h,
                              int(TX_SHIFT[tx]), int(row_t), int(col_t),
                              is_rect2, int(bitdepth), 0, out.ctypes.data)
    return out


@functools.lru_cache(maxsize=None)
def scan_bounds_lut(tx):
    """Per-eob inclusive (x, y) bounds of the first eob+1 scan positions
    of a TWO_D-class transform: cummax over the scan order decoded as
    rc = (x << (min(lh,3)+2)) | y (recon/coef.py scan convention).
    Lets the native itx bound its staging scan and pick its flat DC
    path without touching the coefficients."""
    from .. import tables

    w, h, lw, lh = _txinfo(tx)
    sh = min(h, 32)
    scan = tables.scans()[tx].astype(np.int64)
    xs = np.maximum.accumulate(scan >> (min(lh, 3) + 2))
    ys = np.maximum.accumulate(scan & (sh - 1))
    return xs.astype(np.uint8), ys.astype(np.uint8)


def itx_batch_c_ptrs(ptrs, tx, txtp, bitdepth, eob=None):
    """Native-C host batch over a uint64 pointer array of coefficient
    blocks (straight into the pass-1 capture arena — no Python views at
    all; the record-free variant of itx_batch_c_list).  When the
    per-block eob array is given and the transform is TWO_D-class, the
    scan-derived coefficient bounds are passed down so the C kernel can
    bound its staging scan and take its flat DC-only path.

    Residuals come back int16 for bitdepth <= 10 (max |residual| is
    8192 = (col_max + 8) >> 4, checked exhaustively over all tx/txtp at
    extreme coefficient magnitudes), and the replay adders take
    elsz = 2 — halving the residual-stage traffic.  12-bit IDTX exceeds
    int16 (its unclipped identity upscale reaches +-32768), so 12-bit
    stays int32."""
    from .. import tables
    from ..native import lib as _nlib

    n = len(ptrs)
    w, h, lw, lh = _txinfo(tx)
    from ..bufpool import take as _take
    i16 = bitdepth <= 10
    fn = _nlib.dtpu_itx_batch_ptrs_b16 if i16 \
        else _nlib.dtpu_itx_batch_ptrs_b
    out = _take((n, h, w), np.int16 if i16 else np.int32)
    if txtp == TxfmType.WHT_WHT:
        fn(ptrs.ctypes.data, n, 4, 4, 0, 0,
           0, 0, bitdepth, 1, None, None,
           out.ctypes.data)
        return out
    xb = yb = None
    if eob is not None and txtp != TxfmType.WHT_WHT \
            and tables.tx_type_class[txtp] == 0:
        lx, ly = scan_bounds_lut(int(tx))
        xb = np.ascontiguousarray(lx[eob])
        yb = np.ascontiguousarray(ly[eob])
    row_t, col_t = TX1D_TYPES[TxfmType(txtp)]
    is_rect2 = int((w * 2 == h) or (h * 2 == w))
    fn(ptrs.ctypes.data, n, w, h, int(TX_SHIFT[tx]), int(row_t),
       int(col_t), is_rect2, int(bitdepth), 0,
       xb.ctypes.data if xb is not None else None,
       yb.ctypes.data if yb is not None else None, out.ctypes.data)
    return out


def itx_batch(cf, tx, txtp, bitdepth):
    """Batched inverse transform: (B, sh*sw) int32 -> (B, h, w) residuals.
    All bitdepths run on the device: 12-bit uses the exact int32-safe
    split-form kernels (_safe_1d_fns) instead of the canonical rotations
    whose intermediates exceed int32."""
    from ..devrt import call

    dt = jnp.int16 if bitdepth == 8 else jnp.int32
    return call("itx", _jit_itx(int(tx), int(txtp), int(bitdepth)),
                jnp.asarray(cf, dtype=dt))


def _dc_core(dc, tx, bitdepth):
    w, h, _, _ = _txinfo(tx)
    is_rect2 = (w * 2 == h) or (h * 2 == w)
    shift = TX_SHIFT[tx]
    rnd = (1 << shift) >> 1
    if is_rect2:
        dc = (dc * 181 + 128) >> 8
    dc = (dc * 181 + 128) >> 8
    dc = (dc + rnd) >> shift
    # final >>4 is folded into the last rounding (reference itx_tmpl.c:90)
    return (dc * 181 + 128 + 2048) >> 12


@functools.lru_cache(maxsize=None)
def _jit_dc(tx, bitdepth):
    return jax.jit(lambda dc: _dc_core(dc, tx, bitdepth))


def dc_only_batch(dc, tx, bitdepth):
    """DC-only fast path: (B,) int32 DC coefs -> (B,) residual values
    (constant over the block)."""
    from ..devrt import call

    return call("itx_dc", _jit_dc(int(tx), int(bitdepth)),
                jnp.asarray(dc, dtype=jnp.int32))
