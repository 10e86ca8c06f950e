"""Exact numpy motion-compensation kernels (golden model; the batched
JAX/Pallas path in dav1d_tpu.ops.mc is tested against these).

Behavioral parity with reference src/mc_tmpl.c (put_8tap_c :130, put_bilin_c
:434, prep variants, avg/w_avg/mask :628-680, emu_edge as clamped gather).
"""

from __future__ import annotations

import numpy as np

from .. import tables


def _intermediate_bits(bitdepth):
    return 4 if bitdepth == 8 else 14 - bitdepth


def get_window(plane, valid_w, valid_h, dy, dx, h, w):
    """Gather an (h, w) window at (dy, dx) with edge replication
    (equivalent to reference emu_edge_c + in-bounds direct reads)."""
    ys = np.clip(np.arange(dy, dy + h), 0, valid_h - 1)
    xs = np.clip(np.arange(dx, dx + w), 0, valid_w - 1)
    return plane[np.ix_(ys, xs)].astype(np.int64)


def _get_filters(filter_type, w, h, mx, my):
    sub = tables.mc_subpel_filters
    fh = fv = None
    if mx:
        fh = sub[filter_type & 3][mx - 1] if w > 4 else \
            sub[3 + (filter_type & 1)][mx - 1]
        fh = fh.astype(np.int64)
    if my:
        fv = sub[filter_type >> 2][my - 1] if h > 4 else \
            sub[3 + ((filter_type >> 2) & 1)][my - 1]
        fv = fv.astype(np.int64)
    return fh, fv


def _hfilt(win, f, w):
    # win: (rows, w+7) -> (rows, w)
    return sum(int(f[t]) * win[:, t : t + w] for t in range(8))


def _vfilt(win, f, h):
    return sum(int(f[t]) * win[t : t + h, :] for t in range(8))


def put_8tap(plane, valid_w, valid_h, dy, dx, w, h, mx, my, filter_type,
             bitdepth):
    """(h, w) int32 prediction block."""
    ib = _intermediate_bits(bitdepth)
    maxp = (1 << bitdepth) - 1
    fh, fv = _get_filters(filter_type, w, h, mx, my)
    if fh is not None:
        if fv is not None:
            win = get_window(plane, valid_w, valid_h, dy - 3, dx - 3,
                             h + 7, w + 7)
            mid = (_hfilt(win, fh, w) + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
            out = (_vfilt(mid, fv, h) + ((1 << (6 + ib)) >> 1)) >> (6 + ib)
        else:
            win = get_window(plane, valid_w, valid_h, dy, dx - 3, h, w + 7)
            rnd = 32 + ((1 << (6 - ib)) >> 1)
            out = (_hfilt(win, fh, w) + rnd) >> 6
    elif fv is not None:
        win = get_window(plane, valid_w, valid_h, dy - 3, dx, h + 7, w)
        out = (_vfilt(win, fv, h) + 32) >> 6
    else:
        return get_window(plane, valid_w, valid_h, dy, dx, h, w) \
            .astype(np.int32)
    return np.clip(out, 0, maxp).astype(np.int32)


def prep_8tap(plane, valid_w, valid_h, dy, dx, w, h, mx, my, filter_type,
              bitdepth):
    """(h, w) int16-range intermediates (reference prep_8tap_c)."""
    ib = _intermediate_bits(bitdepth)
    prep_bias = 0 if bitdepth == 8 else 8192
    fh, fv = _get_filters(filter_type, w, h, mx, my)
    if fh is not None:
        if fv is not None:
            win = get_window(plane, valid_w, valid_h, dy - 3, dx - 3,
                             h + 7, w + 7)
            mid = (_hfilt(win, fh, w) + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
            out = (_vfilt(mid, fv, h) + 32) >> 6
        else:
            win = get_window(plane, valid_w, valid_h, dy, dx - 3, h, w + 7)
            out = (_hfilt(win, fh, w) + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
    elif fv is not None:
        win = get_window(plane, valid_w, valid_h, dy - 3, dx, h + 7, w)
        out = (_vfilt(win, fv, h) + ((1 << (6 - ib)) >> 1)) >> (6 - ib)
    else:
        win = get_window(plane, valid_w, valid_h, dy, dx, h, w)
        out = win << ib
    return (out - prep_bias).astype(np.int32)


def put_bilin(plane, valid_w, valid_h, dy, dx, w, h, mx, my, bitdepth):
    """reference put_bilin_c (src/mc_tmpl.c:434)."""
    ib = _intermediate_bits(bitdepth)
    maxp = (1 << bitdepth) - 1

    def bil_h(win, mxy, sh):
        v = 16 * win[:, :w] + mxy * (win[:, 1 : w + 1] - win[:, :w])
        return (v + ((1 << sh) >> 1)) >> sh

    def bil_v(win, mxy, sh):
        v = 16 * win[:h, :] + mxy * (win[1 : h + 1, :] - win[:h, :])
        return (v + ((1 << sh) >> 1)) >> sh

    if mx:
        if my:
            win = get_window(plane, valid_w, valid_h, dy, dx, h + 1, w + 1)
            mid = bil_h(win, mx, 4 - ib)
            out = bil_v(mid, my, 4 + ib)
        else:
            win = get_window(plane, valid_w, valid_h, dy, dx, h, w + 1)
            px = bil_h(win, mx, 4 - ib)
            out = (px + ((1 << ib) >> 1)) >> ib
    elif my:
        win = get_window(plane, valid_w, valid_h, dy, dx, h + 1, w)
        out = bil_v(win, my, 4)
    else:
        return get_window(plane, valid_w, valid_h, dy, dx, h, w) \
            .astype(np.int32)
    return np.clip(out, 0, maxp).astype(np.int32)


def prep_bilin(plane, valid_w, valid_h, dy, dx, w, h, mx, my, bitdepth):
    ib = _intermediate_bits(bitdepth)
    prep_bias = 0 if bitdepth == 8 else 8192

    def bil_h(win, mxy):
        v = 16 * win[:, :w] + mxy * (win[:, 1 : w + 1] - win[:, :w])
        return (v + ((1 << (4 - ib)) >> 1)) >> (4 - ib)

    if mx:
        if my:
            win = get_window(plane, valid_w, valid_h, dy, dx, h + 1, w + 1)
            mid = bil_h(win, mx)
            v = 16 * mid[:h] + my * (mid[1 : h + 1] - mid[:h])
            out = (v + 8) >> 4
        else:
            win = get_window(plane, valid_w, valid_h, dy, dx, h, w + 1)
            out = bil_h(win, mx)
    elif my:
        win = get_window(plane, valid_w, valid_h, dy, dx, h + 1, w)
        v = 16 * win[:h] + my * (win[1 : h + 1] - win[:h])
        out = (v + ((1 << (4 - ib)) >> 1)) >> (4 - ib)
    else:
        win = get_window(plane, valid_w, valid_h, dy, dx, h, w)
        out = win << ib
    return (out - prep_bias).astype(np.int32)


def avg(t1, t2, bitdepth):
    ib = _intermediate_bits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    out = (t1.astype(np.int64) + t2 + (1 << ib) + bias * 2) >> (ib + 1)
    return np.clip(out, 0, (1 << bitdepth) - 1).astype(np.int32)


def w_avg(t1, t2, weight, bitdepth):
    ib = _intermediate_bits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    out = (t1.astype(np.int64) * weight + t2 * (16 - weight)
           + (8 << ib) + bias * 16) >> (ib + 4)
    return np.clip(out, 0, (1 << bitdepth) - 1).astype(np.int32)


def mask_blend(t1, t2, m, bitdepth):
    ib = _intermediate_bits(bitdepth)
    bias = 0 if bitdepth == 8 else 8192
    out = (t1.astype(np.int64) * m + t2 * (64 - m)
           + (32 << ib) + bias * 64) >> (ib + 6)
    return np.clip(out, 0, (1 << bitdepth) - 1).astype(np.int32)


def blend(dst, tmp, m):
    """OBMC/interintra blend (reference blend_c):
    (dst*(64-m) + tmp*m + 32) >> 6."""
    return (dst.astype(np.int64) * (64 - m) + tmp * m + 32) >> 6
