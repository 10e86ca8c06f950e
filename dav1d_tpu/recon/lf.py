"""Deblocking loop filter: masks, levels, and filtering.

Behavioral parity with the reference (src/lf_mask.c:36-468,
src/loopfilter_tmpl.c:36-241, src/lf_apply_tmpl.c:176-466; AV1 spec 7.14).
Masks are 32-lane bitmasks per SB128 column/row selecting filter width per
4px edge; levels live in a per-4x4 cache indexed [y][x][plane_dir].
"""

from __future__ import annotations

import numpy as np

from .. import tables
from ..headers import PixelLayout
from ..native import lib as _native


class Av1Filter:
    """Per-128x128 deblock masks (reference src/lf_mask.h:51-57)."""

    def __init__(self):
        self.filter_y = np.zeros((2, 32, 3, 2), dtype=np.uint16)
        self.filter_uv = np.zeros((2, 32, 2, 2), dtype=np.uint16)


def calc_eih(sharpness: int):
    """(E, I) LUTs per level (reference dav1d_calc_eih)."""
    e = np.zeros(64, dtype=np.int32)
    i_ = np.zeros(64, dtype=np.int32)
    for level in range(64):
        limit = level
        if sharpness > 0:
            limit >>= (sharpness + 3) >> 2
            limit = min(limit, 9 - sharpness)
        limit = max(limit, 1)
        i_[level] = limit
        e[level] = 2 * (level + 2) + limit
    return e, i_


def _calc_lf_value(out, base_lvl, lf_delta, seg_delta, mr_delta):
    base = max(0, min(63, max(0, min(63, base_lvl + lf_delta)) + seg_delta))
    if mr_delta is None:
        out[:, :] = base
        return
    sh = int(base >= 32)
    out[0, 0] = out[0, 1] = max(0, min(63, base + mr_delta.ref_delta[0] * (1 << sh)))
    for r in range(1, 8):
        for m in range(2):
            delta = mr_delta.mode_delta[m] + mr_delta.ref_delta[r]
            out[r, m] = max(0, min(63, base + delta * (1 << sh)))


def calc_lf_values(hdr, lf_delta):
    """(8 seg, 4 plane-dir, 8 ref, 2 mode) uint8
    (reference dav1d_calc_lf_values)."""
    n_seg = 8 if hdr.segmentation.enabled else 1
    out = np.zeros((8, 4, 8, 2), dtype=np.uint8)
    lf = hdr.loopfilter
    if not lf.level_y[0] and not lf.level_y[1]:
        return out
    mr = lf.mode_ref_deltas if lf.mode_ref_delta_enabled else None
    multi = hdr.delta.lf_multi
    for s in range(n_seg):
        segd = hdr.segmentation.seg_data.d[s] if hdr.segmentation.enabled \
            else None
        _calc_lf_value(out[s][0], lf.level_y[0], lf_delta[0],
                       segd.delta_lf_y_v if segd else 0, mr)
        _calc_lf_value(out[s][1], lf.level_y[1], lf_delta[1 if multi else 0],
                       segd.delta_lf_y_h if segd else 0, mr)
        if lf.level_u:
            _calc_lf_value(out[s][2], lf.level_u, lf_delta[2 if multi else 0],
                           segd.delta_lf_u if segd else 0, mr)
        if lf.level_v:
            _calc_lf_value(out[s][3], lf.level_v, lf_delta[3 if multi else 0],
                           segd.delta_lf_v if segd else 0, mr)
    return out


# --- mask construction ------------------------------------------------------

def mask_edges_intra(masks_y, by4, bx4, w4, h4, tx, a, a_off, l, l_off):
    """reference mask_edges_intra (src/lf_mask.c:149-200)."""
    t_dim = tables.txfm_info()[tx]
    twl4c = min(2, int(t_dim[2]))
    thl4c = min(2, int(t_dim[3]))
    if _native is not None:
        _native.dtpu_mask_edges_intra(
            masks_y.ctypes.data, by4, bx4, w4, h4, twl4c, thl4c,
            int(t_dim[0]), int(t_dim[1]),
            a.ctypes.data + a_off, l.ctypes.data + l_off)
        return

    mask = 1 << by4
    for y in range(h4):
        sidx = int(mask >= 0x10000)
        smask = mask >> (sidx << 4)
        masks_y[0][bx4][min(twl4c, int(l[l_off + y]))][sidx] |= smask
        mask <<= 1
    mask = 1 << bx4
    for x in range(w4):
        sidx = int(mask >= 0x10000)
        smask = mask >> (sidx << 4)
        masks_y[1][by4][min(thl4c, int(a[a_off + x]))][sidx] |= smask
        mask <<= 1

    hstep = int(t_dim[0])
    t = 1 << by4
    inner = ((t << h4) - t) & 0xFFFFFFFF
    inner1, inner2 = inner & 0xFFFF, inner >> 16
    for x in range(hstep, w4, hstep):
        if inner1:
            masks_y[0][bx4 + x][twl4c][0] |= inner1
        if inner2:
            masks_y[0][bx4 + x][twl4c][1] |= inner2
    vstep = int(t_dim[1])
    t = 1 << bx4
    inner = ((t << w4) - t) & 0xFFFFFFFF
    inner1, inner2 = inner & 0xFFFF, inner >> 16
    for y in range(vstep, h4, vstep):
        if inner1:
            masks_y[1][by4 + y][thl4c][0] |= inner1
        if inner2:
            masks_y[1][by4 + y][thl4c][1] |= inner2

    a[a_off : a_off + w4] = thl4c
    l[l_off : l_off + h4] = twl4c


def mask_edges_chroma(masks_uv, cby4, cbx4, cw4, ch4, skip_inter, tx,
                      a, a_off, l, l_off, ss_hor, ss_ver):
    """reference mask_edges_chroma (src/lf_mask.c:202-258)."""
    t_dim = tables.txfm_info()[tx]
    twl4c = int(bool(int(t_dim[2])))
    thl4c = int(bool(int(t_dim[3])))
    if _native is not None:
        _native.dtpu_mask_edges_chroma(
            masks_uv.ctypes.data, cby4, cbx4, cw4, ch4, skip_inter,
            twl4c, thl4c, int(t_dim[0]), int(t_dim[1]),
            a.ctypes.data + a_off, l.ctypes.data + l_off, ss_hor, ss_ver)
        return
    vbits, hbits = 4 - ss_ver, 4 - ss_hor
    vmask, hmask = 16 >> ss_ver, 16 >> ss_hor
    vmax, hmax = 1 << vmask, 1 << hmask

    mask = 1 << cby4
    for y in range(ch4):
        sidx = int(mask >= vmax)
        smask = mask >> (sidx << vbits)
        masks_uv[0][cbx4][min(twl4c, int(l[l_off + y]))][sidx] |= smask
        mask <<= 1
    mask = 1 << cbx4
    for x in range(cw4):
        sidx = int(mask >= hmax)
        smask = mask >> (sidx << hbits)
        masks_uv[1][cby4][min(thl4c, int(a[a_off + x]))][sidx] |= smask
        mask <<= 1

    if not skip_inter:
        hstep = int(t_dim[0])
        t = 1 << cby4
        inner = ((t << ch4) - t) & 0xFFFFFFFF
        inner1 = inner & ((1 << vmask) - 1)
        inner2 = inner >> vmask
        for x in range(hstep, cw4, hstep):
            if inner1:
                masks_uv[0][cbx4 + x][twl4c][0] |= inner1
            if inner2:
                masks_uv[0][cbx4 + x][twl4c][1] |= inner2
        vstep = int(t_dim[1])
        t = 1 << cbx4
        inner = ((t << cw4) - t) & 0xFFFFFFFF
        inner1 = inner & ((1 << hmask) - 1)
        inner2 = inner >> hmask
        for y in range(vstep, ch4, vstep):
            if inner1:
                masks_uv[1][cby4 + y][thl4c][0] |= inner1
            if inner2:
                masks_uv[1][cby4 + y][thl4c][1] |= inner2

    a[a_off : a_off + cw4] = thl4c
    l[l_off : l_off + ch4] = twl4c


def create_lf_mask_intra(lflvl: Av1Filter, level_cache, b4_stride,
                         filter_level, bx, by, iw, ih, bs, ytx, uvtx,
                         layout, ay, ay_off, ly, ly_off,
                         auv, auv_off, luv, luv_off):
    """reference dav1d_create_lf_mask_intra (src/lf_mask.c:259-320)."""
    b_dim = tables.block_dimensions[bs]
    bw4 = min(iw - bx, int(b_dim[0]))
    bh4 = min(ih - by, int(b_dim[1]))
    bx4 = bx & 31
    by4 = by & 31

    if bw4 and bh4:
        level_cache[by : by + bh4, bx : bx + bw4, 0] = filter_level[0][0][0]
        level_cache[by : by + bh4, bx : bx + bw4, 1] = filter_level[1][0][0]
        mask_edges_intra(lflvl.filter_y, by4, bx4, bw4, bh4, ytx,
                         ay, ay_off, ly, ly_off)

    if auv is None:
        return
    ss_ver = int(layout == PixelLayout.I420)
    ss_hor = int(layout != PixelLayout.I444)
    cbw4 = min(((iw + ss_hor) >> ss_hor) - (bx >> ss_hor),
               (int(b_dim[0]) + ss_hor) >> ss_hor)
    cbh4 = min(((ih + ss_ver) >> ss_ver) - (by >> ss_ver),
               (int(b_dim[1]) + ss_ver) >> ss_ver)
    if cbw4 <= 0 or cbh4 <= 0:
        return
    cbx4 = bx4 >> ss_hor
    cby4 = by4 >> ss_ver
    cy, cx = by >> ss_ver, bx >> ss_hor
    level_cache[cy : cy + cbh4, cx : cx + cbw4, 2] = filter_level[2][0][0]
    level_cache[cy : cy + cbh4, cx : cx + cbw4, 3] = filter_level[3][0][0]
    mask_edges_chroma(lflvl.filter_uv, cby4, cbx4, cbw4, cbh4, 0, uvtx,
                      auv, auv_off, luv, luv_off, ss_hor, ss_ver)


# --- filtering ---------------------------------------------------------------

def _loop_filter(plane, py, px, E, I, H, along_rows, wd, bitdepth):
    """Filter 4 pixels across one edge (reference loop_filter,
    src/loopfilter_tmpl.c:36-161). along_rows: True for a vertical edge
    (pixels advance down rows; taps run horizontally)."""
    bd_m8 = bitdepth - 8
    F = 1 << bd_m8
    E <<= bd_m8
    I <<= bd_m8
    H <<= bd_m8
    maxp = (1 << bitdepth) - 1
    cd_lim = 128 << bd_m8

    def iclip_diff(v):
        return max(-cd_lim, min(cd_lim - 1, v))

    for i in range(4):
        if along_rows:
            y, x = py + i, px
            get = lambda o: int(plane[y, x + o])
            def put(o, v):
                plane[y, x + o] = v
        else:
            y, x = py, px + i
            get = lambda o: int(plane[y + o, x])
            def put(o, v):
                plane[y + o, x] = v

        p1, p0 = get(-2), get(-1)
        q0, q1 = get(0), get(1)
        fm = (abs(p1 - p0) <= I and abs(q1 - q0) <= I
              and abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= E)
        p2 = q2 = p3 = q3 = 0
        if wd > 4:
            p2, q2 = get(-3), get(2)
            fm = fm and abs(p2 - p1) <= I and abs(q2 - q1) <= I
            if wd > 6:
                p3, q3 = get(-4), get(3)
                fm = fm and abs(p3 - p2) <= I and abs(q3 - q2) <= I
        if not fm:
            continue

        flat8out = False
        if wd >= 16:
            p6, p5, p4 = get(-7), get(-6), get(-5)
            q4, q5, q6 = get(4), get(5), get(6)
            flat8out = (abs(p6 - p0) <= F and abs(p5 - p0) <= F
                        and abs(p4 - p0) <= F and abs(q4 - q0) <= F
                        and abs(q5 - q0) <= F and abs(q6 - q0) <= F)
        flat8in = False
        if wd >= 6:
            flat8in = (abs(p2 - p0) <= F and abs(p1 - p0) <= F
                       and abs(q1 - q0) <= F and abs(q2 - q0) <= F)
        if wd >= 8:
            flat8in = flat8in and abs(p3 - p0) <= F and abs(q3 - q0) <= F

        if wd >= 16 and flat8out and flat8in:
            put(-6, (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0 + 8) >> 4)
            put(-5, (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1 + 8) >> 4)
            put(-4, (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1 + q2 + 8) >> 4)
            put(-3, (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1 + q2 + q3 + 8) >> 4)
            put(-2, (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1 + q2 + q3 + q4 + 8) >> 4)
            put(-1, (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2 + q3 + q4 + q5 + 8) >> 4)
            put(0, (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + q3 + q4 + q5 + q6 + 8) >> 4)
            put(1, (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 + q3 + q4 + q5 + q6 * 2 + 8) >> 4)
            put(2, (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 + q4 + q5 + q6 * 3 + 8) >> 4)
            put(3, (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 + q5 + q6 * 4 + 8) >> 4)
            put(4, (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 + q6 * 5 + 8) >> 4)
            put(5, (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7 + 8) >> 4)
        elif wd >= 8 and flat8in:
            put(-3, (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3)
            put(-2, (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3)
            put(-1, (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3)
            put(0, (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3)
            put(1, (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3)
            put(2, (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3)
        elif wd == 6 and flat8in:
            put(-2, (p2 + 2 * p2 + 2 * p1 + 2 * p0 + q0 + 4) >> 3)
            put(-1, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
            put(0, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
            put(1, (p0 + 2 * q0 + 2 * q1 + 2 * q2 + q2 + 4) >> 3)
        else:
            hev = abs(p1 - p0) > H or abs(q1 - q0) > H
            if hev:
                f = iclip_diff(p1 - q1)
                f = iclip_diff(3 * (q0 - p0) + f)
                f1 = min(f + 4, cd_lim - 1) >> 3
                f2 = min(f + 3, cd_lim - 1) >> 3
                put(-1, max(0, min(maxp, p0 + f2)))
                put(0, max(0, min(maxp, q0 - f1)))
            else:
                f = iclip_diff(3 * (q0 - p0))
                f1 = min(f + 4, cd_lim - 1) >> 3
                f2 = min(f + 3, cd_lim - 1) >> 3
                put(-1, max(0, min(maxp, p0 + f2)))
                put(0, max(0, min(maxp, q0 - f1)))
                f = (f1 + 1) >> 1
                put(-2, max(0, min(maxp, p1 + f)))
                put(1, max(0, min(maxp, q1 - f)))


def _loop_filter_batch(plane, ys, xs, E, I, H, along_rows, wd, bitdepth):
    """Vectorized _loop_filter over N 4-line edge segments of one width
    class. Within a pass, segments never read each other's writes (edge
    spacing >= the tx width implied by wd exceeds read+write reach), so
    batching is exact (reference loop_filter, src/loopfilter_tmpl.c:36)."""
    bd_m8 = bitdepth - 8
    F = 1 << bd_m8
    maxp = (1 << bitdepth) - 1
    cd_lim = 128 << bd_m8
    E = (E << bd_m8)[:, None]
    I = (I << bd_m8)[:, None]
    H = (H << bd_m8)[:, None]
    m = {4: 2, 6: 3, 8: 4, 16: 7}[wd]
    n = len(ys)
    lines = np.arange(4)
    taps = np.arange(2 * m) - m
    if along_rows:  # vertical edge: lines advance down rows
        ridx = ys[:, None, None] + lines[None, :, None]
        cidx = xs[:, None, None] + taps[None, None, :]
        W = plane[ridx, cidx].astype(np.int64)  # (N, 4, 2m)
    else:           # horizontal edge: lines advance across columns
        ridx = ys[:, None, None] + taps[None, :, None]
        cidx = xs[:, None, None] + lines[None, None, :]
        W = plane[ridx, cidx].astype(np.int64).transpose(0, 2, 1)

    def P(k):
        return W[:, :, m - 1 - k]

    def Q(k):
        return W[:, :, m + k]

    p1, p0, q0, q1 = P(1), P(0), Q(0), Q(1)
    fm = ((np.abs(p1 - p0) <= I) & (np.abs(q1 - q0) <= I)
          & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= E))
    if wd > 4:
        p2, q2 = P(2), Q(2)
        fm &= (np.abs(p2 - p1) <= I) & (np.abs(q2 - q1) <= I)
        if wd > 6:
            p3, q3 = P(3), Q(3)
            fm &= (np.abs(p3 - p2) <= I) & (np.abs(q3 - q2) <= I)

    out = {}  # offset -> (cond, value)

    def emit(o, cond, val):
        if o in out:
            pc, pv = out[o]
            out[o] = (pc | cond, np.where(cond, val, pv))
        else:
            out[o] = (cond, val)

    big = None
    if wd >= 16:
        p6, p5, p4 = P(6), P(5), P(4)
        q4, q5, q6 = Q(4), Q(5), Q(6)
        flat8out = ((np.abs(p6 - p0) <= F) & (np.abs(p5 - p0) <= F)
                    & (np.abs(p4 - p0) <= F) & (np.abs(q4 - q0) <= F)
                    & (np.abs(q5 - q0) <= F) & (np.abs(q6 - q0) <= F))
    flat8in = None
    if wd >= 6:
        flat8in = ((np.abs(p2 - p0) <= F) & (np.abs(p1 - p0) <= F)
                   & (np.abs(q1 - q0) <= F) & (np.abs(q2 - q0) <= F))
        if wd >= 8:
            flat8in &= (np.abs(p3 - p0) <= F) & (np.abs(q3 - q0) <= F)

    if wd >= 16:
        big = fm & flat8out & flat8in
        emit(-6, big, (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0
                       + 8) >> 4)
        emit(-5, big, (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0
                       + q0 + q1 + 8) >> 4)
        emit(-4, big, (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0
                       + q0 + q1 + q2 + 8) >> 4)
        emit(-3, big, (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0
                       + q0 + q1 + q2 + q3 + 8) >> 4)
        emit(-2, big, (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2
                       + q0 + q1 + q2 + q3 + q4 + 8) >> 4)
        emit(-1, big, (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2
                       + q1 + q2 + q3 + q4 + q5 + 8) >> 4)
        emit(0, big, (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2
                      + q2 + q3 + q4 + q5 + q6 + 8) >> 4)
        emit(1, big, (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2
                      + q3 + q4 + q5 + q6 * 2 + 8) >> 4)
        emit(2, big, (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2
                      + q4 + q5 + q6 * 3 + 8) >> 4)
        emit(3, big, (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2
                      + q5 + q6 * 4 + 8) >> 4)
        emit(4, big, (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2
                      + q6 * 5 + 8) >> 4)
        emit(5, big, (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7
                      + 8) >> 4)

    notbig = fm if big is None else (fm & ~big)
    if wd >= 8:
        mid = notbig & flat8in
        emit(-3, mid, (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3)
        emit(-2, mid, (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3)
        emit(-1, mid, (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3)
        emit(0, mid, (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3)
        emit(1, mid, (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3)
        emit(2, mid, (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3)
        narrow = notbig & ~flat8in
    elif wd == 6:
        mid = notbig & flat8in
        emit(-2, mid, (p2 + 2 * p2 + 2 * p1 + 2 * p0 + q0 + 4) >> 3)
        emit(-1, mid, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
        emit(0, mid, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
        emit(1, mid, (p0 + 2 * q0 + 2 * q1 + 2 * q2 + q2 + 4) >> 3)
        narrow = notbig & ~flat8in
    else:
        narrow = fm

    def iclip_diff(v):
        return np.clip(v, -cd_lim, cd_lim - 1)

    hev = (np.abs(p1 - p0) > H) | (np.abs(q1 - q0) > H)
    fh = iclip_diff(3 * (q0 - p0) + iclip_diff(p1 - q1))
    fnh = iclip_diff(3 * (q0 - p0))
    fv = np.where(hev, fh, fnh)
    f1 = np.minimum(fv + 4, cd_lim - 1) >> 3
    f2 = np.minimum(fv + 3, cd_lim - 1) >> 3
    emit(-1, narrow, np.clip(p0 + f2, 0, maxp))
    emit(0, narrow, np.clip(q0 - f1, 0, maxp))
    nh = narrow & ~hev
    fo = (f1 + 1) >> 1
    emit(-2, nh, np.clip(p1 + fo, 0, maxp))
    emit(1, nh, np.clip(q1 - fo, 0, maxp))

    for o, (cond, val) in out.items():
        final = np.where(cond, val, W[:, :, m + o])
        if along_rows:
            plane[ys[:, None] + lines[None, :], (xs + o)[:, None]] = final
        else:
            plane[(ys + o)[:, None], xs[:, None] + lines[None, :]] = final


def _lf_sb(sink, py, px, vmask3, _unused, lvl_get, e_lut, i_lut, is_h,
           is_uv, bitdepth):
    """loop_filter_sb128{y,uv} over one 4px-aligned strip
    (reference src/loopfilter_tmpl.c:163-241). Collects segments into
    sink[wd] for the batched filter (is_h: filtering across VERTICAL
    edges = the reference's 'h' horizontal-tap direction)."""
    vm = vmask3[0] | vmask3[1] | (vmask3[2] if not is_uv else 0)
    i = 0
    bit = 1
    while vm & ~(bit - 1):
        if vm & bit:
            L = lvl_get(i, 0)
            if not L:
                L = lvl_get(i, -1)
            if L:
                H = L >> 4
                E, I = int(e_lut[L]), int(i_lut[L])
                if not is_uv:
                    idx = 2 if (vmask3[2] & bit) else int(bool(vmask3[1] & bit))
                    wd = 4 << idx
                else:
                    idx = int(bool(vmask3[1] & bit))
                    wd = 4 + 2 * idx
                if is_h:
                    sink[wd].append((py + 4 * i, px, E, I, H))
                else:
                    sink[wd].append((py, px + 4 * i, E, I, H))
        bit <<= 1
        i += 1


def _lf_flush(plane, sink, along_rows, bitdepth):
    for wd, segs in sink.items():
        if not segs:
            continue
        a = np.array(segs, dtype=np.int64)
        _loop_filter_batch(plane, a[:, 0], a[:, 1], a[:, 2], a[:, 3],
                           a[:, 4], along_rows, wd, bitdepth)
        segs.clear()


def loopfilter_sbrow_cols(f, sby, start_of_tile_row):
    """reference dav1d_loopfilter_sbrow_cols (src/lf_apply_tmpl.c:313)."""
    is_sb64 = int(not f.seq_hdr.sb128)
    starty4 = (sby & is_sb64) << 4
    sbsz = 32 >> is_sb64
    ss_ver, ss_hor = f.ss_ver, f.ss_hor
    endy4 = starty4 + min(f.h4 - sby * sbsz, sbsz)
    uv_endy4 = (endy4 + ss_ver) >> ss_ver
    e_lut, i_lut = f.lf_lim_lut
    mask_base = (sby >> is_sb64) * f.sb128w
    level = f.lf_level
    py0 = sby * f.sb_step * 4
    cpy0 = py0 >> ss_ver
    y_sink = {4: [], 6: [], 8: [], 16: []}
    uv_sinks = {1: {4: [], 6: [], 8: [], 16: []},
                2: {4: [], 6: [], 8: [], 16: []}}

    if f.frame_hdr.tiling.cols > 1 or (start_of_tile_row and
                                       f.frame_hdr.tiling.rows > 1):
        _fix_tile_boundaries(f, sby, starty4, endy4, uv_endy4,
                             start_of_tile_row)

    use_nat = _native is not None
    if use_nat:
        lvl_rs = level.shape[1] * 4
        lvl_base = level.ctypes.data
        e_ptr, i_ptr = e_lut.ctypes.data, i_lut.ctypes.data

    for x128 in range(f.sb128w):
        m = f.lf_masks[mask_base + x128]
        w = min(32, f.w4 - x128 * 32)
        row0 = sby * sbsz
        colb = x128 * 32
        fy = m.filter_y[0].tolist()
        for x in range(w):
            if x128 == 0 and x == 0:
                continue
            fx = fy[x]
            if not starty4:
                if endy4 > 16:
                    hm = [fx[k][0] | (fx[k][1] << 16) for k in range(3)]
                else:
                    hm = [fx[k][0] for k in range(3)]
            else:
                hm = [fx[k][1] for k in range(3)]
            if not (hm[0] | hm[1] | hm[2]):
                continue
            col = colb + x

            if use_nat:
                _native.dtpu_lf_strip(
                    f.planes[0].ctypes.data, f.planes[0].shape[1],
                    py0, col * 4, hm[0], hm[1], hm[2],
                    lvl_base + row0 * lvl_rs + col * 4, lvl_rs, -4,
                    e_ptr, i_ptr, 1, 0, f.bitdepth)
                continue

            def lvl_get(i, off, col=col):
                return int(level[row0 + i, col + off, 0])

            _lf_sb(y_sink, py0, col * 4, hm, None, lvl_get,
                   e_lut, i_lut, True, False, f.bitdepth)
    _lf_flush(f.planes[0], y_sink, True, f.bitdepth)

    if not f.frame_hdr.loopfilter.level_u and \
            not f.frame_hdr.loopfilter.level_v:
        return
    for x128 in range(f.sb128w):
        m = f.lf_masks[mask_base + x128]
        cw = (min(32, f.w4 - x128 * 32) + ss_hor) >> ss_hor
        crow0 = (sby * sbsz) >> ss_ver
        ccolb = x128 * (32 >> ss_hor)
        sh = 16 >> ss_ver
        fuv = m.filter_uv[0].tolist()
        for x in range(cw):
            if x128 == 0 and x == 0:
                continue
            fx = fuv[x]
            cs4 = starty4 >> ss_ver
            if not cs4:
                if uv_endy4 > sh:
                    hm = [fx[k][0] | (fx[k][1] << sh) for k in range(2)]
                else:
                    hm = [fx[k][0] for k in range(2)]
            else:
                hm = [fx[k][1] for k in range(2)]
            if not (hm[0] | hm[1]):
                continue
            ccol = ccolb + x
            for pl in (1, 2):
                if use_nat:
                    _native.dtpu_lf_strip(
                        f.planes[pl].ctypes.data, f.planes[pl].shape[1],
                        cpy0, ccol * 4, hm[0], hm[1], 0,
                        lvl_base + crow0 * lvl_rs + ccol * 4 + 1 + pl,
                        lvl_rs, -4, e_ptr, i_ptr, 1, 1, f.bitdepth)
                    continue

                def lvl_get(i, off, ccol=ccol, pl=pl):
                    return int(level[crow0 + i, ccol + off, 1 + pl])

                _lf_sb(uv_sinks[pl], cpy0, ccol * 4, hm + [0], None, lvl_get,
                       e_lut, i_lut, True, True, f.bitdepth)
    for pl in (1, 2):
        _lf_flush(f.planes[pl], uv_sinks[pl], True, f.bitdepth)


def loopfilter_sbrow_rows(f, sby):
    """reference dav1d_loopfilter_sbrow_rows (src/lf_apply_tmpl.c:430)."""
    have_top = sby > 0
    is_sb64 = int(not f.seq_hdr.sb128)
    starty4 = (sby & is_sb64) << 4
    sbsz = 32 >> is_sb64
    ss_ver, ss_hor = f.ss_ver, f.ss_hor
    endy4 = starty4 + min(f.h4 - sby * sbsz, sbsz)
    uv_endy4 = (endy4 + ss_ver) >> ss_ver
    e_lut, i_lut = f.lf_lim_lut
    mask_base = (sby >> is_sb64) * f.sb128w
    level = f.lf_level
    py0 = sby * f.sb_step * 4
    y_sink = {4: [], 6: [], 8: [], 16: []}
    uv_sinks = {1: {4: [], 6: [], 8: [], 16: []},
                2: {4: [], 6: [], 8: [], 16: []}}

    use_nat = _native is not None
    if use_nat:
        lvl_rs = level.shape[1] * 4
        lvl_base = level.ctypes.data
        e_ptr, i_ptr = e_lut.ctypes.data, i_lut.ctypes.data

    for x128 in range(f.sb128w):
        m = f.lf_masks[mask_base + x128]
        w = min(32, f.w4 - x128 * 32)
        colb = x128 * 32
        fy = m.filter_y[1].tolist()
        for y in range(starty4, endy4):
            if not have_top and not y:
                continue
            fr = fy[y]
            vm = [fr[k][0] | (fr[k][1] << 16) for k in range(3)]
            if not (vm[0] | vm[1] | vm[2]):
                continue
            row = sby * sbsz + (y - starty4)

            if use_nat:
                _native.dtpu_lf_strip(
                    f.planes[0].ctypes.data, f.planes[0].shape[1],
                    py0 + (y - starty4) * 4, colb * 4,
                    vm[0], vm[1], vm[2],
                    lvl_base + row * lvl_rs + colb * 4 + 1, 4, -lvl_rs,
                    e_ptr, i_ptr, 0, 0, f.bitdepth)
                continue

            def lvl_get(i, off, row=row):
                return int(level[row + off, colb + i, 1])

            _lf_sb(y_sink, py0 + (y - starty4) * 4, colb * 4, vm, None,
                   lvl_get, e_lut, i_lut, False, False, f.bitdepth)
    _lf_flush(f.planes[0], y_sink, False, f.bitdepth)

    if not f.frame_hdr.loopfilter.level_u and \
            not f.frame_hdr.loopfilter.level_v:
        return
    sh = 16 >> ss_hor
    cpy0 = py0 >> ss_ver
    for x128 in range(f.sb128w):
        m = f.lf_masks[mask_base + x128]
        ccolb = x128 * (32 >> ss_hor)
        cs4 = starty4 >> ss_ver
        fuv = m.filter_uv[1].tolist()
        for y in range(cs4, uv_endy4):
            if not have_top and not y:
                continue
            fr = fuv[y]
            vm = [fr[k][0] | (fr[k][1] << sh) for k in range(2)]
            if not (vm[0] | vm[1]):
                continue
            crow = (sby * sbsz >> ss_ver) + (y - cs4)
            for pl in (1, 2):
                if use_nat:
                    _native.dtpu_lf_strip(
                        f.planes[pl].ctypes.data, f.planes[pl].shape[1],
                        cpy0 + (y - cs4) * 4, ccolb * 4, vm[0], vm[1], 0,
                        lvl_base + crow * lvl_rs + ccolb * 4 + 1 + pl,
                        4, -lvl_rs, e_ptr, i_ptr, 0, 1, f.bitdepth)
                    continue

                def lvl_get(i, off, crow=crow, pl=pl):
                    return int(level[crow + off, ccolb + i, 1 + pl])

                _lf_sb(uv_sinks[pl], cpy0 + (y - cs4) * 4, ccolb * 4,
                       vm + [0], None, lvl_get, e_lut, i_lut, False, True,
                       f.bitdepth)
    for pl in (1, 2):
        _lf_flush(f.planes[pl], uv_sinks[pl], False, f.bitdepth)


def _fix_tile_boundaries(f, sby, starty4, endy4, uv_endy4, start_of_tile_row):
    """Cap filter strength across tile boundaries using the neighbour
    tile's edge tx sizes (reference src/lf_apply_tmpl.c:331-403)."""
    is_sb64 = int(not f.seq_hdr.sb128)
    sbl2 = 5 - is_sb64
    halign = (f.bh + 31) & ~31
    ss_ver, ss_hor = f.ss_ver, f.ss_hor
    vmax = 1 << (16 >> ss_ver)
    hmax = 1 << (16 >> ss_hor)
    mask_base = (sby >> is_sb64) * f.sb128w
    hdr = f.frame_hdr

    # tile column boundaries
    lpf_y_off = sby << sbl2
    lpf_uv_off = sby << (sbl2 - ss_ver)
    tile_col = 1
    while True:
        x = hdr.tiling.col_start_sb[tile_col]
        if (x << sbl2) >= f.bw:
            break
        bx4 = 16 if (x & is_sb64) else 0
        cbx4 = bx4 >> ss_hor
        xsb = x >> is_sb64
        m = f.lf_masks[mask_base + xsb]
        lpf_y = f.tx_lpf_right_edge[0]
        lpf_uv = f.tx_lpf_right_edge[1]

        y_hmask = m.filter_y[0][bx4]  # (3, 2)
        for y in range(starty4, endy4):
            mask = 1 << y
            sidx = int(mask >= 0x10000)
            smask = mask >> (sidx << 4)
            idx = 2 * int(bool(y_hmask[2][sidx] & smask)) + \
                int(bool(y_hmask[1][sidx] & smask))
            y_hmask[2][sidx] &= (~smask) & 0xFFFF
            y_hmask[1][sidx] &= (~smask) & 0xFFFF
            y_hmask[0][sidx] &= (~smask) & 0xFFFF
            cap = int(lpf_y[lpf_y_off + y - starty4])
            y_hmask[min(idx, cap)][sidx] |= smask

        if f.layout != PixelLayout.I400:
            uv_hmask = m.filter_uv[0][cbx4]  # (2, 2)
            for y in range(starty4 >> ss_ver, uv_endy4):
                uv_mask = 1 << y
                sidx = int(uv_mask >= vmax)
                smask = uv_mask >> (sidx << (4 - ss_ver))
                idx = int(bool(uv_hmask[1][sidx] & smask))
                uv_hmask[1][sidx] &= (~smask) & 0xFFFF
                uv_hmask[0][sidx] &= (~smask) & 0xFFFF
                cap = int(lpf_uv[lpf_uv_off + y - (starty4 >> ss_ver)])
                uv_hmask[min(idx, cap)][sidx] |= smask
        lpf_y_off += halign
        lpf_uv_off += halign >> ss_ver
        tile_col += 1

    # tile row boundaries
    if start_of_tile_row:
        for x in range(f.sb128w):
            a = f.a[f.sb128w * (start_of_tile_row - 1) + x]
            m = f.lf_masks[mask_base + x]
            y_vmask = m.filter_y[1][starty4]
            w = min(32, f.w4 - (x << 5))
            for i in range(w):
                mask = 1 << i
                sidx = int(mask >= 0x10000)
                smask = mask >> (sidx << 4)
                idx = 2 * int(bool(y_vmask[2][sidx] & smask)) + \
                    int(bool(y_vmask[1][sidx] & smask))
                y_vmask[2][sidx] &= (~smask) & 0xFFFF
                y_vmask[1][sidx] &= (~smask) & 0xFFFF
                y_vmask[0][sidx] &= (~smask) & 0xFFFF
                y_vmask[min(idx, int(a.tx_lpf_y[i]))][sidx] |= smask

            if f.layout != PixelLayout.I400:
                cw = (w + ss_hor) >> ss_hor
                uv_vmask = m.filter_uv[1][starty4 >> ss_ver]
                for i in range(cw):
                    uv_mask = 1 << i
                    sidx = int(uv_mask >= hmax)
                    smask = uv_mask >> (sidx << (4 - ss_hor))
                    idx = int(bool(uv_vmask[1][sidx] & smask))
                    uv_vmask[1][sidx] &= (~smask) & 0xFFFF
                    uv_vmask[0][sidx] &= (~smask) & 0xFFFF
                    uv_vmask[min(idx, int(a.tx_lpf_uv[i]))][sidx] |= smask


def _decomp_tx(txa, from_tx, depth, y_off, x_off, tx_masks, y0, x0):
    """reference decomp_tx (src/lf_mask.c:40-77). txa: (2,2,32,32) uint8."""
    t_dim = tables.txfm_info()[from_tx]
    tw, th = int(t_dim[0]), int(t_dim[1])
    is_split = 0 if (from_tx == 0 or depth > 1) else \
        (tx_masks[depth] >> (y_off * 4 + x_off)) & 1
    if is_split:
        sub = int(t_dim[6])
        htw4, hth4 = tw >> 1, th >> 1
        _decomp_tx(txa, sub, depth + 1, y_off * 2, x_off * 2, tx_masks,
                   y0, x0)
        if tw >= th:
            _decomp_tx(txa, sub, depth + 1, y_off * 2, x_off * 2 + 1,
                       tx_masks, y0, x0 + htw4)
        if th >= tw:
            _decomp_tx(txa, sub, depth + 1, y_off * 2 + 1, x_off * 2,
                       tx_masks, y0 + hth4, x0)
            if tw >= th:
                _decomp_tx(txa, sub, depth + 1, y_off * 2 + 1, x_off * 2 + 1,
                           tx_masks, y0 + hth4, x0 + htw4)
    else:
        lw, lh = min(2, int(t_dim[2])), min(2, int(t_dim[3]))
        txa[0, 0, y0 : y0 + th, x0 : x0 + tw] = lw
        txa[1, 0, y0 : y0 + th, x0 : x0 + tw] = lh
        txa[0, 1, y0 : y0 + th, x0] = tw
        txa[1, 1, y0, x0 : x0 + tw] = th


def mask_edges_inter(masks_y, by4, bx4, w4, h4, skip, max_tx, tx_masks,
                     a, a_off, l, l_off):
    """reference mask_edges_inter (src/lf_mask.c:79-147)."""
    ti = tables.txfm_info()
    if _native is not None:
        _native.dtpu_mask_edges_inter(
            masks_y.ctypes.data, by4, bx4, w4, h4, skip, max_tx,
            int(tx_masks[0]), int(tx_masks[1]), ti.ctypes.data,
            a.ctypes.data + a_off, l.ctypes.data + l_off)
        return
    t_dim = ti[max_tx]
    tw, th = int(t_dim[0]), int(t_dim[1])
    txa = np.zeros((2, 2, 32, 32), dtype=np.uint8)
    y_off = 0
    y = 0
    while y < h4:
        x_off = 0
        x = 0
        while x < w4:
            _decomp_tx(txa, max_tx, 0, y_off, x_off, tx_masks, y, x)
            x += tw
            x_off += 1
        y += th
        y_off += 1

    # left block edge
    mask = 1 << by4
    for y in range(h4):
        sidx = int(mask >= 0x10000)
        smask = mask >> (sidx << 4)
        masks_y[0][bx4][min(int(txa[0, 0, y, 0]), int(l[l_off + y]))][sidx] \
            |= smask
        mask <<= 1
    # top block edge
    mask = 1 << bx4
    for x in range(w4):
        sidx = int(mask >= 0x10000)
        smask = mask >> (sidx << 4)
        masks_y[1][by4][min(int(txa[1, 0, 0, x]), int(a[a_off + x]))][sidx] \
            |= smask
        mask <<= 1

    if not skip:
        # inner (tx) left|right edges
        mask = 1 << by4
        for y in range(h4):
            sidx = int(mask >= 0x10000)
            smask = mask >> (sidx << 4)
            ltx = int(txa[0, 0, y, 0])
            step = int(txa[0, 1, y, 0])
            x = step
            while x < w4:
                rtx = int(txa[0, 0, y, x])
                masks_y[0][bx4 + x][min(rtx, ltx)][sidx] |= smask
                ltx = rtx
                step = int(txa[0, 1, y, x])
                x += step
            mask <<= 1
        # inner (tx) top|bottom edges
        mask = 1 << bx4
        for x in range(w4):
            sidx = int(mask >= 0x10000)
            smask = mask >> (sidx << 4)
            ttx = int(txa[1, 0, 0, x])
            step = int(txa[1, 1, 0, x])
            y = step
            while y < h4:
                btx = int(txa[1, 0, y, x])
                masks_y[1][by4 + y][min(ttx, btx)][sidx] |= smask
                ttx = btx
                step = int(txa[1, 1, y, x])
                y += step
            mask <<= 1

    for y in range(h4):
        l[l_off + y] = txa[0, 0, y, w4 - 1]
    a[a_off : a_off + w4] = txa[1, 0, h4 - 1, :w4]


def create_lf_mask_inter(lflvl, level_cache, b4_stride, filter_level,
                         bx, by, iw, ih, skip, bs, max_ytx, tx_masks, uvtx,
                         layout, ay, ay_off, ly, ly_off,
                         auv, auv_off, luv, luv_off):
    """reference dav1d_create_lf_mask_inter (src/lf_mask.c:322-384)."""
    b_dim = tables.block_dimensions[bs]
    bw4 = min(iw - bx, int(b_dim[0]))
    bh4 = min(ih - by, int(b_dim[1]))
    bx4 = bx & 31
    by4 = by & 31

    if bw4 and bh4:
        level_cache[by : by + bh4, bx : bx + bw4, 0] = filter_level[0][0][0]
        level_cache[by : by + bh4, bx : bx + bw4, 1] = filter_level[1][0][0]
        mask_edges_inter(lflvl.filter_y, by4, bx4, bw4, bh4, skip, max_ytx,
                         tx_masks, ay, ay_off, ly, ly_off)

    if auv is None:
        return
    ss_ver = int(layout == PixelLayout.I420)
    ss_hor = int(layout != PixelLayout.I444)
    cbw4 = min(((iw + ss_hor) >> ss_hor) - (bx >> ss_hor),
               (int(b_dim[0]) + ss_hor) >> ss_hor)
    cbh4 = min(((ih + ss_ver) >> ss_ver) - (by >> ss_ver),
               (int(b_dim[1]) + ss_ver) >> ss_ver)
    if cbw4 <= 0 or cbh4 <= 0:
        return
    cbx4 = bx4 >> ss_hor
    cby4 = by4 >> ss_ver
    cy, cx = by >> ss_ver, bx >> ss_hor
    level_cache[cy : cy + cbh4, cx : cx + cbw4, 2] = filter_level[2][0][0]
    level_cache[cy : cy + cbh4, cx : cx + cbw4, 3] = filter_level[3][0][0]
    mask_edges_chroma(lflvl.filter_uv, cby4, cbx4, cbw4, cbh4, skip, uvtx,
                      auv, auv_off, luv, luv_off, ss_hor, ss_ver)
