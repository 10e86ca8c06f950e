"""CDEF: constrained directional enhancement filter (golden numpy model).

Behavioral parity with reference src/cdef_tmpl.c (cdef_filter_block_c :106,
cdef_find_dir_c :239, padding :56) and src/cdef_apply_tmpl.c (dav1d_cdef_brow
:100). Applied full-frame after deblocking; every unit reads pre-CDEF
(deblocked) pixels from a frame copy, which matches the reference's
top/left/right backup-line scheme exactly."""

from __future__ import annotations

import numpy as np

INT16_MIN = -32768

HAVE_LEFT = 1
HAVE_RIGHT = 2
HAVE_TOP = 4
HAVE_BOTTOM = 8

# (dy, dx) per [2 + dir + 2][pass] (reference src/tables.c:400
# dav1d_cdef_directions, offsets decomposed from o = dy*12 + dx)
CDEF_DIRECTIONS = [
    ((1, 0), (2, 0)),    # 6
    ((1, 0), (2, -1)),   # 7
    ((-1, 1), (-2, 2)),  # 0
    ((0, 1), (-1, 2)),   # 1
    ((0, 1), (0, 2)),    # 2
    ((0, 1), (1, 2)),    # 3
    ((1, 1), (2, 2)),    # 4
    ((1, 0), (2, 1)),    # 5
    ((1, 0), (2, 0)),    # 6
    ((1, 0), (2, -1)),   # 7
    ((-1, 1), (-2, 2)),  # 0
    ((0, 1), (-1, 2)),   # 1
]

UV_DIRS_420 = list(range(8))
UV_DIRS_422 = [7, 0, 2, 4, 5, 6, 6, 6]


def _ulog2(v: int) -> int:
    return v.bit_length() - 1


def cdef_find_dir(img: np.ndarray, bitdepth: int):
    """8x8 direction search. Returns (dir, variance)
    (reference cdef_find_dir_c)."""
    shift = bitdepth - 8
    px = (img.astype(np.int64) >> shift) - 128
    ys, xs = np.mgrid[0:8, 0:8]
    psum_hv = np.zeros((2, 8), np.int64)
    psum_diag = np.zeros((2, 15), np.int64)
    psum_alt = np.zeros((4, 11), np.int64)
    np.add.at(psum_diag[0], (ys + xs).ravel(), px.ravel())
    np.add.at(psum_alt[0], (ys + (xs >> 1)).ravel(), px.ravel())
    np.add.at(psum_hv[0], ys.ravel(), px.ravel())
    np.add.at(psum_alt[1], (3 + ys - (xs >> 1)).ravel(), px.ravel())
    np.add.at(psum_diag[1], (7 + ys - xs).ravel(), px.ravel())
    np.add.at(psum_alt[2], (3 - (ys >> 1) + xs).ravel(), px.ravel())
    np.add.at(psum_hv[1], xs.ravel(), px.ravel())
    np.add.at(psum_alt[3], ((ys >> 1) + xs).ravel(), px.ravel())

    cost = [0] * 8
    cost[2] = int((psum_hv[0] * psum_hv[0]).sum()) * 105
    cost[6] = int((psum_hv[1] * psum_hv[1]).sum()) * 105
    div_table = [840, 420, 280, 210, 168, 140, 120]
    for n in range(7):
        d = div_table[n]
        cost[0] += int(psum_diag[0][n] ** 2 + psum_diag[0][14 - n] ** 2) * d
        cost[4] += int(psum_diag[1][n] ** 2 + psum_diag[1][14 - n] ** 2) * d
    cost[0] += int(psum_diag[0][7] ** 2) * 105
    cost[4] += int(psum_diag[1][7] ** 2) * 105
    for n in range(4):
        c = 0
        for m in range(5):
            c += int(psum_alt[n][3 + m] ** 2)
        c *= 105
        for m in range(3):
            d = div_table[2 * m + 1]
            c += int(psum_alt[n][m] ** 2 + psum_alt[n][10 - m] ** 2) * d
        cost[n * 2 + 1] = c

    best_dir = 0
    best_cost = cost[0]
    for n in range(1, 8):
        if cost[n] > best_cost:
            best_cost = cost[n]
            best_dir = n
    var = (best_cost - cost[best_dir ^ 4]) >> 10
    return best_dir, var


def _constrain(diff, threshold: int, shift: int):
    adiff = np.abs(diff)
    t = adiff >> shift
    np.subtract(threshold, t, out=t)
    np.maximum(t, 0, out=t)
    np.minimum(t, adiff, out=t)
    np.negative(t, out=adiff)
    return np.where(diff < 0, adiff, t)


def _pad(src, y0, x0, w, h, edges):
    """(h+4, w+4) int64 buffer, INT16_MIN outside available edges
    (reference padding())."""
    tmp = np.full((h + 4, w + 4), INT16_MIN, np.int64)
    x_start, x_end = -2, w + 2
    y_start, y_end = -2, h + 2
    if not (edges & HAVE_TOP):
        y_start = 0
    if not (edges & HAVE_BOTTOM):
        y_end = h
    if not (edges & HAVE_LEFT):
        x_start = 0
    if not (edges & HAVE_RIGHT):
        x_end = w
    tmp[2 + y_start : 2 + y_end, 2 + x_start : 2 + x_end] = \
        src[y0 + y_start : y0 + y_end, x0 + x_start : x0 + x_end]
    return tmp


def cdef_filter_block(dst, src, y0, x0, w, h, pri_strength, sec_strength,
                      dir_, damping, edges, bitdepth):
    """Filter one unit in place; src is the pre-CDEF frame copy
    (reference cdef_filter_block_c)."""
    tmp = _pad(src, y0, x0, w, h, edges)
    body = tmp[2 : 2 + h, 2 : 2 + w]
    px = src[y0 : y0 + h, x0 : x0 + w].astype(np.int64)
    assert (body == px).all()

    def tap_view(dy, dx):
        return tmp[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]

    sum_ = np.zeros((h, w), np.int64)
    if pri_strength:
        bdmin8 = bitdepth - 8
        pri_tap = 4 - ((pri_strength >> bdmin8) & 1)
        pri_shift = max(0, damping - _ulog2(pri_strength))
        if sec_strength:
            sec_shift = damping - _ulog2(sec_strength)
            mn = px.copy()
            mx = px.copy()

            def acc_minmax(v):
                nonlocal mn, mx
                # umin: INT16_MIN reads as a huge unsigned value
                u = np.where(v == INT16_MIN, np.int64(0xFFFF8000), v)
                mn = np.minimum(mn, u)
                mx = np.maximum(mx, v)

            pri_tap_k = pri_tap
            for k in range(2):
                dy, dx = CDEF_DIRECTIONS[2 + dir_][k]
                p0 = tap_view(dy, dx)
                p1 = tap_view(-dy, -dx)
                sum_ += pri_tap_k * _constrain(p0 - px, pri_strength,
                                               pri_shift)
                sum_ += pri_tap_k * _constrain(p1 - px, pri_strength,
                                               pri_shift)
                pri_tap_k = (pri_tap_k & 3) | 2
                acc_minmax(p0)
                acc_minmax(p1)
                sec_tap = 2 - k
                for sdir in (4 + dir_, dir_):
                    dy2, dx2 = CDEF_DIRECTIONS[sdir][k]
                    for sgn in (1, -1):
                        s = tap_view(sgn * dy2, sgn * dx2)
                        sum_ += sec_tap * _constrain(s - px, sec_strength,
                                                     sec_shift)
                        acc_minmax(s)
            out = px + ((sum_ - (sum_ < 0) + 8) >> 4)
            out = np.clip(out, mn, mx)
        else:
            pri_tap_k = pri_tap
            for k in range(2):
                dy, dx = CDEF_DIRECTIONS[2 + dir_][k]
                p0 = tap_view(dy, dx)
                p1 = tap_view(-dy, -dx)
                sum_ += pri_tap_k * _constrain(p0 - px, pri_strength,
                                               pri_shift)
                sum_ += pri_tap_k * _constrain(p1 - px, pri_strength,
                                               pri_shift)
                pri_tap_k = (pri_tap_k & 3) | 2
            out = px + ((sum_ - (sum_ < 0) + 8) >> 4)
    else:
        assert sec_strength
        sec_shift = damping - _ulog2(sec_strength)
        for k in range(2):
            sec_tap = 2 - k
            for sdir in (4 + dir_, dir_):
                dy2, dx2 = CDEF_DIRECTIONS[sdir][k]
                for sgn in (1, -1):
                    s = tap_view(sgn * dy2, sgn * dx2)
                    sum_ += sec_tap * _constrain(s - px, sec_strength,
                                                 sec_shift)
        out = px + ((sum_ - (sum_ < 0) + 8) >> 4)
    dst[y0 : y0 + h, x0 : x0 + w] = out


_DIR_DY = np.array([[d[0][0] for d in CDEF_DIRECTIONS],
                    [d[1][0] for d in CDEF_DIRECTIONS]])  # (2 pass, 12)
_DIR_DX = np.array([[d[0][1] for d in CDEF_DIRECTIONS],
                    [d[1][1] for d in CDEF_DIRECTIONS]])


def _onehot_maps():
    """One-hot projection matrices for the batched direction search:
    (64, bins) per psum accumulator."""
    ys, xs = np.mgrid[0:8, 0:8]
    maps = [
        ((ys + xs).ravel(), 15),          # diag0
        ((ys + (xs >> 1)).ravel(), 11),   # alt0
        (ys.ravel(), 8),                  # hv0
        ((3 + ys - (xs >> 1)).ravel(), 11),
        ((7 + ys - xs).ravel(), 15),
        ((3 - (ys >> 1) + xs).ravel(), 11),
        (xs.ravel(), 8),
        (((ys >> 1) + xs).ravel(), 11),
    ]
    out = []
    for idx, bins in maps:
        m = np.zeros((64, bins), dtype=np.int64)
        m[np.arange(64), idx] = 1
        out.append(m)
    return out


_ONEHOT = None


def cdef_find_dir_batch(blocks, bitdepth):
    """(N, 8, 8) -> (dirs (N,), vars (N,)) (vectorized cdef_find_dir_c).
    Dispatches to the native C kernel when available
    (dav1d_tpu/native/filters.c, bit-identical)."""
    from ..native import lib as _nlib
    if _nlib is not None:
        blk = np.ascontiguousarray(blocks.reshape(-1, 64), dtype=np.int32)
        n = blk.shape[0]
        dirs = np.empty(n, dtype=np.int64)
        variances = np.empty(n, dtype=np.int64)
        _nlib.dtpu_cdef_find_dir_batch(blk.ctypes.data, n, int(bitdepth),
                                       dirs.ctypes.data,
                                       variances.ctypes.data)
        return dirs, variances
    return cdef_find_dir_batch_np(blocks, bitdepth)


def cdef_find_dir_batch_np(blocks, bitdepth):
    """Golden numpy batch (the device-kernel shape: one-hot projection
    matmuls; see cdef_find_dir_batch for the native dispatch)."""
    global _ONEHOT
    if _ONEHOT is None:
        _ONEHOT = _onehot_maps()
    shift = bitdepth - 8
    px = (blocks.reshape(-1, 64).astype(np.int64) >> shift) - 128
    psum = [px @ m for m in _ONEHOT]
    diag0, alt0, hv0, alt1, diag1, alt2, hv1, alt3 = psum
    N = px.shape[0]
    cost = np.zeros((N, 8), dtype=np.int64)
    cost[:, 2] = (hv0 * hv0).sum(axis=1) * 105
    cost[:, 6] = (hv1 * hv1).sum(axis=1) * 105
    div = np.array([840, 420, 280, 210, 168, 140, 120], dtype=np.int64)
    for diag, ci in ((diag0, 0), (diag1, 4)):
        sq = diag * diag
        cost[:, ci] = ((sq[:, :7] + sq[:, 8:][:, ::-1]) * div).sum(axis=1) \
            + sq[:, 7] * 105
    div_alt = np.array([420, 210, 140], dtype=np.int64)
    for n, alt in enumerate((alt0, alt1, alt2, alt3)):
        sq = alt * alt
        c = sq[:, 3:8].sum(axis=1) * 105
        c += ((sq[:, :3] + sq[:, 8:][:, ::-1]) * div_alt).sum(axis=1)
        cost[:, n * 2 + 1] = c
    best = np.argmax(cost, axis=1)
    best_cost = np.take_along_axis(cost, best[:, None], 1)[:, 0]
    alt_cost = np.take_along_axis(cost, (best ^ 4)[:, None], 1)[:, 0]
    return best.astype(np.int64), (best_cost - alt_cost) >> 10


def cdef_filter_batch(canvas, ys, xs, w, h, pri, sec, dirs, damping,
                      bitdepth):
    """Filter a batch of (h, w) units. canvas: plane with a 2px INT16_MIN
    border (border index 0); ys/xs: unit top-left in canvas coordinates
    (i.e. +2). Returns (N, h, w) filtered pixels
    (vectorized cdef_filter_block_c). Dispatches to the native C kernel
    when available (dav1d_tpu/native/filters.c, bit-identical)."""
    from ..native import lib as _nlib
    if _nlib is not None:
        c = np.ascontiguousarray(canvas, dtype=np.int32)
        ysa = np.ascontiguousarray(ys, dtype=np.int64)
        xsa = np.ascontiguousarray(xs, dtype=np.int64)
        pa = np.ascontiguousarray(pri, dtype=np.int64)
        sa = np.ascontiguousarray(sec, dtype=np.int64)
        da = np.ascontiguousarray(dirs, dtype=np.int64)
        out = np.empty((len(ysa), h, w), dtype=np.int32)
        _nlib.dtpu_cdef_filter_batch(
            c.ctypes.data, c.shape[1], ysa.ctypes.data, xsa.ctypes.data,
            len(ysa), w, h, pa.ctypes.data, sa.ctypes.data, da.ctypes.data,
            int(damping), int(bitdepth), out.ctypes.data)
        return out
    return cdef_filter_batch_np(canvas, ys, xs, w, h, pri, sec, dirs,
                                damping, bitdepth)


def cdef_filter_batch_np(canvas, ys, xs, w, h, pri, sec, dirs, damping,
                         bitdepth):
    """Golden numpy batch (the device kernel shape; see cdef_filter_batch
    for the native dispatch)."""
    N = len(ys)
    yy = (ys[:, None, None] + np.arange(-2, h + 2)[None, :, None])
    xx = (xs[:, None, None] + np.arange(-2, w + 2)[None, None, :])
    # one gather of the padded per-unit windows; all taps then index the
    # small contiguous (N, h+4, w+4) buffer instead of the full plane
    tmp = np.ascontiguousarray(canvas[yy, xx], dtype=np.int32)
    px = np.ascontiguousarray(tmp[:, 2 : 2 + h, 2 : 2 + w])

    bdmin8 = bitdepth - 8
    pri_nz = pri > 0
    sec_nz = sec > 0
    both = pri_nz & sec_nz
    safe_pri = np.maximum(pri, 1)
    safe_sec = np.maximum(sec, 1)
    def ulog2(v):
        # exact for the small positive strengths involved
        return (np.frexp(v.astype(np.float64))[1] - 1).astype(np.int64)

    pri_shift = np.maximum(0, damping - ulog2(safe_pri)) \
        .astype(np.int32)[:, None, None]
    sec_shift = (damping - ulog2(safe_sec)).astype(np.int32)[:, None, None]
    pri_thr = pri.astype(np.int32)[:, None, None]
    sec_thr = sec.astype(np.int32)[:, None, None]
    pri_tap = (4 - ((pri >> bdmin8) & 1)).astype(np.int32)[:, None, None]

    nidx = np.arange(N)[:, None, None]
    hidx = np.arange(h)[None, :, None]
    widx = np.arange(w)[None, None, :]

    def tap(dy, dx):
        iy = 2 + dy[:, None, None] + hidx
        ix = 2 + dx[:, None, None] + widx
        return tmp[nidx, iy, ix]

    sum_ = np.zeros((N, h, w), dtype=np.int32)
    mn = px.copy()
    mx = px.copy()

    def acc_minmax(v):
        nonlocal mn, mx
        # any value above the pixel range works as the "ignore" sentinel
        # for the unsigned-min trick (golden uses 0xFFFF8000)
        u = np.where(v == INT16_MIN, np.int32(0x7FFF0000), v)
        np.minimum(mn, u, out=mn)
        np.maximum(mx, v, out=mx)

    for k in range(2):
        dy = _DIR_DY[k][2 + dirs]
        dx = _DIR_DX[k][2 + dirs]
        p0 = tap(dy, dx)
        p1 = tap(-dy, -dx)
        ptk = pri_tap if k == 0 else (pri_tap & 3) | 2
        pc = ptk * (_constrain(p0 - px, pri_thr, pri_shift)
                    + _constrain(p1 - px, pri_thr, pri_shift))
        sum_ += np.where(pri_nz[:, None, None], pc, 0)
        acc_minmax(np.where(both[:, None, None], p0, px))
        acc_minmax(np.where(both[:, None, None], p1, px))
        sec_tap = 2 - k
        for sdir_off in (4, 0):
            dy2 = _DIR_DY[k][sdir_off + dirs]
            dx2 = _DIR_DX[k][sdir_off + dirs]
            for sgn in (1, -1):
                s = tap(sgn * dy2, sgn * dx2)
                sc = sec_tap * _constrain(s - px, sec_thr, sec_shift)
                sum_ += np.where(sec_nz[:, None, None], sc, 0)
                acc_minmax(np.where(both[:, None, None], s, px))

    out = px + ((sum_ - (sum_ < 0) + 8) >> 4)
    clipped = np.clip(out, mn, mx)
    return np.where(both[:, None, None], clipped, out)


def adjust_strength(strength: int, var: int) -> int:
    if not var:
        return 0
    i = min(_ulog2(var >> 6), 12) if (var >> 6) else 0
    return (strength * (4 + i) + 8) >> 4


def cdef_frame(f) -> None:
    """Full-frame CDEF (reference dav1d_cdef_brow, single-tile pipeline).
    Every unit reads pre-CDEF deblocked pixels from the frame copy, which
    reproduces the reference's cdef_line/lr_bak backups."""
    from ..headers import PixelLayout
    hdr = f.frame_hdr
    seq = f.seq_hdr
    bitdepth = f.bitdepth
    bdmin8 = bitdepth - 8
    damping = hdr.cdef.damping + bdmin8
    layout = f.layout
    ss_ver = int(layout == PixelLayout.I420)
    ss_hor = int(layout != PixelLayout.I444)
    has_chroma = layout != PixelLayout.I400
    uv_dir_map = UV_DIRS_422 if layout == PixelLayout.I422 else UV_DIRS_420

    sb64w = (f.bw + 15) >> 4

    # collect units (cheap host loop), then filter each plane as one batch
    # (the batched form is the device kernel shape: direction search =
    # one-hot matmuls, filtering = per-tap gathers over (N, h, w) lanes)
    dir_blocks = []  # (by, bx) needing direction search
    units = []       # (pl, by, bx, pri-or-None-for-adjust, sec, use_dir)
    for by in range(0, f.bh, 2):
        for sbx in range(sb64w):
            cdef_idx = int(f.cdef_idx[by >> 4, sbx])
            if cdef_idx == -1:
                continue
            y_lvl = hdr.cdef.y_strength[cdef_idx]
            uv_lvl = hdr.cdef.uv_strength[cdef_idx]
            if not y_lvl and not uv_lvl:
                continue
            y_pri = (y_lvl >> 2) << bdmin8
            y_sec = y_lvl & 3
            y_sec += int(y_sec == 3)
            y_sec <<= bdmin8
            uv_pri = (uv_lvl >> 2) << bdmin8
            uv_sec = uv_lvl & 3
            uv_sec += int(uv_sec == 3)
            uv_sec <<= bdmin8
            for bx in range(sbx * 16, min((sbx + 1) * 16, f.bw), 2):
                if not f.noskip[by >> 1, bx : bx + 2].any():
                    continue
                need_dir = bool(y_pri or uv_pri)
                dir_idx = -1
                if need_dir:
                    dir_idx = len(dir_blocks)
                    dir_blocks.append((by, bx))
                units.append((by, bx, y_pri, y_sec, uv_pri, uv_sec,
                              bool(uv_lvl), dir_idx))
    if not units:
        return

    # The jitted device CDEF (ops/cdef.py) is dispatch/transfer-bound on
    # this environment's tunneled single chip (1080p: ~4.3s device vs
    # ~1.7s for the host batch once the allocator keeps buffers hot, see
    # dav1d_tpu.__init__._tune_malloc), so the host batch is the default;
    # co-located deployments set DAV1D_TPU_CDEF_DEVICE_MIN to the unit
    # count where the device wins.
    import os
    thresh = int(os.environ.get("DAV1D_TPU_CDEF_DEVICE_MIN", 1 << 30))
    use_device = len(units) >= thresh
    if use_device:
        from ..ops import cdef as dcdef
    src0 = f.planes[0]
    if dir_blocks:
        dbys = np.array([by * 4 for by, _ in dir_blocks])
        dbxs = np.array([bx * 4 for _, bx in dir_blocks])
        ar8 = np.arange(8)
        blk = src0[dbys[:, None, None] + ar8[None, :, None],
                   dbxs[:, None, None] + ar8[None, None, :]]
        if use_device:
            dirs_arr, vars_arr = dcdef.cdef_find_dir_batch(blk, bitdepth)
        else:
            dirs_arr, vars_arr = cdef_find_dir_batch(blk, bitdepth)
    plane_units = {0: [], 1: [], 2: []}
    for by, bx, y_pri, y_sec, uv_pri, uv_sec, uv_on, dir_idx in units:
        dir_ = int(dirs_arr[dir_idx]) if dir_idx >= 0 else 0
        var = int(vars_arr[dir_idx]) if dir_idx >= 0 else 0
        if y_pri:
            adj = adjust_strength(y_pri, var)
            if adj or y_sec:
                plane_units[0].append((by * 4, bx * 4, adj, y_sec, dir_))
        elif y_sec:
            plane_units[0].append((by * 4, bx * 4, 0, y_sec, 0))
        if uv_on and has_chroma:
            uvdir = uv_dir_map[dir_] if uv_pri else 0
            cy0 = (by * 4) >> ss_ver
            cx0 = (bx * 4) >> ss_hor
            for pl in (1, 2):
                plane_units[pl].append((cy0, cx0, uv_pri, uv_sec, uvdir))

    for pl in range(3 if has_chroma else 1):
        ul = plane_units[pl]
        if not ul:
            continue
        sv = ss_ver if pl else 0
        sh = ss_hor if pl else 0
        w, h = 8 >> sh, 8 >> sv
        pw, ph = (f.bw * 4) >> sh, (f.bh * 4) >> sv
        canvas = np.empty((ph + 4, pw + 4), dtype=np.int32)
        canvas[:2] = INT16_MIN
        canvas[-2:] = INT16_MIN
        canvas[:, :2] = INT16_MIN
        canvas[:, -2:] = INT16_MIN
        canvas[2 : 2 + ph, 2 : 2 + pw] = f.planes[pl][:ph, :pw]
        ys = np.array([u[0] + 2 for u in ul])
        xs = np.array([u[1] + 2 for u in ul])
        pri = np.array([u[2] for u in ul], dtype=np.int64)
        sec = np.array([u[3] for u in ul], dtype=np.int64)
        dirs = np.array([u[4] for u in ul], dtype=np.int64)
        fb = dcdef.cdef_filter_batch if use_device else cdef_filter_batch
        out = fb(canvas, ys, xs, w, h, pri, sec, dirs,
                 damping - (1 if pl else 0), bitdepth)
        for i, u in enumerate(ul):
            f.planes[pl][u[0] : u[0] + h, u[1] : u[1] + w] = out[i]
