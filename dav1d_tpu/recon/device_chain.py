"""Device-resident in-loop filter chain.

The per-family device tiers (ops/lf.py, ops/cdef.py) are exact but
historically round-tripped the frame per call — the dominant cost when
the chip is not co-located.  This module runs the post-reconstruction
filter chain the TPU-native way (SURVEY §7 design stance: full-frame
batched stages, not per-sbrow wavefronts): the reconstructed planes are
uploaded ONCE per frame in their narrow storage dtype, deblock and CDEF
execute as chained XLA programs against the resident arrays (CDEF's
direction search gathers its 8x8 blocks from the resident luma; its
filter builds the sentinel canvas, filters and scatters inside one
program), and the result is downloaded once.  Reference flow:
dav1d_loopfilter_sbrow_* -> dav1d_cdef_brow (src/lf_apply_tmpl.c:313,
src/cdef_apply_tmpl.c:40); equivalence of the full-frame formulation is
argued in recon/lf.py and recon/cdef.py.

Super-resolution frames fall back to the host chain (the horizontal
resample sits mid-chain and is host-only); loop restoration runs after
the download via the existing host/device dispatch (its stripe gather
reads the post-deblock `pre_cdef` snapshot, which this module downloads
at the right point in the chain).
"""

from __future__ import annotations

import numpy as np


def filter_chain_device(f) -> bool:
    """Run deblock -> CDEF on device-resident planes.  Returns False
    when the frame needs the host chain instead (super-res active, or
    no stage enabled)."""
    hdr = f.frame_hdr
    if hdr.width[0] != hdr.width[1]:
        return False
    from ..headers import PixelLayout

    seq = f.seq_hdr
    lf = hdr.loopfilter
    do_deblock = (lf.level_y[0] or lf.level_y[1]) \
        and (f.inloop_filters & 1)
    do_cdef = seq.cdef and not hdr.allow_intrabc and not hdr.all_lossless \
        and (any(hdr.cdef.y_strength) or any(hdr.cdef.uv_strength)) \
        and (f.inloop_filters & 2)
    do_lr = f.restore_planes and (f.inloop_filters & 4)
    if not (do_deblock or do_cdef):
        return False

    import jax
    import jax.numpy as jnp

    narrow = np.uint8 if f.bitdepth == 8 else np.uint16
    dev = [jnp.asarray(jax.device_put(p.astype(narrow)), jnp.int32)
           for p in f.planes]

    if do_deblock:
        from ..ops.lf import loop_filter_batch
        from .lf import _collect_edges, _fix_tile_boundaries

        if hdr.tiling.cols > 1 or hdr.tiling.rows > 1:
            _fix_tile_boundaries(f)
        e_lut, i_lut = f.lf_lim_lut
        level = f.lf_level
        ch4 = (f.h4 + f.ss_ver) >> f.ss_ver
        cw4 = (f.w4 + f.ss_hor) >> f.ss_hor
        do_uv = f.layout != PixelLayout.I400 and \
            (lf.level_u or lf.level_v)
        y_wd = {1: 4, 2: 8, 3: 16}
        uv_wd = {1: 4, 2: 6}
        for dir_ in (0, 1):  # vertical edges first, then horizontal
            jobs = [(0, f.lf_wd_y[dir_], dir_, y_wd, f.h4, f.w4)]
            if do_uv:
                jobs += [(pl, f.lf_wd_uv[dir_], 1 + pl, uv_wd, ch4, cw4)
                         for pl in (1, 2)]
            for pl, wd_plane, pd_idx, wd_map, n_rows, n_cols in jobs:
                ys, xs, cls, L = _collect_edges(level, wd_plane, pd_idx,
                                                dir_, n_rows, n_cols)
                if ys.size == 0:
                    continue
                E = e_lut[L].astype(np.int64)
                I = i_lut[L].astype(np.int64)
                H = L >> 4
                for c, wd_px in wd_map.items():
                    sel = cls == c
                    if not sel.any():
                        continue
                    dev[pl] = loop_filter_batch(
                        dev[pl], ys[sel] * 4, xs[sel] * 4, E[sel],
                        I[sel], H[sel], dir_ == 0, wd_px, f.bitdepth)

    if do_lr:
        # post-deblock / pre-CDEF snapshot for the LR stripe reads
        # (reference dav1d_copy_lpf, src/lf_apply_tmpl.c:104)
        f.pre_cdef = [np.asarray(x).astype(np.int32) for x in dev]
    else:
        f.pre_cdef = None

    if do_cdef:
        from ..ops.cdef import (cdef_filter_plane_dev,
                                cdef_find_dir_plane_dev)
        from .cdef import UV_DIRS_420, UV_DIRS_422, cdef_collect

        units = cdef_collect(f)
        if units is not None:
            bys, bxs, y_pri, y_sec, uv_pri, uv_sec, uvlvl = units
            bdmin8 = f.bitdepth - 8
            damping = hdr.cdef.damping + bdmin8
            ss_ver = int(f.layout == PixelLayout.I420)
            ss_hor = int(f.layout != PixelLayout.I444)
            has_chroma = f.layout != PixelLayout.I400
            uv_dir_map = UV_DIRS_422 if f.layout == PixelLayout.I422 \
                else UV_DIRS_420

            need_dir = (y_pri | uv_pri) > 0
            dirs = np.zeros(bys.size, dtype=np.int64)
            variances = np.zeros(bys.size, dtype=np.int64)
            if need_dir.any():
                d, v = cdef_find_dir_plane_dev(
                    dev[0], bys[need_dir] * 4, bxs[need_dir] * 4,
                    f.bitdepth)
                dirs[need_dir] = d
                variances[need_dir] = v

            # vectorized adjust_strength (reference adjust_strength)
            v6 = variances >> 6
            i = np.zeros_like(variances)
            nz = v6 > 0
            i[nz] = np.minimum(
                np.frexp(v6[nz].astype(np.float64))[1] - 1, 12)
            y_adj = np.where(variances != 0,
                             (y_pri * (4 + i) + 8) >> 4, 0)

            for pl in range(3 if has_chroma else 1):
                if pl == 0:
                    m_pri = y_pri > 0
                    m = (m_pri & ((y_adj | y_sec) != 0)) \
                        | (~m_pri & (y_sec > 0))
                    if not m.any():
                        continue
                    upri = np.where(m_pri, y_adj, 0)[m]
                    usec = y_sec[m]
                    udir = np.where(m_pri, dirs, 0)[m]
                    uys = bys[m] * 4
                    uxs = bxs[m] * 4
                    sv = sh = 0
                else:
                    m = uvlvl != 0
                    if not m.any():
                        continue
                    upri = uv_pri[m]
                    usec = uv_sec[m]
                    uvdm = np.asarray(uv_dir_map, dtype=np.int64)
                    udir = np.where(uv_pri > 0, uvdm[dirs], 0)[m]
                    uys = (bys[m] * 4) >> ss_ver
                    uxs = (bxs[m] * 4) >> ss_hor
                    sv, sh = ss_ver, ss_hor
                w, h = 8 >> sh, 8 >> sv
                pw, ph = (f.bw * 4) >> sh, (f.bh * 4) >> sv
                dev[pl] = cdef_filter_plane_dev(
                    dev[pl], ph, pw, uys, uxs, w, h, upri, usec, udir,
                    damping - (1 if pl else 0), f.bitdepth)

    for pl in range(len(f.planes)):
        f.planes[pl][:, :] = np.asarray(dev[pl])
    f.sr_planes = f.planes

    if do_lr:
        from .lr_apply import lr_frame
        lr_frame(f)
    return True
