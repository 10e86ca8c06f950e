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

The full chain is resident: deblock -> CDEF -> super-res resample
(ops/resize.py, applied to the resident planes) -> loop restoration
(stripe geometry collected host-side via lr_apply's geom_sink; the
padded units gather from a concat of the resident post-CDEF and
pre-CDEF planes and the filtered rects scatter back — no mid-chain
host round trip).
"""

from __future__ import annotations

import numpy as np

# sticky per-family Pallas failure flags: first compile failure on an
# unexpected backend -> XLA fallback for the rest of the process
_BROKEN: set = set()


def _broken(fam: str) -> bool:
    return fam in _BROKEN


def _mark_broken(fam: str) -> None:
    """Trip the sticky fallback LOUDLY: a silent tier change once let a
    bench run measure the XLA tier while claiming Pallas (r5)."""
    import sys
    import traceback

    if fam not in _BROKEN:
        _BROKEN.add(fam)
        print(f"dav1d_tpu: pallas tier '{fam}' failed; sticky XLA "
              f"fallback engaged\n{traceback.format_exc(limit=3)}",
              file=sys.stderr)


def filter_chain_device(f) -> bool:
    """Run deblock -> CDEF -> super-res -> LR on device-resident
    planes.  Returns False when no stage is enabled (caller runs the
    host chain)."""
    hdr = f.frame_hdr
    from ..headers import PixelLayout

    seq = f.seq_hdr
    lf = hdr.loopfilter
    do_deblock = (lf.level_y[0] or lf.level_y[1]) \
        and (f.inloop_filters & 1)
    do_cdef = seq.cdef and not hdr.allow_intrabc and not hdr.all_lossless \
        and (any(hdr.cdef.y_strength) or any(hdr.cdef.uv_strength)) \
        and (f.inloop_filters & 2)
    do_lr = f.restore_planes and (f.inloop_filters & 4)
    do_resize = hdr.width[0] != hdr.width[1]
    if not (do_deblock or do_cdef or do_resize):
        return False

    import jax
    import jax.numpy as jnp

    narrow = np.uint8 if f.bitdepth == 8 else np.uint16
    dev = [jnp.asarray(jax.device_put(p.astype(narrow)), jnp.int32)
           for p in f.planes]

    if do_deblock:
        import os

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

        # Deblock tier: the Pallas band-stencil kernel replaces the
        # XLA edge-gather/scatter formulation on real TPU backends
        # (ops/pallas_lf.py; one launch per plane covering both
        # directions).  DAV1D_TPU_LF_PALLAS=0 forces XLA, =1 forces
        # Pallas (interpret mode off-TPU, for tests).
        from ..dispatch import _platform
        from ..ops import pallas_lf
        _lf_env = os.environ.get("DAV1D_TPU_LF_PALLAS")
        use_pallas_lf = pallas_lf.supported() and (
            _lf_env == "1" if _lf_env is not None
            else _platform() not in ("cpu", "none"))

        def _edges(pl, dir_):
            wd_plane = f.lf_wd_y[dir_] if pl == 0 else f.lf_wd_uv[dir_]
            pd_idx = dir_ if pl == 0 else 1 + pl
            n_rows, n_cols = (f.h4, f.w4) if pl == 0 else (ch4, cw4)
            ys, xs, cls, L = _collect_edges(level, wd_plane, pd_idx,
                                            dir_, n_rows, n_cols)
            if ys.size == 0:
                return None
            return ys, xs, e_lut[L].astype(np.int64), \
                i_lut[L].astype(np.int64), L >> 4, cls

        planes_ = [0] + ([1, 2] if do_uv else [])

        def _deblock_xla():
            for dir_ in (0, 1):  # vertical edges first, then horizontal
                for pl in planes_:
                    lst = _edges(pl, dir_)
                    if lst is None:
                        continue
                    ys, xs, E, I, H, cls = lst
                    wd_map = y_wd if pl == 0 else uv_wd
                    for c, wd_px in wd_map.items():
                        sel = cls == c
                        if not sel.any():
                            continue
                        dev[pl] = loop_filter_batch(
                            dev[pl], ys[sel] * 4, xs[sel] * 4, E[sel],
                            I[sel], H[sel], dir_ == 0, wd_px,
                            f.bitdepth)

        done = False
        if use_pallas_lf and not _broken("lf"):
            interp = _platform() in ("cpu", "none")
            snap = list(dev)
            try:
                for pl in planes_:
                    dev[pl] = pallas_lf.deblock_plane_pallas(
                        dev[pl], _edges(pl, 0), _edges(pl, 1),
                        f.bitdepth, pl == 0, interpret=interp)
                done = True
            except Exception:
                # sticky: a Mosaic/compile failure on an unexpected
                # backend degrades to the XLA tier, never kills the
                # decode; restore the pre-pass planes first (a partial
                # pallas pass may have filtered some already)
                _mark_broken("lf")
                dev[:] = snap
        if not done:
            _deblock_xla()

    pre_dev = None
    if do_lr:
        # post-deblock / pre-CDEF snapshot for the LR stripe reads
        # (reference dav1d_copy_lpf, src/lf_apply_tmpl.c:104) — stays
        # device-resident (jax arrays are immutable, so holding the
        # current stage output IS the snapshot)
        pre_dev = list(dev)
    f.pre_cdef = None

    if do_cdef:
        import os

        from ..ops.cdef import (cdef_filter_plane_dev,
                                cdef_find_dir_maps_dev)
        from .cdef import UV_DIRS_420, UV_DIRS_422, cdef_collect

        # CDEF unit filter tier: the Pallas band kernel replaces the
        # XLA unit-gather/scatter formulation on real TPU backends
        # (stencil > gather/scatter there; ops/pallas_cdef.py).
        # DAV1D_TPU_CDEF_PALLAS=0 forces XLA, =1 forces Pallas
        # (interpret mode off-TPU, for tests).
        _pal_env = os.environ.get("DAV1D_TPU_CDEF_PALLAS")
        from ..dispatch import _platform
        from ..ops import pallas_cdef
        use_pallas_cdef = pallas_cdef.supported() and (
            _pal_env == "1" if _pal_env is not None
            else _platform() not in ("cpu", "none"))

        units = cdef_collect(f)
        cdef_done = False
        if units is not None and use_pallas_cdef \
                and not _broken("cdef"):
            snap = list(dev)
            try:
                # fully resident path: dir/var maps stay on device; the
                # strength adjustment and UV dir remap derive in-graph
                # inside each plane's filter program — no host round trip
                # between deblock and CDEF (ops/pallas_cdef.py)
                interp = _platform() in ("cpu", "none")
                bys, bxs, y_pri, y_sec, uv_pri, uv_sec, uvlvl = units
                damping = hdr.cdef.damping + f.bitdepth - 8
                ss_ver = int(f.layout == PixelLayout.I420)
                ss_hor = int(f.layout != PixelLayout.I444)
                has_chroma = f.layout != PixelLayout.I400
                if ((y_pri | uv_pri) > 0).any():
                    dmap, vmap = cdef_find_dir_maps_dev(dev[0], f.bitdepth)
                else:
                    z = jnp.zeros((dev[0].shape[0] // 8,
                                   dev[0].shape[1] // 8), jnp.int32)
                    dmap = vmap = z
                for pl in range(3 if has_chroma else 1):
                    if pl == 0:
                        # conservative superset of the host selection (the
                        # variance-gated members resolve in-kernel: derived
                        # pri == sec == 0 passes through)
                        m = (y_pri | y_sec) != 0
                        pri_l, sec_l = y_pri[m], y_sec[m]
                        uys, uxs = bys[m] * 4, bxs[m] * 4
                        sv = sh = 0
                    else:
                        m = uvlvl != 0
                        pri_l, sec_l = uv_pri[m], uv_sec[m]
                        uys = (bys[m] * 4) >> ss_ver
                        uxs = (bxs[m] * 4) >> ss_hor
                        sv, sh = ss_ver, ss_hor
                    if not m.any():
                        continue
                    w, h = 8 >> sh, 8 >> sv
                    pw, ph = (f.bw * 4) >> sh, (f.bh * 4) >> sv
                    dev[pl] = pallas_cdef.cdef_filter_plane_resident(
                        dev[pl], dmap, vmap, ph, pw, uys, uxs,
                        w, h, pri_l, sec_l,
                        damping - (1 if pl else 0), f.bitdepth, pl == 0,
                        f.layout == PixelLayout.I422, interp)
                cdef_done = True
            except Exception:
                # sticky fallback, as for deblock above: restore
                # the pre-CDEF planes and run the XLA tier
                _mark_broken("cdef")
                dev[:] = snap
        if units is not None and not cdef_done:
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
                dmap, vmap = cdef_find_dir_maps_dev(dev[0], f.bitdepth)
                ys8 = (bys[need_dir] * 4) // 8
                xs8 = (bxs[need_dir] * 4) // 8
                dirs[need_dir] = np.asarray(dmap).astype(np.int64)[ys8, xs8]
                variances[need_dir] = \
                    np.asarray(vmap).astype(np.int64)[ys8, xs8]

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

    if do_resize:
        # horizontal super-res resample on the resident planes
        # (reference filter_sbrow_resize order: after CDEF, before LR)
        dev = _resize_resident(f, dev)
        if pre_dev is not None:
            pre_dev = _resize_resident(f, pre_dev)

    if do_lr:
        dev = _lr_resident(f, dev, pre_dev)

    # download in the narrow storage dtype (pixels are clipped into
    # [0, 2^bd) by every filter stage): 4x/2x fewer wire bytes than the
    # int32 working arrays, measured by the devrt.XFER budget
    from .. import devrt
    cast = devrt.narrow_cast(f.bitdepth)

    if do_resize:
        f.sr_planes = [devrt.fetch(cast(p)).astype(np.int32)
                       for p in dev]
    else:
        for pl in range(len(f.planes)):
            f.planes[pl][:, :] = devrt.fetch(cast(dev[pl]))
        f.sr_planes = f.planes
    # the final resident planes ARE the reference state future frames'
    # device MC gathers from (ops/mc.py put_8tap_resident) — stash them
    # so the decoder binds them into the ref slots alongside the host
    # planes
    f._dev_planes = dev
    return True


def _resize_resident(f, dev):
    """ops/resize.py applied to resident planes; output in the same
    alloc geometry as the host _superres_frame."""
    import jax.numpy as jnp

    from ..decode.frame import superres_geometry
    from ..ops.resize import _program

    from ..devrt import call

    out = []
    for pl, p in enumerate(dev):
        out_w, src_w, step, mx0, h, alloc_w = superres_geometry(f, pl)
        res = call("resize", _program(out_w, src_w, step, mx0, f.bitdepth),
                   p[:h, :src_w])
        dst = jnp.zeros((p.shape[0], alloc_w), dtype=jnp.int32)
        out.append(dst.at[:h, :out_w].set(res))
    return out


import functools


@functools.lru_cache(maxsize=None)
def _jit_lr_group(kind, uw, sh, bitdepth, variant):
    """One fused program per (filter kind, unit geometry): gather the
    padded units from the snapshot stack, filter, scatter the results
    back into the destination plane.  One dispatch per group instead of
    gather + filter + scatter each launching separately (the per-
    dispatch cost dominates on a tunneled chip and is not free even
    locally attached)."""
    import jax
    import jax.numpy as jnp

    from ..ops.lr import _jit_sgr, _jit_wiener

    if kind == "w":
        filt = _jit_wiener(uw, sh, bitdepth)
    else:
        filt = _jit_sgr(uw, sh, bitdepth, variant)

    def run(dst, snap, rows, cols, ys, xs, *params):
        P = snap[rows[:, :, None], cols[:, None, :]]
        if kind == "w":
            blk = filt(P, *params)
        else:
            blk = filt(P, P[:, 3 : 3 + sh, 3 : 3 + uw], *params)
        yg = ys[:, None, None] + jnp.arange(sh)[None, :, None]
        xg = xs[:, None, None] + jnp.arange(uw)[None, None, :]
        # scatters are exact in any order: distinct units write
        # disjoint rects, and every gather reads the immutable pre-LR
        # snapshot; pad units sit far out of bounds (dropped)
        return dst.at[yg, xg].set(blk)

    return jax.jit(run)


def _lr_resident(f, dev, pre_dev):
    """Loop restoration on resident planes: host-side stripe geometry
    (lr_apply geom_sink), one fused device program per unit group doing
    gather + filter + scatter.  Exact by the same argument as the
    batched host tier (LR reads only the post-CDEF/pre-CDEF snapshots,
    never its own output — and jax immutability makes the gathered
    snapshot a snapshot by construction)."""
    import jax.numpy as jnp

    from ..devrt import call
    from .lr_apply import _pad_unit_indices, lr_frame

    geom = {}
    lr_frame(f, geom_sink=geom)
    if not geom:
        return dev

    S = {}

    def get_s(pl):
        if pl not in S:
            S[pl] = jnp.concatenate([dev[pl], pre_dev[pl]], axis=0)
        return S[pl]

    far = np.int32(1 << 24)
    dev = list(dev)
    for key, items in geom.items():
        kind, uw, sh = key[0], key[1], key[2]
        variant = key[3] if kind != "w" else 0
        for pl in sorted({it[0] for it in items}):
            grp = [it for it in items if it[0] == pl]
            B = len(grp)
            nb = 1 << (B - 1).bit_length()  # program reuse across frames
            H, W = dev[pl].shape
            rows = np.zeros((nb, sh + 6), np.int32)
            cols = np.zeros((nb, uw + 6), np.int32)
            ys = np.full(nb, far, np.int32)
            xs = np.full(nb, far, np.int32)
            for b, it in enumerate(grp):
                _, x, y, e, h = it[:5]
                rows[b], cols[b] = _pad_unit_indices(x, y, uw, sh, h, e,
                                                     W, H)
                ys[b], xs[b] = y, x
            if kind == "w":
                params = [np.zeros((nb, 3), np.int32),
                          np.zeros((nb, 3), np.int32)]
                params[0][:B] = [it[5] for it in grp]
                params[1][:B] = [it[6] for it in grp]
            else:
                params = [np.zeros(nb, np.int32) for _ in range(4)]
                for k in range(4):
                    params[k][:B] = [it[5 + k] for it in grp]
            dev[pl] = call(
                "lr", _jit_lr_group(kind, uw, sh, int(f.bitdepth),
                                    int(variant)),
                dev[pl], get_s(pl), jnp.asarray(rows), jnp.asarray(cols),
                jnp.asarray(ys), jnp.asarray(xs),
                *(jnp.asarray(p) for p in params))
    return dev
