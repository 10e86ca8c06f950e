"""Device intra reconstruction: whole-frame wavefront batching.

Intra prediction is the one DSP family whose inputs are its own
outputs: every block's edge vector is built from its neighbours'
*reconstructed* pixels, so the reference serializes the walk per
superblock row (src/recon_tmpl.c:1176-1556).  The TPU-native
reformulation here keeps the *data* resident and turns the ordering
into a dependency-levelled launch schedule:

  1. host: walk the captured block arena in decode order and emit one
     descriptor per prediction unit (the exact geometry of
     recon/intra.py recon_b_intra): position, transform size, resolved
     implementation mode + angle, edge availability spans.
  2. host: assign each unit a wavefront LEVEL over a 4x4-granular map:
     level(u) = 1 + max(level of every cell u's edge gather can read).
     Units at the same level are independent by construction — a
     unit's reads always resolve strictly below its own level.
  3. device: per plane, one resident int32 canvas + one dense residual
     canvas (all inverse transforms are known up front — pass 1
     decoupled them from prediction).  For each level, units group by
     static key (mode, w, h, angle, clamped max_w/max_h) and one XLA
     program per key gathers the 257-entry edge vectors *on device*
     from the current canvas (clamped-index formulation of
     ipred_prepare_tmpl.c:76-204: replication = index min, fills =
     where-selects), runs the ops/ipred batched kernel, adds the
     residual window, clips, and scatters the block back.  The host
     uploads only ~8 int32 scalars per unit; pixels never leave the
     chip between levels.

Luma chains first, then chroma (CFL's AC input reads the finished luma
canvas on device).  Palette and CFL blocks ride the same schedule with
their own programs (pal_pred gather; in-kernel cfl_ac + DC + alpha).

Scope: intra blocks of ANY frame.  Inter blocks are final before this
schedule runs (phase A — the native inter replay + residual adds — has
completed), so their cells sit at wavefront level 0 and intra units
reading them level correctly above; an all-inter frame exits with zero
launches.  Only frames with intrabc blocks (which copy from the
in-progress canvas in decode order) fall back to the host phase-B walk
in pipeline._run_pass2_native; selection is dispatch.use_device("ipred").

Reference parity: src/ipred_prepare_tmpl.c:76-204 (edge build),
src/recon_tmpl.c:1176-1556 (walk), src/ipred_tmpl.c (kernels, via
ops/ipred.py).  Bit-exactness is asserted by the forced-device e2e
suite (tests/test_device_intra.py, tests/test_device_e2e.py).
"""

from __future__ import annotations

import functools

import numpy as np

from .. import tables
from ..headers import PixelLayout
from ..levels import IntraPredMode as M
from .ipred import (ANGLE_SMOOTH_EDGE_FLAG, EDGE_I444_LEFT_HAS_BOTTOM,
                    EDGE_I444_TOP_HAS_RIGHT, EDGE_NEEDS, MODE_TO_ANGLE)

# meta columns shared by every unit program
_DY, _DX, _HL, _HT, _PXL, _PXBL, _PXT, _PXTR = range(8)
# extra columns (cfl / pal)
_Y0, _X0, _ALPHA = 8, 9, 10
_PALROW = 8
# extra columns (pred units): runtime angle/flags, Z2 clamps, Z2 tl
# filter, and (r5) the resolved implementation mode — per-unit data
# instead of program-key fields, so ONE program serves every mode and
# angle of a (w, h) key (ops/ipred._build_rt + the all-modes select
# in _allmode_pred).  r4's (mode, w, h) keys left ~8 keys live per
# wavefront level, overflowing the multi-launch fusion budget after
# ~1.4 levels (measured: 1330 launches per 1080p keyframe, avg G=1.4).
_AKEY, _KMW, _KMH, _Z2F, _MODE = 8, 9, 10, 11, 12
_PREDROW = 13

_ANGULAR = (M.Z1_PRED, M.Z2_PRED, M.Z3_PRED)
_RT_MODES = _ANGULAR + (M.FILTER_PRED,)
# every mode _resolve_mode can produce
_ALL_MODES = (M.DC_PRED, M.DC_128_PRED, M.TOP_DC_PRED, M.LEFT_DC_PRED,
              M.VERT_PRED, M.HOR_PRED, M.PAETH_PRED, M.SMOOTH_PRED,
              M.SMOOTH_V_PRED, M.SMOOTH_H_PRED, M.Z1_PRED, M.Z2_PRED,
              M.Z3_PRED, M.FILTER_PRED)
# edge-segment union over _ALL_MODES: segments a unit's mode does not
# read carry harmless values (its host meta zeroes their extents)
_NEEDS_ALL = (1, 1, 1, 0, 0)


def _resolve_mode(mode, angle, have_left, have_top):
    """The mode/angle remap at the top of prepare_intra_edges."""
    if M.VERT_PRED <= mode <= M.VERT_LEFT_PRED:
        angle = MODE_TO_ANGLE[mode - M.VERT_PRED] + 3 * angle
        if angle <= 90:
            mode = M.Z1_PRED if angle < 90 and have_top else M.VERT_PRED
        elif angle < 180:
            mode = M.Z2_PRED
        else:
            mode = M.Z3_PRED if angle > 180 and have_left else M.HOR_PRED
    elif mode == M.DC_PRED:
        mode = [[M.DC_128_PRED, M.TOP_DC_PRED],
                [M.LEFT_DC_PRED, M.DC_PRED]][int(bool(have_left))][
                    int(bool(have_top))]
    elif mode == M.PAETH_PRED:
        mode = [[M.DC_128_PRED, M.VERT_PRED],
                [M.HOR_PRED, M.PAETH_PRED]][int(bool(have_left))][
                    int(bool(have_top))]
    return int(mode), int(angle)


# --- device programs ---------------------------------------------------------

def _edge_gather(jnp, pf, W, H, ph_unit, meta, w, h, half, needs,
                 z2_tl_filter):
    """(B, 257) edge vectors gathered from the flat plane `pf` with the
    exact semantics of recon/ipred.prepare_intra_edges: replication is
    an index clamp, cross-side fills and constants are where-selects.
    Only the segments `needs` asks for are built (golden zeros
    elsewhere are never read by the mode kernel).

    ph_unit: rows of ONE plane inside the canvas — the u/v chroma
    chains stack both planes vertically into one (2*ph, W) canvas so
    their launches merge, and each unit's row clamp stays inside its
    own plane half."""
    OFS = 128
    B = meta.shape[0]
    dy = meta[:, _DY][:, None]
    dx = meta[:, _DX][:, None]
    have_l = meta[:, _HL][:, None] > 0
    have_t = meta[:, _HT][:, None] > 0
    needs_left, needs_top, needs_tl, _, _ = needs
    row_lo = jnp.where(dy >= ph_unit, ph_unit, 0)

    def rd(r, c):
        idx = (jnp.clip(r, row_lo, row_lo + ph_unit - 1) * W
               + jnp.clip(c, 0, W - 1))
        return jnp.take(pf, jnp.clip(idx, 0, H * W - 1).reshape(-1)
                        ).reshape(idx.shape)

    edges = jnp.zeros((B, 257), dtype=jnp.int32)
    fill_from_top = rd(dy - 1, dx)    # (B, 1)
    fill_from_left = rd(dy, dx - 1)

    if needs_left:
        pxl = meta[:, _PXL][:, None]
        pxbl = meta[:, _PXBL][:, None]
        i = jnp.arange(2 * h, dtype=jnp.int32)[None, :]
        row = jnp.where(
            i < h, dy + jnp.minimum(i, pxl - 1),
            jnp.where(pxbl > 0,
                      dy + h + jnp.minimum(i - h, pxbl - 1),
                      dy + pxl - 1))
        vals = jnp.where(have_l, rd(row, dx - 1),
                         jnp.where(have_t, fill_from_top,
                                   jnp.int32(half + 1)))
        # edge[OFS-1-i] = left[i]
        edges = edges.at[:, OFS - 2 * h : OFS].set(vals[:, ::-1])

    if needs_top:
        pxt = meta[:, _PXT][:, None]
        pxtr = meta[:, _PXTR][:, None]
        j = jnp.arange(2 * w, dtype=jnp.int32)[None, :]
        col = jnp.where(
            j < w, dx + jnp.minimum(j, pxt - 1),
            jnp.where(pxtr > 0,
                      dx + w + jnp.minimum(j - w, pxtr - 1),
                      dx + pxt - 1))
        vals = jnp.where(have_t, rd(dy - 1, col),
                         jnp.where(have_l, fill_from_left,
                                   jnp.int32(half - 1)))
        edges = edges.at[:, OFS + 1 : OFS + 1 + 2 * w].set(vals)

    if needs_tl:
        tl = jnp.where(
            have_l, jnp.where(have_t, rd(dy - 1, dx - 1), fill_from_left),
            jnp.where(have_t, fill_from_top, jnp.int32(half)))[:, 0]
        if meta.shape[1] > _Z2F:
            # per-unit Z2 top-left smoothing (reference filter
            # corner, ipred_prepare_tmpl.c) — pred metas carry the
            # flag; other kinds (cfl) never set it
            tlf = ((edges[:, OFS - 1] + edges[:, OFS + 1]) * 5
                   + tl * 6 + 8) >> 4
            tl = jnp.where(meta[:, _Z2F] > 0, tlf, tl)
        elif z2_tl_filter:
            tl = ((edges[:, OFS - 1] + edges[:, OFS + 1]) * 5
                  + tl * 6 + 8) >> 4
        edges = edges.at[:, OFS].set(tl)
    return edges


def _region_idx(jnp, meta, W, w, h):
    """(B, h, w) flat plane indices of each unit's output window."""
    dy = meta[:, _DY][:, None, None]
    dx = meta[:, _DX][:, None, None]
    yy = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    return (dy + yy) * W + (dx + xx)


@functools.lru_cache(maxsize=None)
def _allmode_pred(w, h, bitdepth):
    """fn(edges (B, 257), meta (B, >=13)) -> (B, h, w): every resolved
    mode's prediction evaluated on the shared edge vectors, selected
    per unit by the _MODE meta column.  Mode math is small next to the
    edge gather/scatter, so evaluating all 14 modes costs little while
    collapsing the program key to (w, h) — the wavefront fusion then
    packs ~64 levels per launch instead of ~1.4."""
    import jax.numpy as jnp

    from ..ops.ipred import _build, _build_rt

    fns = []
    for m in _ALL_MODES:
        if m in _RT_MODES:
            fns.append((int(m), True, _build_rt(m, w, h, bitdepth)))
        else:
            fns.append((int(m), False, _build(m, w, h, 0, 0, 0,
                                              bitdepth)))

    def fn(edges, meta):
        rt_prm = meta[:, _AKEY : _AKEY + 3]
        mode = meta[:, _MODE][:, None, None]
        out = None
        for mi, is_rt, f_ in fns:
            p = f_(edges, rt_prm) if is_rt else f_(edges)
            out = p if out is None else jnp.where(mode == mi, p, out)
        return out

    return fn


@functools.lru_cache(maxsize=None)
def _unit_program(shape, ph_unit, w, h, bitdepth, nb):
    """One level-group program: edge gather -> all-modes predictor ->
    +residual, clip, scatter.  plane/resid are (H, W) int32 resident
    canvases (H = 2*ph_unit for the stacked chroma pair); meta is
    (nb, _PREDROW) int32."""
    import jax
    import jax.numpy as jnp

    H, W = shape
    half = (1 << bitdepth) >> 1
    maxp = (1 << bitdepth) - 1
    pred_fn = _allmode_pred(w, h, bitdepth)

    def run(plane, resid, meta):
        pf = plane.reshape(-1)
        edges = _edge_gather(jnp, pf, W, H, ph_unit, meta, w, h, half,
                             _NEEDS_ALL, False)
        pred = pred_fn(edges, meta)
        idx = _region_idx(jnp, meta, W, w, h)
        rg = jnp.take(resid.reshape(-1),
                      jnp.clip(idx, 0, H * W - 1).reshape(-1)
                      ).reshape(idx.shape)
        out = jnp.clip(pred + rg, 0, maxp)
        return pf.at[idx.reshape(-1)].set(out.reshape(-1),
                                          mode="drop").reshape(H, W)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _multi_run_program(shape, ph_unit, bitdepth, keyspecs, G):
    """Fused RUN of G consecutive wavefront levels spanning several
    static keys: ONE launch, an in-program fori_loop over the levels;
    each iteration applies every key's (possibly empty, padded) batch.
    Units at one level are independent by construction (a unit's edge
    reads always resolve strictly below its own level), so the
    within-level key order is free; cross-level dependencies ride the
    carried plane.  This collapses the per-(level, key) launch storm —
    the dominant cost of the wavefront schedule (DEVICE_FRAME_r03:
    ~18k launches / ~105 ms on-chip per 1080p keyframe before fusion).

    keyspecs: tuple of (w, h, capg) — r5: the mode (like the angle,
    Z2 clamps and tl-filter flag before it) is a per-unit meta column
    resolved by the all-modes select (_allmode_pred), so the key is
    pure geometry; metas arrive CONCATENATED along the unit axis as
    one (G, sum(capg), _PREDROW) int32 array — a single host->device
    upload per launch (the per-key upload stream dominated the
    recorded intra decode) — and split back per key with static
    slices in-program.  Rows pad with sentinels (dy = H) whose
    scatters drop out of range."""
    import jax
    import jax.numpy as jnp

    H, W = shape
    half = (1 << bitdepth) >> 1
    maxp = (1 << bitdepth) - 1
    preds = [(w, h, _allmode_pred(w, h, bitdepth))
             for (w, h, _capg) in keyspecs]
    offs = []
    o = 0
    for ks in keyspecs:
        offs.append((o, ks[-1]))
        o += ks[-1]

    def run(plane, resid, metas_cat):
        rf = resid.reshape(-1)
        metas = [jax.lax.slice_in_dim(metas_cat, off, off + capg, axis=1)
                 for off, capg in offs]

        def body(g, pf):
            for (w, h, pred_fn), meta in zip(preds, metas):
                m = jax.lax.dynamic_index_in_dim(meta, g, keepdims=False)
                edges = _edge_gather(jnp, pf, W, H, ph_unit, m, w, h,
                                     half, _NEEDS_ALL, False)
                pred = pred_fn(edges, m)
                idx = _region_idx(jnp, m, W, w, h)
                rg = jnp.take(rf, jnp.clip(idx, 0, H * W - 1).reshape(-1)
                              ).reshape(idx.shape)
                out = jnp.clip(pred + rg, 0, maxp)
                pf = pf.at[idx.reshape(-1)].set(out.reshape(-1),
                                                mode="drop")
            return pf

        pf = jax.lax.fori_loop(0, G, body, plane.reshape(-1))
        return pf.reshape(H, W)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _cfl_program(shape, ph_unit, yshape, mode, w, h, w_pad, h_pad,
                 ss_hor, ss_ver, bitdepth, nb):
    """CFL chroma block: in-kernel cfl_ac from the finished luma canvas
    + DC(edges) + alpha scaling + residual.  meta is (nb, 11)."""
    import jax
    import jax.numpy as jnp

    from ..ops.ipred import _dc_mul

    H, W = shape
    YH, YW = yshape
    half = (1 << bitdepth) >> 1
    maxp = (1 << bitdepth) - 1
    OFS = 128
    shift = 1 + (not ss_ver) + (not ss_hor)
    core_h = h - 4 * h_pad
    core_w = w - 4 * w_pad
    log2sz = (w.bit_length() - 1) + (h.bit_length() - 1)

    def run(plane, luma, resid, meta):
        pf = plane.reshape(-1)
        yf = luma.reshape(-1)
        edges = _edge_gather(jnp, pf, W, H, ph_unit, meta, w, h, half,
                             EDGE_NEEDS[mode], False)
        if mode == M.DC_PRED:
            dc = ((w + h) >> 1) \
                + jnp.sum(edges[:, OFS + 1 : OFS + 1 + w], axis=1) \
                + jnp.sum(edges[:, OFS - h : OFS], axis=1)
            dc = _dc_mul(dc >> (((w + h) & -(w + h)).bit_length() - 1),
                         w, h, bitdepth, jnp)
        elif mode == M.TOP_DC_PRED:
            dc = (jnp.sum(edges[:, OFS + 1 : OFS + 1 + w], axis=1)
                  + (w >> 1)) >> (w.bit_length() - 1)
        elif mode == M.LEFT_DC_PRED:
            dc = (jnp.sum(edges[:, OFS - h : OFS], axis=1)
                  + (h >> 1)) >> (h.bit_length() - 1)
        else:
            dc = jnp.full((meta.shape[0],), half, dtype=jnp.int32)

        # cfl_ac (recon/ipred.py:554): subsampled sums over the luma
        # canvas, right/bottom pad replication, mean subtract
        y0 = meta[:, _Y0][:, None, None]
        x0 = meta[:, _X0][:, None, None]
        ys = jnp.arange(core_h, dtype=jnp.int32)[None, :, None]
        xs = jnp.arange(core_w, dtype=jnp.int32)[None, None, :]
        sy = y0 + (ys << ss_ver)
        sx = x0 + (xs << ss_hor)

        def yrd(r, c):
            idx = jnp.clip(r, 0, YH - 1) * YW + jnp.clip(c, 0, YW - 1)
            return jnp.take(yf, idx.reshape(-1)).reshape(idx.shape)

        s = yrd(sy, sx)
        if ss_hor:
            s = s + yrd(sy, sx + 1)
        if ss_ver:
            s = s + yrd(sy + 1, sx)
            if ss_hor:
                s = s + yrd(sy + 1, sx + 1)
        ac = s << shift
        if w_pad:
            ac = jnp.concatenate(
                [ac, jnp.repeat(ac[:, :, -1:], 4 * w_pad, axis=2)], axis=2)
        if h_pad:
            ac = jnp.concatenate(
                [ac, jnp.repeat(ac[:, -1:, :], 4 * h_pad, axis=1)], axis=1)
        total = (jnp.sum(ac, axis=(1, 2)) + ((1 << log2sz) >> 1)) >> log2sz
        ac = ac - total[:, None, None]

        alpha = meta[:, _ALPHA][:, None, None]
        diff = alpha * ac
        adj = (jnp.abs(diff) + 32) >> 6
        pred = jnp.clip(dc[:, None, None] + jnp.sign(diff) * adj, 0, maxp)

        idx = _region_idx(jnp, meta, W, w, h)
        rg = jnp.take(resid.reshape(-1),
                      jnp.clip(idx, 0, H * W - 1).reshape(-1)
                      ).reshape(idx.shape)
        out = jnp.clip(pred + rg, 0, maxp)
        return pf.at[idx.reshape(-1)].set(out.reshape(-1),
                                          mode="drop").reshape(H, W)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pal_program(shape, w, h, bitdepth, nb):
    """Palette block: pal[idx] + residual, clip, scatter.  meta (nb, 8)
    (positions only), pal (nb, 8) int32, idx (nb, h, w) int32."""
    import jax
    import jax.numpy as jnp

    H, W = shape
    maxp = (1 << bitdepth) - 1

    def run(plane, resid, meta, pal, pidx):
        pf = plane.reshape(-1)
        pred = jnp.take_along_axis(
            pal[:, None, :], pidx.reshape(nb, 1, -1), axis=2
        ).reshape(nb, h, w)
        idx = _region_idx(jnp, meta, W, w, h)
        rg = jnp.take(resid.reshape(-1),
                      jnp.clip(idx, 0, H * W - 1).reshape(-1)
                      ).reshape(idx.shape)
        out = jnp.clip(pred + rg, 0, maxp)
        return pf.at[idx.reshape(-1)].set(out.reshape(-1),
                                          mode="drop").reshape(H, W)

    return jax.jit(run)


# --- host-side walk: unit descriptors + wavefront levels ---------------------

class _LevelMap:
    """4x4-granular wavefront levels for one plane."""

    __slots__ = ("lvl", "h4", "w4", "max_level")

    def __init__(self, ph, pw):
        self.h4, self.w4 = ph >> 2, pw >> 2
        self.lvl = np.zeros((self.h4, self.w4), dtype=np.int32)
        self.max_level = 0

    def place(self, dy, dx, w, h, have_l, have_t, reads_tr_bl=True):
        """Assign the unit its level from the cells its edge gather can
        touch (conservatively the full 2x spans — extra cells only ever
        raise the level), then mark its output window."""
        lvl = self.lvl
        r0, c0 = dy >> 2, dx >> 2
        level = 0
        if have_t:
            c_lo = max(c0 - 1, 0)
            c_hi = min(c0 + ((2 * w) >> 2) + 1, self.w4)
            if r0 > 0:
                seg = lvl[r0 - 1, c_lo:c_hi]
                if seg.size:
                    level = int(seg.max())
        if have_l:
            r_lo = max(r0 - 1, 0)
            r_hi = min(r0 + ((2 * h) >> 2) + 1, self.h4)
            if c0 > 0:
                seg = lvl[r_lo:r_hi, c0 - 1]
                if seg.size:
                    level = max(level, int(seg.max()))
        # cross-side fill reads (plane[dy-1,dx] / plane[dy,dx-1]) are
        # inside the spans above
        level += 1
        lvl[r0 : r0 + (h >> 2), c0 : c0 + (w >> 2)] = level
        if level > self.max_level:
            self.max_level = level
        return level


def _enumerate_units(f, glue, ranges):
    """Walk the capture arena in decode order, mirroring
    recon/intra.py recon_b_intra's unit geometry; returns per-plane
    {level: {key: [unit-rows]}} schedules or None on any feature the
    device path does not cover."""
    bdim = tables.block_dimensions
    tinfo = tables.txfm_info()
    ss_ver, ss_hor = f.ss_ver, f.ss_hor
    layout = f.layout
    ief = int(f.seq_hdr.intra_edge_filter)
    ief_flag = ief << 10
    bd = f.bitdepth
    rows = glue.cap_blocks
    n_planes = 1 if layout == PixelLayout.I400 else 3
    # chain 0 = luma; chain 1 = u and v STACKED vertically (same
    # geometry, independent pixels -> same levels, merged launches)
    hc = f.planes[1].shape[0] if n_planes == 3 else 0
    n_chains = 1 if n_planes == 1 else 2

    maps = [_LevelMap(*f.planes[0].shape)]
    if n_chains == 2:
        maps.append(_LevelMap(2 * hc, f.planes[1].shape[1]))
    # chain -> {(kind, key...): {level: [meta rows]}}
    sched = [{} for _ in range(n_chains)]

    def emit(pl, kind, key, level, row_meta):
        sched[pl].setdefault((kind,) + key, {}).setdefault(
            level, []).append(row_meta)

    for s, e in ranges:
        for i in range(s, e):
            row = rows[i]
            kind = int(row["kind"])
            if kind == 2:
                # intrabc copies from the in-progress canvas in decode
                # order — needs the interleaved host walk
                return None, None
            if kind == 1:
                # inter block: phase A (native inter replay + residual
                # adds) finished before this schedule runs, so its
                # pixels are FINAL in the uploaded canvas — its cells
                # stay at wavefront level 0 and any intra unit whose
                # edge gather reads them lands at level >= 1
                continue
            ts = glue.ts_of_block(i)
            bx, by = int(row["bx"]), int(row["by"])
            bs = int(row["bs"])
            bw4, bh4 = int(bdim[bs][0]), int(bdim[bs][1])
            w4 = min(bw4, f.bw - bx)
            h4 = min(bh4, f.bh - by)
            cw4 = (w4 + ss_hor) >> ss_hor
            ch4 = (h4 + ss_ver) >> ss_ver
            cbw4 = (bw4 + ss_hor) >> ss_hor
            cbh4 = (bh4 + ss_ver) >> ss_ver
            has_chroma = (n_planes == 3
                          and (bw4 > ss_hor or bx & 1)
                          and (bh4 > ss_ver or by & 1))
            t_dim = tinfo[int(row["tx"])]
            uv_t_dim = tinfo[int(row["uvtx"])]
            tw, th = int(t_dim[0]), int(t_dim[1])
            utw, uth = int(uv_t_dim[0]), int(uv_t_dim[1])
            ief_flags = int(row["edge_flags"])
            sm = int(row["sm_flags"])
            sm_fl = ANGLE_SMOOTH_EDGE_FLAG if sm & 1 else 0
            sm_uv_fl = ANGLE_SMOOTH_EDGE_FLAG if sm & 2 else 0
            y_mode = int(row["y_mode"])
            uv_mode = int(row["uv_mode"])
            y_angle = int(row["y_angle"])
            uv_angle = int(row["uv_angle"])
            pal_y = int(row["pal_sz"][0])
            pal_uv = int(row["pal_sz"][1])
            cfl = [int(row["cfl_alpha"][0]), int(row["cfl_alpha"][1])]

            if pal_y or pal_uv:
                pal_idx = int(row["pal_idx"])
                if pal_idx < 0:
                    return None, None
                pal = glue.cap_pal[pal_idx]

            if pal_y:
                # whole-block palette unit, then residuals ride the
                # canvas; no edge reads
                dy0, dx0 = 4 * by, 4 * bx
                off = int(row["pal_y_off"])
                if off < 0:
                    return None, None
                idx_y = glue.pal_arena[off : off + 16 * bw4 * bh4] \
                    .reshape(bh4 * 4, bw4 * 4)
                level = maps[0].place(dy0, dx0, bw4 * 4, bh4 * 4, 0, 0)
                emit(0, "pal", (bw4 * 4, bh4 * 4), level,
                     ((dy0, dx0, 0, 0, 1, 0, 1, 0),
                      pal[0].astype(np.int32), idx_y))

            for init_y in range(0, h4, 16):
                sub_h4 = min(h4, 16 + init_y)
                sub_ch4 = min(ch4, (init_y + 16) >> ss_ver)
                for init_x in range(0, w4, 16):
                    sb_has_tr = (1 if init_x + 16 < w4 else 0 if init_y
                                 else ief_flags & EDGE_I444_TOP_HAS_RIGHT)
                    sb_has_bl = (0 if init_x else 1 if init_y + 16 < h4
                                 else ief_flags & EDGE_I444_LEFT_HAS_BOTTOM)
                    sub_w4 = min(w4, init_x + 16)

                    if not pal_y:
                        y = init_y
                        while y < sub_h4:
                            x = init_x
                            while x < sub_w4:
                                cbx = bx + x
                                cby = by + y
                                eflags = (
                                    (0 if ((y > init_y or not sb_has_tr)
                                           and (x + tw >= sub_w4))
                                     else EDGE_I444_TOP_HAS_RIGHT)
                                    | (0 if (x > init_x
                                             or (not sb_has_bl
                                                 and y + th >= sub_h4))
                                       else EDGE_I444_LEFT_HAS_BOTTOM))
                                _emit_pred_unit(
                                    emit, maps[0], 0, y_mode, y_angle,
                                    sm_fl | ief_flag, cbx, cby, x, y, tw,
                                    th, ts.col_start, ts.col_end,
                                    ts.row_start, ts.row_end, eflags, ief,
                                    4 * f.bw - 4 * cbx,
                                    4 * f.bh - 4 * cby, bd)
                                x += tw
                            y += th

                    if not has_chroma:
                        continue

                    if uv_mode == M.CFL_PRED and not init_x and not init_y \
                            and (cfl[0] or cfl[1]):
                        if cbw4 * 4 != utw * 4 or cbh4 * 4 != uth * 4:
                            return None, None  # multi-txb CFL: host walk
                        y0p = 4 * (by & ~ss_ver)
                        x0p = 4 * (bx & ~ss_hor)
                        furthest_r = ((cw4 << ss_hor) + utw - 1) & ~(utw - 1)
                        furthest_b = ((ch4 << ss_ver) + uth - 1) & ~(uth - 1)
                        w_pad = cbw4 - (furthest_r >> ss_hor)
                        h_pad = cbh4 - (furthest_b >> ss_ver)
                        for pl in range(2):
                            if not cfl[pl]:
                                continue
                            xpos = bx >> ss_hor
                            ypos = by >> ss_ver
                            meta = _edge_meta(
                                xpos, xpos > (ts.col_start >> ss_hor),
                                ypos, ypos > (ts.row_start >> ss_ver),
                                ts.col_end >> ss_hor,
                                ts.row_end >> ss_ver, 0,
                                M.DC_PRED, 0, utw, uth)
                            if meta is None:
                                return None, None
                            mode_i, _, m = meta
                            m = (m[_DY] + pl * hc,) + m[1:]
                            level = maps[1].place(
                                m[_DY], m[_DX], utw * 4, uth * 4,
                                m[_HL], m[_HT])
                            emit(1, "cfl",
                                 (mode_i, utw * 4, uth * 4, w_pad, h_pad),
                                 level,
                                 (m + (y0p, x0p, cfl[pl]),))

                    if pal_uv and not init_x and not init_y:
                        off = int(row["pal_uv_off"])
                        if off < 0:
                            return None, None
                        idx_uv = glue.pal_arena[
                            off : off + 16 * cbw4 * cbh4] \
                            .reshape(cbh4 * 4, cbw4 * 4)
                        dyc = 4 * (by >> ss_ver)
                        dxc = 4 * (bx >> ss_hor)
                        for pl in range(2):
                            level = maps[1].place(
                                dyc + pl * hc, dxc, cbw4 * 4,
                                cbh4 * 4, 0, 0)
                            emit(1, "pal", (cbw4 * 4, cbh4 * 4),
                                 level,
                                 ((dyc + pl * hc, dxc, 0, 0, 1, 0, 1, 0),
                                  pal[1 + pl].astype(np.int32), idx_uv))

                    if (uv_mode == M.CFL_PRED and (cfl[0] or cfl[1])) \
                            or pal_uv:
                        # CFL with one zero alpha still predicts that
                        # plane per-txb below; palette covers both
                        planes_left = [] if pal_uv else \
                            [pl for pl in range(2) if not cfl[pl]]
                    else:
                        planes_left = [0, 1]

                    uv_sb_has_tr = (
                        1 if ((init_x + 16) >> ss_hor) < cw4 else
                        0 if init_y else
                        ief_flags & ((1 << 2) >> (layout - 1)))
                    uv_sb_has_bl = (
                        0 if init_x else
                        1 if ((init_y + 16) >> ss_ver) < ch4 else
                        ief_flags & ((1 << 5) >> (layout - 1)))
                    sub_cw4 = min(cw4, (init_x + 16) >> ss_hor)
                    uv_imode = M.DC_PRED if uv_mode == M.CFL_PRED \
                        else uv_mode
                    for pl in planes_left:
                        y = init_y >> ss_ver
                        while y < sub_ch4:
                            x = init_x >> ss_hor
                            while x < sub_cw4:
                                tbx = bx + init_x \
                                    + ((x - (init_x >> ss_hor)) << ss_hor)
                                tby = by + init_y \
                                    + ((y - (init_y >> ss_ver)) << ss_ver)
                                eflags = (
                                    (0 if ((y > (init_y >> ss_ver)
                                            or not uv_sb_has_tr)
                                           and (x + utw >= sub_cw4))
                                     else EDGE_I444_TOP_HAS_RIGHT)
                                    | (0 if (x > (init_x >> ss_hor)
                                             or (not uv_sb_has_bl
                                                 and y + uth >= sub_ch4))
                                       else EDGE_I444_LEFT_HAS_BOTTOM))
                                _emit_pred_unit(
                                    emit, maps[1], 1, uv_imode,
                                    uv_angle, sm_uv_fl | ief_flag,
                                    tbx >> ss_hor, tby >> ss_ver,
                                    x, y, utw, uth,
                                    ts.col_start >> ss_hor,
                                    ts.col_end >> ss_hor,
                                    ts.row_start >> ss_ver,
                                    ts.row_end >> ss_ver, eflags, ief,
                                    (4 * f.bw + ss_hor
                                     - 4 * (tbx & ~ss_hor)) >> ss_hor,
                                    (4 * f.bh + ss_ver
                                     - 4 * (tby & ~ss_ver)) >> ss_ver, bd,
                                    row_off=pl * hc)
                                x += utw
                            y += uth

    return sched, maps


def _edge_meta(xpos, have_left, ypos, have_top, w_end, h_end, edge_flags,
               mode, angle, tw, th):
    """Resolve (impl mode, final angle) + the 8 availability scalars of
    one prediction unit — the host half of prepare_intra_edges."""
    mode_i, angle_r = _resolve_mode(mode, angle, have_left, have_top)
    if mode_i not in EDGE_NEEDS:
        return None
    needs_left, needs_top, _, needs_tr, needs_bl = EDGE_NEEDS[mode_i]
    dst_y, dst_x = 4 * ypos, 4 * xpos
    px_l = px_bl = px_t = px_tr = 0
    if needs_left and have_left:
        px_l = min(th << 2, (h_end - ypos) << 2)
        if needs_bl:
            have_bl = (0 if (not have_left or ypos + th >= h_end)
                       else (edge_flags & EDGE_I444_LEFT_HAS_BOTTOM))
            if have_bl:
                px_bl = min(th << 2, (h_end - ypos - th) << 2)
    if needs_top and have_top:
        px_t = min(tw << 2, (w_end - xpos) << 2)
        if needs_tr:
            have_tr = (0 if (not have_top or xpos + tw >= w_end)
                       else (edge_flags & EDGE_I444_TOP_HAS_RIGHT))
            if have_tr:
                px_tr = min(tw << 2, (w_end - xpos - tw) << 2)
    return mode_i, angle_r, (dst_y, dst_x, int(bool(have_left)),
                             int(bool(have_top)), px_l, px_bl, px_t,
                             px_tr)


def _emit_pred_unit(emit, lmap, pl, mode, angle, flags, xpos, ypos, x, y,
                    tw, th, col_start, col_end, row_start, row_end,
                    edge_flags, ief, max_w, max_h, bd, row_off=0):
    meta = _edge_meta(xpos, xpos > col_start, ypos, ypos > row_start,
                      col_end, row_end, edge_flags, mode, angle, tw, th)
    if meta is None:
        return
    mode_i, angle_r, m = meta
    if row_off:
        m = (m[_DY] + row_off,) + m[1:]
    w, h = tw * 4, th * 4
    if mode_i in _ANGULAR:
        akey = angle_r | flags
        kmw = min(max_w, w) if mode_i == M.Z2_PRED else 0
        kmh = min(max_h, h) if mode_i == M.Z2_PRED else 0
    elif mode_i == M.FILTER_PRED:
        akey, kmw, kmh = angle_r & 511, 0, 0
    else:
        akey, kmw, kmh = 0, 0, 0
    z2f = int(mode_i == M.Z2_PRED and tw + th >= 6 and ief)
    level = lmap.place(m[_DY], m[_DX], w, h, m[_HL], m[_HT])
    # every per-mode parameter (angle, Z2 clamps, tl filter, and the
    # mode itself) rides per unit: the program key is pure geometry
    m = m + (akey, kmw, kmh, z2f, int(mode_i))
    emit(pl, "pred", (w, h), level, (m,))


# --- residual canvases + chain driver ----------------------------------------

def _residual_canvases(f, glue, st, n_planes):
    """Dense per-plane residual canvases from the collected itx batches
    (zeros where eob<0 — add_residual is then the identity)."""
    st.collect()
    canvases = [np.zeros_like(f.planes[pl]) for pl in range(n_planes)]
    meta = glue.meta_rows()
    for idxs, out in st.groups:
        for k, mrow in enumerate(meta[idxs]):
            pl = int(mrow[2]) & 0xFF
            dy, dx = int(mrow[3]), int(mrow[4])
            r = out[k]
            ch, cw = r.shape
            canvases[pl][dy : dy + ch, dx : dx + cw] = r
    return canvases


# Launch-funnel shim: the intra chain makes hundreds of launches per
# keyframe whose inputs are successive VERSIONS of the resident plane —
# recording them verbatim would pin every intermediate canvas on HBM
# for the whole decode (devrt.SINK holds its entries alive).  Instead
# each distinct program records ONE representative args tuple (host
# snapshots, fetched once); later launches of the same program record
# the same tuple, so the bench's dedup-and-multiply accounting still
# sees correct launch counts.
_sink_rep: dict = {}


def _chain_call(tag, prog, *args):
    from .. import devrt

    if devrt.SINK is not None:
        rep = _sink_rep.get(id(prog))
        if rep is None:
            rep = tuple(np.asarray(a) for a in args)
            _sink_rep[id(prog)] = rep
        devrt.SINK.append((tag, prog, rep, {}))
        return prog(*args)
    return prog(*args)


def intra_frame_device(f, st) -> bool:
    """Device wavefront intra reconstruction for an all-intra frame.
    Returns False (caller runs the host phase-B walk) when the frame
    has blocks this path does not cover."""
    import jax

    glue = f._nat
    ranges = glue.block_ranges()
    sched, maps = _enumerate_units(f, glue, ranges)
    if sched is None:
        return False
    if not any(sched):
        # all-inter frame: phase A already reconstructed every block;
        # phase B has no intra work
        st.collect()
        return True

    call = _chain_call

    n_planes = 1 if len(sched) == 1 else 3
    canvases = _residual_canvases(f, glue, st, n_planes)
    bd = f.bitdepth
    hc = f.planes[1].shape[0] if n_planes == 3 else 0

    # chain canvases: luma as-is; u/v stacked vertically
    chains = [(f.planes[0], canvases[0], f.planes[0].shape[0])]
    if n_planes == 3:
        chains.append((np.concatenate([f.planes[1], f.planes[2]]),
                       np.concatenate([canvases[1], canvases[2]]), hc))

    dev_planes = []
    luma_dev = None
    for ci, (host_plane, host_resid, ph_unit) in enumerate(chains):
        plane = jax.device_put(host_plane)
        resid = jax.device_put(host_resid)
        shape = host_plane.shape
        # (level, key) schedule -> RUN plan: consecutive levels whose
        # groups are all "pred" fuse into one multi-key launch as long
        # as the union key set stays small (bounded padding waste and
        # program diversity); cfl/palette groups flush the run and
        # execute as singles at their level boundary, preserving the
        # level order on both sides.
        by_level = {}
        for key, levels in sched[ci].items():
            for level, units in levels.items():
                by_level.setdefault(level, []).append((key, units))
        # r5: keys are pure geometry (w, h) — a 64-level window rarely
        # holds more than ~8 distinct unit sizes, so the fusion now
        # actually reaches GMAX (measured pre-r5: avg G = 1.4 with
        # (mode, w, h) keys and KMAX = 6; post: avg G ~ 60 luma)
        KMAX, GMAX = 10, 64
        plan = []  # ["multi", {key: [units-per-level]}] | ["single", key, units]
        cur = None

        def _flush():
            nonlocal cur
            if cur is not None and cur["G"]:
                plan.append(["multi", cur])
            cur = None

        for level in sorted(by_level):
            groups = by_level[level]
            pred_g = sorted(((k, u) for k, u in groups
                             if k[0] == "pred"), key=lambda kv: kv[0][1:])
            other_g = sorted(((k, u) for k, u in groups
                              if k[0] != "pred"), key=lambda kv: str(kv[0]))
            if pred_g:
                newk = {k for k, _ in pred_g}
                if (cur is None or cur["G"] >= GMAX
                        or len(newk | set(cur["keys"])) > KMAX):
                    _flush()
                    cur = {"keys": {}, "G": 0}
                g = cur["G"]
                for k, units in pred_g:
                    cur["keys"].setdefault(
                        k, [[] for _ in range(g)]).append(units)
                for lists in cur["keys"].values():
                    while len(lists) < g + 1:
                        lists.append([])
                cur["G"] = g + 1
            if other_g:
                _flush()
                for key, units in other_g:
                    plan.append(["single", key, units])
        _flush()

        for ent in plan:
            if ent[0] == "multi":
                keys, G = ent[1]["keys"], ent[1]["G"]
                order = sorted(keys, key=lambda k: k[1:])
                if G == 1 and len(order) == 1:
                    ent = ["single", order[0], keys[order[0]][0]]
                else:
                    Gb = 1 << max(0, (G - 1).bit_length())
                    keyspecs, mparts = [], []
                    for k in order:
                        unit_lists = keys[k]
                        capg = 1 << max(0, (max(len(u)
                                              for u in unit_lists)
                                            - 1).bit_length())
                        keyspecs.append(k[1:] + (capg,))
                        metas = np.zeros((Gb, capg, _PREDROW),
                                         dtype=np.int32)
                        metas[:, :, _DY] = shape[0]
                        metas[:, :, _PXL] = metas[:, :, _PXT] = 1
                        for gi, ul in enumerate(unit_lists):
                            for j, u in enumerate(ul):
                                metas[gi, j] = u[0]
                        mparts.append(metas)
                    prog = _multi_run_program(shape, ph_unit, bd,
                                              tuple(keyspecs), Gb)
                    plane = call("ipred", prog, plane, resid,
                                 jax.numpy.asarray(
                                     np.concatenate(mparts, axis=1)))
                    continue
            key, units = ent[1], ent[2]
            if True:
                kind = key[0]
                n = len(units)
                nb = 1 << max(0, (n - 1).bit_length())
                metas = np.full((nb, len(units[0][0])), 0, dtype=np.int32)
                metas[:, _DY] = shape[0]  # pad rows scatter out of range
                metas[:, _PXL] = metas[:, _PXT] = 1
                for k, u in enumerate(units):
                    metas[k] = u[0]
                if kind == "pred":
                    w, h = key[1:]
                    prog = _unit_program(shape, ph_unit, w, h, bd, nb)
                    plane = call("ipred", prog, plane, resid,
                                 jax.numpy.asarray(metas))
                elif kind == "cfl":
                    mode_i, w, h, w_pad, h_pad = key[1:]
                    prog = _cfl_program(shape, ph_unit,
                                        f.planes[0].shape, mode_i,
                                        w, h, w_pad, h_pad, f.ss_hor,
                                        f.ss_ver, bd, nb)
                    plane = call("ipred", prog, plane, luma_dev, resid,
                                 jax.numpy.asarray(metas))
                else:  # palette
                    w, h = key[1:]
                    pal = np.zeros((nb, 8), dtype=np.int32)
                    pidx = np.zeros((nb, h, w), dtype=np.int32)
                    for k, u in enumerate(units):
                        pal[k, : len(u[1])] = u[1]
                        pidx[k] = u[2]
                    prog = _pal_program(shape, w, h, bd, nb)
                    plane = call("ipred", prog, plane, resid,
                                 jax.numpy.asarray(metas),
                                 jax.numpy.asarray(pal),
                                 jax.numpy.asarray(pidx))
        dev_planes.append(plane)
        if ci == 0:
            luma_dev = plane

    # narrow download: predicted+residual pixels are clipped into
    # [0, 2^bd) by every unit program (devrt.XFER budget)
    from .. import devrt
    cast = devrt.narrow_cast(bd)
    f.planes[0][:] = devrt.fetch(cast(dev_planes[0]))
    if n_planes == 3:
        uv = devrt.fetch(cast(dev_planes[1]))
        f.planes[1][:] = uv[:hc]
        f.planes[2][:] = uv[hc:]
    return True
