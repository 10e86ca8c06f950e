"""Pallas deblock: whole-plane loop filtering as row-band stencil
kernels.

Why Pallas here: the XLA formulation (ops/lf.py loop_filter_batch)
gathers every 4-line edge segment into a (N, 4, 2m) window tensor and
scatters the filtered taps back -- arbitrary-index gather/scatter
passes that lower poorly on TPU (DEVICE_FRAME_r03/r04: deblock was the
largest on-chip cost of the resident filter chain, ~74 ms/frame at
1080p).  Deblocking is structurally a STENCIL: every pixel is written
by at most one edge at a small static relative offset, and every
edge's decision masks read a <=7-px window around its own position.
These kernels process one 8-row band of the plane per grid step and
evaluate the full multi-width filter core at EVERY pixel position as
full-width vector ops (the VPU's native (8, 128) tiling), with the
per-position edge parameters (E, I, H, width class - packed into one
int32) delivered as a per-pixel plane built by one scatter+broadcast
on the outer jit.  Positions that host no edge ride the same math with
class 0 and pass through; the per-offset write-back is a one-hot
combine over the statically shifted views.  No gathers, no scatters,
no per-edge work at all.

Two passes per plane, chained inside one jit program (one device
launch per plane per frame): all vertical edges first, then all
horizontal edges -- the reference's cols->rows order
(src/lf_apply_tmpl.c:313-466).  Exactness of whole-frame batching is
argued in recon/lf.py: within a direction no edge ever reads another
edge's writes (edge spacing exceeds combined read+write reach), so all
edges of a pass read the pre-pass plane -- which is precisely what the
stencil computes.

Bit-exactness: the filter arithmetic is a restructuring of
ops/lf.py._filter_core (itself parity-tested against the host golden
and the reference oracle, src/loopfilter_tmpl.c:36-161) into
class-masked branch-free form.  The decision lattice per class c at a
position (fm = filter mask with c's tap-continuity terms, flat8in
with c's taps, flat8out for wd16) partitions into big/mid/narrow
branches exactly as the reference's wd16/wd8/wd6/wd4 filters do;
since the branches partition each class's mask and the class one-hots
are mutually exclusive, the per-offset merge is order-free.
tests/test_pallas_lf.py asserts equality against the XLA tier in
interpret mode on randomized tx-tiling geometry; the device-chain e2e
covers real streams.
"""

from __future__ import annotations

import functools

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover - jax always present in this env
    pl = None


def supported() -> bool:
    return pl is not None


LUMA_CLASSES = ((1, 4), (2, 8), (3, 16))
CHROMA_CLASSES = ((1, 4), (2, 6))


def _core(tap, P, classes, bitdepth):
    """Evaluate the multi-width filter decision at every position.

    tap(o): pixel value array at signed offset o from the position
    (o < 0 = p side, o >= 0 = q side; tap(-1-k) = P(k), tap(k) = Q(k)
    in the reference's naming).  P: packed per-position parameters
    (E | I<<8 | H<<16 | cls<<24).  classes: ((cls_idx, wd), ...) for
    this plane type.  Returns {offset: (cond, val)}; conds at one
    offset are mutually exclusive by construction.

    (r5 note: an int16 core for bitdepth <= 10 — the wd16 sums bound
    at 16*1023 — was built and proven bit-exact in interpret mode, but
    this harness's remote Mosaic compiler crashes on any packed-i16
    vector arithmetic, so the core computes in int32 over int16
    storage.)
    """
    bd_m8 = bitdepth - 8
    F = 1 << bd_m8
    maxp = (1 << bitdepth) - 1
    cd_lim = 128 << bd_m8
    wds = sorted(wd for _, wd in classes)
    E = (P & 255) << bd_m8
    I = ((P >> 8) & 255) << bd_m8
    H = ((P >> 16) & 255) << bd_m8
    cls = P >> 24
    oh = {wd: cls == idx for idx, wd in classes}
    a = jnp.abs

    # small-constant multiplies as shift-adds (int32 multiply is a
    # multi-op lowering on the VPU; r5, same argument as pallas_cdef)
    def x2(v):
        return v << 1

    def x3(v):
        return (v << 1) + v

    def x4(v):
        return v << 2

    def x5(v):
        return (v << 2) + v

    def x7(v):
        return (v << 3) - v

    p1, p0, q0, q1 = tap(-2), tap(-1), tap(0), tap(1)
    fm = ((a(p1 - p0) <= I) & (a(q1 - q0) <= I)
          & (x2(a(p0 - q0)) + (a(p1 - q1) >> 1) <= E))

    out = {}

    def emit(o, cond, val):
        if o in out:
            pc, pv = out[o]
            out[o] = (pc | cond, jnp.where(cond, val, pv))
        else:
            out[o] = (cond, val)

    have6, have8, have16 = 6 in wds, 8 in wds, 16 in wds
    narrow = oh[4] & fm

    if have6 or have8 or have16:
        p2, q2 = tap(-3), tap(2)
        fm2 = fm & (a(p2 - p1) <= I) & (a(q2 - q1) <= I)
        f8_6 = ((a(p2 - p0) <= F) & (a(p1 - p0) <= F)
                & (a(q1 - q0) <= F) & (a(q2 - q0) <= F))
    if have8 or have16:
        p3, q3 = tap(-4), tap(3)
        fm3 = fm2 & (a(p3 - p2) <= I) & (a(q3 - q2) <= I)
        f8_8 = f8_6 & (a(p3 - p0) <= F) & (a(q3 - q0) <= F)

    if have6:
        m6 = oh[6] & fm2
        mid6 = m6 & f8_6
        narrow = narrow | (m6 & ~f8_6)
        emit(-2, mid6, (x3(p2) + x2(p1) + x2(p0) + q0 + 4) >> 3)
        emit(-1, mid6, (p2 + x2(p1) + x2(p0) + x2(q0) + q1 + 4) >> 3)
        emit(0, mid6, (p1 + x2(p0) + x2(q0) + x2(q1) + q2 + 4) >> 3)
        emit(1, mid6, (p0 + x2(q0) + x2(q1) + x3(q2) + 4) >> 3)

    mid8 = None
    if have8:
        m8 = oh[8] & fm3
        mid8 = m8 & f8_8
        narrow = narrow | (m8 & ~f8_8)
    if have16:
        m16 = oh[16] & fm3
        p6, p5, p4 = tap(-7), tap(-6), tap(-5)
        q4, q5, q6 = tap(4), tap(5), tap(6)
        f8out = ((a(p6 - p0) <= F) & (a(p5 - p0) <= F)
                 & (a(p4 - p0) <= F) & (a(q4 - q0) <= F)
                 & (a(q5 - q0) <= F) & (a(q6 - q0) <= F))
        big = m16 & f8_8 & f8out
        mid16 = m16 & f8_8 & ~f8out
        narrow = narrow | (m16 & ~f8_8)
        mid8 = mid16 if mid8 is None else (mid8 | mid16)
        emit(-6, big, (x7(p6) + x2(p5) + x2(p4) + p3 + p2 + p1 + p0 + q0
                       + 8) >> 4)
        emit(-5, big, (x5(p6) + x2(p5) + x2(p4) + x2(p3) + p2 + p1 + p0
                       + q0 + q1 + 8) >> 4)
        emit(-4, big, (x4(p6) + p5 + x2(p4) + x2(p3) + x2(p2) + p1 + p0
                       + q0 + q1 + q2 + 8) >> 4)
        emit(-3, big, (x3(p6) + p5 + p4 + x2(p3) + x2(p2) + x2(p1) + p0
                       + q0 + q1 + q2 + q3 + 8) >> 4)
        emit(-2, big, (x2(p6) + p5 + p4 + p3 + x2(p2) + x2(p1) + x2(p0)
                       + q0 + q1 + q2 + q3 + q4 + 8) >> 4)
        emit(-1, big, (p6 + p5 + p4 + p3 + p2 + x2(p1) + x2(p0) + x2(q0)
                       + q1 + q2 + q3 + q4 + q5 + 8) >> 4)
        emit(0, big, (p5 + p4 + p3 + p2 + p1 + x2(p0) + x2(q0) + x2(q1)
                      + q2 + q3 + q4 + q5 + q6 + 8) >> 4)
        emit(1, big, (p4 + p3 + p2 + p1 + p0 + x2(q0) + x2(q1) + x2(q2)
                      + q3 + q4 + q5 + x2(q6) + 8) >> 4)
        emit(2, big, (p3 + p2 + p1 + p0 + q0 + x2(q1) + x2(q2) + x2(q3)
                      + q4 + q5 + x3(q6) + 8) >> 4)
        emit(3, big, (p2 + p1 + p0 + q0 + q1 + x2(q2) + x2(q3) + x2(q4)
                      + q5 + x4(q6) + 8) >> 4)
        emit(4, big, (p1 + p0 + q0 + q1 + q2 + x2(q3) + x2(q4) + x2(q5)
                      + x5(q6) + 8) >> 4)
        emit(5, big, (p0 + q0 + q1 + q2 + q3 + x2(q4) + x2(q5) + x7(q6)
                      + 8) >> 4)
    if mid8 is not None:
        emit(-3, mid8, (x3(p3) + x2(p2) + p1 + p0 + q0 + 4) >> 3)
        emit(-2, mid8, (x2(p3) + p2 + x2(p1) + p0 + q0 + q1 + 4) >> 3)
        emit(-1, mid8, (p3 + p2 + p1 + x2(p0) + q0 + q1 + q2 + 4) >> 3)
        emit(0, mid8, (p2 + p1 + p0 + x2(q0) + q1 + q2 + q3 + 4) >> 3)
        emit(1, mid8, (p1 + p0 + q0 + x2(q1) + q2 + x2(q3) + 4) >> 3)
        emit(2, mid8, (p0 + q0 + q1 + x2(q2) + x3(q3) + 4) >> 3)

    # narrow 4-tap core: every class falls back here when flatness fails
    def iclip_diff(v):
        return jnp.clip(v, -cd_lim, cd_lim - 1)

    hev = (a(p1 - p0) > H) | (a(q1 - q0) > H)
    d30 = x3(q0 - p0)
    fv = jnp.where(hev, iclip_diff(d30 + iclip_diff(p1 - q1)),
                   iclip_diff(d30))
    f1 = jnp.minimum(fv + 4, cd_lim - 1) >> 3
    f2 = jnp.minimum(fv + 3, cd_lim - 1) >> 3
    emit(-1, narrow, jnp.clip(p0 + f2, 0, maxp))
    emit(0, narrow, jnp.clip(q0 - f1, 0, maxp))
    nh = narrow & ~hev
    fo = (f1 + 1) >> 1
    emit(-2, nh, jnp.clip(p1 + fo, 0, maxp))
    emit(1, nh, jnp.clip(q1 - fo, 0, maxp))
    return out


def _out_rows(Wp, bitdepth):
    """Vertical-pass output rows per grid step: 32 up to 1080p-class
    widths; 8 for wider planes (the 4K-width x 32-row int32 live set
    overflows VMEM and crashes the Mosaic compile).  The V pass has no
    row redundancy, so narrow bands cost only step overhead."""
    return 32 if Wp <= 2048 else 8


H_OUT = 32  # horizontal-pass band rows (see _col_tile)


def _col_tile(Wp):
    """Horizontal-pass column tile.  The H pass evaluates the filter
    core at OUT+16 rows to produce OUT output rows, so narrow bands
    waste compute (at the r04 8-row 4K bands: 3x).  Column tiling
    bounds the VMEM live set by width instead of band height, keeping
    32-row bands at any plane width (1.5x).  H edges read/write within
    their own columns -- column tiles need no halo."""
    return Wp if Wp <= 2048 else 1024


@functools.lru_cache(maxsize=None)
def _build_v(nsteps, Wp, classes, bitdepth, interpret, OUT):
    """Vertical-edge pass: one grid step = OUT plane rows, no row halo
    (taps read only within the edge's own rows).  Canvas holds the
    plane at column offset 16 so every static column shift stays in
    bounds; the filter core runs at every canvas position u (plane col
    u - 8) over width Wk = Wp + 16, covering all writer positions of
    the Wp output columns.  Bands whose rows host no vertical edge
    (per-band flag) copy through without evaluating the core."""
    Wc = Wp + 128
    Wk = Wp + 16

    def kernel(flag_ref, canvas_ref, prm_ref, out_ref):
        work = flag_ref[pl.program_id(0)]
        b = canvas_ref[...]

        @pl.when(work == 0)
        def _():
            out_ref[...] = b[:, 16:16 + Wp]

        @pl.when(work != 0)
        def _():
            P = prm_ref[:, 8:8 + Wk]

            def tap(o):
                return b[:, 8 + o : 8 + o + Wk]

            res = b[:, 16:16 + Wp]
            core = _core(tap, P, classes, bitdepth)
            for o, (cond, val) in sorted(core.items()):
                res = jnp.where(cond[:, 8 - o : 8 - o + Wp],
                                val[:, 8 - o : 8 - o + Wp], res)
            out_ref[...] = res

    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            # whole flags vector in SMEM, indexed by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((OUT, Wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT, Wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps * OUT, Wp), jnp.int32),
        interpret=bool(interpret),
    )


@functools.lru_cache(maxsize=None)
def _build_h(nsteps, Wp, classes, bitdepth, interpret, OUT, CT):
    """Horizontal-edge pass: one grid step = an OUT-row x CT-column
    output tile.  Writers for a band live at plane rows [s-5, s+OUT+5]
    (offset reach -6..5), so the core evaluates CORE = OUT+16 rows
    [s-8, s+OUT+8); their taps read rows [s-15, s+OUT+14], covered by
    an (OUT+32)-row int16 canvas window starting at plane row s-16
    (canvas top pad 16 keeps the DMA start at the aligned canvas row
    s).  The packed parameter plane (top pad 8) contributes a CORE-row
    window.  Tiles whose parameter window is empty (per-tile flag)
    copy through without evaluating the core."""
    CORE = OUT + 16
    nct = Wp // CT

    def kernel(flag_ref, canvas_ref, prm_ref, out_ref, band, prm, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        c0 = pl.multiple_of(j * CT, 128)
        d1 = pltpu.make_async_copy(
            canvas_ref.at[pl.ds(i * OUT, OUT + 32), pl.ds(c0, CT)],
            band, sems.at[0])
        d1.start()
        work = flag_ref[i * nct + j] != 0

        @pl.when(work)
        def _():
            d2 = pltpu.make_async_copy(
                prm_ref.at[pl.ds(i * OUT, CORE), pl.ds(c0, CT)],
                prm, sems.at[1])
            d2.start()
            d2.wait()

        d1.wait()
        b = band[...].astype(jnp.int32)

        @pl.when(jnp.logical_not(work))
        def _():
            out_ref[...] = b[16:16 + OUT, :]

        @pl.when(work)
        def _():
            P = prm[...]

            def tap(o):
                return b[8 + o : 8 + o + CORE, :]

            res = b[16:16 + OUT, :]
            core = _core(tap, P, classes, bitdepth)
            for o, (cond, val) in sorted(core.items()):
                res = jnp.where(cond[8 - o : 8 - o + OUT, :],
                                val[8 - o : 8 - o + OUT, :], res)
            out_ref[...] = res

    return pl.pallas_call(
        kernel,
        grid=(nsteps, nct),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),  # flags vec
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((OUT, CT), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps * OUT, Wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((OUT + 32, CT), jnp.int16),
                        pltpu.VMEM((CORE, CT), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=bool(interpret),
    )


def _geom(ph, pw, bitdepth):
    """Shared plane geometry: (Wp, OUTV, RV, OUTH, CT, WH, RH)."""
    Wp = -(-pw // 128) * 128
    OUTV = _out_rows(Wp, bitdepth)
    RV = -(-ph // OUTV) * OUTV
    OUTH = H_OUT
    CT = _col_tile(Wp)
    WH = -(-Wp // CT) * CT
    RH = -(-ph // OUTH) * OUTH
    return Wp, OUTV, RV, OUTH, CT, WH, RH


@functools.lru_cache(maxsize=None)
def _jit_plane(ph, pw, classes, bitdepth, nbv, nbh, interpret):
    """One fused program: scatter+broadcast the packed edge parameters
    into per-pixel planes, vertical band pass, then horizontal band
    pass.  Edge coords arrive in 4x4-cell units; vertical edges span 4
    pixel rows at one pixel column (repeat rows, dilate cols),
    horizontal edges one pixel row across 4 columns (dilate rows,
    repeat cols).  Pad entries sit far out of bounds and drop out of
    the scatter.  Per-band / per-tile any-edge flags (from the cell
    maps, pre-expansion) let the kernels skip the filter core where no
    edge reaches (r5 band culling)."""
    Wp, OUTV, RV, OUTH, CT, WH, RH = _geom(ph, pw, bitdepth)
    Wc = Wp + 128
    W4 = Wp // 4
    W4H = WH // 4
    nsv, nsh, nct = RV // OUTV, RH // OUTH, WH // CT
    kv = _build_v(nsv, Wp, classes, bitdepth, interpret, OUTV) \
        if nbv else None
    kh = _build_h(nsh, WH, classes, bitdepth, interpret, OUTH, CT) \
        if nbh else None

    def expand(cells, row_exact, R, W4t):
        # cell map -> per-pixel parameter plane (r5: the cell maps are
        # HOST-built — the r4 in-graph .at[ys, xs].set scatters cost
        # ~0.6 ms per 131k-entry map on this chip; host numpy builds
        # them in microseconds)
        m = cells
        if row_exact:  # horizontal edges: exact row, 4-col span
            m = jnp.zeros((R // 4, 4, W4t), jnp.int32).at[:, 0, :].set(m)
            m = jnp.repeat(m.reshape(R, W4t), 4, axis=1)
        else:          # vertical edges: 4-row span, exact col
            m = jnp.repeat(m, 4, axis=0)
            m = jnp.zeros((R, W4t, 4), jnp.int32).at[:, :, 0].set(m)
            m = m.reshape(R, W4t * 4)
        return m

    def fn(plane, vcells, hcells):
        if kv is not None:
            cells = vcells
            prm = expand(cells, False, RV, W4)
            prm = jnp.pad(prm, ((0, 0), (16, Wc - Wp - 16)))
            # a vertical edge reads/writes only its own 4 rows: the
            # per-band any() over its cell rows is exact
            flags = (cells != 0).reshape(nsv, -1).any(axis=1) \
                .astype(jnp.int32)
            canvas = jnp.zeros((RV, Wc), jnp.int32).at[
                :ph, 16:16 + pw].set(plane)
            plane = kv(flags, canvas, prm)[:ph, :pw]
        if kh is not None:
            cells = hcells
            prm = expand(cells, True, RH, W4H)
            prm = jnp.pad(prm, ((8, 8), (0, 0)))
            # horizontal writers reach 5 rows above / 6 below the edge
            # row: flag a tile when any edge sits within 2 cell rows
            # (8 px) of its band — a conservative superset
            r4 = (cells != 0).reshape(RH // 4, nct, CT // 4).any(axis=2)
            rpb = OUTH // 4
            idx = jnp.clip(
                jnp.arange(nsh)[:, None] * rpb
                + jnp.arange(-2, rpb + 2)[None, :], 0, RH // 4 - 1)
            flags = r4[idx].any(axis=1).astype(jnp.int32).reshape(-1)
            canvas = jnp.zeros((16 + RH + 16, WH), jnp.int16).at[
                16:16 + ph, :pw].set(plane.astype(jnp.int16))
            plane = kh(flags, canvas, prm)[:ph, :pw]
        return plane

    return jax.jit(fn)


def deblock_plane_pallas(plane_dev, v_edges, h_edges, bitdepth, luma,
                         interpret=False):
    """Both deblock passes of one plane in one device program.

    v_edges / h_edges: (ys, xs, E, I, H, cls) numpy arrays in 4x4-cell
    coordinates (as produced by recon.lf._collect_edges plus the E/I/H
    lookups), or None when the direction has no active edges.  Returns
    the updated device-resident plane (int32).
    """
    from ..devrt import call

    classes = LUMA_CLASSES if luma else CHROMA_CLASSES
    ph, pw = plane_dev.shape
    Wp, OUTV, RV, OUTH, CT, WH, RH = _geom(int(ph), int(pw),
                                           int(bitdepth))

    def cellmap(e, R, W4t):
        if e is None or len(e[0]) == 0:
            return 0, np.zeros((R // 4, W4t), np.int32)
        ys, xs, E, I, H, cls = e
        pk = (E.astype(np.int64) | (I.astype(np.int64) << 8)
              | (H.astype(np.int64) << 16)
              | (cls.astype(np.int64) << 24)).astype(np.int32)
        m = np.zeros((R // 4, W4t), np.int32)
        m[ys, xs] = pk
        return len(ys), m

    nbv, vm = cellmap(v_edges, RV, Wp // 4)
    nbh, hm = cellmap(h_edges, RH, WH // 4)
    if not (nbv or nbh):
        return plane_dev
    fn = _jit_plane(int(ph), int(pw), classes, int(bitdepth),
                    int(bool(nbv)), int(bool(nbh)), bool(interpret))
    return call("deblock", fn, plane_dev, vm, hm)
