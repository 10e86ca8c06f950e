"""Pallas CDEF: whole-plane constrained directional filtering as a
row-band kernel.

Why Pallas here: the XLA formulation (ops/cdef.py _jit_filter_plane)
gathers every 8x8 unit into a (B, h+4, w+4) tensor and scatters the
filtered blocks back — two arbitrary-index gather/scatter passes that
lower poorly on TPU.  CDEF is structurally a STENCIL: every pixel reads
a <=2-px neighbourhood with direction-dependent taps.  This kernel
processes one unit-row band per grid step (h+4 canvas rows DMA'd into
VMEM), computes all h output rows as full (h, W) blocks — exactly the
VPU's (8, 128) tiling — and selects each tap's offset by the unit's
direction via one-hot masks over 8 statically-shifted views.  No
gathers, no scatters, no per-unit work at all: absent units ride the
same math with pri=sec=0 and pass through.

Bit-exactness: the arithmetic is a restructuring of ops/cdef.py
_jit_filter (itself verified against the scalar golden model and the
reference oracle, src/cdef_tmpl.c:106): same constrain, same parity
taps, same min/max clamp with the padding-sentinel replacement.
tests/test_pallas_cdef.py asserts equality against the XLA tier in
interpret mode and on real streams via the device-chain e2e.

Reference: src/cdef_tmpl.c:56-321; the asm families x86/cdef*.asm.
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

from ..recon.cdef import _DIR_DX, _DIR_DY

_DY = np.asarray(_DIR_DY)  # (2, 12)
_DX = np.asarray(_DIR_DX)

# int16-lattice padding sentinel: any S with S - px != -32768 for all
# px in [0, 4095] keeps abs() wrap-free (see _build kernel comment);
# INT16_MIN itself would hit abs(-32768) at px == 0
_SENT16 = -28672


def supported() -> bool:
    return pl is not None


def _ulog2_vec(v):
    """floor(log2(v)) for v in [1, 512) as compares (no clz needed)."""
    s = jnp.zeros_like(v)
    for k in range(1, 10):
        s = s + (v >= (1 << k)).astype(v.dtype)
    return s


def _out_rows(Wp):
    """Output rows per grid step: wider bands amortize the per-step
    DMA + grid overhead; capped for wide planes so the int32 live set
    fits VMEM.  (r5 note: an all-int16 lattice — which would halve the
    live set and the VPU op width — was built and proven bit-exact in
    interpret mode, but THIS harness's remote Mosaic compiler crashes
    on any packed-i16 vector arithmetic (HTTP 500 from
    tpu_compile_helper on a bare vector<8x128x2xi16> add; int32
    controls compile fine), so the lattice stays int32 with int16
    storage."""
    return 32 if Wp <= 2048 else 16


@functools.lru_cache(maxsize=None)
def _build(nsteps, Wp, Wc, damping, bitdepth, interpret, OUT_ROWS):
    """One grid step = OUT_ROWS output plane rows: parameters
    are per-PIXEL planes (units replicate their strength/direction over
    their rows/cols on the outer jit), so a step can span unit-row
    boundaries — 8x8 luma units and 4x4/4x8 chroma units ride the same
    kernel.  The (OUT_ROWS + 4)-row canvas band (2-row halo each side)
    DMAs from HBM into an (OUT_ROWS + 8)-row VMEM scratch."""
    bdmin8 = bitdepth - 8
    band_rows = OUT_ROWS + 4

    def constrain(diff, thr, shift):
        adiff = jnp.abs(diff)
        v = jnp.minimum(adiff, jnp.maximum(0, thr - (adiff >> shift)))
        return jnp.where(diff < 0, -v, v)

    def kernel(flag_ref, canvas_ref, pri_ref, sec_ref, dir_ref, out_ref,
               band, sem):
        i = pl.program_id(0)
        work = flag_ref[i]
        # OUT_ROWS+8-row copy: DMA slice heights must align to the
        # (8, 128) tile; the canvas carries enough bottom padding for
        # the last step's over-read
        dma = pltpu.make_async_copy(
            canvas_ref.at[pl.ds(i * OUT_ROWS, OUT_ROWS + 8)], band, sem)
        dma.start()
        dma.wait()
        # int16 storage, int32 math (see _out_rows note: this
        # harness's remote compiler rejects packed-i16 arithmetic)
        b = band[...].astype(jnp.int32)  # rows band_rows.. unused

        def window(oy, ox):
            # oy/ox are trace-time tap constants: static slices
            return b[2 + oy : 2 + oy + OUT_ROWS, 2 + ox : 2 + ox + Wp]

        px = window(0, 0)

        # band culling: a CDEF unit writes only its own pixels, so a
        # band whose unit rows carry no nonzero strength passes through
        # exactly — skip the whole decision lattice (most 4K bands on
        # typical content; the flag is derived from the unit maps on
        # the outer jit).
        @pl.when(work == 0)
        def _():
            out_ref[...] = px

        @pl.when(work != 0)
        def _():
            pri = pri_ref[...].astype(jnp.int32)  # per-pixel maps
            sec = sec_ref[...].astype(jnp.int32)
            dr = dir_ref[...].astype(jnp.int32)
            oh = [dr == d for d in range(8)]

            def tap(k, off, sgn):
                """Per-direction shifted-window select for tap table
                row k at table offset `off`, sign `sgn`.  The direction
                sets per distinct offset partition the 8 directions, so
                a where-chain over offsets is exact — and replaces the
                r4 one-hot mask-multiply-add form, whose ~7 int32
                multiplies per tap per pixel dominated the 4K lattice
                cost (int32 multiply is a multi-op lowering on the
                VPU; select is one op)."""
                byoff = {}
                for d in range(8):
                    oy = sgn * int(_DY[k][off + d])
                    ox = sgn * int(_DX[k][off + d])
                    byoff.setdefault((oy, ox), []).append(d)
                acc = None
                for (oy, ox), ds in byoff.items():
                    m = oh[ds[0]]
                    for d in ds[1:]:
                        m = m | oh[d]
                    v = window(oy, ox)
                    acc = v if acc is None else jnp.where(m, v, acc)
                return acc

            pri_nz = pri > 0
            sec_nz = sec > 0
            both = pri_nz & sec_nz
            pri_shift = jnp.maximum(
                0, damping - _ulog2_vec(jnp.maximum(pri, 1)))
            sec_shift = damping - _ulog2_vec(jnp.maximum(sec, 1))
            # primary tap weight is 4 or 3 by strength parity (and 2/3
            # for k=1): selects over shifted forms, no per-pixel
            # int32 multiply
            par = ((pri >> bdmin8) & 1) > 0

            sum_ = jnp.zeros_like(px)
            mn = px
            mx = px

            def acc_minmax(v, mn, mx):
                u = jnp.where(v == _SENT16, 0x7FFF0000, v)
                return jnp.minimum(mn, u), jnp.maximum(mx, v)

            for k in range(2):
                p0 = tap(k, 2, 1)
                p1 = tap(k, 2, -1)
                x = (constrain(p0 - px, pri, pri_shift)
                     + constrain(p1 - px, pri, pri_shift))
                if k == 0:  # weight: parity ? 3 : 4
                    pc = jnp.where(par, (x << 1) + x, x << 2)
                else:       # weight: parity ? 3 : 2
                    pc = jnp.where(par, (x << 1) + x, x << 1)
                # mn/mx feed ONLY the clip under `both` (r4 wrapped
                # every tap in where(both, tap, px) — suppressed
                # garbage that the final where never reads anyway;
                # the _SENT16 sentinel already neutralizes
                # outside-canvas taps for min, and is a no-op for max)
                sum_ += jnp.where(pri_nz, pc, 0)
                mn, mx = acc_minmax(p0, mn, mx)
                mn, mx = acc_minmax(p1, mn, mx)
                for sdir_off in (4, 0):
                    for sgn in (1, -1):
                        s = tap(k, sdir_off, sgn)
                        sc = constrain(s - px, sec, sec_shift)
                        sc = sc + sc if k == 0 else sc  # sec_tap = 2-k
                        sum_ += jnp.where(sec_nz, sc, 0)
                        mn, mx = acc_minmax(s, mn, mx)

            out = px + ((sum_ - (sum_ < 0) + 8) >> 4)
            out = jnp.where(both, jnp.clip(out, mn, mx), out)
            out_ref[...] = jnp.where(pri_nz | sec_nz, out, px)

    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            # per-band work flags: the whole (nsteps,) vector lives in
            # SMEM, indexed by program_id (blocked SMEM scalars fail
            # the TPU lowering's tiling check)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # canvas (HBM)
            pl.BlockSpec((OUT_ROWS, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT_ROWS, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT_ROWS, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT_ROWS, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps * OUT_ROWS, Wp),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((OUT_ROWS + 8, Wc), jnp.int16),
                        pltpu.SemaphoreType.DMA],
        interpret=bool(interpret),
    )


def _filter_tail(w, h, ph, pw, damping, bitdepth, interpret):
    """Shared outer-jit tail: sentinel canvas + per-pixel parameter
    planes broadcast from the (nbands, ncols) unit-grid maps, then the
    band kernel.  r5: the maps arrive PRE-BUILT from the host — the r4
    in-graph scatters of the unit vectors cost a measured 0.59 ms per
    131k-unit map on this chip (x3 maps x3 planes ~ 5.3 ms/frame at
    4K), vs microseconds of host numpy and 261 KB of upload."""
    nbands = -(-ph // h)
    ncols = -(-pw // w)
    Wp = ((ncols * w + 127) // 128) * 128
    OUT = _out_rows(Wp)
    R = -(-(nbands * h) // OUT) * OUT
    nsteps = R // OUT
    Wc = Wp + 128  # canvas columns padded to the VMEM lane tile
    ucols = Wp // w
    kern = _build(nsteps, Wp, Wc, damping, bitdepth, interpret, OUT)

    def apply(plane, pm, sm, dm):
        canvas = jnp.full((R + 16, Wc), _SENT16, jnp.int16)
        canvas = jax.lax.dynamic_update_slice(
            canvas, plane[:ph, :pw].astype(jnp.int16), (2, 2))
        pad_c = ((0, 0), (0, ucols - ncols))
        pm = jnp.pad(pm, pad_c)
        sm = jnp.pad(sm, pad_c)
        dm = jnp.pad(dm, pad_c)

        # per-band work flags: OUT is a multiple of h (unit rows align
        # with band steps), so a step's flag is an exact any() over the
        # strengths of the unit rows it spans — no conservatism needed
        rps = OUT // h  # unit rows per grid step
        am = jnp.pad((pm | sm) != 0,
                     ((0, nsteps * rps - nbands), (0, 0)))
        flags = am.reshape(nsteps, -1).any(axis=1).astype(jnp.int32)

        def rep(m):  # unit map -> per-pixel (R, Wp) int16 plane
            # int16 halves the HBM->VMEM traffic of the parameter
            # planes; the kernel widens on load
            m = m.astype(jnp.int16)
            m = jnp.repeat(jnp.repeat(m, w, axis=1), h, axis=0)
            return jnp.pad(m, ((0, R - nbands * h), (0, 0)))

        out = kern(flags, canvas, rep(pm), rep(sm), rep(dm))
        return plane.at[:ph, :pw].set(out[:ph, :pw])

    return apply


def _host_maps(ph, pw, w, h, uys, uxs, *vals):
    """(nbands, ncols) int32 unit-grid maps from the host unit lists
    (CDEF units are h/w-aligned, so uys // h indexes exactly)."""
    nbands = -(-int(ph) // int(h))
    ncols = -(-int(pw) // int(w))
    ub = np.asarray(uys) // int(h)
    uc = np.asarray(uxs) // int(w)
    out = []
    for v in vals:
        m = np.zeros((nbands, ncols), np.int32)
        m[ub, uc] = v
        out.append(m)
    return out


@functools.lru_cache(maxsize=None)
def _jit_plane(w, h, ph, pw, damping, bitdepth, interpret):
    """Host-map variant: same filter semantics as ops/cdef.py
    _jit_filter_plane, parameters as (nbands, ncols) grid maps."""
    return jax.jit(_filter_tail(w, h, ph, pw, damping, bitdepth,
                                interpret))


@functools.lru_cache(maxsize=None)
def _jit_plane_resident(w, h, ph, pw, damping, bitdepth, luma,
                        layout_422, interpret):
    """Fully resident variant: the per-unit direction (and, for luma,
    the variance-based primary-strength adjustment) derive in-graph
    from the resident direction/variance maps
    (ops/cdef.cdef_find_dir_maps_dev).  r5: CDEF's unit grid is the
    same 8-px luma grid the dir/var maps live on (chroma units cover
    one luma 8x8 each), so the derivation is pure ELEMENTWISE math on
    the (nbands, ncols) grids — the r4 form gathered dmap/vmap at
    per-unit indices and scattered three parameter maps, ~2-3 ms per
    4K plane of pure data shuffling.  Semantics: reference
    adjust_strength (src/cdef_apply_tmpl.c) for luma; chroma
    directions remap through the layout's UV dir table.  Units whose
    derived pri and sec are both zero pass through in-kernel, matching
    the host path's selection masks."""
    tail = _filter_tail(w, h, ph, pw, damping, bitdepth, interpret)
    nbands = -(-ph // h)
    ncols = -(-pw // w)
    if not luma:
        from ..recon.cdef import UV_DIRS_420, UV_DIRS_422
        uvdm = jnp.asarray(UV_DIRS_422 if layout_422 else UV_DIRS_420,
                           dtype=jnp.int32)

    def fn(plane, pm, sm, dmap, vmap):
        d = dmap[:nbands, :ncols]
        mp = pm > 0
        if luma:
            v = vmap[:nbands, :ncols]
            v6 = v >> 6
            lg = jnp.zeros_like(v6)
            # floor(log2(v6)) by compares; var <= sum(partial^2)*w
            # < 2^30, so 30 bits bound it
            for k in range(1, 31):
                lg = lg + (v6 >= (1 << k)).astype(v6.dtype)
            adj = (pm * (4 + jnp.minimum(lg, 12)) + 8) >> 4
            pri = jnp.where(mp & (v != 0), adj, 0)
            dirs = jnp.where(mp, d, 0)
        else:
            pri = pm
            dirs = jnp.where(mp, uvdm[d], 0)
        return tail(plane, pri, sm, dirs)

    return jax.jit(fn)


def cdef_filter_plane_resident(plane_dev, dmap, vmap, ph, pw, uys, uxs,
                               w, h, pri, sec, damping, bitdepth, luma,
                               layout_422, interpret=False):
    """Band-kernel CDEF with resident dir/var maps: one launch per
    plane, parameters derived on-device (no dir fetch sync); strength
    maps built host-side (unit lists are host state anyway)."""
    from ..devrt import call

    pm, sm = _host_maps(ph, pw, w, h, uys, uxs, pri, sec)
    if dmap.shape[0] < -(-int(ph) // int(h)) \
            or dmap.shape[1] < -(-int(pw) // int(w)):
        # plane alloc can undershoot the 8-px grid of a differently
        # padded luma; pad the resident maps (pass-through cells)
        dmap = jnp.pad(dmap, ((0, 8), (0, 8)))
        vmap = jnp.pad(vmap, ((0, 8), (0, 8)))
    return call("cdef_filter",
                _jit_plane_resident(int(w), int(h), int(ph), int(pw),
                                    int(damping), int(bitdepth),
                                    bool(luma), bool(layout_422),
                                    bool(interpret)),
                plane_dev, pm, sm, dmap, vmap)


def cdef_filter_plane_pallas(plane_dev, ph, pw, ys, xs, w, h, pri, sec,
                             dirs, damping, bitdepth, interpret=False):
    """Drop-in for ops/cdef.cdef_filter_plane_dev, Pallas band kernel;
    unit parameters become host-built grid maps (r5)."""
    from ..devrt import call

    pm, sm, dm = _host_maps(ph, pw, w, h, ys, xs, pri, sec, dirs)
    return call("cdef_filter",
                _jit_plane(int(w), int(h), int(ph), int(pw), int(damping),
                           int(bitdepth), bool(interpret)),
                plane_dev, pm, sm, dm)
