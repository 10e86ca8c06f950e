"""Mesh-sharded CDEF: row bands across chips with ppermute halo rows.

The multi-chip decode (Settings.mesh) shards pass-2 residual batches
along the batch axis — no cross-chip reads.  CDEF is the in-loop stage
with genuine spatial coupling: every 8x8 unit reads up to 2 pre-CDEF
pixels beyond its own rows, so a row-banded layout needs its neighbours'
boundary rows.  This module runs the filter stage under
`jax.shard_map` over the mesh with `lax.ppermute` halo exchange — the
decoder's communication backend (SURVEY §2.7; the reference serializes
the same dependency through its row-progress protocol,
src/cdef_apply_tmpl.c:40-99 cdef_line backups + top/bottom pointers):

- the frame planes are padded to `n_devices` equal 64-aligned row bands
  (rows past the frame edge pre-filled with the CDEF sentinel, exactly
  what the single-chip canvas shows the bottom units);
- each device ppermutes its first/last 2 rows to its neighbours; the
  frame's outer boundary (device 0's top, device N-1's bottom) takes
  the sentinel instead;
- every unit is 8-row-aligned so no unit straddles a 64-aligned band:
  writes are band-local, only the canvas reads cross, and those come
  from the exchanged halos — bit-exact with the single-chip pass by
  construction (asserted by tests/test_multichip.py's md5 equality).

The direction search has no cross-band reads (8x8 gathers inside a
band) and runs on the host tier like the rest of the collection.
"""

from __future__ import annotations

import numpy as np

from .cdef import (INT16_MIN, UV_DIRS_420, UV_DIRS_422, cdef_collect,
                   cdef_find_dir_batch)

# compiled shard_map programs keyed on (mesh, band/unit geometry, filter
# params): jax's jit cache is keyed on function identity, so rebuilding
# the closure per frame would re-trace and re-lower every call
_PROGRAMS: dict = {}


def _band_program(mesh, ndev, axis, band_h, pw, cap, w, h, damping,
                  bitdepth):
    key = (mesh, band_h, pw, cap, w, h, damping, bitdepth)
    prog = _PROGRAMS.get(key)
    if prog is not None:
        return prog

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec

    try:
        from jax import shard_map as _sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm

    from ..ops.cdef import _jit_filter

    filt = _jit_filter(w, h, damping, bitdepth)
    sent = jnp.int32(INT16_MIN)
    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]

    def band_fn(bandp, ys, xs, pri, sec, dr):
        bp = bandp[0]
        # halo exchange: neighbours' pre-CDEF boundary rows ride the
        # mesh interconnect; the frame's outer edge takes sentinels
        top = jax.lax.ppermute(bp[-2:], axis, fwd)
        bot = jax.lax.ppermute(bp[:2], axis, bwd)
        idx = jax.lax.axis_index(axis)
        top = jnp.where(idx == 0, sent, top)
        bot = jnp.where(idx == ndev - 1, sent, bot)
        canvas = jnp.concatenate([top, bp, bot], axis=0)
        canvas = jnp.pad(canvas, ((0, 0), (2, 2)),
                         constant_values=INT16_MIN)
        out = filt(canvas, ys[0] + 2, xs[0] + 2, pri[0], sec[0], dr[0])
        yg = ys[0][:, None, None] + jnp.arange(h)[None, :, None]
        xg = xs[0][:, None, None] + jnp.arange(w)[None, None, :]
        return bp.at[yg, xg].set(out)[None]

    uspec = PartitionSpec(axis)
    prog = jax.jit(_sm(band_fn, mesh=mesh, in_specs=(uspec,) * 6,
                       out_specs=uspec))
    _PROGRAMS[key] = prog
    return prog


def cdef_frame_mesh(f) -> bool:
    """Mesh-sharded CDEF pass.  Returns False when no mesh is attached
    (caller runs the single-chip path); True when the frame was handled
    (including the no-units case)."""
    mesh = getattr(f, "mesh", None)
    if mesh is None:
        return False
    from ..headers import PixelLayout

    hdr = f.frame_hdr
    units = cdef_collect(f)
    if units is None:
        return True
    bys, bxs, y_pri, y_sec, uv_pri, uv_sec, uvlvl = units

    bitdepth = f.bitdepth
    bdmin8 = bitdepth - 8
    damping = hdr.cdef.damping + bdmin8
    layout = f.layout
    ss_ver = int(layout == PixelLayout.I420)
    ss_hor = int(layout != PixelLayout.I444)
    has_chroma = layout != PixelLayout.I400
    uv_dir_map = UV_DIRS_422 if layout == PixelLayout.I422 else UV_DIRS_420

    # direction search + strength adjust (host tier; identical to
    # recon.cdef.cdef_frame)
    from ..native import lib as _nlib

    need_dir = (y_pri | uv_pri) > 0
    dirs = np.zeros(bys.size, dtype=np.int64)
    variances = np.zeros(bys.size, dtype=np.int64)
    if need_dir.any():
        src0 = f.planes[0]
        dbys = (bys[need_dir] * 4).astype(np.int64)
        dbxs = (bxs[need_dir] * 4).astype(np.int64)
        if _nlib is not None:
            d = np.empty(dbys.size, dtype=np.int64)
            v = np.empty(dbys.size, dtype=np.int64)
            _nlib.dtpu_cdef_find_dir_pos(
                src0.ctypes.data, src0.shape[1], dbys.ctypes.data,
                dbxs.ctypes.data, dbys.size, int(bitdepth),
                d.ctypes.data, v.ctypes.data)
        else:
            ar8 = np.arange(8)
            blk = src0[dbys[:, None, None] + ar8[None, :, None],
                       dbxs[:, None, None] + ar8[None, None, :]]
            d, v = cdef_find_dir_batch(blk, bitdepth)
        dirs[need_dir] = d
        variances[need_dir] = v

    v6 = variances >> 6
    i = np.zeros_like(variances)
    nz = v6 > 0
    i[nz] = np.minimum(np.frexp(v6[nz].astype(np.float64))[1] - 1, 12)
    y_adj = np.where(variances != 0, (y_pri * (4 + i) + 8) >> 4, 0)

    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    ndev = int(mesh.devices.size)
    axis = mesh.axis_names[0]

    def run_plane(plane, pl, uys, uxs, upri, usec, udir, sv, sh):
        """One plane's filter under shard_map with ppermute halos."""
        w, h = 8 >> sh, 8 >> sv
        pw, ph = (f.bw * 4) >> sh, (f.bh * 4) >> sv
        band_h = -(-ph // ndev)
        band_h = (band_h + 63) & ~63  # units never straddle a band
        H = band_h * ndev
        padded = np.full((H, pw), INT16_MIN, dtype=np.int32)
        padded[:ph] = plane[:ph, :pw]

        # bucket units per band, padded to the max per-band count with
        # dummy zero-strength units (the filter writes px back there)
        band = uys // band_h
        per = [np.flatnonzero(band == b) for b in range(ndev)]
        cap = max(1, max(len(p) for p in per))
        cap = 1 << (cap - 1).bit_length()

        def pack(vals, local=None, fill=0):
            out = np.full((ndev, cap), fill, dtype=np.int32)
            for b, idx in enumerate(per):
                v = vals[idx]
                if local is not None:
                    v = v - b * local
                out[b, : len(idx)] = v
            return out

        # dummy pad units sit far out of bounds: their canvas reads
        # clamp harmlessly and the output scatter drops them (they must
        # NOT alias a real unit's rect, whose write order would then be
        # unspecified)
        ys_l = pack(uys, local=band_h, fill=1 << 20)
        xs_l = pack(uxs, fill=1 << 20)
        pri_l = pack(upri)
        sec_l = pack(usec)
        dir_l = pack(udir)

        prog = _band_program(mesh, ndev, axis, band_h, pw, cap, w, h,
                             int(damping - (1 if pl else 0)),
                             int(bitdepth))
        from ..devrt import mesh_fetch, mesh_put
        spec = PartitionSpec(axis)
        bands = mesh_put(padded.reshape(ndev, band_h, pw), mesh, spec)
        args = [mesh_put(a, mesh, spec)
                for a in (ys_l, xs_l, pri_l, sec_l, dir_l)]
        out = prog(bands, *args)
        plane[:ph, :pw] = mesh_fetch(out).reshape(H, pw)[:ph]

    m_pri = y_pri > 0
    m = (m_pri & ((y_adj | y_sec) != 0)) | (~m_pri & (y_sec > 0))
    if m.any():
        run_plane(f.planes[0], 0, (bys[m] * 4).astype(np.int64),
                  (bxs[m] * 4).astype(np.int64),
                  np.where(m_pri, y_adj, 0)[m], y_sec[m],
                  np.where(m_pri, dirs, 0)[m], 0, 0)
    if has_chroma:
        m = uvlvl != 0
        if m.any():
            uvdm = np.asarray(uv_dir_map, dtype=np.int64)
            udir = np.where(uv_pri > 0, uvdm[dirs], 0)[m]
            for pl in (1, 2):
                run_plane(f.planes[pl], pl,
                          ((bys[m] * 4) >> ss_ver).astype(np.int64),
                          ((bxs[m] * 4) >> ss_hor).astype(np.int64),
                          uv_pri[m], uv_sec[m], udir, ss_ver, ss_hor)
    return True
