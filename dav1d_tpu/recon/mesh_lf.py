"""Mesh-sharded deblocking: row bands across chips with ppermute halos.

Extends the decoder's communication backend (recon/mesh_cdef.py) to the
deblock stage.  Geometry (module docstring of recon/lf.py): within a
direction pass no edge ever reads another edge's writes, so both passes
batch freely; the only cross-band coupling is the horizontal pass near
band boundaries:

- vertical edges filter 4-row segments along their own rows — fully
  band-local, no exchange;
- horizontal edges read up to 7 rows and write up to 6 rows across the
  edge, so a band's boundary edges read (and write) its neighbours'
  rows.  The band program ppermutes 8 post-vertical boundary rows in,
  filters on the extended canvas, then ppermutes the *written* halo
  rows back with a write mask (the scatter windows of the boundary
  segments); the neighbour blends them into its own rows.  Write
  windows of distinct edges never collide (same invariant), so the
  blend is exact.

The reference serializes this coupling through its per-sbrow task
ordering + progress atomics (src/lf_apply_tmpl.c, src/thread_task.c);
here it is two ICI halo exchanges per plane.  Bit-exactness vs the
single-chip pass is asserted by tests/test_multichip.py.
"""

from __future__ import annotations

import numpy as np

from ..headers import PixelLayout

_PROGRAMS: dict = {}


def _band_program(mesh, ndev, axis, band_h, pw, sig, bitdepth):
    """sig: tuple of (dir_, wd_px, cap) class descriptors in apply
    order."""
    key = (mesh, band_h, pw, sig, bitdepth)
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

    from ..ops.lf import lf_apply

    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    HALO = 8

    def band_fn(bandp, *packed):
        p = bandp[0]
        args = [a[0] for a in packed]  # 5 arrays per class descriptor
        cls = [(d, wd, args[5 * i : 5 * i + 5])
               for i, (d, wd, _cap) in enumerate(sig)]
        # vertical pass: segments live entirely inside their band
        for d, wd, (ys, xs, E, I, H) in cls:
            if d == 0:
                p = lf_apply(p, ys, xs, E, I, H, True, wd, bitdepth)
        # horizontal pass on the 8-row halo-extended canvas
        top = jax.lax.ppermute(p[-HALO:], axis, fwd)
        bot = jax.lax.ppermute(p[:HALO], axis, bwd)
        ext = jnp.concatenate([top, p, bot], axis=0)
        mark = jnp.zeros(ext.shape, dtype=jnp.bool_)
        for d, wd, (ys, xs, E, I, H) in cls:
            if d == 1:
                ext, mark = lf_apply(ext, ys + HALO, xs, E, I, H, False,
                                     wd, bitdepth, mark=mark)
        # write-back exchange: boundary edges wrote into the halo rows;
        # ship those rows (with their scatter-window masks) to the
        # owning band and blend
        rb_v = jax.lax.ppermute(ext[:HALO], axis, bwd)
        rb_m = jax.lax.ppermute(mark[:HALO], axis, bwd)
        rt_v = jax.lax.ppermute(ext[-HALO:], axis, fwd)
        rt_m = jax.lax.ppermute(mark[-HALO:], axis, fwd)
        core = ext[HALO:-HALO]
        core = core.at[:HALO].set(
            jnp.where(rt_m, rt_v, core[:HALO]))
        core = core.at[-HALO:].set(
            jnp.where(rb_m, rb_v, core[-HALO:]))
        return core[None]

    n_in = 1 + 5 * len(sig)
    uspec = PartitionSpec(axis)
    prog = jax.jit(_sm(band_fn, mesh=mesh, in_specs=(uspec,) * n_in,
                       out_specs=uspec))
    _PROGRAMS[key] = prog
    return prog


def _pack_per_band(vals, band, ndev, cap, fill):
    out = np.full((ndev, cap), fill, dtype=np.int32)
    for b in range(ndev):
        idx = np.flatnonzero(band == b)
        out[b, : len(idx)] = vals[idx]
    return out


def deblock_frame_mesh(f) -> bool:
    """Row-banded deblock over Settings.mesh.  Returns False when no
    mesh is attached; True when the frame was handled."""
    mesh = getattr(f, "mesh", None)
    if mesh is None:
        return False

    from .lf import _collect_edges, _fix_tile_boundaries

    hdr = f.frame_hdr
    if hdr.tiling.cols > 1 or hdr.tiling.rows > 1:
        _fix_tile_boundaries(f)
    e_lut, i_lut = f.lf_lim_lut
    level = f.lf_level
    ss_ver, ss_hor = f.ss_ver, f.ss_hor
    ch4 = (f.h4 + ss_ver) >> ss_ver
    cw4 = (f.w4 + ss_hor) >> ss_hor
    do_uv = f.layout != PixelLayout.I400 and \
        (hdr.loopfilter.level_u or hdr.loopfilter.level_v)
    y_wd = {1: 4, 2: 8, 3: 16}
    uv_wd = {1: 4, 2: 6}

    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    ndev = int(mesh.devices.size)
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, PartitionSpec(axis))

    def run_plane(plane, wd_planes, pd_of_dir, wd_map, n_rows, n_cols, sv,
                  sh):
        ph = (f.bh * 4) >> sv
        pw = (f.bw * 4) >> sh
        band_h = -(-ph // ndev)
        band_h = (band_h + 63) & ~63
        H = band_h * ndev

        # collect both directions, bucket per (dir, class)
        sig = []
        packs = []
        far = 1 << 20
        for dir_ in (0, 1):
            ys, xs, cls, L = _collect_edges(level, wd_planes[dir_],
                                            pd_of_dir[dir_], dir_,
                                            n_rows, n_cols)
            if ys.size == 0:
                continue
            E = e_lut[L]
            I = i_lut[L]
            Hh = L >> 4
            for c, wd_px in wd_map.items():
                sel = cls == c
                if not sel.any():
                    continue
                py = ys[sel] * 4
                px = xs[sel] * 4
                band = py // band_h
                caps = np.bincount(band, minlength=ndev).max()
                cap = 1 << (int(caps) - 1).bit_length() if caps else 1
                sig.append((dir_, wd_px, cap))
                packs.extend([
                    _pack_per_band(py - band * band_h, band, ndev, cap,
                                   far),
                    _pack_per_band(px, band, ndev, cap, far),
                    _pack_per_band(E[sel], band, ndev, cap, -1),
                    _pack_per_band(I[sel], band, ndev, cap, -1),
                    _pack_per_band(Hh[sel], band, ndev, cap, 0)])
        if not sig:
            return

        padded = np.zeros((H, pw), dtype=np.int32)
        padded[:ph] = plane[:ph, :pw]
        prog = _band_program(mesh, ndev, axis, band_h, pw, tuple(sig),
                             int(f.bitdepth))
        from ..devrt import mesh_fetch, mesh_put
        spec = PartitionSpec(axis)
        bands = mesh_put(padded.reshape(ndev, band_h, pw), mesh, spec)
        args = [mesh_put(a, mesh, spec) for a in packs]
        out = prog(bands, *args)
        plane[:ph, :pw] = mesh_fetch(out).reshape(H, pw)[:ph]

    lf = hdr.loopfilter
    if lf.level_y[0] or lf.level_y[1]:
        run_plane(f.planes[0], f.lf_wd_y, (0, 1), y_wd, f.h4, f.w4, 0, 0)
    if do_uv:
        for pl in (1, 2):
            run_plane(f.planes[pl], f.lf_wd_uv, (1 + pl, 1 + pl), uv_wd,
                      ch4, cw4, ss_ver, ss_hor)
    return True
