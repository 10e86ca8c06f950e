"""Batched CDEF on device (JAX/XLA).

Device port of the batched formulation in dav1d_tpu.recon.cdef:
direction search = one-hot projection matmuls over (N, 64) px blocks
(MXU-shaped), constrained filtering = 12 per-tap gathers over (N, h, w)
int32 lanes with per-unit strengths/directions. Bit-exact with the numpy
batch (itself verified against the scalar golden model / oracle).
Reference: src/cdef_tmpl.c:56-321.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..recon.cdef import INT16_MIN, _DIR_DX, _DIR_DY, _onehot_maps


def _bucket(n: int) -> int:
    b = 64
    while b < n:
        b <<= 1
    return b


def _onehot_cat():
    """All 8 one-hot projection maps concatenated into ONE (64, 128)
    matrix (+ per-map offsets): a single MXU matmul replaces 8 int32
    contractions (int matmuls lower to VPU loops on TPU — measured
    4.3 ms/frame at 4K in DEVICE_FRAME_r04; the values are exact in
    bf16/f32: px in [-128, 127], partial sums <= 8*128 < 2^24)."""
    maps = _onehot_maps()
    bins = [m.shape[1] for m in maps]
    cat = np.zeros((64, 128), dtype=np.float32)
    off = 0
    offs = []
    for m in maps:
        cat[:, off:off + m.shape[1]] = m
        offs.append(off)
        off += m.shape[1]
    return cat, offs, bins


def _dir_from_psum(psum, offs, bins, div, div_alt):
    """(N, 128) int32 partial sums -> (dir, var); the normative cost
    lattice (src/cdef_tmpl.c:56-104), exact integer arithmetic."""
    ps = [psum[:, o:o + b] for o, b in zip(offs, bins)]
    diag0, alt0, hv0, alt1, diag1, alt2, hv1, alt3 = ps
    cost = [None] * 8
    cost[2] = (hv0 * hv0).sum(axis=1) * 105
    cost[6] = (hv1 * hv1).sum(axis=1) * 105
    for diag, ci in ((diag0, 0), (diag1, 4)):
        sq = diag * diag
        cost[ci] = ((sq[:, :7] + sq[:, 8:][:, ::-1]) * div).sum(axis=1) \
            + sq[:, 7] * 105
    for n, alt in enumerate((alt0, alt1, alt2, alt3)):
        sq = alt * alt
        c = sq[:, 3:8].sum(axis=1) * 105
        c += ((sq[:, :3] + sq[:, 8:][:, ::-1]) * div_alt).sum(axis=1)
        cost[n * 2 + 1] = c
    cost = jnp.stack(cost, axis=1)
    best = jnp.argmax(cost, axis=1)
    best_cost = jnp.take_along_axis(cost, best[:, None], 1)[:, 0]
    alt_cost = jnp.take_along_axis(cost, (best ^ 4)[:, None], 1)[:, 0]
    return best.astype(jnp.int32), (best_cost - alt_cost) >> 10


@functools.lru_cache(maxsize=None)
def _jit_find_dir(bitdepth):
    cat, offs, bins = _onehot_cat()
    onehot = jnp.asarray(cat, dtype=jnp.bfloat16)
    div = jnp.asarray([840, 420, 280, 210, 168, 140, 120], dtype=jnp.int32)
    div_alt = jnp.asarray([420, 210, 140], dtype=jnp.int32)

    def fn(blocks):
        px = (blocks.reshape(-1, 64) >> (bitdepth - 8)) - 128
        psum = jnp.dot(px.astype(jnp.bfloat16), onehot,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32)
        return _dir_from_psum(psum, offs, bins, div, div_alt)

    return jax.jit(fn)


def cdef_find_dir_batch(blocks, bitdepth):
    n = blocks.shape[0]
    nb = _bucket(n)
    blk = np.zeros((nb, 8, 8), dtype=np.int32)
    blk[:n] = blocks
    from ..devrt import call

    d, v = call("cdef_dir", _jit_find_dir(bitdepth), jnp.asarray(blk))
    return np.asarray(d)[:n].astype(np.int64), \
        np.asarray(v)[:n].astype(np.int64)


@functools.lru_cache(maxsize=None)
def _jit_find_dir_maps(R8, W8, bitdepth):
    base = _jit_find_dir(bitdepth)

    def fn(plane):
        # reshape/transpose into (N, 64) block rows, then the single
        # bf16 MXU contraction (_jit_find_dir).  An einsum straight
        # out of the plane layout was tried in r5 and measured 2.3x
        # SLOWER on the chip (7.2 vs 3.1 ms/4K frame — XLA's chosen
        # layout change for the two-axis contraction loses to the
        # explicit transpose), so the transpose form stays.
        blocks = plane[:R8 * 8, :W8 * 8].reshape(R8, 8, W8, 8) \
            .transpose(0, 2, 1, 3).reshape(-1, 64)
        d, v = base(blocks)
        return d.reshape(R8, W8), v.reshape(R8, W8)

    return jax.jit(fn)


def cdef_find_dir_maps_dev(plane_dev, bitdepth):
    """Direction search for every 8-aligned 8x8 block of the resident
    luma plane, gather-free: CDEF units sit on the 8-px grid, so the
    block extraction is a reshape/transpose instead of the
    arbitrary-index gather that dominated the on-chip CDEF cost
    (DEVICE_FRAME_r03/r04 cdef_dir rows).  Returns device-resident
    (dir, var) maps of shape (H//8, W//8); callers index them at
    unit coordinates (reference cdef_find_dir, src/cdef_tmpl.c:56)."""
    from ..devrt import call

    ph, pw = plane_dev.shape
    return call("cdef_dir",
                _jit_find_dir_maps(ph // 8, pw // 8, bitdepth), plane_dev)


@functools.lru_cache(maxsize=None)
def _jit_filter(w, h, damping, bitdepth):
    dir_dy = jnp.asarray(_DIR_DY, dtype=jnp.int32)
    dir_dx = jnp.asarray(_DIR_DX, dtype=jnp.int32)
    bdmin8 = bitdepth - 8
    i16min = jnp.int32(INT16_MIN)

    def ulog2(v):
        return 31 - jax.lax.clz(v)

    def constrain(diff, threshold, shift):
        adiff = jnp.abs(diff)
        v = jnp.minimum(adiff, jnp.maximum(0, threshold - (adiff >> shift)))
        return jnp.where(diff < 0, -v, v)

    def fn(canvas, ys, xs, pri, sec, dirs):
        yg = ys[:, None, None] + jnp.arange(h)[None, :, None]
        xg = xs[:, None, None] + jnp.arange(w)[None, None, :]
        px = canvas[yg, xg]

        pri_nz = (pri > 0)[:, None, None]
        sec_nz = (sec > 0)[:, None, None]
        both = pri_nz & sec_nz
        pri_shift = jnp.maximum(
            0, damping - ulog2(jnp.maximum(pri, 1)))[:, None, None]
        sec_shift = (damping
                     - ulog2(jnp.maximum(sec, 1)))[:, None, None]
        pri_thr = pri[:, None, None]
        sec_thr = sec[:, None, None]
        pri_tap = (4 - ((pri >> bdmin8) & 1))[:, None, None]

        def tap(dy, dx):
            return canvas[yg + dy[:, None, None], xg + dx[:, None, None]]

        sum_ = jnp.zeros_like(px)
        mn = px
        mx = px

        def acc(v, mn, mx):
            u = jnp.where(v == i16min, jnp.int32(0x7FFF0000), v)
            return jnp.minimum(mn, u), jnp.maximum(mx, v)

        for k in range(2):
            dy = dir_dy[k][2 + dirs]
            dx = dir_dx[k][2 + dirs]
            p0 = tap(dy, dx)
            p1 = tap(-dy, -dx)
            ptk = pri_tap if k == 0 else (pri_tap & 3) | 2
            pc = ptk * (constrain(p0 - px, pri_thr, pri_shift)
                        + constrain(p1 - px, pri_thr, pri_shift))
            sum_ += jnp.where(pri_nz, pc, 0)
            mn, mx = acc(jnp.where(both, p0, px), mn, mx)
            mn, mx = acc(jnp.where(both, p1, px), mn, mx)
            sec_tap = 2 - k
            for sdir_off in (4, 0):
                dy2 = dir_dy[k][sdir_off + dirs]
                dx2 = dir_dx[k][sdir_off + dirs]
                for sgn in (1, -1):
                    s = tap(sgn * dy2, sgn * dx2)
                    sc = sec_tap * constrain(s - px, sec_thr, sec_shift)
                    sum_ += jnp.where(sec_nz, sc, 0)
                    mn, mx = acc(jnp.where(both, s, px), mn, mx)

        out = px + ((sum_ - (sum_ < 0) + 8) >> 4)
        return jnp.where(both, jnp.clip(out, mn, mx), out)

    return jax.jit(fn)


def cdef_filter_batch(canvas, ys, xs, w, h, pri, sec, dirs, damping,
                      bitdepth):
    """Same interface as recon.cdef.cdef_filter_batch; runs on device."""
    n = len(ys)
    nb = _bucket(n)

    def pad(a, fill=0):
        out = np.full(nb, fill, dtype=np.int32)
        out[:n] = a
        return jnp.asarray(out)

    from ..devrt import call

    out = call("cdef_filter", _jit_filter(w, h, int(damping),
                                           int(bitdepth)),
               jnp.asarray(canvas, dtype=jnp.int32), pad(ys, 2),
               pad(xs, 2), pad(pri), pad(sec), pad(dirs))
    return np.asarray(out)[:n].astype(np.int64)


# ---- device-resident plane forms (the chained filter pipeline:
# recon/device_chain.py keeps the planes on the device across deblock ->
# CDEF, so these gather their inputs from and scatter their outputs to
# the resident plane instead of round-tripping canvases) ----------------

@functools.lru_cache(maxsize=None)
def _jit_find_dir_plane(bitdepth):
    base = _jit_find_dir(bitdepth)

    def fn(plane, ys, xs):
        yg = ys[:, None, None] + jnp.arange(8)[None, :, None]
        xg = xs[:, None, None] + jnp.arange(8)[None, None, :]
        return base(plane[yg, xg])

    return jax.jit(fn)


def cdef_find_dir_plane_dev(plane_dev, ys, xs, bitdepth):
    """Direction search over 8x8 luma blocks gathered straight from the
    device-resident plane; returns host (dirs, variances)."""
    n = len(ys)
    nb = _bucket(n)

    def pad(a):
        out = np.zeros(nb, dtype=np.int32)
        out[:n] = a
        return jnp.asarray(out)

    from ..devrt import call

    d, v = call("cdef_dir", _jit_find_dir_plane(int(bitdepth)),
                plane_dev, pad(ys), pad(xs))
    return np.asarray(d)[:n].astype(np.int64), \
        np.asarray(v)[:n].astype(np.int64)


@functools.lru_cache(maxsize=None)
def _jit_filter_plane(w, h, ph, pw, damping, bitdepth):
    filt = _jit_filter(w, h, damping, bitdepth)

    def fn(plane, ys, xs, pri, sec, dirs):
        canvas = jnp.pad(plane[:ph, :pw], 2,
                         constant_values=jnp.int32(INT16_MIN))
        out = filt(canvas, ys + 2, xs + 2, pri, sec, dirs)
        yg = ys[:, None, None] + jnp.arange(h)[None, :, None]
        xg = xs[:, None, None] + jnp.arange(w)[None, None, :]
        # pad units sit far out of bounds: the scatter drops them
        return plane.at[yg, xg].set(out)

    return jax.jit(fn)


def cdef_filter_plane_dev(plane_dev, ph, pw, ys, xs, w, h, pri, sec,
                          dirs, damping, bitdepth):
    """Filter every unit of one plane in place on the device: canvas
    build (sentinel pad), unit gather, constrained filter, and scatter
    back are one XLA program; returns the updated resident plane."""
    n = len(ys)
    nb = _bucket(n)
    far = 1 << 24

    def pad(a, fill=0):
        out = np.full(nb, fill, dtype=np.int32)
        out[:n] = a
        return jnp.asarray(out)

    from ..devrt import call

    return call("cdef_filter", _jit_filter_plane(w, h, int(ph), int(pw),
                                                 int(damping),
                                                 int(bitdepth)),
                plane_dev, pad(ys, far), pad(xs, far), pad(pri),
                pad(sec), pad(dirs))
