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


@functools.lru_cache(maxsize=None)
def _cost_weights():
    """(128, 8) f32 weight matrix W with cost[d] = sum_c W[c, d] *
    psum[c]^2 — the normative cost lattice (src/cdef_tmpl.c:56-104)
    expressed as one contraction so it runs on the MXU instead of as
    ~40 narrow unaligned int32 slice/reverse/reduce passes on the VPU
    (probed at 2.6 of the 3.2 ms/4K-frame cdef_dir cost,
    tools/probe_dir_cost.py)."""
    div = (840, 420, 280, 210, 168, 140, 120)
    div_alt = (420, 210, 140)
    _, offs, bins = _onehot_cat()
    w = np.zeros((128, 8), dtype=np.float32)
    # psum map order: diag0, alt0, hv0, alt1, diag1, alt2, hv1, alt3
    # -> cost rows 0, 1, 2, 3, 4, 5, 6, 7 respectively
    for m, d in ((0, 0), (4, 4)):          # diagonals: 15 bins
        o = offs[m]
        for i in range(7):
            w[o + i, d] = div[i]
            w[o + 14 - i, d] = div[i]
        w[o + 7, d] = 105
    for m, d in ((2, 2), (6, 6)):          # horizontal/vertical: 8 bins
        w[offs[m]:offs[m] + 8, d] = 105
    for m, d in ((1, 1), (3, 3), (5, 5), (7, 7)):  # alts: 11 bins
        o = offs[m]
        for i in range(3):
            w[o + i, d] = div_alt[i]
            w[o + 10 - i, d] = div_alt[i]
        w[o + 3:o + 8, d] = 105
    return w


def _dir_from_psum_t(psum_t):
    """(128, N) int32 partial sums -> (dir, var) of shape (N,); the
    normative cost lattice (src/cdef_tmpl.c:56-104), exact integer
    arithmetic, N kept on the LANE axis throughout.

    Layout note (probed, tools/probe_dir_cost.py): with cost laid out
    (N, 8), jnp.argmax + take_along_axis over the minor-8 axis cost
    2.0 ms of the 3.2 ms 4K cdef_dir program — 16x lane waste plus
    gather lowering.  In this transposed form the cost rows are eight
    (N,) vectors and the argmax is an unrolled compare chain of
    full-width VPU ops.

    Exactness of the split-f32 matmul form: |psum| <= 8*128 = 2^10, so
    sq = psum^2 <= 2^20.  Split sq = hi*2^11 + lo (lo < 2^11): per
    cost row the weight sum is <= 4461 (diag: 2*2178 + 105), so
    sum(w*lo) <= 4461*2047 < 2^24 and sum(w*hi) <= (sum w*sq) >> 11 <=
    880803840 >> 11 < 2^19 — both inside f32's exact-integer range
    (partial sums of nonnegative terms never exceed the total).
    The recombined int32 cost equals the reference's (worst-case total
    880,803,840 < 2^31: bins partition the 64 pixels, so per-bin
    |psum| <= binsize*128 and the weighted sum is maximized by the
    all-|128| block).  HIGHEST pins full-f32 MXU passes (the default
    bf16x3 lowering is not exact for >8-bit integer operands)."""
    wc_t = jnp.asarray(_cost_weights().T)  # (8, 128)
    sq = psum_t * psum_t
    lo = (sq & 2047).astype(jnp.float32)
    hi = (sq >> 11).astype(jnp.float32)
    dot = functools.partial(jnp.dot, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    cost = (dot(wc_t, hi).astype(jnp.int32) << 11) + \
        dot(wc_t, lo).astype(jnp.int32)  # (8, N)
    # first-max-strict argmax (jnp.argmax tie semantics) as an
    # unrolled compare chain over the 8 rows
    best = jnp.zeros(cost.shape[1], dtype=jnp.int32)
    best_cost = cost[0]
    for d in range(1, 8):
        m = cost[d] > best_cost
        best = jnp.where(m, jnp.int32(d), best)
        best_cost = jnp.where(m, cost[d], best_cost)
    alt = best ^ 4
    alt_cost = cost[0]
    for d in range(1, 8):
        alt_cost = jnp.where(alt == d, cost[d], alt_cost)
    return best, (best_cost - alt_cost) >> 10


def _find_dir_t(blocks_t, bitdepth):
    """Core on transposed blocks (64, N): one bf16 MXU contraction to
    the (128, N) partial sums, then the matmul-form cost lattice
    (values exact in bf16/f32: px in [-128, 127], partial sums
    <= 8*128 < 2^24)."""
    cat, _, _ = _onehot_cat()
    onehot_t = jnp.asarray(cat.T, dtype=jnp.bfloat16)  # (128, 64)
    px = (blocks_t >> (bitdepth - 8)) - 128
    psum_t = jnp.dot(onehot_t, px.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32
                     ).astype(jnp.int32)
    return _dir_from_psum_t(psum_t)


@functools.lru_cache(maxsize=None)
def _jit_find_dir(bitdepth):
    def fn(blocks):
        return _find_dir_t(blocks.reshape(-1, 64).T, bitdepth)

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
    def fn(plane):
        # reshape/transpose into (64, N) transposed block columns, then
        # the single bf16 MXU contraction (_find_dir_t).  An einsum
        # straight out of the plane layout was tried in r5 and measured
        # 2.3x SLOWER on the chip than the explicit transpose (7.2 vs
        # 3.1 ms/4K frame); the transposed-N-on-lanes form here then
        # cut the program from 3.2 to ~0.4 ms by killing the minor-8
        # argmax/take (probe data in _dir_from_psum_t's docstring).
        blocks_t = plane[:R8 * 8, :W8 * 8].reshape(R8, 8, W8, 8) \
            .transpose(1, 3, 0, 2).reshape(64, -1)
        d, v = _find_dir_t(blocks_t, bitdepth)
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
