"""Device deblocking filter (reference loop_filter semantics,
src/loopfilter_tmpl.c:36-161).

One program per (width class, direction): gathers the N 4-line edge
segments from the plane, evaluates the masked 4/6/8/16-tap filters, and
scatters the filtered taps back.  Segments within a direction pass have
disjoint read/write sets (see recon/lf.py module docstring), so the
batched scatter is exact.  Parity: tests/test_ops_lf.py vs the host
recon.lf._loop_filter_batch."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _filter_core(W, E, I, H, wd, bitdepth):
    """W: (N, 4, 2m) tap windows; returns (out (N, 4, 2m), written mask
    (2m,) bool template per offset)."""
    bd_m8 = bitdepth - 8
    F = 1 << bd_m8
    maxp = (1 << bitdepth) - 1
    cd_lim = 128 << bd_m8
    m = {4: 2, 6: 3, 8: 4, 16: 7}[wd]
    E = (E << bd_m8)[:, None]
    I = (I << bd_m8)[:, None]
    H = (H << bd_m8)[:, None]

    def P(k):
        return W[:, :, m - 1 - k]

    def Q(k):
        return W[:, :, m + k]

    p1, p0, q0, q1 = P(1), P(0), Q(0), Q(1)
    fm = ((jnp.abs(p1 - p0) <= I) & (jnp.abs(q1 - q0) <= I)
          & (jnp.abs(p0 - q0) * 2 + (jnp.abs(p1 - q1) >> 1) <= E))
    p2 = q2 = p3 = q3 = None
    if wd > 4:
        p2, q2 = P(2), Q(2)
        fm &= (jnp.abs(p2 - p1) <= I) & (jnp.abs(q2 - q1) <= I)
        if wd > 6:
            p3, q3 = P(3), Q(3)
            fm &= (jnp.abs(p3 - p2) <= I) & (jnp.abs(q3 - q2) <= I)

    out = {}

    def emit(o, cond, val):
        if o in out:
            pc, pv = out[o]
            out[o] = (pc | cond, jnp.where(cond, val, pv))
        else:
            out[o] = (cond, val)

    big = None
    if wd >= 16:
        p6, p5, p4 = P(6), P(5), P(4)
        q4, q5, q6 = Q(4), Q(5), Q(6)
        flat8out = ((jnp.abs(p6 - p0) <= F) & (jnp.abs(p5 - p0) <= F)
                    & (jnp.abs(p4 - p0) <= F) & (jnp.abs(q4 - q0) <= F)
                    & (jnp.abs(q5 - q0) <= F) & (jnp.abs(q6 - q0) <= F))
    flat8in = None
    if wd >= 6:
        flat8in = ((jnp.abs(p2 - p0) <= F) & (jnp.abs(p1 - p0) <= F)
                   & (jnp.abs(q1 - q0) <= F) & (jnp.abs(q2 - q0) <= F))
        if wd >= 8:
            flat8in &= (jnp.abs(p3 - p0) <= F) & (jnp.abs(q3 - q0) <= F)

    if wd >= 16:
        big = fm & flat8out & flat8in
        emit(-6, big, (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0
                       + 8) >> 4)
        emit(-5, big, (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0
                       + q0 + q1 + 8) >> 4)
        emit(-4, big, (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0
                       + q0 + q1 + q2 + 8) >> 4)
        emit(-3, big, (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0
                       + q0 + q1 + q2 + q3 + 8) >> 4)
        emit(-2, big, (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2
                       + q0 + q1 + q2 + q3 + q4 + 8) >> 4)
        emit(-1, big, (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2
                       + q1 + q2 + q3 + q4 + q5 + 8) >> 4)
        emit(0, big, (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2
                      + q2 + q3 + q4 + q5 + q6 + 8) >> 4)
        emit(1, big, (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2
                      + q3 + q4 + q5 + q6 * 2 + 8) >> 4)
        emit(2, big, (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2
                      + q4 + q5 + q6 * 3 + 8) >> 4)
        emit(3, big, (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2
                      + q5 + q6 * 4 + 8) >> 4)
        emit(4, big, (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2
                      + q6 * 5 + 8) >> 4)
        emit(5, big, (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7
                      + 8) >> 4)

    notbig = fm if big is None else (fm & ~big)
    if wd >= 8:
        mid = notbig & flat8in
        emit(-3, mid, (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3)
        emit(-2, mid, (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3)
        emit(-1, mid, (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3)
        emit(0, mid, (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3)
        emit(1, mid, (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3)
        emit(2, mid, (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3)
        narrow = notbig & ~flat8in
    elif wd == 6:
        mid = notbig & flat8in
        emit(-2, mid, (p2 + 2 * p2 + 2 * p1 + 2 * p0 + q0 + 4) >> 3)
        emit(-1, mid, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
        emit(0, mid, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
        emit(1, mid, (p0 + 2 * q0 + 2 * q1 + 2 * q2 + q2 + 4) >> 3)
        narrow = notbig & ~flat8in
    else:
        narrow = fm

    def iclip_diff(v):
        return jnp.clip(v, -cd_lim, cd_lim - 1)

    hev = (jnp.abs(p1 - p0) > H) | (jnp.abs(q1 - q0) > H)
    fh = iclip_diff(3 * (q0 - p0) + iclip_diff(p1 - q1))
    fnh = iclip_diff(3 * (q0 - p0))
    fv = jnp.where(hev, fh, fnh)
    f1 = jnp.minimum(fv + 4, cd_lim - 1) >> 3
    f2 = jnp.minimum(fv + 3, cd_lim - 1) >> 3
    emit(-1, narrow, jnp.clip(p0 + f2, 0, maxp))
    emit(0, narrow, jnp.clip(q0 - f1, 0, maxp))
    nh = narrow & ~hev
    fo = (f1 + 1) >> 1
    emit(-2, nh, jnp.clip(p1 + fo, 0, maxp))
    emit(1, nh, jnp.clip(q1 - fo, 0, maxp))

    res = W
    for o, (cond, val) in out.items():
        col = m + o
        res = res.at[:, :, col].set(
            jnp.where(cond, val, res[:, :, col]))
    return res


# per width class: write reach in tap offsets (all other window taps are
# read-only; scattering them back could collide with ANOTHER segment's
# write — write extents of distinct edges never collide, read extents do)
_WRITE_REACH = {4: (-2, 1), 6: (-2, 1), 8: (-3, 2), 16: (-6, 5)}


def lf_apply(plane, ys, xs, E, I, H, along_rows, wd, bitdepth,
             mark=None):
    """Traceable one-class filter pass over `plane` (composes inside
    jit/shard_map).  With `mark` (a bool array shaped like plane), the
    write-reach windows are additionally scattered as True into it and
    (plane', mark') returned — the halo write mask of the mesh-sharded
    deblock (recon/mesh_lf.py)."""
    m = {4: 2, 6: 3, 8: 4, 16: 7}[wd]
    lo, hi = _WRITE_REACH[wd]
    lines = jnp.arange(4)
    taps = jnp.arange(2 * m) - m
    if along_rows:  # vertical edge: lines advance down rows
        ridx = ys[:, None, None] + lines[None, :, None]
        cidx = xs[:, None, None] + taps[None, None, :]
    else:
        ridx = ys[:, None, None] + taps[None, :, None]
        cidx = xs[:, None, None] + lines[None, None, :]
    W = plane[ridx, cidx]
    if not along_rows:
        W = W.transpose(0, 2, 1)
    res = _filter_core(W, E, I, H, wd, bitdepth)
    wr = slice(m + lo, m + hi + 1)
    if not along_rows:
        res = res.transpose(0, 2, 1)
        out = plane.at[ridx[:, wr], cidx].set(res[:, wr])
        if mark is not None:
            mark = mark.at[ridx[:, wr], cidx].set(True)
    else:
        out = plane.at[ridx, cidx[:, :, wr]].set(res[:, :, wr])
        if mark is not None:
            mark = mark.at[ridx, cidx[:, :, wr]].set(True)
    return out if mark is None else (out, mark)


@functools.lru_cache(maxsize=None)
def _jit_lf(wd, along_rows, bitdepth):
    def run(plane, ys, xs, E, I, H):
        return lf_apply(plane, ys, xs, E, I, H, along_rows, wd, bitdepth)

    return jax.jit(run)


def loop_filter_batch(plane, ys, xs, E, I, H, along_rows, wd, bitdepth):
    """Device variant of recon.lf._loop_filter_batch; returns the updated
    plane as a jax array (caller composes passes device-side).  The
    segment count is padded to a power of two so programs are reused
    across frames; pad entries sit far out of bounds, where jax gathers
    clip and scatters drop."""
    n = len(ys)
    nb = 1
    while nb < n:
        nb <<= 1

    def pad(a, fill):
        out = np.full(nb, fill, dtype=np.int32)
        out[:n] = a
        return jnp.asarray(out)

    from ..devrt import call

    far = 1 << 24
    return call("deblock", _jit_lf(int(wd), bool(along_rows),
                                   int(bitdepth)),
                jnp.asarray(plane, dtype=jnp.int32),
                pad(ys, far), pad(xs, far), pad(E, -1), pad(I, -1),
                pad(H, 0))
