"""Device film-grain application (reference fg_apply_tmpl.c:100-241 /
filmgrain_tmpl.c apply loops).

The grain plane and scaling LUT are tiny host-side state (AR synthesis is
a short serial recurrence); the per-pixel work — scaling-LUT gather,
noise scale, clipped add — is one fused elementwise program per plane
over the whole frame.  `idx` is the LUT index plane (the pixel itself
for luma, the uv_mult-combined value or the luma average for chroma).
Parity: tests/test_ops_fg / test_ops_device.py vs recon/filmgrain.py."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _jit_apply(shift, minv, maxv):
    def run(src, idx, grain, lut):
        noise = (lut[idx] * grain + ((1 << shift) >> 1)) >> shift
        return jnp.clip(src + noise, minv, maxv)

    return jax.jit(run)


NSEG = 13  # AV1 caps scaling points at 14 -> 13 segments


def scaling_segments(points, num):
    """Closed-form parameters of the scaling LUT's piecewise-linear
    segments (exact integer semantics of recon/filmgrain.py
    generate_scaling stage 1): 8-bit point coords bx/by padded by
    repeating the last point, per-segment deltas dl.  The device
    program evaluates the LUT with ~NSEG masked linear ramps instead
    of a whole-plane arbitrary-index gather (the gather dominated the
    on-chip film-grain cost: 22 ms per 4K10 plane)."""
    bx = np.zeros(NSEG + 1, dtype=np.int32)
    by = np.zeros(NSEG + 1, dtype=np.int32)
    dl = np.zeros(NSEG, dtype=np.int32)
    if num:
        for i in range(NSEG + 1):
            x, y = points[min(i, num - 1)][:2]
            bx[i], by[i] = x, y
        for i in range(num - 1):
            dx = int(bx[i + 1] - bx[i])
            dy = int(by[i + 1] - by[i])
            dl[i] = dy * ((0x10000 + (dx >> 1)) // dx)
    return bx, by, dl


@functools.lru_cache(maxsize=None)
def _jit_apply_pw(shift, minv, maxv, sx):
    """Gather-free film-grain apply: the scaling value derives from
    the segment parameters by masked linear evaluation — and, for
    bd > 8, the exact two-stage sub-interpolation of generate_scaling
    (f8 at the 8-bit grid cell and its successor, then the
    (rnd + k*rng) >> sx refinement)."""

    def run(src, idx, grain, bx, by, dl):
        x8 = (idx >> sx) if sx else idx

        def f8(x):
            v = jnp.where(x >= bx[NSEG], by[NSEG], by[0])
            for i in range(NSEG):
                m = (x >= bx[i]) & (x < bx[i + 1])
                v = jnp.where(
                    m, by[i] + ((0x8000 + dl[i] * (x - bx[i])) >> 16), v)
            return v

        s0 = f8(x8)
        if sx:
            s1 = f8(x8 + 1)
            k = idx & ((1 << sx) - 1)
            sc = s0 + ((((1 << sx) >> 1) + k * (s1 - s0)) >> sx)
        else:
            sc = s0
        noise = (sc * grain + ((1 << shift) >> 1)) >> shift
        return jnp.clip(src + noise, minv, maxv)

    return jax.jit(run)


def fg_apply_batch(src, grain, lut, shift, minv, maxv, idx=None,
                   segments=None, bitdepth=8):
    """clip(src + round2(scaling[idx] * grain, shift), minv, maxv);
    idx defaults to src (the luma path).  With `segments` (from
    scaling_segments) the scaling evaluates closed-form on device;
    otherwise the LUT gather program runs."""
    if idx is None:
        idx = src
    from ..devrt import call

    if segments is not None:
        bx, by, dl = segments
        out = call("fg",
                   _jit_apply_pw(int(shift), int(minv), int(maxv),
                                 int(bitdepth) - 8),
                   jnp.asarray(src, dtype=jnp.int32),
                   jnp.asarray(idx, dtype=jnp.int32),
                   jnp.asarray(grain, dtype=jnp.int32),
                   jnp.asarray(bx), jnp.asarray(by), jnp.asarray(dl))
        return np.asarray(out)
    out = call("fg", _jit_apply(int(shift), int(minv), int(maxv)),
               jnp.asarray(src, dtype=jnp.int32),
               jnp.asarray(idx, dtype=jnp.int32),
               jnp.asarray(grain, dtype=jnp.int32),
               jnp.asarray(lut, dtype=jnp.int32))
    return np.asarray(out)
