"""Motion compensation: batched subpel filtering.

TPU-first formulation of the reference mc family (reference src/mc_tmpl.c:
put_8tap_c at :130-180, prep_8tap at :~260): instead of one call per block
with runtime-selected H/V paths, we run ONE fused separable-filter kernel
over a batch of fixed-size source windows. The H-only / V-only / copy special
cases collapse into the H+V path by using an identity filter row
([..,64,..] at tap 3): the nested-floor rounding identity

    floor((floor((H + 2^(5-ib))/2^(6-ib)) + 2^(ib-1))/2^ib)
      == floor((H + 32 + 2^(5-ib)) / 64)

makes the fused path bit-exact with every specialised reference path for all
intermediate_bits, so a single batched kernel covers all 16x16 subpel
combinations.

All math in int32; `bitdepth` is static (8/10/12). Blocks are (N, h+7, w+7)
gathered source windows starting at (-3, -3) relative to the block origin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Number of left/top context pixels a window carries before the block origin.
MC_PAD_LEFT = 3
MC_PAD_RIGHT = 4  # and after w/h


def intermediate_bits(bitdepth: int) -> int:
    # reference src/mc_tmpl.c:40-47
    return 4 if bitdepth == 8 else 14 - bitdepth


def _rnd_shift(x: jnp.ndarray, sh: int) -> jnp.ndarray:
    return (x + ((1 << sh) >> 1)) >> sh


def _put_core(src, fh, fv, w, h, bitdepth):
    ib = intermediate_bits(bitdepth)
    # Horizontal pass over all h+7 rows: mid[n, y, x] for x in [0, w)
    # src window column x corresponds to tap offsets x + [0..7].
    taps = jnp.stack([src[:, :, t : t + w] for t in range(8)], axis=-1)
    mid = jnp.sum(taps * fh[:, None, None, :], axis=-1, dtype=jnp.int32)
    mid = _rnd_shift(mid, 6 - ib)
    # Vertical pass over h rows.
    vtaps = jnp.stack([mid[:, t : t + h, :] for t in range(8)], axis=-1)
    out = jnp.sum(vtaps * fv[:, None, None, :], axis=-1, dtype=jnp.int32)
    out = _rnd_shift(out, 6 + ib)
    out = jnp.clip(out, 0, (1 << bitdepth) - 1)
    # narrow output: values are clipped into [0, 2^bd), and these
    # predictions' only consumer is the host-side scatter — 4x/2x
    # fewer bytes cross the transport (devrt.XFER budget)
    return out.astype(jnp.uint8 if bitdepth == 8 else jnp.uint16)


@functools.partial(jax.jit, static_argnames=("w", "h", "bitdepth"))
def _put_8tap_prog(src, fh, fv, *, w, h, bitdepth):
    return _put_core(src, fh, fv, w, h, bitdepth)


def put_8tap(
    src: jnp.ndarray,  # (N, h+7, w+7) int32 pixels
    fh: jnp.ndarray,  # (N, 8) int32 horizontal filter (identity row if mx==0)
    fv: jnp.ndarray,  # (N, 8) int32 vertical filter (identity row if my==0)
    *,
    w: int,
    h: int,
    bitdepth: int,
) -> jnp.ndarray:
    """Batched put_8tap, bit-exact with reference put_8tap_c for every
    (mx, my) combination (see module docstring for the equivalence proof)."""
    from ..devrt import call

    return call("mc", _put_8tap_prog, src, fh, fv, w=w, h=h,
                bitdepth=bitdepth)


@functools.partial(jax.jit, static_argnames=("w", "h", "bitdepth"))
def _put_8tap_resident_prog(
    plane: jnp.ndarray,  # device-resident reference plane
    dys: jnp.ndarray,  # (N,) int32 block-origin rows
    dxs: jnp.ndarray,  # (N,) int32 block-origin cols
    fh: jnp.ndarray,
    fv: jnp.ndarray,
    vw,  # valid width/height of the reference (dynamic scalars: one
    vh,  # program per (w, h), shared across ref slots)
    *,
    w: int,
    h: int,
    bitdepth: int,
) -> jnp.ndarray:
    """put_8tap gathering its windows from a device-resident reference
    plane (the 8-slot ref state living on the chip between frames —
    SURVEY §5 checkpoint/resume note): clamped index gather (emu_edge)
    happens on device, so only block coords and filter rows cross the
    host boundary."""
    ys = jnp.clip(dys[:, None] + jnp.arange(-3, h + 4)[None], 0, vh - 1)
    xs = jnp.clip(dxs[:, None] + jnp.arange(-3, w + 4)[None], 0, vw - 1)
    src = plane[ys[:, :, None], xs[:, None, :]]
    return _put_core(src, fh, fv, w, h, bitdepth)


def put_8tap_resident(plane, dys, dxs, fh, fv, vw, vh, *, w, h, bitdepth):
    from ..devrt import call

    return call("mc_resident", _put_8tap_resident_prog, plane, dys, dxs,
                fh, fv, vw, vh, w=w, h=h, bitdepth=bitdepth)


@functools.partial(jax.jit, static_argnames=("w", "h", "bitdepth"))
def prep_8tap(
    src: jnp.ndarray,
    fh: jnp.ndarray,
    fv: jnp.ndarray,
    *,
    w: int,
    h: int,
    bitdepth: int,
) -> jnp.ndarray:
    """Batched prep_8tap producing int16-range intermediates for compound
    prediction (reference src/mc_tmpl.c prep_8tap_c): like put but the final
    shift keeps intermediate_bits of headroom and subtracts PREP_BIAS."""
    ib = intermediate_bits(bitdepth)
    prep_bias = 0 if bitdepth == 8 else 8192
    taps = jnp.stack([src[:, :, t : t + w] for t in range(8)], axis=-1)
    mid = jnp.sum(taps * fh[:, None, None, :], axis=-1, dtype=jnp.int32)
    mid = _rnd_shift(mid, 6 - ib)
    vtaps = jnp.stack([mid[:, t : t + h, :] for t in range(8)], axis=-1)
    out = jnp.sum(vtaps * fv[:, None, None, :], axis=-1, dtype=jnp.int32)
    out = _rnd_shift(out, 6)
    return out - prep_bias


def avg(tmp1: jnp.ndarray, tmp2: jnp.ndarray, *, bitdepth: int) -> jnp.ndarray:
    """Compound average (reference src/mc_tmpl.c avg_c)."""
    ib = intermediate_bits(bitdepth)
    sh = ib + 1
    prep_bias = 0 if bitdepth == 8 else 8192
    rnd = (1 << ib) + prep_bias * 2
    out = (tmp1 + tmp2 + rnd) >> sh
    return jnp.clip(out, 0, (1 << bitdepth) - 1)


def w_avg(
    tmp1: jnp.ndarray, tmp2: jnp.ndarray, weight: jnp.ndarray, *, bitdepth: int
) -> jnp.ndarray:
    """Distance-weighted compound (reference src/mc_tmpl.c w_avg_c)."""
    ib = intermediate_bits(bitdepth)
    sh = ib + 4
    prep_bias = 0 if bitdepth == 8 else 8192
    rnd = (8 << ib) + prep_bias * 16
    out = (tmp1 * weight + tmp2 * (16 - weight) + rnd) >> sh
    return jnp.clip(out, 0, (1 << bitdepth) - 1)


def mask(
    tmp1: jnp.ndarray, tmp2: jnp.ndarray, m: jnp.ndarray, *, bitdepth: int
) -> jnp.ndarray:
    """Per-pixel masked compound (reference src/mc_tmpl.c mask_c)."""
    ib = intermediate_bits(bitdepth)
    sh = ib + 6
    prep_bias = 0 if bitdepth == 8 else 8192
    rnd = (32 << ib) + prep_bias * 64
    out = (tmp1 * m + tmp2 * (64 - m) + rnd) >> sh
    return jnp.clip(out, 0, (1 << bitdepth) - 1)
