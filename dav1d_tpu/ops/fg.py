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


def fg_apply_batch(src, grain, lut, shift, minv, maxv, idx=None):
    """clip(src + round2(lut[idx] * grain, shift), minv, maxv); idx
    defaults to src (the luma path)."""
    if idx is None:
        idx = src
    from ..devrt import call

    out = call("fg", _jit_apply(int(shift), int(minv), int(maxv)),
               jnp.asarray(src, dtype=jnp.int32),
               jnp.asarray(idx, dtype=jnp.int32),
               jnp.asarray(grain, dtype=jnp.int32),
               jnp.asarray(lut, dtype=jnp.int32))
    return np.asarray(out)
