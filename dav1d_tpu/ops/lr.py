"""Device loop restoration: batched 7-tap separable wiener over padded
restoration units (reference wiener_filter_h/v,
src/looprestoration_tmpl.c:44-190).

Each call processes a batch of same-geometry padded units
(B, stripe_h+6, unit_w+6) with per-unit filters — the stripe
decomposition (recon/lr_apply.py) supplies the batches.  Parity:
tests/test_ops_lr.py vs the host numpy formulation."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables


@functools.lru_cache(maxsize=None)
def _jit_wiener(unit_w, stripe_h, bitdepth):
    rb_h = 3 + (bitdepth == 12) * 2
    clip_limit = 1 << (bitdepth + 1 + 7 - rb_h)
    rb_v = 11 - (bitdepth == 12) * 2
    round_offset = 1 << (bitdepth + rb_v - 1)

    def run(P, fh, fv):
        # P: (B, sh+6, uw+6) int32; fh/fv: (B, 3)
        def taps(f):
            mid = 128 - 2 * (f[:, 0] + f[:, 1] + f[:, 2])
            return jnp.stack([f[:, 0], f[:, 1], f[:, 2], mid,
                              f[:, 2], f[:, 1], f[:, 0]], axis=1)

        wh = taps(fh)
        wv = taps(fv)
        mid = sum(wh[:, i, None, None] * P[:, :, i : i + unit_w]
                  for i in range(7))
        mid += (1 << (bitdepth + 6)) + (1 << (rb_h - 1))
        mid = jnp.clip(mid >> rb_h, 0, clip_limit - 1)
        out = sum(wv[:, k, None, None] * mid[:, k : k + stripe_h]
                  for k in range(7))
        out = (out - round_offset + (1 << (rb_v - 1))) >> rb_v
        return jnp.clip(out, 0, (1 << bitdepth) - 1)

    return jax.jit(run)


def wiener_batch(P, fh, fv, bitdepth):
    """(B, sh+6, uw+6) padded units + per-unit (B, 3) half-filters ->
    (B, sh, uw) int32."""
    B, ph, pw = P.shape
    out = _jit_wiener(pw - 6, ph - 6, int(bitdepth))(
        jnp.asarray(P, dtype=jnp.int32),
        jnp.asarray(fh, dtype=jnp.int32),
        jnp.asarray(fv, dtype=jnp.int32))
    return np.asarray(out)


# Self-guided restoration stays on the host tier for now: its exact
# intermediates (p*s, xv*su*one_by_x) exceed int32 and the device has no
# int64 — matching the reference, whose SIMD SGR uses rewritten
# fixed-point factorizations (src/looprestoration_tmpl.c:505-523 vs the
# asm); the split-multiply reformulation is tracked in STATUS.md.
