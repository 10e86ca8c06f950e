"""Pallas TPU kernel for the batched inverse transforms.

One fused VMEM-resident kernel per (tx size, tx type, bitdepth): a tile
of coefficient blocks is loaded once, the full 2-D transform (row pass,
rectangular rescale, column pass, final rounding) runs entirely on-chip,
and only the residuals go back to HBM — where the stacked-jnp version
(ops/itx.py itx_batch) materializes intermediate lane tensors between XLA
fusions. The butterfly math is the same shared polymorphic 1-D kernel
code as the golden model (recon/itx.py), so the paths are bit-identical
by construction and parity-tested (tests/test_pallas_itx.py). Reference
semantics: src/itx_1d.c + src/itx_tmpl.c:44-121.

Mosaic constraints shape the body: everything stays 2-D ((batch,
lane-data) vectors; no 3-D reshapes, which infer-vector-layout rejects),
and lane transposes between the row and column passes are expressed as
per-column slice+concat. 12-bit needs int64 lanes (ops/itx.py), which
Pallas TPU lanes don't support — those fall back to itx_batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..levels import TxfmType
from ..recon.itx import _1D_FNS, TX1D_TYPES, TX_SHIFT, wht4
from .itx import _txinfo

try:  # pallas is TPU-only (plus CPU interpret); keep import soft
    from jax.experimental import pallas as pl
except Exception:  # pragma: no cover
    pl = None

def _block_b(tx):
    """Batch tile: sublane-friendly multiple of 8, scaled down for large
    transforms so the kernel's live lane set fits scoped VMEM."""
    w, h, _, _ = _txinfo(tx)
    n = min(w, 32) * min(h, 32)
    return max(8, min(256, (4096 // n) * 4))


def _core2d(cf, tx, txtp, bitdepth):
    """All-2-D variant of ops.itx._itx_core: cf (B, sh*sw) int32 ->
    (B, h*w) row-major residuals."""
    w, h, lw, lh = _txinfo(tx)
    sw, sh = min(w, 32), min(h, 32)
    B = cf.shape[0]
    maxp = (1 << bitdepth) - 1

    if txtp == TxfmType.WHT_WHT:
        g = cf >> 2
        # lanes[y*4+x] = grid[x][y] as (B, 1) slices
        lanes = [g[:, x * 4 + y : x * 4 + y + 1]
                 for y in range(4) for x in range(4)]
        for y in range(4):
            wht4(lanes, y * 4, 1)
        for x in range(4):
            wht4(lanes, x, 4)
        return jnp.concatenate(lanes, axis=1)

    is_rect2 = (w * 2 == h) or (h * 2 == w)
    shift = TX_SHIFT[tx]
    rnd = (1 << shift) >> 1
    if bitdepth == 8:
        row_min = col_min = -(1 << 15)
    else:
        row_min = -(maxp + 1) << 7
        col_min = -(maxp + 1) << 5
    row_max, col_max = ~row_min, ~col_min

    def rclip(v):
        return jnp.clip(v, row_min, row_max)

    def cclip(v):
        return jnp.clip(v, col_min, col_max)

    first_fn = _1D_FNS[(lw, TX1D_TYPES[txtp][0])]
    second_fn = _1D_FNS[(lh, TX1D_TYPES[txtp][1])]

    g = (cf * 181 + 128) >> 8 if is_rect2 else cf
    zero = jnp.zeros((B, sh), dtype=cf.dtype)
    lanes = [g[:, x * sh : (x + 1) * sh] if x < sw else zero
             for x in range(w)]
    first_fn(lanes, 0, 1, rclip)
    lanes = [cclip((ln + rnd) >> shift) for ln in lanes]

    zero = jnp.zeros((B, w), dtype=cf.dtype)
    cols = [jnp.concatenate([ln[:, y : y + 1] for ln in lanes], axis=1)
            if y < sh else zero for y in range(h)]
    second_fn(cols, 0, 1, cclip)
    return (jnp.concatenate(cols, axis=1) + 8) >> 4


@functools.lru_cache(maxsize=None)
def _build(tx, txtp, bitdepth, nb, interpret):
    w, h, _, _ = _txinfo(tx)
    sw, sh = min(w, 32), min(h, 32)
    bb = _block_b(tx)

    def kernel(cf_ref, out_ref):
        out_ref[...] = _core2d(cf_ref[...], tx, txtp, bitdepth)

    return pl.pallas_call(
        kernel,
        grid=(nb // bb,),
        in_specs=[pl.BlockSpec((bb, sw * sh), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bb, h * w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, h * w), jnp.int32),
        interpret=bool(interpret),
    )


def supported(bitdepth) -> bool:
    return pl is not None and bitdepth != 12


def itx_batch_pallas(cf, tx, txtp, bitdepth, interpret=False):
    """(B, sh*sw) int32 -> (B, h, w) int32 residuals via the Pallas
    kernel. Pads the batch to a BLOCK_B multiple (compile-cache friendly,
    same bucketing rationale as pipeline._compute_residuals)."""
    if not supported(bitdepth):
        from .itx import itx_batch
        return np.asarray(itx_batch(cf, tx, txtp, bitdepth))
    if not interpret:
        from ..dispatch import _platform
        interpret = _platform() in ("cpu", "none")  # pallas-TPU only
    w, h, _, _ = _txinfo(int(tx))
    cf = np.asarray(cf, dtype=np.int32)
    n = cf.shape[0]
    bb = _block_b(int(tx))
    # shape bucketing: round the block count up to a power of two so a
    # whole decode hits a handful of programs per (tx, txtp) instead of
    # one per distinct batch size (the compile-cost fix that makes the
    # kernel usable on real streams)
    blocks = max(1, -(-n // bb))
    nb = bb * (1 << (blocks - 1).bit_length())
    if nb != n:
        cf = np.concatenate(
            [cf, np.zeros((nb - n, cf.shape[1]), np.int32)])
    fn = _build(int(tx), int(txtp), int(bitdepth), nb, bool(interpret))
    from ..devrt import call

    out = call("itx_pallas", fn, jnp.asarray(cf))
    return np.asarray(out[:n]).reshape(n, h, w)
