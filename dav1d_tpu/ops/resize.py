"""Device super-resolution resample (SURVEY §2.5 mc family `resize`;
reference resize_c src/mc_tmpl.c, applied by filter_sbrow_resize
src/recon_tmpl.c:2053).

The per-column stepping of the reference (mx accumulation with carry
into the source column) has a closed form (recon.mc_np.resize_coords),
so the whole upscale is one static gather + 8-tap dot per output
column, batched over every row of the plane: the gather indices and the
per-column filter rows are trace-time constants (dst geometry is fixed
for the sequence), leaving XLA a fully static fused gather-multiply-
reduce.  int32 is exact: |tap| < 2^7, px < 2^12 bounds the dot by 2^23.
"""

from __future__ import annotations

import functools

import numpy as np

from .. import tables


@functools.lru_cache(maxsize=32)
def _program(dst_w: int, src_w: int, dx: int, mx0: int, bitdepth: int):
    import jax
    import jax.numpy as jnp

    from ..recon.mc_np import resize_coords

    cols, fi = resize_coords(dst_w, src_w, dx, mx0)
    filt = tables.resize_filter.astype(np.int32)[fi]      # (dst_w, 8)

    def run(src):                                         # (n, src_w)
        g = jnp.take(src, jnp.asarray(cols), axis=1)      # (n, dst_w, 8)
        acc = -jnp.sum(g * jnp.asarray(filt)[None], axis=2)
        return jnp.clip((acc + 64) >> 7, 0, (1 << bitdepth) - 1)

    return jax.jit(run)


def resize_rows(src_rows, dst_w: int, src_w: int, dx: int, mx0: int,
                bitdepth: int):
    """Upscale (n, src_w) int32 rows to (n, dst_w) on the device.
    Returns the device array (caller np.asarray()s it, letting the
    launch overlap host work)."""
    import jax.numpy as jnp

    from ..devrt import call

    src = np.ascontiguousarray(src_rows[:, :src_w], dtype=np.int32)
    return call("resize", _program(dst_w, src_w, dx, mx0, bitdepth),
                jnp.asarray(src))
