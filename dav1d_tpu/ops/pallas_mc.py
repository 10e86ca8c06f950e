"""Pallas MC: per-block DMA window gather + fused 8-tap put.

The device-resident MC path's cost is not the filter math but the
window GATHER: XLA lowers the clamped fancy-index read of (N, h+7,
w+7) windows from the resident reference plane to a per-element
gather (~2.5 ms per 1024-block batch on-chip — KERNEL_BENCH_r03),
while the filter itself runs in microseconds.  The reference hits the
same problem shape in emu_edge + put_8tap (src/mc_tmpl.c:130-180):
blocks straddling the frame edge get a replicated copy, interior
blocks read the reference directly.

This kernel is the TPU-native equivalent of the interior fast path:
the grid walks the batch BB blocks at a time, each grid step issues BB
small strided DMAs HBM->VMEM (the hardware's native "window read"),
then runs the separable 8-tap filter on the packed (h+7, BB*(w+7))
VMEM tile — blocks packed on the LANE axis so the VPU stays fed at
MC's tiny tile shapes (4x4 / 8x8 after pipeline.py's shape-bucketing
decomposition).  Per-block subpel filters ride in as precomputed
lane-expanded coefficient planes, so the kernel body is pure
multiply-add + static shifts:

  mid[y, c]  = rnd( sum_t fh[c, t] * win[y, c + t],      6 - ib)
  out[y, c]  = rnd( sum_t fv[c, t] * mid[y + t, c],      6 + ib)

(the lane-packed horizontal taps never cross a block's (w+7) segment
for valid x < w: x + 7 <= w + 6 — see _gather_put_core).

Blocks whose (h+7, w+7) window leaves the valid reference area fall
back to the XLA clamped-gather program (replication semantics); the
caller splits the batch (pipeline.py), mirroring dav1d's emu_edge
split.  Bit-exactness vs ops/mc._put_8tap_resident_prog is asserted by
tests/test_pallas_mc.py in interpret mode and by the forced-device
e2e suite on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mc import intermediate_bits

BB = 16  # blocks packed per grid step (lane axis)


def _kernel(h, w, bitdepth, steps, dys_ref, dxs_ref, plane_ref, fh_ref,
            fv_ref, out_ref, win, sems):
    ib = intermediate_bits(bitdepth)
    wh, ww = h + 7, w + 7
    L = BB * ww
    i = pl.program_id(0)

    def dma(step, slot, j):
        y0 = dys_ref[step * BB + j] - 3
        x0 = dxs_ref[step * BB + j] - 3
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(y0, wh), pl.ds(x0, ww)],
            win.at[slot, :, pl.ds(j * ww, ww)],
            sems.at[slot, j])

    # double buffer: step i computes slot i%2 while step i+1's window
    # DMAs fill the other slot (issued before the waits so the copies
    # overlap both each other and this step's filter math)
    @pl.when(i == 0)
    def _():
        for j in range(BB):
            dma(0, 0, j).start()

    slot = jax.lax.rem(i, 2)

    @pl.when(i + 1 < steps)
    def _():
        for j in range(BB):
            dma(i + 1, 1 - slot, j).start()

    for j in range(BB):
        dma(i, slot, j).wait()

    src = win[slot]  # (wh, L) int32
    rh = 1 << (5 - ib)
    mid = fh_ref[0, 0, :][None, :] * src
    for t in range(1, 8):
        # roll by L-t == shift left by t; wrapped lanes land at
        # c >= L-t, never read for valid x < w (x+7 <= w+6 < w+7)
        mid = mid + fh_ref[0, t, :][None, :] * pltpu.roll(src, L - t, 1)
    mid = (mid + rh) >> (6 - ib)
    rv = 1 << (5 + ib)
    out = fv_ref[0, 0, :][None, :] * mid[0:h, :]
    for t in range(1, 8):
        out = out + fv_ref[0, t, :][None, :] * mid[t : t + h, :]
    out = (out + rv) >> (6 + ib)
    out_ref[:] = jnp.clip(out, 0, (1 << bitdepth) - 1)


@functools.partial(jax.jit,
                   static_argnames=("w", "h", "bitdepth", "interpret"))
def _gather_put_prog(plane, dys, dxs, fh, fv, *, w, h, bitdepth,
                     interpret=False):
    """(N,) interior block origins -> (N, h, w) filtered pixels.
    N must be a multiple of BB; every window must satisfy
    0 <= dy-3, dy+h+4 <= plane_h (same for x) — caller guarantees."""
    n = dys.shape[0]
    steps = n // BB
    wh, ww = h + 7, w + 7
    L = BB * ww
    # lane-expanded per-block filter coefficient planes (XLA-side; the
    # kernel body then has no cross-layout reshapes)
    fhl = jnp.repeat(fh.reshape(steps, BB, 8).transpose(0, 2, 1), ww,
                     axis=2)  # (steps, 8, L)
    fvl = jnp.repeat(fv.reshape(steps, BB, 8).transpose(0, 2, 1), ww,
                     axis=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 8, L), lambda i, dys, dxs: (i, 0, 0)),
            pl.BlockSpec((1, 8, L), lambda i, dys, dxs: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((h, L), lambda i, dys, dxs: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, wh, L), jnp.int32),
            pltpu.SemaphoreType.DMA((2, BB)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, h, w, bitdepth, steps),
        out_shape=jax.ShapeDtypeStruct((h, steps * L), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dys, dxs, plane, fhl, fvl)
    # (h, steps*BB*(w+7)) -> (N, h, w)
    return out.reshape(h, n, ww).transpose(1, 0, 2)[:, :, :w]


_BROKEN = False  # sticky: first Mosaic/compile failure -> XLA fallback


def gather_put_8tap(plane, dys, dxs, fh, fv, *, w, h, bitdepth,
                    interpret=False):
    """Pallas gather+put with a sticky XLA fallback: a compile failure
    on an unexpected backend must degrade to the (slower, bit-exact)
    clamped-gather program, never kill the decode."""
    global _BROKEN
    from ..devrt import call

    if not _BROKEN:
        try:
            return call("mc_resident", _gather_put_prog, plane, dys,
                        dxs, fh, fv, w=w, h=h, bitdepth=bitdepth,
                        interpret=interpret)
        except Exception:
            _BROKEN = True
    import numpy as np

    from .mc import _put_8tap_resident_prog

    # interior contract: every window is in-bounds, so the fallback's
    # clamp limits (physical plane shape here) never bind
    ph, pw = plane.shape
    return call("mc_resident", _put_8tap_resident_prog, plane, dys,
                dxs, fh, fv, np.int32(pw), np.int32(ph), w=w, h=h,
                bitdepth=bitdepth)
