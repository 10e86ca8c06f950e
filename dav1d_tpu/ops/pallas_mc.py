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
the grid walks the batch BB blocks at a time; each block's window
arrives via one small strided DMA HBM->VMEM.  This chip's compiler
only accepts DMA offsets it can prove tile-aligned (probed: unhinted
scalar-prefetch offsets crash tpu_compile_helper), so the copy reads
an ALIGNED (RC, SEG) super-window — row origin rounded down to the
sublane tile, lane origin to the 128-lane tile, both clamped to keep
the over-read in bounds and asserted via pl.multiple_of — and two
dynamic rolls slide the true window to the segment origin.  The
separable 8-tap filter then runs on the packed (RC, BB*SEG) tile with
per-block lane-expanded coefficient planes:

  mid[y, c]  = rnd( sum_t fh[c, t] * src[y, c + t],      6 - ib)
  out[y, c]  = rnd( sum_t fv[c, t] * mid[y + t, c],      6 + ib)

(taps never cross a block's SEG-lane segment: c + t <= w + 6 < SEG).
Window DMAs double-buffer across grid steps so the copies overlap
both each other and the filter math.

Alignment contract: the reference plane's dims must be multiples of
(8, 128) — pipeline._stack_planes pads every resident ref stack —
and every window must satisfy 0 <= dy-3, dy+h+4 <= plane_h (same for
x); the caller routes edge blocks to the XLA clamped-gather
replication program, mirroring dav1d's emu_edge split.
Bit-exactness vs ops/mc._put_8tap_resident_prog is asserted by
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

BB = 16   # blocks packed per grid step (lane axis)
SEG = 256  # lanes per block segment: covers w+7 after the <=127-lane
           # alignment shift


def _rows_cp(wh):
    """Copied rows per window: wh plus the <=7-row alignment shift,
    rounded to the sublane tile."""
    return -(-(wh + 7) // 8) * 8


def _kernel(h, w, bitdepth, steps, PH, PW, dys_ref, dxs_ref, plane_ref,
            fh_ref, fv_ref, out_ref, win, sems):
    ib = intermediate_bits(bitdepth)
    wh, ww = h + 7, w + 7
    RC = _rows_cp(wh)
    L = BB * SEG
    i = pl.program_id(0)

    def offs(step, j):
        y0 = dys_ref[step * BB + j] - 3
        x0 = dxs_ref[step * BB + j] - 3
        y0a = pl.multiple_of(jnp.minimum((y0 >> 3) << 3, PH - RC), 8)
        x0a = pl.multiple_of(jnp.minimum((x0 >> 7) << 7, PW - SEG), 128)
        return y0, x0, y0a, x0a

    def dma(step, sl, j):
        _, _, y0a, x0a = offs(step, j)
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(y0a, RC), pl.ds(x0a, SEG)],
            win.at[sl, :, pl.ds(j * SEG, SEG)],
            sems.at[sl, j])

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

    # slide each block's true window to its segment origin
    segs = []
    for j in range(BB):
        y0, x0, y0a, x0a = offs(i, j)
        seg = win[slot, :, j * SEG : (j + 1) * SEG]
        seg = pltpu.roll(seg, SEG - (x0 - x0a), 1)
        seg = pltpu.roll(seg, RC - (y0 - y0a), 0)
        segs.append(seg)
    src = jnp.concatenate(segs, axis=1)  # (RC, L)

    rh = 1 << (5 - ib)
    mid = fh_ref[0, 0, :][None, :] * src
    for t in range(1, 8):
        # roll by L-t == shift left by t; wrapped lanes land at
        # c >= SEG-t of the previous segment, never read for valid
        # x < w (x+7 <= w+6 < SEG)
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
    N must be a multiple of BB; plane dims must be multiples of
    (8, 128); every window must satisfy 0 <= dy-3, dy+h+4 <= plane_h
    (same for x) — caller guarantees."""
    PH, PW = plane.shape
    assert PH % 8 == 0 and PW % 128 == 0, (PH, PW)
    n = dys.shape[0]
    steps = n // BB
    L = BB * SEG
    RC = _rows_cp(h + 7)
    # lane-expanded per-block filter coefficient planes (XLA-side; the
    # kernel body then has no cross-layout reshapes)
    fhl = jnp.repeat(fh.reshape(steps, BB, 8).transpose(0, 2, 1), SEG,
                     axis=2)  # (steps, 8, L)
    fvl = jnp.repeat(fv.reshape(steps, BB, 8).transpose(0, 2, 1), SEG,
                     axis=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, L), lambda i, dys, dxs: (i, 0, 0)),
            pl.BlockSpec((1, 8, L), lambda i, dys, dxs: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((h, L), lambda i, dys, dxs: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, RC, L), jnp.int32),
            pltpu.SemaphoreType.DMA((2, BB)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, h, w, bitdepth, steps, PH, PW),
        out_shape=jax.ShapeDtypeStruct((h, steps * L), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dys, dxs, plane, fhl, fvl)
    # (h, steps*BB*SEG) -> (N, h, w); narrow for the download (values
    # clipped in-kernel; the XLA-side cast fuses into this program)
    out = out.reshape(h, n, SEG).transpose(1, 0, 2)[:, :, :w]
    return out.astype(jnp.uint8 if bitdepth == 8 else jnp.uint16)


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
            import sys
            import traceback

            print("dav1d_tpu: pallas MC gather failed; sticky XLA "
                  f"fallback engaged\n{traceback.format_exc(limit=3)}",
                  file=sys.stderr)
    import numpy as np

    from .mc import _put_8tap_resident_prog

    # interior contract: every window is in-bounds, so the fallback's
    # clamp limits (physical plane shape here) never bind
    ph, pw = plane.shape
    return call("mc_resident", _put_8tap_resident_prog, plane, dys,
                dxs, fh, fv, np.int32(pw), np.int32(ph), w=w, h=h,
                bitdepth=bitdepth)
