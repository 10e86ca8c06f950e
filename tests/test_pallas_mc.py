"""Pallas MC window-gather kernel parity (ops/pallas_mc.py).

Bit-exactness of the per-block-DMA gather + fused 8-tap put against
the XLA clamped-gather program (ops/mc._put_8tap_resident_prog, itself
oracle-pinned through the forced-device e2e suite), in interpreter
mode on the CPU backend — the kernel semantics check; on-chip numbers
live in KERNEL_BENCH artifacts.  Interior windows only by contract:
the caller (pipeline.py _launch_mc_device) routes edge blocks to the
replication program, mirroring dav1d's emu_edge split
(reference src/mc_tmpl.c:130-180).
"""

import numpy as np
import pytest


@pytest.mark.parametrize("w,h,bitdepth", [(8, 8, 8), (4, 4, 8),
                                          (8, 8, 10), (4, 4, 12),
                                          (16, 16, 8), (16, 16, 10)])
def test_gather_put_matches_xla(w, h, bitdepth):
    import jax.numpy as jnp

    from dav1d_tpu.ops.mc import _put_8tap_resident_prog
    from dav1d_tpu.ops.pallas_mc import BB, _gather_put_prog

    rng = np.random.default_rng(w * 100 + h + bitdepth)
    H, W = 96, 384  # (8, 128)-tile multiples: the kernel's contract
    plane = rng.integers(0, 1 << bitdepth, size=(H, W)).astype(np.int32)
    N = 4 * BB
    dys = rng.integers(3, H - h - 4 + 1, size=N).astype(np.int32)
    dxs = rng.integers(3, W - w - 4 + 1, size=N).astype(np.int32)
    # real subpel rows are signed 7-bit; random signed taps cover more
    fh = rng.integers(-64, 128, size=(N, 8)).astype(np.int32)
    fv = rng.integers(-64, 128, size=(N, 8)).astype(np.int32)
    # include identity rows (the mx==0 / my==0 collapse)
    fh[0] = 0
    fh[0, 3] = 64
    fv[1] = 0
    fv[1, 3] = 64

    ref = np.asarray(_put_8tap_resident_prog(
        jnp.asarray(plane), jnp.asarray(dys), jnp.asarray(dxs),
        jnp.asarray(fh), jnp.asarray(fv), np.int32(W), np.int32(H),
        w=w, h=h, bitdepth=bitdepth))
    got = np.asarray(_gather_put_prog(
        jnp.asarray(plane), jnp.asarray(dys), jnp.asarray(dxs),
        jnp.asarray(fh), jnp.asarray(fv), w=w, h=h, bitdepth=bitdepth,
        interpret=True))
    np.testing.assert_array_equal(ref, got)
