"""Benchmark driver — prints ONE JSON line.

Current metric: MC 8-tap subpel throughput expressed as equivalent 4K luma
frames/s on one chip (the flagship op until full-frame decode lands; then
this becomes end-to-end decoded frames/s). vs_baseline is the ratio against
the BASELINE.md single-chip target of 4K60 real-time.
"""

import json
import time

import numpy as np

import jax


def main():
    from dav1d_tpu.ops import mc

    w = h = 64
    # ~one 4K luma frame worth of 64x64 blocks
    n_blocks = (3840 // w) * (2176 // h)
    rng = np.random.default_rng(0)
    src = jax.numpy.asarray(
        rng.integers(0, 256, size=(n_blocks, h + 7, w + 7)).astype(np.int32)
    )
    fh = jax.numpy.asarray(
        np.tile(np.array([-1, 3, -10, 35, 44, -11, 4, 0], np.int32), (n_blocks, 1))
    )
    fv = jax.numpy.asarray(
        np.tile(np.array([0, 2, -7, 30, 48, -12, 3, 0], np.int32), (n_blocks, 1))
    )

    def step():
        return mc.put_8tap(src, fh, fv, w=w, h=h, bitdepth=8)

    step().block_until_ready()  # compile
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter

    fps_equiv = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "mc_8tap_4k_frames_per_sec",
                "value": round(fps_equiv, 2),
                "unit": "4K-frames/s (MC kernel only)",
                "vs_baseline": round(fps_equiv / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
