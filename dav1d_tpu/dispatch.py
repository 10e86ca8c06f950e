"""Kernel dispatch: host (numpy/C) vs device (XLA/Pallas) selection.

The analog of the reference's CPU-flag dispatch (dav1d_get_cpu_flags →
per-ISA fn tables, e.g. src/x86/mc.h:95-210): each batched kernel family
asks `use_device(kind)` once and the answer is derived from the attached
backend, not from per-call environment guesswork.

Policy:
- `DAV1D_TPU_DEVICE=0` forces every family to the host tier,
  `DAV1D_TPU_DEVICE=1` forces the device tier (used by tests to exercise
  the device formulations on the CPU backend).
- Per-family overrides: `DAV1D_TPU_DEVICE_<KIND>=0/1` (e.g.
  DAV1D_TPU_DEVICE_ITX).
- Default: the device tier is used when JAX is backed by a real
  accelerator (platform != "cpu"); the host tier wins on the CPU backend
  where the batched C/numpy kernels are faster than XLA dispatch.

`tools/kernel_bench.py` (checkasm --bench analog) measures both tiers
per family/size on the actual machine to validate this policy.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=None)
def _platform() -> str:
    try:
        import jax

        # persistent compile cache: device programs are per (shape, tx
        # type) and must survive process restarts, or every cold decode
        # pays tens of seconds of XLA compiles
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("DAV1D_TPU_JAX_CACHE", "/tmp/jax_cache"))
        return jax.devices()[0].platform
    except Exception:
        return "none"


@functools.lru_cache(maxsize=None)
def device_roundtrip_ms() -> float:
    """Measured host->device->host latency for a small buffer.  The
    decoder's device batches move a few MB per frame; when the chip sits
    behind a network tunnel (this dev harness) a ~35 ms round trip makes
    per-frame offload structurally unprofitable, while a locally attached
    chip measures well under 1 ms.  This probe is the dispatch policy's
    hardware detection (the reference's dav1d_get_cpu_flags analog).

    The probe runs in a subprocess with a deadline: a wedged transport
    (the tunnel stalls for minutes at a time) must degrade to the host
    tier, not hang the decoder at the first frame — and a subprocess can
    be killed cleanly mid-transfer, where an abandoned in-process thread
    stuck inside the runtime aborts interpreter teardown.  Trade-offs,
    accepted deliberately: a stall longer than the deadline pins the
    host tier for the process lifetime (restart to re-probe —
    wrong-but-fast beats hanging), and the child pays one jax import
    (one-time, and only on accelerator backends with no env override)."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-m", "dav1d_tpu.dispatch", "--probe"],
            capture_output=True, text=True,
            timeout=float(os.environ.get("DAV1D_TPU_PROBE_TIMEOUT", "10")))
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        return float(line)
    except Exception:
        return float("inf")  # missed deadline / failed: host tier


# Per-family default on an accelerator backend (tools/kernel_bench.py
# measurements on the real chip):
# - itx: the batched device transform is ~20x faster than the host batch,
#   but only pays off when the per-frame coefficient/residual transfers
#   are cheap — gate on the measured round-trip latency.
# - cdef: the current formulation re-uploads the padded frame canvas per
#   plane per frame; host stays default until the filter chain is
#   device-resident.
_ACCEL_DEFAULT = {"itx": "latency", "cdef": False, "deblock": "latency",
                  "lr": "latency", "fg": "latency", "mc": "latency",
                  "resize": "latency",
                  # device-resident deblock->CDEF chain (one plane
                  # upload + one download per frame; recon/device_chain)
                  "chain": "latency"}

# Above this measured round-trip latency the chip is effectively remote
# (tunneled) and per-frame offload of MB-sized batches loses to host C.
_LATENCY_GATE_MS = 5.0


@functools.lru_cache(maxsize=None)
def use_device(kind: str) -> bool:
    per = os.environ.get(f"DAV1D_TPU_DEVICE_{kind.upper()}")
    if per is not None:
        return per == "1"
    glob = os.environ.get("DAV1D_TPU_DEVICE")
    if glob is not None:
        return glob == "1"
    if _platform() in ("cpu", "none"):
        return False
    policy = _ACCEL_DEFAULT.get(kind, True)
    if policy == "latency":
        return device_roundtrip_ms() < _LATENCY_GATE_MS
    return bool(policy)


def _probe_main() -> None:
    """Subprocess body for device_roundtrip_ms: measure and print ms."""
    import time

    import jax
    import numpy as np

    x = np.zeros(4096, dtype=np.int32)
    np.asarray(jax.device_put(x))  # warm the path
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_put(x))
        best = min(best, time.perf_counter() - t0)
    print(best * 1e3)


if __name__ == "__main__":
    import sys

    if "--probe" in sys.argv:
        _probe_main()
