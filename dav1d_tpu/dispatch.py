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
        # pays tens of seconds of XLA compiles.  TPU targets only: the
        # XLA:CPU AOT loader tags entries with exact machine features
        # and SEGFAULTS loading an entry whose feature set mismatches
        # the host (r5: a poisoned /tmp/jax_cache entry crashed the
        # test suite from inside _cache_read) — and the CPU backend
        # recompiles fast anyway.
        platform = jax.devices()[0].platform
        if platform != "cpu" and not jax.config.jax_compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("DAV1D_TPU_JAX_CACHE", "/tmp/jax_cache"))
        return platform
    except Exception:
        return "none"


_probe_cache: dict = {}


def device_roundtrip_ms(fresh: bool = False) -> float:
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
    stuck inside the runtime aborts interpreter teardown.  A successful
    probe is cached for the process lifetime; a FAILED probe is cached
    only for _PROBE_RETRY_S seconds, after which use_device re-probes —
    a transport that wedges once and recovers ends up back on the
    device tier instead of silently running as a CPU decoder forever.
    The child pays one jax import (only on accelerator backends with no
    env override)."""
    import subprocess
    import sys
    import time

    ent = _probe_cache.get("rt")
    if ent is not None and not fresh:
        ms, expiry = ent
        if expiry is None or time.monotonic() < expiry:
            return ms

    try:
        r = subprocess.run(
            [sys.executable, "-m", "dav1d_tpu.dispatch", "--probe"],
            capture_output=True, text=True,
            timeout=float(os.environ.get("DAV1D_TPU_PROBE_TIMEOUT", "10")))
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        ms = float(line)
        _probe_cache["rt"] = (ms, None)  # good probe: process lifetime
    except Exception:
        ms = float("inf")  # missed deadline / failed: host tier for now
        _probe_cache["rt"] = (ms, time.monotonic() + _PROBE_RETRY_S)
    return ms


# a failed probe is retried after this many seconds (use_device drops
# its own cache alongside, so the decoder migrates back to the device
# tier when the transport recovers)
_PROBE_RETRY_S = float(os.environ.get("DAV1D_TPU_PROBE_RETRY_S", "120"))


# Per-family default on an accelerator backend.  Measured on-chip
# numbers: KERNEL_BENCH_r03.json (TPU v5e, fused-repetition slope
# protocol) — e.g. itx 8x8 B=512 device 0.004 ms vs host C 0.21 ms,
# Pallas CDEF full-1080p-plane 0.38 ms vs host C 2.1-2.7 ms, mc
# put_8tap B>=128 0.004-0.007 ms.  On-chip the device tier wins every
# family at batch sizes the decoder produces; what decides the tier is
# the TRANSPORT — per-frame offload only pays when the measured
# round-trip is cheap (a locally attached chip), hence every family
# rides the latency gate below.
_ACCEL_DEFAULT = {"itx": "latency", "cdef": "latency", "deblock": "latency",
                  "lr": "latency", "fg": "latency", "mc": "latency",
                  "resize": "latency",
                  # measured (DEVICE_FRAME_r03.json): the wavefront
                  # schedule's per-(level,key) launches put a 1080p
                  # keyframe at ~105 ms on-chip vs ~30 ms host C — the
                  # serial intra chain needs level fusion before the
                  # chip wins it.  Off by default; DAV1D_TPU_DEVICE=1 /
                  # _IPRED=1 force it (tests, benches).
                  "ipred": False,
                  # device-resident deblock->CDEF chain (one plane
                  # upload + one download per frame; recon/device_chain)
                  "chain": "latency"}

# Above this measured round-trip latency the chip is effectively remote
# (tunneled) and per-frame offload of MB-sized batches loses to host C.
_LATENCY_GATE_MS = 5.0


_use_cache: dict = {}


def use_device(kind: str) -> bool:
    # answers driven by a FAILED probe expire with it (see
    # device_roundtrip_ms) — everything else caches for the process
    ent = _use_cache.get(kind)
    if ent is not None:
        val, expiry = ent
        import time

        if expiry is None or time.monotonic() < expiry:
            return val
    val, expiry = _use_device_uncached(kind)
    _use_cache[kind] = (val, expiry)
    return val


def _use_device_uncached(kind: str):
    per = os.environ.get(f"DAV1D_TPU_DEVICE_{kind.upper()}")
    if per is not None:
        return per == "1", None
    glob = os.environ.get("DAV1D_TPU_DEVICE")
    if glob is not None:
        return glob == "1", None
    if _platform() in ("cpu", "none"):
        return False, None
    policy = _ACCEL_DEFAULT.get(kind, True)
    if policy == "latency":
        ms = device_roundtrip_ms()
        if ms == float("inf"):
            return False, _probe_cache["rt"][1]
        return ms < _LATENCY_GATE_MS, None
    return bool(policy), None


def _cache_clear():
    _use_cache.clear()
    _probe_cache.clear()


use_device.cache_clear = _cache_clear  # drop-in for the old lru_cache


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
