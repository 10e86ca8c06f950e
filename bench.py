"""Benchmark driver — prints ONE JSON line.

Metric: end-to-end decoded frames/s on a 1080p 8-bit inter stream
(BASELINE.json config 2), bit-exactness asserted against the reference
oracle when available. vs_baseline is the ratio against the 4K60-class
single-chip target (60 fps at 1080p-equivalent work is used as the
normalizer until the 4K configs land).

The stream is generated once with the system libaom (tools/aom_enc.py)
and cached in /tmp.  Two legs run:

- host leg (in-process): the two-pass pipeline with every family on the
  native host tier — what `dispatch.use_device` selects here anyway,
  because the chip sits behind a network tunnel whose measured ~35 ms
  round trip fails the latency gate (a locally attached chip would
  select the device tier).
- device leg (subprocess, deadline-bounded): every latency-gated family
  forced to the device tier.  The tunnel stalls for minutes at a time,
  so this leg runs under a hard timeout and is skipped — never hanging
  the bench — when the transport is wedged.

The reported value is the faster leg; the label says which executed and
what each measured.  Output digests must agree across legs and with the
reference oracle's md5.
"""

import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))

W, H, NFRAMES = 1920, 1080, 4
STREAM = Path(f"/tmp/dav1d_tpu_bench_{W}x{H}_{NFRAMES}.ivf")
DEVICE_LEG_BUDGET_S = float(os.environ.get("DAV1D_TPU_BENCH_DEVICE_BUDGET",
                                           "900"))


def _make_stream():
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets
    frames = gradient_frames(NFRAMES, W, H)
    enc = AomEncoder(width=W, height=H, usage="good", cpu_used=8, q=45,
                     kf_max_dist=9999, lag=0,
                     options={"enable-order-hint": 1})
    pkts = enc.encode(frames)
    enc.close()
    write_ivf_packets(STREAM, pkts, W, H)


def _decode_fps(tus, runs):
    """Best-of-N decode fps + output md5 (checkasm-style minimum: the
    shared host shows multi-second scheduler stalls that poison means).

    An initial untimed run (the warm-up: allocator pools, compile
    caches) hashes every output plane — the correctness digest,
    cross-checked between legs and vs the oracle.  The N timed runs
    drain pictures without hashing (the null-muxer convention the
    reference's own benchmarking uses, tools/dav1d.c --muxer null) and
    do not compete with the hashing run's skewed time."""
    from dav1d_tpu.decoder import Decoder, Settings

    best = 0.0
    digest = None
    for run in range(runs + 1):
        dec = Decoder(Settings(two_pass=True, max_frame_delay=4))
        h = hashlib.md5() if run == 0 else None
        n = 0
        t0 = time.perf_counter()
        for tu in tus:
            dec.send_data(tu)
        while (pic := dec.get_picture()) is not None:
            if h is not None:
                for pl in range(3):
                    h.update(pic.plane_buffer(pl))
            n += 1
        if h is not None:
            digest = h.hexdigest()
        else:
            best = max(best, n / (time.perf_counter() - t0))
    return best, digest


def _device_leg():
    """Subprocess body: every family forced to the device tier (MC rides
    the bucketed tiled path; intra frames the wavefront device
    schedule).  The tier is parity-tested by tests/test_device_e2e.py /
    test_device_intra.py and measured per-kernel by
    tools/kernel_bench.py."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    os.environ["DAV1D_TPU_DEVICE"] = "1"
    # intra stays host per the measured policy (DEVICE_FRAME_r03.json:
    # the wavefront schedule's launch count loses to host C until
    # levels fuse); this leg represents the configuration a locally
    # attached chip would actually select
    os.environ["DAV1D_TPU_DEVICE_IPRED"] = "0"

    from dav1d_tpu.containers import read_ivf
    tus = [tu for tu, _ in read_ivf(STREAM.read_bytes())]
    # _decode_fps's untimed hashing run doubles as the device-program
    # compile warm-up (persistent cache)
    fps, digest = _decode_fps(tus, 2)
    print(json.dumps({"fps": fps, "digest": digest}), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--device-leg":
        _device_leg()
        return

    if not STREAM.exists():
        _make_stream()

    # host leg in-process.  DAV1D_TPU_DEVICE=0 pins the host tier without
    # touching the device transport at all (the dispatch default reaches
    # the same tier here via the latency gate, but only after probing the
    # tunnel, which can itself stall when the transport is wedged).
    os.environ["DAV1D_TPU_DEVICE"] = "0"
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.dispatch import use_device

    use_device.cache_clear()
    tus = [tu for tu, _ in read_ivf(STREAM.read_bytes())]
    host_fps, digest = _decode_fps(tus, 7)
    os.environ.pop("DAV1D_TPU_DEVICE", None)
    use_device.cache_clear()

    results = {"two_pass+host[mc=host,itx=host,cdef=host]": host_fps}

    # device leg, deadline-bounded subprocess (never hangs the bench)
    dev_note = ""
    try:
        r = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--device-leg"],
            capture_output=True, text=True, timeout=DEVICE_LEG_BUDGET_S)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        leg = json.loads(line) if line.startswith("{") else None
        if leg is None:
            dev_note = "; device leg failed"
        elif leg["digest"] != digest:
            print(json.dumps({"metric": "e2e_1080p8_frames_per_sec",
                              "value": 0.0, "unit": "frames/s",
                              "vs_baseline": 0.0,
                              "error": "device/host outputs diverge"}))
            return
        else:
            results["two_pass+forced-device[ipred=host per measured "
                    "policy]"] = leg["fps"]
    except subprocess.TimeoutExpired:
        dev_note = (f"; device leg skipped (transport stalled "
                    f">{DEVICE_LEG_BUDGET_S:.0f}s)")
    except Exception as e:  # noqa: BLE001 — the bench must always report
        dev_note = f"; device leg error: {type(e).__name__}"

    best = max(results, key=results.get)
    fps = results[best]

    # bit-exactness spot check vs the oracle (skipped when not built)
    oracle = "/tmp/dav1d-ref/dav1d"
    if os.path.exists(oracle):
        r = subprocess.run([oracle, "-i", str(STREAM), "--muxer", "md5",
                            "-o", "-", "-q"], capture_output=True, text=True)
        want = r.stdout.strip().split()[0] if r.returncode == 0 else None
        if want and want != digest:
            print(json.dumps({"metric": "e2e_1080p8_frames_per_sec",
                              "value": 0.0, "unit": "frames/s",
                              "vs_baseline": 0.0,
                              "error": "md5 mismatch vs oracle"}))
            return

    extra = ""
    if os.environ.get("DAV1D_TPU_BENCH_FAST") != "1":
        # BASELINE configs 1 (keyframe-only intra) and 3 (4K inter)
        # run by default as secondary fps figures in the unit label
        os.environ["DAV1D_TPU_DEVICE"] = "0"
        use_device.cache_clear()
        extra = "; " + "; ".join(
            f"{name}={_bench_config(**cfg):.3f}fps"
            for name, cfg in (
                ("intra_1080p", dict(w=1920, h=1080, n=4, kf=1)),
                ("inter_4k", dict(w=3840, h=2160, n=3, kf=9999)),
                # BASELINE config 3: 4K 10-bit with film grain synthesis
                ("4k10_grain", dict(w=3840, h=2160, n=3, kf=9999,
                                    bitdepth=10, noise=15)),
                # heavy motion + noise: denser residuals/MV field than
                # the smooth gradients (VERDICT r02: bench content soft)
                ("motion_1080p", dict(w=1920, h=1080, n=4, kf=9999,
                                      motion=8, gen_noise=16)),
            ))
        os.environ.pop("DAV1D_TPU_DEVICE", None)
        use_device.cache_clear()

    # committed on-chip artifact (tools/device_frame_bench.py): the
    # device pipeline's compute-only fps on resident data — what a
    # locally attached chip pays, free of this harness's network tunnel
    dev_compute = ""
    arts = sorted(Path(__file__).resolve().parent.glob(
        "DEVICE_FRAME_r*.json"))
    art = arts[-1] if arts else Path("/nonexistent")
    if art.exists():
        try:
            rows = json.loads(art.read_text())
            parts = ", ".join(
                f"{cfg}={d['projected_fps_compute_only']:.1f}fps"
                for cfg, d in sorted(rows.items()))
            dev_compute = f"; device-compute-only (committed): {parts}"
        except Exception:  # noqa: BLE001
            pass

    print(json.dumps({
        "metric": "e2e_1080p8_frames_per_sec",
        "value": round(fps, 4),
        "unit": (f"frames/s (1080p 8-bit inter; best of "
                 f"{ {k: round(v, 4) for k, v in results.items()} }"
                 f"{dev_note}{extra}{dev_compute})"),
        "vs_baseline": round(fps / 60.0, 5),
    }))


def _bench_config(w, h, n, kf, bitdepth=8, noise=0, motion=2,
                  gen_noise=6):
    """Decode fps for one extra configuration (BASELINE configs 1/3)."""
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets

    from dav1d_tpu.containers import read_ivf

    path = Path(f"/tmp/dav1d_tpu_bench_{w}x{h}_{n}_kf{kf}"
                f"_bd{bitdepth}_n{noise}_m{motion}g{gen_noise}.ivf")
    legacy = Path(f"/tmp/dav1d_tpu_bench_{w}x{h}_{n}_kf{kf}"
                  f"_bd{bitdepth}_n{noise}.ivf")
    if motion == 2 and gen_noise == 6 and legacy.exists():
        path = legacy
    if not path.exists():
        opts = {"enable-order-hint": 1}
        if noise:
            opts["denoise-noise-level"] = noise  # film grain synthesis
        enc = AomEncoder(width=w, height=h, usage="good", cpu_used=8, q=45,
                         kf_max_dist=kf, lag=0, bitdepth=bitdepth,
                         options=opts)
        write_ivf_packets(
            path, enc.encode(gradient_frames(n, w, h, bitdepth=bitdepth,
                                             motion=motion,
                                             noise=gen_noise)),
            w, h)
        enc.close()
    tus = [tu for tu, _ in read_ivf(path.read_bytes())]
    fps, _ = _decode_fps(tus, 2)
    return fps


if __name__ == "__main__":
    main()
