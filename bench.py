"""Benchmark driver — prints ONE JSON line.

Metric: end-to-end decoded frames/s on a 1080p 8-bit inter stream
(BASELINE.json config 2), bit-exactness asserted against the reference
oracle when available. vs_baseline is the ratio against the 4K60-class
single-chip target (60 fps at 1080p-equivalent work is used as the
normalizer until the 4K configs land).

The stream is generated once with the system libaom (tools/aom_enc.py)
and cached in /tmp; decode runs the two-pass host/TPU pipeline (entropy
capture on host, batched reconstruction kernels on the device).
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


def _make_stream():
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets
    frames = gradient_frames(NFRAMES, W, H)
    enc = AomEncoder(width=W, height=H, usage="good", cpu_used=8, q=45,
                     kf_max_dist=9999, lag=0,
                     options={"enable-order-hint": 1})
    pkts = enc.encode(frames)
    enc.close()
    write_ivf_packets(STREAM, pkts, W, H)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if not STREAM.exists():
        _make_stream()
    data = STREAM.read_bytes()

    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    tus = [tu for tu, _ in read_ivf(data)]

    # warm-up decode under the forced device tier: compiles every device
    # program this stream needs (the persistent compilation cache in
    # /tmp/jax_cache makes this a one-time cost across runs)
    from dav1d_tpu.dispatch import use_device

    os.environ["DAV1D_TPU_DEVICE"] = "1"
    os.environ["DAV1D_TPU_DEVICE_MC"] = "0"  # see forced-tier note below
    use_device.cache_clear()
    warm = Decoder(Settings(two_pass=True))
    for tu in tus:
        warm.send_data(tu)
    while warm.get_picture() is not None:
        pass

    # measure the dispatch-default pipeline (tier picked by the measured
    # device round-trip latency) against the forced device tier (best of
    # 2 each — the host is a shared, noisy 1-core box); the label reports
    # what actually executed per dispatch.use_device
    results = {}
    digest = None
    for name, force in (("two_pass+dispatch", None),
                        ("two_pass+forced-device", "1")):
        if force is None:
            os.environ.pop("DAV1D_TPU_DEVICE", None)
            os.environ.pop("DAV1D_TPU_DEVICE_MC", None)
        else:
            os.environ["DAV1D_TPU_DEVICE"] = force
            # device MC stays off in the forced tier: its per-(w, h)
            # programs cost minutes of one-time tunnel compiles, which
            # would swamp the bench budget; the tier is parity-tested
            # (tests/test_device_e2e.py) and measured per-kernel by
            # tools/kernel_bench.py.  The label below reports mc=host.
            os.environ["DAV1D_TPU_DEVICE_MC"] = "0"
        use_device.cache_clear()
        tiers = "mc=%s,itx=%s,cdef=%s" % tuple(
            "dev" if use_device(k) else "host"
            for k in ("mc", "itx", "cdef"))
        name = f"{name}[{tiers}]"
        best = 0.0
        # best-of-5 (checkasm-style minimum): the shared host shows
        # multi-second scheduler stalls that poison mean-based timing
        for _ in range(5):
            # pipelined decode: all temporal units submitted (pass 1 +
            # async device launches), output drained afterwards — frame
            # N's device batches fly while frame N+1's pass 1 parses
            dec = Decoder(Settings(two_pass=True, max_frame_delay=4))
            h = hashlib.md5()
            n = 0
            t0 = time.perf_counter()
            for tu in tus:
                dec.send_data(tu)
            while (pic := dec.get_picture()) is not None:
                for pl in range(3):
                    h.update(pic.plane_bytes(pl))
                n += 1
            best = max(best, n / (time.perf_counter() - t0))
            if digest is None:
                digest = h.hexdigest()
            elif digest != h.hexdigest():
                print(json.dumps({"metric": "e2e_1080p8_frames_per_sec",
                                  "value": 0.0, "unit": "frames/s",
                                  "vs_baseline": 0.0,
                                  "error": "pipeline outputs diverge"}))
                return
        results[name] = best
    os.environ.pop("DAV1D_TPU_DEVICE", None)
    os.environ.pop("DAV1D_TPU_DEVICE_MC", None)
    use_device.cache_clear()
    best = max(results, key=results.get)
    fps = results[best]
    h = type("H", (), {"hexdigest": staticmethod(lambda: digest)})

    # bit-exactness spot check vs the oracle (skipped when not built)
    oracle = "/tmp/dav1d-ref/dav1d"
    if os.path.exists(oracle):
        r = subprocess.run([oracle, "-i", str(STREAM), "--muxer", "md5",
                            "-o", "-", "-q"], capture_output=True, text=True)
        want = r.stdout.strip().split()[0] if r.returncode == 0 else None
        if want and want != h.hexdigest():
            print(json.dumps({"metric": "e2e_1080p8_frames_per_sec",
                              "value": 0.0, "unit": "frames/s",
                              "vs_baseline": 0.0,
                              "error": "md5 mismatch vs oracle"}))
            return

    from dav1d_tpu.dispatch import device_roundtrip_ms

    extra = ""
    if os.environ.get("DAV1D_TPU_BENCH_FAST") != "1":
        # BASELINE configs 1 (keyframe-only intra) and 3 (4K inter)
        # run by default as secondary fps figures in the unit label
        extra = "; " + "; ".join(
            f"{name}={_bench_config(**cfg):.3f}fps"
            for name, cfg in (
                ("intra_1080p", dict(w=1920, h=1080, n=4, kf=1)),
                ("inter_4k", dict(w=3840, h=2160, n=3, kf=9999)),
            ))

    print(json.dumps({
        "metric": "e2e_1080p8_frames_per_sec",
        "value": round(fps, 4),
        "unit": (f"frames/s (1080p 8-bit inter; best of "
                 f"{ {k: round(v, 4) for k, v in results.items()} }; "
                 f"device roundtrip "
                 f"{device_roundtrip_ms():.1f}ms{extra})"),
        "vs_baseline": round(fps / 60.0, 5),
    }))


def _bench_config(w, h, n, kf):
    """Decode fps for one extra configuration (BASELINE configs 1/3)."""
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets

    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    path = Path(f"/tmp/dav1d_tpu_bench_{w}x{h}_{n}_kf{kf}.ivf")
    if not path.exists():
        enc = AomEncoder(width=w, height=h, usage="good", cpu_used=8, q=45,
                         kf_max_dist=kf, lag=0,
                         options={"enable-order-hint": 1})
        write_ivf_packets(path, enc.encode(gradient_frames(n, w, h)), w, h)
        enc.close()
    tus = [tu for tu, _ in read_ivf(path.read_bytes())]
    best = 0.0
    for _ in range(2):
        dec = Decoder(Settings(two_pass=True, max_frame_delay=4))
        cnt = 0
        t0 = time.perf_counter()
        for tu in tus:
            dec.send_data(tu)
        while dec.get_picture() is not None:
            cnt += 1
        best = max(best, cnt / (time.perf_counter() - t0))
    return best


if __name__ == "__main__":
    main()
