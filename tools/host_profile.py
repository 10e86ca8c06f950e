"""Host-tier e2e profile: decode the bench stream with the native
two-pass pipeline and report where wall time goes.

Two views:
  --phases   coarse per-call timing of the pipeline phases (pass 1 C
             call, replay phases, filter families) via monkeypatched
             wrappers — the checkasm-of-the-frame-loop view.
  --cprofile cProfile over the timed decode, top-30 cumulative — the
             Python-glue-overhead view.

Usage: python tools/host_profile.py [--w 1920 --h 1080 --frames 8]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

os.environ["DAV1D_TPU_DEVICE"] = "0"


def make_stream(w, h, n):
    p = Path(f"/tmp/dav1d_tpu_bench_{w}x{h}_{n}.ivf")
    if p.exists():
        return p
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets
    frames = gradient_frames(n, w, h)
    enc = AomEncoder(width=w, height=h, usage="good", cpu_used=8, q=45,
                     kf_max_dist=9999, lag=0,
                     options={"enable-order-hint": 1})
    pkts = enc.encode(frames)
    enc.close()
    write_ivf_packets(p, pkts, w, h)
    return p


TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def wrap(mod, name, label=None):
    label = label or f"{mod.__name__.split('.')[-1]}.{name}"
    fn = getattr(mod, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        TIMES[label] += time.perf_counter() - t0
        COUNTS[label] += 1
        return r

    setattr(mod, name, timed)


def decode(tus, runs=1):
    from dav1d_tpu.decoder import Decoder, Settings
    best = 0.0
    for _ in range(runs):
        dec = Decoder(Settings(two_pass=True, max_frame_delay=4))
        n = 0
        t0 = time.perf_counter()
        for tu in tus:
            dec.send_data(tu)
        while dec.get_picture() is not None:
            n += 1
        best = max(best, n / (time.perf_counter() - t0))
    return best, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--cprofile", action="store_true")
    args = ap.parse_args()

    stream = make_stream(args.w, args.h, args.frames)
    from dav1d_tpu.containers import read_ivf
    tus = [tu for tu, _ in read_ivf(stream.read_bytes())]

    # warm-up (allocators, .so build)
    decode(tus, 1)

    if args.cprofile:
        pr = cProfile.Profile()
        pr.enable()
        fps, n = decode(tus, 1)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(40)
        print(s.getvalue())
        print(f"fps={fps:.2f} frames={n}")
        return

    # phase wrappers
    import dav1d_tpu.pipeline as pipeline
    import dav1d_tpu.native.decode_glue as glue
    import dav1d_tpu.recon.lf as lf
    import dav1d_tpu.recon.cdef as rcdef
    import dav1d_tpu.recon.lr_apply as lr_apply

    wrap(pipeline, "_launch_residuals_native", "itx:residuals_native")
    wrap(pipeline, "_native_phase_b", "replay:phaseB_intra")
    for name in dir(glue):
        if name.startswith("decode_sbrow") or name in (
                "replay_inter", "run_pass1", "decode_tile_group"):
            wrap(glue, name, f"pass1:{name}")
    for name in ("filter_frame",):
        if hasattr(lf, name):
            wrap(lf, name, f"lf:{name}")
    for m, tag in ((lf, "lf"), (rcdef, "cdef"), (lr_apply, "lr")):
        for name in dir(m):
            if name.startswith(("apply", "filter", "run")) and callable(getattr(m, name)):
                wrap(m, name, f"{tag}:{name}")

    fps, n = decode(tus, 2)
    total = sum(TIMES.values())
    print(f"fps={fps:.2f} frames={n} (wrapped-phase total {total*1000:.1f} ms"
          f" over 2 runs)")
    for k in sorted(TIMES, key=TIMES.get, reverse=True):
        print(f"  {k:40s} {TIMES[k]*1000/2:8.2f} ms/run  x{COUNTS[k]//2}")


if __name__ == "__main__":
    main()
