"""Entropy-decode (pass 1) throughput: MB/s of compressed payload.

The msac symbol walk is the serial Amdahl term of the whole design
(SURVEY §7 hard part 2): pass 2 batches onto the device, but pass 1
consumes the bitstream one adapted symbol at a time.  This measures the
native pass-1 walk alone — send_data with pass 2 deferred — in MB of
compressed TU payload per second, alongside the reference oracle's
FULL-decode MB/s on the same stream as an anchor (the oracle number
includes its reconstruction, so it is a lower bound on the oracle's
entropy throughput; its no-asm build is the honest comparison available
on this host).

    python tools/msac_bench.py [--json OUT.json] [--config 1080p|4k]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

CONFIGS = {
    "1080p": dict(w=1920, h=1080, n=8, q=45),
    "4k": dict(w=3840, h=2160, n=4, q=45),
    "1080p-dense": dict(w=1920, h=1080, n=6, q=20),  # coef-heavy
    # tile-parallel entropy configs (r5, VERDICT #5): the per-tile
    # serial wall times feed the multi-core makespan simulation below
    "4k-tiles8": dict(w=3840, h=2160, n=4, q=45,
                      tiles={"tile-columns": 2, "tile-rows": 1}),
    "4k-tiles16": dict(w=3840, h=2160, n=4, q=45,
                       tiles={"tile-columns": 2, "tile-rows": 2}),
}


def _stream(w, h, n, q, tiles=None):
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets

    tag = "" if not tiles else \
        f"_t{tiles['tile-columns']}x{tiles['tile-rows']}"
    path = Path(f"/tmp/dav1d_tpu_msac_{w}x{h}_{n}_q{q}{tag}.ivf")
    if not path.exists():
        opts = {"enable-order-hint": 1}
        if tiles:
            opts.update(tiles)
        enc = AomEncoder(width=w, height=h, usage="good", cpu_used=8,
                         q=q, kf_max_dist=9999, lag=0, options=opts)
        write_ivf_packets(path, enc.encode(gradient_frames(n, w, h)),
                          w, h)
        enc.close()
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--config", default="1080p", choices=CONFIGS)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    os.environ["DAV1D_TPU_DEVICE"] = "0"
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    path = _stream(**CONFIGS[args.config])
    data = path.read_bytes()
    tus = [tu for tu, _ in read_ivf(data)]
    payload = sum(len(tu) for tu in tus)

    # time ONLY the native tile-sbrow symbol walk inside an otherwise
    # normal decode (a pure pass-1 run would entangle the deferred
    # reconstruction the worker pool schedules behind send_data)
    import dav1d_tpu.native.decode_glue as dg

    orig = dg.NativeFrameDecode.decode_tile_sbrow
    acc = {"t": 0.0}
    per_tile = {}  # (frame_seq, tile_index) -> seconds

    seq = {"n": 0}

    def timed(self, t, *a, **k):
        ts = t.ts
        if not hasattr(self, "_mb_seq"):  # id() reuse across frames
            self._mb_seq = seq["n"] = seq["n"] + 1
        key = (self._mb_seq, id(ts))
        t0 = time.perf_counter()
        r = orig(self, t, *a, **k)
        dt = time.perf_counter() - t0
        acc["t"] += dt
        per_tile[key] = per_tile.get(key, 0.0) + dt
        return r

    dg.NativeFrameDecode.decode_tile_sbrow = timed
    best = float("inf")
    best_tiles = None
    for _ in range(args.reps + 1):  # first run warms pools/tables
        dec = Decoder(Settings(two_pass=True))
        acc["t"] = 0.0
        per_tile = {}
        for tu in tus:
            dec.send_data(tu)
            while dec.get_picture() is not None:
                pass
        while dec.get_picture() is not None:
            pass
        if acc["t"] < best:
            best = acc["t"]
            best_tiles = dict(per_tile)
    dg.NativeFrameDecode.decode_tile_sbrow = orig
    p1_mbs = payload / best / 1e6

    # multi-core makespan simulation (r5, VERDICT #5): tiles are
    # entropy-independent tasks (the grid-parallel driver in
    # decode/frame.py executes them concurrently; bit-exactness is
    # tested at any thread count).  This 1-core harness cannot measure
    # wall-clock speedup, so the honest projection schedules the
    # MEASURED serial per-(frame, tile) times LPT onto N cores, frame
    # by frame (frames serialize on CDF adaptation).
    sim = None
    if best_tiles and len(best_tiles) > 1:
        by_frame = {}
        for (fid, _), dt in best_tiles.items():
            by_frame.setdefault(fid, []).append(dt)
        n_frames = len(by_frame)

        def makespan(times, n):
            loads = [0.0] * n
            for dt in sorted(times, reverse=True):
                loads[loads.index(min(loads))] += dt
            return max(loads)

        sim = {}
        for n in (1, 2, 4, 8):
            total = sum(makespan(v, n) for v in by_frame.values())
            sim[str(n)] = dict(
                pass1_s_per_frame=round(total / n_frames, 5),
                pass1_fps=round(n_frames / total, 2),
                efficiency=round(best / (n * total), 3))
        print("  simulated tile-parallel pass 1 (LPT over measured "
              "per-tile serial times, per frame):")
        for n, d in sim.items():
            print(f"    N={n}: {d['pass1_fps']} fps "
                  f"(eff {d['efficiency']})")

    oracle = "/tmp/dav1d-ref/dav1d"
    oracle_mbs = None
    if os.path.exists(oracle):
        ob = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run([oracle, "-i", str(path), "--muxer", "null",
                            "-o", "-", "-q"], capture_output=True)
            ob = min(ob, time.perf_counter() - t0)
        oracle_mbs = payload / ob / 1e6

    print(f"{args.config}: payload {payload / 1e6:.2f} MB, "
          f"pass-1 {p1_mbs:.2f} MB/s"
          + (f"; oracle full decode {oracle_mbs:.2f} MB/s (no-asm, "
             f"incl. its reconstruction)" if oracle_mbs else ""))
    if args.json:
        Path(args.json).write_text(json.dumps(dict(
            config=args.config, payload_mb=round(payload / 1e6, 3),
            pass1_mb_per_s=round(p1_mbs, 3),
            tile_parallel_sim=sim,
            oracle_full_decode_mb_per_s=(round(oracle_mbs, 3)
                                         if oracle_mbs else None),
            note=("pass-1 = native entropy walk only (pass 2 deferred); "
                  "oracle number is its ENTIRE no-asm decode on the "
                  "same stream — a lower bound on its entropy rate; "
                  "tile_parallel_sim = LPT schedule of measured serial "
                  "per-tile times onto N cores (this harness has one "
                  "core; correctness at any thread count is tested)")),
            indent=1))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
