#!/usr/bin/env python3
"""GOP-parallel decode: split a stream at key frames, decode the
segments in parallel worker processes, stitch the output in order.

The decoder's second scaling axis (SURVEY §2.7 "GOPs → hosts", the
long-context/sequence-parallel analog): key frames reset the reference
slots and CDF state, so every key-frame-led segment decodes
independently — frame parallelism at GOP granularity with zero
cross-worker communication, the same independence the reference's
frame threads exploit within a GOP (src/lib.c:109-126) lifted to
process/host granularity.

    python tools/gop_decode.py -i clip.ivf --muxer md5 -j 4
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    try:
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def _tu_starts_gop(tu: bytes) -> bool:
    """True iff the temporal unit's first frame OBU is a (shown) key
    frame — a clean random-access point (AV1 spec 5.9.2: frame_type
    KEY==0 right after show_existing_frame)."""
    from dav1d_tpu.getbits import GetBits
    from dav1d_tpu.headers import ObuType
    from dav1d_tpu.obu import split_obus

    for o in split_obus(tu):
        if o.type not in (ObuType.FRAME, ObuType.FRAME_HDR):
            continue
        gb = GetBits(tu[o.payload_start : o.payload_end])
        if gb.get_bit():  # show_existing_frame
            return False
        return gb.get_bits(2) == 0  # frame_type == KEY
    return False


def _seq_obu_bytes(tu: bytes) -> bytes | None:
    """The raw bytes of the sequence-header OBU in this TU (each worker
    needs one before its segment), including the OBU header."""
    from dav1d_tpu.headers import ObuType
    from dav1d_tpu.obu import split_obus

    for o in split_obus(tu):
        if o.type == ObuType.SEQ_HDR:
            # include the OBU header preceding the payload: scan back is
            # fragile, so re-emit a fresh header (type 1, has_size)
            payload = tu[o.payload_start : o.payload_end]
            ln = len(payload)
            leb = b""
            v = ln
            while True:
                b = v & 0x7F
                v >>= 7
                leb += bytes([b | (0x80 if v else 0)])
                if not v:
                    break
            return bytes([0x0A]) + leb + payload
    return None


def split_gops(tus: list[bytes]):
    """[(seq_obu_bytes | None, [tus...]), ...] — one entry per key-frame
    led segment; the first segment absorbs any leading non-key TUs."""
    segments = []
    cur = []
    seq = None
    for tu in tus:
        s = _seq_obu_bytes(tu)
        if s is not None:
            seq = s
        if _tu_starts_gop(tu) and cur:
            segments.append(cur)
            cur = []
        cur.append(tu)
    if cur:
        segments.append(cur)
    return seq, segments


def _decode_segment(args):
    seq, tus, out_path, two_pass = args
    from dav1d_tpu.decoder import Decoder, Settings

    dec = Decoder(Settings(two_pass=two_pass, max_frame_delay=4))
    n = 0
    with open(out_path, "wb") as out:
        def drain():
            nonlocal n
            while (pic := dec.get_picture()) is not None:
                for pl in range(len(pic.planes)):
                    out.write(pic.plane_bytes(pl))
                n += 1

        if seq is not None:
            dec.send_data(seq)
        for tu in tus:
            dec.send_data(tu)
            drain()
        drain()
    return n


def gop_decode(data: bytes, jobs: int, two_pass: bool = True,
               workdir: str | None = None):
    """Decode IVF bytes GOP-parallel; yields (n_frames, yuv_path) per
    segment in display order."""
    import multiprocessing as mp

    from dav1d_tpu.containers import read_ivf

    tus = [tu for tu, _ in read_ivf(data)]
    seq, segments = split_gops(tus)
    td = workdir or tempfile.mkdtemp(prefix="dav1d_tpu_gop_")
    jobs_args = []
    for i, seg in enumerate(segments):
        # the first TU of segment 0 carries its own seq hdr already;
        # later segments may too — sending it twice is harmless
        jobs_args.append((seq if i else None, seg,
                          os.path.join(td, f"seg{i:04d}.yuv"), two_pass))
    if jobs <= 1 or len(segments) == 1:
        counts = [_decode_segment(a) for a in jobs_args]
    else:
        ctx = mp.get_context("spawn")
        with ctx.Pool(min(jobs, len(segments))) as pool:
            counts = pool.map(_decode_segment, jobs_args)
    return [(c, a[2]) for c, a in zip(counts, jobs_args)]


def _relay_segment(args):
    """Subprocess body for relay_decode: import the predecessor's state,
    decode this segment, export state for the successor."""
    seq, tus, out_path, state_in, state_out, two_pass = args
    from dav1d_tpu.decoder import Decoder, Settings

    dec = Decoder(Settings(two_pass=two_pass))
    if state_in is not None:
        dec.import_state(Path(state_in).read_bytes())
    elif seq is not None:
        dec.send_data(seq)
    n = 0
    with open(out_path, "wb") as out:
        for tu in tus:
            dec.send_data(tu)
            while (pic := dec.get_picture()) is not None:
                for pl in range(len(pic.planes)):
                    out.write(pic.plane_bytes(pl))
                n += 1
    if state_out is not None:
        Path(state_out).write_bytes(dec.export_state())
    return n


def relay_decode(data: bytes, segments: int, two_pass: bool = True,
                 workdir: str | None = None):
    """Mid-GOP handoff relay: split the stream at ARBITRARY TU
    positions (no keyframes needed) and decode each segment in a fresh
    subprocess seeded with its predecessor's exported reference state —
    the cross-host ref-plane handoff protocol
    (Decoder.export_state/import_state), exercised process-to-process.
    Inherently sequential (the state at a split depends on everything
    before it); the parallel axis remains keyframe segments, while this
    is the migration/failover/pipeline building block."""
    import multiprocessing as mp

    from dav1d_tpu.containers import read_ivf

    tus = [tu for tu, _ in read_ivf(data)]
    seq, _ = split_gops(tus)
    td = workdir or tempfile.mkdtemp(prefix="dav1d_tpu_relay_")
    bounds = [round(i * len(tus) / segments) for i in range(segments + 1)]
    ctx = mp.get_context("spawn")
    results = []
    prev_state = None
    for i in range(segments):
        seg = tus[bounds[i] : bounds[i + 1]]
        out_path = os.path.join(td, f"relay{i:04d}.yuv")
        state_out = os.path.join(td, f"state{i:04d}.bin") \
            if i + 1 < segments else None
        with ctx.Pool(1) as pool:
            n = pool.apply(_relay_segment,
                           ((seq if i == 0 else None, seg, out_path,
                             prev_state, state_out, two_pass),))
        prev_state = state_out
        results.append((n, out_path))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--muxer", default="md5", choices=["md5", "yuv", "null"])
    p.add_argument("-j", "--jobs", type=int, default=os.cpu_count() or 1)
    p.add_argument("--relay", type=int, default=0, metavar="N",
                   help="mid-GOP handoff mode: N arbitrary segments "
                        "relayed through export_state/import_state")
    args = p.parse_args(argv)

    data = Path(args.input).read_bytes()
    import time

    t0 = time.perf_counter()
    parts = relay_decode(data, args.relay) if args.relay > 1 \
        else gop_decode(data, args.jobs)
    elapsed = time.perf_counter() - t0
    total = sum(c for c, _ in parts)
    out = sys.stdout.buffer if args.output == "-" else open(args.output,
                                                            "wb")
    md5 = hashlib.md5()
    for _, path in parts:
        buf = Path(path).read_bytes()
        if args.muxer == "md5":
            md5.update(buf)
        elif args.muxer == "yuv":
            out.write(buf)
    if args.muxer == "md5":
        out.write(f"{md5.hexdigest()}\n".encode())
    if out is not sys.stdout.buffer:
        out.close()
    kind = "relay" if args.relay > 1 else "GOP"
    print(f"decoded {total} frames in {len(parts)} {kind} segments, "
          f"{elapsed:.2f}s ({total / elapsed:.2f} fps)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
