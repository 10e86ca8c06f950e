#!/usr/bin/env python3
"""dav1d_tpu CLI: decode AV1 (IVF) to y4m / yuv / md5.

Capability parity with the reference CLI (reference tools/dav1d.c): demux,
decode loop (send/get), muxers, frame limits, verification.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dav1d_tpu.containers import ivf_meta, open_stream, probe_ivf
from dav1d_tpu.decoder import Decoder, Settings
from dav1d_tpu.headers import PixelLayout


def y4m_header(pic, fps=(25, 1)) -> bytes:
    ss_names = {
        (PixelLayout.I400, 8): "mono",
        (PixelLayout.I420, 8): "420jpeg",
        (PixelLayout.I420, 10): "420p10",
        (PixelLayout.I420, 12): "420p12",
        (PixelLayout.I422, 8): "422",
        (PixelLayout.I422, 10): "422p10",
        (PixelLayout.I444, 8): "444",
        (PixelLayout.I444, 10): "444p10",
    }
    chr_names = {0: "420jpeg", 1: "420mpeg2", 2: "420"}
    if pic.layout == PixelLayout.I420 and pic.bitdepth == 8:
        ss = chr_names.get(int(pic.seq_hdr.chr), "420jpeg")
    else:
        ss = ss_names[(pic.layout, pic.bitdepth)]
    aw = pic.height * pic.frame_hdr.render_width
    ah = pic.width * pic.frame_hdr.render_height
    g = math.gcd(aw, ah) or 1
    return (f"YUV4MPEG2 W{pic.width} H{pic.height} F{fps[0]}:{fps[1]} "
            f"Ip A{aw // g}:{ah // g} C{ss}\n").encode()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--muxer", default="y4m", choices=["y4m", "yuv", "md5", "null"])
    p.add_argument("--limit", type=int, default=0, help="max frames")
    args = p.parse_args(argv)

    data = Path(args.input).read_bytes()
    fps = (25, 1)
    if probe_ivf(data):
        _, _, num, den = ivf_meta(data)
        if num and den:
            fps = (num, den)
    dec = Decoder(Settings())
    out = sys.stdout.buffer if args.output == "-" else open(args.output, "wb")
    md5 = hashlib.md5()
    n = 0
    first = True
    for tu, _pts in open_stream(data):
        dec.send_data(tu)
        while (pic := dec.get_picture()) is not None:
            if args.muxer == "y4m":
                if first:
                    out.write(y4m_header(pic, fps))
                    first = False
                out.write(b"FRAME\n")
            for pl in range(len(pic.planes)):
                buf = pic.plane_bytes(pl)
                if args.muxer == "md5":
                    md5.update(buf)
                elif args.muxer != "null":
                    out.write(buf)
            n += 1
            if args.limit and n >= args.limit:
                break
        if args.limit and n >= args.limit:
            break
    if args.muxer == "md5":
        out.write(f"{md5.hexdigest()}\n".encode())
    if out is not sys.stdout.buffer:
        out.close()
    print(f"decoded {n} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
