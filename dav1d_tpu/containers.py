"""Container demuxing: IVF (and raw OBU/annexb as they land).

Capability parity with reference tools/input/ (ivf.c, annexb.c,
section5.c)."""

from __future__ import annotations

import struct


def probe_ivf(data: bytes) -> bool:
    return data[:4] == b"DKIF" and data[8:12] == b"AV01"


def read_ivf(data: bytes):
    """Yields (frame_bytes, pts) per temporal unit."""
    if not probe_ivf(data):
        raise ValueError("not an AV01 IVF file")
    (hdr_sz,) = struct.unpack_from("<H", data, 6)
    pos = hdr_sz
    while pos + 12 <= len(data):
        sz, pts = struct.unpack_from("<IQ", data, pos)
        pos += 12
        yield data[pos : pos + sz], pts
        pos += sz


def ivf_meta(data: bytes):
    w, h = struct.unpack_from("<HH", data, 12)
    num, den = struct.unpack_from("<II", data, 16)
    return w, h, num, den
