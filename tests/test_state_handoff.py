"""Mid-GOP decoder state handoff (Decoder.export_state/import_state).

The GOP-parallel scaling axis needs more than keyframe splits: a worker
must be able to take over MID-GOP, which requires the full reference
state (8 slots: pictures, segmaps, per-slot CDFs, temporal MVs, ref
POCs) to cross the host boundary — the explicit form of the ref-plane
sharing the reference's frame threads get from shared memory
(src/decode.c:3327-3374).  These tests split a single-GOP stream at
every interior position, hand the exported state to a FRESH decoder,
and require the stitched output to be byte-identical to the serial
decode.
"""

import hashlib
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import AomEncoder, gradient_frames, write_ivf_packets  # noqa


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    w, h, n = 128, 96, 8
    enc = AomEncoder(width=w, height=h, usage="good", cpu_used=5, q=45,
                     kf_max_dist=9999, lag=0,
                     options={"enable-order-hint": 1,
                              "enable-ref-frame-mvs": 1})
    pkts = enc.encode(gradient_frames(n, w, h))
    enc.close()
    p = tmp_path_factory.mktemp("handoff") / "s.ivf"
    write_ivf_packets(p, pkts, w, h)
    return p.read_bytes()


def _frame_md5s(dec, tus):
    out = []
    for tu in tus:
        dec.send_data(tu)
        while (pic := dec.get_picture()) is not None:
            h = hashlib.md5()
            for pl in range(len(pic.planes)):
                h.update(pic.plane_bytes(pl))
            out.append(h.hexdigest())
    return out


def test_handoff_every_split(stream):
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    tus = [tu for tu, _ in read_ivf(stream)]
    serial = _frame_md5s(Decoder(Settings(two_pass=True)), tus)
    assert len(serial) == 8

    for k in range(1, len(tus)):
        a = Decoder(Settings(two_pass=True))
        head = _frame_md5s(a, tus[:k])
        blob = a.export_state()
        b = Decoder(Settings(two_pass=True))
        b.import_state(blob)
        tail = _frame_md5s(b, tus[k:])
        assert head + tail == serial, f"split at {k} diverges"


def test_handoff_threaded_and_sized(stream):
    """Handoff out of an n_threads>=2 decoder (in-flight frames must be
    collected first) into a single-threaded one."""
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    tus = [tu for tu, _ in read_ivf(stream)]
    serial = _frame_md5s(Decoder(Settings(two_pass=True)), tus)
    a = Decoder(Settings(two_pass=True, n_threads=3, max_frame_delay=4))
    head = _frame_md5s(a, tus[:5])
    blob = a.export_state()
    assert isinstance(blob, bytes) and len(blob) > 1000
    b = Decoder(Settings(two_pass=True))
    b.import_state(blob)
    tail = _frame_md5s(b, tus[5:])
    assert head + tail == serial
