"""Frame pipelining: pass 1 at send_data, pass 2 deferred until output is
demanded or max_frame_delay frames are in flight (the reference's frame
threading, src/lib.c:109-126 / src/thread_task.c, re-expressed as a
host/device overlap pipeline).  Verifies byte-exactness against the
synchronous decode and that frames genuinely stay in flight."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import (AomEncoder, gradient_frames,  # noqa: E402
                     write_ivf_packets)


def _encode(tmp_path, n_frames=8):
    enc = AomEncoder(width=128, height=96, cpu_used=6)
    pkts = enc.encode(gradient_frames(n_frames, 128, 96, seed=11))
    enc.close()
    ivf = tmp_path / "pipe.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)
    return ivf


def _decode(ivf, settings, drain_late=False, depth_log=None):
    from dav1d_tpu.decoder import Decoder
    from dav1d_tpu.containers import read_ivf

    dec = Decoder(settings)
    pics = []
    for tu, _ in read_ivf(ivf.read_bytes()):
        dec.send_data(tu)
        if depth_log is not None:
            depth_log.append(len(dec._pending))
        if not drain_late:
            while (pic := dec.get_picture()) is not None:
                pics.append(pic)
    while (pic := dec.get_picture()) is not None:
        pics.append(pic)
    return [b"".join(p.plane_bytes(pl) for pl in range(3)) for p in pics]


def test_pipelined_matches_sync(tmp_path):
    from dav1d_tpu.decoder import Settings

    ivf = _encode(tmp_path)
    golden = _decode(ivf, None)
    assert len(golden) == 8

    depth = []
    got = _decode(ivf, Settings(two_pass=True, max_frame_delay=4),
                  drain_late=True, depth_log=depth)
    # frames genuinely accumulated in flight (pass 2 deferred across
    # multiple send_data calls) before byte-identical output
    assert max(depth) > 1, depth
    assert got == golden


def test_pipelined_interleaved(tmp_path):
    """The standard send/get loop under a frame delay: output must stay
    in order and byte-exact even when gets interleave with sends."""
    from dav1d_tpu.decoder import Settings

    ivf = _encode(tmp_path)
    golden = _decode(ivf, None)
    got = _decode(ivf, Settings(two_pass=True, max_frame_delay=3))
    assert got == golden


def test_flush_drops_inflight(tmp_path):
    from dav1d_tpu.decoder import Decoder, Settings
    from dav1d_tpu.containers import read_ivf

    ivf = _encode(tmp_path)
    dec = Decoder(Settings(two_pass=True, max_frame_delay=4))
    tus = [tu for tu, _ in read_ivf(ivf.read_bytes())]
    for tu in tus[:3]:
        dec.send_data(tu)
    assert dec._pending
    dec.flush()
    assert not dec._pending and dec.get_picture() is None
