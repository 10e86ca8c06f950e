"""GOP-parallel decode (tools/gop_decode.py): key-frame segmentation +
parallel workers must be byte-identical to the serial decode."""

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import AomEncoder, gradient_frames, write_ivf_packets  # noqa


def _stream(tmp_path, kf_dist):
    enc = AomEncoder(width=128, height=96, usage="good", cpu_used=6, q=40,
                     kf_max_dist=kf_dist, lag=0)
    pkts = enc.encode(gradient_frames(10, 128, 96))
    enc.close()
    ivf = tmp_path / "gop.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)
    return ivf.read_bytes()


def test_gop_split_and_parallel_matches_serial(tmp_path):
    from gop_decode import gop_decode, split_gops

    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    data = _stream(tmp_path, kf_dist=4)
    tus = [tu for tu, _ in read_ivf(data)]
    seq, segments = split_gops(tus)
    assert len(segments) >= 2, "encoder produced a single GOP"
    assert seq is not None

    # serial golden
    dec = Decoder(Settings(two_pass=True, max_frame_delay=4))
    h = hashlib.md5()
    n_serial = 0
    for tu in tus:
        dec.send_data(tu)
    while (pic := dec.get_picture()) is not None:
        for pl in range(len(pic.planes)):
            h.update(pic.plane_bytes(pl))
        n_serial += 1

    parts = gop_decode(data, jobs=2, workdir=str(tmp_path))
    got = hashlib.md5()
    total = 0
    for c, path in parts:
        got.update(Path(path).read_bytes())
        total += c
    assert total == n_serial == 10
    assert got.hexdigest() == h.hexdigest()


def test_relay_handoff_matches_serial(tmp_path):
    """Mid-GOP relay (export_state/import_state across processes) on a
    single-GOP stream: arbitrary split points, byte-equal stitch."""
    from gop_decode import relay_decode

    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    data = _stream(tmp_path, kf_dist=9999)  # one GOP: no keyframe splits
    tus = [tu for tu, _ in read_ivf(data)]

    dec = Decoder(Settings(two_pass=True, max_frame_delay=4))
    h = hashlib.md5()
    n_serial = 0
    for tu in tus:
        dec.send_data(tu)
    while (pic := dec.get_picture()) is not None:
        for pl in range(len(pic.planes)):
            h.update(pic.plane_bytes(pl))
        n_serial += 1

    parts = relay_decode(data, segments=3, workdir=str(tmp_path))
    got = hashlib.md5()
    total = 0
    for c, path in parts:
        got.update(Path(path).read_bytes())
        total += c
    assert total == n_serial == 10
    assert got.hexdigest() == h.hexdigest()
