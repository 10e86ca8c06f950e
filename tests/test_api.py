"""Public API behavior: flush/seek correctness, metadata attachment
(reference tests/seek_stress.c and src/obu.c metadata handling)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import AomEncoder, gradient_frames, write_ivf_packets  # noqa


def _stream(tmp_path, n=8, kf=4):
    enc = AomEncoder(width=128, height=96, usage="good", cpu_used=6, q=40,
                     kf_max_dist=kf, lag=0)
    pkts = enc.encode(gradient_frames(n, 128, 96))
    enc.close()
    ivf = tmp_path / "seek.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)
    return ivf.read_bytes()


def _decode_all(dec, tus):
    from dav1d_tpu.containers import read_ivf  # noqa
    out = []
    for tu in tus:
        dec.send_data(tu)
        while (p := dec.get_picture()) is not None:
            out.append(p.plane_bytes(0))
    return out


def test_flush_and_seek(tmp_path):
    from dav1d_tpu.decoder import Decoder
    from dav1d_tpu.containers import read_ivf

    data = _stream(tmp_path)
    tus = [tu for tu, _ in read_ivf(data)]

    ref = _decode_all(Decoder(), tus)
    assert len(ref) == 8

    # decode 2 TUs, flush, then seek to the mid-stream keyframe (TU 4)
    dec = Decoder()
    _decode_all(dec, tus[:2])
    dec.flush()
    got = _decode_all(dec, tus[4:])
    assert got == ref[4:]


def test_flush_clears_output_queue(tmp_path):
    from dav1d_tpu.decoder import Decoder
    from dav1d_tpu.containers import read_ivf

    data = _stream(tmp_path)
    tus = [tu for tu, _ in read_ivf(data)]
    dec = Decoder()
    dec.send_data(tus[0])
    dec.flush()
    assert dec.get_picture() is None


def test_metadata_attach(tmp_path):
    from dav1d_tpu.decoder import Decoder
    from dav1d_tpu.containers import read_ivf

    def obu(payload):
        hdr = bytes([(5 << 3) | 0x02])  # METADATA, has_size
        out = bytearray(hdr)
        n = len(payload)
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | (0x80 if n else 0))
            if not n:
                break
        return bytes(out) + payload

    cll = obu(bytes([1, 0x12, 0x34, 0x56, 0x78, 0x80]))
    t35 = obu(bytes([4, 0xB5]) + b"payload" + b"\x80")

    data = _stream(tmp_path, n=2, kf=1)
    tus = [tu for tu, _ in read_ivf(data)]
    dec = Decoder()
    dec.send_data(cll + t35 + tus[0])
    pic = dec.get_picture()
    assert pic.content_light.max_content_light_level == 0x1234
    assert pic.content_light.max_frame_average_light_level == 0x5678
    assert pic.itut_t35[0]["country_code"] == 0xB5
    assert pic.itut_t35[0]["payload"] == b"payload"
    # T35 consumed by the first picture only
    dec.send_data(tus[1])
    pic2 = dec.get_picture()
    assert pic2.itut_t35 == []
    assert pic2.content_light is not None


def test_decode_frame_type_key_only(tmp_path):
    """decode_frame_type=3 decodes only key frames (reference
    src/obu.c:1640-1657 skip path)."""
    from dav1d_tpu.decoder import Decoder, Settings
    from dav1d_tpu.containers import read_ivf

    data = _stream(tmp_path, n=8, kf=4)  # keyframes at 0 and 4
    tus = [tu for tu, _ in read_ivf(data)]
    ref = _decode_all(Decoder(), tus)
    got = _decode_all(Decoder(Settings(decode_frame_type=3)), tus)
    assert len(got) == 2
    assert got[0] == ref[0] and got[1] == ref[4]


def test_frame_size_limit(tmp_path):
    from dav1d_tpu.decoder import Decoder, Settings
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.obu import ObuError

    data = _stream(tmp_path, n=1, kf=1)
    tus = [tu for tu, _ in read_ivf(data)]
    with pytest.raises(ObuError):
        Decoder(Settings(frame_size_limit=64 * 64)).send_data(tus[0])
    # a generous limit decodes fine
    dec = Decoder(Settings(frame_size_limit=1 << 20))
    dec.send_data(tus[0])
    assert dec.get_picture() is not None


def test_inloop_filters_mask(tmp_path):
    """Selective in-loop-filter disabling (reference Dav1dInloopFilterType):
    masks decode without error; disabling all filters on a filtered stream
    changes the output."""
    from dav1d_tpu.decoder import Decoder, Settings
    from dav1d_tpu.containers import read_ivf

    enc = AomEncoder(width=128, height=96, usage="good", cpu_used=6, q=55,
                     kf_max_dist=4, lag=0)
    pkts = enc.encode(gradient_frames(4, 128, 96, noise=12))
    enc.close()
    ivf = tmp_path / "ilf.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)
    tus = [tu for tu, _ in read_ivf(ivf.read_bytes())]

    full = _decode_all(Decoder(Settings(inloop_filters=7)), tus)
    none = _decode_all(Decoder(Settings(inloop_filters=0)), tus)
    assert len(full) == len(none) == 4
    assert full != none  # filters did something on this stream


def test_logger_callback(tmp_path):
    """Pluggable logger (reference Dav1dLogger): decode errors are
    reported through the callback before the exception propagates."""
    from dav1d_tpu.decoder import Decoder, Settings

    msgs = []
    dec = Decoder(Settings(logger=msgs.append))
    with pytest.raises(Exception):
        # sequence-header OBU whose payload overruns the buffer
        dec.send_data(bytes([0x0A, 0x02, 0xFF]))
    assert msgs and "error" in msgs[0]

    from dav1d_tpu.containers import read_ivf

    data = _stream(tmp_path, n=1, kf=1)
    tus = [tu for tu, _ in read_ivf(data)]
    ok = Decoder(Settings(logger=msgs.append))
    ok.send_data(tus[0])
    assert ok.get_picture() is not None


def test_data_props_roundtrip_and_error_props(tmp_path):
    """DataProps ride from send_data to the output Picture (reference
    Dav1dPicture.m) and to decode_error_props on a failed decode
    (reference dav1d_get_decode_error_data_props, src/lib.c:716)."""
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import DataProps, Decoder

    data = _stream(tmp_path, n=3, kf=9999)
    tus = [tu for tu, _ in read_ivf(data)]

    dec = Decoder()
    out = []
    for i, tu in enumerate(tus):
        dec.send_data(tu, props=DataProps(timestamp=1000 + i, offset=i,
                                          user_data=("tag", i)))
        while (p := dec.get_picture()) is not None:
            out.append(p)
    assert len(out) == 3
    for i, p in enumerate(out):
        assert p.props.timestamp == 1000 + i
        assert p.props.offset == i
        assert p.props.user_data == ("tag", i)
        assert p.props.size == len(tus[i])
    assert dec.decode_error_props is None

    # corrupt the second TU's payload: the failing packet's props are
    # retrievable afterwards
    bad = bytearray(tus[1])
    bad[len(bad) // 2 :] = b"\xff" * (len(bad) - len(bad) // 2)
    dec2 = Decoder()
    dec2.send_data(tus[0], props=DataProps(timestamp=7))
    try:
        dec2.send_data(bytes(bad), props=DataProps(timestamp=8, offset=1))
        while dec2.get_picture() is not None:
            pass
    except Exception:
        pass
    assert dec2.decode_error_props is not None
    assert dec2.decode_error_props.timestamp == 8
