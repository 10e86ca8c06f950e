"""Adversarial-input robustness (the reference's fuzzer surface:
tests/libfuzzer/dav1d_fuzzer.c — arbitrary bytes must never corrupt the
decoder; errors are contained to clean Python exceptions and the decoder
keeps working on valid input afterwards)."""

import numpy as np
import pytest

from dav1d_tpu.decoder import Decoder, Settings


def _valid_stream(tmp_path):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets
    from dav1d_tpu.containers import read_ivf

    enc = AomEncoder(width=128, height=96, usage="good", cpu_used=6, q=40,
                     kf_max_dist=2, lag=0)
    pkts = enc.encode(gradient_frames(4, 128, 96))
    enc.close()
    ivf = tmp_path / "fuzz.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)
    return [tu for tu, _ in read_ivf(ivf.read_bytes())]


def _feed(dec, data):
    """send_data + drain; returns pictures, raising only dav1d_tpu's own
    error types."""
    pics = []
    dec.send_data(data)
    while (p := dec.get_picture()) is not None:
        pics.append(p)
    return pics


def test_random_bytes_never_crash():
    rng = np.random.default_rng(1234)
    for trial in range(40):
        dec = Decoder()
        blob = rng.integers(0, 256, rng.integers(1, 300),
                            dtype=np.uint8).tobytes()
        try:
            _feed(dec, blob)
        except Exception as e:
            # errors must be contained, typed failures — not interpreter
            # crashes or internal assertion states
            assert not isinstance(e, (SystemError, MemoryError)), e


def test_truncated_temporal_units(tmp_path):
    """Every prefix-truncation of a valid TU either decodes or raises a
    clean error; the decoder survives to decode the intact stream."""
    tus = _valid_stream(tmp_path)
    tu = tus[0]
    for cut in range(0, len(tu), max(1, len(tu) // 23)):
        dec = Decoder()
        try:
            _feed(dec, tu[:cut])
        except Exception as e:
            assert not isinstance(e, (SystemError, MemoryError)), e
    # full stream still fine in a fresh decoder
    dec = Decoder()
    n = sum(len(_feed(dec, t)) for t in tus)
    assert n == 4


def test_bitflips_in_tile_data(tmp_path):
    """Bit flips inside the coded payload must be contained (decode or
    clean error), for both the fused and the two-pass native pipeline."""
    tus = _valid_stream(tmp_path)
    rng = np.random.default_rng(7)
    for settings in (None, Settings(two_pass=True)):
        for trial in range(25):
            blob = bytearray(tus[trial % len(tus)])
            for _ in range(3):
                pos = rng.integers(2, len(blob))
                blob[pos] ^= 1 << rng.integers(0, 8)
            dec = Decoder(settings)
            try:
                _feed(dec, bytes(blob))
            except Exception as e:
                assert not isinstance(e, (SystemError, MemoryError)), e


def test_error_then_recovery(tmp_path):
    """After a stream error the same decoder instance keeps working once
    it is flushed and fed a keyframe (reference seek/flush semantics)."""
    tus = _valid_stream(tmp_path)
    dec = Decoder()
    bad = bytearray(tus[0])
    bad[len(bad) // 2] ^= 0xFF
    try:
        _feed(dec, bytes(bad))
    except Exception:
        pass
    dec.flush()
    pics = []
    for t in tus[2:]:  # keyframe at index 2 (kf_max_dist=2)
        try:
            pics.extend(_feed(dec, t))
        except Exception as e:
            pytest.fail(f"decoder did not recover after flush: {e!r}")
    assert len(pics) == 2
