"""Settings.n_threads >= 2: the ordered reconstruction worker must be
bit-exact with the single-threaded decode in both pipelines (the
reference's multi-thread contract: identical MD5 at any thread count,
tests/dav1d_argon.bash -t)."""

import hashlib
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import AomEncoder, gradient_frames, write_ivf_packets  # noqa


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    p = tmp_path_factory.mktemp("threads") / "t.ivf"
    enc = AomEncoder(width=192, height=128, usage="good", cpu_used=6,
                     q=40, kf_max_dist=4, lag=0,
                     options={"denoise-noise-level": 12})
    pkts = enc.encode(gradient_frames(6, 192, 128))
    enc.close()
    write_ivf_packets(p, pkts, 192, 128)
    return p


def _md5(tus, settings):
    from dav1d_tpu.decoder import Decoder

    dec = Decoder(settings)
    h = hashlib.md5()
    n = 0
    for tu in tus:
        dec.send_data(tu)
        while (p := dec.get_picture()) is not None:
            n += 1
            for pl in range(3):
                h.update(p.plane_bytes(pl))
    dec.close()
    return n, h.hexdigest()


@pytest.mark.parametrize("two_pass", [False, True])
def test_worker_thread_bit_exact(stream, two_pass):
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Settings

    tus = [tu for tu, _ in read_ivf(stream.read_bytes())]
    n0, ref = _md5(tus, Settings(two_pass=two_pass))
    n2, got = _md5(tus, Settings(two_pass=two_pass, n_threads=2,
                                 max_frame_delay=4))
    assert n0 == n2 == 6
    assert got == ref


def test_tile_parallel_pass1_bit_exact(tmp_path):
    """n_threads >= 2 decodes the tile columns of each sbrow on
    concurrent threads with per-tile arena slices
    (decode_glue._setup_parallel): must be byte-exact vs serial."""
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Settings

    p = tmp_path / "tiles.ivf"
    enc = AomEncoder(width=256, height=192, usage="good", cpu_used=6,
                     q=40, kf_max_dist=4, lag=0,
                     options={"tile-columns": 1, "tile-rows": 1,
                              "denoise-noise-level": 10})
    pkts = enc.encode(gradient_frames(6, 256, 192))
    enc.close()
    write_ivf_packets(p, pkts, 256, 192)
    tus = [tu for tu, _ in read_ivf(p.read_bytes())]

    n0, ref = _md5(tus, Settings(two_pass=True))
    for nt in (2, 4):
        nn, got = _md5(tus, Settings(two_pass=True, n_threads=nt,
                                     max_frame_delay=3))
        assert (nn, got) == (n0, ref), f"n_threads={nt}"


def test_worker_thread_flush_recovers(stream):
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    tus = [tu for tu, _ in read_ivf(stream.read_bytes())]
    dec = Decoder(Settings(two_pass=True, n_threads=2, max_frame_delay=4))
    for tu in tus[:3]:
        dec.send_data(tu)
    dec.flush()  # drop in-flight frames mid-pipeline
    # restart at the keyframe: decode must proceed normally
    for tu in tus[:2]:
        dec.send_data(tu)
    n = 0
    while dec.get_picture() is not None:
        n += 1
    assert n == 2
    dec.close()


def test_nfc_pool_bit_exact(stream):
    """Multiple reconstruction workers (n_fc > 1): identical bytes at
    every thread count, including delays larger than the pool."""
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Settings

    tus = [tu for tu, _ in read_ivf(stream.read_bytes())]
    _, ref = _md5(tus, Settings(two_pass=True))
    for n_threads in (5, 10, 64):
        n, got = _md5(tus, Settings(two_pass=True, n_threads=n_threads,
                                    max_frame_delay=8))
        assert n == 6
        assert got == ref


def test_nfc_pool_overlaps_independent_frames(tmp_path, monkeypatch):
    """Two frames whose references are final must reconstruct
    CONCURRENTLY on the worker pool (the reference's n_fc>1 frame
    threading, src/lib.c:109-126).  Keyframes have no refs, so with
    n_fc >= 2 their pass-2 intervals must overlap; a sleep inside the
    finish keeps the check robust on a 1-core host."""
    import time

    from dav1d_tpu import decoder as dmod
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    p = tmp_path / "kf.ivf"
    enc = AomEncoder(width=192, height=128, usage="good", cpu_used=8,
                     q=40, kf_max_dist=1, lag=0)
    pkts = enc.encode(gradient_frames(4, 192, 128))
    enc.close()
    write_ivf_packets(p, pkts, 192, 128)
    tus = [tu for tu, _ in read_ivf(p.read_bytes())]

    spans = []
    real = dmod.decode_frame_finish

    def slow_finish(f):
        t0 = time.monotonic()
        time.sleep(0.05)
        real(f)
        spans.append((t0, time.monotonic()))

    monkeypatch.setattr(dmod, "decode_frame_finish", slow_finish)
    dec = Decoder(Settings(two_pass=True, n_threads=5, max_frame_delay=8))
    n = 0
    for tu in tus:
        dec.send_data(tu)
    while dec.get_picture() is not None:
        n += 1
    dec.close()
    assert n == 4 and len(spans) == 4
    overlaps = sum(1 for i in range(len(spans)) for j in range(i + 1,
                   len(spans))
                   if spans[i][0] < spans[j][1] and spans[j][0] < spans[i][1])
    assert overlaps >= 1, f"no concurrent pass-2 intervals: {spans}"


def test_nfc_pool_respects_ref_dependency(stream):
    """A frame referencing the previous one must observe its final
    filtered pixels (the ready gate) — covered by byte-exactness on an
    inter GOP at a pool size larger than the chain depth."""
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Settings

    tus = [tu for tu, _ in read_ivf(stream.read_bytes())]
    _, ref = _md5(tus, Settings(two_pass=True))
    _, got = _md5(tus, Settings(two_pass=True, n_threads=64,
                                max_frame_delay=16))
    assert got == ref


def test_tile_rows_only_parallel_bit_exact(tmp_path):
    """r5: pass-1 parallelism spans the tile GRID, so a stream with
    only tile ROWS (cols=1) — serial under the r4 column-only driver —
    must also decode byte-exact on threads."""
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Settings

    p = tmp_path / "tilerows.ivf"
    enc = AomEncoder(width=192, height=256, usage="good", cpu_used=6,
                     q=40, kf_max_dist=4, lag=0,
                     options={"tile-columns": 0, "tile-rows": 2,
                              "denoise-noise-level": 10})
    pkts = enc.encode(gradient_frames(5, 192, 256))
    enc.close()
    write_ivf_packets(p, pkts, 192, 256)
    tus = [tu for tu, _ in read_ivf(p.read_bytes())]

    n0, ref = _md5(tus, Settings(two_pass=True))
    for nt in (2, 4):
        nn, got = _md5(tus, Settings(two_pass=True, n_threads=nt,
                                     max_frame_delay=3))
        assert (nn, got) == (n0, ref), f"n_threads={nt}"
