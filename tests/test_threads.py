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
