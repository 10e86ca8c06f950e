"""SVC / operating-point end-to-end: a 2-spatial-layer stream crafted
with the in-repo bitstream writer (tools/avgen), cross-checked against
the oracle and against equivalent single-layer streams (reference layer
filtering, src/obu.c:1202-1210; output semantics src/lib.c:311-351)."""

import hashlib
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from avgen.stream import StreamConfig, make_svc_stream, write_ivf  # noqa
from test_e2e_intra import random_decide  # noqa


@pytest.fixture(scope="module")
def svc_streams(tmp_path_factory):
    cfg = StreamConfig(width=96, height=80, qidx=90, seed=11,
                       operating_points=(0x301, 0x101))
    tus, base_tus, enh_tus = make_svc_stream(cfg, random_decide(5), 3)
    d = tmp_path_factory.mktemp("svc")
    write_ivf(d / "svc.ivf", tus, 96, 80)
    write_ivf(d / "base.ivf", base_tus, 96, 80)
    write_ivf(d / "enh.ivf", enh_tus, 96, 80)
    return d


def _decode_md5(tus, settings=None):
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder

    dec = Decoder(settings)
    h = hashlib.md5()
    n = 0
    for tu, _ in read_ivf(tus):
        dec.send_data(tu)
        while (p := dec.get_picture()) is not None:
            n += 1
            for pl in range(3):
                h.update(p.plane_bytes(pl))
    return n, h.hexdigest()


def _oracle_md5(oracle, path, *args):
    r = subprocess.run([str(oracle), "-i", str(path), "--muxer", "md5",
                        "-o", "-", "-q", *args],
                       capture_output=True, text=True)
    assert r.returncode == 0, f"oracle rejected: {r.stderr}"
    return r.stdout.strip().split()[0]


def test_svc_full_decode_matches_oracle(svc_streams, oracle):
    """Default decode (op 0 = both layers): the shown enhancement frames
    must match the oracle and the standalone enhancement stream."""
    from dav1d_tpu.decoder import Settings

    n, got = _decode_md5((svc_streams / "svc.ivf").read_bytes())
    assert n == 3
    assert got == _oracle_md5(oracle, svc_streams / "svc.ivf")
    n2, enh = _decode_md5((svc_streams / "enh.ivf").read_bytes())
    assert n2 == 3 and enh == got
    # the two-pass/native pipeline agrees
    n3, got2 = _decode_md5((svc_streams / "svc.ivf").read_bytes(),
                           Settings(two_pass=True))
    assert n3 == 3 and got2 == got


def test_svc_base_operating_point(svc_streams, oracle):
    """operating_point=1 (idc = spatial layer 0 only) drops the
    enhancement OBUs; the decoded base frames (output via
    output_invisible_frames: base keyframes are coded not-shown) must
    equal the standalone base-layer stream, which the oracle verifies."""
    from dav1d_tpu.decoder import Settings

    n, got = _decode_md5((svc_streams / "svc.ivf").read_bytes(),
                         Settings(operating_point=1,
                                  output_invisible_frames=True))
    assert n == 3
    n2, base = _decode_md5((svc_streams / "base.ivf").read_bytes())
    assert n2 == 3 and base == got
    assert base == _oracle_md5(oracle, svc_streams / "base.ivf")
