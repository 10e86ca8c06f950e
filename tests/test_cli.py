"""CLI parity tests (reference tools/dav1d.c): muxers, --verify,
--skip/--limit, stats line."""

import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import AomEncoder, gradient_frames, write_ivf_packets  # noqa

REPO = Path(__file__).resolve().parent.parent
CLI = REPO / "tools" / "dav1d_tpu_cli.py"


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    enc = AomEncoder(width=128, height=96, usage="good", cpu_used=6, q=40,
                     kf_max_dist=9999, lag=0)
    pkts = enc.encode(gradient_frames(5, 128, 96))
    enc.close()
    ivf = d / "s.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)
    return ivf


def _run(*args):
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu", DAV1D_TPU_DEVICE="0")
    return subprocess.run([sys.executable, str(CLI), *map(str, args)],
                          capture_output=True, text=True, env=env)


def test_md5_matches_oracle(stream, oracle, tmp_path):
    r = _run("-i", stream, "--muxer", "md5", "-o", tmp_path / "got.md5")
    assert r.returncode == 0, r.stderr
    got = (tmp_path / "got.md5").read_text().strip()
    ref = subprocess.run([str(oracle), "-i", str(stream), "--muxer", "md5",
                          "-o", str(tmp_path / "ref.md5"), "-q"],
                         capture_output=True, text=True)
    assert ref.returncode == 0
    want = (tmp_path / "ref.md5").read_text().split()[0]
    assert got == want
    assert "5/5 frames" in r.stderr and "fps" in r.stderr


def test_verify_flag(stream, tmp_path):
    r = _run("-i", stream, "--muxer", "md5", "-o", tmp_path / "a.md5")
    assert r.returncode == 0
    digest = (tmp_path / "a.md5").read_text().strip()
    ok = _run("-i", stream, "--muxer", "null", "--verify", digest)
    assert ok.returncode == 0 and "verify OK" in ok.stderr
    bad = _run("-i", stream, "--muxer", "null", "--verify", "0" * 32)
    assert bad.returncode == 1 and "verify FAILED" in bad.stderr


def test_skip_and_limit(stream, tmp_path):
    r = _run("-i", stream, "--muxer", "null", "-s", "2", "-l", "2")
    assert r.returncode == 0
    assert "decoded 2/" in r.stderr


def test_quiet(stream):
    r = _run("-i", stream, "--muxer", "null", "-q")
    assert r.returncode == 0 and r.stderr.strip() == ""


def test_player_ppm_dump(stream, tmp_path):
    """Player analog (reference examples/dav1dplay.c): decode + RGB
    conversion + display path, exercised via the PPM dump mode."""
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu", DAV1D_TPU_DEVICE="0")
    play = REPO / "tools" / "dav1d_tpu_play.py"
    out = tmp_path / "frames"
    r = subprocess.run(
        [sys.executable, str(play), "-i", str(stream), "--ppm", str(out),
         "--no-pace", "--limit", "3"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    ppms = sorted(out.glob("*.ppm"))
    assert len(ppms) == 3
    head = ppms[0].read_bytes()[:20]
    assert head.startswith(b"P6\n128 96\n255\n")
