"""End-to-end intra decode: avgen streams -> oracle dav1d y4m vs dav1d_tpu
Decoder output, byte-exact (config 1 of BASELINE.json: keyframe-only 8-bit
4:2:0 intra decode)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from avgen.stream import StreamConfig, make_stream, write_ivf  # noqa: E402
from dav1d_tpu.decoder import Decoder  # noqa: E402
from dav1d_tpu.containers import read_ivf  # noqa: E402
from dav1d_tpu.levels import BlockPartition as BP, IntraPredMode as M  # noqa: E402


def parse_y4m(data: bytes):
    """Returns list of frames, each a list of plane byte strings (8-bit 420)."""
    nl = data.index(b"\n")
    hdr = data[:nl].decode()
    fields = dict((f[0], f[1:]) for f in hdr.split()[1:])
    w, h = int(fields["W"]), int(fields["H"])
    cw, ch = (w + 1) // 2, (h + 1) // 2
    pos = nl + 1
    frames = []
    while pos < len(data):
        assert data[pos : pos + 6] == b"FRAME\n", data[pos : pos + 6]
        pos += 6
        planes = []
        for sz in (w * h, cw * ch, cw * ch):
            planes.append(data[pos : pos + sz])
            pos += sz
        frames.append(planes)
    return w, h, frames


def run_pair(tmp_path, oracle, cfg, decide, name):
    stream = make_stream(cfg, decide)
    ivf = tmp_path / f"{name}.ivf"
    write_ivf(ivf, [stream], cfg.width, cfg.height)

    # oracle decode
    y4m = tmp_path / f"{name}_ref.y4m"
    r = subprocess.run([str(oracle), "-i", str(ivf), "-o", str(y4m), "-q"],
                       capture_output=True, text=True)
    assert r.returncode == 0, f"oracle rejected the stream: {r.stderr}"
    w, h, ref_frames = parse_y4m(y4m.read_bytes())
    assert (w, h) == (cfg.width, cfg.height)

    # our decode
    dec = Decoder()
    pics = []
    for tu, _ in read_ivf(ivf.read_bytes()):
        dec.send_data(tu)
        while (pic := dec.get_picture()) is not None:
            pics.append(pic)
    assert len(pics) == len(ref_frames)
    for i, (pic, ref) in enumerate(zip(pics, ref_frames)):
        for pl in range(3):
            got = pic.plane_bytes(pl)
            assert got == ref[pl], (
                f"{name} frame {i} plane {pl}: first diff at "
                f"{next(j for j in range(len(got)) if got[j] != ref[pl][j])}")


from avgen.legal import legal_txtps, random_coef_choice  # noqa: E402


def const_decide(**choices):
    def decide(kind, **kw):
        if kind == "partition":
            return choices.get("partition", BP.NONE)
        if kind == "skip":
            return choices.get("skip", 1)
        if kind == "y_mode":
            return choices.get("y_mode", M.DC_PRED)
        if kind == "uv_mode":
            return choices.get("uv_mode", M.DC_PRED)
        if kind in ("y_angle", "uv_angle"):
            return choices.get("angle", 0)
        if kind == "tx_depth":
            return choices.get("tx_depth", 0)
        if kind == "coef":
            return choices.get("coef", (0, {}, {}))
        raise KeyError(kind)
    return decide


def random_decide(seed, uv_cfl=False, coef_p=0.7, filter_intra=False):
    rng = np.random.default_rng(seed)

    def decide(kind, **kw):
        if kind == "partition":
            if not kw["can_split"]:
                return BP.NONE
            return int(rng.choice([BP.NONE, BP.SPLIT, BP.H, BP.V],
                                  p=[0.4, 0.3, 0.15, 0.15]))
        if kind == "skip":
            return int(rng.integers(0, 2))
        if kind == "y_mode":
            return int(rng.integers(0, 13))
        if kind == "uv_mode":
            if uv_cfl and kw.get("cfl_allowed") and rng.random() < 0.5:
                return 13  # CFL
            return int(rng.integers(0, 13))
        if kind == "cfl_alphas":
            while True:
                au = int(rng.integers(-16, 17))
                av = int(rng.integers(-16, 17))
                if au or av:
                    return au, av
        if kind == "filter_intra":
            if filter_intra and rng.random() < 0.6:
                return int(rng.integers(0, 5))
            return None
        if kind in ("y_angle", "uv_angle"):
            return int(rng.integers(-3, 4))
        if kind == "tx_depth":
            return int(rng.integers(0, kw["max_depth"] + 1))
        if kind == "cdef_idx":
            return int(rng.integers(0, 4))
        if kind == "coef":
            return random_coef_choice(rng, coef_p=coef_p, **kw)
        raise KeyError(kind)
    return decide


def test_minimal_gray(tmp_path, oracle):
    cfg = StreamConfig(width=64, height=64, qidx=100)
    run_pair(tmp_path, oracle, cfg, const_decide(), "gray64")


def test_modes_sweep(tmp_path, oracle):
    for mode in range(13):
        cfg = StreamConfig(width=64, height=64, qidx=60)
        run_pair(tmp_path, oracle, cfg,
                 const_decide(partition=BP.SPLIT, y_mode=mode, uv_mode=mode,
                              skip=1),
                 f"mode{mode}")


def test_random_partitions_and_modes(tmp_path, oracle):
    for seed in range(6):
        cfg = StreamConfig(width=128, height=96, qidx=80, seed=seed)
        run_pair(tmp_path, oracle, cfg, random_decide(seed), f"rand{seed}")


def test_qidx_sweep(tmp_path, oracle):
    for qidx in (1, 20, 21, 60, 61, 120, 121, 255):
        cfg = StreamConfig(width=64, height=64, qidx=qidx)
        run_pair(tmp_path, oracle, cfg, random_decide(qidx), f"q{qidx}")


def test_odd_sizes(tmp_path, oracle):
    for w, h in [(72, 36), (68, 68), (120, 56)]:
        cfg = StreamConfig(width=w, height=h, qidx=40)
        run_pair(tmp_path, oracle, cfg, random_decide(w * h),
                 f"odd{w}x{h}")


def test_edge_filter_enabled(tmp_path, oracle):
    cfg = StreamConfig(width=64, height=64, qidx=30, intra_edge_filter=1)
    run_pair(tmp_path, oracle, cfg, random_decide(7), "edgefilter")


def test_deblocking(tmp_path, oracle):
    for i, (levels, sharp) in enumerate([
            ((32, 32, 24, 20), 0),
            ((63, 63, 63, 63), 0),
            ((10, 14, 0, 0), 4),
            ((1, 2, 3, 4), 7)]):
        cfg = StreamConfig(width=128, height=96, qidx=140, seed=i,
                           lf_levels=levels, lf_sharpness=sharp)
        run_pair(tmp_path, oracle, cfg, random_decide(i + 100),
                 f"lf{i}")


def test_cfl(tmp_path, oracle):
    for seed in range(3):
        cfg = StreamConfig(width=64, height=64, qidx=90, seed=seed)
        run_pair(tmp_path, oracle, cfg,
                 random_decide(seed + 50, uv_cfl=True), f"cfl{seed}")


def test_filter_intra(tmp_path, oracle):
    for seed in range(3):
        cfg = StreamConfig(width=64, height=64, qidx=90, seed=seed,
                           filter_intra=1)
        run_pair(tmp_path, oracle, cfg,
                 random_decide(seed + 60, filter_intra=True), f"fi{seed}")


def test_cdef_intra(tmp_path, oracle):
    """CDEF on keyframes: several strength combos, with and without
    deblocking, primary-only / secondary-only / combined."""
    cases = [
        ((3, 0, [(4 << 2 | 0, 2 << 2 | 0)]), (0, 0, 0, 0)),   # pri only
        ((4, 0, [(0 << 2 | 2, 0 << 2 | 1)]), (0, 0, 0, 0)),   # sec only
        ((5, 1, [(9 << 2 | 3, 5 << 2 | 2), (1 << 2 | 1, 2 << 2 | 3)]),
         (24, 24, 16, 16)),                                    # mixed+deblock
        ((6, 2, [(15 << 2 | 3, 12 << 2 | 2), (0, 0),
                 (7 << 2 | 1, 3 << 2 | 0), (2 << 2 | 2, 1 << 2 | 1)]),
         (8, 8, 4, 4)),
    ]
    for i, (cdef, lf) in enumerate(cases):
        cfg = StreamConfig(width=128, height=96, qidx=120, seed=i,
                           cdef=cdef, lf_levels=lf)
        run_pair(tmp_path, oracle, cfg, random_decide(i, coef_p=0.5),
                 f"cdef{i}")
