"""End-to-end inter decode: 2-frame avgen streams (keyframe + single-ref
inter frame) -> oracle dav1d y4m vs dav1d_tpu Decoder, byte-exact.
Covers translation MC (all subpel filters), NEWMV/NEARESTMV/NEARMV/GLOBALMV,
DRL, var-tx trees, inter coefficient sets, and intra blocks in inter frames
(BASELINE config 2, translation-only stage)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from avgen.stream import StreamConfig, write_ivf  # noqa: E402
from avgen.inter import make_inter_stream  # noqa: E402
from avgen.legal import random_coef_choice  # noqa: E402
from dav1d_tpu.levels import BlockPartition as BP  # noqa: E402

from test_e2e_intra import parse_y4m, random_decide  # noqa: E402


def run_inter_pair(tmp_path, oracle, cfg, decide_key, decide_inter, name):
    import subprocess
    from dav1d_tpu.decoder import Decoder
    from dav1d_tpu.containers import read_ivf

    stream = make_inter_stream(cfg, decide_key, decide_inter)
    ivf = tmp_path / f"{name}.ivf"
    write_ivf(ivf, [stream], cfg.width, cfg.height)

    y4m = tmp_path / f"{name}_ref.y4m"
    r = subprocess.run([str(oracle), "-i", str(ivf), "-o", str(y4m), "-q"],
                       capture_output=True, text=True)
    assert r.returncode == 0, f"oracle rejected the stream: {r.stderr}"
    w, h, ref_frames = parse_y4m(y4m.read_bytes())
    assert (w, h) == (cfg.width, cfg.height)
    assert len(ref_frames) == 2

    dec = Decoder()
    pics = []
    for tu, _ in read_ivf(ivf.read_bytes()):
        dec.send_data(tu)
        while (pic := dec.get_picture()) is not None:
            pics.append(pic)
    assert len(pics) == 2
    for i, (pic, ref) in enumerate(zip(pics, ref_frames)):
        for pl in range(3):
            got = pic.plane_bytes(pl)
            assert got == ref[pl], (
                f"{name} frame {i} plane {pl}: first diff at "
                f"{next(j for j in range(len(got)) if got[j] != ref[pl][j])}")


def inter_decide(seed, modes=("NEWMV", "NEARESTMV", "NEARMV", "GLOBALMV"),
                 intra_p=0.15, skip_p=0.4, coef_p=0.7, max_mv=256,
                 split_p=0.3, filters=(0, 1, 2), tx_split_p=0.3,
                 fixed_mv=None, comp_p=0.0):
    """Decision callback for InterTileEncoder."""
    from dav1d_tpu.levels import InterPredMode as IPM
    rng = np.random.default_rng(seed)
    mode_vals = {"NEWMV": IPM.NEWMV, "NEARESTMV": IPM.NEARESTMV,
                 "NEARMV": IPM.NEARMV, "GLOBALMV": IPM.GLOBALMV}
    comp_ref_pairs = [(0, 4), (1, 5), (2, 6), (3, 4), (0, 6),
                      (4, 6), (0, 1), (0, 2), (0, 3)]

    def decide(kind, **kw):
        if kind == "is_comp":
            return int(rng.random() < comp_p)
        if kind == "comp_refs":
            return comp_ref_pairs[int(rng.integers(0, len(comp_ref_pairs)))]
        if kind == "comp_mode":
            return int(rng.integers(0, 8))
        if kind == "partition":
            if not kw["can_split"]:
                return BP.NONE
            return int(rng.choice(
                [BP.NONE, BP.SPLIT, BP.H, BP.V],
                p=[1 - split_p - 0.2, split_p, 0.1, 0.1]))
        if kind == "skip":
            return int(rng.random() < skip_p)
        if kind == "is_intra":
            return int(rng.random() < intra_p)
        if kind == "ref":
            return 0  # all slots hold the keyframe; LAST only
        if kind == "inter_mode":
            return mode_vals[modes[int(rng.integers(0, len(modes)))]]
        if kind == "drl_more":
            return int(rng.integers(0, 2))
        if kind == "mv_diff":
            if fixed_mv is not None:
                return fixed_mv
            return (int(rng.integers(-max_mv, max_mv + 1)),
                    int(rng.integers(-max_mv, max_mv + 1)))
        if kind == "filter":
            return int(filters[int(rng.integers(0, len(filters)))])
        if kind == "tx_split":
            return int(rng.random() < tx_split_p)
        if kind == "y_mode":
            return int(rng.integers(0, 13))
        if kind == "uv_mode":
            return int(rng.integers(0, 13))
        if kind in ("y_angle", "uv_angle"):
            return int(rng.integers(-3, 4))
        if kind == "filter_intra":
            return None
        if kind == "tx_depth":
            return int(rng.integers(0, kw["max_depth"] + 1))
        if kind == "cdef_idx":
            return int(rng.integers(0, 4))
        if kind == "coef":
            return random_coef_choice(rng, coef_p=coef_p, **kw)
        raise KeyError(kind)
    return decide


def test_globalmv_zero(tmp_path, oracle):
    """Whole inter frame is a zero-MV copy of the keyframe."""
    cfg = StreamConfig(width=64, height=64, qidx=80)
    run_inter_pair(tmp_path, oracle, cfg, random_decide(1),
                   inter_decide(1, modes=("GLOBALMV",), intra_p=0.0,
                                skip_p=1.0, split_p=0.0),
                   "globalzero")


def test_newmv_fullpel(tmp_path, oracle):
    """NEWMV with full-pel diffs (no subpel filtering yet)."""
    cfg = StreamConfig(width=64, height=64, qidx=80)
    run_inter_pair(tmp_path, oracle, cfg, random_decide(2),
                   inter_decide(2, modes=("NEWMV",), intra_p=0.0,
                                skip_p=1.0, split_p=0.0, fixed_mv=(16, -24)),
                   "newfullpel")


def test_newmv_subpel(tmp_path, oracle):
    """Random subpel MVs -> 8-tap filters, all three filter types."""
    for seed in range(4):
        cfg = StreamConfig(width=128, height=96, qidx=80, seed=seed)
        run_inter_pair(tmp_path, oracle, cfg, random_decide(seed),
                       inter_decide(seed, modes=("NEWMV",), intra_p=0.0,
                                    skip_p=1.0),
                       f"subpel{seed}")


def test_all_modes_mixed(tmp_path, oracle):
    """All inter modes + intra blocks + coefficients + var-tx trees."""
    for seed in range(6):
        cfg = StreamConfig(width=128, height=96, qidx=80, seed=seed)
        run_inter_pair(tmp_path, oracle, cfg, random_decide(seed),
                       inter_decide(seed), f"mixed{seed}")


def test_inter_coefs_qidx(tmp_path, oracle):
    """Inter txtp sets at several qidx categories."""
    for qidx in (20, 60, 120, 255):
        cfg = StreamConfig(width=64, height=64, qidx=qidx)
        run_inter_pair(tmp_path, oracle, cfg, random_decide(qidx),
                       inter_decide(qidx, skip_p=0.1, coef_p=0.8),
                       f"q{qidx}")


def test_odd_sizes_inter(tmp_path, oracle):
    for w, h in [(72, 36), (68, 68), (120, 56)]:
        cfg = StreamConfig(width=w, height=h, qidx=60)
        run_inter_pair(tmp_path, oracle, cfg, random_decide(w),
                       inter_decide(w + h), f"odd{w}x{h}")


def test_inter_with_deblock(tmp_path, oracle):
    cfg = StreamConfig(width=96, height=64, qidx=100,
                       lf_levels=(32, 32, 24, 20))
    run_inter_pair(tmp_path, oracle, cfg, random_decide(9),
                   inter_decide(9), "deblock")


def test_sub8x8_blocks(tmp_path, oracle):
    """4x4/4x8/8x4 inter blocks exercise the sub-8x8 chroma MC path."""
    for seed in range(3):
        cfg = StreamConfig(width=64, height=64, qidx=80, seed=seed)
        run_inter_pair(tmp_path, oracle, cfg, random_decide(seed),
                       inter_decide(seed + 100, split_p=0.6, intra_p=0.3),
                       f"sub8x8_{seed}")


def run_comp_pair(tmp_path, oracle, cfg, dk, di, name):
    import functools
    run = functools.partial(run_inter_pair, tmp_path, oracle, cfg, dk, di)
    # patch: make_inter_stream with comp=True
    global make_inter_stream
    from avgen import inter as inter_mod
    import subprocess
    from dav1d_tpu.decoder import Decoder
    from dav1d_tpu.containers import read_ivf

    stream = inter_mod.make_inter_stream(cfg, dk, di, comp=True)
    ivf = tmp_path / f"{name}.ivf"
    write_ivf(ivf, [stream], cfg.width, cfg.height)
    y4m = tmp_path / f"{name}_ref.y4m"
    r = subprocess.run([str(oracle), "-i", str(ivf), "-o", str(y4m), "-q"],
                       capture_output=True, text=True)
    assert r.returncode == 0, f"oracle rejected the stream: {r.stderr}"
    w, h, ref_frames = parse_y4m(y4m.read_bytes())
    assert len(ref_frames) == 2
    dec = Decoder()
    pics = []
    for tu, _ in read_ivf(ivf.read_bytes()):
        dec.send_data(tu)
        while (pic := dec.get_picture()) is not None:
            pics.append(pic)
    assert len(pics) == 2
    for i, (pic, ref) in enumerate(zip(pics, ref_frames)):
        for pl in range(3):
            assert pic.plane_bytes(pl) == ref[pl], \
                f"{name} frame {i} plane {pl} mismatch"


def test_compound_avg(tmp_path, oracle):
    """Compound AVG: bidirectional and unidirectional ref pairs, all
    compound inter modes."""
    for seed in range(4):
        cfg = StreamConfig(width=128, height=96, qidx=80, seed=seed)
        run_comp_pair(tmp_path, oracle, cfg, random_decide(seed),
                      inter_decide(seed + 50, comp_p=0.7), f"comp{seed}")


def test_compound_all_comp(tmp_path, oracle):
    """Every non-intra block compound."""
    cfg = StreamConfig(width=96, height=64, qidx=60,
                       lf_levels=(20, 20, 16, 12))
    run_comp_pair(tmp_path, oracle, cfg, random_decide(7),
                  inter_decide(77, comp_p=1.0, intra_p=0.1), "allcomp")


def test_cdef_inter(tmp_path, oracle):
    """CDEF on inter frames (noskip mask from inter/intra blocks)."""
    for i, cdef in enumerate([
            (3, 0, [(6 << 2 | 1, 3 << 2 | 2)]),
            (5, 2, [(9 << 2 | 3, 5 << 2 | 2), (0, 0),
                    (2 << 2 | 0, 0 << 2 | 3), (15 << 2 | 2, 8 << 2 | 1)]),
    ]):
        cfg = StreamConfig(width=128, height=96, qidx=100, seed=i,
                           cdef=cdef, lf_levels=(16, 16, 10, 10))
        run_inter_pair(tmp_path, oracle, cfg, random_decide(i),
                       inter_decide(i + 30, skip_p=0.5), f"cdefinter{i}")
