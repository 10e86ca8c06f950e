"""Pallas deblock band kernels vs the XLA gather tier: identical
planes on randomized tx-tiling edge geometry (interpret mode on the
CPU backend; the real-TPU path is exercised by the device chain +
kernel_bench).

The generator emits edges the way the bitstream geometry does
(recon/lf.py mask_edges_*): transform blocks tile each 32px
superblock, edges sit at block boundaries with width class
1 + min(cap, min(adjacent tx logs)) -- which guarantees the spacing
invariant the whole-frame batch relies on (no edge reads another
edge's writes within a direction)."""

import numpy as np
import pytest

from dav1d_tpu.ops.pallas_lf import deblock_plane_pallas, supported

pytestmark = pytest.mark.skipif(not supported(), reason="pallas absent")


def _gen_edges(rng, ph, pw, cap):
    """Random per-superblock tx tiling -> {(y4, x4): class} per
    direction (vertical, horizontal)."""
    H4, W4 = ph // 4, pw // 4
    SB = 8  # 4px cells per 32px superblock
    nsy, nsx = -(-H4 // SB), -(-W4 // SB)
    tw = rng.integers(0, 4, (nsy, nsx))  # log2(tx_w / 4)
    th = rng.integers(0, 4, (nsy, nsx))
    twc = np.repeat(np.repeat(tw, SB, 0), SB, 1)[:H4, :W4]
    thc = np.repeat(np.repeat(th, SB, 0), SB, 1)[:H4, :W4]
    v, h = {}, {}
    for y4 in range(H4):
        for x4 in range(1, W4):
            t = int(twc[y4, x4])
            if x4 % (1 << t) == 0:  # a tx block starts here
                v[(y4, x4)] = 1 + min(cap, int(twc[y4, x4 - 1]), t)
    for y4 in range(1, H4):
        for x4 in range(W4):
            t = int(thc[y4, x4])
            if y4 % (1 << t) == 0:
                h[(y4, x4)] = 1 + min(cap, int(thc[y4 - 1, x4]), t)
    return v, h


def _edge_lists(rng, ed, e_lut, i_lut):
    if not ed:
        return None
    ys = np.array([k[0] for k in ed], np.int64)
    xs = np.array([k[1] for k in ed], np.int64)
    cls = np.array(list(ed.values()), np.int64)
    L = rng.integers(1, 64, ys.size)
    return ys, xs, e_lut[L].astype(np.int64), i_lut[L].astype(np.int64), \
        (L >> 4).astype(np.int64), cls


@pytest.mark.parametrize("luma", [True, False])
@pytest.mark.parametrize("bitdepth", [8, 10])
@pytest.mark.parametrize("ph,pw,sharp", [(96, 160, 0), (92, 156, 4)])
def test_matches_xla_tier(luma, bitdepth, ph, pw, sharp):
    import jax.numpy as jnp

    from dav1d_tpu.ops.lf import loop_filter_batch
    from dav1d_tpu.recon.lf import calc_eih

    rng = np.random.default_rng(7 * bitdepth + ph + luma)
    hi = (1 << bitdepth) - 1
    plane = rng.integers(0, hi + 1, (ph, pw)).astype(np.int32)
    cap = 2 if luma else 1
    wd_map = {1: 4, 2: 8, 3: 16} if luma else {1: 4, 2: 6}
    e_lut, i_lut = calc_eih(sharp)
    ed_v, ed_h = _gen_edges(rng, ph, pw, cap)
    lv = _edge_lists(rng, ed_v, e_lut, i_lut)
    lh = _edge_lists(rng, ed_h, e_lut, i_lut)

    # XLA gather tier, class-sequential (exact under the spacing
    # invariant), vertical pass then horizontal
    dev = jnp.asarray(plane)
    for dir_, lst in ((0, lv), (1, lh)):
        if lst is None:
            continue
        ys, xs, E, I, H, cls = lst
        for c, wd_px in wd_map.items():
            sel = cls == c
            if not sel.any():
                continue
            dev = loop_filter_batch(dev, ys[sel] * 4, xs[sel] * 4,
                                    E[sel], I[sel], H[sel], dir_ == 0,
                                    wd_px, bitdepth)
    ref = np.asarray(dev)

    got = np.asarray(deblock_plane_pallas(
        jnp.asarray(plane), lv, lh, bitdepth, luma, interpret=True))
    assert np.array_equal(ref, got), (
        f"mismatch at {np.argwhere(ref != got)[:6]}")


def test_device_chain_e2e_pallas(tmp_path):
    """Real libaom stream through the forced-device pipeline with the
    Pallas deblock AND resident-CDEF tiers forced on (interpret mode
    on this CPU backend): bytes must match the host tier, which
    test_e2e_aom pins to the reference oracle."""
    import os
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "tools"))
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets
    from test_device_e2e import _decode_md5

    from dav1d_tpu.dispatch import use_device

    enc = AomEncoder(width=128, height=96, usage="good",
                     kf_max_dist=9999, cpu_used=4, q=50)
    pkts = enc.encode(gradient_frames(4, 128, 96))
    enc.close()
    ivf = tmp_path / "lf.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)
    data = ivf.read_bytes()

    saved = {k: os.environ.get(k)
             for k in ("DAV1D_TPU_DEVICE", "DAV1D_TPU_LF_PALLAS",
                       "DAV1D_TPU_CDEF_PALLAS", "DAV1D_TPU_MC_PALLAS")}
    try:
        os.environ["DAV1D_TPU_DEVICE"] = "0"
        use_device.cache_clear()
        n_host, md5_host = _decode_md5(data)
        os.environ["DAV1D_TPU_DEVICE"] = "1"
        os.environ["DAV1D_TPU_LF_PALLAS"] = "1"
        os.environ["DAV1D_TPU_CDEF_PALLAS"] = "1"
        # MC: covers the stacked-resident-ref geometry (the Pallas
        # kernel itself can't compile on this backend; the sticky XLA
        # fallback runs the same stacked program inputs)
        os.environ["DAV1D_TPU_MC_PALLAS"] = "1"
        use_device.cache_clear()
        n_dev, md5_dev = _decode_md5(data)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        use_device.cache_clear()

    assert n_host == 4 == n_dev
    assert md5_dev == md5_host, "pallas deblock chain diverges"


@pytest.mark.parametrize("v_only", [True, False])
def test_single_direction(v_only):
    import jax.numpy as jnp

    from dav1d_tpu.ops.lf import loop_filter_batch
    from dav1d_tpu.recon.lf import calc_eih

    rng = np.random.default_rng(11 + v_only)
    ph, pw = 64, 128
    plane = rng.integers(0, 256, (ph, pw)).astype(np.int32)
    e_lut, i_lut = calc_eih(0)
    ed_v, ed_h = _gen_edges(rng, ph, pw, 2)
    lst = _edge_lists(rng, ed_v if v_only else ed_h, e_lut, i_lut)

    dev = jnp.asarray(plane)
    ys, xs, E, I, H, cls = lst
    for c, wd_px in {1: 4, 2: 8, 3: 16}.items():
        sel = cls == c
        if sel.any():
            dev = loop_filter_batch(dev, ys[sel] * 4, xs[sel] * 4,
                                    E[sel], I[sel], H[sel], v_only,
                                    wd_px, 8)
    ref = np.asarray(dev)
    got = np.asarray(deblock_plane_pallas(
        jnp.asarray(plane), lst if v_only else None,
        None if v_only else lst, 8, True, interpret=True))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("sparse", [False, True])
def test_wide_plane_column_tiles(sparse):
    """4K-class widths (r5): Wp > 2048 takes the column-tiled 32-row
    horizontal pass (ops/pallas_lf._col_tile) — nct > 1, padded WH >
    pw — plus band/tile culling.  sparse=True leaves whole column
    tiles and row bands edge-free to exercise the flag==0 copy path."""
    import jax.numpy as jnp

    from dav1d_tpu.ops.lf import loop_filter_batch
    from dav1d_tpu.recon.lf import calc_eih

    bitdepth = 8
    ph, pw = 64, 2176  # Wp=2176 -> CT=1024, WH=3072, nct=3
    luma = True
    rng = np.random.default_rng(11 + sparse)
    plane = rng.integers(0, 256, (ph, pw)).astype(np.int32)
    wd_map = {1: 4, 2: 8, 3: 16}
    e_lut, i_lut = calc_eih(0)
    ed_v, ed_h = _gen_edges(rng, ph, pw, 2)
    if sparse:
        # keep only edges in the first 256 px columns and top 32 rows:
        # tiles (·, j>0) and band 1 must cull
        ed_v = {k: v for k, v in ed_v.items() if k[1] < 64 and k[0] < 8}
        ed_h = {k: v for k, v in ed_h.items() if k[1] < 64 and k[0] < 8}
    lv = _edge_lists(rng, ed_v, e_lut, i_lut)
    lh = _edge_lists(rng, ed_h, e_lut, i_lut)

    dev = jnp.asarray(plane)
    for dir_, lst in ((0, lv), (1, lh)):
        if lst is None:
            continue
        ys, xs, E, I, H, cls = lst
        for c, wd_px in wd_map.items():
            sel = cls == c
            if not sel.any():
                continue
            dev = loop_filter_batch(dev, ys[sel] * 4, xs[sel] * 4,
                                    E[sel], I[sel], H[sel], dir_ == 0,
                                    wd_px, bitdepth)
    ref = np.asarray(dev)

    got = np.asarray(deblock_plane_pallas(
        jnp.asarray(plane), lv, lh, bitdepth, luma, interpret=True))
    assert np.array_equal(ref, got), (
        f"mismatch at {np.argwhere(ref != got)[:6]}")
