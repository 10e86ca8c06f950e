"""Device intra-prediction kernel parity (ops/ipred.py) vs the numpy
golden model (recon/ipred.py ipred_np), per mode/size/angle/bitdepth —
the checkasm ipred suite analog (reference tests/checkasm/ipred.c)."""

import numpy as np
import pytest

from dav1d_tpu.levels import IntraPredMode as M
from dav1d_tpu.recon.ipred import cfl_pred, ipred_np, pal_pred

OFS = 128
SIZES = [(4, 4), (8, 4), (4, 16), (16, 16), (32, 8), (16, 64), (64, 64)]


def _edges(rng, n, bd):
    return rng.integers(0, 1 << bd, size=(n, 257), dtype=np.int32)


def _golden(mode, edges, w, h, angle, max_w, max_h, bd):
    return np.stack([
        ipred_np(mode, e, OFS, w, h, angle, max_w, max_h, bd)
        for e in edges])


def _check(mode, w, h, angle=0, max_w=0, max_h=0, bd=8, n=5, seed=0):
    from dav1d_tpu.ops.ipred import ipred_batch

    rng = np.random.default_rng(seed + w * 1000 + h + bd)
    edges = _edges(rng, n, bd)
    want = _golden(mode, edges, w, h, angle, max_w, max_h, bd)
    got = np.asarray(ipred_batch(mode, edges, w, h, angle, max_w, max_h,
                                 bd))
    np.testing.assert_array_equal(got, want,
                                  err_msg=f"mode={mode} {w}x{h} a={angle}")


@pytest.mark.parametrize("w,h", SIZES)
@pytest.mark.parametrize("mode", [M.DC_PRED, M.TOP_DC_PRED,
                                  M.LEFT_DC_PRED, M.DC_128_PRED,
                                  M.VERT_PRED, M.HOR_PRED, M.PAETH_PRED,
                                  M.SMOOTH_PRED, M.SMOOTH_V_PRED,
                                  M.SMOOTH_H_PRED])
def test_simple_modes(mode, w, h):
    _check(int(mode), w, h, bd=8)
    _check(int(mode), w, h, bd=10, seed=7)


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 8), (8, 32),
                                 (64, 16)])
@pytest.mark.parametrize("angle", [3, 23, 45, 64, 87])
@pytest.mark.parametrize("flags", [0, 512, 1024, 1536])
def test_z1(w, h, angle, flags):
    _check(int(M.Z1_PRED), w, h, angle | flags, bd=8)


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 8), (8, 32),
                                 (64, 16)])
@pytest.mark.parametrize("angle", [93, 113, 135, 157, 177])
@pytest.mark.parametrize("flags", [0, 1024, 1536])
def test_z2(w, h, angle, flags):
    _check(int(M.Z2_PRED), w, h, angle | flags, max_w=w, max_h=h, bd=8)
    # partial-availability limits (edge beyond max_w/max_h unfiltered)
    _check(int(M.Z2_PRED), w, h, angle | flags,
           max_w=max(4, w // 2), max_h=max(4, h // 2), bd=10, seed=3)


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 8), (8, 32),
                                 (64, 16)])
@pytest.mark.parametrize("angle", [183, 203, 225, 247, 267])
@pytest.mark.parametrize("flags", [0, 512, 1024, 1536])
def test_z3(w, h, angle, flags):
    _check(int(M.Z3_PRED), w, h, angle | flags, bd=8)


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (32, 8), (16, 32),
                                 (32, 32)])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_filter_pred(w, h, filt):
    _check(int(M.FILTER_PRED), w, h, filt, bd=8)
    _check(int(M.FILTER_PRED), w, h, filt, bd=12, seed=11)


@pytest.mark.parametrize("w,h", [(4, 4), (8, 16), (16, 8), (32, 32)])
@pytest.mark.parametrize("mode", [M.DC_PRED, M.TOP_DC_PRED,
                                  M.LEFT_DC_PRED, M.DC_128_PRED])
def test_cfl_pred(mode, w, h):
    from dav1d_tpu.ops.ipred import cfl_pred_batch

    for bd in (8, 10):
        rng = np.random.default_rng(w * 31 + h + bd)
        n = 4
        edges = _edges(rng, n, bd)
        ac = rng.integers(-(1 << 13), 1 << 13, size=(n, h, w),
                          dtype=np.int32)
        alpha = rng.integers(-16, 17, size=n, dtype=np.int32)
        want = np.stack([
            cfl_pred(int(mode), edges[i], OFS, w, h, ac[i], int(alpha[i]),
                     bd) for i in range(n)])
        got = np.asarray(cfl_pred_batch(int(mode), edges, w, h, ac, alpha,
                                        bd))
        np.testing.assert_array_equal(got, want)


def test_pal_pred():
    from dav1d_tpu.ops.ipred import pal_pred_batch

    rng = np.random.default_rng(5)
    n, w, h = 6, 16, 8
    pal = rng.integers(0, 1024, size=(n, 8), dtype=np.int32)
    idx = rng.integers(0, 8, size=(n, h, w), dtype=np.int32)
    want = np.stack([pal_pred(pal[i], idx[i], w, h) for i in range(n)])
    got = np.asarray(pal_pred_batch(pal, idx, w, h))
    np.testing.assert_array_equal(got, want)


def test_runtime_angular_matches_static():
    """_build_rt (per-unit angle/flags/max_wh) == _build (static key)
    across the legal angle sweep, both flag bits, and Z2 clamp
    values — the parity that lets device_intra collapse its program
    key to (mode, w, h)."""
    import numpy as np

    from dav1d_tpu.levels import IntraPredMode as M
    from dav1d_tpu.ops.ipred import _build, _build_rt

    rng = np.random.default_rng(21)
    cases = []
    for mode, arange in ((M.Z1_PRED, range(3, 88, 3)),
                         (M.Z2_PRED, range(93, 178, 3)),
                         (M.Z3_PRED, range(183, 268, 3))):
        for sm in (0, 1):
            for en in (0, 1):
                for a in arange:
                    cases.append((mode, a | (sm << 9) | (en << 10)))
    for w, h, bitdepth in ((4, 4, 8), (8, 4, 8), (16, 8, 10),
                           (8, 32, 8)):
        import jax.numpy as jnp

        sel = [cases[i] for i in
               rng.choice(len(cases), 60, replace=False)]
        prm = np.zeros((len(sel), 3), np.int32)
        edges = rng.integers(0, 1 << bitdepth,
                             (len(sel), 257)).astype(np.int32)
        for i, (mode, akey) in enumerate(sel):
            prm[i] = (akey,
                      rng.integers(1, w + 1) if mode == M.Z2_PRED else 0,
                      rng.integers(1, h + 1) if mode == M.Z2_PRED else 0)
        for mode in (M.Z1_PRED, M.Z2_PRED, M.Z3_PRED):
            idx = [i for i, (m, _) in enumerate(sel) if m == mode]
            if not idx:
                continue
            rt = _build_rt(mode, w, h, bitdepth)
            got = np.asarray(rt(jnp.asarray(edges[idx]),
                                jnp.asarray(prm[idx])))
            for k, i in enumerate(idx):
                st = _build(mode, w, h, int(prm[i, 0]),
                            int(prm[i, 1]), int(prm[i, 2]), bitdepth)
                want = np.asarray(st(jnp.asarray(edges[i : i + 1])))
                assert np.array_equal(want[0], got[k]), (
                    mode, w, h, prm[i])


def test_runtime_filter_matches_static():
    import numpy as np

    from dav1d_tpu.levels import IntraPredMode as M
    from dav1d_tpu.ops.ipred import _build, _build_rt

    import jax.numpy as jnp

    rng = np.random.default_rng(22)
    for w, h in ((4, 4), (8, 8), (16, 8), (4, 8)):
        edges = rng.integers(0, 256, (5, 257)).astype(np.int32)
        prm = np.zeros((5, 3), np.int32)
        prm[:, 0] = np.arange(5)
        rt = _build_rt(M.FILTER_PRED, w, h, 8)
        got = np.asarray(rt(jnp.asarray(edges), jnp.asarray(prm)))
        for i in range(5):
            st = _build(M.FILTER_PRED, w, h, i, 0, 0, 8)
            want = np.asarray(st(jnp.asarray(edges[i : i + 1])))
            assert np.array_equal(want[0], got[i]), (w, h, i)
