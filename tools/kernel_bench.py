"""Per-kernel benchmark harness — the checkasm `--bench` analog
(reference tests/meson.build:95-97, tests/checkasm/*.c bench_new).

Times every kernel family's host tier (numpy / native C) against its
device tier (XLA / Pallas) across representative sizes on the current
backend, and prints a table with the measured winner.  Use this to
validate dav1d_tpu/dispatch.py's policy on a given machine:

    python tools/kernel_bench.py            # all families
    python tools/kernel_bench.py itx cdef   # a subset

Timing excludes compilation (one warm-up call per program); device
results include host<->device transfer, because that is what the decoder
pays per dispatch.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _time(fn, reps=5):
    fn()  # warm (compile / cache)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms


def _row(name, host_ms, dev_ms):
    win = "host" if host_ms <= dev_ms else "DEVICE"
    print(f"{name:<42} {host_ms:>9.3f} {dev_ms:>9.3f}   {win}")


def bench_itx():
    from dav1d_tpu.ops.itx import (itx_batch, itx_batch_c, itx_batch_np,
                                   _txinfo)

    rng = np.random.default_rng(0)
    print("\n-- itx (batched inverse transform), ms per call --")
    print(f"{'kernel/shape':<42} {'host':>9} {'device':>9}")
    for tx, txtp, B in [(0, 0, 512), (1, 0, 512), (2, 0, 128),
                        (3, 0, 32), (4, 0, 8), (5, 4, 256), (9, 1, 128),
                        (0, 9, 512), (1, 9, 256)]:
        w, h, _, _ = _txinfo(tx)
        sw, sh = min(w, 32), min(h, 32)
        cf = rng.integers(-2000, 2000, (B, sw * sh), dtype=np.int32)
        # host tier = the native C batch the decoder dispatches to
        # (numpy fallback when the native lib is unavailable)
        if itx_batch_c(cf[:1], tx, txtp, 8) is not None:
            host = _time(lambda: itx_batch_c(cf, tx, txtp, 8))
        else:
            host = _time(lambda: itx_batch_np(cf, tx, txtp, 8))
        dev = _time(lambda: np.asarray(itx_batch(cf, tx, txtp, 8)))
        _row(f"itx {w}x{h} txtp={txtp} B={B}", host, dev)

    # Pallas tier (TPU backends only; interpret mode is not a perf path)
    from dav1d_tpu.dispatch import _platform
    from dav1d_tpu.ops.pallas_itx import itx_batch_pallas, supported
    if supported(8) and _platform() not in ("cpu", "none"):
        for tx, txtp, B in [(0, 0, 512), (1, 0, 512), (5, 4, 256)]:
            w, h, _, _ = _txinfo(tx)
            sw, sh = min(w, 32), min(h, 32)
            cf = rng.integers(-2000, 2000, (B, sw * sh), dtype=np.int32)
            host = _time(lambda: itx_batch_c(cf, tx, txtp, 8))
            dev = _time(lambda: itx_batch_pallas(cf, tx, txtp, 8))
            _row(f"itx-pallas {w}x{h} txtp={txtp} B={B}", host, dev)


def bench_cdef():
    from dav1d_tpu.recon import cdef as hcdef
    from dav1d_tpu.ops import cdef as dcdef

    rng = np.random.default_rng(1)
    print("\n-- cdef, ms per call --")
    print(f"{'kernel/shape':<42} {'host':>9} {'device':>9}")
    for B in (64, 512, 2048):
        blk = rng.integers(0, 256, (B, 8, 8), dtype=np.int64)
        host = _time(lambda: hcdef.cdef_find_dir_batch(blk, 8))
        dev = _time(lambda: [np.asarray(x) for x in
                             dcdef.cdef_find_dir_batch(blk, 8)])
        _row(f"cdef_dir 8x8 B={B}", host, dev)
    ph, pw = 1080, 1920
    canvas = rng.integers(0, 256, (ph + 4, pw + 4), dtype=np.int64) \
        .astype(np.int64)
    for B in (512, 2048):
        ys = rng.integers(2, ph - 10, B).astype(np.int64)
        xs = rng.integers(2, pw - 10, B).astype(np.int64)
        pri = np.full(B, 8, dtype=np.int64)
        sec = np.full(B, 2, dtype=np.int64)
        dirs = rng.integers(0, 8, B).astype(np.int64)
        host = _time(lambda: hcdef.cdef_filter_batch(
            canvas, ys, xs, 8, 8, pri, sec, dirs, 5, 8))
        dev = _time(lambda: dcdef.cdef_filter_batch(
            canvas, ys, xs, 8, 8, pri, sec, dirs, 5, 8))
        _row(f"cdef_filter 8x8 B={B} (1080p canvas)", host, dev)


def bench_mc():
    from dav1d_tpu.recon import mc_np
    from dav1d_tpu.ops import mc as dmc
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    print("\n-- mc put_8tap, ms per call --")
    print(f"{'kernel/shape':<42} {'host':>9} {'device':>9}")
    for w, h, B in [(8, 8, 256), (16, 16, 128), (32, 32, 32)]:
        win = rng.integers(0, 256, (B, h + 7, w + 7), dtype=np.int64)
        jwin = jnp.asarray(win, dtype=jnp.int32)

        def host():
            for b in range(B):
                mc_np.put_8tap(win[b], w + 7, h + 7, 0, 0, w, h, 5, 9,
                               0, 8)

        dev = _time(lambda: np.asarray(
            dmc.put_8tap(jwin, mx=5, my=9, filter_type=0, bitdepth=8)))
        _row(f"put_8tap {w}x{h} B={B}", _time(host), dev)


def bench_deblock():
    from dav1d_tpu.native import lib as nat
    from dav1d_tpu.recon.lf import _loop_filter_batch, calc_eih
    import ctypes

    rng = np.random.default_rng(3)
    print("\n-- deblock edge apply, ms per call --")
    print(f"{'kernel/shape':<42} {'host(np)':>9} {'native':>9}")
    plane = rng.integers(0, 256, (1088, 1920), dtype=np.int32)
    e_lut, i_lut = calc_eih(0)
    N = 4096
    ys = (rng.integers(1, 270, N) * 4).astype(np.int64)
    xs = (rng.integers(1, 478, N) * 4).astype(np.int64)
    L = rng.integers(1, 63, N)
    E, I, H = e_lut[L].astype(np.int64), i_lut[L].astype(np.int64), L >> 4
    host = _time(lambda: _loop_filter_batch(
        plane.copy(), ys, xs, E, I, H, True, 8, 8))
    if nat is not None:
        # whole-plane native walk (the decoder's host tier): per-cell
        # width-class plane + level plane, same edges as above
        n_rows, n_cols = 272, 480
        wd = np.zeros((n_rows, n_cols), dtype=np.uint8)
        lvl = np.zeros((n_rows, n_cols, 4), dtype=np.uint8)
        wd[(ys // 4), (xs // 4)] = 2
        lvl[(ys // 4), (xs // 4), 0] = L.astype(np.uint8)

        def native():
            p = plane.copy()
            nat.dtpu_lf_filter_plane(
                p.ctypes.data, p.shape[1], wd.ctypes.data, n_cols,
                lvl.ctypes.data, n_cols * 4, 0, n_rows, n_cols,
                e_lut.ctypes.data, i_lut.ctypes.data, 0, 0, 8)

        natms = _time(native)
    else:
        natms = float("nan")
    _row(f"deblock wd8 vertical N={N} (1080p)", host, natms)


def bench_lr():
    from dav1d_tpu.ops.lr import wiener_batch
    from dav1d_tpu.recon.lr_apply import _wiener

    rng = np.random.default_rng(5)
    print("\n-- loop restoration (wiener), ms per call --")
    print(f"{'kernel/shape':<42} {'host':>9} {'device':>9}")
    for uw, sh, B in [(64, 64, 32), (128, 64, 16), (64, 16, 64)]:
        P = rng.integers(0, 256, (B, sh + 6, uw + 6), dtype=np.int64)
        fh = rng.integers(-5, 6, (B, 3))
        fv = rng.integers(-5, 6, (B, 3))

        def host():
            for b in range(B):
                _wiener(P[b], list(fh[b]), list(fv[b]), uw, sh, 8)

        dev = _time(lambda: wiener_batch(P, fh, fv, 8))
        _row(f"wiener {uw}x{sh} B={B}", _time(host), dev)


def bench_fg():
    from dav1d_tpu.ops.fg import fg_apply_batch
    from dav1d_tpu.recon.filmgrain import _round2_arr

    rng = np.random.default_rng(6)
    print("\n-- film grain apply, ms per call --")
    print(f"{'kernel/shape':<42} {'host':>9} {'device':>9}")
    for h, w in [(1080, 1920), (544, 960)]:
        src = rng.integers(0, 256, (h, w), dtype=np.int64)
        grain = rng.integers(-128, 128, (h, w), dtype=np.int64)
        lut = rng.integers(0, 256, 256, dtype=np.int64)

        def host():
            noise = _round2_arr(lut[src] * grain, 8)
            np.clip(src + noise, 0, 255)

        dev = _time(lambda: fg_apply_batch(src, grain, lut, 8, 0, 255))
        _row(f"fg_apply {w}x{h}", _time(host), dev)

    # whole-plane native grain pass (LUT sample + overlap blend + scale
    # + apply in one walk — what the decoder's host tier runs)
    from dav1d_tpu.native import lib as nat
    if nat is not None:
        import ctypes

        from dav1d_tpu.headers import FilmGrainData
        from dav1d_tpu.recon.filmgrain import (GRAIN_HEIGHT, GRAIN_WIDTH,
                                               _fg_cdata)

        d = FilmGrainData()
        d.seed = 7
        d.num_y_points = 4
        d.y_points = [(0, 64), (64, 128), (128, 192), (255, 64)]
        d.scaling_shift = 8
        d.ar_coeff_lag = 2
        d.ar_coeffs_y = rng.integers(-64, 64, 12).tolist()
        d.ar_coeffs_uv = [rng.integers(-64, 64, 13).tolist()
                          for _ in range(2)]
        d.ar_coeff_shift = 7
        d.overlap_flag = 1
        c = _fg_cdata(d)
        from dav1d_tpu import tables
        gauss = np.ascontiguousarray(tables.gaussian_sequence,
                                     dtype=np.int16)
        lut_y = np.zeros((GRAIN_HEIGHT + 1) * GRAIN_WIDTH, dtype=np.int32)
        nat.dtpu_fg_gen_y(ctypes.byref(c), gauss.ctypes.data, 8,
                          lut_y.ctypes.data)
        sc = np.zeros(256, dtype=np.int32)
        pts = np.asarray(d.y_points, dtype=np.uint8).reshape(-1)
        nat.dtpu_fg_scaling(8, pts.ctypes.data, 4, sc.ctypes.data)
        for h, w in [(1080, 1920), (2160, 3840)]:
            plane = np.ascontiguousarray(
                rng.integers(0, 256, (h, w)), dtype=np.int32)
            host = _time(lambda: nat.dtpu_fg_apply_plane(
                plane.ctypes.data, w, None, 0, w, 0, w, h, 0, 0,
                lut_y.ctypes.data, sc.ctypes.data, ctypes.byref(c), 8, 0))
            _row(f"fg_plane(native) {w}x{h}", host, float("inf"))


def bench_ipred():
    from dav1d_tpu.levels import IntraPredMode as M
    from dav1d_tpu.ops.ipred import ipred_batch
    from dav1d_tpu.recon.ipred import ipred

    rng = np.random.default_rng(8)
    print("\n-- intra prediction (batched over same-key blocks), "
          "ms per call --")
    print(f"{'kernel/shape':<42} {'host':>9} {'device':>9}")
    for mode, w, h, angle, label in [
            (int(M.DC_PRED), 16, 16, 0, "dc 16x16"),
            (int(M.SMOOTH_PRED), 16, 16, 0, "smooth 16x16"),
            (int(M.PAETH_PRED), 8, 8, 0, "paeth 8x8"),
            (int(M.Z1_PRED), 16, 16, 1024 + 45, "z1 16x16 a=45"),
            (int(M.Z2_PRED), 16, 16, 1024 + 135, "z2 16x16 a=135"),
            (int(M.FILTER_PRED), 32, 32, 2, "filter 32x32")]:
        B = 256
        edges = rng.integers(0, 256, (B, 257), dtype=np.int32)

        def host():
            for e in edges:
                ipred(mode, e, 128, w, h, angle, w, h, 8)

        dev = _time(lambda: np.asarray(
            ipred_batch(mode, edges, w, h, angle, w, h, 8)))
        _row(f"ipred {label} B={B}", _time(host), dev)


def bench_resize():
    from dav1d_tpu.ops.resize import resize_rows
    from dav1d_tpu.recon.mc_np import resize_row

    rng = np.random.default_rng(7)
    print("\n-- super-res resample (horizontal upscale), ms per call --")
    print(f"{'kernel/shape':<42} {'host':>9} {'device':>9}")
    for h, in_w, out_w in [(1080, 960, 1920), (2160, 1920, 3840),
                           (1080, 1440, 1920)]:
        src_w = (in_w + 127) & ~127
        rows = rng.integers(0, 256, (h, src_w), dtype=np.int32)
        step = ((in_w << 14) + (out_w >> 1)) // out_w
        host = _time(lambda: resize_row(rows, out_w, src_w, step, 128, 8))
        dev = _time(lambda: np.asarray(
            resize_rows(rows, out_w, src_w, step, 128, 8)))
        _row(f"resize {in_w}->{out_w} x{h}", host, dev)


FAMILIES = {"itx": bench_itx, "cdef": bench_cdef, "mc": bench_mc,
            "deblock": bench_deblock, "lr": bench_lr, "fg": bench_fg,
            "resize": bench_resize, "ipred": bench_ipred}


def main():
    import jax

    names = [a for a in sys.argv[1:] if a in FAMILIES] or list(FAMILIES)
    print(f"backend: {jax.devices()[0].platform} "
          f"({len(jax.devices())} device(s))")
    for n in names:
        FAMILIES[n]()


if __name__ == "__main__":
    main()
