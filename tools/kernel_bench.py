"""Per-kernel benchmark harness — the checkasm `--bench` analog
(reference tests/meson.build:95-97, tests/checkasm/*.c bench_new).

Times every kernel family across representative sizes on the current
backend, in three tiers:

- host:        numpy / native C (what the host dispatch tier runs)
- dev e2e:     device call including host<->device transfer of inputs
               and outputs — what a per-dispatch offload pays
- dev compute: device call on RESIDENT inputs, K dispatches pipelined
               and synced once — the on-chip kernel time a locally
               attached chip (or the device-resident frame loop) pays.
               This is the number that answers the reference's asm
               tiers; `dev e2e` on this harness is dominated by a
               network tunnel (~80 ms/MB) and measures the transport,
               not the kernel.

Use this to validate dav1d_tpu/dispatch.py's policy on a given machine:

    python tools/kernel_bench.py                   # all families
    python tools/kernel_bench.py itx cdef          # a subset
    python tools/kernel_bench.py --json OUT.json   # persist artifact

Timing excludes compilation (one warm-up call per program).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS: list[dict] = []

# extra fused in-graph iterations for the slope measurement (see
# _time_compute): per-kernel time = (t(8+N) - t(8)) / N
COMPUTE_REPS = 248

# DAV1D_TPU_KB_E2E=0 skips the dev-e2e column's timed transfers (the
# tunnel's multi-minute stalls can wedge a full run); the compute
# column is unaffected
import os  # noqa: E402

SKIP_E2E = os.environ.get("DAV1D_TPU_KB_E2E", "1") == "0"


def _time_e2e(fn, reps=5):
    if SKIP_E2E:
        return float("nan")
    return _time(fn, reps)


def _time(fn, reps=5):
    fn()  # warm (compile / cache)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms


def _time_compute(dispatch=None, reps=COMPUTE_REPS, prog=None, args=()):
    """On-chip kernel time.  prog/args delegates to devrt.time_program
    (fused in-graph repetition, two-point slope, value-fetch sync,
    adaptive iteration escalation — see its docstring).  dispatch: a
    fallback for callables that can't be traced under an outer jit —
    reps pipelined launches, one sync (includes dispatch overhead)."""
    import jax

    if prog is not None:
        from dav1d_tpu.devrt import time_program

        return time_program(prog, args, reps0=reps)

    jax.block_until_ready(dispatch())  # warm: compile + cache
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = dispatch()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3  # ms


def _put(*arrays):
    """device_put a tuple of numpy arrays (resident inputs)."""
    import jax

    out = tuple(jax.device_put(a) for a in arrays)
    jax.block_until_ready(out)
    return out if len(out) > 1 else out[0]


def _row(family, name, host_ms, dev_ms, dev_compute_ms=None, note=""):
    cols = [f"{name:<44}", f"{host_ms:>9.3f}", f"{dev_ms:>9.3f}"]
    if dev_compute_ms is not None:
        cols.append(f"{dev_compute_ms:>9.3f}")
        win = "host" if host_ms <= dev_compute_ms else "DEVICE"
    else:
        cols.append(f"{'-':>9}")
        win = "host" if host_ms <= dev_ms else "DEVICE"
    print(" ".join(cols) + f"   {win}")
    RESULTS.append(dict(family=family, kernel=name,
                        host_ms=round(host_ms, 4),
                        dev_e2e_ms=round(dev_ms, 4),
                        dev_compute_ms=(round(dev_compute_ms, 4)
                                        if dev_compute_ms is not None
                                        else None),
                        note=note))


def _hdr(title):
    print(f"\n-- {title}, ms per call --")
    print(f"{'kernel/shape':<44} {'host':>9} {'dev e2e':>9} "
          f"{'dev cmp':>9}")


def bench_itx():
    import jax.numpy as jnp

    from dav1d_tpu.ops.itx import (_jit_itx, itx_batch, itx_batch_c,
                                   itx_batch_np, _txinfo)

    rng = np.random.default_rng(0)
    _hdr("itx (batched inverse transform)")
    # every combo must be AV1-legal: ADST rows/cols exist only for
    # dims <= 16 (tx 9 is 16x32 — DCT/IDTX only)
    for tx, txtp, B in [(0, 0, 512), (1, 0, 512), (2, 0, 128),
                        (3, 0, 32), (4, 0, 8), (5, 4, 256), (2, 1, 128),
                        (9, 0, 128), (0, 9, 512), (1, 9, 256)]:
        w, h, _, _ = _txinfo(tx)
        sw, sh = min(w, 32), min(h, 32)
        cf = rng.integers(-2000, 2000, (B, sw * sh), dtype=np.int32)
        # host tier = the native C batch the decoder dispatches to
        # (numpy fallback when the native lib is unavailable)
        if itx_batch_c(cf[:1], tx, txtp, 8) is not None:
            host = _time(lambda: itx_batch_c(cf, tx, txtp, 8))
        else:
            host = _time(lambda: itx_batch_np(cf, tx, txtp, 8))
        dev = _time_e2e(lambda: np.asarray(itx_batch(cf, tx, txtp, 8)))
        prog = _jit_itx(tx, txtp, 8)
        rcf = _put(cf.astype(np.int16))
        cmp_ms = _time_compute(prog=prog, args=(rcf,))
        _row("itx", f"itx {w}x{h} txtp={txtp} B={B}", host, dev, cmp_ms)

    # Pallas tier (TPU backends only; interpret mode is not a perf path)
    from dav1d_tpu.dispatch import _platform
    from dav1d_tpu.ops.pallas_itx import itx_batch_pallas, supported
    if supported(8) and _platform() not in ("cpu", "none"):
        from dav1d_tpu.ops import pallas_itx
        for tx, txtp, B in [(0, 0, 512), (1, 0, 512), (5, 4, 256)]:
            w, h, _, _ = _txinfo(tx)
            sw, sh = min(w, 32), min(h, 32)
            cf = rng.integers(-2000, 2000, (B, sw * sh), dtype=np.int32)
            host = _time(lambda: itx_batch_c(cf, tx, txtp, 8))
            dev = _time_e2e(
                lambda: np.asarray(itx_batch_pallas(cf, tx, txtp, 8)))
            # raw pallas program on a resident pre-padded batch (the
            # wrapper's numpy padding can't trace under the fused timer)
            bb = pallas_itx._block_b(tx)
            nb = bb * (1 << (max(1, -(-B // bb)) - 1).bit_length())
            cfp = np.zeros((nb, sw * sh), np.int32)
            cfp[:B] = cf
            prog = pallas_itx._build(tx, txtp, 8, nb, False)
            rcf = _put(cfp)
            cmp_ms = _time_compute(prog=prog, args=(rcf,))
            _row("itx", f"itx-pallas {w}x{h} txtp={txtp} B={B}", host,
                 dev, cmp_ms)


def bench_cdef():
    from dav1d_tpu.recon import cdef as hcdef
    from dav1d_tpu.ops import cdef as dcdef

    rng = np.random.default_rng(1)
    _hdr("cdef")
    for B in (64, 512, 2048):
        blk = rng.integers(0, 256, (B, 8, 8), dtype=np.int64)
        host = _time(lambda: hcdef.cdef_find_dir_batch(blk, 8))
        dev = _time_e2e(lambda: [np.asarray(x) for x in
                                 dcdef.cdef_find_dir_batch(blk, 8)])
        rblk = _put(blk.astype(np.int32))
        prog = dcdef._jit_find_dir(8)
        cmp_ms = _time_compute(prog=prog, args=(rblk,))
        _row("cdef", f"cdef_dir 8x8 B={B}", host, dev, cmp_ms)
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
        dev = _time_e2e(lambda: dcdef.cdef_filter_batch(
            canvas, ys, xs, 8, 8, pri, sec, dirs, 5, 8))
        # compute-only: resident canvas + pre-padded per-unit vectors,
        # the shape the device-resident chain dispatches
        nb = dcdef._bucket(B)

        def pad(a, fill=0):
            out = np.full(nb, fill, dtype=np.int32)
            out[:B] = a
            return out

        rcv, rys, rxs, rpri, rsec, rdirs = _put(
            canvas.astype(np.int32), pad(ys, 1 << 24), pad(xs, 1 << 24),
            pad(pri), pad(sec), pad(dirs))
        prog = dcdef._jit_filter_plane(8, 8, ph + 4, pw + 4, 5, 8)
        cmp_ms = _time_compute(
            prog=prog, args=(rcv, rys, rxs, rpri, rsec, rdirs))
        _row("cdef", f"cdef_filter 8x8 B={B} (1080p canvas)", host, dev,
             cmp_ms)

    # Pallas band-kernel tier (stencil formulation; ops/pallas_cdef.py)
    from dav1d_tpu.dispatch import _platform
    from dav1d_tpu.ops import pallas_cdef
    if pallas_cdef.supported() and _platform() not in ("cpu", "none"):
        for B in (512, 2048):
            ys = rng.integers(2, ph - 10, B).astype(np.int64)
            xs = rng.integers(2, pw - 10, B).astype(np.int64)
            pri = np.full(B, 8, dtype=np.int64)
            sec = np.full(B, 2, dtype=np.int64)
            dirs = rng.integers(0, 8, B).astype(np.int64)
            pm, sm, dm = pallas_cdef._host_maps(
                ph + 4, pw + 4, 8, 8, ys, xs, pri, sec, dirs)
            rcv, rpm, rsm, rdm = _put(canvas.astype(np.int32), pm, sm,
                                      dm)
            prog = pallas_cdef._jit_plane(8, 8, ph + 4, pw + 4, 5, 8,
                                          False)
            cmp_ms = _time_compute(prog=prog, args=(rcv, rpm, rsm, rdm))
            _row("cdef", f"cdef_filter-pallas 8x8 B={B} (1080p canvas)",
                 float("nan"), float("nan"), cmp_ms)

    # gather-free whole-plane direction maps (the wired resident form)
    plane = rng.integers(0, 256, (1088, 1920), dtype=np.int64)
    rplane = _put(plane.astype(np.int32))
    prog = dcdef._jit_find_dir_maps(1088 // 8, 1920 // 8, 8)
    cmp_ms = _time_compute(prog=prog, args=(rplane,))
    _row("cdef", "cdef_dir maps 1080p (all 32640 units)",
         float("nan"), float("nan"), cmp_ms)


def bench_mc():
    from dav1d_tpu.recon import mc_np
    from dav1d_tpu.ops import mc as dmc
    from dav1d_tpu import tables

    rng = np.random.default_rng(2)
    _hdr("mc put_8tap (host col = python golden; the production host "
         "tier is the native replay)")
    filt = tables.mc_subpel_filters
    for w, h, B in [(8, 8, 256), (16, 16, 128), (32, 32, 32)]:
        win = rng.integers(0, 256, (B, h + 7, w + 7), dtype=np.int64)
        fh = np.broadcast_to(filt[0][5 - 1].astype(np.int32),
                             (B, 8)).copy()
        fv = np.broadcast_to(filt[0][9 - 1].astype(np.int32),
                             (B, 8)).copy()

        def host():
            for b in range(B):
                mc_np.put_8tap(win[b], w + 7, h + 7, 0, 0, w, h, 5, 9,
                               0, 8)

        dev = _time_e2e(lambda: np.asarray(dmc.put_8tap(
            np.asarray(win, dtype=np.int32), fh, fv, w=w, h=h,
            bitdepth=8)))
        rwin, rfh, rfv = _put(np.asarray(win, dtype=np.int32), fh, fv)
        cmp_ms = _time_compute(
            prog=lambda s, a, b: dmc._put_8tap_prog(s, a, b, w=w, h=h,
                                                    bitdepth=8),
            args=(rwin, rfh, rfv))
        _row("mc", f"put_8tap {w}x{h} B={B}", _time(host), dev, cmp_ms)

    # the wired device path: windows gathered on-chip from a resident
    # 1080p reference plane; only coords + filter rows cross the host
    ph, pw = 1088, 1920
    plane = rng.integers(0, 256, (ph, pw), dtype=np.int64)
    for w, h, B in [(8, 8, 1024), (16, 16, 512)]:
        dys = rng.integers(0, ph - h, B).astype(np.int32)
        dxs = rng.integers(0, pw - w, B).astype(np.int32)
        fh = np.broadcast_to(filt[0][5 - 1].astype(np.int32),
                             (B, 8)).copy()
        fv = np.broadcast_to(filt[0][9 - 1].astype(np.int32),
                             (B, 8)).copy()
        rpl, rdy, rdx, rfh, rfv = _put(
            plane.astype(np.int32), dys, dxs, fh, fv)
        cmp_ms = _time_compute(
            prog=lambda p, y, x, a, b: dmc._put_8tap_resident_prog(
                p, y, x, a, b, pw, ph, w=w, h=h, bitdepth=8),
            args=(rpl, rdy, rdx, rfh, rfv))
        _row("mc", f"put_8tap_resident {w}x{h} B={B} (1080p ref)",
             float("nan"), float("nan"), cmp_ms)

    # Pallas per-block-DMA window gather (interior fast path of the
    # resident tier — pipeline.py's emu_edge split): vs the XLA
    # clamped-gather row above
    from dav1d_tpu.ops import pallas_mc

    for w, h, B in [(8, 8, 1024), (4, 4, 1024), (16, 16, 256),
                    (8, 8, 4096)]:
        dys = rng.integers(3, ph - h - 4, B).astype(np.int32)
        dxs = rng.integers(3, pw - w - 4, B).astype(np.int32)
        fh = np.broadcast_to(filt[0][5 - 1].astype(np.int32),
                             (B, 8)).copy()
        fv = np.broadcast_to(filt[0][9 - 1].astype(np.int32),
                             (B, 8)).copy()
        rpl, rdy, rdx, rfh, rfv = _put(
            plane.astype(np.int32), dys, dxs, fh, fv)
        cmp_ms = _time_compute(
            prog=lambda p, y, x, a, b: pallas_mc._gather_put_prog(
                p, y, x, a, b, w=w, h=h, bitdepth=8),
            args=(rpl, rdy, rdx, rfh, rfv))
        _row("mc", f"pallas_gather_put {w}x{h} B={B} (1080p ref)",
             float("nan"), float("nan"), cmp_ms)


def bench_deblock():
    from dav1d_tpu.native import lib as nat
    from dav1d_tpu.recon.lf import _loop_filter_batch, calc_eih
    import ctypes

    rng = np.random.default_rng(3)
    _hdr("deblock edge apply (host np vs native C)")
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
    _row("deblock", f"deblock wd8 vertical N={N} (1080p)", host, natms,
         note="dev col = native C walk")

    # Pallas band-stencil whole-plane tier (ops/pallas_lf.py): both
    # directions of a dense 1080p edge population (8-px spacing, wd8)
    # in ONE program — the wired resident-chain form
    from dav1d_tpu.dispatch import _platform
    from dav1d_tpu.ops import pallas_lf
    if pallas_lf.supported() and _platform() not in ("cpu", "none"):
        n_rows, n_cols = 272, 480
        yy, xx = np.meshgrid(np.arange(n_rows),
                             np.arange(2, n_cols, 2), indexing="ij")
        vys, vxs = yy.ravel(), xx.ravel()
        yy, xx = np.meshgrid(np.arange(2, n_rows, 2),
                             np.arange(n_cols), indexing="ij")
        hys, hxs = yy.ravel(), xx.ravel()

        def pk_of(n):
            L = rng.integers(1, 64, n)
            return (e_lut[L].astype(np.int64)
                    | (i_lut[L].astype(np.int64) << 8)
                    | ((L >> 4).astype(np.int64) << 16)
                    | (np.int64(2) << 24)).astype(np.int32)

        # host-built cell maps (r5 API)
        Wp, OUTV, RV, OUTH, CT, WH, RH = pallas_lf._geom(1088, 1920, 8)
        vm = np.zeros((RV // 4, Wp // 4), np.int32)
        vm[vys, vxs] = pk_of(vys.size)
        hm = np.zeros((RH // 4, WH // 4), np.int32)
        hm[hys, hxs] = pk_of(hys.size)
        args = _put(plane.astype(np.int32), vm, hm)
        prog = pallas_lf._jit_plane(1088, 1920, pallas_lf.LUMA_CLASSES,
                                    8, 1, 1, False)
        cmp_ms = _time_compute(prog=prog, args=args)
        _row("deblock",
             f"pallas both-dir plane V={vys.size} H={hys.size} (1080p)",
             float("nan"), float("nan"), cmp_ms)


def bench_lr():
    from dav1d_tpu.ops.lr import wiener_batch, _jit_wiener
    from dav1d_tpu.recon.lr_apply import _wiener

    rng = np.random.default_rng(5)
    _hdr("loop restoration (wiener)")
    for uw, sh, B in [(64, 64, 32), (128, 64, 16), (64, 16, 64)]:
        P = rng.integers(0, 256, (B, sh + 6, uw + 6), dtype=np.int64)
        fh = rng.integers(-5, 6, (B, 3))
        fv = rng.integers(-5, 6, (B, 3))

        def host():
            for b in range(B):
                _wiener(P[b], list(fh[b]), list(fv[b]), uw, sh, 8)

        dev = _time_e2e(lambda: wiener_batch(P, fh, fv, 8))
        prog = _jit_wiener(uw, sh, 8)
        rP, rfh, rfv = _put(P.astype(np.int32), fh.astype(np.int32),
                            fv.astype(np.int32))
        cmp_ms = _time_compute(prog=prog, args=(rP, rfh, rfv))
        _row("lr", f"wiener {uw}x{sh} B={B}", _time(host), dev, cmp_ms)


def bench_fg():
    from dav1d_tpu.ops.fg import fg_apply_batch, _jit_apply
    from dav1d_tpu.recon.filmgrain import _round2_arr

    rng = np.random.default_rng(6)
    _hdr("film grain apply")
    for h, w in [(1080, 1920), (544, 960)]:
        src = rng.integers(0, 256, (h, w), dtype=np.int64)
        grain = rng.integers(-128, 128, (h, w), dtype=np.int64)
        lut = rng.integers(0, 256, 256, dtype=np.int64)

        def host():
            noise = _round2_arr(lut[src] * grain, 8)
            np.clip(src + noise, 0, 255)

        dev = _time_e2e(lambda: fg_apply_batch(src, grain, lut, 8, 0, 255))
        prog = _jit_apply(8, 0, 255)
        rsrc, rgrain, rlut = _put(src.astype(np.int32),
                                  grain.astype(np.int32),
                                  lut.astype(np.int32))
        cmp_ms = _time_compute(prog=prog, args=(rsrc, rsrc, rgrain, rlut))
        _row("fg", f"fg_apply {w}x{h}", _time(host), dev, cmp_ms)

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
            _row("fg", f"fg_plane(native) {w}x{h}", host, float("inf"))


def bench_ipred():
    from dav1d_tpu.levels import IntraPredMode as M
    from dav1d_tpu.ops.ipred import ipred_batch, _program
    from dav1d_tpu.recon.ipred import ipred

    rng = np.random.default_rng(8)
    _hdr("intra prediction (batched over same-key blocks)")
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

        dev = _time_e2e(lambda: np.asarray(
            ipred_batch(mode, edges, w, h, angle, w, h, 8)))
        prog = _program(mode, w, h, angle, w, h, 8)
        redges = _put(edges)
        cmp_ms = _time_compute(prog=prog, args=(redges,))
        _row("ipred", f"ipred {label} B={B}", _time(host), dev, cmp_ms)


def bench_resize():
    from dav1d_tpu.ops.resize import resize_rows, _program
    from dav1d_tpu.recon.mc_np import resize_row

    rng = np.random.default_rng(7)
    _hdr("super-res resample (horizontal upscale)")
    for h, in_w, out_w in [(1080, 960, 1920), (2160, 1920, 3840),
                           (1080, 1440, 1920)]:
        src_w = (in_w + 127) & ~127
        rows = rng.integers(0, 256, (h, src_w), dtype=np.int32)
        step = ((in_w << 14) + (out_w >> 1)) // out_w
        host = _time(lambda: resize_row(rows, out_w, src_w, step, 128, 8))
        dev = _time_e2e(lambda: np.asarray(
            resize_rows(rows, out_w, src_w, step, 128, 8)))
        prog = _program(out_w, src_w, step, 128, 8)
        rrows = _put(rows)
        cmp_ms = _time_compute(prog=prog, args=(rrows,))
        _row("resize", f"resize {in_w}->{out_w} x{h}", host, dev, cmp_ms)


FAMILIES = {"itx": bench_itx, "cdef": bench_cdef, "mc": bench_mc,
            "deblock": bench_deblock, "lr": bench_lr, "fg": bench_fg,
            "resize": bench_resize, "ipred": bench_ipred}


def main():
    import jax

    # persistent compile cache: the fused timing programs are expensive
    # one-time compiles through the tunnel; deadline-bounded retries
    # (tools/kb_retry.sh) accumulate progress through this cache
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DAV1D_TPU_JAX_CACHE",
                                     "/tmp/jax_cache"))

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = [a for a in args if a in FAMILIES] or list(FAMILIES)
    backend = jax.devices()[0].platform
    print(f"backend: {backend} ({len(jax.devices())} device(s))")
    for n in names:
        try:
            FAMILIES[n]()
        except Exception as e:  # noqa: BLE001 — partial artifact > none
            print(f"[{n}] FAILED: {type(e).__name__}: {e}")
    if json_path:
        Path(json_path).write_text(json.dumps(dict(
            backend=backend,
            n_devices=len(jax.devices()),
            device=str(jax.devices()[0]),
            compute_reps=COMPUTE_REPS,
            note=("dev_compute_ms = resident inputs, pipelined "
                  "dispatches, one sync — on-chip kernel time; "
                  "dev_e2e_ms includes host<->device transfer "
                  "(network-tunneled on this harness)"),
            results=RESULTS), indent=1))
        print(f"\nwrote {json_path} ({len(RESULTS)} rows)")


if __name__ == "__main__":
    main()
