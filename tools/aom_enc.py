"""Real-AV1-stream generator: ctypes bindings to the system libaom encoder.

Why: the avgen hand-rolled encoder covers features one at a time, but a real
encoder exercises the full normative decode surface (mode/partition/tx
diversity, CDF adaptation paths, reference structures, in-loop filters) the
way production streams do.  Every stream produced here is validated through
the reference-dav1d oracle (tests/conftest.py) before being compared against
dav1d_tpu, so a mis-encoded stream can never silently pass.

ABI strategy (no libaom headers in this image):
  * aom_codec_enc_cfg_t is located by FINGERPRINTING its documented default
    values (320x240, timebase 1/30, kf_max_dist 9999, rc buf 6000/4000/5000)
    after aom_codec_enc_config_default() fills a generously-sized buffer.
    Every located field is cross-checked against a second known default;
    mismatch raises instead of corrupting memory.
  * The encoder ABI version is discovered by probing aom_codec_enc_init_ver
    until it stops returning AOM_CODEC_ABI_MISMATCH.
  * All AV1-specific knobs go through the string-based aom_codec_set_option,
    which is ABI-stable.
  * aom_image_t is declared only up to the fields we touch (planes/stride),
    and alloc results are sanity-checked (w/h/shift match the request).
"""

from __future__ import annotations

import ctypes
import struct
from pathlib import Path

import numpy as np

_lib = None

AOM_CODEC_OK = 0
AOM_CODEC_ABI_MISMATCH = 3
AOM_CODEC_CX_FRAME_PKT = 0
AOM_EFLAG_FORCE_KF = 1 << 0
AOM_CODEC_USE_HIGHBITDEPTH = 0x40000

AOM_IMG_FMT_PLANAR = 0x100
AOM_IMG_FMT_HIGHBITDEPTH = 0x800
_IMG_FMT = {"420": AOM_IMG_FMT_PLANAR | 2,
            "422": AOM_IMG_FMT_PLANAR | 5,
            "444": AOM_IMG_FMT_PLANAR | 6}

USAGE = {"good": 0, "realtime": 1, "allintra": 2}


class AomImage(ctypes.Structure):
    """Prefix of aom_image_t (reference-independent; libaom public ABI).
    Only fields up to `stride` are accessed; tail is padding slack."""
    _fields_ = [
        ("fmt", ctypes.c_uint), ("cp", ctypes.c_uint), ("tc", ctypes.c_uint),
        ("mc", ctypes.c_uint), ("monochrome", ctypes.c_int),
        ("csp", ctypes.c_uint), ("range", ctypes.c_uint),
        ("w", ctypes.c_uint), ("h", ctypes.c_uint),
        ("bit_depth", ctypes.c_uint),
        ("d_w", ctypes.c_uint), ("d_h", ctypes.c_uint),
        ("r_w", ctypes.c_uint), ("r_h", ctypes.c_uint),
        ("x_chroma_shift", ctypes.c_uint), ("y_chroma_shift", ctypes.c_uint),
        ("planes", ctypes.c_void_p * 3), ("stride", ctypes.c_int * 3),
        ("bps", ctypes.c_int),
        ("_tail", ctypes.c_byte * 256),
    ]


class CxPkt(ctypes.Structure):
    _fields_ = [("kind", ctypes.c_int), ("_pad", ctypes.c_int),
                ("buf", ctypes.c_void_p), ("sz", ctypes.c_size_t),
                ("pts", ctypes.c_longlong), ("duration", ctypes.c_ulong),
                ("flags", ctypes.c_uint), ("partition_id", ctypes.c_int)]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL("libaom.so.3")
    lib.aom_codec_av1_cx.restype = ctypes.c_void_p
    lib.aom_codec_enc_config_default.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint]
    lib.aom_codec_enc_init_ver.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_long, ctypes.c_int]
    lib.aom_codec_enc_config_set.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.aom_codec_set_option.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.aom_codec_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
        ctypes.c_ulong, ctypes.c_long]
    lib.aom_codec_get_cx_data.restype = ctypes.POINTER(CxPkt)
    lib.aom_codec_get_cx_data.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
    lib.aom_codec_destroy.argtypes = [ctypes.c_void_p]
    lib.aom_codec_error.restype = ctypes.c_char_p
    lib.aom_codec_error.argtypes = [ctypes.c_void_p]
    lib.aom_codec_error_detail.restype = ctypes.c_char_p
    lib.aom_codec_error_detail.argtypes = [ctypes.c_void_p]
    lib.aom_img_alloc.restype = ctypes.POINTER(AomImage)
    lib.aom_img_alloc.argtypes = [
        ctypes.c_void_p, ctypes.c_uint, ctypes.c_uint, ctypes.c_uint,
        ctypes.c_uint]
    lib.aom_img_free.argtypes = [ctypes.POINTER(AomImage)]
    _lib = lib
    return lib


_CFG_BYTES = 1 << 14


class _CfgMap:
    """Field-offset map for aom_codec_enc_cfg_t, discovered by fingerprint."""

    def __init__(self, buf: bytes):
        u = np.frombuffer(buf, np.uint32)

        def find(pred, what):
            hits = [i for i in range(len(u) - 24) if pred(i)]
            if len(hits) != 1:
                raise RuntimeError(
                    f"cfg fingerprint '{what}' ambiguous/absent: {hits}")
            return hits[0]

        gw = find(lambda i: (u[i] == 320 and u[i + 1] == 240
                             and u[i + 5] == 8 and u[i + 6] == 8
                             and u[i + 7] == 1 and u[i + 8] == 30), "g_w")
        self.g_usage = gw - 3
        self.g_threads = gw - 2
        self.g_profile = gw - 1
        self.g_w, self.g_h, self.g_limit = gw, gw + 1, gw + 2
        self.g_forced_max_frame_width = gw + 3
        self.g_forced_max_frame_height = gw + 4
        self.g_bit_depth, self.g_input_bit_depth = gw + 5, gw + 6
        self.g_timebase_num, self.g_timebase_den = gw + 7, gw + 8
        self.g_error_resilient, self.g_pass, self.g_lag_in_frames = (
            gw + 9, gw + 10, gw + 11)
        self.rc_dropframe_thresh = gw + 12
        self.rc_resize_mode = gw + 13
        self.rc_resize_denominator = gw + 14
        self.rc_resize_kf_denominator = gw + 15
        self.rc_superres_mode = gw + 16
        self.rc_superres_denominator = gw + 17
        self.rc_superres_kf_denominator = gw + 18
        self.rc_superres_qthresh = gw + 19
        self.rc_superres_kf_qthresh = gw + 20
        self.rc_end_usage = gw + 21
        if not (u[self.rc_resize_denominator] == 8
                and u[self.rc_superres_denominator] == 8
                and u[self.rc_superres_qthresh] == 63
                and u[self.rc_end_usage] <= 3):
            raise RuntimeError("cfg rc_resize/superres fingerprint mismatch")

        rt = find(lambda i: (i > gw + 21 and u[i] == 256 and u[i + 1] == 0
                             and u[i + 2] == 63 and u[i + 5] == 6000
                             and u[i + 6] == 4000 and u[i + 7] == 5000),
                  "rc_target_bitrate")
        self.rc_target_bitrate = rt
        self.rc_min_quantizer, self.rc_max_quantizer = rt + 1, rt + 2

        kf = find(lambda i: (i > rt and u[i] == 9999 and u[i - 1] <= 12
                             and u[i - 2] <= 1), "kf_max_dist")
        self.kf_mode, self.kf_min_dist, self.kf_max_dist = kf - 2, kf - 1, kf
        self.sframe_dist, self.sframe_mode = kf + 1, kf + 2
        self.large_scale_tile, self.monochrome = kf + 3, kf + 4
        self.full_still_picture_hdr, self.save_as_annexb = kf + 5, kf + 6
        if not (u[self.large_scale_tile] == 0 and u[self.monochrome] == 0
                and u[self.save_as_annexb] == 0):
            raise RuntimeError("cfg kf/monochrome fingerprint mismatch")


_abi_version = None
_cfg_map = None


def _discover_abi(lib, iface) -> int:
    global _abi_version
    if _abi_version is not None:
        return _abi_version
    cfg = ctypes.create_string_buffer(_CFG_BYTES)
    rc = lib.aom_codec_enc_config_default(iface, cfg, USAGE["good"])
    if rc != AOM_CODEC_OK:
        raise RuntimeError(f"config_default failed: {rc}")
    for ver in range(64):
        ctx = ctypes.create_string_buffer(512)
        res = lib.aom_codec_enc_init_ver(ctx, iface, cfg, 0, ver)
        if res == AOM_CODEC_OK:
            lib.aom_codec_destroy(ctx)
            _abi_version = ver
            return ver
        if res != AOM_CODEC_ABI_MISMATCH:
            raise RuntimeError(f"enc_init probe failed with err {res}")
    raise RuntimeError("no compatible aom encoder ABI version found")


class AomEncoder:
    """Minimal libaom AV1 encoder wrapper.

    frames: list of [y, u, v] (or [y] for monochrome) numpy uint8/uint16
    planes at full/chroma resolution for the given subsampling.
    """

    def __init__(self, width, height, *, fmt="420", bitdepth=8,
                 monochrome=False, usage="good", cpu_used=5,
                 profile=None, q=None, bitrate=None, kf_max_dist=None,
                 error_resilient=False, lag=None, superres=None,
                 options=None, cfg_raw=None, threads=1):
        lib = _load()
        self.lib = lib
        self.width, self.height = width, height
        self.fmt, self.bitdepth, self.monochrome = fmt, bitdepth, monochrome
        iface = lib.aom_codec_av1_cx()
        self.iface = iface

        global _cfg_map
        if _cfg_map is None:
            # Offsets are usage-independent; fingerprint the good-quality
            # defaults once (the documented 320x240 / 9999 / 6000-4000-5000).
            probe = ctypes.create_string_buffer(_CFG_BYTES)
            rc = lib.aom_codec_enc_config_default(iface, probe, USAGE["good"])
            if rc != AOM_CODEC_OK:
                raise RuntimeError(f"config_default failed: {rc}")
            _cfg_map = _CfgMap(bytes(probe.raw))
        m = _cfg_map
        self._m = m
        cfg = ctypes.create_string_buffer(_CFG_BYTES)
        rc = lib.aom_codec_enc_config_default(iface, cfg, USAGE[usage])
        if rc != AOM_CODEC_OK:
            raise RuntimeError(f"config_default failed: {rc}")
        u = (ctypes.c_uint * (_CFG_BYTES // 4)).from_buffer(cfg)

        if profile is None:
            profile = 0
            if fmt == "444":
                profile = 1
            if bitdepth == 12 or fmt == "422":
                profile = 2
        u[m.g_profile] = profile
        u[m.g_w], u[m.g_h] = width, height
        u[m.g_bit_depth] = bitdepth
        u[m.g_input_bit_depth] = bitdepth
        u[m.g_threads] = threads
        u[m.g_lag_in_frames] = (0 if usage != "good" else 5) if lag is None else lag
        u[m.monochrome] = int(monochrome)
        if error_resilient:
            u[m.g_error_resilient] = 1
        if kf_max_dist is not None:
            u[m.kf_mode] = 0 if kf_max_dist == 0 else 1
            u[m.kf_min_dist] = 0
            u[m.kf_max_dist] = kf_max_dist
        if q is not None:
            u[m.rc_end_usage] = 3  # AOM_Q
            u[m.rc_min_quantizer] = q
            u[m.rc_max_quantizer] = q
        elif bitrate is not None:
            u[m.rc_end_usage] = 1
            u[m.rc_target_bitrate] = bitrate
        if superres is not None:  # (mode, denom, kf_denom, qthresh, kf_qthresh)
            (u[m.rc_superres_mode], u[m.rc_superres_denominator],
             u[m.rc_superres_kf_denominator], u[m.rc_superres_qthresh],
             u[m.rc_superres_kf_qthresh]) = superres
        for idx, val in (cfg_raw or {}).items():
            u[getattr(m, idx)] = val

        ver = _discover_abi(lib, iface)
        flags = AOM_CODEC_USE_HIGHBITDEPTH if bitdepth > 8 else 0
        self.ctx = ctypes.create_string_buffer(512)
        rc = lib.aom_codec_enc_init_ver(self.ctx, iface, cfg, flags, ver)
        if rc != AOM_CODEC_OK:
            raise RuntimeError(f"enc_init failed: {rc}")
        self._alive = True

        self.set_option("cpu-used", cpu_used)
        for k, v in (options or {}).items():
            self.set_option(k, v)

        imgfmt = _IMG_FMT[fmt] | (AOM_IMG_FMT_HIGHBITDEPTH if bitdepth > 8
                                  else 0)
        self.img = lib.aom_img_alloc(None, imgfmt, width, height, 32)
        if not self.img:
            raise RuntimeError("aom_img_alloc failed")
        im = self.img.contents
        ss_hor = 1 if fmt in ("420", "422") else 0
        ss_ver = 1 if fmt == "420" else 0
        if (im.w < width or im.h < height or im.x_chroma_shift != ss_hor
                or im.y_chroma_shift != ss_ver):
            raise RuntimeError("aom_image_t ABI sanity check failed")

    def set_option(self, name, value) -> None:
        rc = self.lib.aom_codec_set_option(
            self.ctx, str(name).encode(), str(value).encode())
        if rc != AOM_CODEC_OK:
            detail = self.lib.aom_codec_error_detail(self.ctx)
            raise RuntimeError(
                f"set_option {name}={value}: {rc} "
                f"({(detail or b'').decode()})")

    def _fill(self, planes) -> None:
        im = self.img.contents
        n_planes = 1 if self.monochrome else 3
        itemsize = 1 if self.bitdepth == 8 else 2
        for pl in range(n_planes):
            arr = np.asarray(planes[pl])
            arr = arr.astype(np.uint8 if itemsize == 1 else np.uint16)
            h, w = arr.shape
            stride = im.stride[pl]
            dst = (ctypes.c_char * (stride * h)).from_address(im.planes[pl])
            buf = np.frombuffer(dst, dtype=arr.dtype).reshape(
                h, stride // itemsize)
            buf[:, :w] = arr
        if self.monochrome:
            for pl in (1, 2):
                if im.planes[pl]:
                    h = (self.height + im.y_chroma_shift) >> im.y_chroma_shift
                    w = (self.width + im.x_chroma_shift) >> im.x_chroma_shift
                    stride = im.stride[pl]
                    ctypes.memset(im.planes[pl],
                                  128 if itemsize == 1 else 0,
                                  stride * h)

    def _drain(self, out):
        it = ctypes.c_void_p(None)
        while True:
            pkt = self.lib.aom_codec_get_cx_data(self.ctx, ctypes.byref(it))
            if not pkt:
                return
            p = pkt.contents
            if p.kind == AOM_CODEC_CX_FRAME_PKT:
                data = ctypes.string_at(p.buf, p.sz)
                out.append((p.pts, data))

    def encode(self, frames, force_kf=()):
        """Encode frames; returns list of (pts, temporal-unit bytes)."""
        out = []
        for i, planes in enumerate(frames):
            self._fill(planes)
            flags = AOM_EFLAG_FORCE_KF if i in force_kf else 0
            rc = self.lib.aom_codec_encode(self.ctx, self.img, i, 1, flags)
            if rc != AOM_CODEC_OK:
                detail = self.lib.aom_codec_error_detail(self.ctx)
                raise RuntimeError(
                    f"encode failed: {rc} ({(detail or b'').decode()})")
            self._drain(out)
        while True:
            n = len(out)
            rc = self.lib.aom_codec_encode(self.ctx, None, len(frames), 1, 0)
            if rc != AOM_CODEC_OK:
                raise RuntimeError(f"flush failed: {rc}")
            self._drain(out)
            if len(out) == n:
                break
        out.sort(key=lambda t: t[0])
        return out

    def close(self):
        if getattr(self, "_alive", False):
            self.lib.aom_img_free(self.img)
            self.lib.aom_codec_destroy(self.ctx)
            self._alive = False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_ivf_packets(path, packets, width, height, fps=30):
    """IVF container writer (reference tools/input/ivf.c framing)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<4sHH4sHHIII", b"DKIF", 0, 32, b"AV01",
                            width, height, fps, 1, len(packets)))
        f.write(b"\0\0\0\0")
        for pts, data in packets:
            f.write(struct.pack("<IQ", len(data), pts))
            f.write(data)


def gradient_frames(n, width, height, *, fmt="420", bitdepth=8, seed=0,
                    monochrome=False, motion=2, noise=6):
    """Synthetic video: smooth gradients + moving structure + mild noise —
    enough texture that the encoder picks diverse modes, smooth enough that
    inter prediction (MC/warp/OBMC) is actually chosen."""
    rng = np.random.default_rng(seed)
    maxv = (1 << bitdepth) - 1
    ss_hor = 1 if fmt in ("420", "422") else 0
    ss_ver = 1 if fmt == "420" else 0
    cw, ch = (width + ss_hor) >> ss_hor, (height + ss_ver) >> ss_ver
    yy, xx = np.mgrid[0:height, 0:width]
    cyy, cxx = np.mgrid[0:ch, 0:cw]
    base = rng.integers(0, noise + 1, size=(height + 64, width + 64))
    frames = []
    for t in range(n):
        dx, dy = motion * t, (motion // 2) * t
        y = ((xx * 3 + yy * 2 + t * 11) % (maxv + 1)).astype(np.int64)
        y += (np.sin((xx + dx) / 11.0) * 40 + np.cos((yy + dy) / 7.0)
              * 40).astype(np.int64) * ((maxv + 1) // 256)
        y += base[dy % 64:dy % 64 + height, dx % 64:dx % 64 + width] \
            * ((maxv + 1) // 256 if bitdepth > 8 else 1)
        y = np.clip(y, 0, maxv)
        if monochrome:
            frames.append([y])
            continue
        u = np.clip(((cxx * 5 + t * 7) % (maxv + 1) + cyy), 0, maxv)
        v = np.clip((maxv - (cyy * 4 + t * 13) % (maxv + 1)), 0, maxv)
        frames.append([y, u, v])
    return frames
