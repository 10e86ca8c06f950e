"""Minimal AV1 stream generator: sequence/frame headers + intra tile coding.

Generates conformant keyframe-only streams with controllable (or random)
coding decisions, mirroring the decoder's symbol order. Streams are
validated by the reference oracle; the TPU decoder must match the oracle
bit-exactly (our stand-in for the Argon vectors, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dav1d_tpu import tables  # noqa: E402
from dav1d_tpu.cdf import CdfContext  # noqa: E402
from dav1d_tpu.decode.tile import BlockContext, get_partition_ctx  # noqa: E402
from dav1d_tpu.intra_edge import INTRA_EDGE_TREE  # noqa: E402
from dav1d_tpu.levels import (  # noqa: E402
    BlockLevel, BlockPartition as BP, BlockSize, IntraPredMode as M,
)

from .bitwriter import BitWriter  # noqa: E402
from .msac_enc import MsacEncoder  # noqa: E402


@dataclasses.dataclass
class StreamConfig:
    width: int = 64
    height: int = 64
    qidx: int = 100
    bitdepth: int = 8
    seed: int = 0
    intra_edge_filter: int = 0
    lf_levels: tuple = (0, 0, 0, 0)  # y_v, y_h, u, v
    lf_sharpness: int = 0
    filter_intra: int = 0
    # cdef: None = off, else (damping 3..6, n_bits 0..3,
    # [(y_strength, uv_strength), ...] with 1 << n_bits entries)
    cdef: tuple = None
    # operating points: tuple of 12-bit idc values ((0,) = single op);
    # an idc's bit t selects temporal layer t, bit 8+s spatial layer s
    operating_points: tuple = (0,)


OBU_SEQ_HDR = 1
OBU_TD = 2
OBU_FRAME = 6


def wrap_obu(obu_type: int, payload: bytes, temporal_id: int = None,
             spatial_id: int = None) -> bytes:
    w = BitWriter()
    has_ext = temporal_id is not None or spatial_id is not None
    w.put_bit(0)  # forbidden
    w.put_bits(obu_type, 4)
    w.put_bit(int(has_ext))  # extension
    w.put_bit(1)  # has length field
    w.put_bit(0)  # reserved
    if has_ext:
        w.put_bits(temporal_id or 0, 3)
        w.put_bits(spatial_id or 0, 2)
        w.put_bits(0, 3)  # reserved
    w.put_uleb128(len(payload))
    return w.tobytes() + payload


def write_seq_hdr(cfg: StreamConfig) -> bytes:
    w = BitWriter()
    w.put_bits(0, 3)  # profile 0
    w.put_bit(0)  # still_picture
    w.put_bit(0)  # reduced_still_picture_header
    w.put_bit(0)  # timing_info_present
    w.put_bit(0)  # display_model_info_present
    ops = cfg.operating_points or (0,)
    w.put_bits(len(ops) - 1, 5)  # num_operating_points - 1
    for idc in ops:
        w.put_bits(idc, 12)  # idc
        w.put_bits(0, 3)  # major_level - 2
        w.put_bits(0, 2)  # minor_level
    w.put_bits(15, 4)  # width_n_bits - 1
    w.put_bits(15, 4)  # height_n_bits - 1
    w.put_bits(cfg.width - 1, 16)
    w.put_bits(cfg.height - 1, 16)
    w.put_bit(0)  # frame_id_numbers_present
    w.put_bit(0)  # sb128
    w.put_bit(cfg.filter_intra)  # filter_intra
    w.put_bit(cfg.intra_edge_filter)  # intra_edge_filter
    w.put_bit(0)  # inter_intra
    w.put_bit(0)  # masked_compound
    w.put_bit(0)  # warped_motion
    w.put_bit(0)  # dual_filter
    w.put_bit(0)  # order_hint
    w.put_bit(0)  # screen_content_tools: not adaptive
    w.put_bit(0)  # screen_content_tools: off
    w.put_bit(0)  # super_res
    w.put_bit(int(cfg.cdef is not None))  # cdef
    w.put_bit(0)  # restoration
    w.put_bit(0)  # hbd (8-bit)
    w.put_bit(0)  # monochrome
    w.put_bit(0)  # color_description_present
    w.put_bit(1)  # color_range (full)
    w.put_bits(0, 2)  # chroma sample position
    w.put_bit(0)  # separate_uv_delta_q
    w.put_bit(0)  # film_grain_present
    w.trailing_bits()
    return w.tobytes()


def write_frame_hdr(cfg: StreamConfig, w: BitWriter, show_frame=True,
                    refresh=0xFF) -> None:
    """Key frame header bits (without trailing, for OBU_FRAME)."""
    w.put_bit(0)  # show_existing_frame
    w.put_bits(0, 2)  # frame_type KEY
    w.put_bit(int(show_frame))  # show_frame
    if not show_frame:
        w.put_bit(1)  # showable_frame
        w.put_bit(1)  # error_resilient_mode (explicit when !show)
    w.put_bit(0)  # disable_cdf_update
    w.put_bit(0)  # frame_size_override
    if not show_frame:
        w.put_bits(refresh, 8)  # refresh_frame_flags (explicit)
    w.put_bit(0)  # have_render_size
    w.put_bit(0)  # frame_refresh_context_disabled (refresh_context = 1)
    w.put_bit(1)  # tiling uniform
    # 64-aligned small frames: min==max log2 cols/rows -> increment bits
    sbw = (cfg.width + 63) >> 6
    sbh = (cfg.height + 63) >> 6
    max_log2_cols = _tile_log2(1, min(sbw, 64))
    min_log2_cols = _tile_log2(64, sbw)
    for _ in range(max_log2_cols - min_log2_cols):
        w.put_bit(0)  # stop at min_log2_cols tiles
    max_log2_rows = _tile_log2(1, min(sbh, 64))
    min_log2_rows = max(_tile_log2(64 * 36, sbw * sbh) - min_log2_cols, 0)
    for _ in range(max_log2_rows - min_log2_rows):
        w.put_bit(0)
    if min_log2_cols or min_log2_rows:
        raise NotImplementedError("multi-tile generation")
    # quant
    w.put_bits(cfg.qidx, 8)  # base_q_idx
    w.put_bit(0)  # ydc delta
    w.put_bit(0)  # udc delta
    w.put_bit(0)  # uac delta
    w.put_bit(0)  # qm
    w.put_bit(0)  # segmentation
    if cfg.qidx:
        w.put_bit(0)  # delta_q present
    # loopfilter
    ly0, ly1, lu, lv = cfg.lf_levels
    w.put_bits(ly0, 6)  # level_y[0]
    w.put_bits(ly1, 6)  # level_y[1]
    if ly0 or ly1:
        w.put_bits(lu, 6)
        w.put_bits(lv, 6)
    w.put_bits(cfg.lf_sharpness, 3)  # sharpness
    w.put_bit(0)  # mode_ref_delta_enabled
    _write_cdef(cfg, w)
    # restoration: seq off
    w.put_bit(1)  # txfm_mode: switchable (exercise tx-size coding)
    w.put_bit(0)  # reduced_txtp_set
    # gmv: intra, none; film grain: seq off


def _write_cdef(cfg: StreamConfig, w: BitWriter) -> None:
    if cfg.cdef is None:
        return
    damping, n_bits, strengths = cfg.cdef
    assert len(strengths) == (1 << n_bits)
    w.put_bits(damping - 3, 2)
    w.put_bits(n_bits, 2)
    for ys, uvs in strengths:
        w.put_bits(ys, 6)
        w.put_bits(uvs, 6)


def _tile_log2(sz, tgt):
    k = 0
    while (sz << k) < tgt:
        k += 1
    return k


class TileEncoder:
    """Mirror of the decoder's per-tile symbol order for intra keyframes."""

    def __init__(self, cfg: StreamConfig, rng):
        self.cfg = cfg
        self.rng = rng
        self.msac = MsacEncoder()
        self.cdf = CdfContext.from_defaults(cfg.qidx)
        self.bw = ((cfg.width + 7) >> 3) << 1
        self.bh = ((cfg.height + 7) >> 3) << 1
        self.sb128w = (self.bw + 31) >> 5
        self.a = [BlockContext() for _ in range(self.sb128w)]
        self.l = BlockContext()
        for ctx in self.a:
            ctx.reset(True)
        # track y modes for kf cdf ctx: above/left mode arrays are in
        # BlockContext already

    def encode_frame_tile(self, decide) -> bytes:
        """decide(bx, by, bl, ctx) -> partition / block decisions."""
        sbh = (self.bh + 15) >> 4
        sbw_ct = (self.bw + 15) >> 4
        for sby in range(sbh):
            self.by = sby << 4
            self.l.reset(True)
            for sbx in range(sbw_ct):
                self.bx = sbx << 4
                self.cur_a = self.a[self.bx >> 5]
                self.cur_sb_cdef_idx = -1
                self._encode_sb(BlockLevel.BL_64X64, decide)
        return self.msac.done()

    def _encode_sb(self, bl, decide, bx=None, by=None):
        if bx is None:
            bx, by = self.bx, self.by
        hsz = 16 >> bl
        have_h = self.bw > bx + hsz
        have_v = self.bh > by + hsz
        if not have_h and not have_v:
            return self._encode_sb(bl + 1, decide, bx, by)

        bx8 = (bx & 31) >> 1
        by8 = (by & 31) >> 1
        ctx = get_partition_ctx(self.cur_a, self.l, bl, by8, bx8)
        pc = self.cdf.m.partition[bl][ctx]
        n_part = int(tables.partition_type_count[bl])

        bp = decide("partition", bx=bx, by=by, bl=bl,
                    can_split=bl < BlockLevel.BL_8X8)
        if have_h and have_v:
            self.msac.encode_symbol(bp, pc, n_part)
            b = tables.block_sizes[bl][bp]
            if bp == BP.NONE:
                self._encode_b(bl, int(b[0]), bp, bx, by, decide)
            elif bp == BP.SPLIT:
                if bl == BlockLevel.BL_8X8:
                    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
                        self._encode_b(bl, BlockSize.BS_4x4, bp,
                                       bx + dx, by + dy, decide)
                else:
                    h = hsz
                    for dx, dy in ((0, 0), (h, 0), (0, h), (h, h)):
                        self._encode_sb(bl + 1, decide, bx + dx, by + dy)
            elif bp == BP.H:
                self._encode_b(bl, int(b[0]), bp, bx, by, decide)
                self._encode_b(bl, int(b[0]), bp, bx, by + hsz, decide)
            elif bp == BP.V:
                self._encode_b(bl, int(b[0]), bp, bx, by, decide)
                self._encode_b(bl, int(b[0]), bp, bx + hsz, by, decide)
            else:
                raise NotImplementedError(f"partition {bp} in generator")
        elif have_h:
            is_split = bp == BP.SPLIT
            from dav1d_tpu.decode.tile import gather_top_partition_prob
            self.msac.encode_bool(int(is_split),
                                  gather_top_partition_prob(pc, bl))
            if is_split:
                self._encode_sb(bl + 1, decide, bx, by)
                self._encode_sb(bl + 1, decide, bx + hsz, by)
            else:
                bp = BP.H
                self._encode_b(bl, int(tables.block_sizes[bl][BP.H][0]),
                               bp, bx, by, decide)
        else:
            is_split = bp == BP.SPLIT
            from dav1d_tpu.decode.tile import gather_left_partition_prob
            self.msac.encode_bool(int(is_split),
                                  gather_left_partition_prob(pc, bl))
            if is_split:
                self._encode_sb(bl + 1, decide, bx, by)
                self._encode_sb(bl + 1, decide, bx, by + hsz)
            else:
                bp = BP.V
                self._encode_b(bl, int(tables.block_sizes[bl][BP.V][0]),
                               bp, bx, by, decide)

        if bp != BP.SPLIT or bl == BlockLevel.BL_8X8:
            self.cur_a.partition[bx8 : bx8 + hsz] = \
                tables.al_part_ctx[0][bl][bp]
            self.l.partition[by8 : by8 + hsz] = tables.al_part_ctx[1][bl][bp]

    def _encode_cdef_idx(self, skip, bx, by, decide):
        """Mirror the decoder's cdef-idx read (decode/tile.py): first
        non-skip block of each 64x64 SB codes cdef.n_bits raw bits."""
        if skip or self.cur_sb_cdef_idx != -1:
            return
        n_bits = self.cfg.cdef[1] if self.cfg.cdef else 0
        v = decide("cdef_idx", bx=bx, by=by) if n_bits else 0
        self.msac.encode_bools(v, n_bits)
        self.cur_sb_cdef_idx = v

    def _encode_b(self, bl, bs, bp, bx, by, decide):
        cdf = self.cdf
        b_dim = tables.block_dimensions[bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        bx4, by4 = bx & 31, by & 31
        cbx4, cby4 = bx4 >> 1, by4 >> 1
        cbw4 = (bw4 + 1) >> 1
        cbh4 = (bh4 + 1) >> 1
        has_chroma = (bw4 > 1 or bx & 1) and (bh4 > 1 or by & 1)
        a, l = self.cur_a, self.l

        # skip
        skip = decide("skip", bx=bx, by=by, bs=bs)
        sctx = int(a.skip[bx4]) + int(l.skip[by4])
        self.msac.encode_bool_adapt(skip, cdf.m.skip[sctx])
        self._encode_cdef_idx(skip, bx, by, decide)

        # y mode (keyframe cdf)
        y_mode = decide("y_mode", bx=bx, by=by, bs=bs)
        ymode_cdf = cdf.kfym[
            int(tables.intra_mode_context[int(a.mode[bx4])])][
            int(tables.intra_mode_context[int(l.mode[by4])])]
        self.msac.encode_symbol(y_mode, ymode_cdf, 12)

        y_angle = 0
        if int(b_dim[2]) + int(b_dim[3]) >= 2 and \
                M.VERT_PRED <= y_mode <= M.VERT_LEFT_PRED:
            y_angle = decide("y_angle", bx=bx, by=by)
            self.msac.encode_symbol(y_angle + 3,
                                    cdf.m.angle_delta[y_mode - M.VERT_PRED], 6)

        uv_mode = M.DC_PRED
        if has_chroma:
            from dav1d_tpu.levels import CFL_ALLOWED_MASK
            cfl_allowed = bool(CFL_ALLOWED_MASK & (1 << bs))
            uv_mode = decide("uv_mode", bx=bx, by=by, bs=bs,
                             cfl_allowed=cfl_allowed)
            self.msac.encode_symbol(uv_mode, cdf.m.uv_mode[int(cfl_allowed)][y_mode],
                                    13 - (not cfl_allowed))
            if uv_mode == M.CFL_PRED:
                au, av = decide("cfl_alphas", bx=bx, by=by)
                sign_u = 0 if au == 0 else (1 if au < 0 else 2)
                sign_v = 0 if av == 0 else (1 if av < 0 else 2)
                joint = sign_u * 3 + sign_v
                assert joint >= 1, "cfl alphas cannot both be zero"
                self.msac.encode_symbol(joint - 1, cdf.m.cfl_sign, 7)
                if sign_u:
                    ctx = (sign_u == 2) * 3 + sign_v
                    self.msac.encode_symbol(abs(au) - 1,
                                            cdf.m.cfl_alpha[ctx], 15)
                if sign_v:
                    ctx = (sign_v == 2) * 3 + sign_u
                    self.msac.encode_symbol(abs(av) - 1,
                                            cdf.m.cfl_alpha[ctx], 15)
            elif int(b_dim[2]) + int(b_dim[3]) >= 2 and \
                    M.VERT_PRED <= uv_mode <= M.VERT_LEFT_PRED:
                uv_angle = decide("uv_angle", bx=bx, by=by)
                self.msac.encode_symbol(
                    uv_angle + 3, cdf.m.angle_delta[uv_mode - M.VERT_PRED], 6)

        # filter intra
        is_filter = 0
        if y_mode == M.DC_PRED and \
                max(int(b_dim[2]), int(b_dim[3])) <= 3 and \
                self.cfg.filter_intra:
            filt = decide("filter_intra", bx=bx, by=by)
            is_filter = int(filt is not None)
            self.msac.encode_bool_adapt(is_filter,
                                        cdf.m.use_filter_intra[bs])
            if is_filter:
                y_mode = M.FILTER_PRED
                y_angle = filt
                self.msac.encode_symbol(filt, cdf.m.filter_intra, 4)

        # tx size (txfm_mode switchable)
        tx = int(tables.max_txfm_size_for_bs[bs][0])
        t_dim = tables.txfm_info()[tx]
        if int(t_dim[5]) > 0:  # max > TX_4X4
            from dav1d_tpu.decode.tile import get_tx_ctx
            depth = decide("tx_depth", bx=bx, by=by, bs=bs,
                           max_depth=min(int(t_dim[5]), 2))
            tctx = get_tx_ctx(a, l, int(t_dim[2]), int(t_dim[3]), by4, bx4)
            self.msac.encode_symbol(depth, cdf.m.txsz[int(t_dim[5]) - 1][tctx],
                                    min(int(t_dim[5]), 2))
            for _ in range(depth):
                tx = int(t_dim[6])
                t_dim = tables.txfm_info()[tx]
        coef_y_mode = y_mode
        if y_mode == M.FILTER_PRED:
            coef_y_mode = int(tables.filter_mode_to_y_mode[y_angle])
        if skip:
            # coef skip ctx resets
            a.lcoef[bx4 : bx4 + bw4] = 0x40
            l.lcoef[by4 : by4 + bh4] = 0x40
            if has_chroma:
                a.ccoef[0][cbx4 : cbx4 + cbw4] = 0x40
                a.ccoef[1][cbx4 : cbx4 + cbw4] = 0x40
                l.ccoef[0][cby4 : cby4 + cbh4] = 0x40
                l.ccoef[1][cby4 : cby4 + cbh4] = 0x40
        else:
            self._encode_coefs(bs, tx, bx, by, bw4, bh4, has_chroma, decide,
                               coef_y_mode, uv_mode)

        # context updates (mirror decoder)
        lw, lh = int(t_dim[2]), int(t_dim[3])
        y_mode_nofilt = M.DC_PRED if y_mode == M.FILTER_PRED else y_mode
        a.tx_intra[bx4 : bx4 + bw4] = lw
        a.tx[bx4 : bx4 + bw4] = lw
        a.mode[bx4 : bx4 + bw4] = y_mode_nofilt
        a.intra[bx4 : bx4 + bw4] = 1
        a.skip[bx4 : bx4 + bw4] = skip
        l.tx_intra[by4 : by4 + bh4] = lh
        l.tx[by4 : by4 + bh4] = lh
        l.mode[by4 : by4 + bh4] = y_mode_nofilt
        l.intra[by4 : by4 + bh4] = 1
        l.skip[by4 : by4 + bh4] = skip
        if has_chroma:
            a.uvmode[cbx4 : cbx4 + cbw4] = uv_mode
            l.uvmode[cby4 : cby4 + cbh4] = uv_mode

    def _encode_coefs(self, bs, ytx, bx, by, bw4, bh4, has_chroma, decide,
                      y_mode, uv_mode):
        """Per-TX coefficient encoding. decide("coef", ...) supplies the
        token levels (dict rc -> level >= 1), signs and (for luma) txtp;
        empty levels -> all-skip bool."""
        from dav1d_tpu.levels import TxfmSize, TxfmType
        from dav1d_tpu.recon.coef import get_uv_inter_txtp
        from .coef_enc import encode_coefs
        cdf = self.cdf
        t_dim = tables.txfm_info()[ytx]
        tw, th = int(t_dim[0]), int(t_dim[1])
        a, l = self.cur_a, self.l
        bx4, by4 = bx & 31, by & 31
        w4 = min(bw4, self.bw - bx)
        h4 = min(bh4, self.bh - by)
        qidx = self.cfg.qidx
        for y in range(0, h4, th):
            for x in range(0, w4, tw):
                txtp, levels, signs = decide(
                    "coef", bx=bx + x, by=by + y, tx=ytx, plane=0,
                    t_dim=t_dim, intra=1, y_mode=y_mode)
                ctx = encode_coefs(
                    self.msac, cdf, a.lcoef, bx4 + x, l.lcoef, by4 + y,
                    ytx, bs, y_mode, uv_mode, 0, 0, qidx, 0, 1,
                    txtp, levels, signs)
                a.lcoef[bx4 + x : bx4 + x + tw] = ctx
                l.lcoef[by4 + y : by4 + y + th] = ctx
        if has_chroma:
            uvtx = int(tables.max_txfm_size_for_bs[bs][1])  # I420
            uv_t = tables.txfm_info()[uvtx]
            utw, uth = int(uv_t[0]), int(uv_t[1])
            cbx4, cby4 = bx4 >> 1, by4 >> 1
            cw4 = (w4 + 1) >> 1
            ch4 = (h4 + 1) >> 1
            # chroma txtp is derived, not coded (decode_coefs)
            if int(uv_t[5]) + 1 >= TxfmSize.TX_64X64:
                uv_txtp = TxfmType.DCT_DCT
            else:
                uv_txtp = TxfmType(int(tables.txtp_from_uvmode[uv_mode]))
            for pl in range(2):
                for y in range(0, ch4, uth):
                    for x in range(0, cw4, utw):
                        _, levels, signs = decide(
                            "coef", bx=bx + x * 2, by=by + y * 2, tx=uvtx,
                            plane=1 + pl, t_dim=uv_t, intra=1,
                            y_mode=y_mode, fixed_txtp=uv_txtp)
                        ctx = encode_coefs(
                            self.msac, cdf, a.ccoef[pl], cbx4 + x,
                            l.ccoef[pl], cby4 + y, uvtx, bs, y_mode,
                            uv_mode, 0, 0, qidx, 1 + pl, 1,
                            uv_txtp, levels, signs)
                        a.ccoef[pl][cbx4 + x : cbx4 + x + utw] = ctx
                        l.ccoef[pl][cby4 + y : cby4 + y + uth] = ctx


def make_stream(cfg: StreamConfig, decide) -> bytes:
    """One-keyframe stream as a temporal unit of OBUs."""
    rng = np.random.default_rng(cfg.seed)
    w = BitWriter()
    write_frame_hdr(cfg, w)
    w.bytealign()
    frame_hdr_bytes = w.tobytes()
    tile_data = TileEncoder(cfg, rng).encode_frame_tile(decide)
    frame_obu = wrap_obu(OBU_FRAME, frame_hdr_bytes + tile_data)
    td = wrap_obu(OBU_TD, b"")
    return td + wrap_obu(OBU_SEQ_HDR, write_seq_hdr(cfg)) + frame_obu


def make_svc_stream(cfg: StreamConfig, decide, n_frames: int = 3):
    """Scalable 2-spatial-layer intra stream (reference obu.c operating-
    point filtering, src/obu.c:1202-1210): each temporal unit carries a
    non-shown base-layer KEY frame (spatial_id 0, refreshing slot 0) and
    a shown enhancement KEY frame (spatial_id 1).  Layers are coded
    independently (intra) at the same resolution.

    Returns (tus, base_tus, enh_tus): the SVC temporal units plus the
    equivalent single-layer streams of the base/enhancement frames (same
    tile payloads, plain headers) for cross-checking layer selection."""
    assert len(cfg.operating_points) >= 2
    base_cfg = StreamConfig(**{**cfg.__dict__, "operating_points": (0,)})

    tus, base_tus, enh_tus = [], [], []
    for n in range(n_frames):
        layers = []
        for sid in range(2):
            rng = np.random.default_rng(cfg.seed + 1000 * n + sid)
            w = BitWriter()
            write_frame_hdr(cfg, w, show_frame=(sid == 1),
                            refresh=(1 << sid))
            w.bytealign()
            hdr_noshow = w.tobytes()
            w = BitWriter()
            write_frame_hdr(cfg, w, show_frame=True)
            w.bytealign()
            hdr_show = w.tobytes()
            tile = TileEncoder(cfg, rng).encode_frame_tile(decide)
            layers.append((hdr_noshow, hdr_show, tile))

        td = wrap_obu(OBU_TD, b"")
        seq = wrap_obu(OBU_SEQ_HDR, write_seq_hdr(cfg)) if n == 0 else b""
        seq1 = wrap_obu(OBU_SEQ_HDR, write_seq_hdr(base_cfg)) \
            if n == 0 else b""
        tus.append(
            td + seq
            + wrap_obu(OBU_FRAME, layers[0][0] + layers[0][2],
                       temporal_id=0, spatial_id=0)
            + wrap_obu(OBU_FRAME, layers[1][0] + layers[1][2],
                       temporal_id=0, spatial_id=1))
        base_tus.append(td + seq1
                        + wrap_obu(OBU_FRAME, layers[0][1] + layers[0][2]))
        enh_tus.append(td + seq1
                       + wrap_obu(OBU_FRAME, layers[1][1] + layers[1][2]))
    return tus, base_tus, enh_tus


def write_ivf(path, frames: list[bytes], width: int, height: int) -> None:
    hdr = struct.pack("<4sHH4sHHIII4x", b"DKIF", 0, 32, b"AV01",
                      width, height, 25, 1, len(frames))
    with open(path, "wb") as f:
        f.write(hdr)
        for i, fr in enumerate(frames):
            f.write(struct.pack("<IQ", len(fr), i))
            f.write(fr)


def default_decide(**kw):
    kind = kw.get("kind")
    return None

