"""Inter-frame stream generation: a keyframe followed by one single-ref
inter frame (error-resilient, no order hints -> default CDFs, no temporal
MVs, no skip mode, no compound). The encoder mirrors the decoder's
_decode_b_inter symbol order exactly (dav1d_tpu/decode/tile.py) and reuses
the decoder's refmvs / context modules so both sides derive identical
contexts."""

from __future__ import annotations

import numpy as np

from dav1d_tpu import tables
from dav1d_tpu.cdf import CdfContext  # noqa: F401 (re-export convenience)
from dav1d_tpu.intra_edge import INTRA_EDGE_TREE, EDGE_ALL_TR_AND_BL
from dav1d_tpu.levels import (BlockLevel, BlockPartition as BP, BlockSize,
                              InterPredMode as IPM, IntraPredMode as M,
                              TxfmSize, CFL_ALLOWED_MASK)

from .bitwriter import BitWriter
from .stream import (OBU_FRAME, OBU_SEQ_HDR, OBU_TD, StreamConfig,
                     TileEncoder, _tile_log2, wrap_obu, write_frame_hdr,
                     write_seq_hdr, write_ivf)


def write_inter_frame_hdr(cfg: StreamConfig, w: BitWriter,
                          comp: bool = False) -> None:
    """Inter frame header. Error-resilient single-ref setup: primary_ref
    NONE (CDFs restart from defaults), no order hints (no temporal MVs,
    no skip mode). Bit order mirrors parse_frame_hdr (dav1d_tpu/obu.py)."""
    w.put_bit(0)  # show_existing_frame
    w.put_bits(1, 2)  # frame_type INTER
    w.put_bit(1)  # show_frame
    w.put_bit(1)  # error_resilient_mode
    w.put_bit(0)  # disable_cdf_update
    # screen content: seq off -> no bits
    w.put_bit(0)  # frame_size_override
    # no order_hint; primary_ref not coded (error resilient)
    w.put_bits(0x01, 8)  # refresh_frame_flags
    for _ in range(7):
        w.put_bits(0, 3)  # refidx[i] = 0 (the keyframe slot)
    # frame size from seq (override=0); seq.super_res off
    w.put_bit(0)  # have_render_size
    w.put_bit(1)  # hp (allow_high_precision_mv; force_integer_mv=0)
    w.put_bit(1)  # subpel filter mode: switchable
    w.put_bit(0)  # switchable_motion_mode (no OBMC/warp modes)
    # use_ref_frame_mvs: skipped (error resilient)
    w.put_bit(0)  # refresh-context-disabled=0 -> refresh_context=1
    # tiling (uniform, 1x1) - same shape as the keyframe writer
    w.put_bit(1)
    sbw = (cfg.width + 63) >> 6
    sbh = (cfg.height + 63) >> 6
    max_log2_cols = _tile_log2(1, min(sbw, 64))
    min_log2_cols = _tile_log2(64, sbw)
    for _ in range(max_log2_cols - min_log2_cols):
        w.put_bit(0)
    max_log2_rows = _tile_log2(1, min(sbh, 64))
    min_log2_rows = max(_tile_log2(64 * 36, sbw * sbh) - min_log2_cols, 0)
    for _ in range(max_log2_rows - min_log2_rows):
        w.put_bit(0)
    # quant
    w.put_bits(cfg.qidx, 8)
    w.put_bit(0)  # ydc delta
    w.put_bit(0)  # udc delta
    w.put_bit(0)  # uac delta
    w.put_bit(0)  # qm
    w.put_bit(0)  # segmentation
    if cfg.qidx:
        w.put_bit(0)  # delta_q present
    ly0, ly1, lu, lv = cfg.lf_levels
    w.put_bits(ly0, 6)
    w.put_bits(ly1, 6)
    if ly0 or ly1:
        w.put_bits(lu, 6)
        w.put_bits(lv, 6)
    w.put_bits(cfg.lf_sharpness, 3)
    w.put_bit(0)  # mode_ref_delta_enabled
    from .stream import _write_cdef
    _write_cdef(cfg, w)
    # restoration: seq off
    w.put_bit(1)  # txfm_mode: switchable (exercises var-tx tree)
    w.put_bit(int(comp))  # switchable_comp_refs
    # skip mode not allowed; warp skipped (seq.warped_motion=0)
    w.put_bit(0)  # reduced_txtp_set
    for _ in range(7):
        w.put_bit(0)  # gmv: identity
    # film grain: seq off


class InterTileEncoder(TileEncoder):
    """Tile encoder for single-ref inter frames. Threads the intra-edge
    tree through the partition walk so refmvs top-right availability
    matches the decoder bit-for-bit."""

    def __init__(self, cfg: StreamConfig, rng, frame_hdr, seq_hdr):
        super().__init__(cfg, rng)
        for ctx in self.a:
            ctx.reset(False)
        from dav1d_tpu.refmvs import RefMvsFrame, RefMvsTile
        self.frame_hdr = frame_hdr
        self.seq_hdr = seq_hdr
        self.rf = RefMvsFrame(seq_hdr, frame_hdr, ref_poc=[0] * 7)
        self.rt = RefMvsTile(self.rf, 0, self.bw, 0, self.bh)

    def encode_frame_tile(self, decide) -> bytes:
        sbh = (self.bh + 15) >> 4
        sbw_ct = (self.bw + 15) >> 4
        root = INTRA_EDGE_TREE[1]  # sb64
        for sby in range(sbh):
            self.by = sby << 4
            self.l.reset(False)
            for sbx in range(sbw_ct):
                self.bx = sbx << 4
                self.cur_a = self.a[self.bx >> 5]
                self.cur_sb_cdef_idx = -1
                self._encode_sb(BlockLevel.BL_64X64, decide, node=root)
        return self.msac.done()

    # -- partition walk with edge-tree threading (mirror decode_sb) --

    def _encode_sb(self, bl, decide, bx=None, by=None, node=None):
        from dav1d_tpu.decode.tile import (get_partition_ctx,
                                           gather_top_partition_prob,
                                           gather_left_partition_prob)
        if bx is None:
            bx, by = self.bx, self.by
        hsz = 16 >> bl
        have_h = self.bw > bx + hsz
        have_v = self.bh > by + hsz
        if not have_h and not have_v:
            return self._encode_sb(bl + 1, decide, bx, by, node.split[0])

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
                self._encode_b(bl, int(b[0]), bp, bx, by, decide, node.o)
            elif bp == BP.SPLIT:
                if bl == BlockLevel.BL_8X8:
                    tip = node
                    flags = (EDGE_ALL_TR_AND_BL, tip.split[0],
                             tip.split[1], tip.split[2])
                    for (dx, dy), fl in zip(
                            ((0, 0), (1, 0), (0, 1), (1, 1)), flags):
                        self._encode_b(bl, BlockSize.BS_4x4, bp,
                                       bx + dx, by + dy, decide, fl)
                else:
                    h = hsz
                    for (dx, dy), sub in zip(
                            ((0, 0), (h, 0), (0, h), (h, h)), node.split):
                        self._encode_sb(bl + 1, decide, bx + dx, by + dy,
                                        sub)
            elif bp == BP.H:
                self._encode_b(bl, int(b[0]), bp, bx, by, decide, node.h[0])
                self._encode_b(bl, int(b[0]), bp, bx, by + hsz, decide,
                               node.h[1])
            elif bp == BP.V:
                self._encode_b(bl, int(b[0]), bp, bx, by, decide, node.v[0])
                self._encode_b(bl, int(b[0]), bp, bx + hsz, by, decide,
                               node.v[1])
            else:
                raise NotImplementedError(f"partition {bp} in generator")
        elif have_h:
            is_split = bp == BP.SPLIT
            self.msac.encode_bool(int(is_split),
                                  gather_top_partition_prob(pc, bl))
            if is_split:
                self._encode_sb(bl + 1, decide, bx, by, node.split[0])
                self._encode_sb(bl + 1, decide, bx + hsz, by, node.split[1])
            else:
                bp = BP.H
                self._encode_b(bl, int(tables.block_sizes[bl][BP.H][0]),
                               bp, bx, by, decide, node.h[0])
        else:
            is_split = bp == BP.SPLIT
            self.msac.encode_bool(int(is_split),
                                  gather_left_partition_prob(pc, bl))
            if is_split:
                self._encode_sb(bl + 1, decide, bx, by, node.split[0])
                self._encode_sb(bl + 1, decide, bx, by + hsz, node.split[2])
            else:
                bp = BP.V
                self._encode_b(bl, int(tables.block_sizes[bl][BP.V][0]),
                               bp, bx, by, decide, node.v[0])

        if bp != BP.SPLIT or bl == BlockLevel.BL_8X8:
            self.cur_a.partition[bx8 : bx8 + hsz] = \
                tables.al_part_ctx[0][bl][bp]
            self.l.partition[by8 : by8 + hsz] = tables.al_part_ctx[1][bl][bp]

    # -- block encode (mirror decode_b inter-frame path) --

    def _encode_b(self, bl, bs, bp, bx, by, decide, edge_flags=0):
        from dav1d_tpu import env
        from dav1d_tpu.decode.tile import get_intra_ctx
        from dav1d_tpu.refmvs import (fix_mv_precision, get_gmv_2d,
                                      refmvs_find, splat_mv)

        cdf = self.cdf
        msac = self.msac
        hdr = self.frame_hdr
        b_dim = tables.block_dimensions[bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        bx4, by4 = bx & 31, by & 31
        cbx4, cby4 = bx4 >> 1, by4 >> 1
        cbw4 = (bw4 + 1) >> 1
        cbh4 = (bh4 + 1) >> 1
        w4 = min(bw4, self.bw - bx)
        h4 = min(bh4, self.bh - by)
        has_chroma = (bw4 > 1 or bx & 1) and (bh4 > 1 or by & 1)
        have_top = by > 0
        have_left = bx > 0
        a, l = self.cur_a, self.l

        # skip (no skip_mode: switchable_comp_refs=0 -> not enabled)
        skip = decide("skip", bx=bx, by=by, bs=bs)
        sctx = int(a.skip[bx4]) + int(l.skip[by4])
        msac.encode_bool_adapt(skip, cdf.m.skip[sctx])
        self._encode_cdef_idx(skip, bx, by, decide)

        # intra/inter flag
        is_intra = decide("is_intra", bx=bx, by=by, bs=bs)
        ictx = get_intra_ctx(a, l, by4, bx4, have_top, have_left)
        msac.encode_bool_adapt(1 - is_intra, cdf.m.intra[ictx])

        if is_intra:
            self._encode_intra_in_inter(bs, bx, by, decide, skip, has_chroma)
            return

        # compound flag (coded when hdr.switchable_comp_refs and the block
        # is at least 8x8)
        is_comp = 0
        if self.frame_hdr.switchable_comp_refs and min(bw4, bh4) > 1:
            is_comp = decide("is_comp", bx=bx, by=by)
            cctx = env.get_comp_ctx(a, l, by4, bx4, have_top, have_left)
            msac.encode_bool_adapt(is_comp, cdf.m.comp[cctx])
        if is_comp:
            self._encode_comp(bs, bx, by, decide, skip, has_chroma,
                              edge_flags)
            return

        ref0 = decide("ref", bx=bx, by=by)
        ctx1 = env.av1_get_ref_ctx(a, l, by4, bx4, have_top, have_left)
        msac.encode_bool_adapt(int(ref0 >= 4), cdf.m.ref[0][ctx1])
        if ref0 >= 4:
            ctx2 = env.av1_get_ref_2_ctx(a, l, by4, bx4, have_top, have_left)
            msac.encode_bool_adapt(int(ref0 == 6), cdf.m.ref[1][ctx2])
            if ref0 != 6:
                ctx3 = env.av1_get_ref_6_ctx(a, l, by4, bx4, have_top,
                                             have_left)
                msac.encode_bool_adapt(ref0 - 4, cdf.m.ref[5][ctx3])
        else:
            ctx2 = env.av1_get_ref_3_ctx(a, l, by4, bx4, have_top, have_left)
            msac.encode_bool_adapt(int(ref0 >= 2), cdf.m.ref[2][ctx2])
            if ref0 >= 2:
                ctx3 = env.av1_get_ref_5_ctx(a, l, by4, bx4, have_top,
                                             have_left)
                msac.encode_bool_adapt(ref0 - 2, cdf.m.ref[4][ctx3])
            else:
                ctx3 = env.av1_get_ref_4_ctx(a, l, by4, bx4, have_top,
                                             have_left)
                msac.encode_bool_adapt(ref0, cdf.m.ref[3][ctx3])

        mvstack, n_mvs, ctx = refmvs_find(self.rt, (ref0 + 1, -1), bs,
                                          edge_flags, by, bx)
        mode = decide("inter_mode", bx=bx, by=by, n_mvs=n_mvs)
        drl_idx = 0
        if mode == IPM.GLOBALMV:
            msac.encode_bool_adapt(1, cdf.m.newmv_mode[ctx & 7])
            msac.encode_bool_adapt(0, cdf.m.globalmv_mode[(ctx >> 3) & 1])
            mv = get_gmv_2d(hdr.gmv[ref0], bx, by, bw4, bh4, hdr)
            has_subpel = min(bw4, bh4) == 1 or hdr.gmv[ref0].type == 1
        elif mode in (IPM.NEARESTMV, IPM.NEARMV):
            msac.encode_bool_adapt(1, cdf.m.newmv_mode[ctx & 7])
            msac.encode_bool_adapt(1, cdf.m.globalmv_mode[(ctx >> 3) & 1])
            msac.encode_bool_adapt(int(mode == IPM.NEARMV),
                                   cdf.m.refmv_mode[(ctx >> 4) & 15])
            has_subpel = 1
            if mode == IPM.NEARMV:
                drl_idx = 1
                if n_mvs > 2:
                    drl_ctx = env.get_drl_context(mvstack, 1)
                    more = decide("drl_more", bx=bx, by=by, n_mvs=n_mvs)
                    msac.encode_bool_adapt(more, cdf.m.drl_bit[drl_ctx])
                    drl_idx += more
                    if drl_idx == 2 and n_mvs > 3:
                        drl_ctx = env.get_drl_context(mvstack, 2)
                        more = decide("drl_more", bx=bx, by=by, n_mvs=n_mvs)
                        msac.encode_bool_adapt(more, cdf.m.drl_bit[drl_ctx])
                        drl_idx += more
            mv = mvstack[drl_idx]["mv"][0]
            if drl_idx < 2:
                mv = fix_mv_precision(hdr, *mv)
        else:  # NEWMV
            msac.encode_bool_adapt(0, cdf.m.newmv_mode[ctx & 7])
            has_subpel = 1
            if n_mvs > 1:
                drl_ctx = env.get_drl_context(mvstack, 0)
                more = decide("drl_more", bx=bx, by=by, n_mvs=n_mvs)
                msac.encode_bool_adapt(more, cdf.m.drl_bit[drl_ctx])
                drl_idx += more
                if drl_idx == 1 and n_mvs > 2:
                    drl_ctx = env.get_drl_context(mvstack, 1)
                    more = decide("drl_more", bx=bx, by=by, n_mvs=n_mvs)
                    msac.encode_bool_adapt(more, cdf.m.drl_bit[drl_ctx])
                    drl_idx += more
            if n_mvs > 1:
                ref_mv = mvstack[drl_idx]["mv"][0]
            else:
                ref_mv = fix_mv_precision(hdr, *mvstack[0]["mv"][0])
            dy, dx = decide("mv_diff", bx=bx, by=by)
            mv = (ref_mv[0] + dy, ref_mv[1] + dx)
            joint = (2 if dy else 0) | (1 if dx else 0)
            msac.encode_symbol(joint, cdf.mv_joint, 3)
            mv_prec = hdr.hp - hdr.force_integer_mv
            if dy:
                _encode_mv_component(msac, cdf.mv[0], dy, mv_prec)
            if dx:
                _encode_mv_component(msac, cdf.mv[1], dx, mv_prec)

        # interintra: seq off. motion mode: switchable_motion_mode=0.
        # subpel filter (mode=switchable, dual_filter=0 -> one symbol)
        if has_subpel:
            filt = decide("filter", bx=bx, by=by)
            fctx = env.get_filter_ctx(a, l, 0, 0, ref0, by4, bx4)
            msac.encode_symbol(filt, cdf.m.filter[0][fctx], 2)
            filter_ = [filt, filt]
        else:
            filter_ = [0, 0]

        # var-tx tree (mirror read_vartx_tree; txfm_mode is switchable
        # and qidx>0 -> not lossless)
        assert self.cfg.qidx > 0, "inter generator requires qidx > 0"
        max_ytx = int(tables.max_txfm_size_for_bs[bs][0])
        tx_split = [0, 0]
        if not skip and max_ytx == TxfmSize.TX_4X4:
            a.tx[bx4 : bx4 + bw4] = TxfmSize.TX_4X4
            l.tx[by4 : by4 + bh4] = TxfmSize.TX_4X4
        elif skip:
            a.tx[bx4 : bx4 + bw4] = int(b_dim[2])
            l.tx[by4 : by4 + bh4] = int(b_dim[3])
        else:
            ytx = tables.txfm_info()[max_ytx]
            yw, yh = int(ytx[0]), int(ytx[1])
            y = 0
            y_off = 0
            while y < bh4:
                x = 0
                x_off = 0
                while x < bw4:
                    self._encode_tx_tree(max_ytx, 0, tx_split, x_off, y_off,
                                         bx + x, by + y, decide)
                    x += yw
                    x_off += 1
                y += yh
                y_off += 1
        uvtx = int(tables.max_txfm_size_for_bs[bs][1])  # 4:2:0

        # coefficients (mirror recon_b_inter's coef walk)
        if skip:
            a.lcoef[bx4 : bx4 + bw4] = 0x40
            l.lcoef[by4 : by4 + bh4] = 0x40
            if has_chroma:
                for pl in range(2):
                    a.ccoef[pl][cbx4 : cbx4 + cbw4] = 0x40
                    l.ccoef[pl][cby4 : cby4 + cbh4] = 0x40
        else:
            self._encode_inter_coefs(bs, max_ytx, uvtx, tx_split, bx, by,
                                     bw4, bh4, w4, h4, has_chroma, decide)

        # splat + context updates (mirror _decode_b_inter tail)
        mf = int(mode == IPM.GLOBALMV and min(bw4, bh4) >= 2) | \
            (2 * int(mode == IPM.NEWMV))
        splat_mv(self.rf, by, bx, bw4, bh4, mv, (0, 0), ref0 + 1, -1, bs, mf)
        a.seg_pred[bx4 : bx4 + bw4] = 0
        a.skip_mode[bx4 : bx4 + bw4] = 0
        a.intra[bx4 : bx4 + bw4] = 0
        a.skip[bx4 : bx4 + bw4] = skip
        a.pal_sz[bx4 : bx4 + bw4] = 0
        a.tx_intra[bx4 : bx4 + bw4] = int(b_dim[2])
        a.comp_type[bx4 : bx4 + bw4] = 0
        a.filter[0][bx4 : bx4 + bw4] = filter_[0]
        a.filter[1][bx4 : bx4 + bw4] = filter_[1]
        a.mode[bx4 : bx4 + bw4] = mode
        a.ref[0][bx4 : bx4 + bw4] = ref0
        a.ref[1][bx4 : bx4 + bw4] = -1
        l.seg_pred[by4 : by4 + bh4] = 0
        l.skip_mode[by4 : by4 + bh4] = 0
        l.intra[by4 : by4 + bh4] = 0
        l.skip[by4 : by4 + bh4] = skip
        l.pal_sz[by4 : by4 + bh4] = 0
        l.tx_intra[by4 : by4 + bh4] = int(b_dim[3])
        l.comp_type[by4 : by4 + bh4] = 0
        l.filter[0][by4 : by4 + bh4] = filter_[0]
        l.filter[1][by4 : by4 + bh4] = filter_[1]
        l.mode[by4 : by4 + bh4] = mode
        l.ref[0][by4 : by4 + bh4] = ref0
        l.ref[1][by4 : by4 + bh4] = -1
        if has_chroma:
            a.uvmode[cbx4 : cbx4 + cbw4] = M.DC_PRED
            l.uvmode[cby4 : cby4 + cbh4] = M.DC_PRED

    def _encode_comp(self, bs, bx, by, decide, skip, has_chroma,
                     edge_flags):
        """Compound AVG blocks (mirror _decode_b_inter's is_comp branch;
        seq.masked_compound/jnt_comp off -> comp_type is always AVG)."""
        from dav1d_tpu import env
        from dav1d_tpu.levels import (CompInterPredMode as CIPM,
                                      CompInterType, InterPredMode as IPM,
                                      TxfmSize)
        from dav1d_tpu.refmvs import (fix_mv_precision, get_gmv_2d,
                                      refmvs_find, splat_mv)
        cdf = self.cdf
        msac = self.msac
        hdr = self.frame_hdr
        b_dim = tables.block_dimensions[bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        bx4, by4 = bx & 31, by & 31
        cbx4, cby4 = bx4 >> 1, by4 >> 1
        cbw4, cbh4 = (bw4 + 1) >> 1, (bh4 + 1) >> 1
        w4 = min(bw4, self.bw - bx)
        h4 = min(bh4, self.bh - by)
        have_top = by > 0
        have_left = bx > 0
        a, l = self.cur_a, self.l

        ref0, ref1 = decide("comp_refs", bx=bx, by=by)
        is_bidir = ref0 < 4 <= ref1
        dctx = env.get_comp_dir_ctx(a, l, by4, bx4, have_top, have_left)
        msac.encode_bool_adapt(int(is_bidir), cdf.m.comp_dir[dctx])
        if is_bidir:
            c1 = env.av1_get_fwd_ref_ctx(a, l, by4, bx4, have_top, have_left)
            msac.encode_bool_adapt(int(ref0 >= 2), cdf.m.comp_fwd_ref[0][c1])
            if ref0 >= 2:
                c2 = env.av1_get_fwd_ref_2_ctx(a, l, by4, bx4, have_top,
                                               have_left)
                msac.encode_bool_adapt(ref0 - 2, cdf.m.comp_fwd_ref[2][c2])
            else:
                c2 = env.av1_get_fwd_ref_1_ctx(a, l, by4, bx4, have_top,
                                               have_left)
                msac.encode_bool_adapt(ref0, cdf.m.comp_fwd_ref[1][c2])
            c3 = env.av1_get_bwd_ref_ctx(a, l, by4, bx4, have_top, have_left)
            msac.encode_bool_adapt(int(ref1 == 6), cdf.m.comp_bwd_ref[0][c3])
            if ref1 != 6:
                c4 = env.av1_get_bwd_ref_1_ctx(a, l, by4, bx4, have_top,
                                               have_left)
                msac.encode_bool_adapt(ref1 - 4, cdf.m.comp_bwd_ref[1][c4])
        else:
            up = env.av1_get_uni_p_ctx(a, l, by4, bx4, have_top, have_left)
            msac.encode_bool_adapt(int((ref0, ref1) == (4, 6)),
                                   cdf.m.comp_uni_ref[0][up])
            if (ref0, ref1) != (4, 6):
                assert ref0 == 0 and 1 <= ref1 <= 3
                up1 = env.av1_get_uni_p1_ctx(a, l, by4, bx4, have_top,
                                             have_left)
                msac.encode_bool_adapt(int(ref1 >= 2),
                                       cdf.m.comp_uni_ref[1][up1])
                if ref1 >= 2:
                    up2 = env.av1_get_uni_p2_ctx(a, l, by4, bx4, have_top,
                                                 have_left)
                    msac.encode_bool_adapt(ref1 - 2,
                                           cdf.m.comp_uni_ref[2][up2])

        mvstack, n_mvs, ctx = refmvs_find(
            self.rt, (ref0 + 1, ref1 + 1), bs, edge_flags, by, bx)
        cmode = decide("comp_mode", bx=bx, by=by, n_mvs=n_mvs)
        msac.encode_symbol(cmode, cdf.m.comp_inter_mode[ctx], 7)
        im = tables.comp_inter_pred_modes[cmode]
        drl_idx = 0
        if cmode == CIPM.NEWMV_NEWMV:
            if n_mvs > 1:
                drl_ctx = env.get_drl_context(mvstack, 0)
                more = decide("drl_more", bx=bx, by=by, n_mvs=n_mvs)
                msac.encode_bool_adapt(more, cdf.m.drl_bit[drl_ctx])
                drl_idx += more
                if drl_idx == 1 and n_mvs > 2:
                    drl_ctx = env.get_drl_context(mvstack, 1)
                    more = decide("drl_more", bx=bx, by=by, n_mvs=n_mvs)
                    msac.encode_bool_adapt(more, cdf.m.drl_bit[drl_ctx])
                    drl_idx += more
        elif int(im[0]) == IPM.NEARMV or int(im[1]) == IPM.NEARMV:
            drl_idx = 1
            if n_mvs > 2:
                drl_ctx = env.get_drl_context(mvstack, 1)
                more = decide("drl_more", bx=bx, by=by, n_mvs=n_mvs)
                msac.encode_bool_adapt(more, cdf.m.drl_bit[drl_ctx])
                drl_idx += more
                if drl_idx == 2 and n_mvs > 3:
                    drl_ctx = env.get_drl_context(mvstack, 2)
                    more = decide("drl_more", bx=bx, by=by, n_mvs=n_mvs)
                    msac.encode_bool_adapt(more, cdf.m.drl_bit[drl_ctx])
                    drl_idx += more

        has_subpel = min(bw4, bh4) == 1 or cmode != CIPM.GLOBALMV_GLOBALMV
        mv = [None, None]
        refs = (ref0, ref1)
        for idx in range(2):
            mode_i = int(im[idx])
            if mode_i in (IPM.NEARMV, IPM.NEARESTMV):
                mv[idx] = fix_mv_precision(hdr,
                                           *mvstack[drl_idx]["mv"][idx])
            elif mode_i == IPM.GLOBALMV:
                has_subpel |= hdr.gmv[refs[idx]].type == 1
                mv[idx] = get_gmv_2d(hdr.gmv[refs[idx]], bx, by, bw4, bh4,
                                     hdr)
            else:  # NEWMV
                base = mvstack[drl_idx]["mv"][idx]
                dy, dx = decide("mv_diff", bx=bx, by=by)
                mv[idx] = (base[0] + dy, base[1] + dx)
                joint = (2 if dy else 0) | (1 if dx else 0)
                msac.encode_symbol(joint, cdf.mv_joint, 3)
                mv_prec = hdr.hp - hdr.force_integer_mv
                if dy:
                    _encode_mv_component(msac, cdf.mv[0], dy, mv_prec)
                if dx:
                    _encode_mv_component(msac, cdf.mv[1], dx, mv_prec)

        # seq.masked_compound off -> no segwedge bit; seq.jnt_comp off ->
        # comp_type AVG with no bit
        comp_type = CompInterType.AVG
        if has_subpel:
            filt = decide("filter", bx=bx, by=by)
            fctx = env.get_filter_ctx(a, l, 1, 0, ref0, by4, bx4)
            msac.encode_symbol(filt, cdf.m.filter[0][fctx], 2)
            filter_ = [filt, filt]
        else:
            filter_ = [0, 0]

        # var-tx + coefs (same as single-ref)
        max_ytx = int(tables.max_txfm_size_for_bs[bs][0])
        tx_split = [0, 0]
        if not skip and max_ytx == TxfmSize.TX_4X4:
            a.tx[bx4 : bx4 + bw4] = TxfmSize.TX_4X4
            l.tx[by4 : by4 + bh4] = TxfmSize.TX_4X4
        elif skip:
            a.tx[bx4 : bx4 + bw4] = int(b_dim[2])
            l.tx[by4 : by4 + bh4] = int(b_dim[3])
        else:
            ytx = tables.txfm_info()[max_ytx]
            yw, yh = int(ytx[0]), int(ytx[1])
            y = 0
            y_off = 0
            while y < bh4:
                x = 0
                x_off = 0
                while x < bw4:
                    self._encode_tx_tree(max_ytx, 0, tx_split, x_off, y_off,
                                         bx + x, by + y, decide)
                    x += yw
                    x_off += 1
                y += yh
                y_off += 1
        uvtx = int(tables.max_txfm_size_for_bs[bs][1])
        if skip:
            a.lcoef[bx4 : bx4 + bw4] = 0x40
            l.lcoef[by4 : by4 + bh4] = 0x40
            if has_chroma:
                for pl in range(2):
                    a.ccoef[pl][cbx4 : cbx4 + cbw4] = 0x40
                    l.ccoef[pl][cby4 : cby4 + cbh4] = 0x40
        else:
            self._encode_inter_coefs(bs, max_ytx, uvtx, tx_split, bx, by,
                                     bw4, bh4, w4, h4, has_chroma, decide)

        mf = int(cmode == CIPM.GLOBALMV_GLOBALMV) | \
            (2 * int(bool((1 << cmode) & 0xBC)))
        splat_mv(self.rf, by, bx, bw4, bh4, mv[0], mv[1], ref0 + 1,
                 ref1 + 1, bs, mf)
        a.seg_pred[bx4 : bx4 + bw4] = 0
        a.skip_mode[bx4 : bx4 + bw4] = 0
        a.intra[bx4 : bx4 + bw4] = 0
        a.skip[bx4 : bx4 + bw4] = skip
        a.pal_sz[bx4 : bx4 + bw4] = 0
        a.tx_intra[bx4 : bx4 + bw4] = int(b_dim[2])
        a.comp_type[bx4 : bx4 + bw4] = comp_type
        a.filter[0][bx4 : bx4 + bw4] = filter_[0]
        a.filter[1][bx4 : bx4 + bw4] = filter_[1]
        a.mode[bx4 : bx4 + bw4] = cmode
        a.ref[0][bx4 : bx4 + bw4] = ref0
        a.ref[1][bx4 : bx4 + bw4] = ref1
        l.seg_pred[by4 : by4 + bh4] = 0
        l.skip_mode[by4 : by4 + bh4] = 0
        l.intra[by4 : by4 + bh4] = 0
        l.skip[by4 : by4 + bh4] = skip
        l.pal_sz[by4 : by4 + bh4] = 0
        l.tx_intra[by4 : by4 + bh4] = int(b_dim[3])
        l.comp_type[by4 : by4 + bh4] = comp_type
        l.filter[0][by4 : by4 + bh4] = filter_[0]
        l.filter[1][by4 : by4 + bh4] = filter_[1]
        l.mode[by4 : by4 + bh4] = cmode
        l.ref[0][by4 : by4 + bh4] = ref0
        l.ref[1][by4 : by4 + bh4] = ref1
        if has_chroma:
            a.uvmode[cbx4 : cbx4 + cbw4] = M.DC_PRED
            l.uvmode[cby4 : cby4 + cbh4] = M.DC_PRED

    def _encode_intra_in_inter(self, bs, bx, by, decide, skip, has_chroma):
        """Intra block in an inter frame (mirror _decode_b_intra with
        frame_is_inter=1): y_mode uses the size-group cdf; ref/filter
        neighbour contexts are reset; an invalid MV is splatted."""
        from dav1d_tpu.decode.tile import get_tx_ctx
        from dav1d_tpu.refmvs import splat_mv, INVALID_MV_Y
        cdf = self.cdf
        msac = self.msac
        b_dim = tables.block_dimensions[bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        bx4, by4 = bx & 31, by & 31
        cbx4, cby4 = bx4 >> 1, by4 >> 1
        cbw4, cbh4 = (bw4 + 1) >> 1, (bh4 + 1) >> 1
        a, l = self.cur_a, self.l

        y_mode = decide("y_mode", bx=bx, by=by, bs=bs)
        msac.encode_symbol(
            y_mode, cdf.m.y_mode[int(tables.ymode_size_context[bs])], 12)
        y_angle = 0
        if int(b_dim[2]) + int(b_dim[3]) >= 2 and \
                M.VERT_PRED <= y_mode <= M.VERT_LEFT_PRED:
            y_angle = decide("y_angle", bx=bx, by=by, mode=y_mode)
            msac.encode_symbol(
                y_angle + 3, cdf.m.angle_delta[y_mode - M.VERT_PRED], 6)
        uv_mode = M.DC_PRED
        uv_angle = 0
        if has_chroma:
            cfl_allowed = bool(CFL_ALLOWED_MASK & (1 << bs))
            uv_mode = decide("uv_mode", bx=bx, by=by, bs=bs,
                             cfl_allowed=False)
            msac.encode_symbol(uv_mode, cdf.m.uv_mode[int(cfl_allowed)][
                y_mode], 13 - (not cfl_allowed))
            assert uv_mode != M.CFL_PRED
            if int(b_dim[2]) + int(b_dim[3]) >= 2 and \
                    M.VERT_PRED <= uv_mode <= M.VERT_LEFT_PRED:
                uv_angle = decide("uv_angle", bx=bx, by=by, mode=uv_mode)
                msac.encode_symbol(
                    uv_angle + 3, cdf.m.angle_delta[uv_mode - M.VERT_PRED],
                    6)
        # palette: allow_screen_content off -> no bits
        # filter intra
        if y_mode == M.DC_PRED and \
                max(int(b_dim[2]), int(b_dim[3])) <= 3 and \
                self.cfg.filter_intra:
            filt = decide("filter_intra", bx=bx, by=by)
            is_filter = int(filt is not None)
            msac.encode_bool_adapt(is_filter, cdf.m.use_filter_intra[bs])
            if is_filter:
                msac.encode_symbol(filt, cdf.m.filter_intra, 4)
                y_mode = M.FILTER_PRED
                y_angle = filt
        # tx size (switchable, not lossless)
        tx = int(tables.max_txfm_size_for_bs[bs][0])
        t_dim = tables.txfm_info()[tx]
        if int(t_dim[5]) > TxfmSize.TX_4X4:
            depth = decide("tx_depth", bx=bx, by=by, bs=bs,
                           max_depth=min(int(t_dim[5]), 2))
            tctx = get_tx_ctx(a, l, int(t_dim[2]), int(t_dim[3]), by4, bx4)
            msac.encode_symbol(depth, cdf.m.txsz[int(t_dim[5]) - 1][tctx],
                               min(int(t_dim[5]), 2))
            for _ in range(depth):
                tx = int(t_dim[6])
                t_dim = tables.txfm_info()[tx]
        coef_y_mode = y_mode
        if y_mode == M.FILTER_PRED:
            coef_y_mode = int(tables.filter_mode_to_y_mode[y_angle])
        if skip:
            a.lcoef[bx4 : bx4 + bw4] = 0x40
            l.lcoef[by4 : by4 + bh4] = 0x40
            if has_chroma:
                for pl in range(2):
                    a.ccoef[pl][cbx4 : cbx4 + cbw4] = 0x40
                    l.ccoef[pl][cby4 : cby4 + cbh4] = 0x40
        else:
            self._encode_coefs(bs, tx, bx, by, bw4, bh4, has_chroma, decide,
                               coef_y_mode, uv_mode)
        y_mode_nofilt = M.DC_PRED if y_mode == M.FILTER_PRED else y_mode
        lw, lh = int(t_dim[2]), int(t_dim[3])
        a.tx_intra[bx4 : bx4 + bw4] = lw
        a.tx[bx4 : bx4 + bw4] = lw
        a.mode[bx4 : bx4 + bw4] = y_mode_nofilt
        a.pal_sz[bx4 : bx4 + bw4] = 0
        a.seg_pred[bx4 : bx4 + bw4] = 0
        a.skip_mode[bx4 : bx4 + bw4] = 0
        a.intra[bx4 : bx4 + bw4] = 1
        a.skip[bx4 : bx4 + bw4] = skip
        l.tx_intra[by4 : by4 + bh4] = lh
        l.tx[by4 : by4 + bh4] = lh
        l.mode[by4 : by4 + bh4] = y_mode_nofilt
        l.pal_sz[by4 : by4 + bh4] = 0
        l.seg_pred[by4 : by4 + bh4] = 0
        l.skip_mode[by4 : by4 + bh4] = 0
        l.intra[by4 : by4 + bh4] = 1
        l.skip[by4 : by4 + bh4] = skip
        a.comp_type[bx4 : bx4 + bw4] = 0
        a.ref[0][bx4 : bx4 + bw4] = -1
        a.ref[1][bx4 : bx4 + bw4] = -1
        a.filter[0][bx4 : bx4 + bw4] = 3
        a.filter[1][bx4 : bx4 + bw4] = 3
        l.comp_type[by4 : by4 + bh4] = 0
        l.ref[0][by4 : by4 + bh4] = -1
        l.ref[1][by4 : by4 + bh4] = -1
        l.filter[0][by4 : by4 + bh4] = 3
        l.filter[1][by4 : by4 + bh4] = 3
        if has_chroma:
            a.uvmode[cbx4 : cbx4 + cbw4] = uv_mode
            l.uvmode[cby4 : cby4 + cbh4] = uv_mode
        splat_mv(self.rf, by, bx, bw4, bh4, (INVALID_MV_Y, INVALID_MV_Y),
                 (0, 0), 0, -1, bs, 0)

    def _encode_tx_tree(self, from_tx, depth, masks, x_off, y_off, bx, by,
                        decide):
        """Mirror read_tx_tree (decode/tile.py)."""
        bx4, by4 = bx & 31, by & 31
        t_dim = tables.txfm_info()[from_tx]
        txw, txh = int(t_dim[2]), int(t_dim[3])
        tw, th = int(t_dim[0]), int(t_dim[1])
        a, l = self.cur_a, self.l
        if depth < 2 and from_tx > TxfmSize.TX_4X4:
            cat = 2 * (TxfmSize.TX_64X64 - int(t_dim[5])) - depth
            actx = int(int(a.tx[bx4]) < txw)
            lctx = int(int(l.tx[by4]) < txh)
            is_split = decide("tx_split", bx=bx, by=by, depth=depth)
            self.msac.encode_bool_adapt(is_split,
                                        self.cdf.m.txpart[cat][actx + lctx])
            if is_split:
                masks[depth] |= 1 << (y_off * 4 + x_off)
        else:
            is_split = 0
        if is_split and int(t_dim[5]) > TxfmSize.TX_8X8:
            sub = int(t_dim[6])
            sub_t = tables.txfm_info()[sub]
            txsw, txsh = int(sub_t[0]), int(sub_t[1])
            self._encode_tx_tree(sub, depth + 1, masks, x_off * 2, y_off * 2,
                                 bx, by, decide)
            if tw >= th and bx + txsw < self.bw:
                self._encode_tx_tree(sub, depth + 1, masks, x_off * 2 + 1,
                                     y_off * 2, bx + txsw, by, decide)
            if th >= tw and by + txsh < self.bh:
                self._encode_tx_tree(sub, depth + 1, masks, x_off * 2,
                                     y_off * 2 + 1, bx, by + txsh, decide)
                if tw >= th and bx + txsw < self.bw:
                    self._encode_tx_tree(sub, depth + 1, masks,
                                         x_off * 2 + 1, y_off * 2 + 1,
                                         bx + txsw, by + txsh, decide)
        else:
            a.tx[bx4 : bx4 + tw] = TxfmSize.TX_4X4 if is_split else txw
            l.tx[by4 : by4 + th] = TxfmSize.TX_4X4 if is_split else txh

    def _encode_inter_coefs(self, bs, max_ytx, uvtx, tx_split, bx, by,
                            bw4, bh4, w4, h4, has_chroma, decide):
        """Mirror recon_b_inter's coefficient walk: luma via the var-tx
        tree (read_coef_tree), then chroma with uv txtp derived from the
        co-located luma txtp."""
        from dav1d_tpu.levels import TxfmType
        from dav1d_tpu.recon.coef import get_uv_inter_txtp
        from .coef_enc import encode_coefs
        txtp_map = {}

        def walk(ytx, depth, x_off, y_off, px, py):
            t_dim = tables.txfm_info()[ytx]
            tw, th = int(t_dim[0]), int(t_dim[1])
            if depth < 2 and tx_split[depth] and \
                    tx_split[depth] & (1 << (y_off * 4 + x_off)):
                sub = int(t_dim[6])
                sub_t = tables.txfm_info()[sub]
                tsw, tsh = int(sub_t[0]), int(sub_t[1])
                walk(sub, depth + 1, x_off * 2, y_off * 2, px, py)
                if tw >= th and px + tsw < self.bw:
                    walk(sub, depth + 1, x_off * 2 + 1, y_off * 2,
                         px + tsw, py)
                if th >= tw and py + tsh < self.bh:
                    walk(sub, depth + 1, x_off * 2, y_off * 2 + 1, px,
                         py + tsh)
                    if tw >= th and px + tsw < self.bw:
                        walk(sub, depth + 1, x_off * 2 + 1, y_off * 2 + 1,
                             px + tsw, py + tsh)
            else:
                lbx4, lby4 = px & 31, py & 31
                txtp, levels, signs = decide(
                    "coef", bx=px, by=py, tx=ytx, plane=0,
                    t_dim=tables.txfm_info()[ytx], intra=0, y_mode=0)
                ctx = encode_coefs(
                    self.msac, self.cdf, self.cur_a.lcoef, lbx4,
                    self.l.lcoef, lby4, ytx, bs, 0, 0, 0, 0, self.cfg.qidx,
                    0, 0, txtp, levels, signs)
                self.cur_a.lcoef[lbx4 : lbx4 + min(tw, self.bw - px)] = ctx
                self.l.lcoef[lby4 : lby4 + min(th, self.bh - py)] = ctx
                # an all-skip TX decodes as DCT_DCT (decode_coefs eob=-1
                # path); the decided txtp was never coded
                eff_txtp = txtp if levels else TxfmType.DCT_DCT
                for yy in range(th):
                    for xx in range(tw):
                        txtp_map[(py + yy, px + xx)] = eff_txtp

        ytx_t = tables.txfm_info()[max_ytx]
        yw, yh = int(ytx_t[0]), int(ytx_t[1])
        uv_t = tables.txfm_info()[uvtx]
        utw, uth = int(uv_t[0]), int(uv_t[1])
        cbx4, cby4 = (bx & 31) >> 1, (by & 31) >> 1
        cw4 = (w4 + 1) >> 1
        ch4 = (h4 + 1) >> 1
        for init_y in range(0, bh4, 16):
            for init_x in range(0, bw4, 16):
                y_off = int(bool(init_y))
                y = init_y
                while y < min(h4, init_y + 16):
                    x = init_x
                    x_off = int(bool(init_x))
                    while x < min(w4, init_x + 16):
                        walk(max_ytx, 0, x_off, y_off, bx + x, by + y)
                        x += yw
                        x_off += 1
                    y += yh
                    y_off += 1
                if has_chroma:
                    for pl in range(2):
                        y = init_y >> 1
                        while y < min(ch4, (init_y + 16) >> 1):
                            x = init_x >> 1
                            while x < min(cw4, (init_x + 16) >> 1):
                                ytxtp = txtp_map[(by + (y << 1),
                                                  bx + (x << 1))]
                                if int(uv_t[5]) >= TxfmSize.TX_32X32:
                                    uv_txtp = TxfmType.DCT_DCT
                                else:
                                    uv_txtp = get_uv_inter_txtp(
                                        uv_t, TxfmType(int(ytxtp)))
                                _, levels, signs = decide(
                                    "coef", bx=bx + x * 2, by=by + y * 2,
                                    tx=uvtx, plane=1 + pl, t_dim=uv_t,
                                    intra=0, y_mode=0, fixed_txtp=uv_txtp)
                                ctx = encode_coefs(
                                    self.msac, self.cdf,
                                    self.cur_a.ccoef[pl], cbx4 + x,
                                    self.l.ccoef[pl], cby4 + y, uvtx, bs,
                                    0, 0, 0, 0, self.cfg.qidx, 1 + pl, 0,
                                    uv_txtp, levels, signs)
                                ctw = min(
                                    utw, (self.bw - (bx + 2 * x) + 1) >> 1)
                                cth = min(
                                    uth, (self.bh - (by + 2 * y) + 1) >> 1)
                                self.cur_a.ccoef[pl][
                                    cbx4 + x : cbx4 + x + ctw] = ctx
                                self.l.ccoef[pl][
                                    cby4 + y : cby4 + y + cth] = ctx
                                x += utw
                            y += uth


def _encode_mv_component(msac, mv_comp, diff, mv_prec):
    """Inverse of read_mv_component_diff (decode/tile.py): diff != 0,
    |diff| <= 16384. With mv_prec < 1 the low bits must match the decoder
    defaults (fp=3, hp=1)."""
    assert diff
    sign = int(diff < 0)
    mag = abs(diff) - 1
    hp = mag & 1
    fp = (mag >> 1) & 3
    up = mag >> 3
    msac.encode_bool_adapt(sign, mv_comp.sign)
    cl = 0 if up <= 1 else up.bit_length() - 1
    msac.encode_symbol(cl, mv_comp.classes, 10)
    if not cl:
        msac.encode_bool_adapt(up, mv_comp.class0)
        if mv_prec >= 0:
            msac.encode_symbol(fp, mv_comp.class0_fp[up], 3)
            if mv_prec > 0:
                msac.encode_bool_adapt(hp, mv_comp.class0_hp)
            else:
                assert hp == 1
        else:
            assert fp == 3 and hp == 1
    else:
        for n in range(cl):
            msac.encode_bool_adapt((up >> n) & 1, mv_comp.classN[n])
        if mv_prec >= 0:
            msac.encode_symbol(fp, mv_comp.classN_fp, 3)
            if mv_prec > 0:
                msac.encode_bool_adapt(hp, mv_comp.classN_hp)
            else:
                assert hp == 1
        else:
            assert fp == 3 and hp == 1


def make_inter_stream(cfg: StreamConfig, decide_key, decide_inter,
                      comp: bool = False) -> bytes:
    """Two-frame stream: keyframe + single-ref inter frame referencing it."""
    from dav1d_tpu.getbits import GetBits
    from dav1d_tpu.obu import parse_frame_hdr, parse_seq_hdr

    rng = np.random.default_rng(cfg.seed)
    seq_bytes = write_seq_hdr(cfg)
    seq_hdr = parse_seq_hdr(GetBits(seq_bytes))

    wk = BitWriter()
    write_frame_hdr(cfg, wk)
    wk.bytealign()
    key_hdr_bytes = wk.tobytes()
    key_tile = TileEncoder(cfg, rng).encode_frame_tile(decide_key)
    key_frame = wrap_obu(OBU_FRAME, key_hdr_bytes + key_tile)

    w2 = BitWriter()
    write_inter_frame_hdr(cfg, w2, comp=comp)
    w2.bytealign()
    inter_hdr_bytes = w2.tobytes()

    # parse both headers back so the encoder sees the decoder's view
    class _Ctx:
        pass

    kctx = _Ctx()
    kctx.seq_hdr = seq_hdr
    kctx.strict_std_compliance = False
    kctx.refs = [None] * 8
    key_hdr = parse_frame_hdr(kctx, GetBits(key_hdr_bytes))

    class _Slot:
        pass

    slot = _Slot()
    slot.frame_hdr = key_hdr
    ictx = _Ctx()
    ictx.seq_hdr = seq_hdr
    ictx.strict_std_compliance = False
    ictx.refs = [slot] * 8
    inter_hdr = parse_frame_hdr(ictx, GetBits(inter_hdr_bytes))

    inter_tile = InterTileEncoder(cfg, rng, inter_hdr,
                                  seq_hdr).encode_frame_tile(decide_inter)
    inter_frame = wrap_obu(OBU_FRAME, inter_hdr_bytes + inter_tile)

    return (wrap_obu(OBU_TD, b"") + wrap_obu(OBU_SEQ_HDR, seq_bytes)
            + key_frame + wrap_obu(OBU_TD, b"") + inter_frame)
