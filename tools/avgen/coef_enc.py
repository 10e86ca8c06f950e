"""Coefficient encoder: exact inverse of dav1d_tpu.recon.coef.decode_coefs.

Given desired token levels at scan positions, emits skip/txtp/eob/token/sign
symbols with the same context derivations so encoder and decoder CDFs stay
in sync."""

from __future__ import annotations

import numpy as np

from dav1d_tpu import tables
from dav1d_tpu.levels import TxClass, TxfmSize, TxfmType, IntraPredMode as M, RTX_4X8
from dav1d_tpu.recon.coef import get_skip_ctx, get_dc_sign_ctx, get_lo_ctx


def encode_golomb(msac, v: int) -> None:
    """Inverse of read_golomb: v >= 0 -> exp-golomb code."""
    x = v + 1
    ln = x.bit_length() - 1
    for _ in range(ln):
        msac.encode_bool_equi(0)
    msac.encode_bool_equi(1)
    for i in range(ln - 1, -1, -1):
        msac.encode_bool_equi((x >> i) & 1)


def encode_coefs(enc, cdf, a, a_off, l, l_off, tx, bs, y_mode, uv_mode,
                 tx_depth_min, reduced_txtp_set, qidx, plane, intra,
                 txtp, levels_rc, signs_rc, layout=1):
    """levels_rc: dict rc -> token level (>=1); must be consistent with a
    legal eob chain. signs_rc: dict rc -> sign bit. Returns res_ctx byte."""
    msac = enc
    chroma = int(bool(plane))
    t_dim = tables.txfm_info()[tx]
    lw, lh = int(t_dim[2]), int(t_dim[3])
    tmin, tmax, tctx = int(t_dim[4]), int(t_dim[5]), int(t_dim[7])

    sctx = get_skip_ctx(t_dim, bs, a, a_off, l, l_off, chroma, layout)
    if not levels_rc:
        msac.encode_bool_adapt(1, cdf.coef.skip[tctx][sctx])
        return 0x40
    msac.encode_bool_adapt(0, cdf.coef.skip[tctx][sctx])

    # txtp signaling (mirror decode_coefs)
    if tmax + intra >= TxfmSize.TX_64X64:
        assert txtp == TxfmType.DCT_DCT
    elif chroma:
        pass  # derived, nothing coded
    elif not qidx:
        assert txtp == TxfmType.DCT_DCT
    else:
        if intra:
            y_mode_nofilt = y_mode
            if reduced_txtp_set or tmin == TxfmSize.TX_16X16:
                tset = [int(v) for v in tables.tx_types_per_set[0:5]]
                idx = tset.index(int(txtp))
                msac.encode_symbol(idx, cdf.m.txtp_intra2[tmin][y_mode_nofilt], 4)
            else:
                tset = [int(v) for v in tables.tx_types_per_set[5:12]]
                idx = tset.index(int(txtp))
                msac.encode_symbol(idx, cdf.m.txtp_intra1[tmin][y_mode_nofilt], 6)
        else:
            if reduced_txtp_set or tmax == TxfmSize.TX_32X32:
                msac.encode_bool_adapt(int(txtp == TxfmType.DCT_DCT),
                                       cdf.m.txtp_inter3[tmin])
            elif tmin == TxfmSize.TX_16X16:
                tset = [int(v) for v in tables.tx_types_per_set[12:24]]
                idx = tset.index(int(txtp))
                msac.encode_symbol(idx, cdf.m.txtp_inter2, 11)
            else:
                tset = [int(v) for v in tables.tx_types_per_set[24:40]]
                idx = tset.index(int(txtp))
                msac.encode_symbol(idx, cdf.m.txtp_inter1[tmin], 15)

    # scan/eob
    slw, slh = min(lw, 3), min(lh, 3)
    tx2dszctx = slw + slh
    tx_class = TxClass(int(tables.tx_type_class[txtp]))
    is_1d = int(tx_class != TxClass.TWO_D)

    if tx_class == TxClass.TWO_D:
        stride = 4 << slh
        shift, shift2 = slh + 2, 0
        mask = (4 << slh) - 1
        scan = tables.scans()[tx]
        nonsquare_tx = int(tx >= RTX_4X8)
        lo_ctx_offsets = tables.lo_ctx_offsets[nonsquare_tx + (tx & nonsquare_tx)]
        rc_of = lambda i: int(scan[i])
        n = stride * ((4 << slw) + 2)
    elif tx_class == TxClass.H:
        stride = 16
        shift, shift2 = slh + 2, 0
        mask = (4 << slh) - 1
        lo_ctx_offsets = None
        rc_of = lambda i: i
        n = stride * ((4 << slh) + 2)
    else:
        stride = 16
        shift, shift2 = slw + 2, slh + 2
        mask = (4 << slw) - 1
        lo_ctx_offsets = None
        rc_of = lambda i: (((i & mask) << shift2) | (i >> shift))
        n = stride * ((4 << slw) + 2)

    # eob = highest scan index with nonzero level
    n_coefs = (4 << slw) * (4 << slh)
    pos_of = {}
    for i in range(n_coefs):
        pos_of[rc_of(i)] = i
    eob = max(pos_of[rc] for rc in levels_rc)
    assert all(rc in pos_of for rc in levels_rc)

    # encode eob bin
    coefcdf = cdf.coef
    eob_sym = eob if eob < 2 else (eob.bit_length() - 1) + 1
    # decode: eob (raw symbol) <=2 direct; >=2: eob_bin chain
    # symbol value s: s<=1 -> eob = s; else eob in [2^(s-1), 2^s)
    if eob < 2:
        s = eob
    else:
        s = eob.bit_length()  # eob in [2^(s-1), 2^s) -> symbol s
    bins = {0: ("eob_bin_16", 4), 1: ("eob_bin_32", 5), 2: ("eob_bin_64", 6),
            3: ("eob_bin_128", 7), 4: ("eob_bin_256", 8),
            5: ("eob_bin_512", 9), 6: ("eob_bin_1024", 10)}
    name, nsym = bins[tx2dszctx]
    arr = getattr(coefcdf, name)
    ecdf = arr[chroma][is_1d] if tx2dszctx < 5 else arr[chroma]
    msac.encode_symbol(s, ecdf, nsym)
    if s > 1:
        eob_bin = s - 2
        hi_bit = (eob >> eob_bin) & 1
        msac.encode_bool_adapt(hi_bit,
                               coefcdf.eob_hi_bit[tctx][chroma][eob_bin])
        rest = eob & ((1 << eob_bin) - 1)
        msac.encode_bools(rest, eob_bin)

    eob_cdf = coefcdf.eob_base_tok[tctx][chroma]
    hi_cdf = coefcdf.br_tok[min(tctx, 3)][chroma]
    lo_cdf = coefcdf.base_tok[tctx][chroma]
    lvl = np.zeros(n, dtype=np.uint8)

    def hi_tok_encode(tok, hcdf):
        enc.encode_hi_tok(tok, hcdf)

    cul_level = 0

    if eob:
        rc = rc_of(eob)
        x, y = (rc >> shift, rc & mask) if tx_class == TxClass.TWO_D else \
            (eob & mask, eob >> shift)
        tok = levels_rc[rc]
        ctx = 1 + (eob > 2 << tx2dszctx) + (eob > 4 << tx2dszctx)
        eob_tok = min(tok - 1, 2)
        msac.encode_symbol(eob_tok, eob_cdf[ctx], 2)
        if eob_tok == 2:
            hctx = 14 if ((x | y) > 1 if tx_class == TxClass.TWO_D
                          else y != 0) else 7
            hi_tok_encode(min(tok, 15), hi_cdf[hctx])
        lvl_base = rc if tx_class == TxClass.TWO_D else x * stride + y
        lvl[lvl_base] = min(tok, 15)  # plain clamped magnitude plane

        for i in range(eob - 1, 0, -1):
            rc_i = rc_of(i)
            x, y = (rc_i >> shift, rc_i & mask) if tx_class == TxClass.TWO_D \
                else (i & mask, i >> shift)
            lvl_base = rc_i if tx_class == TxClass.TWO_D else x * stride + y
            ctx, br_mag = get_lo_ctx(lvl, lvl_base, tx_class,
                                     lo_ctx_offsets, x, y, stride)
            tok = levels_rc.get(rc_i, 0)
            lo = min(tok, 3)
            msac.encode_symbol(lo, lo_cdf[ctx], 3)
            if lo == 3:
                far = (x | y) > 1 if tx_class == TxClass.TWO_D else y > 0
                hctx = (14 if far else 7) + min(6, (br_mag + 1) >> 1)
                hi_tok_encode(min(tok, 15), hi_cdf[hctx])
                lvl[lvl_base] = min(tok, 15)
            else:
                lvl[lvl_base] = lo

        # dc
        if tx_class == TxClass.TWO_D:
            ctx = 0
            br_mag = 0
        else:
            ctx, br_mag = get_lo_ctx(lvl, 0, tx_class, lo_ctx_offsets,
                                     0, 0, stride)
        dc_tok_full = levels_rc.get(0, 0)
        lo = min(dc_tok_full, 3)
        msac.encode_symbol(lo, lo_cdf[ctx], 3)
        if lo == 3:
            if tx_class == TxClass.TWO_D:
                br_mag = int(lvl[1]) + int(lvl[stride]) + \
                    int(lvl[stride + 1])
            hi_tok_encode(min(dc_tok_full, 15),
                          hi_cdf[min(6, (br_mag + 1) >> 1)])
        dc_tok = dc_tok_full
    else:
        dc_tok = levels_rc[0]
        tok_br = min(dc_tok - 1, 2)
        msac.encode_symbol(tok_br, eob_cdf[0], 2)
        if tok_br == 2:
            hi_tok_encode(min(dc_tok, 15), hi_cdf[0])

    # signs + golomb residuals, mirroring the decoder's rc chain order
    dc_sign_level = 1 << 6
    if dc_tok:
        dc_sign_ctx = get_dc_sign_ctx(tx, a, a_off, l, l_off)
        dc_sign = signs_rc.get(0, 0)
        msac.encode_bool_adapt(dc_sign, coefcdf.dc_sign[chroma][dc_sign_ctx])
        dc_sign_level = (dc_sign - 1) & (2 << 6)
        if dc_tok >= 15:
            encode_golomb(msac, dc_tok - 15)
        cul_level += dc_tok & 0xFFFFF

    # ac chain: decoder traverses from scan index 1 upward? it follows the
    # rc chain built during parse: positions with nonzero tok, from scan
    # index 1 ascending (chain head = lowest nonzero scan index > 0).
    ac_positions = [rc_of(i) for i in range(1, (eob or 0) + 1)
                    if levels_rc.get(rc_of(i), 0)]
    for rc in ac_positions:
        tok = levels_rc[rc]
        msac.encode_bool_equi(signs_rc.get(rc, 0))
        if tok >= 15:
            encode_golomb(msac, tok - 15)
        cul_level += tok & 0xFFFFF

    return min(cul_level, 63) | dc_sign_level
