#!/usr/bin/env python3
"""Convert the raw table dump (tools/dump_tables.c output) into
dav1d_tpu/data/tables.npz with proper dtypes/shapes.

Shapes mirror the reference declarations (src/tables.h, src/cdf.h,
src/wedge.h) including SIMD padding; logical slicing happens in
dav1d_tpu/tables.py. Every record's byte size is checked against the
declared shape, so layout drift fails loudly.
"""

import struct
import sys
from pathlib import Path

import numpy as np

U8, I8, U16, I16 = np.uint8, np.int8, np.uint16, np.int16

# name -> (dtype, shape); shapes include padding. See reference decls.
DECLS = {
    "al_part_ctx": (U8, (2, 5, 10)),
    "block_sizes": (U8, (5, 10, 2)),
    "block_dimensions": (U8, (22, 4)),
    "txfm_dimensions": (U8, (19, 8)),  # TxfmInfo: w,h,lw,lh,min,max,sub,ctx
    "max_txfm_size_for_bs": (U8, (22, 4)),
    "txtp_from_uvmode": (U8, (14,)),
    "comp_inter_pred_modes": (U8, (8, 2)),
    "partition_type_count": (U8, (5,)),
    "tx_types_per_set": (U8, (40,)),
    "filter_mode_to_y_mode": (U8, (5,)),
    "ymode_size_context": (U8, (22,)),
    "lo_ctx_offsets": (U8, (3, 5, 5)),
    "skip_ctx": (U8, (5, 5)),
    "tx_type_class": (U8, (17,)),
    "filter_2d": (U8, (4, 4)),
    "filter_dir": (U8, (10, 2)),
    "intra_mode_context": (U8, (13,)),
    "wedge_ctx_lut": (U8, (22,)),
    "cdef_directions": (I8, (12, 2)),
    "sgr_params": (U16, (16, 2)),
    "sgr_x_by_x": (U8, (256,)),
    "mc_subpel_filters": (I8, (6, 15, 8)),
    "mc_warp_filter": (I8, (193, 8)),
    "resize_filter": (I8, (64, 8)),
    "sm_weights": (U8, (128,)),
    "dr_intra_derivative": (U16, (44,)),
    "filter_intra_taps": (I8, (5, 64)),
    "obmc_masks": (U8, (64,)),
    "gaussian_sequence": (I16, (2048,)),
    "dq_tbl": (U16, (3, 256, 2)),
    # CDF mode/mv/kf contexts (reference src/cdf.h:39-134), padded dims.
    "cdf.m.uv_mode": (U16, (2, 13, 16)),
    "cdf.m.partition": (U16, (5, 4, 16)),
    "cdf.m.cfl_alpha": (U16, (6, 16)),
    "cdf.m.txtp_inter1": (U16, (2, 16)),
    "cdf.m.txtp_inter2": (U16, (16,)),
    "cdf.m.txtp_intra1": (U16, (2, 13, 8)),
    "cdf.m.txtp_intra2": (U16, (3, 13, 8)),
    "cdf.m.cfl_sign": (U16, (8,)),
    "cdf.m.angle_delta": (U16, (8, 8)),
    "cdf.m.filter_intra": (U16, (8,)),
    "cdf.m.seg_id": (U16, (3, 8)),
    "cdf.m.pal_sz": (U16, (2, 7, 8)),
    "cdf.m.color_map": (U16, (2, 7, 5, 8)),
    "cdf.m.txsz": (U16, (4, 3, 4)),
    "cdf.m.delta_q": (U16, (4,)),
    "cdf.m.delta_lf": (U16, (5, 4)),
    "cdf.m.restore_switchable": (U16, (4,)),
    "cdf.m.restore_wiener": (U16, (2,)),
    "cdf.m.restore_sgrproj": (U16, (2,)),
    "cdf.m.txtp_inter3": (U16, (4, 2)),
    "cdf.m.use_filter_intra": (U16, (22, 2)),
    "cdf.m.txpart": (U16, (7, 3, 2)),
    "cdf.m.skip": (U16, (3, 2)),
    "cdf.m.pal_y": (U16, (7, 3, 2)),
    "cdf.m.pal_uv": (U16, (2, 2)),
    "cdf.m.intrabc": (U16, (2,)),
    "cdf.m.y_mode": (U16, (4, 16)),
    "cdf.m.wedge_idx": (U16, (9, 16)),
    "cdf.m.comp_inter_mode": (U16, (8, 8)),
    "cdf.m.filter": (U16, (2, 8, 4)),
    "cdf.m.interintra_mode": (U16, (4, 4)),
    "cdf.m.motion_mode": (U16, (22, 4)),
    "cdf.m.skip_mode": (U16, (3, 2)),
    "cdf.m.newmv_mode": (U16, (6, 2)),
    "cdf.m.globalmv_mode": (U16, (2, 2)),
    "cdf.m.refmv_mode": (U16, (6, 2)),
    "cdf.m.drl_bit": (U16, (3, 2)),
    "cdf.m.intra": (U16, (4, 2)),
    "cdf.m.comp": (U16, (5, 2)),
    "cdf.m.comp_dir": (U16, (5, 2)),
    "cdf.m.jnt_comp": (U16, (6, 2)),
    "cdf.m.mask_comp": (U16, (6, 2)),
    "cdf.m.wedge_comp": (U16, (9, 2)),
    "cdf.m.ref": (U16, (6, 3, 2)),
    "cdf.m.comp_fwd_ref": (U16, (3, 3, 2)),
    "cdf.m.comp_bwd_ref": (U16, (2, 3, 2)),
    "cdf.m.comp_uni_ref": (U16, (3, 3, 2)),
    "cdf.m.seg_pred": (U16, (3, 2)),
    "cdf.m.interintra": (U16, (7, 2)),
    "cdf.m.interintra_wedge": (U16, (7, 2)),
    "cdf.m.obmc": (U16, (22, 2)),
    "cdf.mv.comp[0].classes": (U16, (16,)),
    "cdf.mv.comp[0].sign": (U16, (2,)),
    "cdf.mv.comp[0].class0": (U16, (2,)),
    "cdf.mv.comp[0].class0_fp": (U16, (2, 4)),
    "cdf.mv.comp[0].class0_hp": (U16, (2,)),
    "cdf.mv.comp[0].classN": (U16, (10, 2)),
    "cdf.mv.comp[0].classN_fp": (U16, (4,)),
    "cdf.mv.comp[0].classN_hp": (U16, (2,)),
    "cdf.mv.joint": (U16, (4,)),
    "cdf.kfym": (U16, (5, 5, 16)),
}

COEF_DECLS = {
    "coef.eob_bin_16": (U16, (2, 2, 8)),
    "coef.eob_bin_32": (U16, (2, 2, 8)),
    "coef.eob_bin_64": (U16, (2, 2, 8)),
    "coef.eob_bin_128": (U16, (2, 2, 8)),
    "coef.eob_bin_256": (U16, (2, 2, 16)),
    "coef.eob_bin_512": (U16, (2, 16)),
    "coef.eob_bin_1024": (U16, (2, 16)),
    "coef.eob_base_tok": (U16, (5, 2, 4, 4)),
    "coef.base_tok": (U16, (5, 2, 41, 4)),
    "coef.br_tok": (U16, (4, 2, 21, 4)),
    "coef.eob_hi_bit": (U16, (5, 2, 9, 2)),
    "coef.skip": (U16, (5, 13, 2)),
    "coef.dc_sign": (U16, (2, 3, 2)),
}
for _q in range(4):
    for _k, _v in COEF_DECLS.items():
        DECLS[f"cdf.q{_q}.{_k}"] = _v


def read_records(path):
    data = Path(path).read_bytes()
    pos = 0
    while pos < len(data):
        (nlen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        name = data[pos : pos + nlen].decode()
        pos += nlen
        (nbytes,) = struct.unpack_from("<Q", data, pos)
        pos += 8
        yield name, data[pos : pos + nbytes]
        pos += nbytes


def main(src="/tmp/tables.bin", dst="dav1d_tpu/data/tables.npz"):
    out = {}
    for name, raw in read_records(src):
        if name == "masks.manifest":
            out["masks.manifest"] = np.frombuffer(raw, dtype=U8)
            continue
        if name == "masks.blob":
            out["masks.blob"] = np.frombuffer(raw, dtype=U8)
            continue
        if name.startswith("scan."):
            out[name] = np.frombuffer(raw, dtype=U16)
            continue
        if name.startswith("qm."):
            out[name] = np.frombuffer(raw, dtype=U8)
            continue
        dtype, shape = DECLS[name]
        arr = np.frombuffer(raw, dtype=dtype)
        assert arr.size == np.prod(shape), (name, arr.size, shape)
        out[name] = arr.reshape(shape)
    missing = set(DECLS) - set(out)
    assert not missing, f"missing records: {sorted(missing)}"
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} with {len(out)} arrays")


if __name__ == "__main__":
    main(*sys.argv[1:])
