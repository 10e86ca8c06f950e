/* Dump the normative AV1 constant tables (default CDFs, scan orders,
 * dequant/QM tables, filter coefficients, wedge/interintra masks, misc
 * context LUTs) from the reference build into a simple binary container.
 *
 * These are AV1 *specification* constants (spec sections 9.4 default CDFs,
 * 7.12.x dequant, 5.9.x, tables in section 9), not creative code: the
 * TPU decoder must match them bit-exactly.  We extract them mechanically
 * from the compiled reference rather than transcribing thousands of
 * numbers by hand.
 *
 * Output format, repeated records:  u32 name_len | name | u64 nbytes | raw
 */
#include "config.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#include "src/cdf.h"
#include "src/tables.h"
#include "src/scan.h"
#include "src/dequant_tables.h"
#include "src/qm.h"
#include "src/wedge.h"
#include "src/intra_edge.h"
#include "common/intops.h"

static FILE *out;

static void dump(const char *name, const void *data, size_t n) {
    uint32_t len = (uint32_t)strlen(name);
    uint64_t n64 = n;
    fwrite(&len, 4, 1, out);
    fwrite(name, 1, len, out);
    fwrite(&n64, 8, 1, out);
    fwrite(data, 1, n, out);
}
#define D(tag, arr) dump(tag, (const void *)(arr), sizeof(arr))

static void dump_cdf(const char *prefix, const CdfContext *c) {
    char name[128];
#define DC(field) do { \
    snprintf(name, sizeof(name), "%s.%s", prefix, #field); \
    dump(name, (const void *)(c->field), sizeof(c->field)); } while (0)
    DC(coef.eob_bin_16); DC(coef.eob_bin_32); DC(coef.eob_bin_64);
    DC(coef.eob_bin_128); DC(coef.eob_bin_256); DC(coef.eob_bin_512);
    DC(coef.eob_bin_1024); DC(coef.eob_base_tok); DC(coef.base_tok);
    DC(coef.br_tok); DC(coef.eob_hi_bit); DC(coef.skip); DC(coef.dc_sign);
#undef DC
}

static void dump_cdf_m(const CdfContext *c) {
    char name[128];
#define DM(field) do { \
    snprintf(name, sizeof(name), "cdf.%s", #field); \
    dump(name, (const void *)(c->field), sizeof(c->field)); } while (0)
    DM(m.uv_mode); DM(m.partition); DM(m.cfl_alpha); DM(m.txtp_inter1);
    DM(m.txtp_inter2); DM(m.txtp_intra1); DM(m.txtp_intra2); DM(m.cfl_sign);
    DM(m.angle_delta); DM(m.filter_intra); DM(m.seg_id); DM(m.pal_sz);
    DM(m.color_map); DM(m.txsz); DM(m.delta_q); DM(m.delta_lf);
    DM(m.restore_switchable); DM(m.restore_wiener); DM(m.restore_sgrproj);
    DM(m.txtp_inter3); DM(m.use_filter_intra); DM(m.txpart); DM(m.skip);
    DM(m.pal_y); DM(m.pal_uv); DM(m.intrabc); DM(m.y_mode); DM(m.wedge_idx);
    DM(m.comp_inter_mode); DM(m.filter); DM(m.interintra_mode);
    DM(m.motion_mode); DM(m.skip_mode); DM(m.newmv_mode); DM(m.globalmv_mode);
    DM(m.refmv_mode); DM(m.drl_bit); DM(m.intra); DM(m.comp); DM(m.comp_dir);
    DM(m.jnt_comp); DM(m.mask_comp); DM(m.wedge_comp); DM(m.ref);
    DM(m.comp_fwd_ref); DM(m.comp_bwd_ref); DM(m.comp_uni_ref); DM(m.seg_pred);
    DM(m.interintra); DM(m.interintra_wedge); DM(m.obmc);
    DM(mv.comp[0].classes); DM(mv.comp[0].sign); DM(mv.comp[0].class0);
    DM(mv.comp[0].class0_fp); DM(mv.comp[0].class0_hp); DM(mv.comp[0].classN);
    DM(mv.comp[0].classN_fp); DM(mv.comp[0].classN_hp);
    DM(mv.joint); DM(kfym);
#undef DM
}

int main(int argc, char **argv) {
    out = fopen(argc > 1 ? argv[1] : "tables.bin", "wb");
    if (!out) return 1;

    /* --- static tables (src/tables.c, scan.c, dequant_tables.c) --- */
    D("al_part_ctx", dav1d_al_part_ctx);
    D("block_sizes", dav1d_block_sizes);
    D("block_dimensions", dav1d_block_dimensions);
    D("txfm_dimensions", dav1d_txfm_dimensions);
    D("max_txfm_size_for_bs", dav1d_max_txfm_size_for_bs);
    D("txtp_from_uvmode", dav1d_txtp_from_uvmode);
    D("comp_inter_pred_modes", dav1d_comp_inter_pred_modes);
    D("partition_type_count", dav1d_partition_type_count);
    D("tx_types_per_set", dav1d_tx_types_per_set);
    D("filter_mode_to_y_mode", dav1d_filter_mode_to_y_mode);
    D("ymode_size_context", dav1d_ymode_size_context);
    D("lo_ctx_offsets", dav1d_lo_ctx_offsets);
    D("skip_ctx", dav1d_skip_ctx);
    D("tx_type_class", dav1d_tx_type_class);
    D("filter_2d", dav1d_filter_2d);
    D("filter_dir", dav1d_filter_dir);
    D("intra_mode_context", dav1d_intra_mode_context);
    D("wedge_ctx_lut", dav1d_wedge_ctx_lut);
    D("cdef_directions", dav1d_cdef_directions);
    D("sgr_params", dav1d_sgr_params);
    D("sgr_x_by_x", dav1d_sgr_x_by_x);
    D("mc_subpel_filters", dav1d_mc_subpel_filters);
    D("mc_warp_filter", dav1d_mc_warp_filter);
    D("resize_filter", dav1d_resize_filter);
    D("sm_weights", dav1d_sm_weights);
    D("dr_intra_derivative", dav1d_dr_intra_derivative);
    D("filter_intra_taps", dav1d_filter_intra_taps);
    D("obmc_masks", dav1d_obmc_masks);
    D("gaussian_sequence", dav1d_gaussian_sequence);
    D("dq_tbl", dav1d_dq_tbl);

    /* scan orders: entries = min(w,8)*min(h,8)*16 coefficients */
    for (int i = 0; i < N_RECT_TX_SIZES; i++) {
        const TxfmInfo *t = &dav1d_txfm_dimensions[i];
        int n = imin(t->w, 8) * imin(t->h, 8) * 16;
        char name[64];
        snprintf(name, sizeof(name), "scan.%d", i);
        dump(name, dav1d_scans[i], n * 2);
    }

    /* quantizer matrices (built at init) */
    dav1d_init_qm_tables();
    for (int j = 0; j < 15; j++)
        for (int p = 0; p < 2; p++)
            for (int i = 0; i < N_RECT_TX_SIZES; i++) {
                const uint8_t *qm = dav1d_qm_tbl[j][p][i];
                if (!qm) continue;
                const TxfmInfo *t = &dav1d_txfm_dimensions[i];
                int n = imin(t->w, 8) * imin(t->h, 8) * 16;
                char name[64];
                snprintf(name, sizeof(name), "qm.%d.%d.%d", j, p, i);
                dump(name, qm, n);
            }

    /* wedge + interintra masks (built at init): whole struct + manifest */
    dav1d_init_ii_wedge_masks();
    dump("masks.blob", (const void *)&dav1d_masks, sizeof(dav1d_masks));
    {
        struct { const char *name; size_t off, size; } fields[] = {
#define F(x) { #x, offsetof(Dav1dMasks, x), sizeof(dav1d_masks.x) }
            F(offsets),
            F(wedge_444_32x32), F(wedge_444_32x16), F(wedge_444_32x8),
            F(wedge_444_16x32), F(wedge_444_16x16), F(wedge_444_16x8),
            F(wedge_444_8x32), F(wedge_444_8x16), F(wedge_444_8x8),
            F(wedge_422_16x32), F(wedge_422_16x16), F(wedge_422_16x8),
            F(wedge_422_8x32), F(wedge_422_8x16), F(wedge_422_8x8),
            F(wedge_422_4x32), F(wedge_422_4x16), F(wedge_422_4x8),
            F(wedge_420_16x16), F(wedge_420_16x8), F(wedge_420_16x4),
            F(wedge_420_8x16), F(wedge_420_8x8), F(wedge_420_8x4),
            F(wedge_420_4x16), F(wedge_420_4x8), F(wedge_420_4x4),
            F(ii_dc), F(ii_nondc_32x32), F(ii_nondc_16x32), F(ii_nondc_16x16),
            F(ii_nondc_8x32), F(ii_nondc_8x16), F(ii_nondc_8x8),
            F(ii_nondc_4x16), F(ii_nondc_4x8), F(ii_nondc_4x4),
#undef F
        };
        char manifest[8192];
        size_t pos = 0;
        for (size_t i = 0; i < sizeof(fields) / sizeof(*fields); i++)
            pos += (size_t)snprintf(manifest + pos, sizeof(manifest) - pos,
                           "%s %zu %zu\n", fields[i].name, fields[i].off,
                           fields[i].size);
        dump("masks.manifest", manifest, pos);
    }

    /* default CDFs: coef tables per quant category + mode/mv/kf tables */
    {
        CdfThreadContext t;
        CdfContext ctx;
        static const unsigned qidx_for_qcat[4] = { 0, 40, 100, 200 };
        for (unsigned q = 0; q < 4; q++) {
            char prefix[32];
            snprintf(prefix, sizeof(prefix), "cdf.q%u", q);
            dav1d_cdf_thread_init_static(&t, qidx_for_qcat[q]);
            dav1d_cdf_thread_copy(&ctx, &t);
            dump_cdf(prefix, &ctx);
            if (q == 0) dump_cdf_m(&ctx);
        }
    }

    fclose(out);
    return 0;
}
