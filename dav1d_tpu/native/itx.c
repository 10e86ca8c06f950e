/* Native batched inverse transforms: the host tier of the pass-2
 * residual stage (reference inv_txfm_add_c 2-D wrapper,
 * src/itx_tmpl.c:44-130; 1-D kernels in itx1d_gen.h are generated from
 * the decoder's own canonical-scale Python derivations by
 * tools/gen_itx_c.py).  Bit-exact with recon/itx.py itx_batch_np
 * (tests/test_native_itx.py). */

#include <stdlib.h>
#include <string.h>

#include "dtpu.h"
#include "itx1d_gen.h"

static inline int ulg2(int v)
{
    int n = 0;
    while (v > 1) {
        v >>= 1;
        n++;
    }
    return n;
}

/* cfp: per-block coefficient pointers ((sw*sh) int32 column-major each);
 * out: (nb, h, w) int32 residuals ((x + 8) >> 4 scaled).  The pointer
 * form lets the caller feed blocks straight out of the pass-1 capture
 * arena with no per-frame stacking copy. */
void dtpu_itx_batch_ptrs(const int32_t *const *cfp, int64_t nb, int w,
                         int h, int shift, int row_t, int col_t,
                         int is_rect2, int bitdepth, int is_wht,
                         int32_t *out)
{
    const int sw = w < 32 ? w : 32, sh = h < 32 ? h : 32;
    const int64_t nout = (int64_t)w * h;

    if (is_wht) {
        for (int64_t b = 0; b < nb; b++, out += nout) {
            const int32_t *const cf = cfp[b];
            int64_t m[16];
            for (int x = 0; x < 4; x++)
                for (int y = 0; y < 4; y++)
                    m[y * 4 + x] = cf[x * 4 + y] >> 2;
            for (int y = 0; y < 4; y++)
                itx1d_wht4(m + y * 4, 1, 0, 0);
            for (int x = 0; x < 4; x++)
                itx1d_wht4(m + x, 4, 0, 0);
            for (int i = 0; i < 16; i++)
                out[i] = (int32_t)m[i];
        }
        return;
    }

    const int64_t maxp = (1ll << bitdepth) - 1;
    const int64_t row_min =
        bitdepth == 8 ? -(1ll << 15) : -((maxp + 1) << 7);
    const int64_t col_min =
        bitdepth == 8 ? -(1ll << 15) : -((maxp + 1) << 5);
    const int64_t row_max = ~row_min, col_max = ~col_min;
    const int64_t rnd = (1ll << shift) >> 1;
    const itx1d_fn *rowfns = itx1d_table[ulg2(w >> 2)][row_t];
    const itx1d_fn *colfns = itx1d_table[ulg2(h >> 2)][col_t];

    /* 8 blocks per pass: staging is position-major with the block index
     * in the SIMD lane (dtpu_v8 = 8x int64), so the generated 1-D
     * kernels run 8 transforms per instruction stream.  A short tail
     * group leaves the unused lanes zero (stores skip them). */
    const dtpu_v8 vrow_min = row_min - (dtpu_v8){0},
                  vrow_max = row_max - (dtpu_v8){0},
                  vcol_min = col_min - (dtpu_v8){0},
                  vcol_max = col_max - (dtpu_v8){0};
    static _Thread_local dtpu_v8 m[64 * 64];
    int64_t *const ml = (int64_t *)m;
    for (int64_t g = 0; g < nb; g += 8) {
        const int lanes = nb - g < 8 ? (int)(nb - g) : 8;
        memset(m, 0, sizeof(dtpu_v8) * w * h);
        /* rows (fixed y) that are all-zero across every lane skip the
         * 1-D row transform and the mid-stage rescale outright: the
         * 1-D transforms are linear (0 -> 0) and the mid stage maps 0
         * to 0 exactly ((0 + (1<<shift>>1)) >> shift == 0, clip keeps
         * it).  Callers sort batches by eob so sparse blocks cluster
         * and the mask stays sparse across the 8 lanes. */
        uint32_t rowmask = 0;
        int xmax = 0;
        for (int l = 0; l < lanes; l++) {
            const int32_t *const cf = cfp[g + l];
            for (int x = 0; x < sw; x++)
                for (int y = 0; y < sh; y++) {
                    int64_t v = cf[x * sh + y];
                    if (!v)
                        continue;
                    rowmask |= 1u << y;
                    if (x > xmax)
                        xmax = x;
                    if (is_rect2)
                        v = (v * 181 + 128) >> 8;
                    ml[(x * h + y) * 8 + l] = v;
                }
        }
        if (!rowmask) {
            /* every lane all-zero: 1-D transforms are linear, output
             * is identically ((0 + 8) >> 4) == 0 */
            for (int l = 0; l < lanes; l++)
                memset(out + (g + l) * nout, 0, sizeof(int32_t) * nout);
            continue;
        }
        /* eob-gated sub-kernels (reference's eob-based downshift
         * variants): the row pass needs only inputs x <= xmax live,
         * the col pass only inputs y <= ymax (rows outside rowmask
         * stayed zero: linear transforms, and the mid-stage rescale
         * maps 0 to 0 exactly). */
        const int ymax = 31 - __builtin_clz(rowmask);
        const itx1d_fn rowfn =
            rowfns[xmax < 4 ? 0 : 62 - __builtin_clzll((uint64_t)xmax)];
        const itx1d_fn colfn =
            colfns[ymax < 4 ? 0 : 62 - __builtin_clzll((uint64_t)ymax)];
        for (int y = 0; y < sh; y++) {
            if (!(rowmask >> y & 1))
                continue;
            rowfn(m + y, h, vrow_min, vrow_max);
            for (int x = 0; x < w; x++) {
                const dtpu_v8 v = (m[x * h + y] + rnd) >> shift;
                m[x * h + y] = vclip64(v, vcol_min, vcol_max);
            }
        }
        for (int x = 0; x < w; x++)
            colfn(m + x * h, 1, vcol_min, vcol_max);
        for (int l = 0; l < lanes; l++) {
            int32_t *const o = out + (g + l) * nout;
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    o[y * w + x] =
                        (int32_t)((ml[(x * h + y) * 8 + l] + 8) >> 4);
        }
    }
}

/* contiguous form: cf is (nb, sw*sh) int32 */
void dtpu_itx_batch(const int32_t *cf, int64_t nb, int w, int h,
                    int shift, int row_t, int col_t, int is_rect2,
                    int bitdepth, int is_wht, int32_t *out)
{
    const int sw = w < 32 ? w : 32, sh = h < 32 ? h : 32;
    const int64_t ncoef = (int64_t)sw * sh;
    const int32_t **cfp = malloc((size_t)nb * sizeof(*cfp));
    if (!cfp)
        return;
    for (int64_t b = 0; b < nb; b++)
        cfp[b] = cf + b * ncoef;
    dtpu_itx_batch_ptrs(cfp, nb, w, h, shift, row_t, col_t, is_rect2,
                        bitdepth, is_wht, out);
    free(cfp);
}
