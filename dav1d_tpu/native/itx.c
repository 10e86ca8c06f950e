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
    const itx1d_fn rowfn = itx1d_table[ulg2(w >> 2)][row_t];
    const itx1d_fn colfn = itx1d_table[ulg2(h >> 2)][col_t];

    static _Thread_local int64_t m[64 * 64];
    for (int64_t b = 0; b < nb; b++, out += nout) {
        const int32_t *const cf = cfp[b];
        memset(m, 0, sizeof(int64_t) * w * h);
        for (int x = 0; x < sw; x++)
            for (int y = 0; y < sh; y++) {
                int64_t v = cf[x * sh + y];
                if (is_rect2)
                    v = (v * 181 + 128) >> 8;
                m[x * h + y] = v;
            }
        for (int y = 0; y < sh; y++)
            rowfn(m + y, h, row_min, row_max);
        for (int x = 0; x < w; x++)
            for (int y = 0; y < sh; y++) {
                const int64_t v = (m[x * h + y] + rnd) >> shift;
                m[x * h + y] = iclip64(v, col_min, col_max);
            }
        for (int x = 0; x < w; x++)
            colfn(m + x * h, 1, col_min, col_max);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                out[y * w + x] = (int32_t)((m[x * h + y] + 8) >> 4);
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
