/* Native host filter kernels.
 *
 * Batched CDEF unit filtering, bit-identical to the golden numpy model
 * (dav1d_tpu/recon/cdef.py cdef_filter_batch, itself oracle-verified
 * against reference src/cdef_tmpl.c:106 cdef_filter_block_c). The host
 * runs this when the device batch would be dispatch/transfer-bound; the
 * TPU path is dav1d_tpu/ops/cdef.py.
 */

#include <stdint.h>

#define CDEF_SENTINEL (-32768) /* INT16_MIN marker outside available edges */

/* (dy, dx) per [2 + dir + off][pass] (decomposition of the reference's
 * dav1d_cdef_directions offsets, src/tables.c:400) */
static const int cdef_dirs[12][2][2] = {
    {{ 1, 0}, { 2,  0}},
    {{ 1, 0}, { 2, -1}},
    {{-1, 1}, {-2,  2}},
    {{ 0, 1}, {-1,  2}},
    {{ 0, 1}, { 0,  2}},
    {{ 0, 1}, { 1,  2}},
    {{ 1, 1}, { 2,  2}},
    {{ 1, 0}, { 2,  1}},
    {{ 1, 0}, { 2,  0}},
    {{ 1, 0}, { 2, -1}},
    {{-1, 1}, {-2,  2}},
    {{ 0, 1}, {-1,  2}},
};

static inline int ulog2i(int v) { return 31 - __builtin_clz((unsigned)v); }

static inline int constrain(int diff, int thr, int shift)
{
    int adiff = diff < 0 ? -diff : diff;
    int clamp = thr - (adiff >> shift);
    int v = adiff < clamp ? adiff : clamp;
    if (v < 0)
        v = 0;
    return diff < 0 ? -v : v;
}

/* 8x8 direction search per unit (semantics of the golden model
 * dav1d_tpu/recon/cdef.py cdef_find_dir, reference cdef_find_dir_c
 * src/cdef_tmpl.c:239): 8 directional projections, squared-sum costs
 * normalized by line length, variance vs the orthogonal direction. */
void dtpu_cdef_find_dir_batch(const int32_t *blocks, int64_t n,
                              int bitdepth, int64_t *dirs,
                              int64_t *variances)
{
    static const int div_table[7] = {840, 420, 280, 210, 168, 140, 120};
    const int shift = bitdepth - 8;
    for (int64_t u = 0; u < n; u++) {
        const int32_t *b = blocks + u * 64;
        int64_t psum_hv[2][8] = {{0}}, psum_diag[2][15] = {{0}};
        int64_t psum_alt[4][11] = {{0}};
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                const int v = (b[y * 8 + x] >> shift) - 128;
                psum_diag[0][y + x] += v;
                psum_alt[0][y + (x >> 1)] += v;
                psum_hv[0][y] += v;
                psum_alt[1][3 + y - (x >> 1)] += v;
                psum_diag[1][7 + y - x] += v;
                psum_alt[2][3 - (y >> 1) + x] += v;
                psum_hv[1][x] += v;
                psum_alt[3][(y >> 1) + x] += v;
            }
        int64_t cost[8] = {0};
        for (int i = 0; i < 8; i++) {
            cost[2] += psum_hv[0][i] * psum_hv[0][i];
            cost[6] += psum_hv[1][i] * psum_hv[1][i];
        }
        cost[2] *= 105;
        cost[6] *= 105;
        for (int i = 0; i < 7; i++) {
            const int d = div_table[i];
            cost[0] += (psum_diag[0][i] * psum_diag[0][i] +
                        psum_diag[0][14 - i] * psum_diag[0][14 - i]) * d;
            cost[4] += (psum_diag[1][i] * psum_diag[1][i] +
                        psum_diag[1][14 - i] * psum_diag[1][14 - i]) * d;
        }
        cost[0] += psum_diag[0][7] * psum_diag[0][7] * 105;
        cost[4] += psum_diag[1][7] * psum_diag[1][7] * 105;
        for (int i = 0; i < 4; i++) {
            int64_t c = 0;
            for (int m = 0; m < 5; m++)
                c += psum_alt[i][3 + m] * psum_alt[i][3 + m];
            c *= 105;
            for (int m = 0; m < 3; m++)
                c += (psum_alt[i][m] * psum_alt[i][m] +
                      psum_alt[i][10 - m] * psum_alt[i][10 - m]) *
                     div_table[2 * m + 1];
            cost[i * 2 + 1] = c;
        }
        int best = 0;
        int64_t best_cost = cost[0];
        for (int i = 1; i < 8; i++)
            if (cost[i] > best_cost) {
                best_cost = cost[i];
                best = i;
            }
        dirs[u] = best;
        variances[u] = (best_cost - cost[best ^ 4]) >> 10;
    }
}

void dtpu_cdef_filter_batch(const int32_t *canvas, int64_t stride,
                            const int64_t *ys, const int64_t *xs, int64_t n,
                            int w, int h, const int64_t *pri,
                            const int64_t *sec, const int64_t *dirs,
                            int damping, int bitdepth, int32_t *out)
{
    const int bdmin8 = bitdepth - 8;
    for (int64_t u = 0; u < n; u++) {
        const int32_t *base = canvas + ys[u] * stride + xs[u];
        int32_t *o = out + u * (int64_t)(w * h);
        const int p = (int)pri[u], s = (int)sec[u], dir = (int)dirs[u];
        if (!p && !s) {
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    o[y * w + x] = base[y * stride + x];
            continue;
        }
        const int both = p && s;
        const int pri_shift_raw = p ? damping - ulog2i(p) : 0;
        const int pri_shift = pri_shift_raw < 0 ? 0 : pri_shift_raw;
        const int sec_shift = s ? damping - ulog2i(s) : 0;
        const int pri_tap0 = 4 - ((p >> bdmin8) & 1);
        const int pri_tap1 = (pri_tap0 & 3) | 2;

        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                const int32_t *px_at = base + y * stride + x;
                const int px = px_at[0];
                int sum = 0, mn = px, mx = px;
                for (int k = 0; k < 2; k++) {
                    if (p) {
                        const int dy = cdef_dirs[2 + dir][k][0];
                        const int dx = cdef_dirs[2 + dir][k][1];
                        const int p0 = px_at[dy * stride + dx];
                        const int p1 = px_at[-dy * stride - dx];
                        const int ptk = k ? pri_tap1 : pri_tap0;
                        sum += ptk * (constrain(p0 - px, p, pri_shift) +
                                      constrain(p1 - px, p, pri_shift));
                        if (both) {
                            if (p0 != CDEF_SENTINEL && p0 < mn) mn = p0;
                            if (p1 != CDEF_SENTINEL && p1 < mn) mn = p1;
                            if (p0 > mx) mx = p0;
                            if (p1 > mx) mx = p1;
                        }
                    }
                    if (s) {
                        const int sec_tap = 2 - k;
                        for (int off = 4; off >= 0; off -= 4)
                            for (int sgn = 1; sgn >= -1; sgn -= 2) {
                                const int dy =
                                    sgn * cdef_dirs[off + dir][k][0];
                                const int dx =
                                    sgn * cdef_dirs[off + dir][k][1];
                                const int v = px_at[dy * stride + dx];
                                sum += sec_tap *
                                       constrain(v - px, s, sec_shift);
                                if (both) {
                                    if (v != CDEF_SENTINEL && v < mn) mn = v;
                                    if (v > mx) mx = v;
                                }
                            }
                    }
                }
                int res = px + ((sum - (sum < 0) + 8) >> 4);
                if (both) {
                    if (res < mn) res = mn;
                    if (res > mx) res = mx;
                }
                o[y * w + x] = res;
            }
    }
}
