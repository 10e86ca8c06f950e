/* Native deblocking loop filter: one 4px-aligned strip per call.
 *
 * Bit-exact port of the Python reference (dav1d_tpu/recon/lf.py
 * _loop_filter + _lf_sb); semantics follow the reference loop_filter /
 * loop_filter_sb128{y,uv} (src/loopfilter_tmpl.c:36-241).  Filtering is
 * immediate and in mask order — the reference's serial order — which the
 * batched Python path is already proven equivalent to (segments within a
 * pass have disjoint read/write sets).
 *
 * Planes are the decoder's int32 canvases; levels are the (h4, b4_stride,
 * 4) uint8 cache; E/I LUTs are the 64-entry int32 tables from calc_eih.
 */

#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>

static inline int lf_clip(int v, int lo, int hi)
{
    return v < lo ? lo : v > hi ? hi : v;
}

/* Filter 4 lines across one edge.  px0 points at q0 of line 0; `line`
 * advances lines, `step` advances taps (both in elements). */
static void lf_edge4(int32_t *px0, ptrdiff_t line, ptrdiff_t step,
                     int E, int I, int H, int wd, int bitdepth)
{
    const int bd_m8 = bitdepth - 8;
    const int F = 1 << bd_m8;
    const int maxp = (1 << bitdepth) - 1;
    const int cd_lim = 128 << bd_m8;
    E <<= bd_m8;
    I <<= bd_m8;
    H <<= bd_m8;

    for (int i = 0; i < 4; i++, px0 += line) {
        int32_t *p = px0;
#define GET(o) ((int)p[(ptrdiff_t)(o) * step])
#define PUT(o, v) (p[(ptrdiff_t)(o) * step] = (int32_t)(v))
        const int p1 = GET(-2), p0 = GET(-1), q0 = GET(0), q1 = GET(1);
        int fm = abs(p1 - p0) <= I && abs(q1 - q0) <= I &&
                 abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= E;
        int p2 = 0, q2 = 0, p3 = 0, q3 = 0;
        if (wd > 4) {
            p2 = GET(-3);
            q2 = GET(2);
            fm = fm && abs(p2 - p1) <= I && abs(q2 - q1) <= I;
            if (wd > 6) {
                p3 = GET(-4);
                q3 = GET(3);
                fm = fm && abs(p3 - p2) <= I && abs(q3 - q2) <= I;
            }
        }
        if (!fm)
            continue;

        int flat8out = 0;
        int p6 = 0, p5 = 0, p4 = 0, q4 = 0, q5 = 0, q6 = 0;
        if (wd >= 16) {
            p6 = GET(-7);
            p5 = GET(-6);
            p4 = GET(-5);
            q4 = GET(4);
            q5 = GET(5);
            q6 = GET(6);
            flat8out = abs(p6 - p0) <= F && abs(p5 - p0) <= F &&
                       abs(p4 - p0) <= F && abs(q4 - q0) <= F &&
                       abs(q5 - q0) <= F && abs(q6 - q0) <= F;
        }
        int flat8in = 0;
        if (wd >= 6)
            flat8in = abs(p2 - p0) <= F && abs(p1 - p0) <= F &&
                      abs(q1 - q0) <= F && abs(q2 - q0) <= F;
        if (wd >= 8)
            flat8in = flat8in && abs(p3 - p0) <= F && abs(q3 - q0) <= F;

        if (wd >= 16 && flat8out && flat8in) {
            PUT(-6, (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0
                     + 8) >> 4);
            PUT(-5, (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0
                     + q1 + 8) >> 4);
            PUT(-4, (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0
                     + q1 + q2 + 8) >> 4);
            PUT(-3, (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0
                     + q1 + q2 + q3 + 8) >> 4);
            PUT(-2, (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0
                     + q1 + q2 + q3 + q4 + 8) >> 4);
            PUT(-1, (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2
                     + q1 + q2 + q3 + q4 + q5 + 8) >> 4);
            PUT(0, (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2
                    + q2 + q3 + q4 + q5 + q6 + 8) >> 4);
            PUT(1, (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2
                    + q3 + q4 + q5 + q6 * 2 + 8) >> 4);
            PUT(2, (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2
                    + q4 + q5 + q6 * 3 + 8) >> 4);
            PUT(3, (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2
                    + q5 + q6 * 4 + 8) >> 4);
            PUT(4, (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2
                    + q6 * 5 + 8) >> 4);
            PUT(5, (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7
                    + 8) >> 4);
        } else if (wd >= 8 && flat8in) {
            PUT(-3, (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3);
            PUT(-2, (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3);
            PUT(-1, (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3);
            PUT(0, (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3);
            PUT(1, (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3);
            PUT(2, (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3);
        } else if (wd == 6 && flat8in) {
            PUT(-2, (p2 + 2 * p2 + 2 * p1 + 2 * p0 + q0 + 4) >> 3);
            PUT(-1, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3);
            PUT(0, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3);
            PUT(1, (p0 + 2 * q0 + 2 * q1 + 2 * q2 + q2 + 4) >> 3);
        } else {
            const int hev = abs(p1 - p0) > H || abs(q1 - q0) > H;
            int f;
            if (hev) {
                f = lf_clip(p1 - q1, -cd_lim, cd_lim - 1);
                f = lf_clip(3 * (q0 - p0) + f, -cd_lim, cd_lim - 1);
            } else {
                f = lf_clip(3 * (q0 - p0), -cd_lim, cd_lim - 1);
            }
            const int f1 = (f + 4 < cd_lim - 1 ? f + 4 : cd_lim - 1) >> 3;
            const int f2 = (f + 3 < cd_lim - 1 ? f + 3 : cd_lim - 1) >> 3;
            PUT(-1, lf_clip(p0 + f2, 0, maxp));
            PUT(0, lf_clip(q0 - f1, 0, maxp));
            if (!hev) {
                const int g = (f1 + 1) >> 1;
                PUT(-2, lf_clip(p1 + g, 0, maxp));
                PUT(1, lf_clip(q1 - g, 0, maxp));
            }
        }
#undef GET
#undef PUT
    }
}

/* One strip of loop_filter_sb128{y,uv} (recon/lf.py _lf_sb): walk the
 * 32-bit combined edge masks, resolve per-edge level (with the
 * reference's adjacent fallback), pick filter width, filter.
 * lvl points at lvl_get(0, 0); lvl_i / lvl_off are byte strides for the
 * bit index and the off=-1 fallback. */
void dtpu_lf_strip(int32_t *plane, int64_t stride, int py, int px,
                   uint32_t vm0, uint32_t vm1, uint32_t vm2,
                   const uint8_t *lvl, int64_t lvl_i, int64_t lvl_off,
                   const int32_t *e_lut, const int32_t *i_lut,
                   int is_h, int is_uv, int bitdepth)
{
    const uint32_t vm = vm0 | vm1 | (is_uv ? 0 : vm2);
    for (int i = 0; (vm >> i) != 0 && i < 32; i++) {
        const uint32_t bit = 1u << i;
        if (!(vm & bit))
            continue;
        int L = lvl[(ptrdiff_t)(i * lvl_i)];
        if (!L)
            L = lvl[(ptrdiff_t)(i * lvl_i + lvl_off)];
        if (!L)
            continue;
        const int H = L >> 4;
        const int E = e_lut[L], I = i_lut[L];
        int wd;
        if (!is_uv)
            wd = 4 << ((vm2 & bit) ? 2 : ((vm1 & bit) ? 1 : 0));
        else
            wd = (vm1 & bit) ? 6 : 4;
        if (is_h)
            lf_edge4(plane + (int64_t)(py + 4 * i) * stride + px,
                     stride, 1, E, I, H, wd, bitdepth);
        else
            lf_edge4(plane + (int64_t)py * stride + (px + 4 * i),
                     1, stride, E, I, H, wd, bitdepth);
    }
}
