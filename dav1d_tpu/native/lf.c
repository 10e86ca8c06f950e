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

/* Clipped residual add: plane[dy:dy+h, dx:dx+w] += r, clip [0, maxp]
 * (the replay-side half of reference inv_txfm_add, src/itx_tmpl.c:118). */
void dtpu_add_residual(int32_t *plane, int64_t stride, int dy, int dx,
                       const int32_t *r, int h, int w, int maxp)
{
    int32_t *row = plane + (int64_t)dy * stride + dx;
    for (int y = 0; y < h; y++, row += stride, r += w)
        for (int x = 0; x < w; x++) {
            int v = row[x] + r[x];
            row[x] = v < 0 ? 0 : v > maxp ? maxp : v;
        }
}

/* ---- deblock mask construction ----------------------------------------- */

#include <string.h>

/* masks_y layout: [2 dir][32][3 lvl][2 half] uint16 */
#define MY(m, d, x, k, s) (m)[(((d) * 32 + (x)) * 3 + (k)) * 2 + (s)]
/* masks_uv layout: [2 dir][32][2 lvl][2 half] uint16 */
#define MUV(m, d, x, k, s) (m)[(((d) * 32 + (x)) * 2 + (k)) * 2 + (s)]

static inline int imin(int a, int b) { return a < b ? a : b; }

/* reference mask_edges_intra (src/lf_mask.c:149-200); twl4c/thl4c are the
 * clamped tx level codes, tw/th the tx dims in 4px units. */
void dtpu_mask_edges_intra(uint16_t *my, int by4, int bx4, int w4, int h4,
                           int twl4c, int thl4c, int tw, int th,
                           uint8_t *a, uint8_t *l)
{
    uint64_t mask = 1ull << by4;
    for (int y = 0; y < h4; y++, mask <<= 1) {
        const int sidx = mask >= 0x10000;
        const uint16_t smask = (uint16_t)(mask >> (sidx << 4));
        MY(my, 0, bx4, imin(twl4c, l[y]), sidx) |= smask;
    }
    mask = 1ull << bx4;
    for (int x = 0; x < w4; x++, mask <<= 1) {
        const int sidx = mask >= 0x10000;
        const uint16_t smask = (uint16_t)(mask >> (sidx << 4));
        MY(my, 1, by4, imin(thl4c, a[x]), sidx) |= smask;
    }

    uint32_t t = 1u << by4;
    uint32_t inner = (uint32_t)(((uint64_t)t << h4) - t);
    uint32_t in1 = inner & 0xFFFF, in2 = inner >> 16;
    for (int x = tw; x < w4; x += tw) {
        if (in1)
            MY(my, 0, bx4 + x, twl4c, 0) |= in1;
        if (in2)
            MY(my, 0, bx4 + x, twl4c, 1) |= in2;
    }
    t = 1u << bx4;
    inner = (uint32_t)(((uint64_t)t << w4) - t);
    in1 = inner & 0xFFFF;
    in2 = inner >> 16;
    for (int y = th; y < h4; y += th) {
        if (in1)
            MY(my, 1, by4 + y, thl4c, 0) |= in1;
        if (in2)
            MY(my, 1, by4 + y, thl4c, 1) |= in2;
    }

    memset(a, thl4c, w4);
    memset(l, twl4c, h4);
}

/* reference mask_edges_chroma (src/lf_mask.c:202-258) */
void dtpu_mask_edges_chroma(uint16_t *muv, int cby4, int cbx4, int cw4,
                            int ch4, int skip_inter, int twl4c, int thl4c,
                            int tw, int th, uint8_t *a, uint8_t *l,
                            int ss_hor, int ss_ver)
{
    const int vbits = 4 - ss_ver, hbits = 4 - ss_hor;
    const int vmask = 16 >> ss_ver, hmask = 16 >> ss_hor;
    const uint64_t vmax = 1ull << vmask, hmax = 1ull << hmask;

    uint64_t mask = 1ull << cby4;
    for (int y = 0; y < ch4; y++, mask <<= 1) {
        const int sidx = mask >= vmax;
        const uint16_t smask = (uint16_t)(mask >> (sidx << vbits));
        MUV(muv, 0, cbx4, imin(twl4c, l[y]), sidx) |= smask;
    }
    mask = 1ull << cbx4;
    for (int x = 0; x < cw4; x++, mask <<= 1) {
        const int sidx = mask >= hmax;
        const uint16_t smask = (uint16_t)(mask >> (sidx << hbits));
        MUV(muv, 1, cby4, imin(thl4c, a[x]), sidx) |= smask;
    }

    if (!skip_inter) {
        uint32_t t = 1u << cby4;
        uint32_t inner = (uint32_t)(((uint64_t)t << ch4) - t);
        uint32_t in1 = inner & ((1u << vmask) - 1), in2 = inner >> vmask;
        for (int x = tw; x < cw4; x += tw) {
            if (in1)
                MUV(muv, 0, cbx4 + x, twl4c, 0) |= in1;
            if (in2)
                MUV(muv, 0, cbx4 + x, twl4c, 1) |= in2;
        }
        t = 1u << cbx4;
        inner = (uint32_t)(((uint64_t)t << cw4) - t);
        in1 = inner & ((1u << hmask) - 1);
        in2 = inner >> hmask;
        for (int y = th; y < ch4; y += th) {
            if (in1)
                MUV(muv, 1, cby4 + y, thl4c, 0) |= in1;
            if (in2)
                MUV(muv, 1, cby4 + y, thl4c, 1) |= in2;
        }
    }

    memset(a, thl4c, cw4);
    memset(l, twl4c, ch4);
}

/* reference decomp_tx (src/lf_mask.c:40-77); txa: [2][2][32][32] */
static void decomp_tx(uint8_t (*txa)[2][32][32], const uint8_t *ti_tbl,
                      int from_tx, int depth, int y_off, int x_off,
                      uint32_t tm0, uint32_t tm1, int y0, int x0)
{
    const uint8_t *ti = ti_tbl + 8 * from_tx;
    const int tw = ti[0], th = ti[1];
    const int is_split = (from_tx == 0 || depth > 1) ? 0
        : (int)(((depth ? tm1 : tm0) >> (y_off * 4 + x_off)) & 1);
    if (is_split) {
        const int sub = ti[6];
        const int htw4 = tw >> 1, hth4 = th >> 1;
        decomp_tx(txa, ti_tbl, sub, depth + 1, y_off * 2, x_off * 2,
                  tm0, tm1, y0, x0);
        if (tw >= th)
            decomp_tx(txa, ti_tbl, sub, depth + 1, y_off * 2, x_off * 2 + 1,
                      tm0, tm1, y0, x0 + htw4);
        if (th >= tw) {
            decomp_tx(txa, ti_tbl, sub, depth + 1, y_off * 2 + 1, x_off * 2,
                      tm0, tm1, y0 + hth4, x0);
            if (tw >= th)
                decomp_tx(txa, ti_tbl, sub, depth + 1, y_off * 2 + 1,
                          x_off * 2 + 1, tm0, tm1, y0 + hth4, x0 + htw4);
        }
    } else {
        const int lw = imin(2, ti[2]), lh = imin(2, ti[3]);
        for (int y = y0; y < y0 + th; y++) {
            memset(&txa[0][0][y][x0], lw, tw);
            memset(&txa[1][0][y][x0], lh, tw);
            txa[0][1][y][x0] = tw;
        }
        memset(&txa[1][1][y0][x0], th, tw);
    }
}

/* reference mask_edges_inter (src/lf_mask.c:79-147) */
void dtpu_mask_edges_inter(uint16_t *my, int by4, int bx4, int w4, int h4,
                           int skip, int max_tx, uint32_t tm0, uint32_t tm1,
                           const uint8_t *ti_tbl, uint8_t *a, uint8_t *l)
{
    const uint8_t *ti = ti_tbl + 8 * max_tx;
    const int tw = ti[0], th = ti[1];
    static _Thread_local uint8_t txa[2][2][32][32];
    memset(txa, 0, sizeof(txa));

    for (int y = 0, y_off = 0; y < h4; y += th, y_off++)
        for (int x = 0, x_off = 0; x < w4; x += tw, x_off++)
            decomp_tx(txa, ti_tbl, max_tx, 0, y_off, x_off, tm0, tm1, y, x);

    uint64_t mask = 1ull << by4;
    for (int y = 0; y < h4; y++, mask <<= 1) {
        const int sidx = mask >= 0x10000;
        const uint16_t smask = (uint16_t)(mask >> (sidx << 4));
        MY(my, 0, bx4, imin(txa[0][0][y][0], l[y]), sidx) |= smask;
    }
    mask = 1ull << bx4;
    for (int x = 0; x < w4; x++, mask <<= 1) {
        const int sidx = mask >= 0x10000;
        const uint16_t smask = (uint16_t)(mask >> (sidx << 4));
        MY(my, 1, by4, imin(txa[1][0][0][x], a[x]), sidx) |= smask;
    }

    if (!skip) {
        mask = 1ull << by4;
        for (int y = 0; y < h4; y++, mask <<= 1) {
            const int sidx = mask >= 0x10000;
            const uint16_t smask = (uint16_t)(mask >> (sidx << 4));
            int ltx = txa[0][0][y][0];
            int step = txa[0][1][y][0];
            for (int x = step; x < w4; x += step) {
                const int rtx = txa[0][0][y][x];
                MY(my, 0, bx4 + x, imin(rtx, ltx), sidx) |= smask;
                ltx = rtx;
                step = txa[0][1][y][x];
            }
        }
        mask = 1ull << bx4;
        for (int x = 0; x < w4; x++, mask <<= 1) {
            const int sidx = mask >= 0x10000;
            const uint16_t smask = (uint16_t)(mask >> (sidx << 4));
            int ttx = txa[1][0][0][x];
            int step = txa[1][1][0][x];
            for (int y = step; y < h4; y += step) {
                const int btx = txa[1][0][y][x];
                MY(my, 1, by4 + y, imin(ttx, btx), sidx) |= smask;
                ttx = btx;
                step = txa[1][1][y][x];
            }
        }
    }

    for (int y = 0; y < h4; y++)
        l[y] = txa[0][0][y][w4 - 1];
    memcpy(a, &txa[1][0][h4 - 1][0], w4);
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
