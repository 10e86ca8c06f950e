"""Device intra-prediction kernels (SURVEY §2.5 ipred family; reference
src/ipred_tmpl.c:93-744, fn table src/ipred.h:81-90).

Batched over blocks sharing a (mode, w, h, angle, bitdepth) key: each
batch item is one 257-entry edge vector in the host layout (top-left at
[128], top row above it, left column below, recon/ipred.py docstring).
The static key makes every data-dependent decision of the reference's
angular kernels — filter strength, edge upsampling, the per-(y, x)
base/frac stepping, the Z2 above-vs-left side select — a trace-time
constant, so each kernel lowers to static clamped gathers + integer
blends with no dynamic control flow (the TPU-native reformulation of
ipred_tmpl.c's per-pixel branches).  int32 throughout: px < 2^12 and
every weighted sum here is bounded by 2^22.

Intra prediction is the one DSP family the decode path cannot batch
freely: a block's edge pixels are its neighbours' *reconstructed*
outputs, so ordering is inherent (the reference serializes it per
sbrow wavefront for the same reason).  These kernels exist for the
ordered walk's device tier and are parity-locked to the host golden
(tests/test_ops_ipred.py), with per-size timings in
tools/kernel_bench.py.
"""

from __future__ import annotations

import functools

import numpy as np

from .. import tables
from ..levels import IntraPredMode as M
from ..recon.ipred import (_EDGE_KERNELS, get_filter_strength,
                           get_upsample)

EDGE_LEN = 257
OFS = 128


def _jnp():
    import jax.numpy as jnp

    return jnp


# --- static edge-processing index plans --------------------------------------

def _clamped(base, idx, frm, to):
    """Edge-vector gather indices for reference clipped() reads:
    inp[base + clamp(i, frm, to-1)] where inp starts at edge[inp0]."""
    return base + np.clip(idx, frm, to - 1)


def _upsample_plan(hsz, inp0, base, frm, to):
    """Static gather plan for upsample_edge (ipred_tmpl.c:391): returns
    (even_idx (hsz,), conv_idx (hsz-1, 4)) absolute edge indices."""
    i = np.arange(hsz)
    even = inp0 + _clamped(base, i, frm, to)
    j = np.arange(hsz - 1)[:, None] + np.array([-1, 0, 1, 2])[None]
    conv = inp0 + _clamped(base, j, frm, to)
    return even, conv


def _upsample_apply(jnp, edges, plan, bitdepth):
    """(N, hsz*2-1) upsampled vector from the static plan."""
    even_idx, conv_idx = plan
    hsz = even_idx.shape[0]
    ev = jnp.take(edges, jnp.asarray(even_idx), axis=1)
    g = jnp.take(edges, jnp.asarray(conv_idx.reshape(-1)), axis=1)
    g = g.reshape(edges.shape[0], hsz - 1, 4)
    k = jnp.asarray(np.array([-1, 9, 9, -1], dtype=np.int32))
    odd = jnp.clip((jnp.sum(g * k, axis=2) + 8) >> 4, 0,
                   (1 << bitdepth) - 1)
    out = jnp.zeros((edges.shape[0], hsz * 2 - 1), dtype=jnp.int32)
    out = out.at[:, 0::2].set(ev)
    out = out.at[:, 1::2].set(odd)
    return out


def _filter_edge_plan(sz, lim_from, lim_to, inp0, base, frm, to):
    """Static plan for filter_edge (ipred_tmpl.c:362): absolute gather
    indices (sz, 5) + the pass-through mask (sz,)."""
    i = np.arange(sz)
    passthru = (i < min(sz, lim_from)) | (i >= min(lim_to, sz))
    j = i[:, None] - 2 + np.arange(5)[None]
    conv = inp0 + _clamped(base, j, frm, to)
    center = inp0 + _clamped(base, i, frm, to)
    return conv, center, passthru


def _filter_edge_apply(jnp, edges, plan, strength):
    conv_idx, center_idx, passthru = plan
    sz = center_idx.shape[0]
    g = jnp.take(edges, jnp.asarray(conv_idx.reshape(-1)), axis=1)
    g = g.reshape(edges.shape[0], sz, 5)
    k = jnp.asarray(_EDGE_KERNELS[strength - 1].astype(np.int32))
    f = (jnp.sum(g * k, axis=2) + 8) >> 4
    c = jnp.take(edges, jnp.asarray(center_idx), axis=1)
    return jnp.where(jnp.asarray(passthru)[None], c, f)


# --- per-mode programs --------------------------------------------------------

def _dc_mul(dc, w, h, bitdepth, jnp):
    if w == h:
        return dc
    if w > h * 2 or h > w * 2:
        m8, m16 = 0x3334, 0x6667
    else:
        m8, m16 = 0x5556, 0xAAAB
    return (dc * m8) >> 16 if bitdepth == 8 else (dc * m16) >> 17


def _build(mode, w, h, angle, max_w, max_h, bitdepth):
    """Trace-time constant construction + the traced function body.
    Returns fn(edges (N, 257) int32) -> (N, h, w) int32."""
    jnp = _jnp()
    half = (1 << bitdepth) >> 1

    def top(e):
        return e[:, OFS + 1 : OFS + 1 + w]

    def left(e):  # left[i] = edge[ofs-1-i]
        return e[:, OFS - h : OFS][:, ::-1]

    if mode == M.DC_PRED:
        def fn(e):
            dc = ((w + h) >> 1) + jnp.sum(top(e), axis=1) \
                + jnp.sum(left(e), axis=1)
            sh = (((w + h) & -(w + h)).bit_length() - 1)
            dc = _dc_mul(dc >> sh, w, h, bitdepth, jnp)
            return jnp.broadcast_to(dc[:, None, None], (e.shape[0], h, w))
    elif mode == M.TOP_DC_PRED:
        def fn(e):
            dc = (jnp.sum(top(e), axis=1) + (w >> 1)) >> (w.bit_length() - 1)
            return jnp.broadcast_to(dc[:, None, None], (e.shape[0], h, w))
    elif mode == M.LEFT_DC_PRED:
        def fn(e):
            dc = (jnp.sum(left(e), axis=1) + (h >> 1)) >> \
                (h.bit_length() - 1)
            return jnp.broadcast_to(dc[:, None, None], (e.shape[0], h, w))
    elif mode == M.DC_128_PRED:
        def fn(e):
            return jnp.full((e.shape[0], h, w), half, dtype=jnp.int32)
    elif mode == M.VERT_PRED:
        def fn(e):
            return jnp.broadcast_to(top(e)[:, None, :], (e.shape[0], h, w))
    elif mode == M.HOR_PRED:
        def fn(e):
            return jnp.broadcast_to(left(e)[:, :, None], (e.shape[0], h, w))
    elif mode == M.PAETH_PRED:
        def fn(e):
            tl = e[:, OFS][:, None, None]
            l = left(e)[:, :, None]
            t = top(e)[:, None, :]
            base = l + t - tl
            ld, td, tld = (jnp.abs(l - base), jnp.abs(t - base),
                           jnp.abs(tl - base))
            return jnp.where((ld <= td) & (ld <= tld), l,
                             jnp.where(td <= tld, t, tl))
    elif mode in (M.SMOOTH_PRED, M.SMOOTH_V_PRED, M.SMOOTH_H_PRED):
        w_hor = tables.sm_weights[w : 2 * w].astype(np.int32)
        w_ver = tables.sm_weights[h : 2 * h].astype(np.int32)

        def fn(e):
            t = top(e)[:, None, :]
            l = left(e)[:, :, None]
            right = e[:, OFS + w][:, None, None]
            bottom = e[:, OFS - h][:, None, None]
            wv = jnp.asarray(w_ver)[None, :, None]
            wh_ = jnp.asarray(w_hor)[None, None, :]
            if mode == M.SMOOTH_PRED:
                p = wv * t + (256 - wv) * bottom + wh_ * l \
                    + (256 - wh_) * right
                return (p + 256) >> 9
            if mode == M.SMOOTH_V_PRED:
                return (wv * t + (256 - wv) * bottom + 128) >> 8
            return (wh_ * l + (256 - wh_) * right + 128) >> 8
    elif mode in (M.Z1_PRED, M.Z3_PRED):
        is_sm = (angle >> 9) & 1
        en_filter = angle >> 10
        a = angle & 511
        da = (90 - a) if mode == M.Z1_PRED else (a - 180)
        d = int(tables.dr_intra_derivative[
            (a >> 1) if mode == M.Z1_PRED else ((270 - a) >> 1)])
        ups = get_upsample(w + h, da, is_sm) if en_filter else 0
        n = w + h
        if mode == M.Z1_PRED:
            inp0, base, frm, to = OFS, 1, -1, w + min(w, h)
        else:  # Z3 reads downward from the topleft
            inp0, base, frm, to = OFS - n, 0, max(w - h, 0), n + 1
        if ups:
            plan = _upsample_plan(n, inp0, base, frm, to)
            max_base, d, strength = 2 * n - 2, d << 1, 0
            vec_top = 2 * n - 2  # z3: index of the topmost sample
        else:
            strength = get_filter_strength(n, da, is_sm) if en_filter else 0
            if strength:
                plan = _filter_edge_plan(n, 0, n, inp0, base, frm, to)
                max_base = n - 1
                vec_top = n - 1
            else:
                plan = None
                max_base = (w if mode == M.Z1_PRED else h) + min(w, h) - 1
                vec_top = n - 1  # raw edge: vec[n-1] = topleft_in[-1]
        binc = 1 + ups
        ys, xs = np.mgrid[0:h, 0:w]
        if mode == M.Z1_PRED:
            pos = d * (ys + 1)
            bidx = (pos >> 6) + binc * xs
        else:
            pos = d * (xs + 1)
            bidx = (pos >> 6) + binc * ys
        frac = (pos & 0x3E).astype(np.int32)
        sat = bidx >= max_base
        b0 = np.minimum(bidx, max_base)
        b1 = np.minimum(bidx + 1, max_base)
        if mode == M.Z3_PRED:  # left[i] = vec[vec_top - i]
            b0, b1 = vec_top - b0, vec_top - b1
        satv = max_base if mode == M.Z1_PRED else vec_top - max_base

        def fn(e):
            if ups:
                vec = _upsample_apply(jnp, e, plan, bitdepth)
            elif strength:
                vec = _filter_edge_apply(jnp, e, plan, strength)
            elif mode == M.Z1_PRED:
                vec = e[:, OFS + 1 : OFS + 1 + n]
            else:
                vec = e[:, OFS - n : OFS]  # vec[k] = topleft_in[k-n]
            g0 = jnp.take(vec, jnp.asarray(b0.reshape(-1)), axis=1)
            g1 = jnp.take(vec, jnp.asarray(b1.reshape(-1)), axis=1)
            g0 = g0.reshape(e.shape[0], h, w)
            g1 = g1.reshape(e.shape[0], h, w)
            fr = jnp.asarray(frac)[None]
            v = (g0 * (64 - fr) + g1 * fr + 32) >> 6
            return jnp.where(jnp.asarray(sat)[None], vec[:, satv, None,
                                                         None], v)
    elif mode == M.Z2_PRED:
        is_sm = (angle >> 9) & 1
        en_filter = angle >> 10
        a = angle & 511
        dy = int(tables.dr_intra_derivative[(a - 90) >> 1])
        dx = int(tables.dr_intra_derivative[(180 - a) >> 1])
        ups_l = get_upsample(w + h, 180 - a, is_sm) if en_filter else 0
        ups_a = get_upsample(w + h, a - 90, is_sm) if en_filter else 0
        str_a = 0 if ups_a else (
            get_filter_strength(w + h, a - 90, is_sm) if en_filter else 0)
        str_l = 0 if ups_l else (
            get_filter_strength(w + h, 180 - a, is_sm) if en_filter else 0)
        # buf layout as golden _z2: tl at 64
        TL = 64
        if ups_a:
            plan_a = _upsample_plan(w + 1, OFS, 0, 0, w + 1)
            dx <<= 1
        elif str_a:
            plan_a = _filter_edge_plan(w, 0, max_w, OFS, 1, -1, w)
        if ups_l:
            # left_in starts at edge[ofs-h] ([h] = topleft)
            plan_l = _upsample_plan(h + 1, OFS - h, 0, 0, h + 1)
            dy <<= 1
        elif str_l:
            plan_l = _filter_edge_plan(h, h - max_h, h, OFS - h, 0, 0,
                                       h + 1)
        binc_x = 1 + ups_a
        left_base = TL - (1 + ups_l)
        ys, xs = np.mgrid[0:h, 0:w]
        # base_x steps by binc_x per column while frac_x stays the row's
        bx0 = ((1 + ups_a) << 6) - dx * (ys + 1)
        base_x = (bx0 >> 6) + binc_x * xs
        frac_x = (bx0 & 0x3E).astype(np.int32)
        ypos = (ys << (6 + ups_l)) - dy * (xs + 1)
        base_y = ypos >> 6
        frac_y = (ypos & 0x3E).astype(np.int32)
        use_top = base_x >= 0
        # clamp gathers into the buf's valid span to keep indices legal
        ti0 = TL + np.clip(base_x, 0, 64)
        ti1 = TL + np.clip(base_x + 1, 0, 64)
        li0 = np.clip(left_base - base_y, 0, 128)
        li1 = np.clip(left_base - (base_y + 1), 0, 128)

        def fn(e):
            N = e.shape[0]
            buf = jnp.zeros((N, 129), dtype=jnp.int32)
            if ups_a:
                up = _upsample_apply(jnp, e, plan_a, bitdepth)
                buf = buf.at[:, TL : TL + 2 * w + 1].set(up)
            elif str_a:
                buf = buf.at[:, TL + 1 : TL + 1 + w].set(
                    _filter_edge_apply(jnp, e, plan_a, str_a))
            else:
                buf = buf.at[:, TL + 1 : TL + 1 + w].set(
                    e[:, OFS + 1 : OFS + 1 + w])
            if ups_l:
                up = _upsample_apply(jnp, e, plan_l, bitdepth)
                buf = buf.at[:, TL - 2 * h : TL + 1].set(up)
            elif str_l:
                buf = buf.at[:, TL - h : TL].set(
                    _filter_edge_apply(jnp, e, plan_l, str_l))
            else:
                buf = buf.at[:, TL - h : TL].set(e[:, OFS - h : OFS])
            buf = buf.at[:, TL].set(e[:, OFS])
            t0 = jnp.take(buf, jnp.asarray(ti0.reshape(-1)), axis=1)
            t1 = jnp.take(buf, jnp.asarray(ti1.reshape(-1)), axis=1)
            l0 = jnp.take(buf, jnp.asarray(li0.reshape(-1)), axis=1)
            l1 = jnp.take(buf, jnp.asarray(li1.reshape(-1)), axis=1)
            t0, t1, l0, l1 = (v.reshape(N, h, w) for v in (t0, t1, l0, l1))
            fx = jnp.asarray(frac_x)[None]
            fy = jnp.asarray(frac_y)[None]
            vt = (t0 * (64 - fx) + t1 * fx + 32) >> 6
            vl = (l0 * (64 - fy) + l1 * fy + 32) >> 6
            return jnp.where(jnp.asarray(use_top)[None], vt, vl)
    elif mode == M.FILTER_PRED:
        flt = tables.filter_intra_taps[angle & 511].astype(np.int32)
        # flt[fi + 8*j]: tap j of output fi (8 stride slots, 7 taps used)
        taps = flt.reshape(8, 8)[:7]  # (7 inputs, 8 outputs)
        maxp = (1 << bitdepth) - 1

        def fn(e):
            from jax import lax

            N = e.shape[0]
            tm = jnp.asarray(taps)  # (7, 8)
            # row-pair scan: carry = canvas row y incl. its left-edge
            # column [x=0]; per step the two left-edge pixels of rows
            # y+1/y+2 ride in xs.  2x4 blocks chain left-to-right inside
            # the body (p5/p6 of block k+1 are block k's col-3 outputs).
            left_col = e[:, OFS - h : OFS][:, ::-1]      # (N, h)
            lp = jnp.stack([left_col[:, 0::2], left_col[:, 1::2]],
                           axis=2)                        # (N, h/2, 2)
            row0 = jnp.concatenate(
                [e[:, OFS : OFS + 1], e[:, OFS + 1 : OFS + 1 + w]],
                axis=1)                                   # (N, w+1)

            def step(prev, lpair):
                p5, p6 = lpair[:, 0], lpair[:, 1]
                r1, r2 = [], []
                for x in range(0, w, 4):
                    p = jnp.concatenate(
                        [prev[:, x : x + 5],
                         p5[:, None], p6[:, None]], axis=1)   # (N, 7)
                    v = jnp.clip((p @ tm + 8) >> 4, 0, maxp)  # (N, 8)
                    r1.append(v[:, :4])
                    r2.append(v[:, 4:])
                    p5, p6 = v[:, 3], v[:, 7]
                row1 = jnp.concatenate(r1, axis=1)
                row2 = jnp.concatenate(r2, axis=1)
                nxt = jnp.concatenate([lpair[:, 1:2], row2], axis=1)
                return nxt, (row1, row2)

            _, (r1s, r2s) = lax.scan(step, row0,
                                     jnp.moveaxis(lp, 1, 0))
            # interleave the (h/2, N, w) row stacks back into (N, h, w)
            out = jnp.stack([r1s, r2s], axis=1)      # (h/2, 2, N, w)
            return jnp.moveaxis(out.reshape(h // 2 * 2, N, w), 0, 1)
    else:
        raise NotImplementedError(f"device ipred mode {mode}")
    return fn


def _filter_edge_apply_rt(jnp, edges, plan, strength, lo=None, hi=None):
    """filter_edge with RUNTIME per-unit strength and optional runtime
    pass-through limits (plan built with the full [0, sz) active
    span).  strength: (N,) int; lo/hi: (N,) limits — a position i is
    passed through when i < lo or i >= hi."""
    conv_idx, center_idx, passthru = plan
    sz = center_idx.shape[0]
    g = jnp.take(edges, jnp.asarray(conv_idx.reshape(-1)), axis=1)
    g = g.reshape(edges.shape[0], sz, 5)
    k = jnp.asarray(_EDGE_KERNELS.astype(np.int32))[
        jnp.clip(strength - 1, 0, 2)]  # (N, 5)
    f = (jnp.sum(g * k[:, None, :], axis=2) + 8) >> 4
    c = jnp.take(edges, jnp.asarray(center_idx), axis=1)
    pt = jnp.asarray(passthru)[None]
    i = jnp.arange(sz, dtype=jnp.int32)[None]
    if lo is not None:
        pt = pt | (i < lo[:, None])
    if hi is not None:
        pt = pt | (i >= hi[:, None])
    return jnp.where(pt, c, f)


def _str_ups_tables(n):
    """Trace-time (2, 90) strength/upsample tables over the delta
    range, so the per-unit decision is one gather."""
    st = np.zeros((2, 90), np.int32)
    ut = np.zeros((2, 90), np.int32)
    for sm in (0, 1):
        for da in range(90):
            st[sm, da] = get_filter_strength(n, da, sm)
            ut[sm, da] = get_upsample(n, da, sm)
    return st, ut


def _build_rt(mode, w, h, bitdepth):
    """Runtime-parameter variant of _build for the angular and
    filter-intra modes: the angle (with its smooth/filter flag bits),
    the Z2 clamped max_w/max_h, and every decision derived from them
    (edge filter strength, upsampling, derivative stepping) arrive
    PER UNIT, so one compiled program serves every angle of a
    (mode, w, h) key — collapsing the device-intra schedule's program
    diversity (the per-(level, key) launch/compile storm) at the cost
    of evaluating both the upsampled and non-upsampled index paths for
    keys small enough to upsample (w + h <= 16).

    Returns fn(edges (N, 257), prm (N, >=3) int32) with prm columns
    (akey, max_w, max_h); bit 9 of akey = smooth-filter flag, bit 10 =
    enable-intra-edge-filter, low 9 bits = final angle (reference
    src/ipred_prepare_tmpl.c sm_/enable flags + angle)."""
    jnp = _jnp()
    dr = jnp_dr = None
    maxp = (1 << bitdepth) - 1

    if mode in (M.Z1_PRED, M.Z3_PRED):
        n = w + h
        str_tab, ups_tab = _str_ups_tables(n)
        if mode == M.Z1_PRED:
            inp0, base, frm, to = OFS, 1, -1, w + min(w, h)
        else:
            inp0, base, frm, to = OFS - n, 0, max(w - h, 0), n + 1
        fplan = _filter_edge_plan(n, 0, n, inp0, base, frm, to)
        can_ups = n <= 16
        uplan = _upsample_plan(n, inp0, base, frm, to) if can_ups else None
        ys, xs = np.mgrid[0:h, 0:w]
        step = (ys + 1) if mode == M.Z1_PRED else (xs + 1)
        lane = xs if mode == M.Z1_PRED else ys
        raw_max_base = (w if mode == M.Z1_PRED else h) + min(w, h) - 1
        drt = tables.dr_intra_derivative.astype(np.int32)

        def fn(e, prm):
            N = e.shape[0]
            akey = prm[:, 0]
            is_sm = (akey >> 9) & 1
            en_f = akey >> 10
            a = akey & 511
            if mode == M.Z1_PRED:
                da, didx = 90 - a, a >> 1
            else:
                da, didx = a - 180, (270 - a) >> 1
            d = jnp.asarray(drt)[jnp.clip(didx, 0, drt.shape[0] - 1)]
            dac = jnp.clip(da, 0, 89)
            strg = jnp.where(en_f > 0,
                             jnp.asarray(str_tab)[is_sm, dac], 0)
            ups = (jnp.where(en_f > 0, jnp.asarray(ups_tab)[is_sm, dac],
                             0) if can_ups else jnp.zeros_like(a))
            strg = jnp.where(ups > 0, 0, strg)

            raw = (e[:, OFS + 1 : OFS + 1 + n] if mode == M.Z1_PRED
                   else e[:, OFS - n : OFS])
            filt = _filter_edge_apply_rt(jnp, e, fplan, strg)
            vec_n = jnp.where(strg[:, None] > 0, filt, raw)

            def zpath(vec, dd, binc, max_base, vec_top):
                pos = dd[:, None, None] * jnp.asarray(step)[None]
                bidx = (pos >> 6) + binc * jnp.asarray(lane)[None]
                frac = pos & 0x3E
                sat = bidx >= max_base
                b0 = jnp.minimum(bidx, max_base)
                b1 = jnp.minimum(bidx + 1, max_base)
                if mode == M.Z3_PRED:
                    b0, b1 = vec_top - b0, vec_top - b1
                    sv = vec_top - max_base
                else:
                    sv = max_base
                g0 = jnp.take_along_axis(vec, b0.reshape(N, -1),
                                         axis=1).reshape(N, h, w)
                g1 = jnp.take_along_axis(vec, b1.reshape(N, -1),
                                         axis=1).reshape(N, h, w)
                v = (g0 * (64 - frac) + g1 * frac + 32) >> 6
                if isinstance(sv, int):
                    sva = jnp.full((N, 1), sv, jnp.int32)
                else:
                    sva = sv.reshape(N, 1)
                satv = jnp.take_along_axis(vec, sva, axis=1)
                return jnp.where(sat, satv[:, :, None], v)

            mb_nu = jnp.where(strg > 0, n - 1,
                              raw_max_base)[:, None, None]
            vA = zpath(vec_n, d, 1, mb_nu, n - 1)
            if can_ups:
                vec_u = _upsample_apply(jnp, e, uplan, bitdepth)
                vB = zpath(vec_u, d << 1, 2, 2 * n - 2, 2 * n - 2)
                return jnp.where(ups[:, None, None] > 0, vB, vA)
            return vA

        return fn

    if mode == M.Z2_PRED:
        TL = 64
        str_tab, ups_tab = _str_ups_tables(w + h)
        can_ups = w + h <= 16
        fplan_a = _filter_edge_plan(w, 0, w, OFS, 1, -1, w)
        fplan_l = _filter_edge_plan(h, 0, h, OFS - h, 0, 0, h + 1)
        uplan_a = _upsample_plan(w + 1, OFS, 0, 0, w + 1) \
            if can_ups else None
        uplan_l = _upsample_plan(h + 1, OFS - h, 0, 0, h + 1) \
            if can_ups else None
        ys, xs = np.mgrid[0:h, 0:w]
        drt = tables.dr_intra_derivative.astype(np.int32)

        def fn(e, prm):
            N = e.shape[0]
            akey, kmw, kmh = prm[:, 0], prm[:, 1], prm[:, 2]
            is_sm = (akey >> 9) & 1
            en_f = akey >> 10
            a = akey & 511
            da_t = jnp.clip(a - 90, 0, 89)
            da_l = jnp.clip(180 - a, 0, 89)
            dy = jnp.asarray(drt)[jnp.clip((a - 90) >> 1, 0,
                                           drt.shape[0] - 1)]
            dx = jnp.asarray(drt)[jnp.clip((180 - a) >> 1, 0,
                                           drt.shape[0] - 1)]
            st, ut = jnp.asarray(str_tab), jnp.asarray(ups_tab)
            ups_a = (jnp.where(en_f > 0, ut[is_sm, da_t], 0)
                     if can_ups else jnp.zeros_like(a))
            ups_l = (jnp.where(en_f > 0, ut[is_sm, da_l], 0)
                     if can_ups else jnp.zeros_like(a))
            str_a = jnp.where((en_f > 0) & (ups_a == 0),
                              st[is_sm, da_t], 0)
            str_l = jnp.where((en_f > 0) & (ups_l == 0),
                              st[is_sm, da_l], 0)

            raw_t = e[:, OFS + 1 : OFS + 1 + w]
            raw_l = e[:, OFS - h : OFS]
            # runtime pass-through limits mirror the static plans'
            # (0, max_w) / (h - max_h, h) spans
            filt_t = _filter_edge_apply_rt(jnp, e, fplan_a, str_a,
                                           hi=jnp.minimum(kmw, w))
            filt_l = _filter_edge_apply_rt(jnp, e, fplan_l, str_l,
                                           lo=h - kmh)
            nu_t = jnp.where(str_a[:, None] > 0, filt_t, raw_t)
            nu_l = jnp.where(str_l[:, None] > 0, filt_l, raw_l)

            buf = jnp.zeros((N, 129), dtype=jnp.int32)
            if can_ups:
                up_t = _upsample_apply(jnp, e, uplan_a, bitdepth)
                up_l = _upsample_apply(jnp, e, uplan_l, bitdepth)
                top_span = jnp.where(
                    ups_a[:, None] > 0, up_t[:, 1:],
                    jnp.pad(nu_t, ((0, 0), (0, w))))
                left_span = jnp.where(
                    ups_l[:, None] > 0, up_l[:, : 2 * h],
                    jnp.pad(nu_l, ((0, 0), (h, 0))))
                buf = buf.at[:, TL + 1 : TL + 1 + 2 * w].set(top_span)
                buf = buf.at[:, TL - 2 * h : TL].set(left_span)
            else:
                buf = buf.at[:, TL + 1 : TL + 1 + w].set(nu_t)
                buf = buf.at[:, TL - h : TL].set(nu_l)
            buf = buf.at[:, TL].set(e[:, OFS])

            binc_x = (1 + ups_a)[:, None, None]
            left_base = (TL - 1 - ups_l)[:, None, None]
            jys = jnp.asarray(ys)[None]
            jxs = jnp.asarray(xs)[None]
            # the derivatives double alongside the upsampled spacing
            dxe = (dx << ups_a)[:, None, None]
            dye = (dy << ups_l)[:, None, None]
            bx0 = (binc_x << 6) - dxe * (jys + 1)
            base_x = (bx0 >> 6) + binc_x * jxs
            frac_x = bx0 & 0x3E
            ypos = (jys << 6) * (1 + ups_l)[:, None, None] \
                - dye * (jxs + 1)
            base_y = ypos >> 6
            frac_y = ypos & 0x3E
            use_top = base_x >= 0
            ti0 = TL + jnp.clip(base_x, 0, 64)
            ti1 = TL + jnp.clip(base_x + 1, 0, 64)
            li0 = jnp.clip(left_base - base_y, 0, 128)
            li1 = jnp.clip(left_base - (base_y + 1), 0, 128)

            def gat(idx):
                return jnp.take_along_axis(
                    buf, idx.reshape(N, -1), axis=1).reshape(N, h, w)

            vt = (gat(ti0) * (64 - frac_x) + gat(ti1) * frac_x
                  + 32) >> 6
            vl = (gat(li0) * (64 - frac_y) + gat(li1) * frac_y
                  + 32) >> 6
            return jnp.where(use_top, vt, vl)

        return fn

    if mode == M.FILTER_PRED:
        from jax import lax

        all_taps = tables.filter_intra_taps.astype(np.int32) \
            .reshape(-1, 8, 8)[:, :7, :]  # (n_filters, 7, 8)

        def fn(e, prm):
            N = e.shape[0]
            fidx = jnp.clip(prm[:, 0] & 511, 0,
                            all_taps.shape[0] - 1)
            tm = jnp.asarray(all_taps)[fidx]  # (N, 7, 8)
            left_col = e[:, OFS - h : OFS][:, ::-1]
            lp = jnp.stack([left_col[:, 0::2], left_col[:, 1::2]],
                           axis=2)
            row0 = jnp.concatenate(
                [e[:, OFS : OFS + 1], e[:, OFS + 1 : OFS + 1 + w]],
                axis=1)

            def stepf(prev, lpair):
                p5, p6 = lpair[:, 0], lpair[:, 1]
                r1, r2 = [], []
                for x in range(0, w, 4):
                    p = jnp.concatenate(
                        [prev[:, x : x + 5], p5[:, None], p6[:, None]],
                        axis=1)  # (N, 7)
                    v = jnp.clip(
                        (jnp.einsum("nk,nko->no", p, tm) + 8) >> 4,
                        0, maxp)
                    r1.append(v[:, :4])
                    r2.append(v[:, 4:])
                    p5, p6 = v[:, 3], v[:, 7]
                row1 = jnp.concatenate(r1, axis=1)
                row2 = jnp.concatenate(r2, axis=1)
                nxt = jnp.concatenate([lpair[:, 1:2], row2], axis=1)
                return nxt, (row1, row2)

            _, (r1s, r2s) = lax.scan(stepf, row0, jnp.moveaxis(lp, 1, 0))
            out = jnp.stack([r1s, r2s], axis=1)
            return jnp.moveaxis(out.reshape(h // 2 * 2, N, w), 0, 1)

        return fn

    raise NotImplementedError(f"runtime ipred mode {mode}")


@functools.lru_cache(maxsize=512)
def _program(mode, w, h, angle, max_w, max_h, bitdepth):
    import jax

    return jax.jit(_build(int(mode), w, h, angle, max_w, max_h, bitdepth))


def ipred_batch(mode, edges, w, h, angle=0, max_w=0, max_h=0, bitdepth=8):
    """(N, 257) int32 edge vectors -> (N, h, w) int32 predictions on the
    device (one program per static key)."""
    jnp = _jnp()
    e = jnp.asarray(np.ascontiguousarray(edges, dtype=np.int32))
    return _program(int(mode), w, h, int(angle), int(max_w), int(max_h),
                    bitdepth)(e)


@functools.lru_cache(maxsize=128)
def _cfl_program(mode, w, h, bitdepth):
    import jax

    jnp = _jnp()
    half = (1 << bitdepth) >> 1
    maxp = (1 << bitdepth) - 1

    def run(e, ac, alpha):
        if mode == M.DC_PRED:
            dc = ((w + h) >> 1) \
                + jnp.sum(e[:, OFS + 1 : OFS + 1 + w], axis=1) \
                + jnp.sum(e[:, OFS - h : OFS], axis=1)
            dc = _dc_mul(dc >> (((w + h) & -(w + h)).bit_length() - 1),
                         w, h, bitdepth, jnp)
        elif mode == M.TOP_DC_PRED:
            dc = (jnp.sum(e[:, OFS + 1 : OFS + 1 + w], axis=1)
                  + (w >> 1)) >> (w.bit_length() - 1)
        elif mode == M.LEFT_DC_PRED:
            dc = (jnp.sum(e[:, OFS - h : OFS], axis=1) + (h >> 1)) >> \
                (h.bit_length() - 1)
        else:
            dc = jnp.full((e.shape[0],), half, dtype=jnp.int32)
        diff = alpha[:, None, None] * ac
        adj = (jnp.abs(diff) + 32) >> 6
        out = dc[:, None, None] + jnp.sign(diff) * adj
        return jnp.clip(out, 0, maxp)

    return jax.jit(run)


def cfl_pred_batch(mode, edges, w, h, ac, alpha, bitdepth):
    """Batched CFL prediction (reference ipred_cfl_*_c): edges (N, 257),
    ac (N, h, w) int32, alpha (N,) int32 -> (N, h, w)."""
    jnp = _jnp()
    e = jnp.asarray(np.ascontiguousarray(edges, dtype=np.int32))
    return _cfl_program(int(mode), w, h, bitdepth)(
        e, jnp.asarray(np.ascontiguousarray(ac, dtype=np.int32)),
        jnp.asarray(np.ascontiguousarray(alpha, dtype=np.int32)))


@functools.lru_cache(maxsize=16)
def _pal_program(w, h):
    import jax

    jnp = _jnp()

    def run(pal, idx):
        return jnp.take_along_axis(
            pal[:, None, :], idx.reshape(idx.shape[0], -1)[:, None, :],
            axis=2).reshape(idx.shape[0], h, w)

    return jax.jit(run)


def pal_pred_batch(pal, idx, w, h):
    """Batched palette expansion (reference pal_pred_c): pal (N, 8),
    idx (N, h, w) -> (N, h, w) int32."""
    jnp = _jnp()
    return _pal_program(w, h)(
        jnp.asarray(np.ascontiguousarray(pal, dtype=np.int32)),
        jnp.asarray(np.ascontiguousarray(idx, dtype=np.int32)))
