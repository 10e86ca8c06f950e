"""Device loop restoration: batched 7-tap separable wiener over padded
restoration units (reference wiener_filter_h/v,
src/looprestoration_tmpl.c:44-190).

Each call processes a batch of same-geometry padded units
(B, stripe_h+6, unit_w+6) with per-unit filters — the stripe
decomposition (recon/lr_apply.py) supplies the batches.  Parity:
tests/test_ops_lr.py vs the host numpy formulation."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables


@functools.lru_cache(maxsize=None)
def _jit_wiener(unit_w, stripe_h, bitdepth):
    rb_h = 3 + (bitdepth == 12) * 2
    clip_limit = 1 << (bitdepth + 1 + 7 - rb_h)
    rb_v = 11 - (bitdepth == 12) * 2
    round_offset = 1 << (bitdepth + rb_v - 1)

    def run(P, fh, fv):
        # P: (B, sh+6, uw+6) int32; fh/fv: (B, 3)
        def taps(f):
            mid = 128 - 2 * (f[:, 0] + f[:, 1] + f[:, 2])
            return jnp.stack([f[:, 0], f[:, 1], f[:, 2], mid,
                              f[:, 2], f[:, 1], f[:, 0]], axis=1)

        wh = taps(fh)
        wv = taps(fv)
        mid = sum(wh[:, i, None, None] * P[:, :, i : i + unit_w]
                  for i in range(7))
        mid += (1 << (bitdepth + 6)) + (1 << (rb_h - 1))
        mid = jnp.clip(mid >> rb_h, 0, clip_limit - 1)
        out = sum(wv[:, k, None, None] * mid[:, k : k + stripe_h]
                  for k in range(7))
        out = (out - round_offset + (1 << (rb_v - 1))) >> rb_v
        return jnp.clip(out, 0, (1 << bitdepth) - 1)

    return jax.jit(run)


def _mesh_put(arrs, mesh):
    """Pad the leading batch axis to a mesh multiple (repeating item 0 —
    always a valid unit) and shard it across the mesh: restoration units
    are spatially independent (they read only pre-LR snapshots), so the
    unit batch IS the decoder's tiles->chips axis for this stage."""
    from jax.sharding import PartitionSpec

    from ..devrt import mesh_put

    ndev = int(mesh.devices.size)
    B = arrs[0].shape[0]
    nb = -(-B // ndev) * ndev
    spec = PartitionSpec(mesh.axis_names[0])
    out = []
    for a in arrs:
        if nb != B:
            a = np.concatenate([a, np.repeat(a[:1], nb - B, axis=0)])
        out.append(mesh_put(np.ascontiguousarray(a, dtype=np.int32),
                            mesh, spec))
    return out


def wiener_batch(P, fh, fv, bitdepth, mesh=None):
    """(B, sh+6, uw+6) padded units + per-unit (B, 3) half-filters ->
    (B, sh, uw) int32."""
    B, ph, pw = P.shape
    prog = _jit_wiener(pw - 6, ph - 6, int(bitdepth))
    if mesh is not None:
        from ..devrt import mesh_fetch

        args = _mesh_put([P, fh, fv], mesh)
        return mesh_fetch(prog(*args))[:B]
    from ..devrt import call

    out = call("lr", prog,
               jnp.asarray(P, dtype=jnp.int32),
               jnp.asarray(fh, dtype=jnp.int32),
               jnp.asarray(fv, dtype=jnp.int32))
    return np.asarray(out)


# ---- self-guided restoration -------------------------------------------
#
# The host formulation (recon/lr_apply.py _sgr) uses int64 for two
# products that exceed int32 at 12-bit: z = (p*s + 2^19) >> 20 (up to
# ~38 bits) and A = (xv*su*one_by_x + 2^11) >> 12 (up to ~34 bits).
# The device kernel computes both EXACTLY in int32 with a nested-floor
# split-multiply:
#
#     (q*s + 2^(k-1)) >> k  ==  (q_hi*s + ((q_lo*s + 2^(k-1)) >> m)) >> (k-m)
#         where q = q_hi*2^m + q_lo
#
# (floor((a*2^m + r)/2^k) == floor((a + floor(r/2^m))/2^(k-m)) for
# integer a — the same identity the reference's SIMD relies on for its
# 16-bit factorizations, src/looprestoration_tmpl.c:505-523 vs the asm.)
# Every remaining intermediate fits int32: box sums <= 25*4095 (17 bits),
# square sums <= 25*4095^2 (~2^28.6), neighbourhood sums b - a*src
# (~2^27), and the weighted blend w0*tmp5 + w1*tmp3 (~2^27).


@functools.lru_cache(maxsize=None)
def _sgr_x_by_x():
    return jnp.asarray(np.ascontiguousarray(tables.sgr_x_by_x,
                                            dtype=np.int32))


def _split_mul_shift(q, s, k, m, xp=jnp):
    """Exact (q*s + 2^(k-1)) >> k for q, s >= 0 without exceeding int32
    (q < 2^(31-? ) split at bit m)."""
    q_hi = q >> m
    q_lo = q & ((1 << m) - 1)
    return (q_hi * s + ((q_lo * s + (1 << (k - 1))) >> m)) >> (k - m)


@functools.lru_cache(maxsize=None)
def _jit_sgr(unit_w, stripe_h, bitdepth, variant):
    """variant: 0 = 5x5 only, 1 = 3x3 only, 2 = mix (reference
    sgr_5x5_c / sgr_3x3_c / sgr_mix_c)."""
    bdm8 = bitdepth - 8
    x_by_x = _sgr_x_by_x()

    def box_h(P, r):
        w2 = unit_w + 2
        su = sum(P[:, :, 2 - r + i : 2 - r + i + w2]
                 for i in range(2 * r + 1))
        sq = sum(P[:, :, 2 - r + i : 2 - r + i + w2] ** 2
                 for i in range(2 * r + 1))
        return su, sq

    def calc_ab(su, sq, s, n, one_by_x):
        a = (sq + ((1 << (2 * bdm8)) >> 1)) >> (2 * bdm8)
        b = (su + ((1 << bdm8) >> 1)) >> bdm8
        p = jnp.maximum(a * n - b * b, 0)
        z = _split_mul_shift(p, s[:, None], 20, 10)
        xv = x_by_x[jnp.minimum(z, 255)]
        A = _split_mul_shift(xv * su, one_by_x, 12, 12)
        return A, xv

    def tmp3(P, src, s):
        su, sq = box_h(P, 1)  # (B, sh+6, uw+2)
        A = []
        B = []
        for y in range(-1, stripe_h + 1):
            s3 = su[:, y + 2] + su[:, y + 3] + su[:, y + 4]
            q3 = sq[:, y + 2] + sq[:, y + 3] + sq[:, y + 4]
            Ar, Br = calc_ab(s3, q3, s, 9, 455)
            A.append(Ar)
            B.append(Br)

        def eight(M, j):
            c, up, dn = M[j + 1], M[j], M[j + 2]
            return ((c[:, 1:-1] + c[:, :-2] + c[:, 2:] + up[:, 1:-1]
                     + dn[:, 1:-1]) * 4
                    + (up[:, :-2] + dn[:, :-2] + up[:, 2:]
                       + dn[:, 2:]) * 3)

        rows = [(eight(A, j) - eight(B, j) * src[:, j] + (1 << 8)) >> 9
                for j in range(stripe_h)]
        return jnp.stack(rows, axis=1)

    def tmp5(P, src, s):
        su, sq = box_h(P, 2)
        ab = {}

        def get_ab(y):  # y odd, in [-1, stripe_h]
            if y not in ab:
                s5 = sum(su[:, y + 1 + i] for i in range(5))
                q5 = sum(sq[:, y + 1 + i] for i in range(5))
                ab[y] = calc_ab(s5, q5, s, 25, 164)
            return ab[y]

        def six2(Mu, Md):
            return ((Mu[:, 1:-1] + Md[:, 1:-1]) * 6
                    + (Mu[:, :-2] + Md[:, :-2] + Mu[:, 2:]
                       + Md[:, 2:]) * 5)

        def six1(M):
            return M[:, 1:-1] * 6 + (M[:, :-2] + M[:, 2:]) * 5

        rows = []
        for j in range(stripe_h):
            if j % 2 == 0:
                Au, Bu = get_ab(j - 1)
                Ad, Bd = get_ab(j + 1)
                rows.append((six2(Au, Ad) - six2(Bu, Bd) * src[:, j]
                             + (1 << 8)) >> 9)
            else:
                A1, B1 = get_ab(j)
                rows.append((six1(A1) - six1(B1) * src[:, j]
                             + (1 << 7)) >> 8)
        return jnp.stack(rows, axis=1)

    def run(P, src, s0, s1, w0, w1):
        if variant == 0:
            v = w0[:, None, None] * tmp5(P, src, s0)
        elif variant == 1:
            v = w1[:, None, None] * tmp3(P, src, s1)
        else:
            v = (w0[:, None, None] * tmp5(P, src, s0)
                 + w1[:, None, None] * tmp3(P, src, s1))
        out = src + ((v + (1 << 10)) >> 11)
        return jnp.clip(out, 0, (1 << bitdepth) - 1)

    return jax.jit(run)


def sgr_batch(P, src, s0, s1, w0, w1, bitdepth, variant, mesh=None):
    """(B, sh+6, uw+6) padded units + (B, sh, uw) unit pixels + per-unit
    strengths/weights -> (B, sh, uw) int32 (reference sgr_5x5_c /
    sgr_3x3_c / sgr_mix_c, src/looprestoration_tmpl.c:679-1090)."""
    B, ph, pw = P.shape
    prog = _jit_sgr(pw - 6, ph - 6, int(bitdepth), int(variant))
    if mesh is not None:
        args = _mesh_put([P, src, s0, s1, w0, w1], mesh)
        from ..devrt import mesh_fetch

        return mesh_fetch(prog(*args))[:B]
    from ..devrt import call

    out = call("lr", prog,
               jnp.asarray(P, dtype=jnp.int32),
               jnp.asarray(src, dtype=jnp.int32),
               jnp.asarray(s0, dtype=jnp.int32),
               jnp.asarray(s1, dtype=jnp.int32),
               jnp.asarray(w0, dtype=jnp.int32),
               jnp.asarray(w1, dtype=jnp.int32))
    return np.asarray(out)
