"""Two-pass reconstruction pipeline (pass 2).

Pass 1 (decode.frame with two_pass=True) runs the serial entropy decode and
captures per-block tasks: mode info, dequantized coefficients, and
parse-time context snapshots (OBMC neighbours, sub8x8 filters, warp
params). Pass 2 executes the pixel work:

  1. residual stage: EVERY captured inverse transform (intra and inter)
     is evaluated up front, batched per (tx size, tx type) — the
     transform depends only on the coefficients, never on reconstructed
     pixels, so this is exact. Batches run either on the host (shared
     1-D lane kernels over numpy, default) or as one XLA program per
     group on the device (DAV1D_TPU_ITX_DEVICE_MIN) — the TPU pass of
     the reference's pass-1/pass-2 frame-threading split
     (src/internal.h:276-293).
  2. inter predictions replay order-free (they read only reference
     frames) with their cached residuals added at the capture points.
  3. intra/intrabc/interintra blocks replay in decode order (their
     prediction reads reconstructed neighbours), adding cached residuals.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .decode.tile import TaskContext

# sticky device-intra failure flag: one exception out of the wavefront
# chain degrades the rest of the process to the host phase-B walk
# (mirrors recon/device_chain._BROKEN for the filter chain)
_INTRA_DEV_BROKEN: set = set()




def _replay_one(t, rec) -> None:
    from .recon.intra import recon_b_intra
    from .recon.inter import recon_b_inter
    t.bx = rec["bx"]
    t.by = rec["by"]
    t.ts = rec["ts"]
    t.cur_rec = rec
    t.rec_coef_pos = 0
    b = rec["b"]
    if rec["kind"] == "intra":
        if rec["pal"] is not None:
            t.scratch_pal[:] = rec["pal"][0]
            t.pal_idx_y = rec["pal"][1]
            t.pal_idx_uv = rec["pal"][2]
        recon_b_intra(t, rec["bs"], rec["edge_flags"], b)
    else:
        t.warpmv = rec.get("warpmv")
        recon_b_inter(t, rec["bs"], b)


class _NativeResiduals:
    """Residual-batch state for the arena-driven (record-free) pass 2:
    per-meta-row result pointers + keep-alive group results."""

    __slots__ = ("ptrs", "elsz", "pending", "groups")

    def __init__(self, n_meta):
        self.ptrs = np.zeros(n_meta, dtype=np.uint64)
        self.elsz = 4
        self.pending = []  # (future, meta_idxs)
        self.groups = []   # (meta_idxs, (n, h, w) result array)

    def _register(self, idxs, out):
        self.groups.append((idxs, out))
        self.ptrs[idxs] = out.ctypes.data + \
            np.arange(len(idxs), dtype=np.uint64) * out.strides[0]

    def collect(self):
        for fut, idxs in self.pending:
            from .devrt import mesh_fetch
            resid = np.ascontiguousarray(mesh_fetch(fut)[: len(idxs)])
            self._register(idxs, resid)
        self.pending = []

    def resid_of_meta(self, m):
        for idxs, out in self.groups:
            j = np.flatnonzero(idxs == m)
            if j.size:
                return out[int(j[0])]
        return None


def _launch_residuals_native(f):
    """Group every captured inverse transform per (tx size, tx type)
    straight off the coefficient-meta arena (no Python records) and
    start evaluating: device groups launch asynchronously, host groups
    run through the native batched itx via a pointer array into the cf
    arena.  The record-free analog of _launch_residuals."""
    glue = f._nat
    meta = glue.meta_rows()
    st = _NativeResiduals(meta.shape[0])
    if meta.shape[0] == 0:
        return st
    valid = np.flatnonzero(meta[:, 0] >= 0)
    if valid.size == 0:
        return st
    key = (meta[valid, 2].astype(np.int64) >> 8 << 16) | meta[valid, 1]
    # secondary sort by eob: clusters sparse blocks into the same
    # 8-lane SIMD groups so the native itx's all-zero-row skip bites
    # (groups still cut on the (tx, txtp) part of the key only)
    eob = np.minimum(meta[valid, 0].astype(np.int64), 0x7FF)
    order = np.argsort(key << 11 | eob, kind="stable")
    sk = key[order]
    cuts = np.flatnonzero(np.diff(sk)) + 1
    group_idxs = np.split(valid[order], cuts)

    from .dispatch import use_device
    mesh = getattr(f, "mesh", None)
    device = use_device("itx") or mesh is not None
    use_pallas = device and mesh is None \
        and os.environ.get("DAV1D_TPU_ITX_PALLAS") == "1"
    if use_pallas:
        from .ops.pallas_itx import itx_batch_pallas, supported
        use_pallas = supported(f.bitdepth)
    cf_arena = glue.cf_arena
    cf_base = cf_arena.ctypes.data
    from .native.decode_glue import _n_coef
    from .ops.itx import itx_batch, itx_batch_c_ptrs

    if device:
        st.elsz = 4 if use_pallas else (2 if f.bitdepth == 8 else 4)
    else:
        # host itx emits int16 residuals for bd <= 10 (see
        # ops/itx.itx_batch_c_ptrs bound note); 12-bit IDTX needs int32
        st.elsz = 2 if f.bitdepth <= 10 else 4
    for idxs in group_idxs:
        m0 = meta[idxs[0]]
        gtx, gtxtp = int(m0[2]) >> 8, int(m0[1])
        nc = _n_coef(gtx)
        if use_pallas:
            gath = cf_arena[meta[idxs, 5][:, None] + np.arange(nc)]
            resid = itx_batch_pallas(gath, gtx, gtxtp, f.bitdepth)
            st._register(idxs, np.ascontiguousarray(resid))
        elif device:
            gath = cf_arena[meta[idxs, 5][:, None] + np.arange(nc)]
            nb = 1
            while nb < len(idxs):
                nb <<= 1
            dt = np.int16 if f.bitdepth == 8 else np.int32
            if mesh is not None:
                nb = max(nb, mesh.devices.size)
            cfs = np.zeros((nb, nc), dtype=dt)
            cfs[: len(idxs)] = gath
            if mesh is not None:
                from jax.sharding import PartitionSpec

                from .devrt import mesh_put

                arg = mesh_put(cfs, mesh,
                               PartitionSpec(mesh.axis_names[0]))
            else:
                arg = cfs
            fut = itx_batch(arg, gtx, gtxtp, f.bitdepth)
            if getattr(fut, 'is_fully_addressable', True):
                fut.copy_to_host_async()
            st.pending.append((fut, idxs))
        else:
            ptrs = (cf_base +
                    meta[idxs, 5].astype(np.int64) * 4).astype(np.uint64)
            out = itx_batch_c_ptrs(ptrs, gtx, gtxtp, f.bitdepth,
                                   eob=meta[idxs, 0])
            st._register(idxs, out)
    return st


class _McDevice:
    """Batched device-MC stage state: which blocks it owns + the async
    per-(w, h) launches with their scatter coordinates."""

    __slots__ = ("handled", "block_idxs", "launched")


# replicated border around every stacked ref plane: windows of blocks
# whose MVs reach up to this far outside the frame ride the Pallas
# gather (border replication == the XLA fallback's index clamp, ==
# emu_edge); only farther blocks fall back (reference src/mc_tmpl.c
# emu_edge split — dav1d likewise edge-extends its picture padding)
MC_PAD = 64


@functools.lru_cache(maxsize=None)
def _stack_prog(n, ph, pw, vh, vw):
    import jax
    import jax.numpy as jnp

    php = -(-(vh + 2 * MC_PAD) // 8) * 8
    pwp = -(-(vw + 2 * MC_PAD) // 128) * 128

    def run(*xs):
        # pad from the CODED region: rows/cols beyond (vh, vw) in the
        # alloc planes are scratch, and the replicated border must
        # reproduce the XLA fallback's index clamp exactly
        return jnp.concatenate(
            [jnp.pad(x[:vh, :vw],
                     ((MC_PAD, php - vh - MC_PAD),
                      (MC_PAD, pwp - vw - MC_PAD)), mode="edge")
             for x in xs], axis=0)

    return jax.jit(run)


def _stack_planes(arrs, vh, vw):
    """Concatenate resident ref planes into one tall device array (one
    copy per frame; lets the whole interior MC population launch as a
    single program per tile shape regardless of how many ref slots and
    planes it reads).  Every slot grows a MC_PAD replicated border and
    pads to the (8, 128) tile — the Pallas gather kernel's
    aligned-super-window contract (ops/pallas_mc.py)."""
    from .devrt import call

    ph, pw = arrs[0].shape
    return call("mc_stack",
                _stack_prog(len(arrs), int(ph), int(pw), int(vh),
                            int(vw)), *arrs)


def _slot_rows(vh):
    """Per-slot row stride inside a _stack_planes stack."""
    return -(-(vh + 2 * MC_PAD) // 8) * 8


def _mc_pallas() -> bool:
    """Pallas per-block-DMA window gather for interior resident MC
    (ops/pallas_mc.py).  DAV1D_TPU_MC_PALLAS=1/0 forces; default: on
    for real accelerator backends (the kernel is TPU-only — the CPU
    backend keeps the XLA clamped-gather program)."""
    env = os.environ.get("DAV1D_TPU_MC_PALLAS")
    if env is not None:
        return env == "1"
    from . import dispatch

    return dispatch._platform() not in ("cpu", "none")


_F2D_HTYPE = np.array([0, 0, 0, 2, 2, 2, 1, 1, 1], dtype=np.int32)


def _launch_mc_device(f, glue, n):
    """Batched translational MC on the device (ops/mc.py; SURVEY §2.5 mc
    row): every plain single-ref inter block (no compound/OBMC/warp/
    interintra, unscaled reference, not sub-8x8) contributes one job per
    plane; windows are gathered host-side with edge clamping (emu_edge)
    and one fused put_8tap program per (w, h) filters the whole batch
    with per-item filter rows.  Returns None when no blocks qualify."""
    import jax.numpy as jnp

    from . import tables
    from .ops import mc as dmc

    cb = glue.cap_blocks[:n]
    bdim = tables.block_dimensions
    bw4s = bdim[cb["bs"], 0].astype(np.int32)
    bh4s = bdim[cb["bs"], 1].astype(np.int32)
    ss_hor, ss_ver = f.ss_hor, f.ss_ver
    hdr = f.frame_hdr
    ref0 = cb["pad0"].astype(np.int32) - 1

    ref_ok = np.zeros(7, dtype=bool)
    for i in range(7):
        slot = f.refp[i] if f.refp is not None else None
        ref_ok[i] = (slot is not None and slot.planes is not None
                     and slot.frame_hdr is not None
                     and slot.frame_hdr.width[1] == hdr.width[0]
                     and slot.frame_hdr.height == hdr.height)
    gwa = np.asarray([bool(v) for v in f.gmv_warp_allowed], dtype=bool)
    r0c = np.clip(ref0, 0, 6)
    sel = ((cb["kind"] == 1) & (cb["interintra_type"] == 0)
           & (cb["comp_type"] == 0) & (cb["motion_mode"] == 0)
           & (cb["filter2d"] <= 8) & (ref0 >= 0) & ref_ok[r0c]
           & ~((cb["inter_mode"] == 2) & gwa[r0c])
           & (bw4s > ss_hor) & (bh4s > ss_ver))
    idxs = np.flatnonzero(sel)
    if idxs.size == 0:
        return None

    bw4 = bw4s[idxs]
    bh4 = bh4s[idxs]
    bx = cb["bx"][idxs].astype(np.int32)
    by = cb["by"][idxs].astype(np.int32)
    mv = cb["mv"][idxs]
    mvy = mv[:, 0, 0].astype(np.int32)
    mvx = mv[:, 0, 1].astype(np.int32)
    f2d = cb["filter2d"][idxs].astype(np.int32)
    refs = ref0[idxs]
    ht = _F2D_HTYPE[f2d]
    vt = f2d % 3

    has_chroma = f.layout != 0
    n_pl = 3 if has_chroma else 1
    jobs = []  # per-plane vectors
    for pl in range(n_pl):
        ss_h = ss_hor if pl else 0
        ss_v = ss_ver if pl else 0
        h_mul, v_mul = 4 >> ss_h, 4 >> ss_v
        sh_h, sh_v = (0 if ss_h else 1), (0 if ss_v else 1)
        mx = (mvx & (15 >> sh_h)) << sh_h
        my = (mvy & (15 >> sh_v)) << sh_v
        dx = bx * h_mul + (mvx >> (3 + ss_h))
        dy = by * v_mul + (mvy >> (3 + ss_v))
        w_px = bw4 * h_mul
        h_px = bh4 * v_mul
        fh_set = np.where(w_px > 4, ht, 3 + (ht & 1))
        fv_set = np.where(h_px > 4, vt, 3 + (vt & 1))
        dst_y = (by * 4) >> ss_v
        dst_x = (bx * 4) >> ss_h
        jobs.append((np.full(len(idxs), pl, np.int32), refs, w_px, h_px,
                     dy, dx, mx, my, fh_set, fv_set, dst_y, dst_x))
    pls, jrefs, jw, jh, jdy, jdx, jmx, jmy, jfh, jfv, jdsty, jdstx = \
        (np.concatenate(c) for c in zip(*jobs))

    subf = np.ascontiguousarray(tables.mc_subpel_filters, dtype=np.int32)

    def filter_rows(sel, nb):
        fh = np.zeros((nb, 8), dtype=np.int32)
        fv = np.zeros((nb, 8), dtype=np.int32)
        N = len(sel)
        gmx = np.zeros(nb, dtype=np.int32)
        gmy = np.zeros(nb, dtype=np.int32)
        gmx[:N], gmy[:N] = jmx[sel], jmy[sel]
        hz = gmx == 0
        fh[hz, 3] = 64
        sets = np.zeros(nb, dtype=np.int64)
        sets[:N] = jfh[sel]
        fh[~hz] = subf[sets[~hz], gmx[~hz] - 1]
        vz = gmy == 0
        fv[vz, 3] = 64
        sets[:N] = jfv[sel]
        fv[~vz] = subf[sets[~vz], gmy[~vz] - 1]
        return fh, fv

    # -- tile decomposition (shape bucketing) -------------------------
    # One program per (w, h) block shape means dozens of XLA programs
    # per stream; instead every job decomposes into tiles of a SINGLE
    # static output shape (4x4 for blocks with a 4-px dimension, 8x8
    # for the rest) — exact because a translational block's subpel
    # phase and filter taps are constant over the block, so filtering
    # the w x h block equals filtering each tile against its own
    # window.  All AV1 block dims here are powers of two >= 4, so the
    # decomposition is always full tiles.  Program count collapses to
    # 3 shapes x pow2 batch buckets (the itx batches' rationale); the
    # 16x16 tier quarters the per-window DMA count of the resident
    # gather for large blocks.
    mn = np.minimum(jw, jh)
    tsz = np.where(mn >= 16, 16,
                   np.where(mn >= 8, 8, 4)).astype(np.int32)
    nx = jw // tsz
    ny = jh // tsz
    counts = (nx * ny).astype(np.int64)
    job_of = np.repeat(np.arange(len(jw), dtype=np.int64), counts)
    # per-tile index within its job: 0..counts[j]-1
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(job_of.size, dtype=np.int64) - starts[job_of]
    t_nx = nx[job_of].astype(np.int64)
    tyi = (within // t_nx).astype(np.int32)
    txi = (within % t_nx).astype(np.int32)
    tT = tsz[job_of]
    jw = tT
    jh = tT
    jdy = jdy[job_of] + tyi * tT
    jdx = jdx[job_of] + txi * tT
    jdsty = jdsty[job_of] + tyi * tT
    jdstx = jdstx[job_of] + txi * tT
    pls = pls[job_of]
    jrefs = jrefs[job_of]
    jmx = jmx[job_of]
    jmy = jmy[job_of]
    jfh = jfh[job_of]
    jfv = jfv[job_of]

    launched = []

    # --- resident-ref routing ------------------------------------------
    # Slots finished through the device chain carry resident planes;
    # interior windows of those refs gather ON DEVICE.  Every eligible
    # ref shares the current frame's dimensions (ref_ok above), so the
    # used (ref, plane) pairs STACK into one tall resident array per
    # plane geometry and the whole interior population launches as ONE
    # Pallas program per tile shape — the launch count stops scaling
    # with the ref x plane split (DEVICE_FRAME_r04 measured 53
    # mc_resident launches/frame under the per-pair grouping).
    resident = np.zeros(len(pls), dtype=bool)
    dev_of = {}
    for r in np.unique(jrefs):
        devp = getattr(f.refp[int(r)], "dev_planes", None)
        if devp is not None:
            dev_of[int(r)] = devp
            resident |= jrefs == r
    vhp = np.where(pls == 0, hdr.height,
                   (hdr.height + ss_ver) >> ss_ver)
    vwp = np.where(pls == 0, hdr.width[1],
                   (hdr.width[1] + ss_hor) >> ss_hor)
    # emu_edge split (reference src/mc_tmpl.c:130-180): the stacked
    # refs carry a MC_PAD replicated border, so any window within it
    # rides the Pallas gather with exact clamp semantics; only blocks
    # whose MVs reach farther keep the clamped-gather program
    fast = resident & (jdy >= 3 - MC_PAD) \
        & (jdy + jh + 4 <= vhp + MC_PAD) \
        & (jdx >= 3 - MC_PAD) \
        & (jdx + jw + 4 <= vwp + MC_PAD) if _mc_pallas() \
        else np.zeros_like(resident)

    stack_slot = np.full((7, 3), -1, dtype=np.int32)
    stacks = {}
    if fast.any():
        pairs = sorted({(int(r), int(p))
                        for r, p in zip(jrefs[fast], pls[fast])})
        for kind, kpl in (("y", (0,)), ("uv", (1, 2))):
            kp = [(r, p) for (r, p) in pairs if p in kpl]
            if not kp:
                continue
            for si, (r, p) in enumerate(kp):
                stack_slot[r, p] = si
            arrs = [dev_of[r][p] for r, p in kp]
            vh_k = hdr.height if kind == "y" else \
                (hdr.height + ss_ver) >> ss_ver
            vw_k = hdr.width[1] if kind == "y" else \
                (hdr.width[1] + ss_hor) >> ss_hor
            stacks[kind] = (_stack_planes(arrs, vh_k, vw_k),
                            _slot_rows(vh_k))

    key = (jw.astype(np.int64) << 16) | jh
    order = np.argsort(key, kind="stable")
    cuts = np.flatnonzero(np.diff(key[order])) + 1
    for g in np.split(order, cuts):
        w, h = int(jw[g[0]]), int(jh[g[0]])
        gf = g[fast[g]]
        for kind in ("y", "uv"):
            sp = gf[(pls[gf] == 0) if kind == "y" else (pls[gf] != 0)]
            if not sp.size:
                continue
            from .ops.pallas_mc import BB as _BB
            from .ops.pallas_mc import gather_put_8tap

            stack, ph_one = stacks[kind]
            N = len(sp)
            nb = max(_BB, 1 << max(0, int(N - 1).bit_length()))
            dys = np.full(nb, 3, dtype=np.int32)
            dxs = np.full(nb, 3, dtype=np.int32)
            dys[:N] = jdy[sp] + MC_PAD \
                + stack_slot[jrefs[sp], pls[sp]] * ph_one
            dxs[:N] = jdx[sp] + MC_PAD
            fh, fv = filter_rows(sp, nb)
            fut = gather_put_8tap(
                stack, jnp.asarray(dys), jnp.asarray(dxs),
                jnp.asarray(fh), jnp.asarray(fv), w=w, h=h,
                bitdepth=f.bitdepth)
            if getattr(fut, 'is_fully_addressable', True):
                fut.copy_to_host_async()
            launched.append((fut, (pls[sp], jdsty[sp], jdstx[sp], h, w)))

        # resident edge blocks: clamped-gather replication program per
        # (ref, plane); non-resident refs gather host windows below
        g = g[~fast[g]]
        if not g.size:
            continue
        gkey = (jrefs[g].astype(np.int64) << 4) | pls[g]
        host_rel = []
        for sg_rel in _split_groups(gkey):
            sg = g[sg_rel]
            r, pl = int(jrefs[sg[0]]), int(pls[sg[0]])
            devp = dev_of.get(r)
            if devp is None:
                host_rel.append(sg_rel)
                continue
            ss_h = ss_hor if pl else 0
            ss_v = ss_ver if pl else 0
            vw = (hdr.width[1] + ss_h) >> ss_h
            vh = (hdr.height + ss_v) >> ss_v
            N = len(sg)
            nb = 1
            while nb < N:
                nb <<= 1
            dys = np.full(nb, 3, dtype=np.int32)
            dxs = np.full(nb, 3, dtype=np.int32)
            dys[:N], dxs[:N] = jdy[sg], jdx[sg]
            fh, fv = filter_rows(sg, nb)
            fut = dmc.put_8tap_resident(
                devp[pl], jnp.asarray(dys), jnp.asarray(dxs),
                jnp.asarray(fh), jnp.asarray(fv),
                np.int32(vw), np.int32(vh), w=w, h=h,
                bitdepth=f.bitdepth)
            if getattr(fut, 'is_fully_addressable', True):
                fut.copy_to_host_async()
            launched.append((fut,
                             (pls[sg], jdsty[sg], jdstx[sg], h, w)))
        if not host_rel:
            continue
        g = g[np.concatenate(host_rel)]
        N = len(g)
        # pad the batch to a power of two so programs are reused across
        # frames (same rationale as the itx batches)
        nb = 1
        while nb < N:
            nb <<= 1
        win = np.zeros((nb, h + 7, w + 7), dtype=np.int32)
        # gather windows per (ref slot, plane): one clamped fancy gather
        gkey = (jrefs[g].astype(np.int64) << 4) | pls[g]
        for sg_rel in _split_groups(gkey):
            sg = g[sg_rel]
            r, pl = int(jrefs[sg[0]]), int(pls[sg[0]])
            slot = f.refp[r]
            ss_h = ss_hor if pl else 0
            ss_v = ss_ver if pl else 0
            plane = slot.planes[pl]
            vw = (slot.frame_hdr.width[1] + ss_h) >> ss_h
            vh = (slot.frame_hdr.height + ss_v) >> ss_v
            ys = np.clip(jdy[sg][:, None] + np.arange(-3, h + 4), 0, vh - 1)
            xs = np.clip(jdx[sg][:, None] + np.arange(-3, w + 4), 0, vw - 1)
            win[sg_rel] = plane[ys[:, :, None], xs[:, None, :]]
        fh, fv = filter_rows(g, nb)
        fut = dmc.put_8tap(jnp.asarray(win), jnp.asarray(fh),
                           jnp.asarray(fv), w=w, h=h, bitdepth=f.bitdepth)
        if getattr(fut, 'is_fully_addressable', True):
                fut.copy_to_host_async()
        launched.append((fut, (pls[g], jdsty[g], jdstx[g], h, w)))

    mc_st = _McDevice()
    mc_st.handled = np.zeros(n, dtype=np.uint8)
    mc_st.handled[idxs] = 1
    mc_st.block_idxs = idxs.astype(np.int64)
    mc_st.launched = launched
    return mc_st


def _split_groups(key):
    """Indices of equal-key runs after a stable sort of `key`."""
    order = np.argsort(key, kind="stable")
    cuts = np.flatnonzero(np.diff(key[order])) + 1
    return np.split(order, cuts)


def _scatter_mc_device(f, mc_st):
    from .devrt import fetch

    for fut, (pls, dys, dxs, h, w) in mc_st.launched:
        out = fetch(fut)[: len(pls)]
        arh = np.arange(h)
        arw = np.arange(w)
        for pl in range(3):
            m = pls == pl
            if not m.any():
                continue
            f.planes[pl][dys[m][:, None, None] + arh[None, :, None],
                         dxs[m][:, None, None] + arw[None, None, :]] = \
                out[m]


def _run_pass2_native(f, st) -> None:
    """Arena-driven pass 2: native phase-A inter replay + native phase-B
    ordered intra replay, Python only for the blocks C reports back
    (scaled references, intrabc, interintra, consistency stops)."""
    import ctypes

    from .native import lib as _nlib
    from .recon.itx import add_residual

    glue = f._nat
    t = TaskContext(f)
    t.pass_ = 2
    n = int(glue.c.n_blocks)
    if n == 0:
        st.collect()
        return
    rc = glue.build_replay_ctx(st.ptrs, st.elsz)
    ic = glue.build_inter_ctx()
    host_tier = not st.pending

    # batched device MC (ops/mc.py): launch before phase A so the device
    # filters while the host replays the blocks it keeps
    from .dispatch import use_device
    mc_st = None
    if use_device("mc"):
        mc_st = _launch_mc_device(f, glue, n)

    # phase A: order-free inter predictions (+ residual adds on the host
    # tier, where the batches are already computed).  Walks are ranged
    # per tile slice: parallel pass 1 leaves zeroed gap rows between
    # slices that must never be visited (serial mode is one range).
    ranges = glue.block_ranges()
    handled_ptr = mc_st.handled.ctypes.data if mc_st is not None else None
    skipped = np.empty(n, dtype=np.int64)
    ns = 0
    for s, e in ranges:
        if s < e:
            ns += int(_nlib.dtpu_inter_replay(
                ctypes.byref(rc), ctypes.byref(ic), s, e, int(host_tier),
                skipped.ctypes.data + 8 * ns, handled_ptr))
    recs = []
    if ns:
        t.device_resid = not host_tier
        for bi in skipped[:ns]:
            rec = glue.build_record(int(bi), st.resid_of_meta)
            recs.append(rec)
            _replay_one(t, rec)
        t.device_resid = False

    if not host_tier:
        # device results arrive while phase A ran; fetch + add
        st.collect()
        for s, e in ranges:
            if s < e:
                _nlib.dtpu_add_inter_residuals(
                    ctypes.byref(rc), s, e, skipped.ctypes.data, ns,
                    handled_ptr)
        for rec in recs:
            start = rec["_cap"][1]
            for k, ent in enumerate(rec["coefs"]):
                if ent[0] >= 0:
                    add_residual(f.planes[ent[3]], ent[5], ent[6],
                                 st.resid_of_meta(start + k), f.bitdepth)

    if mc_st is not None:
        # device-MC predictions stream back, scatter + residual adds
        _scatter_mc_device(f, mc_st)
        _nlib.dtpu_add_block_residuals(ctypes.byref(rc),
                                       mc_st.block_idxs.ctypes.data,
                                       len(mc_st.block_idxs))

    # phase B: ordered intra walk.  Device tier first: intra blocks run
    # the wavefront-levelled on-device schedule (recon/device_intra) —
    # edge gathers, prediction, residual add and scatter all on
    # resident canvases; inter blocks are already final from phase A
    # (level 0 in the wavefront).  Frames it does not cover (intrabc,
    # multi-txb CFL) fall through to the host C walk, which stops at
    # blocks needing Python.
    # per-tile ranges are a valid order: intra prediction never crosses
    # tile boundaries (the reference reconstructs tiles independently)
    if use_device("ipred") and "ipred" not in _INTRA_DEV_BROKEN:
        from .recon.device_intra import intra_frame_device
        try:
            if intra_frame_device(f, st):
                return
        except Exception:
            # sticky fallback (r4 verdict: an unguarded transport
            # hiccup mid-chain killed a whole decode).  The device
            # walk touches f.planes only in its final write-back, and
            # the host phase-B walk is idempotent on intra pixels
            # (prediction overwrites from already-final neighbor
            # edges), so degrading here — even after a partial plane
            # write-back — still reconstructs this frame exactly.
            _INTRA_DEV_BROKEN.add("ipred")
    for s, e in ranges:
        cursor = s
        while cursor < e:
            k = int(_nlib.dtpu_intra_replay(ctypes.byref(rc), cursor, e))
            cursor += k
            if cursor < e:
                rec = glue.build_record(cursor, st.resid_of_meta)
                _replay_one(t, rec)
                cursor += 1


def _launch_residuals(f):
    """Group every captured inverse transform per (tx size, tx type) and
    start evaluating them.  On an accelerator backend each group is
    LAUNCHED asynchronously (one XLA program per (tx, txtp), batch padded
    to a power of two so programs are reused across frames) and the
    device computes + streams results back WHILE the host replays the
    inter predictions; host groups are computed immediately.  Returns the
    launched (future, items) list for _collect_residuals."""
    groups = {}
    for rec in f.tasks:
        coefs = rec["coefs"]
        rec["resid"] = [None] * len(coefs)
        for i, ent in enumerate(coefs):
            eob, txtp, cf = ent[0], ent[1], ent[2]
            if eob < 0 or cf is None:
                continue
            groups.setdefault((ent[4], txtp), []).append((cf, rec, i))

    from .dispatch import use_device
    mesh = getattr(f, "mesh", None)
    device = use_device("itx") or mesh is not None
    use_pallas = os.environ.get("DAV1D_TPU_ITX_PALLAS") == "1"
    from .ops.itx import itx_batch, itx_batch_np
    if use_pallas:
        from .ops.pallas_itx import itx_batch_pallas, supported
    launched = []
    for (tx, txtp), items in groups.items():
        n = len(items)
        if use_pallas and supported(f.bitdepth):
            cfs = np.stack([it[0] for it in items]).astype(np.int32)
            resid = itx_batch_pallas(cfs, tx, txtp, f.bitdepth)
        elif device:
            nb = 1
            while nb < n:
                nb <<= 1
            dt = np.int16 if f.bitdepth == 8 else np.int32
            if mesh is not None:
                nb = max(nb, mesh.devices.size)
            cfs = np.zeros((nb, items[0][0].shape[0]), dtype=dt)
            for j, it in enumerate(items):
                cfs[j] = it[0]
            if mesh is not None:
                # multi-chip: the transform batch is the decoder's
                # spatial-unit axis — shard it across the mesh (SURVEY
                # §2.7 tiles->chips; each chip transforms its share)
                from jax.sharding import PartitionSpec

                from .devrt import mesh_put

                arg = mesh_put(cfs, mesh,
                               PartitionSpec(mesh.axis_names[0]))
            else:
                arg = cfs
            fut = itx_batch(arg, tx, txtp, f.bitdepth)
            if getattr(fut, 'is_fully_addressable', True):
                fut.copy_to_host_async()
            launched.append((fut, items))
            continue
        else:
            from .ops.itx import itx_batch_c_list

            resid = itx_batch_c_list([it[0] for it in items], tx, txtp,
                                     f.bitdepth)
            if resid is None:
                cfs = np.stack([it[0] for it in items]).astype(np.int32)
                resid = itx_batch_np(cfs, tx, txtp, f.bitdepth)
        for j, (_, rec, i) in enumerate(items):
            rec["resid"][i] = resid[j]
    return launched


def _collect_residuals(launched) -> None:
    for fut, items in launched:
        from .devrt import mesh_fetch
        resid = mesh_fetch(fut)[: len(items)]
        for j, (_, rec, i) in enumerate(items):
            rec["resid"][i] = resid[j]


def _native_phase_b(f, t, ordered) -> bool:
    """Ordered replay through the native driver (native/replay.c): the C
    walk predicts + adds residuals for intra blocks straight off the
    capture arenas, returning to Python only for blocks it does not
    handle (intrabc, interintra).  Returns False when unavailable (pure
    Python capture, pallas residuals, non-native build) — caller runs
    the Python replay instead."""
    import ctypes

    from .native import lib as _nlib
    glue = getattr(f, "_nat", None)
    if _nlib is None or glue is None or not ordered:
        return False

    # uniform residual element size (int16 device transfers vs int32)
    elsz = 0
    for rec in ordered:
        if rec["kind"] != "intra":
            continue
        for r in rec.get("resid") or ():
            if r is None:
                continue
            if not isinstance(r, np.ndarray) or \
                    not r.flags["C_CONTIGUOUS"] or \
                    r.dtype not in (np.int16, np.int32):
                return False
            if elsz == 0:
                elsz = r.dtype.itemsize
            elif elsz != r.dtype.itemsize:
                return False
    if elsz == 0:
        elsz = 4

    ptrs = np.zeros(int(glue.c.n_coef_meta), dtype=np.uint64)
    for rec in ordered:
        if rec["kind"] != "intra":
            continue
        start = rec["_cap"][1]
        for k, r in enumerate(rec.get("resid") or ()):
            if r is not None:
                ptrs[start + k] = r.ctypes.data

    rc = glue.build_replay_ctx(ptrs, elsz)
    n = int(glue.c.n_blocks)
    cursor = 0
    idx = 0
    while cursor < n:
        k = int(_nlib.dtpu_intra_replay(ctypes.byref(rc), cursor, n))
        cursor += k
        while idx < len(ordered) and ordered[idx]["_cap"][0] < cursor:
            idx += 1
        if cursor < n:
            # intrabc / interintra (or a consistency stop): Python replay
            rec = ordered[idx]
            assert rec["_cap"][0] == cursor
            _replay_one(t, rec)
            idx += 1
            cursor += 1
    return True


def _apply_cached_residuals(f, rec, bitdepth) -> None:
    """Clipped add of a record's cached residuals at their capture
    positions (the deferred half of recon's itx_add_cached)."""
    from .recon.itx import add_residual

    for ent, r in zip(rec["coefs"], rec["resid"]):
        if r is None:
            continue
        add_residual(f.planes[ent[3]], ent[5], ent[6], r, bitdepth)


def run_pass2(f, launched=None, device: bool = True) -> None:
    """launched: a residual-batch list already started by
    decode_frame_pass1 (frame pipelining: the device computes frame N's
    residuals while the host parses frame N+1); None launches here."""
    if isinstance(launched, _NativeResiduals):
        _run_pass2_native(f, launched)
        return
    t = TaskContext(f)
    t.pass_ = 2

    if device:
        if launched is None:
            launched = _launch_residuals(f)
        # interintra blends an intra prediction (reads current-frame
        # neighbours) -> stays in the ordered sequential phase
        inter_recs = [r for r in f.tasks if r["kind"] == "inter"
                      and not r["b"].interintra_type]
    else:
        launched = []
        inter_recs = []
    if inter_recs:
        # phase A: inter predictions (read only reference frames; order
        # among inter blocks is irrelevant).  Residual adds are deferred
        # so the host prediction replay overlaps the device's residual
        # batches (recon_b_inter returns early on t.device_resid).
        t.device_resid = True
        for rec in inter_recs:
            _replay_one(t, rec)
        t.device_resid = False
        # device results arrive while phase A ran; fetch + add
        _collect_residuals(launched)
        for rec in inter_recs:
            _apply_cached_residuals(f, rec, f.bitdepth)
        # phase B: ordered replay of intra/intrabc/interintra blocks
        # (their prediction reads reconstructed neighbours, now final)
        done = set(map(id, inter_recs))
        ordered = [rec for rec in f.tasks if id(rec) not in done]
        if not _native_phase_b(f, t, ordered):
            for rec in ordered:
                _replay_one(t, rec)
    else:
        _collect_residuals(launched)
        # with device=True an empty inter_recs means no plain inter
        # blocks exist, so the native driver (which skips them as
        # phase-A work) covers the whole ordered walk
        if not (device and _native_phase_b(f, t, f.tasks)):
            for rec in f.tasks:
                _replay_one(t, rec)
