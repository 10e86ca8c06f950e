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


@functools.lru_cache(maxsize=None)
def _concat_jit(shapes):
    """Device-side flatten+concat of the per-group residual outputs, so
    one transfer fetches the whole frame's residuals."""
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda *xs: jnp.concatenate([x.reshape(-1) for x in xs]))


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


def _compute_residuals(f) -> None:
    """Evaluate every captured inverse transform batched per
    (tx size, tx type); stash results in rec["resid"] aligned with
    rec["coefs"] for the replay to add (recon.itx.itx_add_cached).

    On an accelerator backend every group is LAUNCHED asynchronously
    (one XLA program per (tx, txtp), batch padded to a power of two so
    programs are reused across frames), the per-group outputs are
    flattened and concatenated ON DEVICE, and ONE transfer fetches the
    whole frame's residuals — the tunnel round-trip latency is paid once
    per frame instead of once per group (measured 9x on the real chip)."""
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
    device = use_device("itx") and f.bitdepth != 12
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
            cfs = np.zeros((nb, items[0][0].shape[0]), dtype=np.int32)
            for j, it in enumerate(items):
                cfs[j] = it[0]
            launched.append((itx_batch(cfs, tx, txtp, f.bitdepth), items))
            continue
        else:
            cfs = np.stack([it[0] for it in items]).astype(np.int32)
            resid = itx_batch_np(cfs, tx, txtp, f.bitdepth)
        for j, (_, rec, i) in enumerate(items):
            rec["resid"][i] = resid[j]
    if launched:
        outs = [fut for fut, _ in launched]
        flat = np.asarray(_concat_jit(tuple(o.shape for o in outs))(*outs))
        pos = 0
        for fut, items in launched:
            b, h, w = fut.shape
            resid = flat[pos : pos + b * h * w].reshape(b, h, w)[: len(items)]
            pos += b * h * w
            for j, (_, rec, i) in enumerate(items):
                rec["resid"][i] = resid[j]


def run_pass2(f, device: bool = True) -> None:
    t = TaskContext(f)
    t.pass_ = 2

    if device:
        _compute_residuals(f)
        # interintra blends an intra prediction (reads current-frame
        # neighbours) -> stays in the ordered sequential phase
        inter_recs = [r for r in f.tasks if r["kind"] == "inter"
                      and not r["b"].interintra_type]
    else:
        inter_recs = []
    if inter_recs:
        # phase A: inter blocks (read only reference frames; order among
        # inter blocks is irrelevant) — prediction + cached residual add
        for rec in inter_recs:
            _replay_one(t, rec)
        # phase B: ordered replay of intra/intrabc/interintra blocks
        # (their prediction reads reconstructed neighbours, now final)
        done = set(map(id, inter_recs))
        for rec in f.tasks:
            if id(rec) not in done:
                _replay_one(t, rec)
    else:
        for rec in f.tasks:
            _replay_one(t, rec)
