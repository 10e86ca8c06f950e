"""Two-pass reconstruction pipeline (pass 2).

Pass 1 (decode.frame with two_pass=True) runs the serial entropy decode and
captures per-block tasks: mode info, dequantized coefficients, and
parse-time context snapshots (OBMC neighbours, sub8x8 filters, warp
params). Pass 2 executes the pixel work:

  1. device stage: batched inverse transforms for inter-block residuals
     (grouped by tx size/type) run as one XLA program per group — the TPU
     pass of the reference's pass-1/pass-2 frame-threading split
     (src/internal.h:276-293)
  2. sequential replay: inter predictions (MC/OBMC/warp/compound), then
     coefficients are applied; intra blocks replay in decode order (their
     prediction reads reconstructed neighbours)

Inter predictions never read current-frame pixels (except intrabc, which
replays sequentially), so batching inter residuals ahead of the ordered
replay is exact.
"""

from __future__ import annotations

import numpy as np

from .decode.tile import TaskContext


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


def _device_residuals(f, recs) -> None:
    """Batched inverse transforms for the captured residuals of `recs`:
    grouped by (tx size, tx type), one XLA program per group, then
    added+clipped into the frame planes."""
    from .ops.itx import itx_batch
    groups = {}
    for rec in recs:
        for ent in rec["coefs"]:
            eob, txtp, cf = ent[0], ent[1], ent[2]
            if eob < 0 or cf is None:
                continue
            pl, tx, dst_y, dst_x = ent[3], ent[4], ent[5], ent[6]
            groups.setdefault((tx, txtp), []).append(
                (cf, pl, dst_y, dst_x))
    maxp = (1 << f.bitdepth) - 1
    for (tx, txtp), items in groups.items():
        # pad the batch to a power-of-two bucket so XLA programs are
        # reused across frames instead of recompiling per batch size
        n = len(items)
        nb = 1
        while nb < n:
            nb <<= 1
        cfs = np.zeros((nb, items[0][0].shape[0]),
                       dtype=np.int32)
        for i, it in enumerate(items):
            cfs[i] = it[0]
        resid = np.asarray(itx_batch(cfs, tx, txtp, f.bitdepth),
                           dtype=np.int64)[:n]
        h, w = resid.shape[1], resid.shape[2]
        for i, (_, pl, dst_y, dst_x) in enumerate(items):
            dst = f.planes[pl][dst_y : dst_y + h, dst_x : dst_x + w]
            np.clip(dst + resid[i], 0, maxp, out=dst)


def run_pass2(f, device: bool = True) -> None:
    t = TaskContext(f)
    t.pass_ = 2

    # interintra blends an intra prediction (reads current-frame
    # neighbours) -> stays in the ordered sequential phase
    inter_recs = [r for r in f.tasks if r["kind"] == "inter"
                  and not r["b"].interintra_type] if device else []
    if inter_recs:
        # phase A: inter predictions (read only reference frames; order
        # among inter blocks is irrelevant)
        t.device_resid = True
        for rec in inter_recs:
            _replay_one(t, rec)
        # phase B: batched residual transforms on device
        _device_residuals(f, inter_recs)
        t.device_resid = False
        # phase C: ordered replay of intra/intrabc/interintra blocks
        # (their prediction reads reconstructed neighbours, now final)
        done = set(map(id, inter_recs))
        for rec in f.tasks:
            if id(rec) not in done:
                _replay_one(t, rec)
    else:
        for rec in f.tasks:
            _replay_one(t, rec)
