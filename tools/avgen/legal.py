"""Legal-choice helpers for the stream generator."""

from __future__ import annotations

import numpy as np

from dav1d_tpu import tables
from dav1d_tpu.levels import TxClass, TxfmSize, TxfmType, RTX_4X8


def legal_txtps(t_dim, intra: int, qidx: int, reduced: int = 0):
    """Luma txtp candidates for this tx size (mirror of decode_coefs'
    signaling branches)."""
    tmin, tmax = int(t_dim[4]), int(t_dim[5])
    if tmax + intra >= TxfmSize.TX_64X64:
        return [TxfmType.DCT_DCT]
    if not qidx:
        return [TxfmType.DCT_DCT]
    if intra:
        if reduced or tmin == TxfmSize.TX_16X16:
            return [TxfmType(int(v)) for v in tables.tx_types_per_set[0:5]]
        return [TxfmType(int(v)) for v in tables.tx_types_per_set[5:12]]
    if reduced or tmax == TxfmSize.TX_32X32:
        return [TxfmType.IDTX, TxfmType.DCT_DCT]
    if tmin == TxfmSize.TX_16X16:
        return [TxfmType(int(v)) for v in tables.tx_types_per_set[12:24]]
    return [TxfmType(int(v)) for v in tables.tx_types_per_set[24:40]]


def scan_positions(tx, txtp):
    """Ordered rc values by scan index for this (tx, txtp)."""
    t_dim = tables.txfm_info()[tx]
    slw, slh = min(int(t_dim[2]), 3), min(int(t_dim[3]), 3)
    tx_class = TxClass(int(tables.tx_type_class[txtp]))
    shift = (slh + 2) if tx_class != TxClass.V else (slw + 2)
    mask = ((4 << slh) - 1) if tx_class != TxClass.V else ((4 << slw) - 1)
    n = (4 << slw) * (4 << slh)
    if tx_class == TxClass.TWO_D:
        return [int(v) for v in tables.scans()[tx]]
    if tx_class == TxClass.H:
        return list(range(n))
    shift2 = slh + 2
    return [(((i & mask) << shift2) | (i >> shift)) for i in range(n)]


def random_coef_choice(rng, coef_p=0.7, **kw):
    """Random legal (txtp, levels, signs) for one TX block."""
    t_dim = kw["t_dim"]
    plane = kw["plane"]
    tx = kw["tx"]
    if plane:
        txtp = kw["fixed_txtp"]
    else:
        cands = legal_txtps(t_dim, kw["intra"], 255)
        txtp = cands[int(rng.integers(0, len(cands)))]
    if rng.random() > coef_p:
        return txtp, {}, {}
    rcs = scan_positions(tx, txtp)
    n = len(rcs)
    eob = int(rng.integers(0, n))
    levels = {}
    signs = {}
    for i in range(eob + 1):
        if i == eob or rng.random() < 0.5:
            v = int(rng.choice([1, 1, 2, 3, 4, 7, 14, 15, 16, 40, 600],
                               p=[.3, .2, .1, .1, .1, .05, .05, .04, .03,
                                  .02, .01]))
            levels[rcs[i]] = v
            signs[rcs[i]] = int(rng.integers(0, 2))
    if not levels:
        levels[rcs[eob]] = 1
        signs[rcs[eob]] = int(rng.integers(0, 2))
    return txtp, levels, signs
