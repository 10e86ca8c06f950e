"""Pallas itx kernel vs the host batch (itself golden/oracle-verified).

Interpret mode with the suite's 8 virtual CPU devices is pathologically
slow (~70s per tiny config), so the parity check runs in a single-device
subprocess. The same kernels compile and pass bit-exact on the real TPU
(see ops/pallas_itx.py docstring).
"""

import os
import subprocess
import sys
from pathlib import Path

_SCRIPT = r"""
import numpy as np
from dav1d_tpu.ops.itx import itx_batch_np, _txinfo
from dav1d_tpu.ops.pallas_itx import itx_batch_pallas
from dav1d_tpu.recon.itx import _1D_FNS, TX1D_TYPES
rng = np.random.default_rng(5)
n = 0
for tx in (0, 1, 5, 10):
    w, h, lw, lh = _txinfo(tx)
    sw, sh = min(w, 32), min(h, 32)
    for txtp in (0, 9, 16):
        if txtp == 16:
            if tx != 0:
                continue
        else:
            rt, ct = TX1D_TYPES[txtp]
            if (lw, rt) not in _1D_FNS or (lh, ct) not in _1D_FNS:
                continue
        for bd in ((8, 10) if tx == 1 else (8,)):
            cf = rng.integers(-4000, 4000, (19, sw * sh)).astype(np.int32)
            orig = cf.copy()
            want = itx_batch_np(cf, tx, txtp, bd)
            got = itx_batch_pallas(cf, tx, txtp, bd, interpret=True)
            assert np.array_equal(cf, orig)
            assert np.array_equal(got, want), (tx, txtp, bd)
            n += 1
print(f"PALLAS_PARITY_OK {n}")
"""


def test_pallas_itx_interpret_parity():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single device: 8-dev interpret is ~50x slower
    r = subprocess.run([sys.executable, "-c", _SCRIPT],
                       cwd=Path(__file__).resolve().parent.parent,
                       env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PALLAS_PARITY_OK" in r.stdout, r.stdout
