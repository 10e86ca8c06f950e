"""Native (C) entropy core vs pure-Python reference: bit-identical MSAC
state, CDF adaptation, and decoded symbols on random streams."""

import numpy as np
import pytest

from dav1d_tpu.msac import Msac, MsacNative


@pytest.mark.skipif(MsacNative is None, reason="native build unavailable")
def test_msac_native_parity():
    rng = np.random.default_rng(42)
    data = bytes(rng.integers(0, 256, 8000, dtype=np.uint8))
    a = Msac(data)
    b = MsacNative(data)
    cdf4 = np.array([24000, 16000, 8000, 0, 0], dtype=np.uint16)
    cdf4b = cdf4.copy()
    cdf8 = np.array([28000, 24000, 20000, 16000, 12000, 8000, 4000, 0, 0],
                    dtype=np.uint16)
    cdf8b = cdf8.copy()
    for i in range(6000):
        k = i % 8
        if k == 0:
            ra, rb = a.decode_bool_equi(), b.decode_bool_equi()
        elif k == 1:
            ra, rb = a.decode_bool(17000), b.decode_bool(17000)
        elif k == 2:
            ra = a.decode_symbol_adapt(cdf4, 4)
            rb = b.decode_symbol_adapt(cdf4b, 4)
            assert (cdf4 == cdf4b).all()
        elif k == 3:
            ra = a.decode_symbol_adapt(cdf8, 8)
            rb = b.decode_symbol_adapt(cdf8b, 8)
            assert (cdf8 == cdf8b).all()
        elif k == 4:
            ra, rb = a.decode_bools(7), b.decode_bools(7)
        elif k == 5:
            ra, rb = a.decode_uniform(13), b.decode_uniform(13)
        elif k == 6:
            ra, rb = a.decode_subexp(5, 32, 2), b.decode_subexp(5, 32, 2)
        else:
            ha = np.array([20000, 12000, 6000, 0], np.uint16)
            hb = ha.copy()
            ra, rb = a.decode_hi_tok(ha), b.decode_hi_tok(hb)
            assert (ha == hb).all()
        assert ra == rb, (i, k)
        assert (a.rng, a.dif, a.cnt) == (b.rng, b.dif, b.cnt), (i, k)


@pytest.mark.skipif(MsacNative is None, reason="native build unavailable")
def test_coef_tail_native_parity(oracle, tmp_path):
    """Decode a real stream with the native tail cross-checked per call
    against the Python tail on cloned state."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "tools"))
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets
    import dav1d_tpu.recon.coef as C
    from dav1d_tpu.decoder import Decoder
    from dav1d_tpu.containers import read_ivf

    enc = AomEncoder(width=128, height=96, usage="good", cpu_used=3, q=30,
                     kf_max_dist=9999, lag=0)
    pkts = enc.encode(gradient_frames(4, 128, 96))
    enc.close()
    ivf = tmp_path / "parity.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)

    orig = C._decode_coefs_tail_native
    checked_calls = [0]

    def checked(ts, msac, f, a, a_off, l, l_off, tx, plane, chroma, tctx,
                tx2dszctx, tx_class, slw, slh, txtp, dq_tbl, qm_tbl):
        st = (msac.s.pos, msac.s.dif, msac.s.rng, msac.s.cnt)
        snap = {k: v.copy() for k, v in ts.cdf.coef.__dict__.items()}
        eob, cf, res = orig(ts, msac, f, a, a_off, l, l_off, tx, plane,
                            chroma, tctx, tx2dszctx, tx_class, slw, slh,
                            txtp, dq_tbl, qm_tbl)
        pm = Msac(msac._data, 0, msac.s.end, not msac.s.allow_update_cdf)
        pm.pos, pm.dif, pm.rng, pm.cnt = st

        class G:
            pass

        g = G()
        g.__dict__.update(snap)
        eob2, cf2, res2 = C._decode_coefs_tail_py(
            pm, g, a, a_off, l, l_off, tx, plane, chroma, tctx, tx2dszctx,
            tx_class, slw, slh, txtp, dq_tbl, qm_tbl, f.bitdepth)
        assert eob == eob2 and res == res2
        assert (pm.pos, pm.dif, pm.rng, pm.cnt) == \
            (msac.s.pos, msac.s.dif, msac.s.rng, msac.s.cnt)
        if cf is not None:
            assert (np.asarray(cf, np.int64)
                    == np.asarray(cf2, np.int64)).all()
        for k in snap:
            assert (getattr(ts.cdf.coef, k) == getattr(g, k)).all(), k
        checked_calls[0] += 1
        return eob, cf, res

    C._decode_coefs_tail_native = checked
    full = C._FULL_NATIVE
    C._FULL_NATIVE = False  # exercise the staged front-end + native tail
    try:
        dec = Decoder()
        for tu, _ in read_ivf(ivf.read_bytes()):
            dec.send_data(tu)
            while dec.get_picture() is not None:
                pass
    finally:
        C._decode_coefs_tail_native = orig
        C._FULL_NATIVE = full
    assert checked_calls[0] > 100


@pytest.mark.skipif(MsacNative is None, reason="native build unavailable")
def test_coef_full_native_parity(oracle, tmp_path):
    """Decode a real stream with the one-call native decode_coefs
    cross-checked per call against the staged Python path: run Python
    first, snapshot-restore the MSAC + CDF state, run native, compare
    outputs AND final entropy state."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "tools"))
    from aom_enc import AomEncoder, gradient_frames, write_ivf_packets
    import dav1d_tpu.recon.coef as C
    from dav1d_tpu.decoder import Decoder
    from dav1d_tpu.containers import read_ivf

    enc = AomEncoder(width=128, height=96, usage="good", cpu_used=3, q=30,
                     kf_max_dist=9999, lag=0)
    pkts = enc.encode(gradient_frames(4, 128, 96))
    enc.close()
    ivf = tmp_path / "parity_full.ivf"
    write_ivf_packets(ivf, pkts, 128, 96)

    orig = C.decode_coefs_native
    checked_calls = [0]
    TXTP_M = ("txtp_intra1", "txtp_intra2", "txtp_inter1", "txtp_inter2",
              "txtp_inter3")

    def checked(t, a, a_off, l, l_off, tx, bs, b, intra, plane, ytxtp=None):
        ts = t.ts
        msac = ts.msac
        st = (msac.s.pos, msac.s.dif, msac.s.rng, msac.s.cnt)
        snap = {k: v.copy() for k, v in ts.cdf.coef.__dict__.items()}
        snap_m = {k: getattr(ts.cdf.m, k).copy() for k in TXTP_M}

        C._FULL_NATIVE = False
        try:
            want = C.decode_coefs(t, a, a_off, l, l_off, tx, bs, b,
                                  intra, plane, ytxtp)
        finally:
            C._FULL_NATIVE = True
        py_st = (msac.s.pos, msac.s.dif, msac.s.rng, msac.s.cnt)
        py_cdf = {k: v.copy() for k, v in ts.cdf.coef.__dict__.items()}
        py_m = {k: getattr(ts.cdf.m, k).copy() for k in TXTP_M}

        # rewind and replay natively
        msac.s.pos, msac.s.dif, msac.s.rng, msac.s.cnt = st
        for k, v in snap.items():
            getattr(ts.cdf.coef, k)[...] = v
        for k, v in snap_m.items():
            getattr(ts.cdf.m, k)[...] = v
        got = orig(t, a, a_off, l, l_off, tx, bs, b, intra, plane, ytxtp)

        assert got[0] == want[0] and got[1] == want[1] \
            and got[3] == want[3], (tx, bs, intra, plane)
        if want[2] is not None:
            assert (np.asarray(got[2], np.int64)
                    == np.asarray(want[2], np.int64)).all()
        else:
            assert got[2] is None
        assert (msac.s.pos, msac.s.dif, msac.s.rng, msac.s.cnt) == py_st
        for k, v in py_cdf.items():
            assert (getattr(ts.cdf.coef, k) == v).all(), k
        for k, v in py_m.items():
            assert (getattr(ts.cdf.m, k) == v).all(), k
        checked_calls[0] += 1
        return got

    C.decode_coefs_native = checked
    try:
        dec = Decoder()
        for tu, _ in read_ivf(ivf.read_bytes()):
            dec.send_data(tu)
            while dec.get_picture() is not None:
                pass
    finally:
        C.decode_coefs_native = orig
    assert checked_calls[0] > 100
