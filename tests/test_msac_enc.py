"""MSAC encoder roundtrip: random symbol schedules encoded with avgen's
MsacEncoder must decode bit-exactly through the (reference-verified)
dav1d_tpu Msac decoder, with CDF adaptation staying in sync."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from avgen.msac_enc import MsacEncoder  # noqa: E402
from dav1d_tpu.msac import Msac  # noqa: E402


def _rand_cdf(rng, n_symbols):
    cuts = np.sort(rng.integers(1, 32768, size=n_symbols))[::-1]
    cdf = np.zeros(n_symbols + 1, dtype=np.uint16)
    cdf[:n_symbols] = cuts
    return cdf


def test_roundtrip_random_schedules():
    rng = np.random.default_rng(7)
    for trial in range(30):
        n_ops = int(rng.integers(1, 300))
        schedule = []
        enc = MsacEncoder()
        enc_cdfs = {}
        init_cdfs = {}
        for _ in range(n_ops):
            op = int(rng.integers(0, 7))
            if op == 0:
                bit = int(rng.integers(0, 2))
                enc.encode_bool_equi(bit)
                schedule.append(("equi", bit))
            elif op == 1:
                f = int(rng.integers(4 << 6, 32768))
                bit = int(rng.integers(0, 2))
                enc.encode_bool(bit, f)
                schedule.append(("bool", f, bit))
            elif op == 2:
                n_symbols = int(rng.integers(1, 16))
                key = ("sym", n_symbols, int(rng.integers(0, 4)))
                if key not in enc_cdfs:
                    enc_cdfs[key] = _rand_cdf(rng, n_symbols)
                    init_cdfs[key] = enc_cdfs[key].copy()
                s = int(rng.integers(0, n_symbols + 1))
                enc.encode_symbol(s, enc_cdfs[key], n_symbols)
                schedule.append(("sym", key, n_symbols, s))
            elif op == 3:
                key = ("badapt", int(rng.integers(0, 4)))
                if key not in enc_cdfs:
                    enc_cdfs[key] = _rand_cdf(rng, 1)
                    init_cdfs[key] = enc_cdfs[key].copy()
                bit = int(rng.integers(0, 2))
                enc.encode_bool_adapt(bit, enc_cdfs[key])
                schedule.append(("badapt", key, bit))
            elif op == 4:
                key = ("hitok", int(rng.integers(0, 4)))
                if key not in enc_cdfs:
                    enc_cdfs[key] = _rand_cdf(rng, 3)
                    init_cdfs[key] = enc_cdfs[key].copy()
                tok = int(rng.integers(3, 16))
                enc.encode_hi_tok(tok, enc_cdfs[key])
                schedule.append(("hitok", key, tok))
            elif op == 5:
                k = int(rng.integers(0, 5))
                n = 8 << k
                ref = int(rng.integers(0, n))
                val = int(rng.integers(0, n))
                enc.encode_subexp(val, ref, n, k)
                schedule.append(("subexp", ref, n, k, val))
            else:
                n = int(rng.integers(2, 33))
                v = int(rng.integers(0, n))
                enc.encode_uniform(v, n)
                schedule.append(("unif", n, v))

        data = enc.done()
        dec = Msac(data)
        dec_cdfs = {}
        for i, item in enumerate(schedule):
            kind = item[0]
            if kind == "equi":
                got = dec.decode_bool_equi()
                want = item[1]
            elif kind == "bool":
                got = dec.decode_bool(item[1])
                want = item[2]
            elif kind == "sym":
                _, key, n_symbols, want = item
                if key not in dec_cdfs:
                    dec_cdfs[key] = init_cdfs[key].copy()
                got = dec.decode_symbol_adapt(dec_cdfs[key], n_symbols)
            elif kind == "badapt":
                _, key, want = item
                if key not in dec_cdfs:
                    dec_cdfs[key] = init_cdfs[key].copy()
                got = dec.decode_bool_adapt(dec_cdfs[key])
            elif kind == "hitok":
                _, key, want = item
                if key not in dec_cdfs:
                    dec_cdfs[key] = init_cdfs[key].copy()
                got = dec.decode_hi_tok(dec_cdfs[key])
            elif kind == "subexp":
                _, ref, n, k, want = item
                got = dec.decode_subexp(ref, n, k)
            else:
                _, n, want = item
                got = dec.decode_uniform(n)
            assert got == want, f"trial {trial} op {i} {item}: {got} != {want}"


def test_roundtrip_cdf_sync():
    """Adaptive CDFs must evolve identically in encoder and decoder."""
    rng = np.random.default_rng(99)
    for trial in range(5):
        n_symbols = int(rng.integers(2, 9))
        cdf_enc = _rand_cdf(rng, n_symbols)
        cdf_dec = cdf_enc.copy()
        symbols = rng.integers(0, n_symbols + 1, size=500)
        enc = MsacEncoder()
        for s in symbols:
            enc.encode_symbol(int(s), cdf_enc, n_symbols)
        data = enc.done()
        dec = Msac(data)
        for i, s in enumerate(symbols):
            got = dec.decode_symbol_adapt(cdf_dec, n_symbols)
            assert got == int(s), f"trial {trial} sym {i}"
        np.testing.assert_array_equal(cdf_enc, cdf_dec)
