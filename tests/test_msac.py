"""MSAC bit-exactness: Python decoder vs the reference's C implementation
(loaded from the oracle build via ctypes), on random byte streams with a
random mixed operation schedule including CDF adaptation and end-of-buffer
overreads (mirrors tests/checkasm/msac.c's approach)."""

import ctypes

import numpy as np
import pytest

from dav1d_tpu.msac import Msac


class RefMsacCtx(ctypes.Structure):
    _fields_ = [
        ("buf_pos", ctypes.c_void_p),
        ("buf_end", ctypes.c_void_p),
        ("dif", ctypes.c_size_t),
        ("rng", ctypes.c_uint),
        ("cnt", ctypes.c_int),
        ("allow_update_cdf", ctypes.c_int),
    ]


@pytest.fixture(scope="module")
def ref(oracle):
    lib = ctypes.CDLL(str(oracle.parent / "libdav1d.so"))
    lib.dav1d_msac_init.argtypes = [
        ctypes.POINTER(RefMsacCtx), ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_int,
    ]
    u16p = np.ctypeslib.ndpointer(dtype=np.uint16)
    for name, args in [
        ("dav1d_msac_decode_symbol_adapt_c",
         [ctypes.POINTER(RefMsacCtx), u16p, ctypes.c_size_t]),
        ("dav1d_msac_decode_bool_adapt_c", [ctypes.POINTER(RefMsacCtx), u16p]),
        ("dav1d_msac_decode_bool_equi_c", [ctypes.POINTER(RefMsacCtx)]),
        ("dav1d_msac_decode_bool_c",
         [ctypes.POINTER(RefMsacCtx), ctypes.c_uint]),
        ("dav1d_msac_decode_hi_tok_c", [ctypes.POINTER(RefMsacCtx), u16p]),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = args
        fn.restype = ctypes.c_uint
    lib.dav1d_msac_decode_subexp.argtypes = [
        ctypes.POINTER(RefMsacCtx), ctypes.c_int, ctypes.c_int, ctypes.c_uint
    ]
    lib.dav1d_msac_decode_subexp.restype = ctypes.c_int
    return lib


def _rand_cdf(rng, n_symbols):
    """Random valid Q15 inverse CDF: strictly decreasing, then count."""
    cuts = np.sort(rng.integers(1, 32768, size=n_symbols))[::-1]
    cdf = np.zeros(n_symbols + 1, dtype=np.uint16)
    cdf[:n_symbols] = cuts
    cdf[n_symbols] = rng.integers(0, 33)
    return cdf


@pytest.mark.parametrize("allow_update", [True, False])
def test_msac_random_schedule(ref, allow_update):
    rng = np.random.default_rng(1234)
    for trial in range(20):
        size = int(rng.integers(1, 40))
        data = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))

        c = RefMsacCtx()
        buf = ctypes.create_string_buffer(data, size)
        ref.dav1d_msac_init(ctypes.byref(c), ctypes.cast(buf, ctypes.c_char_p),
                            size, 0 if allow_update else 1)
        mine = Msac(data, disable_cdf_update=not allow_update)

        for step in range(200):
            op = int(rng.integers(0, 6))
            if op == 0:
                want = ref.dav1d_msac_decode_bool_equi_c(ctypes.byref(c))
                got = mine.decode_bool_equi()
            elif op == 1:
                f = int(rng.integers(0, 32768))
                want = ref.dav1d_msac_decode_bool_c(ctypes.byref(c), f)
                got = mine.decode_bool(f)
            elif op == 2:
                n_symbols = int(rng.integers(1, 16))
                cdf_ref = _rand_cdf(rng, n_symbols)
                cdf_my = cdf_ref.copy()
                want = ref.dav1d_msac_decode_symbol_adapt_c(
                    ctypes.byref(c), cdf_ref, n_symbols)
                got = mine.decode_symbol_adapt(cdf_my, n_symbols)
                np.testing.assert_array_equal(
                    cdf_ref, cdf_my, err_msg=f"cdf adapt t{trial} s{step}")
            elif op == 3:
                cdf_ref = _rand_cdf(rng, 1)
                cdf_my = cdf_ref.copy()
                want = ref.dav1d_msac_decode_bool_adapt_c(
                    ctypes.byref(c), cdf_ref)
                got = mine.decode_bool_adapt(cdf_my)
                np.testing.assert_array_equal(cdf_ref, cdf_my)
            elif op == 4:
                cdf_ref = _rand_cdf(rng, 3)
                cdf_my = cdf_ref.copy()
                want = ref.dav1d_msac_decode_hi_tok_c(ctypes.byref(c), cdf_ref)
                got = mine.decode_hi_tok(cdf_my)
                np.testing.assert_array_equal(cdf_ref, cdf_my)
            else:
                k = int(rng.integers(0, 5))
                n = 8 << k
                r = int(rng.integers(0, n))
                want = ref.dav1d_msac_decode_subexp(ctypes.byref(c), r, n, k)
                got = mine.decode_subexp(r, n, k)
            assert got == want, f"trial {trial} step {step} op {op}"
            assert c.rng == mine.rng, f"rng diverged t{trial} s{step}"
            assert c.dif == mine.dif, f"dif diverged t{trial} s{step}"
            assert c.cnt == mine.cnt, f"cnt diverged t{trial} s{step}"


def test_cdf_defaults_load():
    from dav1d_tpu.cdf import CdfContext

    c = CdfContext.from_defaults(100)
    assert c.m.partition.shape == (5, 4, 16)
    assert c.coef.base_tok.shape == (5, 2, 41, 4)
    # counts start at 0
    assert c.m.partition[0, 0, 9] == 0
    assert int(c.mv_joint[3]) == 0
    c2 = c.copy()
    c2.m.partition[0, 0, 0] = 123
    assert c.m.partition[0, 0, 0] != 123 or c.m.partition[0, 0, 0] == 123


def test_cdf_update_resets_counts():
    from dav1d_tpu.cdf import CdfContext

    src = CdfContext.from_defaults(0)
    # simulate adaptation: bump counters and tweak a probability
    src.m.partition[1, 2, 9] = 17
    src.m.partition[1, 2, 0] = 9999
    src.coef.skip[2, 5, 1] = 31
    src.coef.skip[2, 5, 0] = 4242
    src.m.y_mode[1, 12] = 21
    dst = CdfContext.from_defaults(0)
    dst.update(src, frame_is_intra=True)
    assert dst.m.partition[1, 2, 0] == 9999
    assert dst.m.partition[1, 2, 9] == 0
    assert dst.coef.skip[2, 5, 0] == 4242
    assert dst.coef.skip[2, 5, 1] == 0
    # inter fields not propagated on intra frames
    assert dst.m.y_mode[1, 12] == 0  # default count stays 0
    dst2 = CdfContext.from_defaults(0)
    src.m.y_mode[1, 0] = 777
    dst2.update(src, frame_is_intra=False)
    assert dst2.m.y_mode[1, 0] == 777
    assert dst2.m.y_mode[1, 12] == 0
