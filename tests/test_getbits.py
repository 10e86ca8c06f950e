"""Bit-reader unit tests (semantics of reference src/getbits.c)."""

import numpy as np

from dav1d_tpu.getbits import GetBits


def test_get_bits_basic():
    gb = GetBits(bytes([0b10110001, 0xFF, 0x00]))
    assert gb.get_bit() == 1
    assert gb.get_bit() == 0
    assert gb.get_bits(3) == 0b110
    assert gb.get_bits(5) == 0b00111
    assert gb.get_bits(7) == 0b1111110
    assert not gb.error


def test_get_bits_error_on_overrun():
    gb = GetBits(b"\xab")
    assert gb.get_bits(8) == 0xAB
    gb.get_bits(4)
    assert gb.error == 1


def test_sbits_twos_complement():
    # su(4): 0b1111 -> -1, 0b1000 -> -8, 0b0111 -> 7
    gb = GetBits(bytes([0b11111000, 0b01110000]))
    assert gb.get_sbits(4) == -1
    assert gb.get_sbits(4) == -8
    assert gb.get_sbits(4) == 7


def test_uleb128():
    # 0x80 0x01 => 128
    gb = GetBits(bytes([0x80, 0x01]))
    assert gb.get_uleb128() == 128
    gb = GetBits(bytes([0x7F]))
    assert gb.get_uleb128() == 0x7F


def test_uniform_ns():
    # ns(max): for max=3, l=2, m=1: first bit 0 => 0; 10 => 1; 11 => 2
    for bits, want in [(0b00, 0), (0b10, 1), (0b11, 2)]:
        gb = GetBits(bytes([bits << 6]))
        assert gb.get_uniform(3) == want


def test_vlc():
    gb = GetBits(bytes([0b10000000]))
    assert gb.get_vlc() == 0
    gb = GetBits(bytes([0b01100000]))  # 0 1 then 1 bit = 1 -> (2-1)+1 = 2
    assert gb.get_vlc() == 2


def test_subexp_roundtrip_range():
    # get_bits_subexp must stay within [-(1<<n), (1<<n)] band and be
    # deterministic; fuzz the reader against random bytes for crashes.
    rng = np.random.default_rng(0)
    for _ in range(200):
        data = bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
        gb = GetBits(data)
        v = gb.get_bits_subexp(ref=rng.integers(-8, 8), n=3)
        assert -8 <= v <= 8


def test_bytealign():
    gb = GetBits(bytes([0xFF, 0x01]))
    gb.get_bits(3)
    gb.bytealign()
    assert gb.get_bits(8) == 1
