"""MSB-first bit writer (inverse of dav1d_tpu.getbits.GetBits)."""

from __future__ import annotations


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put_bit(self, v: int) -> None:
        self.bits.append(v & 1)

    def put_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def put_sbits(self, v: int, n: int) -> None:
        self.put_bits(v & ((1 << n) - 1), n)

    def put_uleb128(self, v: int) -> None:
        self.bytealign()
        while True:
            b = v & 0x7F
            v >>= 7
            self.put_bits(b | (0x80 if v else 0), 8)
            if not v:
                break

    def put_uniform(self, v: int, max_: int) -> None:
        """ns(max_): inverse of GetBits.get_uniform."""
        l = max_.bit_length()
        m = (1 << l) - max_
        if v < m:
            self.put_bits(v, l - 1)
        else:
            x = v + m
            self.put_bits(x >> 1, l - 1)
            self.put_bit(x & 1)

    def put_vlc(self, v: int) -> None:
        if v == 0:
            self.put_bit(1)
            return
        n_bits = (v + 1).bit_length() - 1
        for _ in range(n_bits):
            self.put_bit(0)
        self.put_bit(1)
        self.put_bits(v - ((1 << n_bits) - 1), n_bits)

    def put_subexp(self, val: int, ref: int, n: int) -> None:
        """Inverse of GetBits.get_bits_subexp (header-level subexp)."""
        ref += 1 << n
        val += 1 << n
        n2 = 2 << n
        if ref * 2 <= n2:
            v = _recenter(ref, val)
        else:
            v = _recenter(n2 - ref, n2 - val)
        # emit chunks exactly inverting _subexp_u
        acc = 0
        i = 0
        while True:
            b = 3 + i - 1 if i else 3
            if n2 < acc + 3 * (1 << b):
                self.put_uniform(v - acc, n2 - acc + 1)
                break
            if v < acc + (1 << b):
                self.put_bit(0)
                self.put_bits(v - acc, b)
                break
            self.put_bit(1)
            acc += 1 << b
            i += 1

    def bytealign(self) -> None:
        while len(self.bits) & 7:
            self.bits.append(0)

    def trailing_bits(self) -> None:
        """spec 5.3.4: a one bit then zeros to byte boundary."""
        self.put_bit(1)
        self.bytealign()

    def tobytes(self) -> bytes:
        self.bytealign()
        out = bytearray(len(self.bits) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 0x80 >> (i & 7)
        return bytes(out)

    def __len__(self):
        return len(self.bits)


def _recenter(r: int, v: int) -> int:
    if v > 2 * r:
        return v
    d = v - r
    if d == 0:
        return 0
    return 2 * d if d > 0 else -2 * d - 1
