"""MSAC range *encoder* — inverse of dav1d_tpu.msac.Msac.

Daala/AV1 entropy encoder (od_ec_enc) with the exact interval-split formula
the decoder uses (Q15 inverse CDFs, EC_PROB_SHIFT=6, EC_MIN_PROB=4), plus
the same CDF adaptation so encoder and decoder probabilities stay in sync.
Correctness bar: roundtrip bit-exactness through the (reference-verified)
decoder for arbitrary symbol schedules.
"""

from __future__ import annotations

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4


class MsacEncoder:
    def __init__(self):
        self.low = 0
        self.rng = 0x8000
        self.cnt = -9
        self.precarry: list[int] = []  # 16-bit pre-carry values

    # -- core ---------------------------------------------------------------

    def _normalize(self, low: int, rng: int) -> None:
        d = 16 - rng.bit_length()
        c = self.cnt
        s = c + d
        if s >= 0:
            c += 16
            m = (1 << c) - 1
            if s >= 8:
                self.precarry.append((low >> c) & 0xFFFF)
                low &= m
                c -= 8
                m >>= 8
            self.precarry.append((low >> c) & 0xFFFF)
            s = c + d - 24
            low &= m
        self.low = (low << d) & 0xFFFFFFFF
        self.rng = rng << d
        self.cnt = s

    def _v(self, r: int, f: int, nsym_minus_i: int) -> int:
        return ((r >> 8) * (f >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB * nsym_minus_i

    def encode_symbol(self, s: int, cdf, n_symbols: int,
                      allow_update: bool = True) -> None:
        """Encode symbol s (0..n_symbols) against inverse-CDF `cdf`
        (count at cdf[n_symbols]); adapts cdf exactly like the decoder."""
        r = self.rng
        low = self.low
        # decoder interval for symbol s is [v_s, v_{s-1}) with v_{-1} = rng
        # and v_{n_symbols} = 0 (the count slot is < 64 so its term vanishes)
        u = r if s == 0 else self._v(r, int(cdf[s - 1]), n_symbols - (s - 1))
        v = 0 if s == n_symbols else self._v(r, int(cdf[s]), n_symbols - s)
        low += r - u
        rng = u - v
        self._normalize(low, rng)

        if allow_update:
            count = int(cdf[n_symbols])
            rate = 4 + (count >> 4) + (1 if n_symbols > 2 else 0)
            for i in range(s):
                cdf[i] = int(cdf[i]) + ((32768 - int(cdf[i])) >> rate)
            for i in range(s, n_symbols):
                cdf[i] = int(cdf[i]) - (int(cdf[i]) >> rate)
            cdf[n_symbols] = count + (1 if count < 32 else 0)

    def encode_bool(self, bit: int, f: int) -> None:
        """f = Q15 probability entry (decoder's decode_bool argument)."""
        r = self.rng
        low = self.low
        v = self._v(r, f, 1)
        if bit:  # bit 1 <=> symbol val 1, interval [0, v)
            low += r - v
            rng = v
        else:  # interval [v, rng)
            rng = r - v
        self._normalize(low, rng)

    def encode_bool_adapt(self, bit: int, cdf, allow_update: bool = True) -> None:
        self.encode_bool(bit, int(cdf[0]))
        if allow_update:
            count = int(cdf[1])
            rate = 4 + (count >> 4)
            if bit:
                cdf[0] = int(cdf[0]) + ((32768 - int(cdf[0])) >> rate)
            else:
                cdf[0] = int(cdf[0]) - (int(cdf[0]) >> rate)
            cdf[1] = count + (1 if count < 32 else 0)

    def encode_bool_equi(self, bit: int) -> None:
        self.encode_bool(bit, 1 << 14)

    def encode_bools(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.encode_bool_equi((v >> i) & 1)

    def encode_hi_tok(self, tok: int, cdf, allow_update: bool = True) -> None:
        """Inverse of decode_hi_tok: tok in [3, 15]."""
        t = tok - 3
        for _ in range(4):
            s = min(t, 3)
            self.encode_symbol(s, cdf, 3, allow_update)
            if s < 3:
                break
            t -= 3
            if tok == 15 and t == 0:
                break

    def encode_uniform(self, v: int, n: int) -> None:
        l = n.bit_length()
        m = (1 << l) - n
        if v < m:
            self.encode_bools(v, l - 1)
        else:
            x = v + m
            self.encode_bools(x >> 1, l - 1)
            self.encode_bool_equi(x & 1)

    def encode_subexp(self, val: int, ref: int, n: int, k: int) -> None:
        if ref * 2 <= n:
            v = _recenter(ref, val)
        else:
            v = _recenter(n - 1 - ref, n - 1 - val)
        # split v into (chunk flags, remainder) exactly inverting the decoder
        if v < (1 << k):
            self.encode_bool_equi(0)
            self.encode_bools(v, k)
            return
        self.encode_bool_equi(1)
        if v < (2 << k):
            self.encode_bool_equi(0)
            self.encode_bools(v - (1 << k), k)
            return
        self.encode_bool_equi(1)
        if v < (4 << k):
            self.encode_bool_equi(0)
            self.encode_bools(v - (2 << k), k + 1)
        else:
            self.encode_bool_equi(1)
            self.encode_bools(v - (4 << k), k + 2)

    # -- finalize -------------------------------------------------------------

    def done(self) -> bytes:
        low = self.low
        c = self.cnt
        m = 0x3FFF
        e = ((low + m) & ~m) | (m + 1)
        s = c + 10
        pre = list(self.precarry)
        if s > 0:
            n = (1 << (c + 16)) - 1
            while True:
                pre.append((e >> (c + 16)) & 0xFFFF)
                e &= n
                s -= 8
                c -= 8
                n >>= 8
                if s <= 0:
                    break
        # carry propagation (precarry entries may exceed 0xFF)
        out = bytearray(len(pre))
        carry = 0
        for i in range(len(pre) - 1, -1, -1):
            v = pre[i] + carry
            out[i] = v & 0xFF
            carry = v >> 8
        assert carry == 0, "carry out of the first byte"
        return bytes(out)


def _recenter(r: int, v: int) -> int:
    if v > 2 * r:
        return v
    d = v - r
    return 2 * abs(d) - (1 if d < 0 else 0) if d else 0
