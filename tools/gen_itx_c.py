"""Generate native/itx1d_gen.h — straight-line C for the inverse-
transform 1-D kernels — by executing the decoder's own Python kernels
(dav1d_tpu/recon/itx.py, the canonical 12-bit-scale derivations) over a
symbolic-expression container.  The C is therefore the same arithmetic
by construction; parity is additionally pinned by tests/test_native_itx.

Usage: python tools/gen_itx_c.py   (rewrites dav1d_tpu/native/itx1d_gen.h)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dav1d_tpu.recon import itx as pitx  # noqa: E402


class Gen:
    def __init__(self, ctype="int64_t", in_bound=None):
        self.lines = []
        self.n = 0
        self.ctype = ctype
        # interval analysis: when in_bound is set, every E carries a
        # worst-case [lo, hi] (inputs and clip() outputs bounded by
        # +-in_bound) and maxabs records the largest intermediate
        # magnitude — the soundness certificate for narrow-type variants
        self.in_bound = in_bound
        self.maxabs = 0

    def tmp(self, expr, bounds=None):
        name = f"v{self.n}"
        self.n += 1
        self.lines.append(f"    const {self.ctype} {name} = {expr};")
        e = E(name, self)
        if self.in_bound is not None:
            assert bounds is not None, f"unbounded op: {expr}"
            e.lo, e.hi = bounds
            self.maxabs = max(self.maxabs, abs(e.lo), abs(e.hi))
        return e


class E:
    """Symbolic value.  Plain Python ints flow through the same operator
    paths (folded zero inputs become literal 0 and constant-fold in
    Python), so the eob-gated sub-kernels below shed their dead
    arithmetic at generation time."""

    __slots__ = ("s", "g", "lo", "hi")

    def __init__(self, s, g):
        self.s = s
        self.g = g
        self.lo = self.hi = 0

    def _v(self, o):
        if isinstance(o, E):
            return o.s
        return str(int(o))

    def _b(self, o):
        if isinstance(o, E):
            return o.lo, o.hi
        return int(o), int(o)

    def __add__(self, o):
        if not isinstance(o, E) and int(o) == 0:
            return self
        lo, hi = self._b(o)
        return self.g.tmp(f"{self.s} + {self._v(o)}",
                          (self.lo + lo, self.hi + hi))

    __radd__ = __add__

    def __sub__(self, o):
        if not isinstance(o, E) and int(o) == 0:
            return self
        lo, hi = self._b(o)
        return self.g.tmp(f"{self.s} - {self._v(o)}",
                          (self.lo - hi, self.hi - lo))

    def __rsub__(self, o):
        if not isinstance(o, E) and int(o) == 0:
            return -self
        lo, hi = self._b(o)
        return self.g.tmp(f"{self._v(o)} - {self.s}",
                          (lo - self.hi, hi - self.lo))

    def __mul__(self, o):
        if not isinstance(o, E):
            if int(o) == 0:
                return 0
            if int(o) == 1:
                return self
        assert not isinstance(o, E), "non-constant multiply"
        k = int(o)
        b = (self.lo * k, self.hi * k)
        return self.g.tmp(f"{self.s} * {self._v(o)}",
                          (min(b), max(b)))

    __rmul__ = __mul__

    def __rshift__(self, o):
        # C arithmetic shift on the generated types == Python floor shift
        return self.g.tmp(f"{self.s} >> {int(o)}",
                          (self.lo >> int(o), self.hi >> int(o)))

    def __neg__(self):
        return self.g.tmp(f"-{self.s}", (-self.hi, -self.lo))


class Lanes:
    """The c[] container: reads load from the strided C array, writes
    store back.  Index = o + k*s with o/s plain ints.  With kmax set,
    reads at positions >= kmax fold to literal 0 (the eob-gated
    sub-kernel contract: the caller guarantees those inputs are zero);
    a read-after-store at a folded position would be unsound, so it
    asserts."""

    def __init__(self, g, n, kmax=None):
        self.g = g
        self.n = n
        self.kmax = n if kmax is None else kmax
        self.stored = {}  # position -> bounds of the stored value

    def __getitem__(self, i):
        # fold only pristine inputs: once a position has been stored
        # (e.g. dct8's inner dct4 writing the even lanes), reads return
        # the live value whatever the position
        if int(i) in self.stored:
            b = self.stored[int(i)]  # bounds of the stored value
        elif int(i) >= self.kmax:
            return 0
        else:
            b = self.g.in_bound
            b = None if b is None else (-b, b)
        return self.g.tmp(f"c[{int(i)} * s]", b)

    def __setitem__(self, i, v):
        if isinstance(v, E):
            self.stored[int(i)] = (v.lo, v.hi)
            s = v.s
        else:
            self.stored[int(i)] = (int(v), int(v))
            if self.g.ctype != "int64_t":
                s = f"({self.g.ctype}){{0}} + {int(v)}"
            else:
                s = str(int(v))
        self.g.lines.append(f"    c[{int(i)} * s] = {s};")


# certificate bound for the 16-lane int32 variants: |dequantized coef|
# <= 2^17 (cf_max at 10-bit, recon/coef.py:421) and |clip output| <=
# 2^17 (the 10-bit row-clip range, native/itx.c row_min) — bd <= 10
# covered; 12-bit stays on the int64 path.
I32_BOUND = 1 << 17
I32_LIMIT = (1 << 31) - 1


def gen_fn(name, fn, n, with_clip=True, wht=False, kmax=None,
           ctype="dtpu_v8", vclip="vclip64", in_bound=None):
    """Emit one 1-D kernel.  The element type is an N-lane vector (lane
    = block index within the batch group): the emitted straight-line
    arithmetic is identical to the scalar derivation, but every op is an
    N-wide SIMD op under -O3 (GCC vector extensions).  wht4 is the one
    scalar exception (rare, called on plain int64).

    kmax < n emits the eob-gated sub-kernel (reference's eob-based
    downshift variants, src/itx_tmpl.c): inputs at positions >= kmax are
    contractually zero and their arithmetic constant-folds away here at
    generation time.

    With in_bound set, interval analysis runs alongside emission and the
    function returns None when any intermediate can exceed I32_LIMIT —
    the certificate that every emitted narrow-type kernel computes the
    same values as the int64 form."""
    if wht:
        ctype = "int64_t"
    g = Gen(ctype, in_bound=in_bound)
    c = Lanes(g, n, kmax)

    def clip(v):
        if not isinstance(v, E):
            if int(v) == 0:
                return 0
            v = g.tmp(f"({ctype}){{0}} + {int(v)}", (int(v), int(v)))
        b = g.in_bound
        return g.tmp(f"{vclip}({v.s}, lo, hi)",
                     None if b is None else (-b, b))

    if wht:
        fn(c, 0, 1)
    elif with_clip:
        fn(c, 0, 1, clip)
    if in_bound is not None and g.maxabs > I32_LIMIT:
        return None
    body = "\n".join(g.lines)
    proto = (f"static void {name}({ctype} *c, ptrdiff_t s, "
             f"{ctype} lo, {ctype} hi)")
    guard = "    (void)lo;\n    (void)hi;\n" \
        if "lo" not in body and "hi" not in body else ""
    return f"{proto}\n{{\n{guard}{body}\n}}\n"


def kmax_list(n):
    """Generated sub-kernel input bounds for an n-point transform:
    powers of two from 4 up to n."""
    ks = []
    k = 4
    while k < n:
        ks.append(k)
        k <<= 1
    ks.append(n)
    return ks


def main():
    out = [
        "/* AUTOGENERATED by tools/gen_itx_c.py from the Python inverse-",
        " * transform kernels (dav1d_tpu/recon/itx.py) — do not edit.",
        " * Same 1-D arithmetic by construction (symbolic execution of",
        " * the canonical 12-bit-scale derivations). */",
        "",
        "/* 8 int64 lanes; lane = block index within the batch group. */",
        "typedef int64_t dtpu_v8 __attribute__((vector_size(64)));",
        "/* 16 int32 lanes (bd <= 10 fast path: every intermediate is",
        " * certified to fit int32 by the generator's interval analysis",
        " * over |input| <= 2^17, so the arithmetic is identical). */",
        "typedef int32_t dtpu_v16 __attribute__((vector_size(64)));",
        "",
        "static inline dtpu_v8 vclip64(dtpu_v8 v, dtpu_v8 lo, dtpu_v8 hi)",
        "{",
        "    /* mask-blend: C mode lacks the vector ternary */",
        "    dtpu_v8 m = v < lo;",
        "    v = (v & ~m) | (lo & m);",
        "    m = v > hi;",
        "    v = (v & ~m) | (hi & m);",
        "    return v;",
        "}",
        "",
        "static inline dtpu_v16 vclip32(dtpu_v16 v, dtpu_v16 lo,"
        " dtpu_v16 hi)",
        "{",
        "    dtpu_v16 m = v < lo;",
        "    v = (v & ~m) | (lo & m);",
        "    m = v > hi;",
        "    v = (v & ~m) | (hi & m);",
        "    return v;",
        "}",
        "",
    ]
    fns = {}
    fns32 = {}
    for (lsz, typ), fn in pitx._1D_FNS.items():
        n = 4 << lsz
        tname = {pitx.DCT: "dct", pitx.ADST: "adst",
                 pitx.FLIPADST: "flipadst", pitx.IDENTITY: "identity"}[typ]
        for k in kmax_list(n):
            name = f"itx1d_{tname}{n}" + (f"_k{k}" if k < n else "")
            if name in fns:
                continue
            fns[name] = (lsz, typ)
            out.append(gen_fn(name, fn, n, kmax=k))
            body32 = gen_fn(name + "_i32", fn, n, kmax=k,
                            ctype="dtpu_v16", vclip="vclip32",
                            in_bound=I32_BOUND)
            if body32 is not None:
                fns32[name] = name + "_i32"
                out.append(body32)
    out.append(gen_fn("itx1d_wht4", pitx.wht4, 4, wht=True))

    # dispatch tables [lsz][type][kidx]: kidx 0 covers nonzero input
    # positions < 4, kidx i covers < (4 << i); unused slots NULL
    out.append("typedef void (*itx1d_fn)(dtpu_v8 *, ptrdiff_t, dtpu_v8,"
               " dtpu_v8);")
    out.append("typedef void (*itx1d_i32_fn)(dtpu_v16 *, ptrdiff_t,"
               " dtpu_v16, dtpu_v16);")
    for tbl, suffix, lut in (("itx1d_table", "", None),
                             ("itx1d_table_i32", "_i32", fns32)):
        ft = "itx1d_fn" if lut is None else "itx1d_i32_fn"
        out.append(f"static const {ft} {tbl}[5][4][5] = {{")
        for lsz in range(5):
            n = 4 << lsz
            rows = []
            for typ, tname in ((pitx.DCT, "dct"), (pitx.ADST, "adst"),
                               (pitx.FLIPADST, "flipadst"),
                               (pitx.IDENTITY, "identity")):
                ks = kmax_list(n)
                ent = []
                for ki in range(5):
                    k = 4 << ki
                    name = f"itx1d_{tname}{n}" + \
                        (f"_k{k}" if k < n else "")
                    if k in ks and name in fns:
                        ent.append(name if lut is None
                                   else lut.get(name, "0"))
                    else:
                        ent.append("0")
                rows.append("{" + ", ".join(ent) + "}")
            out.append("    {" + ",\n     ".join(rows) + "},")
        out.append("};")
        out.append("")

    path = Path(__file__).resolve().parent.parent / "dav1d_tpu" / \
        "native" / "itx1d_gen.h"
    path.write_text("\n".join(out))
    print(f"wrote {path} ({len(fns) + 1} kernels)")


if __name__ == "__main__":
    main()
