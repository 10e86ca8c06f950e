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
    def __init__(self, ctype="int64_t"):
        self.lines = []
        self.n = 0
        self.ctype = ctype

    def tmp(self, expr):
        name = f"v{self.n}"
        self.n += 1
        self.lines.append(f"    const {self.ctype} {name} = {expr};")
        return E(name, self)


class E:
    """Symbolic value.  Plain Python ints flow through the same operator
    paths (folded zero inputs become literal 0 and constant-fold in
    Python), so the eob-gated sub-kernels below shed their dead
    arithmetic at generation time."""

    __slots__ = ("s", "g")

    def __init__(self, s, g):
        self.s = s
        self.g = g

    def _v(self, o):
        if isinstance(o, E):
            return o.s
        return str(int(o))

    def __add__(self, o):
        if not isinstance(o, E) and int(o) == 0:
            return self
        return self.g.tmp(f"{self.s} + {self._v(o)}")

    __radd__ = __add__

    def __sub__(self, o):
        if not isinstance(o, E) and int(o) == 0:
            return self
        return self.g.tmp(f"{self.s} - {self._v(o)}")

    def __rsub__(self, o):
        if not isinstance(o, E) and int(o) == 0:
            return -self
        return self.g.tmp(f"{self._v(o)} - {self.s}")

    def __mul__(self, o):
        if not isinstance(o, E):
            if int(o) == 0:
                return 0
            if int(o) == 1:
                return self
        return self.g.tmp(f"{self.s} * {self._v(o)}")

    __rmul__ = __mul__

    def __rshift__(self, o):
        return self.g.tmp(f"{self.s} >> {int(o)}")

    def __neg__(self):
        return self.g.tmp(f"-{self.s}")


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
        self.stored = set()

    def __getitem__(self, i):
        # fold only pristine inputs: once a position has been stored
        # (e.g. dct8's inner dct4 writing the even lanes), reads return
        # the live value whatever the position
        if int(i) >= self.kmax and int(i) not in self.stored:
            return 0
        return self.g.tmp(f"c[{int(i)} * s]")

    def __setitem__(self, i, v):
        self.stored.add(int(i))
        if isinstance(v, E):
            s = v.s
        elif self.g.ctype == "dtpu_v8":
            s = f"({self.g.ctype}){{0}} + {int(v)}"
        else:
            s = str(int(v))
        self.g.lines.append(f"    c[{int(i)} * s] = {s};")


def gen_fn(name, fn, n, with_clip=True, wht=False, kmax=None):
    """Emit one 1-D kernel.  The element type is the 8-lane int64 vector
    dtpu_v8 (lane = block index within the batch group): the emitted
    straight-line arithmetic is identical to the scalar derivation, but
    every op is an 8-wide SIMD op under -O3 (GCC vector extensions).
    wht4 is the one scalar exception (rare, called on plain int64).

    kmax < n emits the eob-gated sub-kernel (reference's eob-based
    downshift variants, src/itx_tmpl.c): inputs at positions >= kmax are
    contractually zero and their arithmetic constant-folds away here at
    generation time."""
    ctype = "int64_t" if wht else "dtpu_v8"
    g = Gen(ctype)
    c = Lanes(g, n, kmax)

    def clip(v):
        if not isinstance(v, E):
            if int(v) == 0:
                return 0
            v = g.tmp(f"(dtpu_v8){{0}} + {int(v)}")
        return g.tmp(f"vclip64({v.s}, lo, hi)")

    if wht:
        fn(c, 0, 1)
    elif with_clip:
        fn(c, 0, 1, clip)
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
    ]
    fns = {}
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
    out.append(gen_fn("itx1d_wht4", pitx.wht4, 4, wht=True))

    # dispatch table [lsz][type][kidx]: kidx 0 covers nonzero input
    # positions < 4, kidx i covers < (4 << i); unused slots NULL
    out.append("typedef void (*itx1d_fn)(dtpu_v8 *, ptrdiff_t, dtpu_v8,"
               " dtpu_v8);")
    out.append("static const itx1d_fn itx1d_table[5][4][5] = {")
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
                if k in ks:
                    name = f"itx1d_{tname}{n}" + (f"_k{k}" if k < n else "")
                    ent.append(name if name in fns else "0")
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
