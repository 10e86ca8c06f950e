"""Device-side compute ops (JAX/XLA + Pallas).

Every op family mirrors a reference DSP table (reference src/internal.h:62-70:
fg, ipred, mc, itx, lf, cdef, lr, pal) but is designed TPU-first: ops take
*batches* of fixed-size blocks (static shapes) plus per-block parameter
vectors, compute in int32, and are bit-exact with the AV1 spec's integer
semantics. Each op has a plain-XLA implementation (works on CPU for tests and
on TPU) and, where profitable, a Pallas fast path selected at runtime.
"""
