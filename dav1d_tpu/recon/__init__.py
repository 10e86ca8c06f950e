"""Reconstruction: prediction + inverse transform + in-loop filters.

Two tiers:
* exact numpy kernels (this package) — the golden scalar model, used by the
  host fallback path and as the reference for kernel tests;
* batched JAX/Pallas kernels (dav1d_tpu.ops) — the TPU production path,
  tested for bit-equality against these.
"""
