"""dav1d_tpu — a TPU-native AV1 decoder (JAX / XLA / Pallas).

Brand-new implementation, functionally equivalent to VideoLAN dav1d 1.5.4
(reference: /root/reference) but architected for TPU hardware:

* Host side (Python, later C++): the irreducibly serial, byte-oriented work —
  OBU parsing, MSAC range-coder entropy decode, CDF adaptation, ref-MV
  prediction — producing flat per-frame tensors.
* Device side (JAX/XLA + Pallas): all pixel math, batched across superblocks
  and tiles — inverse transforms, intra prediction, motion compensation,
  deblocking, CDEF, super-resolution, loop restoration, film grain.
* Scaling: tiles sharded across chips (`shard_map` + halo collectives over
  ICI), GOPs pipelined across hosts with reference-plane broadcast.

Public API mirrors the reference's capability surface
(include/dav1d/dav1d.h): Decoder(open) / send_data / get_picture / flush /
close, a Settings struct, and pluggable logging.
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large numpy temporaries on the heap instead of mmap.

    The batched host kernels churn through multi-MB temporaries every
    frame; glibc malloc serves those via mmap/munmap by default, so every
    allocation page-faults from scratch (measured ~10x slowdown on the
    full-frame CDEF batch). Raising the mmap/trim thresholds makes the
    heap retain and reuse those buffers. Best-effort: silently skipped on
    non-glibc platforms.
    """
    import ctypes
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except (OSError, AttributeError):
        pass


_tune_malloc()

from .headers import SequenceHeader, FrameHeader  # noqa: F401
