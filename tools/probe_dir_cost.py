"""Probe: where does the 4K cdef_dir program's time go?

Historical finding (r5 continuation): with the cost lattice laid out
(N, 8), jnp.argmax + take_along_axis over the minor-8 axis cost 2.0 ms
of the 3.2 ms program; the transpose and both MXU matmuls were <0.1 ms
each.  The shipped form (ops/cdef._dir_from_psum_t) keeps N on the
lane axis and replaces the argmax with an unrolled compare chain.

Times, on the attached chip via devrt.time_program (slope protocol):
  full    — the shipped _jit_find_dir_maps program at 4K geometry
  trans   — the (R8,8,W8,8)->(64,N) transpose alone
  lattice — _dir_from_psum_t alone (pre-computed transposed psums)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from dav1d_tpu import devrt
from dav1d_tpu.ops.cdef import _jit_find_dir_maps, _dir_from_psum_t

R8, W8 = 272, 480   # 4K luma: 2176x3840 padded plane
plane = np.random.randint(0, 256, (R8 * 8, W8 * 8)).astype(np.int32)

full = _jit_find_dir_maps(R8, W8, 8)
print(f"full: {devrt.time_program(full, (plane,)):.3f} ms", flush=True)


@jax.jit
def trans(p):
    return p.reshape(R8, 8, W8, 8).transpose(1, 3, 0, 2).reshape(64, -1)


print(f"transpose: {devrt.time_program(trans, (plane,)):.3f} ms",
      flush=True)

psum_t = np.random.randint(-1024, 1024, (128, R8 * W8)).astype(np.int32)
lat = jax.jit(_dir_from_psum_t)
print(f"lattice: {devrt.time_program(lat, (psum_t,)):.3f} ms", flush=True)
