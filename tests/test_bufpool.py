"""Targeted bufpool invariant tests (VERDICT r04 weak #8).

The pool's correctness rests on two global invariants argued in
dav1d_tpu/bufpool.py but previously covered only incidentally:

1. sole-owner rule: ``sys.getrefcount(raw) == 4`` means no surviving
   view — a user-held output picture or 8-slot reference plane pins its
   buffer via ``.base`` and the pool must NOT hand it out again.
2. zero-fill elision: picture planes skip interior zeroing because
   reconstruction writes every coded pixel — so a decode into DIRTY
   recycled buffers must be byte-identical to a decode with the pool
   disabled (fresh zero pages).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import AomEncoder, gradient_frames, write_ivf_packets  # noqa

# big enough that every plane allocation crosses the 1 MB pooling
# threshold (768x512 int32 luma = 1.5 MB)
W, H, N = 768, 512, 4


def _stream(tmp_path, seed, name):
    frames = gradient_frames(N, W, H)
    if seed:
        rng = np.random.default_rng(seed)
        for f in frames:
            f[0][:] = np.minimum(
                f[0].astype(np.int64) + rng.integers(0, 64, f[0].shape),
                255).astype(f[0].dtype)
    enc = AomEncoder(width=W, height=H, usage="good", cpu_used=8, q=45,
                     kf_max_dist=9999, lag=0)
    pkts = enc.encode(frames)
    enc.close()
    p = tmp_path / f"{name}.ivf"
    write_ivf_packets(p, pkts, W, H)
    return p.read_bytes()


def _decode(data, hold):
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    dec = Decoder(Settings(two_pass=True))
    pics, blobs = [], []
    for tu, _ in read_ivf(data):
        dec.send_data(tu)
        while (pic := dec.get_picture()) is not None:
            blobs.append(b"".join(pic.plane_bytes(pl) for pl in range(3)))
            if hold:
                pics.append(pic)
    return pics, blobs


def test_held_pictures_survive_later_decodes(tmp_path):
    """Sole-owner rule: pictures a user still holds keep their pixels
    while a second stream decodes through the same (global) pool."""
    from dav1d_tpu import bufpool

    a = _stream(tmp_path, 0, "a")
    b = _stream(tmp_path, 9, "b")
    bufpool.pool.clear()

    pics_a, blobs_a = _decode(a, hold=True)
    assert len(pics_a) == N
    # decode B while A's pictures are alive: any buffer backing a held
    # view must not be recycled
    _, blobs_b = _decode(b, hold=False)
    for i, pic in enumerate(pics_a):
        got = b"".join(pic.plane_bytes(pl) for pl in range(3))
        assert got == blobs_a[i], f"held picture {i} was clobbered"

    # and B through the dirty pool equals B with the pool disabled
    del pics_a
    saved = bufpool._DISABLED
    try:
        bufpool._DISABLED = True
        _, blobs_b_fresh = _decode(b, hold=False)
    finally:
        bufpool._DISABLED = saved
    assert blobs_b == blobs_b_fresh


def test_dirty_buffer_reuse_is_exact(tmp_path):
    """Zero-fill elision: after stream A's buffers return to the pool
    (dirty with A's pixels), stream B must decode byte-identically to a
    pool-disabled (fresh zero pages) decode."""
    from dav1d_tpu import bufpool

    a = _stream(tmp_path, 0, "a")
    b = _stream(tmp_path, 9, "b")

    saved = bufpool._DISABLED
    try:
        bufpool._DISABLED = True
        _, want = _decode(b, hold=False)
    finally:
        bufpool._DISABLED = saved

    bufpool.pool.clear()
    _, _ = _decode(a, hold=False)  # charge the pool with A's pixels
    # every frame-sized buffer is now reusable and dirty
    _, got = _decode(b, hold=False)
    assert got == want


def test_sole_owner_threshold_is_calibrated():
    """The magic refcount (bufpool.py:71): a bucket-held buffer with no
    outside views must sit exactly at the reuse threshold, and ONE
    surviving view must block reuse.  If a CPython or numpy change
    shifts the baseline, this fails loudly rather than corrupting
    frames."""
    from dav1d_tpu import bufpool

    p = bufpool.BufPool()
    arr = p.take((1 << 20,), np.uint8, fill=0)
    assert arr.base is not None
    # identify the raw buffer by data pointer: holding a python ref to
    # it would itself pin it (that IS the mechanism under test)
    ptr = arr.base.ctypes.data
    arr[:16] = 7  # make the dirt observable

    # outside view alive -> take() must return a DIFFERENT buffer
    arr2 = p.take((1 << 20,), np.uint8, fill=None)
    assert arr2.base.ctypes.data != ptr
    arr2[:16] = 9

    # drop all outside views -> the first buffer MUST be reused (r5:
    # the hard-coded threshold silently disabled all reuse under this
    # interpreter; the calibrated one must actually recycle) and carry
    # its dirt (np.empty semantics)
    del arr, arr2
    arr3 = p.take((1 << 20,), np.uint8, fill=None)
    assert arr3.base.ctypes.data == ptr
    assert arr3[:16].tolist() == [7] * 16

    # with arr3 pinning the first buffer, the next take must reuse the
    # SECOND freed buffer, not the pinned one
    arr4 = p.take((1 << 20,), np.uint8, fill=None)
    assert arr4.base.ctypes.data != ptr
    assert arr4[:16].tolist() == [9] * 16
