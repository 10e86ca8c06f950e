"""Multi-device decode: the pass-2 device batches sharded over a
jax.sharding.Mesh must reproduce the single-device decode byte-exactly
(SURVEY §4 implication (c): N-chip vs 1-chip bit-equality is the
distributed test; conftest provides the 8-device virtual CPU mesh)."""

import hashlib
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import AomEncoder, gradient_frames, write_ivf_packets  # noqa


def _decode_md5(tus, settings):
    from dav1d_tpu.decoder import Decoder

    dec = Decoder(settings)
    h = hashlib.md5()
    n = 0
    for tu in tus:
        dec.send_data(tu)
        while (p := dec.get_picture()) is not None:
            n += 1
            for pl in range(3):
                h.update(p.plane_bytes(pl))
    return n, h.hexdigest()


@pytest.mark.parametrize("n_devices", [2, 8])
def test_mesh_sharded_decode_matches_single(tmp_path, n_devices):
    import jax
    from jax.sharding import Mesh

    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Settings

    devices = jax.devices()
    if len(devices) < n_devices:
        pytest.skip(f"need {n_devices} devices")
    mesh = Mesh(np.array(devices[:n_devices]), axis_names=("tiles",))

    enc = AomEncoder(width=256, height=192, usage="good", cpu_used=6, q=40,
                     kf_max_dist=4, lag=0,
                     options={"tile-columns": 1, "tile-rows": 1})
    pkts = enc.encode(gradient_frames(4, 256, 192))
    enc.close()
    ivf = tmp_path / "mc.ivf"
    write_ivf_packets(ivf, pkts, 256, 192)
    tus = [tu for tu, _ in read_ivf(ivf.read_bytes())]

    n1, ref = _decode_md5(tus, Settings(two_pass=True))
    nn, got = _decode_md5(tus, Settings(two_pass=True, mesh=mesh))
    assert n1 == nn == 4
    assert got == ref


def test_mesh_filter_chain_matches_single(tmp_path):
    """Superres + loop restoration stream: exercises the mesh-sharded
    deblock (ppermute halo write-backs, recon/mesh_lf.py), CDEF row
    bands (recon/mesh_cdef.py) and the unit-batch-sharded LR
    (ops/lr.py _mesh_put) in one decode."""
    import jax
    from jax.sharding import Mesh

    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Settings

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("need 8 devices")
    mesh = Mesh(np.array(devices[:8]), axis_names=("tiles",))

    enc = AomEncoder(width=256, height=192, usage="good", cpu_used=4,
                     q=40, kf_max_dist=9999, lag=0,
                     superres=(1, 16, 16, 63, 63))
    pkts = enc.encode(gradient_frames(4, 256, 192))
    enc.close()
    ivf = tmp_path / "lr.ivf"
    write_ivf_packets(ivf, pkts, 256, 192)
    tus = [tu for tu, _ in read_ivf(ivf.read_bytes())]

    n1, ref = _decode_md5(tus, Settings(two_pass=True))
    nn, got = _decode_md5(tus, Settings(two_pass=True, mesh=mesh))
    assert n1 == nn == 4
    assert got == ref
