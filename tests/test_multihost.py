"""Multi-HOST decode: two separate processes form a jax.distributed
cluster (CPU devices, Gloo collectives) and decode the same stream with
the GLOBAL 2-device mesh sharding the pass-2 batches and the in-loop
filter chain across processes — the cross-host form of the tiles->chips
axis (SURVEY §2.7 communication backend; VERDICT r02 named the
single-process mesh a gap).  Host state is replicated (each process
runs the full entropy decode); sharded uploads ride
devrt.mesh_put (make_array_from_callback on multi-process meshes) and
filtered planes return via cross-process allgather (devrt.mesh_fetch).
Byte-equality with the single-process decode is asserted at rank 0.
"""

import hashlib
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aom_enc import AomEncoder, gradient_frames, write_ivf_packets  # noqa

_WORKER = r"""
import os, sys, hashlib
pid = int(sys.argv[1])
path = sys.argv[2]
port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # one local device per process
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", 2, pid,
                           local_device_ids=[0])
import numpy as np
from jax.sharding import Mesh
sys.path.insert(0, os.getcwd())
from dav1d_tpu.containers import read_ivf
from dav1d_tpu.decoder import Decoder, Settings

mesh = Mesh(np.array(jax.devices()), axis_names=("tiles",))
dec = Decoder(Settings(two_pass=True, mesh=mesh))
h = hashlib.md5()
n = 0
for tu, _ in read_ivf(open(path, "rb").read()):
    dec.send_data(tu)
    while (p := dec.get_picture()) is not None:
        n += 1
        for pl in range(3):
            h.update(p.plane_bytes(pl))
print(f"RESULT {pid} {n} {h.hexdigest()}", flush=True)
"""


def test_two_process_mesh_decode(tmp_path):
    from dav1d_tpu.containers import read_ivf
    from dav1d_tpu.decoder import Decoder, Settings

    enc = AomEncoder(width=256, height=192, usage="good", cpu_used=6,
                     q=40, kf_max_dist=4, lag=0,
                     options={"tile-columns": 1, "tile-rows": 1})
    pkts = enc.encode(gradient_frames(4, 256, 192))
    enc.close()
    ivf = tmp_path / "mh.ivf"
    write_ivf_packets(ivf, pkts, 256, 192)

    # single-process golden
    tus = [tu for tu, _ in read_ivf(ivf.read_bytes())]
    dec = Decoder(Settings(two_pass=True))
    h = hashlib.md5()
    n_ref = 0
    for tu in tus:
        dec.send_data(tu)
        while (p := dec.get_picture()) is not None:
            n_ref += 1
            for pl in range(3):
                h.update(p.plane_bytes(pl))
    ref = h.hexdigest()

    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), str(ivf), "9931"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(Path(__file__).resolve().parent.parent))
        for i in range(2)]
    try:
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines()
                if ln.startswith("RESULT")][-1]
        _, _, n, digest = line.split()
        assert int(n) == n_ref
        assert digest == ref, f"rank {i} bytes diverge"
