"""Sharded position-space HDF5 output: per-host shard files + reassembly
into the exact serial layout (the multi-host answer to the reference's
parallel-HDF5 hyperslab writes, loop_mugiq.cpp:529-656)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mugiq_tpu.io.hdf5io import (write_loops_hdf5_pos,
                                 write_loops_hdf5_pos_sharded,
                                 assemble_loops_hdf5_pos)

LABELS = ["disp_0", "disp_+z_1"]


def _data(T=4, Z=4, Y=2, X=2, l=2):
    rng = np.random.default_rng(3)
    return rng.standard_normal((l, 2, 16, T, Z, Y, X)).astype(np.float32)


def test_sharded_pos_roundtrip_single(tmp_path):
    """1-process sharded write == serial write after assembly."""
    d = _data()
    prefix = str(tmp_path / "pos")
    write_loops_hdf5_pos_sharded(prefix, jnp.asarray(d), LABELS)
    full = assemble_loops_hdf5_pos(prefix, str(tmp_path / "pos_full.h5"),
                                   LABELS)
    expect = d[:, 0] + 1j * d[:, 1]
    np.testing.assert_allclose(full, expect.astype(np.complex64), atol=0)

    # the assembled file matches a direct serial write bit-for-bit
    import h5py
    write_loops_hdf5_pos(str(tmp_path / "pos_direct.h5"),
                         expect.astype(np.complex64), LABELS)
    with h5py.File(tmp_path / "pos_full.h5") as fa, \
            h5py.File(tmp_path / "pos_direct.h5") as fb:
        a = np.asarray(fa["disp_0/g5/loop"])
        b = np.asarray(fb["disp_0/g5/loop"])
        np.testing.assert_allclose(a, b, atol=0)


def test_sharded_pos_virtual_mesh(tmp_path):
    """t-sharded over the 8 virtual CPU devices, single process."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    d = _data(T=8)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("t",))
    sh = NamedSharding(mesh, P(None, None, None, "t"))
    arr = jax.device_put(jnp.asarray(d), sh)
    prefix = str(tmp_path / "posm")
    write_loops_hdf5_pos_sharded(prefix, arr, LABELS)
    full = assemble_loops_hdf5_pos(prefix, "", LABELS)
    expect = d[:, 0] + 1j * d[:, 1]
    np.testing.assert_allclose(full, expect.astype(np.complex64), atol=0)


_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]
sys.path.insert(0, "/root/repo")
from mugiq_tpu.parallel.distributed import init_distributed, pod_mesh
init_distributed(f"localhost:{port}", 2, pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
from mugiq_tpu.io.hdf5io import (write_loops_hdf5_pos_sharded,
                                 assemble_loops_hdf5_pos)

mesh = pod_mesh((2, 1))
rng = np.random.default_rng(3)
data = rng.standard_normal((2, 2, 16, 4, 4, 2, 2)).astype(np.float32)
sh = NamedSharding(mesh, P(None, None, None, "t"))
arr = jax.make_array_from_callback(data.shape, sh, lambda i: data[i])
labels = ["disp_0", "disp_+z_1"]
p = write_loops_hdf5_pos_sharded(f"{tmp}/pos", arr, labels)
multihost_utils.sync_global_devices("pos-written")
if pid == 0:
    full = assemble_loops_hdf5_pos(f"{tmp}/pos", f"{tmp}/pos_full.h5",
                                   labels)
    expect = (data[:, 0] + 1j * data[:, 1]).astype(np.complex64)
    assert np.allclose(full, expect), np.abs(full - expect).max()
print(f"POS-OK {pid}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pos_sharded(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo")
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"worker timed out:\n{out.decode()}")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"POS-OK {i}" in out, out
