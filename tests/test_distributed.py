"""Multi-host (2-process) bootstrap over localhost: jax.distributed init,
cross-process collectives, per-host shard checkpoint.

The reference equivalent is mpirun + initComms (tests/eigensolve.cpp:683);
here two real OS processes coordinate through jax.distributed on the CPU
backend (1 device each -> a 2-device global mesh), and the t-halo roll +
global reduction cross the process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]
sys.path.insert(0, "/root/repo")
from mugiq_tpu.parallel.distributed import (init_distributed, pod_mesh,
                                            gather_global, is_primary,
                                            save_evecs_sharded,
                                            load_evecs_sharded)
init_distributed(f"localhost:{port}", 2, pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()
mesh = pod_mesh((2, 1))

T = 4
data = np.arange(T * 8, dtype=np.float32).reshape(T, 8)
sharding = NamedSharding(mesh, P("t", None))
arr = jax.make_array_from_callback((T, 8), sharding, lambda idx: data[idx])

# t-roll = cross-process collective permute; sum = cross-process all-reduce
out = jax.jit(lambda a: jnp.sum(a * jnp.roll(a, 1, axis=0)))(arr)
ref = float(np.sum(data * np.roll(data, 1, axis=0)))
assert abs(float(out) - ref) < 1e-3, (float(out), ref)

# epilogue gather (reference MPI_Gather+Bcast analog)
g = gather_global(out)
assert np.allclose(np.asarray(g).ravel()[0], ref)

# per-host shard checkpoint round trip
path = save_evecs_sharded(f"{tmp}/ev", arr, evals=np.asarray([1.0, 2.0]))
arr2, evals = load_evecs_sharded(f"{tmp}/ev", sharding)
got = gather_global(jnp.sum(arr2))
assert np.allclose(np.asarray(got).ravel()[0], data.sum()), got
assert evals is not None and evals[1] == 2.0
print(f"DIST-OK {pid} primary={is_primary()}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # 1 CPU device per process
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
            pytest.fail(f"distributed worker timed out:\n{out.decode()}")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"DIST-OK {i}" in out, out
