"""Multi-host (multi-process) initialization and IO helpers.

The reference runs across nodes via MPI: initComms(--gridsize X Y Z T)
(/root/reference/tests/eigensolve.cpp:683) with QUDA owning the
process-grid topology, and MPI-IO-backed parallel HDF5 for the loop output
(/root/reference/lib/loop_mugiq.cpp:61-88, 571).  The TPU-native
equivalents:

* process bootstrap: ``jax.distributed.initialize`` — one process per host
  on a TPU pod slice; afterwards ``jax.devices()`` spans the slice and a
  ``Mesh`` built from it shards over ICI within a host and DCN across
  hosts.  Keep the 't' mesh axis outermost so the (largest) t-halo
  transfers ride ICI within a host and only the outer-axis cut crosses
  DCN.
* measurement epilogue IO: the momentum-projected loop data is tiny
  ([P, l, 16, T]); gather it with ``process_allgather`` and write HDF5
  from process 0 — the analog of the reference's COMM_TIME gather +
  rank-0-style hyperslab writes.  (Gauge/evec IO at scale uses per-host
  shard files: save/load_evecs_sharded below.)

CLI: ``--dist-coordinator host:port --dist-num-processes N
--dist-process-id I`` (cli/common.py) — the mpirun analog when not under a
TPU pod launcher (which auto-populates these).
"""

import os
from typing import Optional, Tuple

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> None:
    """Initialize the multi-process runtime (reference: initComms/MPI_Init).

    With no arguments, relies on the TPU pod launcher's auto-detection;
    pass coordinator ("host:port"), num_processes and process_id explicitly
    for manual bootstrap (e.g. CPU multi-process tests over localhost).
    Idempotent: a second call is a no-op.
    """
    import jax

    if getattr(init_distributed, "_done", False):
        return
    kwargs = {}
    if coordinator is not None:
        kwargs.update(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)
    init_distributed._done = True


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0


def pod_mesh(mesh_shape: Optional[Tuple[int, ...]] = None):
    """Lattice mesh over ALL devices of the (possibly multi-host) runtime.

    mesh_shape (t[, z[, y]]) must multiply to the global device count; by
    default every global device goes on 't'.  Built with the global device
    list so the outer axis cut is the inter-host (DCN) one."""
    from .mesh import make_lattice_mesh
    import jax

    return make_lattice_mesh(mesh_shape, devices=jax.devices())


def gather_global(arr) -> np.ndarray:
    """Global numpy value of a (possibly sharded, possibly multi-host)
    array on EVERY process (the reference's MPI_Gather + Bcast epilogue,
    loop_mugiq.cpp:420-424)."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(arr)
    if getattr(arr, "is_fully_replicated", False):
        # every process holds the full value locally
        return np.asarray(arr.addressable_shards[0].data)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def save_evecs_sharded(path_prefix: str, evecs, evals=None) -> str:
    """Per-host shard checkpoint: each process writes its addressable
    shards to ``<prefix>.proc<i>.npz`` (the scale-out alternative to the
    gather-to-host-0 save in io/gauge_io.py; reference analog:
    per-rank QIO volumes)."""
    import jax

    idx = jax.process_index()
    path = f"{path_prefix}.proc{idx}.npz"
    shards = [s for s in evecs.addressable_shards]
    arrs = {f"shard{k}": np.asarray(s.data) for k, s in enumerate(shards)}
    meta = {f"index{k}": np.asarray(
        [(sl.start or 0, sl.stop if sl.stop is not None else -1)
         for sl in s.index], dtype=np.int64)
        for k, s in enumerate(shards)}
    extra = {"evals": np.asarray(evals)} if evals is not None else {}
    np.savez(path, global_shape=np.asarray(evecs.shape, dtype=np.int64),
             **arrs, **meta, **extra)
    return path


def load_evecs_sharded(path_prefix: str, sharding):
    """Rebuild a global array from per-host shard files (every process
    reads its own file; shapes must match the original run's sharding)."""
    import jax

    idx = jax.process_index()
    with np.load(f"{path_prefix}.proc{idx}.npz") as z:
        gshape = tuple(int(d) for d in z["global_shape"])
        ks = sorted(int(k[5:]) for k in z.files if k.startswith("shard"))
        shards = {}
        for k in ks:
            bounds = z[f"index{k}"]
            key = tuple(slice(int(a), None if b < 0 else int(b))
                        for a, b in bounds)
            shards[key] = z[f"shard{k}"]
        evals = z["evals"] if "evals" in z.files else None

    def cb(index):
        key = tuple(slice(sl.start or 0, sl.stop) if sl.stop is not None
                    else slice(sl.start or 0, None) for sl in index)
        # match on the start offsets (stop may be None vs explicit)
        for skey, data in shards.items():
            if all((a.start or 0) == (b.start or 0)
                   for a, b in zip(key, skey)):
                return data
        raise KeyError(f"no local shard for index {index}")

    arr = jax.make_array_from_callback(gshape, sharding, cb)
    return (arr, evals) if evals is not None else (arr, None)
