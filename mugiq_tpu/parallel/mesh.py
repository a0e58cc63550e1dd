"""Device mesh and sharding for the 4D lattice.

Replaces the reference's MPI process-grid topology (--gridsize -> comm_dim /
comm_coord, SURVEY.md §2.4 item 1) with a ``jax.sharding.Mesh``.  The lattice
is partitioned over the (t, z) array axes by default — these are the leading
axes of the [T, Z, Y, X, s, c] layout, so shards are contiguous.  All compute
is written against globally-sharded arrays under ``jit``: XLA lowers
``jnp.roll`` across a partitioned axis to collective-permute (the halo
exchange) and global reductions to all-reduce over ICI, replacing the
reference's ghost-zone machinery and its COMM_SPACE/COMM_TIME communicator
split (lib/loop_mugiq.cpp:61-88).
"""

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: mesh axis names, in array-axis order for a [T, Z, ...] field
AXES = ("t", "z")
#: 3D decomposition (t, z, y) — y shards the fused y*x kernel axis
AXES3 = ("t", "z", "y")


def make_lattice_mesh(mesh_shape: Optional[Tuple[int, ...]] = None,
                      devices=None) -> Mesh:
    """Mesh over (t, z[, y]) lattice axes.

    With ``mesh_shape=None`` all local devices go on the t axis (the
    reference's common --gridsize 1 1 1 N layout).  A length-3 shape adds
    the y axis (the reference partitions all four dims,
    /root/reference/tests/eigensolve.cpp:683; x stays local here — it is
    the vector lane direction).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    need = int(np.prod(mesh_shape))
    assert need <= n, (mesh_shape, n)
    dev_array = np.asarray(devices[:need]).reshape(mesh_shape)
    return Mesh(dev_array, AXES3 if len(mesh_shape) == 3 else AXES)


def spinor_spec() -> P:
    """PartitionSpec for [T, Z, Y, X, s, c] spinor (or [n, T, ...] batches
    via leading Nones added by :func:`sharding_for`)."""
    return P("t", "z", None, None, None, None)


def gauge_spec() -> P:
    return P(None, "t", "z", None, None, None, None)


def sharding_for(mesh: Mesh, spec: P, n_leading: int = 0) -> NamedSharding:
    """NamedSharding with ``n_leading`` replicated batch axes prepended."""
    if n_leading:
        spec = P(*((None,) * n_leading + tuple(spec)))
    return NamedSharding(mesh, spec)


def shard_spinor(mesh: Mesh, psi, n_leading: int = 0):
    return jax.device_put(psi, sharding_for(mesh, spinor_spec(), n_leading))


def shard_gauge(mesh: Mesh, U):
    return jax.device_put(U, sharding_for(mesh, gauge_spec()))
