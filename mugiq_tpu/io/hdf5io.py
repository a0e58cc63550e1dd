"""HDF5 output of loop data with the reference group schema.

Replicates writeLoopsHDF5_Mom (/root/reference/lib/loop_mugiq.cpp:529-656):

    /mom_{px:+d}_{py:+d}_{pz:+d}/<disp>/<gamma-name>/loop   float[totT, 2]

where <disp> is 'disp_0' for the ultra-local slot or 'disp_{str}_{len}'
(loop_mugiq.cpp:598-609) and <gamma-name> is one of the 16 names from
GammaName (include/gamma.h:11-20).  The last axis is (real, imag).

The reference writes with parallel HDF5 from the COMM_TIME ranks, each
contributing its local time slices as a hyperslab; here the data is already
globally reduced on host (XLA all-reduce over the device mesh replaced
MPI_Reduce/Gather), so a serial h5py write is the natural equivalent.

writeLoopsHDF5_Pos is *unimplemented* in the reference
(loop_mugiq.cpp:660-663 — errors out); we provide a working implementation
with dataset float[T, Z, Y, X, 2] under the same group tree.
"""

from typing import List, Sequence, Tuple

import numpy as np

from ..gamma import GAMMA_NAMES


def write_loops_hdf5_mom(filename: str,
                         data_mom: np.ndarray,
                         momenta: Sequence[Tuple[int, int, int]],
                         slot_labels: List[str]) -> None:
    """data_mom: [Nmom, nLoop, 16, totT] complex."""
    import h5py

    n_mom, n_loop, n_g, tot_t = data_mom.shape
    assert n_g == len(GAMMA_NAMES)
    assert n_mom == len(list(momenta))
    assert n_loop == len(slot_labels)
    real_dtype = np.float32 if data_mom.dtype == np.complex64 else np.float64

    with h5py.File(filename, "w") as f:
        for im, (px, py, pz) in enumerate(momenta):
            g1 = f.create_group(f"mom_{px:+d}_{py:+d}_{pz:+d}")
            for il, label in enumerate(slot_labels):
                g2 = g1.create_group(label)
                for ig, gname in enumerate(GAMMA_NAMES):
                    g3 = g2.create_group(gname)
                    series = data_mom[im, il, ig]
                    arr = np.stack([series.real, series.imag], axis=-1)
                    g3.create_dataset("loop", data=arr.astype(real_dtype))


def write_loops_hdf5_pos(filename: str,
                         data_pos: np.ndarray,
                         slot_labels: List[str]) -> None:
    """data_pos: [nLoop, 16, T, Z, Y, X] complex (g5-mapped or raw; caller's
    choice — the API writes the g5-mapped data for consistency with the
    momentum-space output)."""
    import h5py

    n_loop, n_g = data_pos.shape[:2]
    assert n_g == len(GAMMA_NAMES)
    assert n_loop == len(slot_labels)
    real_dtype = np.float32 if data_pos.dtype == np.complex64 else np.float64

    with h5py.File(filename, "w") as f:
        for il, label in enumerate(slot_labels):
            g2 = f.create_group(label)
            for ig, gname in enumerate(GAMMA_NAMES):
                g3 = g2.create_group(gname)
                vol = data_pos[il, ig]
                arr = np.stack([vol.real, vol.imag], axis=-1)
                g3.create_dataset("loop", data=arr.astype(real_dtype))
