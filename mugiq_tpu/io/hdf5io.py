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


def write_loops_hdf5_pos_sharded(path_prefix: str, data_pos_planar,
                                 slot_labels: List[str]) -> str:
    """Per-host shard write of POSITION-space loop data at multi-host scale.

    The reference writes pos-space hyperslabs with MPI-IO-backed parallel
    HDF5 (/root/reference/lib/loop_mugiq.cpp:529-656 writes mom-space that
    way; pos-space is its unimplemented writeLoopsHDF5_Pos).  h5py here has
    no MPI driver, so the scale-out equivalent is one file per process
    holding its addressable (t, z) hyperslabs plus offset metadata, and
    :func:`assemble_loops_hdf5_pos` reassembles the exact serial file.

    data_pos_planar: jax array [nLoop, 2, 16, T, Z, Y, X] (planar re/im),
    possibly sharded over T (and Z) on a multi-host mesh.  Each process
    writes ``<prefix>.proc<i>.h5``:

        /                 attrs: global_dims [T,Z,Y,X], n_loop, process_count
        /shard<k>         attrs: offset [7], shape [7]  (global hyperslab)
        /shard<k>/<disp>/<gamma-name>/loop   float[lt, lz, Y, X, 2]

    Returns the path written by THIS process.
    """
    import h5py
    import jax

    n_loop, two, n_g = data_pos_planar.shape[:3]
    assert two == 2 and n_g == len(GAMMA_NAMES)
    assert n_loop == len(slot_labels)
    idx = jax.process_index()
    path = f"{path_prefix}.proc{idx}.h5"
    gshape = data_pos_planar.shape

    with h5py.File(path, "w") as f:
        f.attrs["global_dims"] = np.asarray(gshape[3:], dtype=np.int64)
        f.attrs["n_loop"] = n_loop
        f.attrs["process_count"] = jax.process_count()
        shards = list(data_pos_planar.addressable_shards)
        for k, s in enumerate(shards):
            arr = np.asarray(s.data)         # [l, 2, 16, lt, lz, Y, X]
            off = [sl.start or 0 for sl in s.index]
            grp = f.create_group(f"shard{k}")
            grp.attrs["offset"] = np.asarray(off, dtype=np.int64)
            grp.attrs["shape"] = np.asarray(arr.shape, dtype=np.int64)
            for il, label in enumerate(slot_labels):
                g2 = grp.create_group(label)
                for ig, gname in enumerate(GAMMA_NAMES):
                    # [lt, lz, Y, X, 2]
                    block = np.moveaxis(arr[il, :, ig], 0, -1)
                    g2.create_group(gname).create_dataset(
                        "loop", data=np.ascontiguousarray(block))
    return path


def assemble_loops_hdf5_pos(path_prefix: str, out_filename: str,
                            slot_labels: List[str]) -> np.ndarray:
    """Reassemble per-process pos-space shard files into the serial
    single-file layout of :func:`write_loops_hdf5_pos` (and return the full
    complex array [nLoop, 16, T, Z, Y, X]).  Post-processing-side analog of
    the reference's parallel-HDF5 single file."""
    import glob
    import h5py

    files = sorted(glob.glob(f"{path_prefix}.proc*.h5"))
    assert files, f"no shard files at {path_prefix}.proc*.h5"
    with h5py.File(files[0], "r") as f:
        T, Z, Y, X = (int(v) for v in f.attrs["global_dims"])
        n_loop = int(f.attrs["n_loop"])
        n_proc = int(f.attrs["process_count"])
    assert len(files) == n_proc, (files, n_proc)

    full = np.zeros((n_loop, len(GAMMA_NAMES), T, Z, Y, X),
                    dtype=np.complex64)
    for path in files:
        with h5py.File(path, "r") as f:
            for key in f.keys():
                if not key.startswith("shard"):
                    continue
                grp = f[key]
                # stored offset covers the full sharded array
                # [l, 2, 16, T, Z, Y, X]: use ALL lattice offsets so 3D
                # (t,z,y) meshes reassemble correctly, not just t/z
                off = grp.attrs["offset"]
                t0, z0, y0, x0 = (int(off[3]), int(off[4]),
                                  int(off[5]) if len(off) > 5 else 0,
                                  int(off[6]) if len(off) > 6 else 0)
                for il, label in enumerate(slot_labels):
                    for ig, gname in enumerate(GAMMA_NAMES):
                        blk = np.asarray(grp[label][gname]["loop"])
                        lt, lz, ly, lx = blk.shape[:4]
                        full[il, ig, t0:t0 + lt, z0:z0 + lz,
                             y0:y0 + ly, x0:x0 + lx] = \
                            blk[..., 0] + 1j * blk[..., 1]
    if out_filename:
        write_loops_hdf5_pos(out_filename, full, slot_labels)
    return full
