"""Gauge configuration IO (NERSC archive format) and eigenvector checkpoints.

The reference loads gauge fields through QUDA's QIO/LIME path
(read_gauge_field, tests/loop.cpp:849-851) and round-trips eigenvectors via
QUDA's vec_infile/vec_outfile (tests/eigensolve.cpp:295-296).  Equivalents:

* NERSC archive format reader/writer (the lattice-QCD interchange format:
  ASCII BEGIN_HEADER/END_HEADER key=value block + big-endian binary links,
  site-major with x fastest, directions innermost), supporting both
  4D_SU3_GAUGE (two-row compressed) and 4D_SU3_GAUGE_3x3 storage;
* eigenvector/eigenvalue checkpoints in HDF5 (save_evecs / load_evecs) —
  this is the framework's checkpoint/resume story: a converged deflation
  basis can be reused across runs.
"""

from typing import Dict, Tuple

import numpy as np

from ..lattice import LatticeGeometry

_HDR_BEGIN = b"BEGIN_HEADER"
_HDR_END = b"END_HEADER"


def _third_row(u2: np.ndarray) -> np.ndarray:
    """Reconstruct row 3 of SU(3) from rows 1,2: r3 = (r1 x r2)^*."""
    r1, r2 = u2[..., 0, :], u2[..., 1, :]
    r3 = np.cross(r1, r2).conj()
    return np.concatenate([u2, r3[..., None, :]], axis=-2)


def read_nersc_gauge(path: str) -> Tuple[np.ndarray, Dict[str, str]]:
    """Read a NERSC archive config -> (U[4, T, Z, Y, X, 3, 3], header dict).

    Directions in the file are (x, y, z, t) innermost-first; we return the
    framework layout with mu leading.
    """
    with open(path, "rb") as f:
        line = f.readline()
        if line.strip() != _HDR_BEGIN:
            raise ValueError(f"{path}: not a NERSC archive (missing BEGIN_HEADER)")
        header: Dict[str, str] = {}
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated header")
            if line.strip() == _HDR_END:
                break
            if b"=" in line:
                k, v = line.decode("ascii", "replace").split("=", 1)
                header[k.strip()] = v.strip()
        data = f.read()

    dims = tuple(int(header[f"DIMENSION_{i}"]) for i in (1, 2, 3, 4))
    Lx, Ly, Lz, Lt = dims
    datatype = header.get("DATATYPE", "4D_SU3_GAUGE")
    fp = header.get("FLOATING_POINT", "IEEE32BIG")
    if fp in ("IEEE32", "IEEE32BIG"):
        dt = np.dtype(">f4")
    elif fp == "IEEE32LITTLE":
        dt = np.dtype("<f4")
    elif fp in ("IEEE64", "IEEE64BIG"):
        dt = np.dtype(">f8")
    elif fp == "IEEE64LITTLE":
        dt = np.dtype("<f8")
    else:
        raise ValueError(f"{path}: unsupported FLOATING_POINT {fp}")

    vol = Lx * Ly * Lz * Lt
    if datatype == "4D_SU3_GAUGE":
        rows = 2
    elif datatype == "4D_SU3_GAUGE_3x3":
        rows = 3
    else:
        raise ValueError(f"{path}: unsupported DATATYPE {datatype}")

    n_real = vol * 4 * rows * 3 * 2
    raw = np.frombuffer(data, dtype=dt, count=n_real).astype(np.float64)
    cplx = raw[0::2] + 1j * raw[1::2]
    # file order: site (x fastest) -> mu -> row -> col
    u = cplx.reshape(Lt, Lz, Ly, Lx, 4, rows, 3)
    if rows == 2:
        u = _third_row(u)
    U = np.moveaxis(u, 4, 0)    # [4, T, Z, Y, X, 3, 3]

    # checksum validation (NERSC checksum: uint32 sum of all data words)
    if "CHECKSUM" in header:
        words = np.frombuffer(data[:raw.size * dt.itemsize], dtype=dt)
        u32 = words.astype(dt.newbyteorder("=")).view(
            np.uint32 if dt.itemsize == 4 else np.uint64)
        if dt.itemsize == 8:
            u32 = u32.view(np.uint32)
        chk = np.uint32(np.sum(u32, dtype=np.uint64) & 0xFFFFFFFF)
        want = int(header["CHECKSUM"], 16)
        if int(chk) != want:
            raise ValueError(
                f"{path}: checksum mismatch {int(chk):08x} != {want:08x}")
    return U, header


def write_nersc_gauge(path: str, U: np.ndarray, three_row: bool = True,
                      double: bool = False) -> None:
    """Write a NERSC archive config (for fixtures and interchange)."""
    U = np.asarray(U)
    _, T, Z, Y, X = U.shape[:5]
    u = np.moveaxis(U, 0, 4)       # [T,Z,Y,X,4,3,3]
    rows = 3 if three_row else 2
    body = u[..., :rows, :]
    flat = np.empty(body.size * 2, dtype=np.float64)
    flat[0::2] = body.reshape(-1).real
    flat[1::2] = body.reshape(-1).imag
    dt = np.dtype(">f8") if double else np.dtype(">f4")
    data = flat.astype(dt).tobytes()

    words = np.frombuffer(data, dtype=dt).astype(dt.newbyteorder("=")).view(
        np.uint32)
    chk = np.uint32(np.sum(words, dtype=np.uint64) & 0xFFFFFFFF)

    # plaquette/link trace headers (informational) — host numpy: complex
    # device arrays cannot exist on the TPU backend, and the write path
    # must work at multi-GB volumes without touching the chip
    from .. import fields
    plaq = float(fields.plaquette_np(U)[0])
    link_tr = float(np.mean(np.einsum("...ii->...", u).real) / 3.0)

    hdr = [
        "BEGIN_HEADER",
        "HDR_VERSION = 1.0",
        f"DATATYPE = {'4D_SU3_GAUGE_3x3' if three_row else '4D_SU3_GAUGE'}",
        f"DIMENSION_1 = {X}",
        f"DIMENSION_2 = {Y}",
        f"DIMENSION_3 = {Z}",
        f"DIMENSION_4 = {T}",
        f"CHECKSUM = {int(chk):x}",
        f"LINK_TRACE = {link_tr:.10f}",
        f"PLAQUETTE = {plaq:.10f}",
        "BOUNDARY_1 = PERIODIC",
        "BOUNDARY_2 = PERIODIC",
        "BOUNDARY_3 = PERIODIC",
        "BOUNDARY_4 = PERIODIC",
        "ENSEMBLE_ID = mugiq_tpu",
        "SEQUENCE_NUMBER = 0",
        f"FLOATING_POINT = {'IEEE64BIG' if double else 'IEEE32BIG'}",
        "END_HEADER",
        "",
    ]
    with open(path, "wb") as f:
        f.write("\n".join(hdr).encode("ascii"))
        f.write(data)


def load_gauge_np(spec: str, geom: LatticeGeometry, seed: int = 0) -> np.ndarray:
    """Pure-numpy gauge factory: 'unit' | 'random' | 'weak[:eps]' | a path.

    Used by the CLI so no complex device array is ever created (impossible
    on the TPU backend)."""
    from ..fields import _project_su3

    shape = (4, *geom.shape_tzyx, 3, 3)
    if spec == "unit":
        return np.broadcast_to(np.eye(3, dtype=np.complex128), shape).copy()
    if spec == "random":
        rng = np.random.default_rng(seed)
        m = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        return _project_su3(m)
    if spec.startswith("weak"):
        eps = float(spec.split(":")[1]) if ":" in spec else 0.1
        rng = np.random.default_rng(seed)
        a = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        h = 0.5 * (a + np.conj(np.swapaxes(a, -1, -2)))
        tr = np.einsum("...ii->...", h) / 3.0
        h = h - tr[..., None, None] * np.eye(3)
        w, v = np.linalg.eigh(h)
        return np.einsum("...ab,...b,...cb->...ac", v, np.exp(1j * eps * w),
                         np.conj(v))
    with open(spec, "rb") as f:
        magic = f.read(4)
    if magic == bytes.fromhex("456789ab"):
        from .lime_io import read_ildg_gauge
        U, _ = read_ildg_gauge(spec)
    else:
        U, _ = read_nersc_gauge(spec)
    dims = (U.shape[4], U.shape[3], U.shape[2], U.shape[1])
    if dims != geom.dims:
        raise ValueError(f"gauge file dims {dims} != requested {geom.dims}")
    return U


def load_gauge(spec: str, geom: LatticeGeometry, seed: int = 0, dtype=None):
    """Gauge factory for the CLI: 'unit' | 'random' | 'weak[:eps]' | a path."""
    import jax.numpy as jnp
    from .. import fields

    if spec == "unit":
        return fields.unit_gauge(geom, dtype=dtype)
    if spec == "random":
        return fields.random_gauge(geom, seed=seed, dtype=dtype)
    if spec.startswith("weak"):
        eps = float(spec.split(":")[1]) if ":" in spec else 0.1
        return fields.weak_gauge(geom, eps=eps, seed=seed, dtype=dtype)
    # file: sniff LIME magic vs NERSC header
    with open(spec, "rb") as f:
        magic = f.read(12)
    if magic[:4] == bytes.fromhex("456789ab"):
        from .lime_io import read_ildg_gauge
        U, _ = read_ildg_gauge(spec)
        dims = (U.shape[4], U.shape[3], U.shape[2], U.shape[1])
    else:
        U, header = read_nersc_gauge(spec)
        dims = tuple(int(header[f"DIMENSION_{i}"]) for i in (1, 2, 3, 4))
    if dims != geom.dims:
        raise ValueError(f"gauge file dims {dims} != requested {geom.dims}")
    from ..config import default_complex_dtype
    return jnp.asarray(U, dtype=dtype or default_complex_dtype())


# ---------------------------------------------------------------------------
# Eigenvector checkpoints (vec_infile/vec_outfile analog)
# ---------------------------------------------------------------------------

def save_evecs(path: str, evecs, evals, sigma=None, resids=None,
               attrs: Dict[str, str] = None) -> None:
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("evecs", data=np.asarray(evecs))
        f.create_dataset("evals", data=np.asarray(evals))
        if sigma is not None:
            f.create_dataset("sigma", data=np.asarray(sigma))
        if resids is not None:
            f.create_dataset("resids", data=np.asarray(resids))
        for k, v in (attrs or {}).items():
            f.attrs[k] = v


def load_evecs(path: str):
    import h5py

    with h5py.File(path, "r") as f:
        evecs = f["evecs"][:]
        evals = f["evals"][:]
        sigma = f["sigma"][:] if "sigma" in f else None
        resids = f["resids"][:] if "resids" in f else None
        attrs = dict(f.attrs)
    return evecs, evals, sigma, resids, attrs
