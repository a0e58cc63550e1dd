"""ctypes bindings for the native IO library (native/mugiq_io.cpp).

Provides the LIME/SciDAC record walker and fast byteswap / SU(3)
reconstruction / NERSC checksum used for multi-GB gauge configs.  The
library is built on demand with the repo Makefile; every entry point has a
numpy fallback so the pure-python path keeps working without a compiler.
"""

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import List, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = os.path.join(_NATIVE_DIR, "libmugiq_io.so")


@lru_cache(maxsize=1)
def _load():
    """Build (if needed) and load the native library; None if unavailable."""
    try:
        if not os.path.exists(_LIB):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB)
    except (OSError, subprocess.CalledProcessError):
        return None
    lib.mugiq_byteswap32.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mugiq_byteswap64.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mugiq_nersc_checksum32.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.mugiq_nersc_checksum32.restype = ctypes.c_uint32
    lib.mugiq_su3_reconstruct.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64]
    lib.mugiq_lime_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p]
    lib.mugiq_lime_scan.restype = ctypes.c_int
    lib.mugiq_read_at.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_void_p]
    lib.mugiq_read_at.restype = ctypes.c_int
    return lib


def native_available() -> bool:
    return _load() is not None


def nersc_checksum(data: bytes) -> int:
    """u32 sum of 32-bit words (native when available)."""
    lib = _load()
    n_words = len(data) // 4
    if lib is not None:
        buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
        return int(lib.mugiq_nersc_checksum32(buf, n_words))
    words = np.frombuffer(data[:n_words * 4], dtype="<u4")
    return int(np.sum(words, dtype=np.uint64) & 0xFFFFFFFF)


def su3_reconstruct(two_row: np.ndarray) -> np.ndarray:
    """[..., 2, 3] complex -> [..., 3, 3] complex via r3 = conj(r1 x r2)."""
    lib = _load()
    lead = two_row.shape[:-2]
    n_links = int(np.prod(lead)) if lead else 1
    if lib is not None:
        flat = np.ascontiguousarray(
            two_row.astype(np.complex128)).view(np.float64).reshape(n_links, 12)
        out = np.empty((n_links, 18), dtype=np.float64)
        lib.mugiq_su3_reconstruct(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_links)
        return out.view(np.complex128).reshape(lead + (3, 3))
    r1 = two_row[..., 0, :]
    r2 = two_row[..., 1, :]
    r3 = np.cross(r1, r2).conj()
    return np.concatenate([two_row, r3[..., None, :]], axis=-2)


def lime_records(path: str, max_records: int = 64) -> List[Tuple[str, int, int]]:
    """[(type, offset, length)] for each LIME record in the file."""
    lib = _load()
    if lib is not None:
        offs = (ctypes.c_int64 * max_records)()
        lens = (ctypes.c_int64 * max_records)()
        types = ctypes.create_string_buffer(128 * max_records)
        n = lib.mugiq_lime_scan(path.encode(), max_records, offs, lens, types)
        if n < 0:
            raise OSError(f"cannot scan LIME file {path}")
        out = []
        for i in range(n):
            t = types.raw[128 * i:128 * (i + 1)].split(b"\0")[0].decode(
                "ascii", "replace")
            out.append((t, int(offs[i]), int(lens[i])))
        return out
    # numpy/python fallback
    out = []
    with open(path, "rb") as f:
        pos = 0
        while True:
            hdr = f.read(144)
            if len(hdr) < 144:
                break
            if int.from_bytes(hdr[:4], "big") != 0x456789AB:
                break
            dlen = int.from_bytes(hdr[8:16], "big")
            t = hdr[16:144].split(b"\0")[0].decode("ascii", "replace")
            out.append((t, pos + 144, dlen))
            padded = (dlen + 7) & ~7
            pos += 144 + padded
            f.seek(pos)
    return out


def read_record(path: str, offset: int, length: int) -> bytes:
    lib = _load()
    if lib is not None:
        buf = ctypes.create_string_buffer(length)
        rc = lib.mugiq_read_at(path.encode(), offset, length, buf)
        if rc != 0:
            raise OSError(f"read_record({path}, {offset}, {length}) -> {rc}")
        return buf.raw
    with open(path, "rb") as f:
        f.seek(offset)
        return f.read(length)
