"""ILDG/LIME gauge configuration IO.

The reference reads gauge fields through QUDA's QIO/LIME path
(MUGIQ_QIO / USE_QDPJIT deps, CMakeLists.txt:109-127).  This is the native
equivalent: LIME record structure parsed by native/mugiq_io.cpp (with a
python fallback), ILDG binary payload layout

    site-major (x fastest), per site: mu = x,y,z,t; 3x3 row-major complex,
    big-endian IEEE 64 (or 32) floats,

returned in the framework's [4, T, Z, Y, X, 3, 3] layout.  A writer is
provided for fixtures/interchange (records: ildg-format XML + binary data).
"""

import re
import struct
from typing import Dict, Tuple

import numpy as np

from ..lattice import LatticeGeometry
from .native import lime_records, read_record

_ILDG_FORMAT_XML = """<?xml version="1.0" encoding="UTF-8"?>
<ildgFormat xmlns="http://www.lqcd.org/ildg">
  <version>1.0</version>
  <field>su3gauge</field>
  <precision>{prec}</precision>
  <lx>{lx}</lx><ly>{ly}</ly><lz>{lz}</lz><lt>{lt}</lt>
</ildgFormat>"""


def _lime_header(msg_begin: bool, msg_end: bool, length: int,
                 rectype: str) -> bytes:
    magic = struct.pack(">I", 0x456789AB)
    version = struct.pack(">H", 1)
    bits = (0x8000 if msg_begin else 0) | (0x4000 if msg_end else 0)
    flags = struct.pack(">H", bits)
    dlen = struct.pack(">Q", length)
    t = rectype.encode("ascii")[:128]
    t = t + b"\0" * (128 - len(t))
    return magic + version + flags + dlen + t


def write_ildg_gauge(path: str, U: np.ndarray, double: bool = True) -> None:
    """Write [4, T, Z, Y, X, 3, 3] complex as an ILDG LIME file."""
    U = np.asarray(U)
    _, T, Z, Y, X = U.shape[:5]
    xml = _ILDG_FORMAT_XML.format(prec=64 if double else 32,
                                  lx=X, ly=Y, lz=Z, lt=T).encode()
    # payload: [T,Z,Y,X, mu, 3, 3] re/im big endian
    u = np.moveaxis(U, 0, 4)                       # [T,Z,Y,X,4,3,3]
    flat = np.empty(u.size * 2, dtype=np.float64)
    flat[0::2] = u.reshape(-1).real
    flat[1::2] = u.reshape(-1).imag
    payload = flat.astype(">f8" if double else ">f4").tobytes()

    with open(path, "wb") as f:
        for i, (rectype, data, begin, end) in enumerate([
                ("ildg-format", xml, True, False),
                ("ildg-binary-data", payload, False, True)]):
            f.write(_lime_header(begin, end, len(data), rectype))
            f.write(data)
            pad = (-len(data)) % 8
            f.write(b"\0" * pad)


def read_ildg_gauge(path: str) -> Tuple[np.ndarray, Dict[str, str]]:
    """Read an ILDG LIME gauge file -> (U [4,T,Z,Y,X,3,3], info)."""
    recs = lime_records(path)
    if not recs:
        raise ValueError(f"{path}: no LIME records found")
    fmt = next((r for r in recs if r[0] == "ildg-format"), None)
    data = next((r for r in recs if r[0] == "ildg-binary-data"), None)
    if data is None:
        raise ValueError(f"{path}: no ildg-binary-data record")

    dims = None
    prec = 64
    info: Dict[str, str] = {}
    if fmt is not None:
        xml = read_record(path, fmt[1], fmt[2]).decode("ascii", "replace")
        info["ildg-format"] = xml

        def grab(tag, default=None):
            m = re.search(rf"<{tag}>\s*(\d+)\s*</{tag}>", xml)
            return int(m.group(1)) if m else default

        lx, ly, lz, lt = (grab(t) for t in ("lx", "ly", "lz", "lt"))
        prec = grab("precision", 64)
        if None not in (lx, ly, lz, lt):
            dims = (lx, ly, lz, lt)

    raw = read_record(path, data[1], data[2])
    dt = np.dtype(">f8") if prec == 64 else np.dtype(">f4")
    vals = np.frombuffer(raw, dtype=dt).astype(np.float64)
    cplx = vals[0::2] + 1j * vals[1::2]
    if dims is None:
        raise ValueError(f"{path}: lattice dims not found in ildg-format")
    lx, ly, lz, lt = dims
    u = cplx.reshape(lt, lz, ly, lx, 4, 3, 3)
    return np.moveaxis(u, 4, 0), info
