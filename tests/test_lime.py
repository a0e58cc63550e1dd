"""Native IO: LIME/ILDG round trip, native vs fallback equivalence."""

import numpy as np
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.io.native import (native_available, nersc_checksum,
                                 su3_reconstruct, lime_records, read_record)
from mugiq_tpu.io.lime_io import write_ildg_gauge, read_ildg_gauge
from mugiq_tpu.io.gauge_io import load_gauge


@pytest.fixture(scope="module")
def geom():
    return LatticeGeometry((4, 4, 2, 4))


def test_ildg_roundtrip(tmp_path, geom):
    U = np.asarray(fields.random_gauge(geom, seed=2))
    path = str(tmp_path / "cfg.lime")
    write_ildg_gauge(path, U, double=True)
    U2, info = read_ildg_gauge(path)
    np.testing.assert_allclose(U2, U, atol=0)
    assert "su3gauge" in info["ildg-format"]


def test_lime_record_structure(tmp_path, geom):
    U = np.asarray(fields.random_gauge(geom, seed=3))
    path = str(tmp_path / "cfg2.lime")
    write_ildg_gauge(path, U)
    recs = lime_records(path)
    assert [r[0] for r in recs] == ["ildg-format", "ildg-binary-data"]
    # payload length: V * 4 mu * 9 * 2 reals * 8 bytes
    assert recs[1][2] == geom.volume * 4 * 9 * 2 * 8
    raw = read_record(path, recs[0][1], recs[0][2])
    assert raw.startswith(b"<?xml")


def test_su3_reconstruct(geom):
    U = np.asarray(fields.random_gauge(geom, seed=4))
    got = su3_reconstruct(U[..., :2, :])
    np.testing.assert_allclose(got, U, atol=1e-13)


def test_checksum_fallback_equivalence():
    data = bytes(range(256)) * 33
    native = nersc_checksum(data)
    words = np.frombuffer(data[:len(data) // 4 * 4], dtype="<u4")
    ref = int(np.sum(words, dtype=np.uint64) & 0xFFFFFFFF)
    assert native == ref


def test_load_gauge_ildg(tmp_path, geom):
    U = np.asarray(fields.random_gauge(geom, seed=5))
    path = str(tmp_path / "cfg3.lime")
    write_ildg_gauge(path, U)
    got = load_gauge(path, geom)
    np.testing.assert_allclose(np.asarray(got), U, atol=1e-14)
