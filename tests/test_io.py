"""Gauge IO (NERSC round trip) and eigenvector checkpoints."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.io.gauge_io import (read_nersc_gauge, write_nersc_gauge,
                                   load_gauge, save_evecs, load_evecs)


def test_nersc_roundtrip_3x3(tmp_path, geom44):
    U = np.asarray(fields.random_gauge(geom44, seed=1))
    path = str(tmp_path / "cfg.nersc")
    write_nersc_gauge(path, U, three_row=True, double=True)
    U2, hdr = read_nersc_gauge(path)
    np.testing.assert_allclose(U2, U, atol=1e-14)
    assert hdr["DATATYPE"] == "4D_SU3_GAUGE_3x3"
    assert int(hdr["DIMENSION_4"]) == 4


def test_nersc_roundtrip_two_row(tmp_path, geom44):
    U = np.asarray(fields.random_gauge(geom44, seed=2))
    path = str(tmp_path / "cfg2.nersc")
    write_nersc_gauge(path, U, three_row=False, double=True)
    U2, _ = read_nersc_gauge(path)
    # third row reconstructed from unitarity
    np.testing.assert_allclose(U2, U, atol=1e-12)


def test_nersc_single_precision(tmp_path, geom44):
    U = np.asarray(fields.random_gauge(geom44, seed=3))
    path = str(tmp_path / "cfg3.nersc")
    write_nersc_gauge(path, U, three_row=True, double=False)
    U2, _ = read_nersc_gauge(path)
    np.testing.assert_allclose(U2, U, atol=1e-6)


def test_nersc_checksum_detects_corruption(tmp_path, geom44):
    U = np.asarray(fields.random_gauge(geom44, seed=4))
    path = str(tmp_path / "cfg4.nersc")
    write_nersc_gauge(path, U)
    raw = bytearray(open(path, "rb").read())
    raw[-5] ^= 0xFF  # flip bits in the binary payload
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        read_nersc_gauge(path)


def test_load_gauge_factory(tmp_path, geom44):
    u = load_gauge("unit", geom44)
    np.testing.assert_allclose(np.asarray(u[0, 0, 0, 0, 0]), np.eye(3))
    w = load_gauge("weak:0.05", geom44)
    assert float(fields.plaquette(w)[0]) > 0.9
    U = np.asarray(fields.random_gauge(geom44, seed=5))
    path = str(tmp_path / "c.nersc")
    write_nersc_gauge(path, U, double=True)
    u3 = load_gauge(path, geom44)
    np.testing.assert_allclose(np.asarray(u3), U, atol=1e-13)


def test_evec_checkpoint_roundtrip(tmp_path, geom44):
    evecs = jnp.stack([fields.random_spinor(geom44, seed=s) for s in range(3)])
    evals = np.asarray([0.1 + 0j, 0.2 + 0j, 0.3 + 0j])
    sigma = np.sqrt(evals.real)
    path = str(tmp_path / "evecs.h5")
    save_evecs(path, evecs, evals, sigma=sigma, attrs={"kappa": "0.12"})
    e2, l2, s2, r2, attrs = load_evecs(path)
    np.testing.assert_allclose(e2, np.asarray(evecs))
    np.testing.assert_allclose(l2, evals)
    np.testing.assert_allclose(s2, sigma)
    assert r2 is None
    assert attrs["kappa"] == "0.12"
