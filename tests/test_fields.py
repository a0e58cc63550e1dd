"""Gauge/spinor field fixtures and observables."""

import jax.numpy as jnp
import numpy as np

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry


def test_unit_gauge_plaquette(geom44):
    U = fields.unit_gauge(geom44)
    tot, sp, tm = fields.plaquette(U)
    assert abs(float(tot) - 1.0) < 1e-12
    assert abs(float(sp) - 1.0) < 1e-12
    assert abs(float(tm) - 1.0) < 1e-12


def test_random_gauge_su3(geom44):
    U = fields.random_gauge(geom44, seed=3)
    u = np.asarray(U)
    # unitarity
    prod = np.einsum("...ab,...cb->...ac", u, u.conj())
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-10)
    # det = 1
    np.testing.assert_allclose(np.linalg.det(u), 1.0, atol=1e-10)
    # plaquette of a random field is far from 1
    tot, _, _ = fields.plaquette(U)
    assert abs(float(tot)) < 0.5


def test_weak_gauge_su3(geom44):
    U = fields.weak_gauge(geom44, eps=0.05, seed=1)
    u = np.asarray(U)
    prod = np.einsum("...ab,...cb->...ac", u, u.conj())
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(u), 1.0, atol=1e-10)
    tot, _, _ = fields.plaquette(U)
    assert float(tot) > 0.9  # close to free field


def test_boundary_phase(geom44):
    U = fields.unit_gauge(geom44)
    Up = fields.apply_boundary_phase(U, antiperiodic_t=True)
    u = np.asarray(Up)
    # only t-links at t = Lt-1 flipped
    np.testing.assert_allclose(u[3, -1], -np.broadcast_to(np.eye(3), u[3, -1].shape))
    np.testing.assert_allclose(u[3, :-1], np.broadcast_to(np.eye(3), u[3, :-1].shape))
    np.testing.assert_allclose(u[:3], np.broadcast_to(np.eye(3), u[:3].shape))
    # plaquette unchanged by the phases
    tot, _, _ = fields.plaquette(Up)
    assert abs(float(tot) - 1.0) < 1e-12


def test_shift_roundtrip(geom44):
    psi = fields.random_spinor(geom44, seed=0)
    for mu in range(4):
        back = fields.shift(fields.shift(psi, mu, +1), mu, -1)
        np.testing.assert_allclose(np.asarray(back), np.asarray(psi))


def test_shift_semantics():
    """shift(psi, mu, +1)(x) == psi(x + mu_hat)."""
    geom = LatticeGeometry((4, 4, 4, 4))
    x, y, z, t = geom.coords
    vals = (x + 10 * y + 100 * z + 1000 * t).astype(np.complex128)
    f = jnp.asarray(vals)[..., None, None] * jnp.ones((4, 3))
    g = fields.shift(f, 0, +1)  # x-direction
    expect = np.roll(vals, -1, axis=3)
    np.testing.assert_allclose(np.asarray(g)[..., 0, 0], expect)
