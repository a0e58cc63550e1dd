"""Covariant displacement: unit-gauge shift semantics, gauge covariance,
+/- roundtrip, and the entry-string grammar."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.displace import covariant_displace, parse_disp_str
from mugiq_tpu.params import parse_disp_entry, parse_disp_entry_string


def test_parse_disp_str():
    assert parse_disp_str("+x") == (0, 1)
    assert parse_disp_str("-t") == (3, -1)
    with pytest.raises(ValueError):
        parse_disp_str("q")


def test_parse_disp_entry():
    assert parse_disp_entry("+z:1,8") == ("+z", 1, 8)
    assert parse_disp_entry("-x:3") == ("-x", 3, 3)
    # start/stop swap sanitisation (loop_mugiq.h:234-239)
    assert parse_disp_entry("+y:5,2") == ("+y", 2, 5)
    assert parse_disp_entry_string("+z:1,8;-x:3") == [("+z", 1, 8), ("-x", 3, 3)]
    with pytest.raises(ValueError):
        parse_disp_entry("+z")


def test_unit_gauge_displacement_is_shift(geom44):
    U = fields.unit_gauge(geom44)
    psi = fields.random_spinor(geom44, seed=0)
    # +x: psi'(x) = psi(x + x_hat)
    out = covariant_displace(U, psi, "+x")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(fields.shift(psi, 0, +1)), atol=1e-14)
    out = covariant_displace(U, psi, "-t")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(fields.shift(psi, 3, -1)), atol=1e-14)


def test_plus_minus_roundtrip(geom44):
    """'-d' displacement undoes '+d': U^dag(x-d) U(x-d) psi(x) = psi(x)."""
    U = fields.random_gauge(geom44, seed=4)
    psi = fields.random_spinor(geom44, seed=1)
    for d in ("x", "y", "z", "t"):
        disp = covariant_displace(U, psi, "+" + d)
        back = covariant_displace(U, disp, "-" + d)
        np.testing.assert_allclose(np.asarray(back), np.asarray(psi), atol=1e-12)


def test_gauge_covariance(geom44):
    """Displacement commutes with gauge rotation: D'[g(x)psi] = g(x) D[psi]."""
    U = np.asarray(fields.random_gauge(geom44, seed=5))
    g = np.asarray(fields.random_gauge(geom44, seed=6))[1]
    Up = np.empty_like(U)
    for mu in range(4):
        g_fwd = np.asarray(fields.shift(jnp.asarray(g), mu, +1))
        Up[mu] = np.einsum("...ab,...bc,...dc->...ad", g, U[mu], g_fwd.conj())
    psi = fields.random_spinor(geom44, seed=2)
    gpsi = jnp.einsum("tzyxab,tzyxsb->tzyxsa", jnp.asarray(g), psi)
    for ds in ("+y", "-z"):
        lhs = covariant_displace(jnp.asarray(Up), gpsi, ds)
        rhs = jnp.einsum("tzyxab,tzyxsb->tzyxsa", jnp.asarray(g),
                         covariant_displace(jnp.asarray(U), psi, ds))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-11)


def test_batched_displacement(geom44):
    """Leading eigenvector batch axis is supported."""
    U = fields.random_gauge(geom44, seed=7)
    psis = jnp.stack([fields.random_spinor(geom44, seed=s) for s in range(3)])
    out = covariant_displace(U, psis, "+z")
    for i in range(3):
        single = covariant_displace(U, psis[i], "+z")
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single),
                                   atol=1e-13)
