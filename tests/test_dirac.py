"""Wilson / Wilson-clover operator: free-field plane waves, g5-hermiticity,
normal-operator structure."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.gamma import gamma_matrices
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac, WilsonDirac

KAPPA = 0.12


def _plane_wave(geom, p, w):
    """psi(x) = exp(i p.x) w, with p the physical momentum 4-vector."""
    x, y, z, t = geom.coords
    phase = np.exp(1j * (p[0] * x + p[1] * y + p[2] * z + p[3] * t))
    return jnp.asarray(phase[..., None, None] * w[None, None, None, None])


def _wilson_momentum_matrix(p, kappa):
    g = gamma_matrices()
    c = 1.0 - 2.0 * kappa * sum(np.cos(pi) for pi in p)
    s = 2.0j * kappa * sum(g[mu] * np.sin(p[mu]) for mu in range(4))
    return c * np.eye(4) + s


@pytest.mark.parametrize("antiperiodic", [False, True])
@pytest.mark.parametrize("mode", [(0, 0, 0, 0), (1, 0, 0, 0), (1, 2, 3, 1)])
def test_free_field_plane_wave(geom44, mode, antiperiodic):
    """M on a free-field plane wave equals the analytic momentum-space matrix.

    With antiperiodic time the allowed momenta are half-integer modes; the
    operator realises them via boundary-phased links."""
    geom = geom44
    gp = GaugeParam(dims=geom.dims, antiperiodic_t=antiperiodic)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.unit_gauge(geom)
    dirac = make_dirac(U, gp, ip)

    L = geom.dims
    p = [2 * np.pi * mode[i] / L[i] for i in range(4)]
    if antiperiodic:
        p[3] = 2 * np.pi * (mode[3] + 0.5) / L[3]

    rng = np.random.default_rng(5)
    w = rng.standard_normal((4, 3)) + 1j * rng.standard_normal((4, 3))
    psi = _plane_wave(geom, p, w)
    out = np.asarray(dirac.M(psi))

    mw = _wilson_momentum_matrix(p, KAPPA) @ w
    expect = np.asarray(_plane_wave(geom, p, mw))
    np.testing.assert_allclose(out, expect, atol=1e-12)


def test_g5_hermiticity_random_gauge(geom44):
    gp = GaugeParam(dims=geom44.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.random_gauge(geom44, seed=11)
    dirac = make_dirac(U, gp, ip)

    a = fields.random_spinor(geom44, seed=1)
    b = fields.random_spinor(geom44, seed=2)
    # <a, M b> == <Mdag a, b>
    lhs = complex(fields.inner(a, dirac.M(b)))
    rhs = complex(fields.inner(dirac.Mdag(a), b))
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)


def test_normal_ops_hermitian_psd(geom44):
    gp = GaugeParam(dims=geom44.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.random_gauge(geom44, seed=11)
    dirac = make_dirac(U, gp, ip)

    a = fields.random_spinor(geom44, seed=3)
    b = fields.random_spinor(geom44, seed=4)
    for op in (dirac.MdagM, dirac.MMdag):
        lhs = complex(fields.inner(a, op(b)))
        rhs = complex(fields.inner(op(a), b))
        assert abs(lhs - rhs) < 1e-10 * abs(lhs)
        q = complex(fields.inner(a, op(a)))
        assert abs(q.imag) < 1e-10 * abs(q.real)
        assert q.real > 0


def test_clover_free_field_reduces_to_wilson(geom44):
    gp = GaugeParam(dims=geom44.dims)
    ipw = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    ipc = InvertParam(dslash_type=DslashType.CLOVER_WILSON, kappa=KAPPA, csw=1.2)
    U = fields.unit_gauge(geom44)
    dw = make_dirac(U, gp, ipw)
    dc = make_dirac(U, gp, ipc)
    psi = fields.random_spinor(geom44, seed=6)
    np.testing.assert_allclose(np.asarray(dw.M(psi)), np.asarray(dc.M(psi)),
                               atol=1e-12)


def test_clover_g5_hermiticity(geom44):
    gp = GaugeParam(dims=geom44.dims)
    ip = InvertParam(dslash_type=DslashType.CLOVER_WILSON, kappa=KAPPA, csw=1.0)
    U = fields.random_gauge(geom44, seed=12)
    dirac = make_dirac(U, gp, ip)
    a = fields.random_spinor(geom44, seed=7)
    b = fields.random_spinor(geom44, seed=8)
    lhs = complex(fields.inner(a, dirac.M(b)))
    rhs = complex(fields.inner(dirac.Mdag(a), b))
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)


def test_anisotropic_free_field(geom44):
    """Anisotropic Wilson dispersion: M(p) = 1 - 2k(sum_i cos p_i / xi
    + cos p_t) + 2ik(sum_i g_i sin p_i / xi + g_t sin p_t); at p=0 the
    eigenvalue is 2*kappa*mass (the reference's kappa relation)."""
    xi = 2.5
    mass = 0.3
    gp = GaugeParam(dims=geom44.dims, antiperiodic_t=False, anisotropy=xi)
    ip = InvertParam(dslash_type=DslashType.WILSON, mass=mass, anisotropy=xi)
    U = fields.unit_gauge(geom44)
    dirac = make_dirac(U, gp, ip)

    g = gamma_matrices()
    L = geom44.dims
    for mode in ((0, 0, 0, 0), (1, 0, 2, 1)):
        p = [2 * np.pi * mode[i] / L[i] for i in range(4)]
        w = np.random.default_rng(3).standard_normal((4, 3)) + 0.5j
        psi = _plane_wave(geom44, p, w)
        out = np.asarray(dirac.M(psi))
        c = 1 - 2 * ip.kappa * (sum(np.cos(p[i]) / xi for i in range(3))
                                + np.cos(p[3]))
        s = 2j * ip.kappa * (sum(g[i] * np.sin(p[i]) / xi for i in range(3))
                             + g[3] * np.sin(p[3]))
        mw = (c * np.eye(4) + s) @ w
        expect = np.asarray(_plane_wave(geom44, p, mw))
        np.testing.assert_allclose(out, expect, atol=1e-12)
    # p=0 eigenvalue = 2*kappa*mass
    w0 = np.ones((4, 3))
    psi0 = _plane_wave(geom44, [0, 0, 0, 0], w0)
    out0 = np.asarray(dirac.M(psi0))
    np.testing.assert_allclose(out0, 2 * ip.kappa * mass * np.asarray(psi0),
                               atol=1e-12)


def test_gauge_covariance(geom44):
    """g(x)-rotated gauge field gives M' = G M G^dag with G site-diagonal."""
    gp = GaugeParam(dims=geom44.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = np.asarray(fields.random_gauge(geom44, seed=13))
    g = np.asarray(fields.random_gauge(geom44, seed=14))[0]  # one SU(3) per site
    # U'_mu(x) = g(x) U_mu(x) g(x+mu)^dag
    Up = np.empty_like(U)
    for mu in range(4):
        g_fwd = np.asarray(fields.shift(jnp.asarray(g), mu, +1))
        Up[mu] = np.einsum("...ab,...bc,...dc->...ad", g, U[mu], g_fwd.conj())
    d1 = make_dirac(jnp.asarray(U), gp, ip)
    d2 = make_dirac(jnp.asarray(Up), gp, ip)
    psi = fields.random_spinor(geom44, seed=9)
    gpsi = jnp.einsum("tzyxab,tzyxsb->tzyxsa", jnp.asarray(g), psi)
    lhs = np.asarray(d2.M(gpsi))
    rhs = np.asarray(jnp.einsum("tzyxab,tzyxsb->tzyxsa", jnp.asarray(g), d1.M(psi)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)
