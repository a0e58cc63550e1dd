"""Eigensolver: TRLM vs dense eigh, free-field analytics, Chebyshev accel,
and the computeEvals validation stage."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam, MassNormalization, Spectrum)
from mugiq_tpu.dirac import make_dirac
from mugiq_tpu.eig.lanczos import lanczos_hermitian, chebyshev_op
from mugiq_tpu.eig.eigsolve import Eigensolver


def _random_hermitian(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    return (a + a.conj().T) / 2.0


@pytest.mark.parametrize("which", ["SR", "LR"])
def test_lanczos_dense_matrix(which):
    n, n_ev, n_kr = 200, 8, 40
    H = _random_hermitian(n, seed=42)
    Hj = jnp.asarray(H)
    mv = lambda v: Hj @ v
    v0 = jnp.asarray(np.random.default_rng(1).standard_normal(n)
                     + 1j * np.random.default_rng(2).standard_normal(n))
    res = lanczos_hermitian(mv, v0, n_ev, n_kr, tol=1e-10, max_restarts=200,
                            which=which)
    assert res.converged
    ref = np.linalg.eigvalsh(H)
    expect = ref[:n_ev] if which == "SR" else ref[::-1][:n_ev]
    np.testing.assert_allclose(np.sort(res.evals), np.sort(expect), atol=1e-8)
    # Ritz vectors: residual check ||H v - theta v||
    for i in range(n_ev):
        v = np.asarray(res.evecs[i])
        r = H @ v - res.evals[i] * v
        assert np.linalg.norm(r) < 1e-7


def _free_field_mdagm_evals(geom, kappa, antiperiodic_t=True):
    """All plane-wave eigenvalues of MdagM (each 12-fold degenerate per p up
    to the spin pairing): (1-2k*sum cos p)^2 + 4k^2 sum sin^2 p."""
    L = geom.dims
    evs = []
    for nx in range(L[0]):
        for ny in range(L[1]):
            for nz in range(L[2]):
                for nt in range(L[3]):
                    p = [2 * np.pi * nx / L[0], 2 * np.pi * ny / L[1],
                         2 * np.pi * nz / L[2],
                         2 * np.pi * ((nt + 0.5) if antiperiodic_t else nt) / L[3]]
                    c = 1 - 2 * kappa * sum(np.cos(x) for x in p)
                    s2 = sum(np.sin(x) ** 2 for x in p)
                    evs.extend([c * c + 4 * kappa * kappa * s2] * 12)
    return np.sort(np.asarray(evs))


def test_free_field_eigensolve(geom44):
    kappa = 0.12
    gp = GaugeParam(dims=geom44.dims, antiperiodic_t=True)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=kappa)
    U = fields.unit_gauge(geom44)
    dirac = make_dirac(U, gp, ip)

    ep = EigParam(n_ev=8, n_kr=40, tol=1e-9, max_restarts=300,
                  spectrum=Spectrum.SR, operator=EigOperator.MdagM)
    solver = Eigensolver(dirac.MdagM, dirac.field_shape, dirac.dtype, ep, ip)
    out = solver.solve()
    assert out.converged
    # The free-field spectrum is highly degenerate (24-fold ground level);
    # single-vector Lanczos resolves eigenVALUES, not multiplicities (same
    # as QUDA's TRLM).  Check: every converged Ritz value lies in the
    # analytic spectrum, and the smallest one is the true ground level.
    analytic = np.unique(np.round(_free_field_mdagm_evals(geom44, kappa), 12))
    for lam in out.evals.real:
        assert np.min(np.abs(analytic - lam)) < 1e-8 * max(1.0, abs(lam))
    assert abs(np.min(out.evals.real) - analytic[0]) < 1e-8
    assert np.all(out.resids < 1e-6)
    np.testing.assert_allclose(out.sigma, np.sqrt(out.evals.real), rtol=1e-9)


def test_eigensolve_vs_dense(geom_small):
    """Non-degenerate weak-gauge spectrum: n_ev smallest eigenvalues match a
    dense eigendecomposition exactly, with multiplicity."""
    kappa = 0.13
    gp = GaugeParam(dims=geom_small.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=kappa)
    U = fields.weak_gauge(geom_small, eps=0.3, seed=9)
    dirac = make_dirac(U, gp, ip)

    from mugiq_tpu.dirac import dense_matrix
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, dirac.dtype))
    ref = np.linalg.eigvalsh((A + A.conj().T) / 2)

    ep = EigParam(n_ev=8, n_kr=48, tol=1e-10, max_restarts=500,
                  spectrum=Spectrum.SR, operator=EigOperator.MdagM)
    out = Eigensolver(dirac.MdagM, dirac.field_shape, dirac.dtype, ep, ip).solve()
    assert out.converged
    np.testing.assert_allclose(np.sort(out.evals.real), ref[:8], rtol=1e-8)


def test_chebyshev_acceleration(geom44):
    kappa = 0.12
    gp = GaugeParam(dims=geom44.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=kappa)
    U = fields.weak_gauge(geom44, eps=0.2, seed=5)
    dirac = make_dirac(U, gp, ip)

    base = EigParam(n_ev=6, n_kr=32, tol=1e-9, max_restarts=400,
                    spectrum=Spectrum.SR, operator=EigOperator.MdagM)
    out_plain = Eigensolver(dirac.MdagM, dirac.field_shape, dirac.dtype,
                            base, ip).solve()

    accel = EigParam(n_ev=6, n_kr=32, tol=1e-9, max_restarts=400,
                     spectrum=Spectrum.SR, operator=EigOperator.MdagM,
                     use_poly_acc=True, poly_deg=20, a_min=0.5, a_max=0.0)
    out_acc = Eigensolver(dirac.MdagM, dirac.field_shape, dirac.dtype,
                          accel, ip).solve()

    np.testing.assert_allclose(np.sort(out_acc.evals.real),
                               np.sort(out_plain.evals.real), rtol=1e-6)
    # acceleration must not be slower in restarts
    assert out_acc.n_restarts <= out_plain.n_restarts


def test_mass_normalization(geom44):
    """QUDA_MASS_NORMALIZATION rescales lambda by 0.25/kappa^2
    (lib/eigsolve_mugiq.cpp:302)."""
    kappa = 0.12
    gp = GaugeParam(dims=geom44.dims)
    U = fields.unit_gauge(geom44)
    ep = EigParam(n_ev=4, n_kr=24, tol=1e-9, max_restarts=200,
                  operator=EigOperator.MdagM)

    ip_k = InvertParam(dslash_type=DslashType.WILSON, kappa=kappa,
                       mass_normalization=MassNormalization.KAPPA)
    ip_m = InvertParam(dslash_type=DslashType.WILSON, kappa=kappa,
                       mass_normalization=MassNormalization.MASS)
    d = make_dirac(U, gp, ip_k)
    out_k = Eigensolver(d.MdagM, d.field_shape, d.dtype, ep, ip_k).solve()
    out_m = Eigensolver(d.MdagM, d.field_shape, d.dtype, ep, ip_m).solve()
    np.testing.assert_allclose(out_m.evals.real,
                               out_k.evals.real * 0.25 / kappa**2, rtol=1e-9)


def test_projector(geom44):
    """projectVector: out = sum_i v_i <v_i, in> (lib/eigsolve_mugiq.cpp:340-348)."""
    gp = GaugeParam(dims=geom44.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.unit_gauge(geom44)
    d = make_dirac(U, gp, ip)
    ep = EigParam(n_ev=4, n_kr=24, tol=1e-9, operator=EigOperator.MdagM)
    solver = Eigensolver(d.MdagM, d.field_shape, d.dtype, ep, ip)
    out = solver.solve()
    vec = fields.random_spinor(geom44, seed=3)
    proj = solver.project(out.evecs, vec)
    # projecting twice is idempotent
    proj2 = solver.project(out.evecs, proj)
    np.testing.assert_allclose(np.asarray(proj2), np.asarray(proj), atol=1e-10)
