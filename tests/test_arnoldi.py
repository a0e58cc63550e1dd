"""Krylov-Schur Arnoldi: dense non-Hermitian matrix vs numpy.eig, and the
non-normal Dirac M operator path through the Eigensolver."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam, Spectrum)
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.eig.arnoldi import arnoldi_krylov_schur
from mugiq_tpu.eig.eigsolve import Eigensolver


def _key(evals, which):
    return {"SR": evals.real, "LR": -evals.real,
            "SM": np.abs(evals), "LM": -np.abs(evals)}[which]


@pytest.mark.parametrize("which", ["LM", "SR", "LR"])
def test_arnoldi_dense(which):
    """Exterior spectrum selections on a random dense matrix.  (SM of a
    Ginibre-like matrix targets the deep interior of the spectral disk —
    not convergable by restarted Arnoldi without shift-invert, same as
    ARPACK; the Dirac test below covers SM where it is boundary-extremal.)"""
    n, n_ev, n_kr = 150, 6, 40
    rng = np.random.default_rng(17)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = A / np.sqrt(n)
    Aj = jnp.asarray(A)
    v0 = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))

    res = arnoldi_krylov_schur(lambda v: Aj @ v, v0, n_ev, n_kr, tol=1e-9,
                               max_restarts=400, which=which)
    assert res.converged

    ref = np.linalg.eigvals(A)
    ref_sel = ref[np.argsort(_key(ref, which), kind="stable")][:n_ev]
    got = res.evals
    # compare as unordered sets of complex numbers
    for lam in got:
        assert np.min(np.abs(ref - lam)) < 1e-7
    np.testing.assert_allclose(np.sort(_key(got, which)),
                               np.sort(_key(ref_sel, which)), atol=1e-7)
    # Ritz residuals
    for i in range(n_ev):
        v = np.asarray(res.evecs[i])
        assert np.linalg.norm(A @ v - got[i] * v) < 1e-7


def test_dirac_M_eigensolve():
    """Non-normal Wilson M through the Eigensolver (the MUGIQ_EIG_OPERATOR_M
    path the reference serves via QUDA Arnoldi)."""
    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.11)
    U = fields.weak_gauge(geom, eps=0.3, seed=41)
    dirac = make_dirac(U, gp, ip)

    ep = EigParam(n_ev=6, n_kr=36, tol=1e-8, max_restarts=400,
                  operator=EigOperator.M, spectrum=Spectrum.SM)
    out = Eigensolver(dirac.M, dirac.field_shape, dirac.dtype, ep, ip).solve()
    assert out.converged
    assert out.sigma is None

    A = np.asarray(dense_matrix(dirac.M, dirac.field_shape, dirac.dtype))
    ref = np.linalg.eigvals(A)
    for lam in out.evals:
        assert np.min(np.abs(ref - lam)) < 1e-6
    # the smallest-modulus end is found
    assert abs(np.min(np.abs(out.evals)) - np.min(np.abs(ref))) < 1e-6


def test_poly_acc_rejected_for_non_normal():
    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(kappa=0.11)
    U = fields.unit_gauge(geom)
    dirac = make_dirac(U, gp, ip)
    ep = EigParam(n_ev=2, n_kr=12, operator=EigOperator.M, use_poly_acc=True,
                  poly_deg=10, a_min=0.1)
    with pytest.raises(ValueError, match="acceleration"):
        Eigensolver(dirac.M, dirac.field_shape, dirac.dtype, ep, ip)
