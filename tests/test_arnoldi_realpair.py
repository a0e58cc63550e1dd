"""Real-pair Krylov-Schur Arnoldi vs the complex implementation / dense eig."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu.eig.arnoldi_realpair import arnoldi_krylov_schur_realpair
from mugiq_tpu.rc.cplx import to_rc, from_rc


@pytest.mark.parametrize("which", ["LM", "SR"])
def test_arnoldi_realpair_dense(which):
    n, n_ev, n_kr = 150, 6, 40
    rng = np.random.default_rng(17)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
    Ar = jnp.asarray(A.real)
    Ai = jnp.asarray(A.imag)

    def mv(v):   # rc [2, n]
        vr, vi = v[0], v[1]
        return jnp.stack([Ar @ vr - Ai @ vi, Ar @ vi + Ai @ vr])

    v0 = jnp.asarray(np.stack([rng.standard_normal(n),
                               rng.standard_normal(n)]))
    res = arnoldi_krylov_schur_realpair(mv, v0, n_ev, n_kr, re_im_axis=0,
                                        tol=1e-9, max_restarts=400,
                                        which=which)
    assert res.converged
    ref = np.linalg.eigvals(A)
    for lam in res.evals:
        assert np.min(np.abs(ref - lam)) < 1e-7
    for i in range(n_ev):
        v = np.asarray(res.evecs[i][0]) + 1j * np.asarray(res.evecs[i][1])
        assert np.linalg.norm(A @ v - res.evals[i] * v) < 1e-6


def test_arnoldi_realpair_dirac_M():
    """Non-normal Wilson M on rc fields (the production M/Mdag path)."""
    from mugiq_tpu import fields
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
    from mugiq_tpu.dirac import make_dirac, dense_matrix
    from mugiq_tpu.rc.dirac_rc import WilsonDiracRC

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.11)
    U = fields.weak_gauge(geom, eps=0.3, seed=41)
    dirac = make_dirac(U, gp, ip)
    rc = WilsonDiracRC.from_complex(dirac)

    v0 = to_rc(fields.random_spinor(geom, seed=1))
    res = arnoldi_krylov_schur_realpair(
        rc.M, v0, n_ev=4, n_kr=30, re_im_axis=v0.ndim - 1,
        tol=1e-8, max_restarts=400, which="SM")
    assert res.converged
    A = np.asarray(dense_matrix(dirac.M, dirac.field_shape, dirac.dtype))
    ref = np.linalg.eigvals(A)
    for lam in res.evals:
        assert np.min(np.abs(ref - lam)) < 1e-6
