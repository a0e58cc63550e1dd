"""Even-odd preconditioned operator: Schur-solve consistency with the full
operator, hermiticity structure, and the pc eigensolve path."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam)
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.schur import SchurDirac

KAPPA = 0.11


@pytest.fixture(scope="module", params=["wilson", "clover"])
def dirac(request):
    geom = LatticeGeometry((4, 4, 4, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(
        dslash_type=(DslashType.CLOVER_WILSON if request.param == "clover"
                     else DslashType.WILSON),
        kappa=KAPPA, csw=1.0)
    U = fields.weak_gauge(geom, eps=0.3, seed=21)
    return make_dirac(U, gp, ip)


def test_pc_preserves_even_subspace(dirac):
    pc = SchurDirac.from_dirac(dirac)
    psi = fields.random_spinor(LatticeGeometry((4, 4, 4, 4)), seed=1)
    out = np.asarray(pc.M(psi))
    odd = np.asarray(pc.odd)
    assert np.abs(out * odd).max() < 1e-14


@pytest.mark.parametrize("symmetric", [False, True])
def test_schur_solve_matches_dense_full_solve(dirac, symmetric):
    """x from the Schur-complement solve equals the dense full-operator solve."""
    geom = LatticeGeometry((4, 4, 4, 4))
    pc = SchurDirac.from_dirac(dirac, symmetric=symmetric)
    b = fields.random_spinor(geom, seed=2)

    A = np.asarray(dense_matrix(dirac.M, dirac.field_shape, dirac.dtype))
    x_dense = np.linalg.solve(A, np.asarray(b).reshape(-1))

    x = pc.solve_full(dirac, b, tol=1e-12, maxiter=4000)
    np.testing.assert_allclose(np.asarray(x).reshape(-1), x_dense,
                               atol=1e-7, rtol=1e-7)


def test_pc_dagger_adjointness(dirac):
    for symmetric in (False, True):
        pc = SchurDirac.from_dirac(dirac, symmetric=symmetric)
        geom = LatticeGeometry((4, 4, 4, 4))
        a = pc.even * fields.random_spinor(geom, seed=3)
        b = pc.even * fields.random_spinor(geom, seed=4)
        lhs = complex(jnp.vdot(a, pc.M(b)))
        rhs = complex(jnp.vdot(pc.Mdag(a), b))
        assert abs(lhs - rhs) < 1e-10 * abs(lhs), f"symmetric={symmetric}"


def test_pc_eigensolve(dirac):
    """Lanczos on the pc normal operator converges within the even subspace."""
    from mugiq_tpu.eig.eigsolve import Eigensolver

    pc = SchurDirac.from_dirac(dirac)
    ep = EigParam(n_ev=4, n_kr=24, tol=1e-9, operator=EigOperator.MdagM)
    # start vector projected into the even subspace (its complement is a
    # null space of the masked pc operator)
    solver = Eigensolver(pc.MdagM, pc.field_shape, pc.dtype, ep,
                         v0_transform=pc.project_even)
    out = solver.solve()
    assert out.converged
    # genuine even-subspace eigenpairs, not the odd-complement null space
    assert np.all(out.evals.real > 1e-3)
    for i in range(4):
        v = np.asarray(out.evecs[i])
        assert np.abs(v * np.asarray(pc.odd)).max() < 1e-10
        res = np.asarray(pc.MdagM(out.evecs[i])) - out.evals[i].real * v
        assert np.linalg.norm(res) < 1e-6
