"""Multigrid: transfer orthonormality, the Galerkin identity R A P == A_c
(the make-or-break test), recursive levels, coarse g5-hermiticity, and the
MG-deflated eigensolve path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam, MGParam, Spectrum)
from mugiq_tpu.dirac import make_dirac
from mugiq_tpu.mg.transfer import Transfer, block_edge_mask, BlockGeometry
from mugiq_tpu.mg.coarse import galerkin_coarse_operator
from mugiq_tpu.mg.setup import setup_null_vectors
from mugiq_tpu.mg.mg import MGEnv

KAPPA = 0.125
NVEC = 4
BLOCK = (2, 2, 2, 2)


@pytest.fixture(scope="module")
def dirac44():
    geom = LatticeGeometry((4, 4, 4, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.weak_gauge(geom, eps=0.3, seed=2)
    return make_dirac(U, gp, ip)


@pytest.fixture(scope="module")
def transfer44(dirac44):
    B = setup_null_vectors(dirac44.MdagM, dirac44.field_shape, dirac44.dtype,
                           NVEC, iters=20, seed=3)
    return Transfer.build(B, BLOCK, spin_block=2)


def _rand_coarse(tr, seed=0):
    rng = np.random.default_rng(seed)
    shape = tr.coarse_field_shape
    return jnp.asarray(rng.standard_normal(shape)
                       + 1j * rng.standard_normal(shape))


def test_transfer_orthonormality(transfer44):
    """R P = identity on the coarse space (block orthonormal basis)."""
    phi = _rand_coarse(transfer44, 1)
    rt = transfer44.restrict(transfer44.prolong(phi))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(phi), atol=1e-11)


def test_prolong_restrict_adjoint(transfer44, dirac44):
    """<P phi, psi>_fine == <phi, R psi>_coarse."""
    phi = _rand_coarse(transfer44, 2)
    psi = fields.random_spinor(LatticeGeometry((4, 4, 4, 4)), seed=5)
    lhs = complex(jnp.vdot(transfer44.prolong(phi), psi))
    rhs = complex(jnp.vdot(phi, transfer44.restrict(psi)))
    assert abs(lhs - rhs) < 1e-11 * abs(lhs)


def test_chiral_aggregation(transfer44):
    """Coarse spin 0 prolongs into fine spins {0,1} only (chirality preserved:
    the spin_block=2 aggregation of the DeGrand-Rossi g5 = diag(1,1,-1,-1))."""
    phi = _rand_coarse(transfer44, 3)
    phi = phi.at[..., 1, :].set(0.0)
    fine = np.asarray(transfer44.prolong(phi))
    assert np.abs(fine[..., 2:, :]).max() < 1e-14
    assert np.abs(fine[..., :2, :]).max() > 0


def test_block_edge_mask():
    g = BlockGeometry(fine_dims=(4, 4, 4, 4), block=(2, 2, 2, 2),
                      ns_fine=4, nc_fine=3, spin_block=2)
    m = np.asarray(block_edge_mask(g, 0, +1))  # +x face
    assert m.shape == (g.agg,)
    # half the block sites are on the +x face for bx=2
    assert m.sum() == g.agg / 2


def test_galerkin_identity(dirac44, transfer44):
    """The materialised coarse operator equals R M P exactly."""
    coarse = galerkin_coarse_operator(dirac44, transfer44)
    phi = _rand_coarse(transfer44, 4)
    lhs = np.asarray(coarse.M(phi))
    rhs = np.asarray(transfer44.restrict(dirac44.M(transfer44.prolong(phi))))
    np.testing.assert_allclose(lhs, rhs, atol=1e-11)


def test_coarse_dagger(dirac44, transfer44):
    coarse = galerkin_coarse_operator(dirac44, transfer44)
    a = _rand_coarse(transfer44, 5)
    b = _rand_coarse(transfer44, 6)
    lhs = complex(jnp.vdot(a, coarse.M(b)))
    rhs = complex(jnp.vdot(coarse.Mdag(a), b))
    assert abs(lhs - rhs) < 1e-11 * abs(lhs)


def test_coarse_g5_hermiticity(dirac44, transfer44):
    """Coarse g5 = diag(+1, -1) on the two chiral coarse spins:
    g5c Mc g5c == Mc^dag (inherited from fine g5-hermiticity through the
    chirality-preserving transfer)."""
    coarse = galerkin_coarse_operator(dirac44, transfer44)
    phi = _rand_coarse(transfer44, 7)
    s = jnp.asarray([1.0, -1.0]).reshape(1, 1, 1, 1, 2, 1)
    lhs = np.asarray(s * coarse.M(s * phi))
    rhs = np.asarray(coarse.Mdag(phi))
    np.testing.assert_allclose(lhs, rhs, atol=1e-11)


def test_three_level_galerkin(dirac44, transfer44):
    """Second coarsening: Galerkin identity at the coarsest level."""
    coarse1 = galerkin_coarse_operator(dirac44, transfer44)
    B2 = setup_null_vectors(coarse1.MdagM, coarse1.field_shape, coarse1.dtype,
                            3, iters=15, seed=11)
    tr2 = Transfer.build(B2, (2, 2, 2, 2), spin_block=1)
    coarse2 = galerkin_coarse_operator(coarse1, tr2)
    phi = jnp.asarray(np.random.default_rng(8).standard_normal(
        tr2.coarse_field_shape) + 0.3j)
    lhs = np.asarray(coarse2.M(phi))
    rhs = np.asarray(tr2.restrict(coarse1.M(tr2.prolong(phi))))
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_mg_env_and_deflated_eigensolve(dirac44):
    """MGEnv end-to-end: coarse eigensolve finds the low modes of the coarse
    operator; prolongated evecs live on the fine lattice."""
    mg = MGEnv.build(dirac44, MGParam(
        n_level=2, geo_block_size=[BLOCK], n_vec=[NVEC], setup_iters=20))
    coarse = mg.coarsest_op
    assert coarse.field_shape == (2, 2, 2, 2, 2, NVEC)

    from mugiq_tpu.eig.eigsolve import Eigensolver
    ep = EigParam(n_ev=4, n_kr=20, tol=1e-9, operator=EigOperator.MdagM,
                  spectrum=Spectrum.SR)
    out = Eigensolver(coarse.MdagM, coarse.field_shape, coarse.dtype, ep).solve()
    assert out.converged

    # cross-check vs dense eigendecomposition of the coarse normal op
    from mugiq_tpu.dirac import dense_matrix
    A = np.asarray(dense_matrix(coarse.MdagM, coarse.field_shape, coarse.dtype))
    ref = np.linalg.eigvalsh((A + A.conj().T) / 2)
    np.testing.assert_allclose(np.sort(out.evals.real), ref[:4], rtol=1e-7)

    fine = mg.prolongate_batch(out.evecs)
    assert fine.shape == (4,) + dirac44.field_shape
    # prolongation preserves norms (orthonormal transfer)
    for i in range(4):
        n = float(jnp.linalg.norm(fine[i].reshape(-1)))
        assert abs(n - 1.0) < 1e-8
