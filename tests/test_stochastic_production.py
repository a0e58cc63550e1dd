"""Production stochastic probing vs dense references (interpret-mode pallas)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.planar.convert import spinor_to_planar, gauge_to_planar
import mugiq_tpu.pallas.dslash_kernel as dk
from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
from mugiq_tpu.stochastic_production import (DeflationSpaceKernel,
                                             stochastic_loop_trace_production,
                                             z4_noise_kernel_np)

GEOM = LatticeGeometry((4, 4, 2, 4))
KAPPA = 0.10


@pytest.fixture(scope="module")
def setup():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.weak_gauge(GEOM, eps=0.3, seed=31)
    dirac = make_dirac(U, gp, ip)
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    op = WilsonDiracKernel(U_k=U_k, kappa=KAPPA, Y=GEOM.Ly)
    return dirac, op


def _exact_trace(dirac):
    from mugiq_tpu.gamma import gamma_basis
    n = GEOM.volume * 12
    A = np.asarray(dense_matrix(dirac.M, dirac.field_shape, jnp.complex128))
    Ainv = np.linalg.inv(A)
    blocks = Ainv.reshape(n // 12, 12, n // 12, 12)
    diag = np.einsum("iaib->iab", blocks).reshape(GEOM.shape_tzyx + (4, 3, 4, 3))
    return np.einsum("gab,tzyxbcac->gtzyx", gamma_basis(), diag)


def test_z4_kernel_noise():
    eta = z4_noise_kernel_np(GEOM.dims, seed=0)
    assert eta.shape == (4, 24, 2, 16)
    mod2 = eta[:, :12] ** 2 + eta[:, 12:] ** 2
    np.testing.assert_allclose(mod2, 1.0, atol=1e-7)


def test_full_deflation_exact(setup):
    dirac, op = setup
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, jnp.complex128))
    evals, evecs = np.linalg.eigh((A + A.conj().T) / 2)
    vecs_c = evecs.T.reshape((-1,) + dirac.field_shape)
    vecs_k = jnp.stack([dk.to_kernel_spinor(spinor_to_planar(jnp.asarray(v)))
                        for v in vecs_c])
    ds = DeflationSpaceKernel.build(op, vecs_k, evals)
    got_p = np.asarray(ds.trace_contribution_planar(GEOM.Ly))
    got = got_p[0] + 1j * got_p[1]
    expect = _exact_trace(dirac)
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_estimator_converges(setup):
    dirac, op = setup
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, jnp.complex128))
    evals, evecs = np.linalg.eigh((A + A.conj().T) / 2)
    n_defl = 24
    vecs_k = jnp.stack([
        dk.to_kernel_spinor(spinor_to_planar(jnp.asarray(
            evecs[:, i].reshape(dirac.field_shape))))
        for i in range(n_defl)])
    ds = DeflationSpaceKernel.build(op, vecs_k, evals[:n_defl])

    # interpret-mode pallas makes each CG iteration expensive: few noise
    # vectors, loose tolerance (hardware runs use 10-100x more)
    est_p = np.asarray(stochastic_loop_trace_production(
        op, GEOM, n_noise=4, deflation=ds, solver_tol=1e-3,
        solver_maxiter=150, seed=5))
    est = est_p[0] + 1j * est_p[1]
    expect = _exact_trace(dirac)
    got_tr = est[0].sum()
    exact_tr = expect[0].sum()
    assert abs(got_tr - exact_tr) / abs(exact_tr) < 0.2


def test_stochastic_trace_sharded_matches_single():
    """stochastic_loop_trace_production with the ShardedWilsonKernel on an
    8-device mesh reproduces the single-device estimate bit-for-... well,
    f32-for-f32 (same noise; only reduction order differs)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from mugiq_tpu.parallel.shard_op import ShardedWilsonKernel

    geom = LatticeGeometry((8, 4, 4, 8))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.weak_gauge(geom, eps=0.3, seed=33)
    dirac = make_dirac(U, gp, ip)
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    op1 = WilsonDiracKernel(U_k=jnp.asarray(U_k, jnp.float32), kappa=KAPPA,
                            Y=geom.Ly)
    ref = np.asarray(stochastic_loop_trace_production(
        op1, geom, n_noise=2, solver_tol=1e-5, solver_maxiter=500, seed=5))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("t", "z"))
    op8 = ShardedWilsonKernel.from_kernel_op(mesh, op1)
    got = np.asarray(stochastic_loop_trace_production(
        op8, geom, n_noise=2, solver_tol=1e-5, solver_maxiter=500, seed=5))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
