"""Multi-chip production operator + eigensolve (8 virtual CPU devices).

The sharded Wilson(-clover) kernel operator must agree with the
single-device WilsonDiracKernel, and the kernel-layout Lanczos must return
the same spectrum when its Krylov basis is t-sharded over the mesh
(reference analog: QUDA eigensolve over the MPI process grid,
SURVEY.md §2.4 items 1-3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.planar.convert import spinor_to_planar, gauge_to_planar
import mugiq_tpu.pallas.dslash_kernel as dk
from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
from mugiq_tpu.parallel.shard_op import (ShardedWilsonKernel, krylov_sharding,
                                         spinor_sharding, gauge_sharding)
from mugiq_tpu.planar.lanczos import lanczos_hermitian_realpair

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices")]

GEOM = LatticeGeometry((8, 4, 4, 16))   # T=16 over 8 devices -> T_loc=2
Y = 4
KAPPA = 0.11


def _setup(seed=1, clover=False):
    U = fields.weak_gauge(GEOM, eps=0.3, seed=seed, dtype=jnp.complex64)
    psi = fields.random_spinor(GEOM, seed=seed + 10, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(U))
    A_blocks = None
    if clover:
        from mugiq_tpu.clover_np import clover_field_np, clover_chiral_blocks_np
        A = clover_field_np(np.asarray(U), kappa=KAPPA, csw=1.2)
        A_blocks = jnp.asarray(clover_chiral_blocks_np(A))
    return U_k, psi_k, A_blocks


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("t",))


def test_sharded_wilson_m_matches_single_device():
    U_k, psi_k, _ = _setup()
    single = WilsonDiracKernel(U_k=U_k, kappa=KAPPA, Y=Y)
    mesh = _mesh()
    op = ShardedWilsonKernel(mesh=mesh, U_k=jax.device_put(
        U_k, gauge_sharding(mesh)), kappa=KAPPA, Y=Y)
    psi_s = op.place(psi_k)
    for which in ("M", "Mdag", "MdagM"):
        ref = np.asarray(getattr(single, which)(psi_k))
        got = getattr(op, which)(psi_s)
        assert len(got.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-6)


def test_sharded_clover_m_matches_single_device():
    U_k, psi_k, A_blocks = _setup(seed=3, clover=True)
    single = WilsonDiracKernel(U_k=U_k, kappa=KAPPA, Y=Y, A_blocks=A_blocks)
    mesh = _mesh()
    A_sh = jax.device_put(A_blocks, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("t")))
    op = ShardedWilsonKernel(mesh=mesh, U_k=jax.device_put(
        U_k, gauge_sharding(mesh)), kappa=KAPPA, Y=Y, A_blocks=A_sh)
    psi_s = op.place(psi_k)
    ref = np.asarray(single.M(psi_k))
    np.testing.assert_allclose(np.asarray(op.M(psi_s)), ref, atol=2e-6)
    ref_d = np.asarray(single.Mdag(psi_k))
    np.testing.assert_allclose(np.asarray(op.Mdag(psi_s)), ref_d, atol=2e-6)


def test_sharded_production_pipeline_matches_unsharded(tmp_path):
    """compute_loop_production(mesh=...) — sharded operator + Krylov basis +
    measurement — reproduces the single-device production result."""
    from mugiq_tpu.params import (DslashType, EigParam, GaugeParam,
                                  InvertParam, LoopParam, EigOperator)
    from mugiq_tpu.production import compute_loop_production

    geom = LatticeGeometry((8, 4, 4, 8))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.115)
    ep = EigParam(n_ev=3, n_kr=16, tol=5e-5, max_restarts=300,
                  operator=EigOperator.MdagM)
    lp = LoopParam(momenta=[(0, 0, 0), (1, 0, 0)], do_mom_proj=True,
                   do_nonlocal=True, disp_entries=["+z:1"])
    U = np.asarray(fields.weak_gauge(geom, eps=0.2, seed=13))

    ref = compute_loop_production(U, gp, ip, ep, lp)
    assert ref.converged

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("t", "z"))
    got = compute_loop_production(U, gp, ip, ep, lp, mesh=mesh)
    assert got.converged
    np.testing.assert_allclose(np.sort(got.evals), np.sort(ref.evals),
                               rtol=1e-3)
    # sharded all-reduces reorder the f32 sums; after ~170 restarts the
    # subspace phases drift slightly -> compare with an absolute floor
    np.testing.assert_allclose(got.data_mom, ref.data_mom,
                               rtol=5e-3, atol=2e-3)


def test_sharded_lanczos_matches_single_device():
    # random gauge: spread spectrum (the weak-field one is too clustered
    # for f32 Lanczos to converge quickly)
    U = fields.random_gauge(GEOM, seed=5, dtype=jnp.complex64)
    psi = fields.random_spinor(GEOM, seed=15, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(U))
    single = WilsonDiracKernel(U_k=U_k, kappa=KAPPA, Y=Y)
    res_ref = lanczos_hermitian_realpair(
        single.MdagM, psi_k, n_ev=2, n_kr=24, re_im_axis=1, tol=1e-4,
        max_restarts=60)
    assert res_ref.converged

    mesh = _mesh()
    op = ShardedWilsonKernel(mesh=mesh, U_k=jax.device_put(
        U_k, gauge_sharding(mesh)), kappa=KAPPA, Y=Y)
    res_sh = lanczos_hermitian_realpair(
        op.MdagM, op.place(psi_k), n_ev=2, n_kr=24, re_im_axis=1, tol=1e-4,
        max_restarts=60, sharding=krylov_sharding(mesh))
    assert res_sh.converged
    assert len(res_sh.evecs.sharding.device_set) == 8
    np.testing.assert_allclose(res_sh.evals, res_ref.evals, rtol=2e-4)
    # eigenvectors define the same subspace: residuals under the
    # single-device operator are small
    for i in range(2):
        v = res_sh.evecs[i]
        w = np.asarray(single.MdagM(v))
        lam = res_sh.evals[i]
        r = np.linalg.norm(w - lam * np.asarray(v))
        assert r < 5e-3 * max(1.0, abs(lam))


def test_sharded_arnoldi_matches_unsharded():
    """Non-normal production eigensolve (Krylov-Schur Arnoldi on M) with the
    operator + basis sharded over the mesh reproduces the single-device
    spectrum."""
    from mugiq_tpu.params import (DslashType, EigParam, GaugeParam,
                                  InvertParam, EigOperator, Spectrum)
    from mugiq_tpu.production import compute_evecs_production

    geom = LatticeGeometry((8, 4, 4, 8))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.115)
    ep = EigParam(n_ev=2, n_kr=32, tol=5e-4, max_restarts=300,
                  operator=EigOperator.M, spectrum=Spectrum.SM)
    U = np.asarray(fields.weak_gauge(geom, eps=0.2, seed=21))

    res_ref, ev_ref, _, _ = compute_evecs_production(U, gp, ip, ep)
    assert res_ref.converged

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("t", "z"))
    res_sh, ev_sh, _, _ = compute_evecs_production(U, gp, ip, ep, mesh=mesh)
    assert res_sh.converged
    np.testing.assert_allclose(np.sort(ev_sh.real), np.sort(ev_ref.real),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.sort(np.abs(ev_sh.imag)),
                               np.sort(np.abs(ev_ref.imag)),
                               rtol=1e-3, atol=1e-5)
