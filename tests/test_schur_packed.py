"""Packed even-odd (half-volume) Schur operator vs the masked kernel one
(pallas interpret mode) and vs the dense even-subspace spectrum."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, EigOperator, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.planar.convert import spinor_to_planar, gauge_to_planar
import mugiq_tpu.pallas.dslash_kernel as dk
import mugiq_tpu.pallas.schur_kernel as sk

GEOM = LatticeGeometry((4, 4, 2, 4))     # X=4, Y=4, Z=2, T=4
Y = 4
KAPPA = 0.12


@pytest.fixture(scope="module")
def setup():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.weak_gauge(GEOM, eps=0.3, seed=11)
    dirac = make_dirac(U, gp, ip)
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    psi = fields.random_spinor(GEOM, seed=5, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    return dirac, U_k, psi_k


def test_pack_unpack_roundtrip(setup):
    _, U_k, psi_k = setup
    pe = sk.pack_parity(psi_k, Y, 0)
    po = sk.pack_parity(psi_k, Y, 1)
    assert pe.shape == (4, 24, 2, 4 * 2)
    full = sk.unpack_parities(pe, po, Y)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(psi_k))


def test_packed_matches_masked(setup):
    """Packed operator == masked SchurDiracKernel on the even sites
    (same arithmetic per site -> tight tolerance)."""
    from mugiq_tpu.pallas.dirac_kernel import SchurDiracKernel

    dirac, U_k, psi_k = setup
    pc_mask = SchurDiracKernel(U_k=U_k, kappa=KAPPA, Y=Y)
    pc_pack = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y)
    pe = pc_pack.pack_even(psi_k)

    for name in ("M", "Mdag", "MdagM", "MMdag"):
        ref = np.asarray(getattr(pc_mask, name)(psi_k))
        got = np.asarray(pc_pack.unpack_even(getattr(pc_pack, name)(pe)))
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=name)


def test_packed_operator_with_args(setup):
    dirac, U_k, psi_k = setup
    pc_pack = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y)
    pe = pc_pack.pack_even(psi_k)
    fn, args = pc_pack.operator_with_args(EigOperator.MdagM)
    ref = np.asarray(pc_pack.MdagM(pe))
    np.testing.assert_allclose(np.asarray(fn(pe, *args)), ref, atol=1e-6)


def test_packed_eigensolve_matches_dense_even_subspace(setup):
    """Lanczos on the PACKED MdagM finds the even-subspace spectrum of the
    complex SchurDirac (the packed layout removes the odd-site null space
    that poisons SR on the masked operator)."""
    from mugiq_tpu.schur import SchurDirac
    from mugiq_tpu.planar.lanczos import lanczos_hermitian_realpair

    dirac, U_k, psi_k = setup
    pc_c = SchurDirac.from_dirac(dirac)
    A = np.asarray(dense_matrix(pc_c.MdagM, dirac.field_shape,
                                jnp.complex128))
    par = np.asarray(GEOM.parity).reshape(-1)          # [T*Z*Y*X]
    even_idx = np.nonzero(np.repeat(par == 0, 12))[0]
    A_ee = A[np.ix_(even_idx, even_idx)]
    ref = np.linalg.eigvalsh((A_ee + A_ee.conj().T) / 2)[:3]

    pc_pack = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y)
    pe0 = pc_pack.pack_even(psi_k)
    fn, args = pc_pack.operator_with_args(EigOperator.MdagM)
    res = lanczos_hermitian_realpair(fn, pe0, n_ev=3, n_kr=16,
                                     re_im_axis=1, tol=5e-5,
                                     max_restarts=200, which="SR",
                                     matvec_args=args)
    assert res.converged
    np.testing.assert_allclose(np.sort(res.evals), ref, rtol=1e-3)


def test_packed_clover_matches_validation():
    """Packed clover pc (A_ee - k^2 D_eo A_oo^{-1} D_oe, in-kernel fused
    blocks) == the complex validation SchurDirac (asymmetric) on the even
    sites."""
    from mugiq_tpu.schur import SchurDirac
    from mugiq_tpu.clover_np import (clover_chiral_blocks_np,
                                     invert_chiral_blocks_np)

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.CLOVER_WILSON, kappa=KAPPA,
                     csw=1.1)
    U = fields.weak_gauge(GEOM, eps=0.3, seed=11)
    dirac = make_dirac(U, gp, ip)
    pc_ref = SchurDirac.from_dirac(dirac)              # asymmetric
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    A_blocks = clover_chiral_blocks_np(np.asarray(dirac.A))
    # block inverse sanity: A . A^{-1} = 1 per site/chirality
    Ainv_blocks = invert_chiral_blocks_np(A_blocks)
    Ac = A_blocks[:, :, :, :, 0] + 1j * A_blocks[:, :, :, :, 1]
    Ic = Ainv_blocks[:, :, :, :, 0] + 1j * Ainv_blocks[:, :, :, :, 1]
    prod = np.einsum("tckjzl,tcjmzl->tckmzl", Ac, Ic)
    eye = np.eye(6)[None, None, :, :, None, None]
    np.testing.assert_allclose(prod, np.broadcast_to(eye, prod.shape),
                               atol=1e-5)

    pc_pack = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y,
                                        A_blocks=jnp.asarray(A_blocks))
    psi = fields.random_spinor(GEOM, seed=5, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    pe = pc_pack.pack_even(psi_k)
    for name in ("M", "Mdag", "MdagM", "MMdag"):
        ref_c = getattr(pc_ref, name)(psi)
        ref_k = np.asarray(dk.to_kernel_spinor(spinor_to_planar(ref_c)))
        got = np.asarray(pc_pack.unpack_even(getattr(pc_pack, name)(pe)))
        np.testing.assert_allclose(got, ref_k, atol=2e-5, err_msg=name)

    # operand-threaded form agrees
    fn, args = pc_pack.operator_with_args(EigOperator.MdagM)
    np.testing.assert_allclose(np.asarray(fn(pe, *args)),
                               np.asarray(pc_pack.MdagM(pe)), atol=1e-6)


def test_production_pc_eigensolve_clover():
    """compute_evecs_production(even_odd=True) with CLOVER_WILSON matches
    the dense even-subspace spectrum of the asymmetric clover pc."""
    from mugiq_tpu.params import EigParam
    from mugiq_tpu.production import compute_evecs_production
    from mugiq_tpu.schur import SchurDirac

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.CLOVER_WILSON, kappa=KAPPA,
                     csw=1.1)
    U = fields.weak_gauge(GEOM, eps=0.3, seed=11)
    dirac = make_dirac(U, gp, ip)
    ep = EigParam(n_ev=3, n_kr=16, tol=5e-5, max_restarts=200,
                  operator=EigOperator.MdagM)
    res, evals, sigma, resids = compute_evecs_production(
        np.asarray(U), gp, ip, ep, even_odd=True)
    assert res.converged

    pc_c = SchurDirac.from_dirac(dirac)
    A = np.asarray(dense_matrix(pc_c.MdagM, dirac.field_shape,
                                jnp.complex128))
    par = np.asarray(GEOM.parity).reshape(-1)
    even_idx = np.nonzero(np.repeat(par == 0, 12))[0]
    A_ee = A[np.ix_(even_idx, even_idx)]
    ref = np.linalg.eigvalsh((A_ee + A_ee.conj().T) / 2)[:3]
    np.testing.assert_allclose(np.sort(evals), ref, rtol=1e-3)


def test_packed_bf16_links(setup):
    dirac, U_k, psi_k = setup
    pc32 = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y)
    pc16 = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y,
                                     precision="bf16")
    assert pc16.U_e.dtype == jnp.bfloat16
    pe = pc32.pack_even(psi_k)
    ref = np.asarray(pc32.M(pe))
    got = np.asarray(pc16.M(pe))
    assert got.dtype == np.float32
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 3e-2, err


def test_production_pc_eigensolve(setup):
    """compute_evecs_production(even_odd=True) — the pc_solve production
    path on packed fields — matches the dense even-subspace spectrum."""
    from mugiq_tpu.params import EigParam, GaugeParam, InvertParam, Spectrum
    from mugiq_tpu.production import compute_evecs_production
    from mugiq_tpu.schur import SchurDirac

    dirac, U_k, psi_k = setup
    gp = GaugeParam(dims=GEOM.dims, antiperiodic_t=False)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    ep = EigParam(n_ev=3, n_kr=16, tol=5e-5, max_restarts=200,
                  operator=EigOperator.MdagM)
    # dirac was built with default antiperiodic_t; reuse its links directly
    # by rebuilding from the raw complex gauge with the same BCs
    U = np.asarray(dirac.U)

    res, evals, sigma, resids = compute_evecs_production(
        U, gp, ip, ep, even_odd=True)
    assert res.converged

    pc_c = SchurDirac.from_dirac(dirac)
    A = np.asarray(dense_matrix(pc_c.MdagM, dirac.field_shape,
                                jnp.complex128))
    par = np.asarray(GEOM.parity).reshape(-1)
    even_idx = np.nonzero(np.repeat(par == 0, 12))[0]
    A_ee = A[np.ix_(even_idx, even_idx)]
    ref = np.linalg.eigvalsh((A_ee + A_ee.conj().T) / 2)[:3]
    np.testing.assert_allclose(np.sort(evals), ref, rtol=1e-3)
    assert max(resids) < 5e-4


def test_packed_gl_tiling_matches_fullwidth(setup):
    """Grouped-lane parity kernel (large-lattice tiling, by<Y) matches the
    full-width packed kernel exactly; clover variant included."""
    dirac, U_k, psi_k = setup
    pc = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y)
    pe = pc.pack_even(psi_k)
    ref = {n: np.asarray(getattr(pc, n)(pe)) for n in ("M", "Mdag")}

    pc_gl = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y)
    pc_gl.by = 2                  # force the gl tiling (NBy=2, L=2*Xh)
    for name in ("M", "Mdag"):
        got = np.asarray(getattr(pc_gl, name)(pe))
        np.testing.assert_allclose(got, ref[name], atol=1e-6, err_msg=name)


def test_packed_gl_tiling_clover(setup):
    from mugiq_tpu.clover_np import clover_field_np, clover_chiral_blocks_np

    dirac, U_k, psi_k = setup
    A = clover_field_np(np.asarray(dirac.U), KAPPA, 1.0)
    A_blocks = jnp.asarray(clover_chiral_blocks_np(A)).reshape(
        GEOM.dims[3], 2, 6, 6, 2, GEOM.dims[2], GEOM.dims[1] * GEOM.dims[0])
    pc = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y,
                                   A_blocks=A_blocks)
    pe = pc.pack_even(psi_k)
    ref = np.asarray(pc.M(pe))

    pc_gl = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y,
                                      A_blocks=A_blocks)
    pc_gl.by = 2
    got = np.asarray(pc_gl.M(pe))
    np.testing.assert_allclose(got, ref, atol=1e-6)
