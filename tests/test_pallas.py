"""Pallas kernel (interpret mode on CPU): dslash, kernel-layout operator,
and the kernel-layout production eigensolve."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.planar.convert import (spinor_to_planar, spinor_from_planar,
                                      gauge_to_planar)
import mugiq_tpu.pallas.dslash_kernel as dk
from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
from mugiq_tpu.planar.lanczos import lanczos_hermitian_realpair

GEOM = LatticeGeometry((8, 4, 4, 8))   # X=8, Y=4 -> YX=32
Y = 4


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run all pallas_call in interpreter mode (CPU backend)."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(dk.pl, "pallas_call", interp)


@pytest.fixture(scope="module")
def dirac():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.random_gauge(GEOM, seed=1, dtype=jnp.complex64)
    return make_dirac(U, gp, ip)


def _kernel_fields(dirac, seed=0):
    psi = fields.random_spinor(GEOM, seed=seed, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    return psi, psi_k, U_k


def test_pallas_dslash_matches_complex(dirac):
    from mugiq_tpu.ops.dslash import dslash_hop
    psi, psi_k, U_k = _kernel_fields(dirac)
    ref = np.asarray(dslash_hop(dirac.U, psi))
    out_k = dk.dslash_hop_pallas(psi_k, U_k, U_k[:, 3], Y=Y)
    got = spinor_from_planar(dk.from_kernel_spinor(out_k, Y=Y))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_kernel_operator_matches_complex(dirac):
    psi, psi_k, U_k = _kernel_fields(dirac, seed=2)
    op = WilsonDiracKernel(U_k=U_k, kappa=dirac.kappa, Y=Y)
    for name in ("M", "Mdag", "MdagM"):
        ref = np.asarray(getattr(dirac, name)(psi))
        out_k = getattr(op, name)(psi_k)
        got = spinor_from_planar(dk.from_kernel_spinor(out_k, Y=Y))
        np.testing.assert_allclose(got, ref, atol=2e-4, err_msg=name)


def test_kernel_layout_eigensolve():
    """Production path end to end on a tiny lattice: TRLM on the kernel
    layout with the pallas MdagM vs dense eigh (f32 tolerances)."""
    geom = LatticeGeometry((4, 4, 2, 4))   # n = 1536: cheap dense reference
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.2, seed=8)
    dirac = make_dirac(U, gp, ip)
    psi = fields.random_spinor(geom, seed=3, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    op = WilsonDiracKernel(U_k=U_k, kappa=dirac.kappa, Y=4)
    res = lanczos_hermitian_realpair(op.MdagM, psi_k, n_ev=3, n_kr=16,
                                     re_im_axis=1, tol=5e-5,
                                     max_restarts=100, which="SR")
    assert res.converged
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape,
                                jnp.complex128))
    ref = np.linalg.eigvalsh((A + A.conj().T) / 2)[:3]
    np.testing.assert_allclose(np.sort(res.evals), ref, rtol=1e-3)


def test_schur_kernel_matches_complex():
    """Kernel-layout even-odd pc operator vs the complex SchurDirac."""
    from mugiq_tpu.schur import SchurDirac
    from mugiq_tpu.pallas.dirac_kernel import SchurDiracKernel

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.3, seed=8)
    dirac = make_dirac(U, gp, ip)
    pc_c = SchurDirac.from_dirac(dirac)
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    pc_k = SchurDiracKernel(U_k=U_k, kappa=dirac.kappa, Y=4)

    psi = fields.random_spinor(geom, seed=5, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    for name in ("M", "Mdag", "MdagM"):
        ref = np.asarray(getattr(pc_c, name)(psi))
        got = spinor_from_planar(dk.from_kernel_spinor(
            getattr(pc_k, name)(psi_k), Y=4))
        np.testing.assert_allclose(got, ref, atol=2e-4, err_msg=name)


def test_kernel_operator_bf16_links(dirac):
    """precision="bf16" (bf16 link storage, f32 arithmetic): matches the
    f32 operator to bf16 representation accuracy (QUDA half-precision
    analog)."""
    psi, psi_k, U_k = _kernel_fields(dirac, seed=4)
    op32 = WilsonDiracKernel(U_k=U_k, kappa=dirac.kappa, Y=Y)
    op16 = WilsonDiracKernel(U_k=U_k, kappa=dirac.kappa, Y=Y,
                             precision="bf16")
    assert op16.U_k.dtype == jnp.bfloat16
    for name in ("M", "Mdag", "MdagM"):
        ref = np.asarray(getattr(op32, name)(psi_k))
        got = np.asarray(getattr(op16, name)(psi_k))
        assert got.dtype == np.float32, name
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 3e-2, (name, err)


def test_kernel_operator_bf16_clover(dirac):
    """bf16 mode with the fused in-kernel clover diagonal."""
    from mugiq_tpu.clover_np import clover_field_np, clover_chiral_blocks_np

    psi, psi_k, U_k = _kernel_fields(dirac, seed=6)
    A = clover_field_np(np.asarray(dirac.U), dirac.kappa, 1.2)
    A_blocks = jnp.asarray(clover_chiral_blocks_np(A))
    op32 = WilsonDiracKernel(U_k=U_k, kappa=dirac.kappa, Y=Y,
                             A_blocks=A_blocks)
    op16 = WilsonDiracKernel(U_k=U_k, kappa=dirac.kappa, Y=Y,
                             A_blocks=A_blocks, precision="bf16")
    ref = np.asarray(op32.M(psi_k))
    got = np.asarray(op16.M(psi_k))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 3e-2, err


def test_hop_pallas_out_dtype(dirac):
    """out_dtype=bf16 writes a bf16 result (sloppy-intermediate hook)."""
    psi, psi_k, U_k = _kernel_fields(dirac, seed=7)
    out = dk.dslash_hop_pallas(psi_k, U_k, U_k[:, 3], Y=Y,
                               out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    ref = dk.dslash_hop_pallas(psi_k, U_k, U_k[:, 3], Y=Y)
    err = (np.abs(out.astype(np.float32) - np.asarray(ref)).max()
           / np.abs(np.asarray(ref)).max())
    assert err < 3e-2, err


def test_yb_kernel_matches_base(dirac):
    """y-blocked kernel (the large-lattice variant, default above 256
    lanes) is bit-consistent with the base kernel."""
    psi, psi_k, U_k = _kernel_fields(dirac, seed=8)
    ref_hop = np.asarray(dk.dslash_hop_pallas(psi_k, U_k, U_k[:, 3], Y=Y))
    for by in (2,):
        got = np.asarray(dk.dslash_hop_pallas_yb(psi_k, U_k, U_k[:, 3],
                                                 Y=Y, by=by))
        np.testing.assert_allclose(got, ref_hop, atol=1e-6,
                                   err_msg=f"hop by={by}")
    for dagger in (False, True):
        A0 = jnp.zeros((1,), jnp.float32)
        ref_m = np.asarray(dk.wilson_m_pallas(
            psi_k, U_k, U_k[:, 3], A0, Y=Y, kappa=0.12, dagger=dagger))
        got = np.asarray(dk.wilson_m_pallas_yb(
            psi_k, U_k, U_k[:, 3], A0, Y=Y, kappa=0.12, by=2,
            dagger=dagger))
        np.testing.assert_allclose(got, ref_m, atol=1e-6,
                                   err_msg=f"M dagger={dagger}")


def test_yb_kernel_clover_matches_base(dirac):
    from mugiq_tpu.clover_np import clover_field_np, clover_chiral_blocks_np

    psi, psi_k, U_k = _kernel_fields(dirac, seed=9)
    A = clover_field_np(np.asarray(dirac.U), dirac.kappa, 1.2)
    A144 = dk.pack_clover_kernel144(jnp.asarray(clover_chiral_blocks_np(A)))
    ref = np.asarray(dk.wilson_m_pallas(
        psi_k, U_k, U_k[:, 3], A144, Y=Y, kappa=0.12, has_clover=True))
    got = np.asarray(dk.wilson_m_pallas_yb(
        psi_k, U_k, U_k[:, 3], A144, Y=Y, kappa=0.12, by=2,
        has_clover=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_wilson_kernel_default_variant_large_width():
    """Above 256 lanes the untuned operator must default to a grouped-lane
    variant (the full-width kernels cannot compile there; yb is the
    fallback when no grouping fits)."""
    T, Z, Yb, X = 4, 4, 16, 32           # YX = 512
    U_k = jnp.zeros((T, 4, 18, Z, Yb * X), jnp.float32)
    op = WilsonDiracKernel(U_k=U_k, kappa=0.1, Y=Yb)
    assert op._m_variant.startswith("psgl"), op._m_variant
    by = int(op._m_variant[4:])
    assert Yb % by == 0 and 128 <= by * X <= 512
    # Y with no feasible lane grouping (6 has no divisor in {4,8,16}) ->
    # yb fallback
    op2 = WilsonDiracKernel(U_k=jnp.zeros((T, 4, 18, Z, 6 * 64),
                                          jnp.float32), kappa=0.1, Y=6)
    assert op2._m_variant.startswith("yb"), op2._m_variant


def test_gl_kernel_matches_base(dirac):
    """Grouped-lane kernel (large-lattice fast path) vs the base kernel."""
    psi, psi_k, U_k = _kernel_fields(dirac, seed=11)
    ref_hop = np.asarray(dk.dslash_hop_pallas(psi_k, U_k, U_k[:, 3], Y=Y))
    for by in (2, 4):
        got = np.asarray(dk.dslash_hop_pallas_gl(psi_k, U_k, U_k[:, 3],
                                                 Y=Y, by=by))
        np.testing.assert_allclose(got, ref_hop, atol=1e-6,
                                   err_msg=f"hop by={by}")
    for dagger in (False, True):
        A0 = jnp.zeros((1,), jnp.float32)
        ref_m = np.asarray(dk.wilson_m_pallas(
            psi_k, U_k, U_k[:, 3], A0, Y=Y, kappa=0.12, dagger=dagger))
        got = np.asarray(dk.wilson_m_pallas_gl(
            psi_k, U_k, U_k[:, 3], A0, Y=Y, kappa=0.12, by=2,
            dagger=dagger))
        np.testing.assert_allclose(got, ref_m, atol=1e-6,
                                   err_msg=f"M dagger={dagger}")


def test_gl_kernel_clover_matches_base(dirac):
    from mugiq_tpu.clover_np import clover_field_np, clover_chiral_blocks_np

    psi, psi_k, U_k = _kernel_fields(dirac, seed=12)
    A = clover_field_np(np.asarray(dirac.U), dirac.kappa, 1.2)
    A144 = dk.pack_clover_kernel144(jnp.asarray(clover_chiral_blocks_np(A)))
    ref = np.asarray(dk.wilson_m_pallas(
        psi_k, U_k, U_k[:, 3], A144, Y=Y, kappa=0.12, has_clover=True))
    got = np.asarray(dk.wilson_m_pallas_gl(
        psi_k, U_k, U_k[:, 3], A144, Y=Y, kappa=0.12, by=2,
        has_clover=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_glt_kernel_matches_base(dirac):
    """t-blocked grouped-lane kernel vs the base kernel (hop + fused M)."""
    psi, psi_k, U_k = _kernel_fields(dirac, seed=13)
    ref_hop = np.asarray(dk.dslash_hop_pallas(psi_k, U_k, U_k[:, 3], Y=Y))
    for bt in (2, 4):
        got = np.asarray(dk.dslash_hop_pallas_glt(psi_k, U_k, U_k[:, 3],
                                                  Y=Y, by=2, bt=bt))
        np.testing.assert_allclose(got, ref_hop, atol=1e-5,
                                   err_msg=f"hop bt={bt}")
    for dagger in (False, True):
        A0 = jnp.zeros((1,), jnp.float32)
        ref_m = np.asarray(dk.wilson_m_pallas(
            psi_k, U_k, U_k[:, 3], A0, Y=Y, kappa=0.12, dagger=dagger))
        got = np.asarray(dk.wilson_m_pallas_glt(
            psi_k, U_k, U_k[:, 3], A0, Y=Y, kappa=0.12, by=2, bt=2,
            dagger=dagger))
        np.testing.assert_allclose(got, ref_m, atol=1e-5,
                                   err_msg=f"M dagger={dagger}")


def test_glt_kernel_clover_matches_base(dirac):
    from mugiq_tpu.clover_np import clover_field_np, clover_chiral_blocks_np

    psi, psi_k, U_k = _kernel_fields(dirac, seed=14)
    A = clover_field_np(np.asarray(dirac.U), dirac.kappa, 1.2)
    A144 = dk.pack_clover_kernel144(jnp.asarray(clover_chiral_blocks_np(A)))
    ref = np.asarray(dk.wilson_m_pallas(
        psi_k, U_k, U_k[:, 3], A144, Y=Y, kappa=0.12, has_clover=True))
    got = np.asarray(dk.wilson_m_pallas_glt(
        psi_k, U_k, U_k[:, 3], A144, Y=Y, kappa=0.12, by=2, bt=2,
        has_clover=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
