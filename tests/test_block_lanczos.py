"""Block thick-restart Lanczos (real-pair): degenerate spectra, kernel ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.planar.convert import spinor_to_planar, gauge_to_planar
from mugiq_tpu.planar.block_lanczos import block_lanczos_hermitian_realpair
import mugiq_tpu.pallas.dslash_kernel as dk


def _dense_ref(dirac, n):
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape,
                                jnp.complex128))
    return np.linalg.eigvalsh((A + A.conj().T) / 2)[:n]


def test_block_lanczos_degenerate_free_field():
    """Free field: MdagM spectrum has high multiplicities — the block
    solver must resolve a full degenerate cluster."""
    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.unit_gauge(geom)
    dirac = make_dirac(U, gp, ip)
    psi = fields.random_spinor(geom, seed=3, dtype=jnp.complex64)
    v0 = spinor_to_planar(psi).astype(jnp.float32)

    from mugiq_tpu.planar.dirac import WilsonDiracPlanar
    op = WilsonDiracPlanar.from_complex(dirac)
    mv = op.MdagM

    res = block_lanczos_hermitian_realpair(
        mv, v0, n_ev=6, n_kr=24, block_size=4, re_im_axis=0,
        tol=1e-5, max_restarts=80, which="SR")
    assert res.converged
    ref = _dense_ref(dirac, 6)
    # free field lowest MdagM eigenvalue is 8-fold+ degenerate
    assert ref[1] - ref[0] < 1e-10
    np.testing.assert_allclose(np.sort(res.evals), ref, rtol=2e-4)


def test_block_lanczos_kernel_layout_pallas():
    """Block solver on the pallas kernel layout (vmap'd fused operator,
    interpret mode) vs dense eigh."""
    from jax.experimental import pallas as pl
    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.2, seed=8)
    dirac = make_dirac(U, gp, ip)
    psi = fields.random_spinor(geom, seed=3, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
    op = WilsonDiracKernel(U_k=U_k, kappa=dirac.kappa, Y=4)
    res = block_lanczos_hermitian_realpair(
        op.MdagM, psi_k, n_ev=4, n_kr=32, block_size=4, re_im_axis=1,
        tol=2e-3, max_restarts=80, which="SR")
    assert res.converged
    ref = _dense_ref(dirac, 4)
    # f32 + tol 2e-3: trailing Ritz values good to ~1e-3 (b=1 is no better)
    np.testing.assert_allclose(np.sort(res.evals), ref, rtol=2e-3)


def test_block_lanczos_matches_nonblock():
    """b=2 block solver and b=1-equivalent plain solver agree (random
    gauge, non-degenerate)."""
    from mugiq_tpu.planar.lanczos import lanczos_hermitian_realpair
    from mugiq_tpu.planar.dirac import WilsonDiracPlanar

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.11)
    U = fields.random_gauge(geom, seed=5, dtype=jnp.complex64)
    dirac = make_dirac(U, gp, ip)
    psi = fields.random_spinor(geom, seed=4, dtype=jnp.complex64)
    v0 = spinor_to_planar(psi).astype(jnp.float32)
    mv = WilsonDiracPlanar.from_complex(dirac).MdagM

    res_b = block_lanczos_hermitian_realpair(
        mv, v0, n_ev=4, n_kr=24, block_size=2, re_im_axis=0,
        tol=1e-5, max_restarts=100, which="SR")
    res_1 = lanczos_hermitian_realpair(
        mv, v0, n_ev=4, n_kr=24, re_im_axis=0, tol=1e-5,
        max_restarts=100, which="SR")
    assert res_b.converged and res_1.converged
    np.testing.assert_allclose(np.sort(res_b.evals), np.sort(res_1.evals),
                               rtol=1e-4)


def test_block_lanczos_validation():
    mv = lambda p: p
    v0 = jnp.ones((2, 4), jnp.float32)
    with pytest.raises(ValueError, match="too small"):
        block_lanczos_hermitian_realpair(mv, v0, n_ev=2, n_kr=4,
                                         block_size=4, re_im_axis=0)
    with pytest.raises(ValueError, match="block has"):
        block_lanczos_hermitian_realpair(mv, jnp.ones((3, 2, 4)), n_ev=2,
                                         n_kr=16, block_size=4,
                                         re_im_axis=1, v0_is_block=True)


def test_block_lanczos_bf16_basis():
    """bf16 basis storage on the block solver: same spectrum to bf16-floor
    accuracy (the capability existed for the scalar solver only)."""
    import numpy as np
    import jax.numpy as jnp
    from mugiq_tpu.planar.block_lanczos import block_lanczos_hermitian_realpair

    rng = np.random.default_rng(5)
    n = 96
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = (A + A.conj().T) / 2
    Ar = jnp.asarray(np.block([[A.real, -A.imag], [A.imag, A.real]]),
                     dtype=jnp.float32)

    def mv(v):
        return Ar @ v

    v0 = jnp.asarray(rng.standard_normal(2 * n), dtype=jnp.float32)
    ref = np.linalg.eigvalsh(A)[:4]
    res = block_lanczos_hermitian_realpair(
        mv, v0, n_ev=4, n_kr=32, block_size=4, re_im_axis=0, tol=1e-4,
        max_restarts=200, which="SR", basis_dtype=jnp.bfloat16)
    np.testing.assert_allclose(res.evals[:4], ref, atol=5e-2)
