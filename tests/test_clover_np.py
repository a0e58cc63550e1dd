"""numpy clover construction + kernel-layout chiral-block application vs the
jnp/complex implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac
from mugiq_tpu.clover import clover_field
from mugiq_tpu.clover_np import clover_field_np, clover_chiral_blocks_np
from mugiq_tpu.planar.convert import spinor_to_planar, spinor_from_planar
import mugiq_tpu.pallas.dslash_kernel as dk
from mugiq_tpu.pallas.dirac_kernel import apply_clover_kernel

GEOM = LatticeGeometry((4, 4, 4, 4))
KAPPA = 0.12
CSW = 1.1


@pytest.fixture(scope="module")
def U_np():
    return np.asarray(fields.random_gauge(GEOM, seed=9))


def test_clover_np_matches_jnp(U_np):
    ref = np.asarray(clover_field(jnp.asarray(U_np), KAPPA, CSW))
    got = clover_field_np(U_np, KAPPA, CSW)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_clover_is_chiral_block_diagonal(U_np):
    """[g5, sigma.F] = 0 -> off-chiral blocks vanish (the packing assumes it)."""
    A = clover_field_np(U_np, KAPPA, CSW)
    off1 = A[..., 0:2, :, 2:4, :]
    off2 = A[..., 2:4, :, 0:2, :]
    assert np.abs(off1).max() < 1e-13
    assert np.abs(off2).max() < 1e-13


def test_kernel_clover_apply_matches_complex(U_np):
    from mugiq_tpu.clover import apply_clover
    A = clover_field_np(U_np, KAPPA, CSW)
    psi = fields.random_spinor(GEOM, seed=1)
    ref = np.asarray(apply_clover(jnp.asarray(A), psi))

    A_blocks = jnp.asarray(clover_chiral_blocks_np(A), dtype=jnp.float64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi, dtype=jnp.float64))
    out_k = apply_clover_kernel(A_blocks, psi_k)
    got = spinor_from_planar(dk.from_kernel_spinor(out_k, Y=GEOM.Ly))
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_production_clover_operator(U_np):
    """Full kernel-layout clover M vs the complex clover Dirac operator
    (pallas in interpret mode)."""
    import mugiq_tpu.pallas.dslash_kernel as dkm
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    dkm.pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        from mugiq_tpu.production import build_kernel_dirac
        from mugiq_tpu.planar.convert import gauge_to_planar

        gp = GaugeParam(dims=GEOM.dims)
        ip = InvertParam(dslash_type=DslashType.CLOVER_WILSON, kappa=KAPPA,
                         csw=CSW)
        dirac = make_dirac(jnp.asarray(U_np), gp, ip)
        op = build_kernel_dirac(U_np, gp, ip)
        psi = fields.random_spinor(GEOM, seed=2, dtype=jnp.complex64)
        psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
        got = spinor_from_planar(dk.from_kernel_spinor(op.M(psi_k), Y=GEOM.Ly))
        ref = np.asarray(dirac.M(psi))
        np.testing.assert_allclose(got, ref, atol=5e-5)
    finally:
        dkm.pl.pallas_call = orig
