"""t-windowed modular-DMA pallas kernel (interpret mode on CPU) vs the
base BlockSpec kernel and the complex reference."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac
from mugiq_tpu.planar.convert import (spinor_to_planar, spinor_from_planar,
                                      gauge_to_planar)
import mugiq_tpu.pallas.dslash_kernel as dk
import mugiq_tpu.pallas.dslash_block_kernel as dbk
import mugiq_tpu.pallas.dslash_win_kernel as dwk

GEOM = LatticeGeometry((8, 4, 4, 8))   # X=8, Y=4 -> YX=32, T=8
Y = 4


@pytest.fixture(scope="module")
def setup():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.random_gauge(GEOM, seed=1, dtype=jnp.complex64)
    dirac = make_dirac(U, gp, ip)
    psi = fields.random_spinor(GEOM, seed=0, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    base = dk.dslash_hop_pallas(psi_k, U_k, U_k[:, 3], Y=Y)
    return dirac, psi_k, U_k, np.asarray(base)


@pytest.mark.parametrize("bt", [1, 2, 4])
def test_win_hop_matches_base(setup, bt):
    _, psi_k, U_k, base = setup
    got = dwk.dslash_hop_pallas_win(psi_k, U_k, U_k[:, 3], Y=Y, bt=bt)
    np.testing.assert_allclose(np.asarray(got), base, atol=1e-5)


@pytest.mark.parametrize("bt", [2, 4])
def test_blocked_hop_matches_base(setup, bt):
    _, psi_k, U_k, base = setup
    got = dbk.dslash_hop_pallas_blocked(psi_k, U_k, U_k[:, 3], Y=Y, bt=bt)
    np.testing.assert_allclose(np.asarray(got), base, atol=1e-5)


def test_win_hop_dagger(setup):
    _, psi_k, U_k, _ = setup
    ref = dk.dslash_hop_pallas(psi_k, U_k, U_k[:, 3], Y=Y, dagger=True)
    got = dwk.dslash_hop_pallas_win(psi_k, U_k, U_k[:, 3], Y=Y, bt=2,
                                    dagger=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_win_fused_m_matches_base(setup):
    _, psi_k, U_k, _ = setup
    A0 = jnp.zeros((1,), jnp.float32)
    ref = dk.wilson_m_pallas(psi_k, U_k, U_k[:, 3], A0, Y=Y, kappa=0.12)
    got = dwk.wilson_m_pallas_win(psi_k, U_k, U_k[:, 3], A0, Y=Y,
                                  kappa=0.12, bt=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_win_fused_m_clover(setup):
    """Clover path: random A144 blocks, vs the base fused kernel."""
    _, psi_k, U_k, _ = setup
    T, _, Z, YX = psi_k.shape
    rng = np.random.default_rng(3)
    A144 = jnp.asarray(rng.standard_normal((T, 144, Z, YX)),
                       dtype=jnp.float32)
    ref = dk.wilson_m_pallas(psi_k, U_k, U_k[:, 3], A144, Y=Y, kappa=0.12,
                             has_clover=True)
    got = dwk.wilson_m_pallas_win(psi_k, U_k, U_k[:, 3], A144, Y=Y,
                                  kappa=0.12, bt=2, has_clover=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_win_hop_bf16_inputs(setup):
    """bf16 links+spinor inputs, f32 compute/output: close to f32 result."""
    _, psi_k, U_k, base = setup
    got = dwk.dslash_hop_pallas_win(psi_k.astype(jnp.bfloat16),
                                    U_k.astype(jnp.bfloat16),
                                    U_k[:, 3].astype(jnp.bfloat16),
                                    Y=Y, bt=2)
    assert got.dtype == jnp.float32
    err = np.abs(np.asarray(got) - base).max()
    scale = np.abs(base).max()
    assert err < 0.03 * scale, (err, scale)


@pytest.mark.parametrize("bt", [2])
def test_win_gl_hop_matches_base(setup, bt):
    """Grouped-lane t-window kernel (large-lattice manual-DMA variant)."""
    _, psi_k, U_k, base = setup
    got = dwk.dslash_hop_pallas_win(psi_k, U_k, U_k[:, 3], Y=Y, bt=bt,
                                    gl_by=2)
    np.testing.assert_allclose(np.asarray(got), base, atol=1e-5)


def test_win_gl_m_matches_base(setup):
    _, psi_k, U_k, base = setup
    A0 = jnp.zeros((1,), jnp.float32)
    for dagger in (False, True):
        ref = dk.wilson_m_pallas(psi_k, U_k, U_k[:, 3], A0, Y=Y,
                                 kappa=0.12, dagger=dagger)
        got = dwk.wilson_m_pallas_win(psi_k, U_k, U_k[:, 3], A0, Y=Y,
                                      kappa=0.12, bt=2, gl_by=2,
                                      dagger=dagger)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, err_msg=f"dagger={dagger}")
