"""Project-then-shift kernel variants must match the original bodies.

ps=True applies spatial shifts to the 12 projected half-spinor components
(forward hops) / the 12 link-multiplied components (backward hops) instead
of 24 psi + 18 link components — shifts commute with the per-site linear
maps, so results agree to f32 op-order noise."""

import numpy as np
import jax.numpy as jnp
import pytest

import mugiq_tpu.pallas.dslash_kernel as dk

T, Z, Y, X = 6, 4, 8, 4


@pytest.fixture(scope="module")
def fields():
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal((T, 24, Z, Y * X)), jnp.float32)
    U = jnp.asarray(rng.standard_normal((T, 4, 18, Z, Y * X)), jnp.float32)
    return psi, U, U[:, 3]


@pytest.mark.parametrize("dagger", [False, True])
def test_ps_hop_and_m_match(fields, dagger):
    psi, U, Ut = fields
    z1 = jnp.zeros((1,), jnp.float32)
    a = np.asarray(dk.dslash_hop_pallas(psi, U, Ut, Y=Y, dagger=dagger))
    b = np.asarray(dk.dslash_hop_pallas(psi, U, Ut, Y=Y, dagger=dagger,
                                        ps=True))
    np.testing.assert_allclose(a, b, atol=1e-4)
    m1 = np.asarray(dk.wilson_m_pallas(psi, U, Ut, z1, Y=Y, kappa=0.12,
                                       dagger=dagger))
    m2 = np.asarray(dk.wilson_m_pallas(psi, U, Ut, z1, Y=Y, kappa=0.12,
                                       dagger=dagger, ps=True))
    np.testing.assert_allclose(m1, m2, atol=1e-4)
    g1 = np.asarray(dk.wilson_m_pallas_gl(psi, U, Ut, z1, Y=Y, kappa=0.12,
                                          by=2, dagger=dagger))
    g2 = np.asarray(dk.wilson_m_pallas_gl(psi, U, Ut, z1, Y=Y, kappa=0.12,
                                          by=2, dagger=dagger, ps=True))
    np.testing.assert_allclose(g1, g2, atol=1e-4)
