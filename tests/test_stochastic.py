"""Stochastic probing: exact-deflation algebra vs dense inverse, and the
seeded Z4 Hutchinson estimator."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.gamma import gamma_basis
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.stochastic import DeflationSpace, stochastic_loop_trace, z4_noise

GEOM = LatticeGeometry((2, 2, 2, 2))
KAPPA = 0.10


@pytest.fixture(scope="module")
def dirac():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.weak_gauge(GEOM, eps=0.3, seed=31)
    return make_dirac(U, gp, ip)


def _exact_per_site_trace(dirac):
    """dataPos[16, T,Z,Y,X] = per-site spin-color trace of Gamma M^{-1},
    from the dense inverse."""
    n = 2 * 2 * 2 * 2 * 12
    A = np.asarray(dense_matrix(dirac.M, dirac.field_shape, dirac.dtype))
    Ainv = np.linalg.inv(A)
    # diag blocks: site-local 12x12 of M^{-1}
    blocks = Ainv.reshape(n // 12, 12, n // 12, 12)
    diag = np.einsum("iaib->iab", blocks).reshape(2, 2, 2, 2, 4, 3, 4, 3)
    G = gamma_basis()
    # trace: sum_{s,s',c} G[g][s,s'] * Minv[x][s',c,s,c]
    out = np.einsum("gab,tzyxbcac->gtzyx", G, diag)
    return out


def test_z4_noise_properties():
    import jax
    eta = np.asarray(z4_noise(jax.random.PRNGKey(0), (1000, 12), jnp.complex128))
    np.testing.assert_allclose(np.abs(eta), 1.0, atol=1e-14)
    # mean ~ 0
    assert np.abs(eta.mean()) < 0.1


def test_full_deflation_is_exact(dirac):
    """With the complete eigenbasis, the deflated trace term alone equals the
    exact per-site trace of Gamma M^{-1} (validates the deflation algebra)."""
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, dirac.dtype))
    evals, evecs = np.linalg.eigh((A + A.conj().T) / 2)
    vecs = jnp.asarray(evecs.T.reshape((-1,) + dirac.field_shape))
    ds = DeflationSpace.build(dirac.M, vecs, evals)
    got = np.asarray(ds.trace_contribution())
    expect = _exact_per_site_trace(dirac)
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_stochastic_estimator_converges(dirac):
    """Seeded Z4 estimator with partial deflation approaches the exact trace."""
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, dirac.dtype))
    evals, evecs = np.linalg.eigh((A + A.conj().T) / 2)
    n_defl = 24
    vecs = jnp.asarray(evecs[:, :n_defl].T.reshape((-1,) + dirac.field_shape))
    ds = DeflationSpace.build(dirac.M, vecs, evals[:n_defl])

    est = np.asarray(stochastic_loop_trace(dirac, n_noise=40, deflation=ds,
                                           solver_tol=1e-10, seed=5))
    expect = _exact_per_site_trace(dirac)
    # identity-gamma volume sum (the dominant signal): Tr[M^{-1}]
    got_tr = est[0].sum()
    exact_tr = expect[0].sum()
    assert abs(got_tr - exact_tr) / abs(exact_tr) < 0.05
    # per-site identity channel within a few percent rms
    rms = np.sqrt(np.mean(np.abs(est[0] - expect[0]) ** 2))
    scale = np.sqrt(np.mean(np.abs(expect[0]) ** 2))
    assert rms / scale < 0.2
