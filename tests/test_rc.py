"""rc (real-pair) kernels must match their complex twins exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac
from mugiq_tpu.rc.cplx import (to_rc, from_rc, cmul, ceinsum, cvdot, cnorm2,
                               cscale, conj_rc)
from mugiq_tpu.rc.dirac_rc import WilsonDiracRC, dslash_hop_rc
from mugiq_tpu.rc.contract_rc import loop_contract_rc
from mugiq_tpu.rc.phase_rc import map_gamma_g5_rc, momentum_project_rc

GEOM = LatticeGeometry((4, 4, 4, 4))


def _rand_c(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape)
                       + 1j * rng.standard_normal(shape))


def test_rc_roundtrip():
    z = _rand_c((3, 5), 0)
    np.testing.assert_allclose(np.asarray(from_rc(to_rc(z))), np.asarray(z))


def test_cplx_primitives():
    a = _rand_c((4, 7), 1)
    b = _rand_c((4, 7), 2)
    np.testing.assert_allclose(np.asarray(from_rc(cmul(to_rc(a), to_rc(b)))),
                               np.asarray(a * b), atol=1e-13)
    np.testing.assert_allclose(np.asarray(from_rc(conj_rc(to_rc(a)))),
                               np.asarray(a.conj()))
    d = cvdot(to_rc(a), to_rc(b))
    np.testing.assert_allclose(complex(d[0] + 1j * d[1]),
                               complex(jnp.vdot(a, b)), atol=1e-12)
    np.testing.assert_allclose(float(cnorm2(to_rc(a))),
                               float(jnp.real(jnp.vdot(a, a))), atol=1e-12)
    alpha = jnp.asarray([0.3, -1.2])
    np.testing.assert_allclose(
        np.asarray(from_rc(cscale(alpha, to_rc(a)))),
        np.asarray((0.3 - 1.2j) * a), atol=1e-13)


def test_ceinsum_matches_complex():
    a = _rand_c((5, 6), 3)
    b = _rand_c((6, 7), 4)
    got = from_rc(ceinsum("ij,jk->ik", to_rc(a), to_rc(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(a @ b), atol=1e-12)
    got2 = from_rc(ceinsum("ij,jk->ik", to_rc(a), to_rc(b), conj_a=True))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(a.conj() @ b),
                               atol=1e-12)


@pytest.mark.parametrize("dslash_type", [DslashType.WILSON,
                                         DslashType.CLOVER_WILSON])
def test_rc_dirac_matches_complex(dslash_type):
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=dslash_type, kappa=0.12, csw=1.1)
    U = fields.random_gauge(GEOM, seed=7)
    dirac = make_dirac(U, gp, ip)
    rc = WilsonDiracRC.from_complex(dirac)

    psi = fields.random_spinor(GEOM, seed=8)
    for name in ("M", "Mdag", "MdagM", "MMdag"):
        ref = np.asarray(getattr(dirac, name)(psi))
        got = np.asarray(from_rc(getattr(rc, name)(to_rc(psi))))
        np.testing.assert_allclose(got, ref, atol=1e-11, err_msg=name)


def test_rc_contract_matches_complex():
    from mugiq_tpu.ops.contract import loop_contract
    vs = jnp.stack([fields.random_spinor(GEOM, seed=s) for s in range(3)])
    w = jnp.asarray([0.5, 1.0, 2.0])
    ref = np.asarray(loop_contract(vs, vs, w))
    got = np.asarray(from_rc(loop_contract_rc(to_rc(vs), to_rc(vs), w)))
    np.testing.assert_allclose(got, ref, atol=1e-11)


def test_rc_momentum_projection_matches_complex():
    from mugiq_tpu.ops.phase import phase_matrix, map_gamma_g5, momentum_project
    data = _rand_c((2, 16) + GEOM.shape_tzyx, 9)
    ph = phase_matrix(GEOM, [(0, 0, 0), (1, 2, 0)], -1, jnp.complex128)
    ref = np.asarray(momentum_project(map_gamma_g5(data), ph))
    got_rc = momentum_project_rc(map_gamma_g5_rc(to_rc(data)), to_rc(ph))
    np.testing.assert_allclose(np.asarray(from_rc(got_rc)), ref, atol=1e-10)
