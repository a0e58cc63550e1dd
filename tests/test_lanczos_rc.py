"""rc Lanczos must reproduce the complex Lanczos / dense eigh results."""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac, dense_matrix
from mugiq_tpu.rc.cplx import to_rc, from_rc
from mugiq_tpu.rc.dirac_rc import WilsonDiracRC
from mugiq_tpu.eig.lanczos_rc import lanczos_hermitian_rc


def test_rc_lanczos_dense():
    n, n_ev, n_kr = 150, 6, 40
    rng = np.random.default_rng(3)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (a + a.conj().T) / 2
    Hrc_r = jnp.asarray(H.real)
    Hrc_i = jnp.asarray(H.imag)

    def mv(v):  # complex matvec in rc arithmetic
        vr, vi = v[..., 0], v[..., 1]
        return jnp.stack([Hrc_r @ vr - Hrc_i @ vi,
                          Hrc_r @ vi + Hrc_i @ vr], axis=-1)

    v0 = to_rc(jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n)))
    res = lanczos_hermitian_rc(mv, v0, n_ev, n_kr, tol=1e-10,
                               max_restarts=200, which="SR")
    assert res.converged
    ref = np.linalg.eigvalsh(H)[:n_ev]
    np.testing.assert_allclose(np.sort(res.evals), ref, atol=1e-8)
    for i in range(n_ev):
        v = np.asarray(from_rc(res.evecs[i]))
        assert np.linalg.norm(H @ v - res.evals[i] * v) < 1e-7


def test_rc_lanczos_dirac_matches_complex_path():
    geom = LatticeGeometry((4, 4, 2, 8))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.13)
    U = fields.weak_gauge(geom, eps=0.3, seed=9)
    dirac = make_dirac(U, gp, ip)
    rc = WilsonDiracRC.from_complex(dirac)

    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, dirac.dtype))
    ref = np.linalg.eigvalsh((A + A.conj().T) / 2)[:6]

    v0 = to_rc(fields.random_spinor(geom, seed=1))
    res = lanczos_hermitian_rc(rc.MdagM, v0, n_ev=6, n_kr=40, tol=1e-10,
                               max_restarts=400, which="SR")
    assert res.converged
    np.testing.assert_allclose(np.sort(res.evals), ref, rtol=1e-8)


def test_rc_lanczos_f32():
    """The production dtype: f32 rc on a small operator still converges to
    f32-level residuals."""
    geom = LatticeGeometry((4, 4, 4, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.2, seed=11)
    dirac = make_dirac(U, gp, ip)
    rc = WilsonDiracRC(U=jnp.asarray(to_rc(dirac.U), jnp.float32),
                       kappa=dirac.kappa)
    v0 = jnp.asarray(to_rc(fields.random_spinor(geom, seed=2)), jnp.float32)
    res = lanczos_hermitian_rc(rc.MdagM, v0, n_ev=4, n_kr=24, tol=5e-5,
                               max_restarts=200, which="SR")
    assert res.converged
    A = np.asarray(dense_matrix(dirac.MdagM, dirac.field_shape, dirac.dtype))
    ref = np.linalg.eigvalsh((A + A.conj().T) / 2)[:4]
    np.testing.assert_allclose(np.sort(res.evals), ref, rtol=1e-3)


def test_rayleigh_ritz_refine_resolves_clusters():
    """Ritz vectors that mix a tight eigenvalue cluster (the polynomial-
    acceleration floor) are resolved to working precision by the second
    Rayleigh-Ritz pass on the original operator."""
    import numpy as np
    import jax.numpy as jnp
    from mugiq_tpu.planar.lanczos import rayleigh_ritz_refine

    rng = np.random.default_rng(0)
    n = 64
    evs = np.sort(np.concatenate([[0.500, 0.5002, 0.5004, 0.5007],
                                  1.0 + rng.random(n - 4)]))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    A = (Q * evs) @ Q.conj().T
    Ar = jnp.asarray(np.block([[A.real, -A.imag], [A.imag, A.real]]),
                     dtype=jnp.float32)

    def mv(v):
        return Ar @ v

    U4 = Q[:, :4] @ np.linalg.qr(rng.standard_normal((4, 4)))[0]
    V = np.concatenate([U4.real, U4.imag], axis=0).T.astype(np.float32)
    pre = []
    for i in range(4):
        v, w = V[i], np.asarray(Ar) @ V[i]
        lam = v @ w / (v @ v)
        pre.append(np.linalg.norm(lam * v - w))
    assert min(pre) > 1e-5            # mixing floor present
    ref, theta, rs = rayleigh_ritz_refine(mv, jnp.asarray(V), re_im_axis=0)
    assert max(rs) < 5e-6, rs
    np.testing.assert_allclose(theta[:4], evs[:4], atol=1e-5)
