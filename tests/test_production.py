"""Production pipeline (interpret-mode pallas on CPU) vs the complex
validation pipeline on the same configuration."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam, LoopParam)

GEOM = LatticeGeometry((8, 4, 4, 8))


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import mugiq_tpu.pallas.dslash_kernel as dkm
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(dkm.pl, "pallas_call", interp)


def test_planar_displace_matches_complex():
    from mugiq_tpu.displace import covariant_displace
    from mugiq_tpu.planar.displace import covariant_displace_planar
    from mugiq_tpu.planar.convert import (spinor_to_planar,
                                          spinor_from_planar, gauge_to_planar)
    U = fields.random_gauge(GEOM, seed=4)
    psi = fields.random_spinor(GEOM, seed=5)
    for ds in ("+x", "-y", "+z", "-t"):
        ref = np.asarray(covariant_displace(U, psi, ds))
        got = spinor_from_planar(covariant_displace_planar(
            gauge_to_planar(U, jnp.float64), spinor_to_planar(psi, jnp.float64),
            ds))
        np.testing.assert_allclose(got, ref, atol=1e-12, err_msg=ds)


def test_production_contraction_matches_complex():
    from mugiq_tpu.ops.contract import loop_contract
    from mugiq_tpu.production import loop_contract_production
    from mugiq_tpu.planar.convert import spinor_to_planar
    vs = jnp.stack([fields.random_spinor(GEOM, seed=s) for s in range(3)])
    w = jnp.asarray([0.5, 1.0, 2.0])
    ref = np.asarray(loop_contract(vs, vs, w))
    vs_p = jnp.stack([spinor_to_planar(vs[i], jnp.float64) for i in range(3)])
    got_p = np.asarray(loop_contract_production(vs_p, vs_p, w))
    got = got_p[0] + 1j * got_p[1]
    np.testing.assert_allclose(got, ref, atol=1e-11)


def test_production_chebyshev_acceleration():
    """Chebyshev-accelerated production eigensolve on real-pair fields."""
    from mugiq_tpu.production import compute_loop_production

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.115)
    ep = EigParam(n_ev=3, n_kr=16, tol=5e-5, max_restarts=200,
                  operator=EigOperator.MdagM, use_poly_acc=True,
                  poly_deg=16, a_min=0.5, a_max=0.0)
    lp = LoopParam(momenta=[(0, 0, 0)], do_mom_proj=True)
    U = fields.weak_gauge(GEOM, eps=0.2, seed=13)
    prod = compute_loop_production(np.asarray(U), gp, ip, ep, lp)
    assert prod.converged
    # same gauge/seed as the pipeline test: ground level ~0.025
    assert 0.02 < prod.evals[0] < 0.03
    assert np.all(np.diff(np.sort(prod.evals)) >= 0)


def test_production_pipeline_vs_validation(tmp_path):
    """Full production flow vs the complex-path compute_loop on the same
    gauge: eigenvalues, sigma, and momentum-space loops agree at f32 level."""
    from mugiq_tpu.api import compute_loop
    from mugiq_tpu.production import compute_loop_production

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.115)
    ep = EigParam(n_ev=3, n_kr=16, tol=1e-9, max_restarts=300,
                  operator=EigOperator.MdagM)
    lp = LoopParam(momenta=[(0, 0, 0), (1, 0, 0)], do_mom_proj=True,
                   do_nonlocal=True, disp_entries=["+z:1"])
    U = fields.weak_gauge(GEOM, eps=0.2, seed=13)

    ref_result, ref_eig = compute_loop(U, gp, ip, ep, lp)

    ep_prod = EigParam(n_ev=3, n_kr=16, tol=5e-5, max_restarts=300,
                       operator=EigOperator.MdagM)
    prod = compute_loop_production(np.asarray(U), gp, ip, ep_prod, lp)
    assert prod.converged

    # f32 accumulation + a near-degenerate cluster (gaps ~ the f32 residual
    # tolerance) limit eigenvalue agreement to ~1e-3 relative
    np.testing.assert_allclose(np.sort(prod.evals),
                               np.sort(ref_eig.evals.real), rtol=5e-3)
    np.testing.assert_allclose(np.sort(prod.sigma),
                               np.sort(ref_eig.sigma), rtol=3e-3)
    # loop data: compare the g=identity ultra-local p=0 channel (eigenvector
    # phase/ordering ambiguities cancel in the trace)
    # The deflation subspace cuts through a near-degenerate cluster; with
    # f32 residuals ~ the cluster gap the 3rd eigenvector can rotate into
    # the 4th, so the full-pipeline comparison is structural (within ~10%).
    ref_mom = ref_result.data_mom
    np.testing.assert_allclose(prod.data_mom[0, 0, 15].real,
                               ref_mom[0, 0, 15].real, rtol=0.1, atol=0.02)

    # Exact measurement check: inject the validation eigenvectors into the
    # production measurement chain — must agree at f32 level.
    from mugiq_tpu.production import (loop_contract_production,
                                      momentum_project_production)
    from mugiq_tpu.planar.displace import covariant_displace_planar
    from mugiq_tpu.planar.phase import phase_matrix_planar, map_gamma_g5_planar
    from mugiq_tpu.planar.convert import spinor_to_planar, gauge_to_planar

    evecs_pl = jnp.stack([spinor_to_planar(ref_eig.evecs[i])
                          for i in range(3)])
    inv_sigma = jnp.asarray(1.0 / ref_eig.sigma, dtype=jnp.float32)
    U_pl = gauge_to_planar(U)
    slots = [loop_contract_production(evecs_pl, evecs_pl, inv_sigma)]
    vR = covariant_displace_planar(U_pl, evecs_pl, "+z")
    slots.append(loop_contract_production(evecs_pl, vR, inv_sigma))
    data_pos = jnp.stack(slots)
    ph = phase_matrix_planar(GEOM, lp.momenta, int(lp.ft_sign))
    lgtp = np.asarray(momentum_project_production(
        map_gamma_g5_planar(data_pos), ph))
    got = np.transpose(lgtp[:, 0] + 1j * lgtp[:, 1], (3, 0, 1, 2))
    np.testing.assert_allclose(got, ref_mom, rtol=2e-4, atol=1e-3)


def test_production_nonnormal_arnoldi_dispatch():
    """EigOperator.M in the production eigensolve dispatches to the
    real-pair Krylov-Schur Arnoldi; eigenvalues match the validation
    operator's dense spectrum."""
    from mugiq_tpu.production import compute_evecs_production
    from mugiq_tpu.dirac import make_dirac, dense_matrix
    from mugiq_tpu.params import Spectrum

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.2, seed=9)
    ep = EigParam(n_ev=4, n_kr=20, operator=EigOperator.M,
                  spectrum=Spectrum.SM, tol=1e-4, max_restarts=200)
    res, evals, sigma, resids = compute_evecs_production(
        np.asarray(U), gp, ip, ep)
    assert res.converged
    dirac = make_dirac(U, gp, ip)
    A = np.asarray(dense_matrix(dirac.M, dirac.field_shape, jnp.complex128))
    ref = np.linalg.eigvals(A)
    ref = ref[np.argsort(np.abs(ref))][:4]
    # default KAPPA normalization: no rescale.  Compare real parts and
    # |imag| sorted (conjugate-pair ordering is not deterministic).
    got = np.asarray(evals)
    np.testing.assert_allclose(np.sort(got.real), np.sort(ref.real),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.sort(np.abs(got.imag)),
                               np.sort(np.abs(ref.imag)),
                               rtol=2e-3, atol=1e-5)


def test_production_poly_acc_nonnormal_rejected():
    from mugiq_tpu.production import compute_evecs_production

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.2, seed=9)
    ep = EigParam(n_ev=4, n_kr=20, operator=EigOperator.M,
                  use_poly_acc=True, poly_deg=8)
    with pytest.raises(ValueError, match="normal operator"):
        compute_evecs_production(np.asarray(U), gp, ip, ep)


def test_build_rc_dirac_clover_matches_complex():
    """build_rc_dirac with CLOVER_WILSON matches the complex clover M."""
    from mugiq_tpu.production import build_rc_dirac
    from mugiq_tpu.dirac import make_dirac
    from mugiq_tpu.rc.cplx import to_rc, from_rc

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.CLOVER_WILSON, kappa=0.12,
                     csw=1.1)
    U = fields.weak_gauge(geom, eps=0.3, seed=7)
    dirac = make_dirac(U, gp, ip)
    rc = build_rc_dirac(np.asarray(U), gp, ip)
    psi = fields.random_spinor(geom, seed=8)
    ref = np.asarray(dirac.M(psi))
    got = np.asarray(from_rc(rc.M(to_rc(psi).astype(jnp.float32))))
    np.testing.assert_allclose(got, ref, atol=5e-6)
    ref2 = np.asarray(dirac.MdagM(psi))
    got2 = np.asarray(from_rc(rc.MdagM(to_rc(psi).astype(jnp.float32))))
    np.testing.assert_allclose(got2, ref2, atol=5e-5)


def test_production_mg_clover_loop_runs():
    """MG-deflated production loops on the clover operator (the rc MG
    hierarchy Galerkin-coarsens the clover diagonal through diag_term)."""
    from mugiq_tpu.production import compute_loop_production
    from mugiq_tpu.params import MGParam

    geom = LatticeGeometry((4, 4, 4, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.CLOVER_WILSON, kappa=0.12,
                     csw=1.0)
    ep = EigParam(n_ev=2, n_kr=10, tol=5e-5, max_restarts=200,
                  operator=EigOperator.MdagM)
    mgp = MGParam(n_level=2, geo_block_size=[(2, 2, 2, 2)], n_vec=[4],
                  setup_iters=10)
    lp = LoopParam(momenta=[(0, 0, 0)], do_mom_proj=True)
    U = fields.weak_gauge(geom, eps=0.3, seed=2)
    prod = compute_loop_production(np.asarray(U), gp, ip, ep, lp,
                                   use_mg=True, mg=mgp)
    assert prod.converged
    assert np.all(np.isfinite(prod.data_mom))
    assert np.all(prod.evals > 0)


def test_production_block_lanczos_plumbing():
    """EigParam.block_size>1 routes through block TRLM; same eigenvalues."""
    from mugiq_tpu.production import compute_evecs_production

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.2, seed=9)
    ep1 = EigParam(n_ev=3, n_kr=24, tol=1e-5, max_restarts=300,
                   operator=EigOperator.MdagM)
    _, ev1, _, _ = compute_evecs_production(np.asarray(U), gp, ip, ep1)
    ep2 = EigParam(n_ev=3, n_kr=24, tol=1e-5, max_restarts=300,
                   operator=EigOperator.MdagM, block_size=2)
    res2, ev2, _, rs2 = compute_evecs_production(np.asarray(U), gp, ip, ep2)
    assert res2.converged
    np.testing.assert_allclose(np.sort(ev2), np.sort(ev1), rtol=1e-3)
    assert max(rs2) < 5e-3


def test_production_pos_space_write(tmp_path):
    """write_pos_space_hdf5 writes g5-mapped position-space loops."""
    import h5py
    from mugiq_tpu.production import compute_loop_production
    from mugiq_tpu.ops.phase import map_gamma_g5
    from mugiq_tpu.io.hdf5io import GAMMA_NAMES

    fname = str(tmp_path / "pos.h5")
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.115)
    ep = EigParam(n_ev=2, n_kr=12, tol=5e-5, max_restarts=200,
                  operator=EigOperator.MdagM)
    lp = LoopParam(momenta=[(0, 0, 0)], do_mom_proj=False,
                   write_pos_space_hdf5=True, fname_pos_h5=fname)
    U = fields.weak_gauge(GEOM, eps=0.2, seed=13)
    prod = compute_loop_production(np.asarray(U), gp, ip, ep, lp,
                                   keep_pos=True)
    expect = np.asarray(map_gamma_g5(prod.data_pos))
    with h5py.File(fname, "r") as f:
        assert "disp_0" in f or len(f.keys()) == 1
        label = list(f.keys())[0]
        for ig, gname in enumerate(GAMMA_NAMES):
            arr = f[label][gname]["loop"][...]
            got = arr[..., 0] + 1j * arr[..., 1]
            np.testing.assert_allclose(got, expect[0, ig], rtol=2e-5,
                                       atol=1e-5)


def test_production_bf16_basis_eigensolve():
    """Mixed-precision (bf16-stored) Krylov basis: eigenvalues agree with
    the f32 run to ~bf16 storage accuracy (deflation-grade)."""
    from mugiq_tpu.production import compute_evecs_production

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.2, seed=9)
    ep = EigParam(n_ev=4, n_kr=16, operator=EigOperator.MdagM,
                  tol=1e-5, max_restarts=60, check_interval=2)
    _, ev32, _, _ = compute_evecs_production(np.asarray(U), gp, ip, ep)
    ep16 = EigParam(n_ev=4, n_kr=16, operator=EigOperator.MdagM,
                    tol=3e-3, max_restarts=60, check_interval=2)
    res, ev16, _, rs16 = compute_evecs_production(
        np.asarray(U), gp, ip, ep16, basis_precision="bf16")
    np.testing.assert_allclose(np.asarray(ev16), np.asarray(ev32),
                               rtol=3e-2)
    assert max(rs16) < 0.1


def test_production_bf16_basis_poly_acc():
    """Chebyshev-accelerated eigensolve with the bf16 basis: the whole
    polynomial chain runs in bf16 (stored vector feeds the operator
    as-is); eigenvalues still land at ~bf16 accuracy."""
    from mugiq_tpu.production import compute_evecs_production

    geom = LatticeGeometry((4, 4, 2, 4))
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.weak_gauge(geom, eps=0.2, seed=9)
    ep = EigParam(n_ev=4, n_kr=16, operator=EigOperator.MdagM,
                  tol=1e-6, max_restarts=40, check_interval=2)
    _, ev32, _, _ = compute_evecs_production(np.asarray(U), gp, ip, ep)
    # a_max=0 -> auto spectral-edge estimate (the MdagM spectrum here tops
    # out near (1+8k)^2 ~ 3.8; a window that cuts below the top edge makes
    # the filter amplify the WRONG end)
    epp = EigParam(n_ev=4, n_kr=16, operator=EigOperator.MdagM,
                   tol=3e-3, max_restarts=40, check_interval=2,
                   use_poly_acc=True, poly_deg=8, a_min=0.5, a_max=0.0)
    res, evp, _, rsp = compute_evecs_production(
        np.asarray(U), gp, ip, epp, basis_precision="bf16")
    np.testing.assert_allclose(np.asarray(evp), np.asarray(ev32),
                               rtol=3e-2)
    assert max(rsp) < 0.1
