"""Kernel-layout MG transfer (mask + block-reduce, per-direction pallas
hops) vs the rc TransferRC: identical basis action, P/R, and Galerkin
coarse operator.  This is the formulation that compiles at 32^3x64 (the
rc layout's split views relayout catastrophically on the TPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac
from mugiq_tpu.rc.cplx import to_rc
from mugiq_tpu.rc.dirac_rc import WilsonDiracRC
from mugiq_tpu.mg.setup import setup_null_vectors
from mugiq_tpu.mg.rc_mg import TransferRC, galerkin_coarse_operator_rc
from mugiq_tpu.mg.kernel_mg import TransferKernelMG, galerkin_wilson_kernel
import mugiq_tpu.pallas.dslash_kernel as dk

GEOM = LatticeGeometry((4, 4, 4, 8))
Y = GEOM.dims[1]
KAPPA = 0.125
NVEC = 4
BLOCK = (2, 2, 2, 2)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(dk.pl, "pallas_call", interp)


def _rc_to_kernel(v_rc):
    """[T,Z,Y,X,s,c,2] -> [T,24,Z,YX]."""
    pl_ = jnp.transpose(v_rc, (6, 4, 5, 0, 1, 2, 3)).astype(jnp.float32)
    return dk.to_kernel_spinor(pl_)


def _kernel_to_rc(v_k):
    pl_ = dk.from_kernel_spinor(v_k, Y=Y)
    return jnp.transpose(pl_, (3, 4, 5, 6, 1, 2, 0))


@pytest.fixture(scope="module")
def setup():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.weak_gauge(GEOM, eps=0.3, seed=2)
    dirac = make_dirac(U, gp, ip)
    B = setup_null_vectors(dirac.MdagM, dirac.field_shape, dirac.dtype,
                           NVEC, iters=20, seed=3)
    B_rc = jnp.asarray(to_rc(B), jnp.float32)
    tr_rc = TransferRC.build(B_rc, BLOCK, spin_block=2)
    Bk = jnp.stack([_rc_to_kernel(B_rc[j]) for j in range(NVEC)])
    tr_k = TransferKernelMG.build(Bk, BLOCK, Y)
    rc = WilsonDiracRC(U=jnp.asarray(to_rc(dirac.U), jnp.float32),
                       kappa=KAPPA)
    # dirac.U is already phased — build the kernel gauge from the SAME field
    from mugiq_tpu.production import _planar_gauge_np
    U_k = dk.to_kernel_gauge(jnp.asarray(_planar_gauge_np(
        np.asarray(dirac.U), False)))
    return rc, tr_rc, tr_k, U_k


def test_kernel_mgs_same_basis(setup):
    _, tr_rc, tr_k, _ = setup
    np.testing.assert_allclose(np.asarray(tr_k.to_agg_V()),
                               np.asarray(tr_rc.V), atol=2e-6)


def test_kernel_restrict_prolong_match(setup):
    _, tr_rc, tr_k, _ = setup
    rng = np.random.default_rng(0)
    psi_rc = jnp.asarray(rng.standard_normal((8, 4, 4, 4, 4, 3, 2)),
                         jnp.float32)
    got = np.asarray(tr_k.restrict(_rc_to_kernel(psi_rc)))
    ref = np.asarray(tr_rc.restrict(psi_rc))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    phi = jnp.asarray(rng.standard_normal(tr_rc.coarse_field_shape),
                      jnp.float32)
    got_p = np.asarray(_kernel_to_rc(tr_k.prolong(phi)))
    ref_p = np.asarray(tr_rc.prolong(phi))
    np.testing.assert_allclose(got_p, ref_p, atol=2e-6)


def test_kernel_galerkin_matches_rc(setup):
    rc, tr_rc, tr_k, U_k = setup
    ref = galerkin_coarse_operator_rc(rc, tr_rc)
    got = galerkin_wilson_kernel(U_k, U_k[:, 3], KAPPA, tr_k)
    np.testing.assert_allclose(np.asarray(got.D), np.asarray(ref.D),
                               atol=5e-5)
    for mu in range(4):
        np.testing.assert_allclose(np.asarray(got.Yp[mu]),
                                   np.asarray(ref.Yp[mu]), atol=5e-5,
                                   err_msg=f"Yp {mu}")
        np.testing.assert_allclose(np.asarray(got.Ym[mu]),
                                   np.asarray(ref.Ym[mu]), atol=5e-5,
                                   err_msg=f"Ym {mu}")


def test_kernel_checkpoint_roundtrip(setup):
    _, _, tr_k, _ = setup
    back = TransferKernelMG.from_agg_V(tr_k.to_agg_V(), tr_k.geom, Y)
    np.testing.assert_allclose(np.asarray(back.V), np.asarray(tr_k.V),
                               atol=1e-6)


def test_mgenv_kernel_production_smoke(tmp_path):
    """compute_loop_production with mg_setup='kernel': the all-kernel-layout
    MG setup + checkpoint round trip (interpret pallas, tiny volume)."""
    from mugiq_tpu.params import (EigParam, EigOperator, LoopParam, MGParam)
    from mugiq_tpu.production import compute_loop_production

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=4, n_kr=12, tol=1e-30, max_restarts=3,
                  operator=EigOperator.MdagM, check_interval=100)
    lp = LoopParam(momenta=[(0, 0, 0)], do_mom_proj=True)
    U = np.asarray(fields.weak_gauge(GEOM, eps=0.3, seed=1,
                                     dtype=jnp.complex64))
    ck = str(tmp_path / "mgk.npz")
    mg = MGParam(n_level=2, geo_block_size=[BLOCK], n_vec=[4],
                 setup_iters=6, vec_outfile=ck)
    r1 = compute_loop_production(U, gp, ip, ep, lp, use_mg=True, mg=mg,
                                 mg_setup="kernel")
    assert np.all(np.isfinite(r1.data_mom))
    mg2 = MGParam(n_level=2, geo_block_size=[BLOCK], n_vec=[4],
                  setup_iters=6, vec_infile=ck)
    r2 = compute_loop_production(U, gp, ip, ep, lp, use_mg=True, mg=mg2,
                                 mg_setup="kernel")
    np.testing.assert_allclose(r2.evals, r1.evals, rtol=1e-4)


def test_mgenv_kernel_matches_agg():
    """MGEnvRC.build(kernel_impl=True) == the agg hierarchy (same seed),
    comparing coarse stencils and recursive prolongation."""
    from mugiq_tpu.params import MGParam
    from mugiq_tpu.mg.rc_mg import MGEnvRC
    from mugiq_tpu.production import build_rc_dirac, build_kernel_dirac

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = np.asarray(fields.weak_gauge(GEOM, eps=0.3, seed=1,
                                     dtype=jnp.complex64))
    rc = build_rc_dirac(U, gp, ip)
    fast = build_kernel_dirac(U, gp, ip)
    params = MGParam(n_level=2, geo_block_size=[BLOCK], n_vec=[4],
                     setup_iters=6)
    env_a = MGEnvRC.build(rc, params, fast_fine_op=fast)
    env_k = MGEnvRC.build(None, params, fast_fine_op=fast,
                          kernel_impl=True)
    np.testing.assert_allclose(np.asarray(env_k.coarsest_op.D),
                               np.asarray(env_a.coarsest_op.D), atol=2e-5)
    for mu in range(4):
        np.testing.assert_allclose(np.asarray(env_k.coarsest_op.Yp[mu]),
                                   np.asarray(env_a.coarsest_op.Yp[mu]),
                                   atol=2e-5)
    rng = np.random.default_rng(0)
    phis = jnp.asarray(rng.standard_normal(
        (2,) + env_a.transfers[-1].coarse_field_shape), jnp.float32)
    pa = np.asarray(env_a.prolongate_batch(phis))     # rc layout
    pk_k = env_k.prolongate_batch(phis)               # kernel layout
    pk = np.stack([np.transpose(np.asarray(
        dk.from_kernel_spinor(pk_k[i], Y=Y)), (3, 4, 5, 6, 1, 2, 0))
        for i in range(2)])
    np.testing.assert_allclose(pk, pa, atol=2e-5)
