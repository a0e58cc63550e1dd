"""Split-layout (no-transpose) rc MG transfer vs the blocked-agg TransferRC:
identical basis, identical P/R action, identical Galerkin coarse operator.
The split path is the on-chip MG setup at large volumes (the blocked-agg
relayout hangs the tunnelled TPU compiler at 32^3x64)."""

import numpy as np
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
from mugiq_tpu.mg.rc_mg_split import (TransferRCSplit,
                                      galerkin_coarse_operator_split)

GEOM = LatticeGeometry((4, 4, 4, 8))
KAPPA = 0.125
NVEC = 4
BLOCK = (2, 2, 2, 2)


@pytest.fixture(scope="module")
def setup():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    U = fields.weak_gauge(GEOM, eps=0.3, seed=2)
    dirac = make_dirac(U, gp, ip)
    B = setup_null_vectors(dirac.MdagM, dirac.field_shape, dirac.dtype,
                           NVEC, iters=20, seed=3)
    B_rc = to_rc(B)
    tr_rc = TransferRC.build(B_rc, BLOCK, spin_block=2)
    tr_sp = TransferRCSplit.build(B_rc, BLOCK, spin_block=2)
    rc = WilsonDiracRC.from_complex(dirac)
    return rc, tr_rc, tr_sp


def test_split_same_basis(setup):
    """The split MGS produces the same orthonormal basis as the agg MGS."""
    _, tr_rc, tr_sp = setup
    np.testing.assert_allclose(np.asarray(tr_sp.to_agg_V()),
                               np.asarray(tr_rc.V), atol=1e-11)


def test_split_agg_roundtrip(setup):
    _, _, tr_sp = setup
    back = TransferRCSplit.from_agg_V(tr_sp.to_agg_V(), tr_sp.geom)
    np.testing.assert_allclose(np.asarray(back.Vs), np.asarray(tr_sp.Vs),
                               atol=0)


def test_split_restrict_prolong_match(setup):
    _, tr_rc, tr_sp = setup
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal((8, 4, 4, 4, 4, 3, 2)))
    np.testing.assert_allclose(np.asarray(tr_sp.restrict(psi)),
                               np.asarray(tr_rc.restrict(psi)), atol=1e-11)
    phi = jnp.asarray(rng.standard_normal(tr_rc.coarse_field_shape))
    np.testing.assert_allclose(np.asarray(tr_sp.prolong(phi)),
                               np.asarray(tr_rc.prolong(phi)), atol=1e-11)


def test_split_probe_block(setup):
    """probe_block(s) equals prolong of the coarse unit vectors for spin s."""
    _, _, tr_sp = setup
    probes = tr_sp.probe_block(1)
    e = jnp.zeros(tr_sp.coarse_field_shape).at[..., 1, 2, 0].set(1.0)
    np.testing.assert_allclose(np.asarray(probes[2]),
                               np.asarray(tr_sp.prolong(e)), atol=1e-12)


def test_split_galerkin_matches_rc(setup):
    rc, tr_rc, tr_sp = setup
    c_rc = galerkin_coarse_operator_rc(rc, tr_rc)
    c_sp = galerkin_coarse_operator_split(rc, tr_sp, block_jit=False)
    np.testing.assert_allclose(np.asarray(c_sp.D), np.asarray(c_rc.D),
                               atol=1e-10)
    for mu in range(4):
        np.testing.assert_allclose(np.asarray(c_sp.Yp[mu]),
                                   np.asarray(c_rc.Yp[mu]), atol=1e-10)
        np.testing.assert_allclose(np.asarray(c_sp.Ym[mu]),
                                   np.asarray(c_rc.Ym[mu]), atol=1e-10)


def test_split_galerkin_identity(setup):
    """Coarse M phi == R A P phi (the Galerkin identity, directly)."""
    rc, _, tr_sp = setup
    coarse = galerkin_coarse_operator_split(rc, tr_sp, block_jit=False)
    rng = np.random.default_rng(4)
    phi = jnp.asarray(rng.standard_normal(tr_sp.coarse_field_shape))
    lhs = coarse.M(phi)
    rhs = tr_sp.restrict(rc.M(tr_sp.prolong(phi)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_galerkin_wilson_split_threaded(setup):
    """The operand-threaded on-chip Galerkin (jit args, chunked probes)
    equals the generic split Galerkin on a Wilson operator."""
    from mugiq_tpu.mg.rc_mg_split import galerkin_wilson_rc_split
    rc, _, tr_sp = setup
    ref = galerkin_coarse_operator_split(rc, tr_sp, block_jit=False)
    got = galerkin_wilson_rc_split(rc.U, rc.kappa, tr_sp, u_chunk=3)
    np.testing.assert_allclose(np.asarray(got.D), np.asarray(ref.D),
                               atol=1e-10)
    for mu in range(4):
        np.testing.assert_allclose(np.asarray(got.Yp[mu]),
                                   np.asarray(ref.Yp[mu]), atol=1e-10)
        np.testing.assert_allclose(np.asarray(got.Ym[mu]),
                                   np.asarray(ref.Ym[mu]), atol=1e-10)


def test_mgenv_split_matches_agg(setup):
    """MGEnvRC.build(split=True) produces the same hierarchy as the agg
    path (same seed -> same nulls -> same basis/coarse op/prolongation)."""
    from mugiq_tpu.params import MGParam
    from mugiq_tpu.mg.rc_mg import MGEnvRC

    rc, _, _ = setup
    params = MGParam(n_level=2, geo_block_size=[BLOCK], n_vec=[NVEC],
                     setup_iters=6)
    env_a = MGEnvRC.build(rc, params)
    env_s = MGEnvRC.build(rc, params, split=True)
    np.testing.assert_allclose(np.asarray(env_s.coarsest_op.D),
                               np.asarray(env_a.coarsest_op.D), atol=1e-9)
    for mu in range(4):
        np.testing.assert_allclose(np.asarray(env_s.coarsest_op.Yp[mu]),
                                   np.asarray(env_a.coarsest_op.Yp[mu]),
                                   atol=1e-9)
    rng = np.random.default_rng(0)
    phis = jnp.asarray(rng.standard_normal(
        (2,) + env_a.transfers[-1].coarse_field_shape), dtype=jnp.float64)
    pa = env_a.prolongate_batch(phis)
    ps = env_s.prolongate_batch(phis)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pa), atol=1e-9)


def test_mgenv_split_checkpoint_roundtrip(setup, tmp_path):
    """A split-built hierarchy saves in the agg format and loads back on
    either path (split=True/False) with the same coarse operator."""
    from mugiq_tpu.params import MGParam
    from mugiq_tpu.mg.rc_mg import MGEnvRC

    rc, _, _ = setup
    params = MGParam(n_level=2, geo_block_size=[BLOCK], n_vec=[NVEC],
                     setup_iters=6)
    env = MGEnvRC.build(rc, params, split=True)
    path = str(tmp_path / "mg.npz")
    env.save(path)
    env2 = MGEnvRC.load(path, rc, params, split=True)
    env3 = MGEnvRC.load(path, rc, params, split=False)
    rng = np.random.default_rng(1)
    phi = jnp.asarray(rng.standard_normal(
        env.transfers[-1].coarse_field_shape), dtype=jnp.float64)
    p0 = np.asarray(env.transfers[0].prolong(phi))
    np.testing.assert_allclose(np.asarray(env2.transfers[0].prolong(phi)),
                               p0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(env3.transfers[0].prolong(phi)),
                               p0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(env2.coarsest_op.D),
                               np.asarray(env.coarsest_op.D), atol=0)
