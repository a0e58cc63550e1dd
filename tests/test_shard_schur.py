"""Sharded packed even-odd Schur operator (8 virtual CPU devices, interpret
mode): shard_map + ppermute parity passes must match the single-device
packed operator, Wilson and clover, and the production pc eigensolve must
run sharded unchanged."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam)
from mugiq_tpu.dirac import make_dirac
from mugiq_tpu.planar.convert import spinor_to_planar, gauge_to_planar
import mugiq_tpu.pallas.dslash_kernel as dk
import mugiq_tpu.pallas.schur_kernel as sk
from mugiq_tpu.parallel.shard_op import ShardedSchurKernelPacked

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices")]

GEOM = LatticeGeometry((8, 4, 4, 16))   # T=16 over 8 devices -> T_loc=2
Y = 4
KAPPA = 0.12


def _tmesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("t",))


def _mesh2d():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("t", "z"))


def _mesh3d():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("t", "z", "y"))


def _setup(clover: bool):
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(
        dslash_type=(DslashType.CLOVER_WILSON if clover
                     else DslashType.WILSON),
        kappa=KAPPA, csw=1.1)
    U = fields.weak_gauge(GEOM, eps=0.3, seed=7)
    dirac = make_dirac(U, gp, ip)
    U_k = dk.to_kernel_gauge(gauge_to_planar(dirac.U))
    A_blocks = None
    if clover:
        from mugiq_tpu.clover_np import clover_chiral_blocks_np
        A_blocks = jnp.asarray(clover_chiral_blocks_np(np.asarray(dirac.A)))
    op = sk.SchurDiracKernelPacked(U_k=U_k, kappa=KAPPA, Y=Y,
                                   A_blocks=A_blocks)
    psi = fields.random_spinor(GEOM, seed=3, dtype=jnp.complex64)
    pe = op.pack_even(dk.to_kernel_spinor(spinor_to_planar(psi)))
    return op, pe


@pytest.mark.parametrize("mk_mesh", [_tmesh, _mesh2d, _mesh3d],
                         ids=["1d-t", "2d-tz", "3d-tzy"])
@pytest.mark.parametrize("clover", [False, True], ids=["wilson", "clover"])
def test_sharded_packed_schur_matches_single_device(clover, mk_mesh):
    op, pe = _setup(clover)
    sop = ShardedSchurKernelPacked.from_packed_op(mk_mesh(), op)
    pes = sop.place(pe)
    for name in ("M", "Mdag", "MdagM"):
        ref = np.asarray(getattr(op, name)(pe))
        got = np.asarray(getattr(sop, name)(pes))
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=name)
    # operand-threaded form (what the eigensolver cycles consume)
    fn, args = sop.operator_with_args(EigOperator.MdagM)
    np.testing.assert_allclose(np.asarray(fn(pes, *args)),
                               np.asarray(op.MdagM(pe)), atol=1e-6)


def test_production_pc_eigensolve_sharded():
    """compute_evecs_production(even_odd=True, mesh=...) matches the
    single-device packed pc eigensolve."""
    from mugiq_tpu.production import compute_evecs_production

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    ep = EigParam(n_ev=4, n_kr=16, tol=5e-5, max_restarts=200,
                  operator=EigOperator.MdagM)
    U = np.asarray(fields.weak_gauge(GEOM, eps=0.3, seed=7))

    res1, evals1, _, resids1 = compute_evecs_production(
        U, gp, ip, ep, even_odd=True)
    assert res1.converged
    res2, evals2, _, resids2 = compute_evecs_production(
        U, gp, ip, ep, even_odd=True, mesh=_tmesh())
    assert res2.converged
    np.testing.assert_allclose(np.sort(evals2), np.sort(evals1), rtol=1e-4)
    assert max(resids2) < 5e-4
