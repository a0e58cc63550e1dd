"""Multi-device sharding: results on a virtual 8-device mesh must match
single-device results exactly (halo exchange = collective-permute, reductions
= all-reduce, inserted by XLA)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import DslashType, GaugeParam, InvertParam
from mugiq_tpu.dirac import make_dirac
from mugiq_tpu.parallel.mesh import (make_lattice_mesh, shard_gauge,
                                     shard_spinor, sharding_for, spinor_spec)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def geom():
    return LatticeGeometry((4, 4, 8, 8))  # t, z sharded over (4, 2) mesh


@pytest.fixture(scope="module")
def mesh():
    return make_lattice_mesh((4, 2))


def test_sharded_dslash_matches_single_device(geom, mesh):
    gp = GaugeParam(dims=geom.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    U = fields.random_gauge(geom, seed=1)
    psi = fields.random_spinor(geom, seed=2)
    dirac = make_dirac(U, gp, ip)

    ref = np.asarray(dirac.M(psi))

    U_sh = shard_gauge(mesh, dirac.U)
    psi_sh = shard_spinor(mesh, psi)

    from mugiq_tpu.dirac import WilsonDirac
    out_sharding = sharding_for(mesh, spinor_spec())

    @jax.jit
    def step(U, p):
        return WilsonDirac(U=U, kappa=0.12).M(p)

    out = jax.jit(step, out_shardings=out_sharding)(U_sh, psi_sh)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-12)
    # output really is sharded over the mesh
    assert len(out.sharding.device_set) == 8


def test_sharded_norms_and_dots(geom, mesh):
    a = fields.random_spinor(geom, seed=3)
    b = fields.random_spinor(geom, seed=4)
    ref = complex(fields.inner(a, b))
    a_sh = shard_spinor(mesh, a)
    b_sh = shard_spinor(mesh, b)
    out = complex(jax.jit(fields.inner)(a_sh, b_sh))
    assert abs(out - ref) < 1e-10 * abs(ref)


def test_sharded_loop_contraction(geom, mesh):
    from mugiq_tpu.ops.contract import loop_contract
    vs = jnp.stack([fields.random_spinor(geom, seed=s) for s in range(2)])
    w = jnp.asarray([1.0, 0.5])
    ref = np.asarray(loop_contract(vs, vs, w))
    vs_sh = jax.device_put(vs, sharding_for(mesh, spinor_spec(), n_leading=1))
    out = np.asarray(jax.jit(loop_contract)(vs_sh, vs_sh, w))
    np.testing.assert_allclose(out, ref, atol=1e-11)
