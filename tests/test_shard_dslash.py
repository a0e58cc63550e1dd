"""Multi-device pallas dslash (interpret mode, 8 virtual CPU devices):
shard_map + explicit ppermute halos must match the single-device result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.planar.convert import (spinor_to_planar, spinor_from_planar,
                                      gauge_to_planar)
import mugiq_tpu.pallas.dslash_kernel as dk
import mugiq_tpu.parallel.shard_dslash as sd
from mugiq_tpu.parallel.shard_dslash import (make_sharded_dslash,
                                             shard_kernel_fields)

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices")]

GEOM = LatticeGeometry((8, 4, 4, 16))   # T=16 over 8 devices -> T_loc=2
Y = 4


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(dk.pl, "pallas_call", interp)
    monkeypatch.setattr(sd.pl, "pallas_call", interp)


def test_sharded_pallas_dslash_matches_single_device():
    from mugiq_tpu.ops.dslash import dslash_hop
    from jax.sharding import Mesh

    U = fields.random_gauge(GEOM, seed=1, dtype=jnp.complex64)
    psi = fields.random_spinor(GEOM, seed=0, dtype=jnp.complex64)
    ref = np.asarray(dslash_hop(U, psi))

    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(U))
    Ut_k = U_k[:, 3]

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("t",))
    psi_s, U_s, Ut_s = shard_kernel_fields(mesh, psi_k, U_k, Ut_k)
    f = make_sharded_dslash(mesh, Y=Y)
    out = f(psi_s, U_s, Ut_s)
    assert len(out.sharding.device_set) == 8
    got = spinor_from_planar(dk.from_kernel_spinor(out, Y=Y))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_sharded_matches_unsharded_kernel():
    """Bit-level agreement between the sharded-ext and single-device-modular
    kernel paths."""
    from jax.sharding import Mesh

    U = fields.weak_gauge(GEOM, eps=0.3, seed=2, dtype=jnp.complex64)
    psi = fields.random_spinor(GEOM, seed=3, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(U))
    Ut_k = U_k[:, 3]

    single = np.asarray(dk.dslash_hop_pallas(psi_k, U_k, Ut_k, Y=Y))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("t",))
    psi_s, U_s, Ut_s = shard_kernel_fields(mesh, psi_k, U_k, Ut_k)
    f = make_sharded_dslash(mesh, Y=Y)
    out = np.asarray(f(psi_s, U_s, Ut_s))
    np.testing.assert_allclose(out, single, atol=0)


def test_2d_sharded_pallas_dslash():
    """(t, z) 2D mesh: explicit halos in both directions, bit-identical to
    the single-device modular kernel."""
    from jax.sharding import Mesh
    from mugiq_tpu.parallel.shard_dslash import (make_sharded_dslash_2d,
                                                 shard_kernel_fields_2d)

    geom2 = LatticeGeometry((8, 4, 8, 8))   # Z=8 over 2, T=8 over 4
    U = fields.random_gauge(geom2, seed=6, dtype=jnp.complex64)
    psi = fields.random_spinor(geom2, seed=7, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(U))
    Ut_k = U_k[:, 3]

    single = np.asarray(dk.dslash_hop_pallas(psi_k, U_k, Ut_k, Y=4))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("t", "z"))
    psi_s, U_s, Ut_s = shard_kernel_fields_2d(mesh, psi_k, U_k, Ut_k)
    f = make_sharded_dslash_2d(mesh, Y=4)
    out = f(psi_s, U_s, Ut_s)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), single, atol=0)


def test_3d_sharded_pallas_dslash():
    """(t, z, y) 3D mesh: sharded hop AND fused M match single device
    (three of the reference's four partitioned dims,
    /root/reference/tests/eigensolve.cpp:683)."""
    from jax.sharding import Mesh
    from mugiq_tpu.ops.dslash import dslash_hop
    from mugiq_tpu.parallel.shard_dslash import make_sharded_wilson_3d
    from mugiq_tpu.parallel.shard_op import (spinor_sharding, gauge_sharding)

    geom = LatticeGeometry((4, 8, 4, 4))      # X=4, Y=8, Z=4, T=4
    Yg, Xg = 8, 4
    U = fields.random_gauge(geom, seed=7, dtype=jnp.complex64)
    psi = fields.random_spinor(geom, seed=8, dtype=jnp.complex64)
    ref = np.asarray(dslash_hop(U, psi))

    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(U))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("t", "z", "y"))
    psi_s = jax.device_put(psi_k, spinor_sharding(mesh))
    U_s = jax.device_put(U_k, gauge_sharding(mesh))
    Ut_s = jax.device_put(U_k[:, 3], spinor_sharding(mesh))
    A0 = jax.device_put(
        jnp.zeros((4, 1, 1, 1), jnp.float32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("t")))

    f = make_sharded_wilson_3d(mesh, Y=Yg, X=Xg, kappa=None)
    out = f(psi_s, U_s, Ut_s, A0)
    assert len(out.sharding.device_set) == 8
    got = spinor_from_planar(dk.from_kernel_spinor(out, Y=Yg))
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # fused M, bit-consistent with the single-device operator
    from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
    single = WilsonDiracKernel(U_k=U_k, kappa=0.12, Y=Yg)
    fm = make_sharded_wilson_3d(mesh, Y=Yg, X=Xg, kappa=0.12)
    got_m = np.asarray(fm(psi_s, U_s, Ut_s, A0))
    np.testing.assert_allclose(got_m, np.asarray(single.M(psi_k)),
                               atol=1e-5)


def test_3d_sharded_wilson_kernel_op():
    """ShardedWilsonKernel on a 3D mesh reproduces MdagM."""
    from jax.sharding import Mesh
    from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
    from mugiq_tpu.parallel.shard_op import ShardedWilsonKernel

    geom = LatticeGeometry((4, 8, 4, 4))
    U = fields.weak_gauge(geom, eps=0.3, seed=9, dtype=jnp.complex64)
    psi = fields.random_spinor(geom, seed=10, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(U))
    single = WilsonDiracKernel(U_k=U_k, kappa=0.11, Y=8)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("t", "z", "y"))
    op = ShardedWilsonKernel.from_kernel_op(mesh, single)
    psi_s = op.place(psi_k)
    for name in ("M", "Mdag", "MdagM"):
        ref = np.asarray(getattr(single, name)(psi_k))
        got = np.asarray(getattr(op, name)(psi_s))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=name)
