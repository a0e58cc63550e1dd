"""Pallas measurement kernels vs the planar reference implementations.

The kernel-layout contraction / displacement must match
production.loop_contract_production and planar.displace exactly (they all
implement loopContract_kernel / the covariant displacement of
/root/reference/lib/mugiq_contract_kernels.cu and displace_mugiq.cpp).
Pallas runs in interpret mode on the CPU backend.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import mugiq_tpu.pallas.dslash_kernel as dk
from mugiq_tpu.pallas.contract_kernel import (
    covariant_displace_kernel_pallas, loop_contract_pallas, pick_gl_by)
from mugiq_tpu.production import loop_contract_production, _planar_gauge_np
from mugiq_tpu.planar.displace import covariant_displace_planar
from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry

DIMS = (4, 8, 4, 6)          # X, Y, Z, T (Y=8 so by-grouping can kick in)


def _rand_planar_spinors(n, seed=0):
    X, Y, Z, T = DIMS
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((n, 2, 4, 3, T, Z, Y, X)).astype(np.float32))


def _loop_gauge_planar():
    geom = LatticeGeometry(DIMS)
    U = np.asarray(fields.random_gauge(geom, seed=3, dtype=jnp.complex128))
    return jnp.asarray(_planar_gauge_np(U, antiperiodic_t=False))


def _to_kernel_batch(v_pl):
    return jnp.stack([dk.to_kernel_spinor(v_pl[i])
                      for i in range(v_pl.shape[0])])


@pytest.mark.parametrize("by", [0, 2])
def test_contract_pallas_matches_planar(by):
    n = 3
    vL = _rand_planar_spinors(n, seed=1)
    vR = _rand_planar_spinors(n, seed=2)
    w = jnp.asarray(np.linspace(0.5, 1.5, n).astype(np.float32))
    ref = np.asarray(loop_contract_production(vL, vR, w))
    got = np.asarray(loop_contract_pallas(
        _to_kernel_batch(vL), _to_kernel_batch(vR), w, Y=DIMS[1], by=by))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dstr", ["+x", "-x", "+y", "-y", "+z", "-z",
                                  "+t", "-t"])
@pytest.mark.parametrize("by", [0, 2])
def test_displace_pallas_matches_planar(dstr, by):
    n = 2
    U_pl = _loop_gauge_planar()
    U_k = dk.to_kernel_gauge(U_pl)
    v = _rand_planar_spinors(n, seed=4)
    ref = np.asarray(covariant_displace_planar(U_pl, v, dstr))
    got_k = covariant_displace_kernel_pallas(_to_kernel_batch(v) + 0.0,
                                             U_k, dstr, Y=DIMS[1], by=by)
    got = np.stack([np.asarray(dk.from_kernel_spinor(got_k[i], Y=DIMS[1]))
                    for i in range(n)])
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_pick_gl_by():
    assert pick_gl_by(16, 16) == 16          # 256 lanes: full width
    assert pick_gl_by(32, 32) == 8           # 32^3: 256-lane grouping
    assert 128 <= pick_gl_by(32, 32) * 32 <= 512
