"""Loop measurement: contraction vs naive reference, phase matrix / momentum
projection, g5 remap, slot bookkeeping, full pipeline + HDF5 schema."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.gamma import GAMMA_NAMES, gamma_basis, gamma_map_sign, gamma_map_index
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.ops.contract import loop_contract
from mugiq_tpu.ops.phase import phase_matrix, map_gamma_g5, momentum_project
from mugiq_tpu.loop import LoopComputer, LoopComputeParam
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, FTSign,
                              GaugeParam, InvertParam, LoopParam, Spectrum)


def _naive_contract(vL, vR, inv_sigma):
    """Direct transliteration of the loopContract_kernel semantics
    (lib/mugiq_contract_kernels.cu:98-121) in numpy."""
    G = gamma_basis()
    n = vL.shape[0]
    out = np.zeros((16,) + vL.shape[1:5], dtype=np.complex128)
    for i in range(n):
        # resG[x, be, al] = sum_c conj(vL_be^c) vR_al^c
        resG = np.einsum("tzyxbc,tzyxac->tzyxba", vL[i].conj(), vR[i])
        for g in range(16):
            out[g] += inv_sigma[i] * np.einsum("ba,tzyxba->tzyx", G[g], resG)
    return out


def test_contract_vs_naive(geom44):
    n = 3
    vL = jnp.stack([fields.random_spinor(geom44, seed=s) for s in range(n)])
    vR = jnp.stack([fields.random_spinor(geom44, seed=10 + s) for s in range(n)])
    w = np.asarray([0.7, 1.3, 2.1])
    out = np.asarray(loop_contract(vL, vR, jnp.asarray(w)))
    ref = _naive_contract(np.asarray(vL), np.asarray(vR), w)
    np.testing.assert_allclose(out, ref, atol=1e-11)


def test_phase_matrix(geom44):
    moms = [(0, 0, 0), (1, 0, 0), (1, -2, 3)]
    ph = np.asarray(phase_matrix(geom44, moms, -1, jnp.complex128))
    assert ph.shape == (4, 4, 4, 3)
    np.testing.assert_allclose(ph[..., 0], 1.0)
    # explicit check at a site
    Lx, Ly, Lz, _ = geom44.dims
    x, y, z = 1, 2, 3
    expect = np.exp(-1j * 2 * np.pi * (1 * x / Lx + (-2) * y / Ly + 3 * z / Lz))
    np.testing.assert_allclose(ph[z, y, x, 2], expect, atol=1e-13)
    # conjugate under sign flip
    ph_p = np.asarray(phase_matrix(geom44, moms, +1, jnp.complex128))
    np.testing.assert_allclose(ph_p, ph.conj(), atol=1e-13)


def test_map_gamma_g5():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((2, 16, 4, 4, 4, 4)) \
        + 1j * rng.standard_normal((2, 16, 4, 4, 4, 4))
    out = np.asarray(map_gamma_g5(jnp.asarray(data)))
    sign = gamma_map_sign()
    idx = gamma_map_index()
    for i in range(16):
        np.testing.assert_allclose(out[:, idx[i]], sign[i] * data[:, i],
                                   atol=1e-14)


def test_momentum_projection_p0_is_spatial_sum(geom44):
    rng = np.random.default_rng(1)
    shape = (1, 16) + geom44.shape_tzyx
    data = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ph = phase_matrix(geom44, [(0, 0, 0)], -1, jnp.complex128)
    out = np.asarray(momentum_project(jnp.asarray(data), ph))
    expect = data.sum(axis=(3, 4, 5))[..., None]
    np.testing.assert_allclose(out, expect, atol=1e-11)


def test_loop_compute_param_bookkeeping(geom44):
    lp = LoopParam(do_nonlocal=True, disp_entries=["+z:1,3", "-x:2"],
                   momenta=[(0, 0, 0)])
    cp = LoopComputeParam.build(geom44, lp)
    # nLoop = 1 (ultra-local) + 3 + 1
    assert cp.n_loop == 5
    assert cp.n_loop_per_entry == [3, 1]
    assert cp.n_loop_offset == [1, 4]
    assert cp.n_data == 5 * 16
    assert cp.slot_labels() == ["disp_0", "disp_+z_1", "disp_+z_2",
                                "disp_+z_3", "disp_-x_2"]


def test_free_field_ultralocal_loop(geom44):
    """Free field, ultra-local, p=0: the g=0 (identity) trace at each site is
    (1/sigma) |v(x)|^2 summed over evecs; for g5 the chiral structure shows."""
    v = fields.random_spinor(geom44, seed=0)
    v = v / jnp.linalg.norm(v.reshape(-1))
    sigma = np.asarray([2.0])
    lp = LoopParam(momenta=[(0, 0, 0)], do_mom_proj=True)
    computer = LoopComputer(geom44, lp, U_disp=fields.unit_gauge(geom44))
    res = computer.compute(v[None], sigma)
    # slot 0, gamma-index 0 is the identity trace
    expect = np.einsum("tzyxsc->tzyx", np.abs(np.asarray(v)) ** 2) / 2.0
    np.testing.assert_allclose(np.asarray(res.data_pos[0, 0]), expect, atol=1e-12)
    # momentum projection at p=0: output gamma slot 15 ('g5') holds the
    # identity-insertion trace (g5*g5 = 1 -> input index 15 comes from ...):
    # L(j) = sign * T(15-j); for j=15, T(0) with sign[0] = +1.
    assert res.data_mom.shape == (1, 1, 16, geom44.Lt)
    t_sum = np.asarray(res.data_pos[0, 0]).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(res.data_mom[0, 0, 15], t_sum, atol=1e-11)


def test_displaced_loop_slots(geom44):
    """Non-local entries fill the right slots; with unit gauge a '+z'
    displacement by n is a shift by n."""
    U = fields.unit_gauge(geom44)
    v = fields.random_spinor(geom44, seed=1)
    sigma = np.asarray([1.0])
    lp = LoopParam(momenta=[(0, 0, 0)], do_mom_proj=False, do_nonlocal=True,
                   disp_entries=["+z:1,2"])
    computer = LoopComputer(geom44, lp, U_disp=U)
    res = computer.compute(v[None], sigma)
    assert res.data_pos.shape[0] == 3
    vn = np.asarray(v)
    for n_disp, slot in ((1, 1), (2, 2)):
        shifted = np.roll(vn, -n_disp, axis=1)  # z-axis of [T,Z,Y,X,s,c]
        resG = np.einsum("tzyxbc,tzyxac->tzyxba", vn.conj(), shifted)
        ref0 = np.einsum("ba,tzyxba->tzyx", gamma_basis()[0], resG)
        np.testing.assert_allclose(np.asarray(res.data_pos[slot, 0]), ref0,
                                   atol=1e-12)


def test_full_pipeline_hdf5(tmp_path, geom44):
    """compute_loop end to end on 4^4 free field + HDF5 schema check."""
    from mugiq_tpu.api import compute_loop

    h5file = str(tmp_path / "loops.h5")
    gp = GaugeParam(dims=geom44.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=4, n_kr=24, tol=1e-8, operator=EigOperator.MdagM)
    lp = LoopParam(momenta=[(0, 0, 0), (1, 0, 0)], ft_sign=FTSign.MINUS,
                   do_mom_proj=True, do_nonlocal=True,
                   disp_entries=["+z:1,2"],
                   write_mom_space_hdf5=True, fname_mom_h5=h5file)
    U = fields.unit_gauge(geom44)
    result, eig_res = compute_loop(U, gp, ip, ep, lp)

    assert result.data_mom.shape == (2, 3, 16, geom44.Lt)
    assert os.path.exists(h5file)

    import h5py
    with h5py.File(h5file, "r") as f:
        # reference group schema (loop_mugiq.cpp:579-633)
        assert "mom_+0_+0_+0" in f
        assert "mom_+1_+0_+0" in f
        g = f["mom_+0_+0_+0"]
        assert set(g.keys()) == {"disp_0", "disp_+z_1", "disp_+z_2"}
        for gname in GAMMA_NAMES:
            assert gname in g["disp_0"]
        ds = g["disp_0"]["g5"]["loop"]
        assert ds.shape == (geom44.Lt, 2)
        np.testing.assert_allclose(
            ds[:, 0] + 1j * ds[:, 1], result.data_mom[0, 0, 15], atol=1e-12)
