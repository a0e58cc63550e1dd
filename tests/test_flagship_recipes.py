"""The flagship 32^3x64 recipes, pinned at reduced volume so they cannot rot.

Each test mirrors a committed artifact's configuration (scripts/ is
write-only lab code; these keep the recipes runnable):

* time_production32.json  -> end-to-end compute_loop_production with bf16
  links + bf16 Krylov basis on a 2-device 't' mesh;
* time_eig32.json         -> packed even-odd Schur eigensolve with a
  reused compile_cache (warm-restart protocol);
* eig32_converged.json    -> Chebyshev-windowed pc eigensolve driven to
  deflation-grade residuals with true-residual validation.

Interpret-mode pallas on CPU (slow marker)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam, LoopParam)

GEOM = LatticeGeometry((8, 8, 4, 8))
KAPPA = 0.12


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import mugiq_tpu.pallas.dslash_kernel as dkm
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(dkm.pl, "pallas_call", interp)


@pytest.fixture(scope="module")
def gauge():
    return np.asarray(fields.weak_gauge(GEOM, eps=0.3, seed=1,
                                        dtype=jnp.complex64))


def test_production_recipe_bf16_mesh(gauge, tmp_path):
    """time_production32 recipe: bf16 links + bf16 basis + 't' mesh,
    eigensolve -> loops -> momentum projection -> HDF5."""
    from jax.sharding import Mesh
    from mugiq_tpu.production import compute_loop_production

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    ep = EigParam(n_ev=4, n_kr=12, tol=1e-30, max_restarts=4,
                  operator=EigOperator.MdagM, check_interval=100)
    fname = str(tmp_path / "loops.h5")
    lp = LoopParam(momenta=[(0, 0, 0), (1, 0, 0)], do_mom_proj=True,
                   do_nonlocal=True, disp_entries=["+z:1,1"],
                   write_mom_space_hdf5=True, fname_mom_h5=fname)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("t",))
    res = compute_loop_production(gauge, gp, ip, ep, lp, mesh=mesh,
                                  precision="bf16", basis_precision="bf16")
    assert res.data_mom is not None and np.all(np.isfinite(res.data_mom))
    assert res.data_mom.shape == (2, 2, 16, GEOM.dims[3])
    import h5py
    with h5py.File(fname) as f:
        assert "mom_+1_+0_+0/disp_+z_1/g5/loop" in f


def test_eig_recipe_packed_pc_warm_cache(gauge):
    """time_eig32 recipe: packed even-odd pc eigensolve; the caller-owned
    compile_cache serves repeated solves (the warm-restart protocol)."""
    from mugiq_tpu.production import build_packed_schur
    from mugiq_tpu.planar.lanczos import lanczos_hermitian_realpair

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    op = build_packed_schur(gauge, gp, ip, precision="f32")
    fn, args = op.operator_with_args(EigOperator.MdagM)
    rng = np.random.default_rng(7)
    v0 = jnp.asarray(rng.standard_normal(op.field_shape), dtype=jnp.float32)

    cache = {}
    r1 = lanczos_hermitian_realpair(fn, v0, n_ev=4, n_kr=12, re_im_axis=1,
                                    tol=1e-30, max_restarts=2, which="SR",
                                    check_interval=100, matvec_args=args,
                                    compile_cache=cache)
    key1 = cache["key"]
    cyc1 = cache["cycle"]
    r2 = lanczos_hermitian_realpair(fn, v0, n_ev=4, n_kr=12, re_im_axis=1,
                                    tol=1e-30, max_restarts=4, which="SR",
                                    check_interval=100, matvec_args=args,
                                    compile_cache=cache)
    assert cache["key"] == key1 and cache["cycle"] is cyc1  # no re-trace
    assert np.all(np.isfinite(r2.evals))
    # more restarts must not worsen the extremal Ritz residual
    assert r2.resids[0] <= r1.resids[0] * 1.5


def test_converged_recipe_chebyshev_pc(gauge):
    """eig32_converged recipe: Chebyshev window from a pre-run + edge
    estimate, then drive the pc eigensolve to TRUE residuals <= 1e-5."""
    from mugiq_tpu.production import build_packed_schur
    from mugiq_tpu.planar.lanczos import lanczos_hermitian_realpair
    from mugiq_tpu.eig.lanczos import chebyshev_op, estimate_spectral_edge

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    op = build_packed_schur(gauge, gp, ip, precision="f32")
    fn, args = op.operator_with_args(EigOperator.MdagM)
    rng = np.random.default_rng(7)
    v0 = jnp.asarray(rng.standard_normal(op.field_shape), dtype=jnp.float32)

    edge = estimate_spectral_edge(fn, v0, iters=15, matvec_args=args)
    pre = lanczos_hermitian_realpair(fn, v0, n_ev=8, n_kr=20, re_im_axis=1,
                                     tol=1e-30, max_restarts=4, which="SR",
                                     check_interval=100, matvec_args=args)
    a_min = float(pre.evals[7]) * 1.02
    cheb = chebyshev_op(fn, 16, a_min, float(edge))
    res = lanczos_hermitian_realpair(cheb, v0, n_ev=4, n_kr=20,
                                     re_im_axis=1, tol=1e-30,
                                     max_restarts=8, which="LR",
                                     check_interval=100, matvec_args=args)

    @jax.jit
    def rayleigh(v, *a):
        v = v / jnp.sqrt(jnp.sum(v * v))
        w = fn(v, *a)
        lam = jnp.sum(v * w)
        return lam, jnp.sqrt(jnp.sum((lam * v - w) ** 2))

    rs = []
    for i in range(4):
        lam, r = rayleigh(res.evecs[i], *args)
        rs.append(float(r))
    assert max(rs) <= 1e-5, rs
    # the accelerated solve reached at least as low as the (unconverged)
    # plain pre-run's smallest Ritz estimate
    lams = sorted(float(rayleigh(res.evecs[i], *args)[0]) for i in range(4))
    assert lams[0] <= float(pre.evals[0]) * (1 + 1e-4), (lams[0],
                                                        float(pre.evals[0]))


def test_mg_production_recipe_split_setup(gauge, tmp_path):
    """time_mg32 recipe: MG-deflated production with the on-chip
    split-layout setup forced (mg_setup="split") + hierarchy checkpoint."""
    from mugiq_tpu.params import MGParam
    from mugiq_tpu.production import compute_loop_production

    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=KAPPA)
    ep = EigParam(n_ev=4, n_kr=12, tol=1e-30, max_restarts=3,
                  operator=EigOperator.MdagM, check_interval=100)
    lp = LoopParam(momenta=[(0, 0, 0)], do_mom_proj=True)
    ck = str(tmp_path / "mg.npz")
    mg = MGParam(n_level=2, geo_block_size=[(2, 2, 2, 2)], n_vec=[4],
                 setup_iters=6, vec_outfile=ck)
    r1 = compute_loop_production(gauge, gp, ip, ep, lp, use_mg=True, mg=mg,
                                 mg_setup="split")
    assert np.all(np.isfinite(r1.data_mom))
    mg2 = MGParam(n_level=2, geo_block_size=[(2, 2, 2, 2)], n_vec=[4],
                  setup_iters=6, vec_infile=ck)
    r2 = compute_loop_production(gauge, gp, ip, ep, lp, use_mg=True, mg=mg2,
                                 mg_setup="split")
    np.testing.assert_allclose(r2.evals, r1.evals, rtol=1e-5)
    np.testing.assert_allclose(np.abs(r2.data_mom), np.abs(r1.data_mom),
                               rtol=1e-4, atol=1e-6)
