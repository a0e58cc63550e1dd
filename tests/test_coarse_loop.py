"""Coarse-space ultra-local loop (legacy formulation) equivalence.

The coarse assembly (mg/coarse_loop.py, from
lib/LEGACY/loop_coarse_ulocal.cu.LEGACY:406-452) must equal the same
factorized contraction evaluated in FINE space with the prolongated
eigenvectors, because R = P^dag:

    <u_m, R f> = <P u_m, f>    for every fine generator f.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam, MGParam)
from mugiq_tpu.mg.coarse_loop import (coarse_loop_ulocal, _gcoeff_np,
                                      _phase_np, _unit_generators_np)

pytestmark = pytest.mark.slow

GEOM = LatticeGeometry((4, 4, 4, 8))
MOMS = [(0, 0, 0), (1, 0, 0)]


def _mg_eigsolve():
    import mugiq_tpu as mq

    U = fields.weak_gauge(GEOM, eps=0.3, seed=7)
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=4, n_kr=12, tol=1e-8, max_restarts=100,
                  operator=EigOperator.MdagM)
    mg = MGParam(n_level=2, geo_block_size=[(2, 2, 2, 2)], n_vec=[6],
                 setup_iters=10)
    eig_res = mq.compute_evecs_mugiq_mg(U, gp, ip, ep, mg)
    return eig_res


def test_coarse_loop_matches_fine_factorized():
    eig_res = _mg_eigsolve()
    env = eig_res.mg_env
    evecs_c = eig_res.evecs                   # coarse eigenvectors
    lam = np.asarray([complex(v).real for v in eig_res.evals])
    w = 1.0 / lam

    got = coarse_loop_ulocal(env, evecs_c, w, GEOM, MOMS, ft_sign=-1)

    # fine-space factorized evaluation with psi_m = P u_m
    psis = [np.asarray(env.prolongate(evecs_c[m]))
            for m in range(evecs_c.shape[0])]
    units = _unit_generators_np(GEOM.dims)
    gco = _gcoeff_np()
    X, Y, Z, T = GEOM.dims
    want = np.zeros_like(got)
    for ipm, mom in enumerate(MOMS):
        ph = _phase_np(GEOM, mom, -1)
        for t in range(T):
            for m, psi in enumerate(psis):
                A = np.asarray([np.vdot(psi, units[i]) for i in range(12)])
                B = np.asarray([np.vdot(units[j][t] * ph[t][..., None, None],
                                        psi[t]) for j in range(12)])
                want[ipm, :, t] += w[m] * np.einsum("nij,i,j->n",
                                                    gco, A, B)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-8 * scale)
