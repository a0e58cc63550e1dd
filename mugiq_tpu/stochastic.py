"""Stochastic (Hutchinson) probing estimator for disconnected loops.

The reference computes the *low-mode* part of the disconnected loop from
eigenvectors only (computeCoarseLoop).  Production disconnected-loop
workflows complete this with a stochastically probed remainder; this module
provides the exact-deflation version:

    Tr[Gamma M^{-1}](x)  =  Tr[Gamma Mdefl^{-1}](x)
                          + E_eta[ eta(x)^dag Gamma ((M^{-1} - Mdefl^{-1}) eta)(x) ]

with Mdefl^{-1} = sum_n v_n lambda_n^{-1} (M v_n)^dag the exact inverse on
the deflation subspace (v_n eigenvectors of MdagM), and eta Z4 noise
(E[eta eta^dag] = site-diagonal identity).  The deflated solve converges in
far fewer CG iterations and the estimator variance drops with the low modes
removed.

The per-site, per-gamma data has the same [nLoop=1, 16, T, Z, Y, X] layout
as the eigen pipeline, so the g5 remap / momentum projection / HDF5 writers
apply unchanged.

Note: the eigen-only trace here uses the exact weight (M v_n)/lambda_n,
whereas the reference's low-mode kernel uses the 1/sigma_n approximation
(lib/mugiq_contract_kernels.cu:119-120); both are provided.
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.contract import loop_contract
from .solvers import cg
from .utils import log, phase_timer


def z4_noise(key, shape, dtype):
    """Z4 noise: entries in {1, i, -1, -i} / each site-spin-color unit mod."""
    k = jax.random.randint(key, shape, 0, 4)
    table = jnp.asarray([1.0 + 0j, 1j, -1.0 + 0j, -1j], dtype=dtype)
    return table[k]


@dataclass
class DeflationSpace:
    """Exact inverse on the span of MdagM eigenvectors."""
    evecs: jnp.ndarray        # [n, ...field]
    evals: jnp.ndarray        # [n] real eigenvalues of MdagM
    M_evecs: jnp.ndarray      # [n, ...field] = M v_n

    @classmethod
    def build(cls, dirac_M: Callable, evecs, evals):
        Mv = jax.jit(jax.vmap(dirac_M))(evecs)
        return cls(evecs=evecs, evals=jnp.asarray(np.asarray(evals).real),
                   M_evecs=Mv)

    def apply_inv(self, rhs):
        """Mdefl^{-1} rhs = sum_n v_n lambda_n^{-1} <M v_n, rhs>."""
        dots = jnp.einsum("n...,...->n", jnp.conj(self.M_evecs), rhs)
        return jnp.einsum("n,n...->...", dots / self.evals.astype(dots.dtype),
                          self.evecs)

    def trace_contribution(self):
        """Per-site all-gamma trace of Gamma Mdefl^{-1}:
        sum_n lambda_n^{-1} (M v_n)(x)^dag Gamma v_n(x)."""
        w = 1.0 / np.asarray(self.evals)
        return loop_contract(self.M_evecs, self.evecs, jnp.asarray(w))


def stochastic_loop_trace(
    dirac,
    n_noise: int,
    deflation: Optional[DeflationSpace] = None,
    solver_tol: float = 1e-8,
    solver_maxiter: int = 2000,
    seed: int = 99,
) -> jnp.ndarray:
    """Estimate dataPos[16, T, Z, Y, X] = per-site Tr[Gamma M^{-1}].

    dirac: operator with .M/.Mdag (full-site).  Solves M s = eta through the
    normal equations with CG, deflated when a DeflationSpace is given.
    """
    shape = dirac.field_shape
    dtype = dirac.dtype
    key = jax.random.PRNGKey(seed)

    mdagm = jax.jit(lambda v: dirac.Mdag(dirac.M(v)))
    mdag = jax.jit(dirac.Mdag)

    def solve(rhs):
        if deflation is not None:
            s0 = deflation.apply_inv(rhs)
            r = rhs - dirac.M(s0)
            res = cg(mdagm, mdag(r), tol=solver_tol, maxiter=solver_maxiter)
            return s0 + res.x, res
        res = cg(mdagm, mdag(rhs), tol=solver_tol, maxiter=solver_maxiter)
        return res.x, res

    acc = None
    for i in range(n_noise):
        key, sub = jax.random.split(key)
        eta = z4_noise(sub, shape, dtype)
        with phase_timer("stochastic-solve"):
            s, res = solve(eta)
        log(f"stochastic_loop_trace: noise {i}: CG iters={int(res.iters)} "
            f"resid={float(res.resid):.2e}")
        if deflation is not None:
            # estimate only the remainder: subtract the deflated part of s
            s = s - deflation.apply_inv(eta)
        contrib = loop_contract(eta[None], s[None],
                                jnp.ones((1,), jnp.float64))
        acc = contrib if acc is None else acc + contrib
    data = acc / n_noise
    if deflation is not None:
        data = data + deflation.trace_contribution()
    return data
