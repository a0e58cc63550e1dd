"""Eigensolve orchestration — the Eigsolve_Mugiq analog.

Wires the Dirac matrix selection (M/Mdag/MdagM/MMdag,
lib/eigsolve_mugiq.cpp:184-207), the Lanczos driver, and the
validation stage computeEvals (lib/eigsolve_mugiq.cpp:289-315):
Rayleigh-quotient eigenvalues with optional QUDA_MASS_NORMALIZATION
rescale 0.25/kappa^2, residuals ||lambda v - M v||, and singular values
sigma = sqrt(lambda) for the normal operators (consumed as the 1/sigma
weight by the loop contraction, lib/loop_mugiq.cpp:479).
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..params import EigParam, EigOperator, InvertParam, MassNormalization, Spectrum
from .lanczos import lanczos_hermitian, chebyshev_op, estimate_spectral_edge


@dataclass
class EigsolveOutput:
    evecs: jnp.ndarray            # [n_ev, ...field shape]
    evals: np.ndarray             # Rayleigh-quotient eigenvalues (complex)
    evals_lanczos: np.ndarray     # raw Ritz values of the iterated operator
    resids: np.ndarray            # ||lambda v - Op v|| (after mass norm.)
    sigma: Optional[np.ndarray]   # sqrt(lambda) for MdagM / MMdag, else None
    n_restarts: int
    converged: bool


class Eigensolver:
    """Computes eigenpairs of a (Hermitian) Dirac matrix.

    `operator_apply` must be the selected matrix (already M/Mdag/MdagM/MMdag).
    The Hermitian normal operators (MdagM/MMdag) run thick-restart Lanczos;
    the non-normal M/Mdag run Krylov-Schur Arnoldi (the QUDA IR-Arnoldi
    analog).  Polynomial acceleration requires a normal operator, matching
    the reference's check (lib/eigsolve_mugiq.cpp:217-220).
    """

    def __init__(self, operator_apply: Callable, field_shape, dtype,
                 eig_param: EigParam, inv_param: Optional[InvertParam] = None,
                 v0_transform: Optional[Callable] = None):
        """v0_transform: applied to the random start vector — used to project
        into an invariant subspace (e.g. the even-parity subspace of the
        Schur-preconditioned operator, whose complement is a null space)."""
        self.op = operator_apply
        self.field_shape = tuple(field_shape)
        self.dtype = dtype
        self.p = eig_param
        self.inv = inv_param
        self.v0_transform = v0_transform
        self.hermitian = eig_param.operator in (EigOperator.MdagM,
                                                EigOperator.MMdag)
        if not self.hermitian and eig_param.use_poly_acc:
            raise ValueError(
                "Polynomial acceleration with non-symmetric matrices not "
                "supported (matches lib/eigsolve_mugiq.cpp:217-220)")

    def _start_vector(self):
        key = jax.random.PRNGKey(self.p.seed)
        k1, k2 = jax.random.split(key)
        rdt = jnp.zeros((), self.dtype).real.dtype
        re = jax.random.normal(k1, self.field_shape, dtype=rdt)
        im = jax.random.normal(k2, self.field_shape, dtype=rdt)
        v0 = (re + 1j * im).astype(self.dtype)
        if self.v0_transform is not None:
            v0 = self.v0_transform(v0)
        return v0

    def solve(self) -> EigsolveOutput:
        p = self.p
        v0 = self._start_vector()
        op_jit = jax.jit(self.op)

        if not self.hermitian:
            return self._solve_arnoldi(op_jit, v0)

        it_op = op_jit
        it_which = {Spectrum.SR: "SR", Spectrum.LR: "LR"}.get(p.spectrum)
        if it_which is None:
            raise ValueError(
                f"spectrum {p.spectrum} unsupported by Lanczos (SR/LR only), "
                "matching the reference driver check (tests/eigensolve.cpp:253)")
        if p.use_poly_acc:
            if p.spectrum != Spectrum.SR:
                raise ValueError("Chebyshev acceleration targets the SR end")
            a_max = p.a_max if p.a_max > 0 else estimate_spectral_edge(op_jit, v0)
            a_min = p.a_min
            it_op = jax.jit(chebyshev_op(self.op, p.poly_deg, a_min, a_max))
            it_which = "LR"   # smallest of A -> largest of p(A)

        res = lanczos_hermitian(
            it_op, v0,
            n_ev=p.n_ev, n_kr=p.n_kr, tol=p.tol,
            max_restarts=p.max_restarts, which=it_which,
            check_interval=p.check_interval,
        )

        evals, resids = self._compute_evals(res.evecs)
        order = np.argsort(evals.real)
        if p.spectrum == Spectrum.LR:
            order = order[::-1]
        evecs = res.evecs[jnp.asarray(np.ascontiguousarray(order))]
        evals = evals[order]
        resids = resids[order]

        sigma = None
        if self.p.operator in (EigOperator.MdagM, EigOperator.MMdag):
            sigma = np.sqrt(np.maximum(evals.real, 0.0))

        return EigsolveOutput(
            evecs=evecs, evals=evals, evals_lanczos=res.evals,
            resids=resids, sigma=sigma,
            n_restarts=res.n_restarts, converged=res.converged)

    def _solve_arnoldi(self, op_jit, v0) -> EigsolveOutput:
        """Non-Hermitian M/Mdag path via Krylov-Schur Arnoldi."""
        from .arnoldi import arnoldi_krylov_schur

        p = self.p
        res = arnoldi_krylov_schur(
            op_jit, v0, n_ev=p.n_ev, n_kr=p.n_kr, tol=p.tol,
            max_restarts=p.max_restarts, which=p.spectrum.value,
            check_interval=p.check_interval)
        evals, resids = self._compute_evals(res.evecs)
        return EigsolveOutput(
            evecs=res.evecs, evals=evals, evals_lanczos=res.evals,
            resids=resids, sigma=None,
            n_restarts=res.n_restarts, converged=res.converged)

    def _compute_evals(self, evecs):
        """Rayleigh quotients + residuals, replicating computeEvals
        (lib/eigsolve_mugiq.cpp:289-315) including the mass-normalisation
        rescale of w = M v by 0.25/kappa^2 *before* lambda and the residual
        are formed."""
        scale = 1.0
        if (self.inv is not None
                and self.inv.mass_normalization == MassNormalization.MASS):
            scale = 0.25 / (self.inv.kappa ** 2)

        @jax.jit
        def one(v):
            w = self.op(v) * scale
            nrm = jnp.sqrt(jnp.real(jnp.vdot(v, v)))
            lam = jnp.vdot(v, w) / nrm
            r = jnp.linalg.norm((lam * v - w).reshape(-1))
            return lam, r

        lams, rs = [], []
        for i in range(evecs.shape[0]):
            lam, r = one(evecs[i])
            lams.append(complex(lam))
            rs.append(float(r))
        return np.asarray(lams), np.asarray(rs)

    def project(self, evecs, vec):
        """out = sum_i v_i <v_i, vec> — deflation projector
        (projectVector, lib/eigsolve_mugiq.cpp:340-348)."""
        dots = jnp.einsum("i...,...->i", jnp.conj(evecs), vec)
        return jnp.einsum("i,i...->...", dots, evecs)
