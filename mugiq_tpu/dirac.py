"""Wilson / Wilson-clover Dirac operators M, M^dag, M^dag M, M M^dag.

Replaces the QUDA Dirac / DiracM / DiracMdag / DiracMdagM / DiracMMdag
machinery the reference builds in createDiracOperator / createNewDiracMatrix
(/root/reference/lib/eigsolve_mugiq.cpp:169-207).

Conventions (QUDA kappa-normalised, DeGrand-Rossi basis):
    Wilson:        M = 1 - kappa * D_hop
    Wilson-clover: M = A - kappa * D_hop,  A the site-diagonal clover term
with antiperiodic-in-time boundary phases folded into the links.

Mass normalisation: with MassNormalization.MASS the reference rescales
M (and hence eigenvalues) by 0.25/kappa^2 for the normal operators
(lib/eigsolve_mugiq.cpp:302); that scaling is applied in the eigensolver's
Rayleigh-quotient stage, not here.
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .params import DslashType, EigOperator, GaugeParam, InvertParam
from .fields import apply_boundary_phase
from .ops.dslash import dslash_hop
from .clover import clover_field, apply_clover


def _g5(psi):
    s = jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype=psi.dtype).reshape(1, 1, 1, 1, 4, 1)
    return s * psi


@dataclass
class WilsonDirac:
    """Wilson(-clover) operator on full-site fields.

    U is the *phased* gauge field [4, T, Z, Y, X, 3, 3]; A (optional) the
    clover matrix from :func:`mugiq_tpu.clover.clover_field`.
    """
    U: jnp.ndarray
    kappa: float
    A: Optional[jnp.ndarray] = None   # clover term; None -> plain Wilson

    def M(self, psi):
        hop = dslash_hop(self.U, psi)
        diag = psi if self.A is None else apply_clover(self.A, psi)
        return diag - self.kappa * hop

    # -- term-wise interface (consumed by the multigrid Galerkin probing) --

    def diag_term(self, psi):
        """Site-diagonal part of M: 1 (Wilson) or the clover A."""
        return psi if self.A is None else apply_clover(self.A, psi)

    def hop_term(self, mu: int, sign: int, psi):
        """Directed hopping contribution to M (including the -kappa):
        sign=+1: -kappa (1-g_mu) U_mu(x) psi(x+mu);
        sign=-1: -kappa (1+g_mu) U_mu^dag(x-mu) psi(x-mu)."""
        from .ops.dslash import _hop_term
        return -self.kappa * _hop_term(self.U[mu], psi, mu, forward=(sign > 0))

    def Mdag(self, psi):
        """M^dag = g5 M g5 (g5-hermiticity of Wilson-clover)."""
        return _g5(self.M(_g5(psi)))

    def MdagM(self, psi):
        return self.Mdag(self.M(psi))

    def MMdag(self, psi):
        return self.M(self.Mdag(psi))

    def operator(self, which: EigOperator) -> Callable:
        return {
            EigOperator.M: self.M,
            EigOperator.Mdag: self.Mdag,
            EigOperator.MdagM: self.MdagM,
            EigOperator.MMdag: self.MMdag,
        }[which]

    @property
    def field_shape(self):
        return self.U.shape[1:5] + (4, 3)

    @property
    def dtype(self):
        return self.U.dtype


def make_dirac(U_unphased: jnp.ndarray, gauge: GaugeParam, inv: InvertParam) -> WilsonDirac:
    """Build the operator from an unphased gauge field + parameters.

    Anisotropy xi = a_s/a_t scales the spatial hopping by 1/xi (folded into
    the spatial links), consistent with the reference's kappa relation
    kappa = 1/(2(1 + 3/xi + m)) (tests/eigensolve.cpp:144-151): at p=0 the
    free-field eigenvalue is then 1 - kappa(6/xi + 2) = 2*kappa*m.
    """
    U = apply_boundary_phase(U_unphased, gauge.antiperiodic_t)
    if gauge.anisotropy != 1.0:
        scale = jnp.asarray([1.0 / gauge.anisotropy] * 3 + [1.0],
                            dtype=U.real.dtype).reshape(4, 1, 1, 1, 1, 1, 1)
        U = U * scale.astype(U.dtype)
    A = None
    if inv.dslash_type == DslashType.CLOVER_WILSON:
        if gauge.anisotropy != 1.0:
            raise NotImplementedError("anisotropic clover not supported")
        A = clover_field(U, inv.kappa, inv.csw)
    return WilsonDirac(U=U, kappa=inv.kappa, A=A)


def dense_matrix(op: Callable, field_shape, dtype) -> jnp.ndarray:
    """Materialise an operator as a dense matrix (testing only; small lattices).

    Columns are op(e_i) for unit basis vectors; dimension prod(field_shape).
    """
    n = 1
    for d in field_shape:
        n *= int(d)
    eye = jnp.eye(n, dtype=dtype)

    def col(e):
        return op(e.reshape(field_shape)).reshape(-1)

    cols = jax.lax.map(col, eye)
    return cols.T
