"""Even-odd (Schur-complement) preconditioned Dirac operators.

The reference supports eigensolving the even-odd preconditioned operator
(pc_solve from QUDA_*_PC_SOLVE solve types, lib/eigsolve_mugiq.cpp:169-181).
With the full operator written in parity blocks

    M = [[ A_ee        , -kappa D_eo ],
         [ -kappa D_oe ,  A_oo       ]]

the even-even Schur complements are

    asymmetric (QUDA_MATPC_EVEN_EVEN_ASYMMETRIC):
        M_pc = A_ee - kappa^2 D_eo A_oo^{-1} D_oe
    symmetric  (QUDA_MATPC_EVEN_EVEN):
        M_pc = 1 - kappa^2 A_ee^{-1} D_eo A_oo^{-1} D_oe

(A = 1 for plain Wilson).  TPU-first representation: fields stay in the full
[T,Z,Y,X,4,3] layout with the odd sites zero — parity masks are elementwise
multiplies that XLA fuses into the stencil, and every roll/reduction keeps
the same sharded layout as the full operator.  (A packed half-lattice layout
is a future optimisation; the masked form is what keeps the code path
identical to the full operator's.)

g5-hermiticity survives preconditioning (g5 commutes with A, g5 D g5 = D^dag),
so Mdag = g5 M g5 and the normal operators are Hermitian as required by the
Lanczos eigensolver.
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .params import EigOperator
from .lattice import LatticeGeometry
from .ops.dslash import dslash_hop
from .clover import apply_clover, clover_inverse


def parity_masks(shape_tzyx, dtype):
    """(even, odd) 0/1 masks of shape [T,Z,Y,X,1,1]."""
    geom = LatticeGeometry((shape_tzyx[3], shape_tzyx[2],
                            shape_tzyx[1], shape_tzyx[0]))
    par = jnp.asarray(geom.parity)[..., None, None]
    even = (1 - par).astype(dtype)
    return even, 1.0 - even


def _g5(psi):
    s = jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype=psi.dtype).reshape(1, 1, 1, 1, 4, 1)
    return s * psi


@dataclass
class SchurDirac:
    """Even-even preconditioned Wilson(-clover) operator.

    Acts on full-layout fields supported on even sites (the odd part of the
    input is ignored/zeroed).  ``symmetric`` selects the QUDA_MATPC_EVEN_EVEN
    flavour; otherwise asymmetric.
    """
    U: jnp.ndarray
    kappa: float
    A: Optional[jnp.ndarray] = None          # clover matrix (None = Wilson)
    Ainv: Optional[jnp.ndarray] = None       # site-wise inverse (clover only)
    symmetric: bool = False

    def __post_init__(self):
        self.even, self.odd = parity_masks(self.U.shape[1:5],
                                           jnp.zeros((), self.U.dtype).real.dtype)
        if self.A is not None and self.Ainv is None:
            self.Ainv = clover_inverse(self.A)

    @classmethod
    def from_dirac(cls, dirac, symmetric: bool = False) -> "SchurDirac":
        return cls(U=dirac.U, kappa=dirac.kappa, A=dirac.A, symmetric=symmetric)

    @property
    def field_shape(self):
        return self.U.shape[1:5] + (4, 3)

    @property
    def dtype(self):
        return self.U.dtype

    def project_even(self, psi):
        return self.even * psi

    def _apply_A(self, psi):
        return psi if self.A is None else apply_clover(self.A, psi)

    def _apply_Ainv(self, psi):
        return psi if self.A is None else apply_clover(self.Ainv, psi)

    def M(self, psi):
        pe = self.even * psi
        # D_oe: odd output of the hop applied to the even field
        d_oe = self.odd * dslash_hop(self.U, pe)
        hop_back = self.even * dslash_hop(self.U, self._apply_Ainv(d_oe))
        if self.symmetric:
            return pe - self.kappa ** 2 * self._apply_Ainv(hop_back)
        return self._apply_A(pe) - self.kappa ** 2 * hop_back

    def Mdag(self, psi):
        if self.symmetric and self.A is not None:
            # symmetric clover pc is not g5-hermitian (A_ee^{-1} on the left);
            # build the adjoint explicitly: (1 - k^2 Ainv_e D Ainv_o D)^dag
            pe = self.even * psi
            w = self.even * self._apply_Ainv(pe)   # Ainv_ee^dag = Ainv_ee
            d_oe = self.odd * _g5(dslash_hop(self.U, _g5(w)))   # D_eo^dag
            w = self._apply_Ainv(d_oe)
            w = self.even * _g5(dslash_hop(self.U, _g5(w)))     # D_oe^dag
            return pe - self.kappa ** 2 * w
        return _g5(self.M(_g5(psi)))

    def MdagM(self, psi):
        return self.Mdag(self.M(psi))

    def MMdag(self, psi):
        return self.M(self.Mdag(psi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM, EigOperator.MMdag: self.MMdag}[which]

    # -- full-system reconstruction (Schur solve) --

    def solve_full(self, full_dirac, b, tol=1e-10, maxiter=2000):
        """Solve M_full x = b through the even-even Schur complement:
        x_e from the preconditioned normal equations, then
        x_o = A_oo^{-1} (b_o + kappa D_oe x_e)."""
        from .solvers import cg

        be = self.even * b
        bo = self.odd * b
        # b'_e = b_e + kappa D_eo A_oo^{-1} b_o
        rhs = be + self.kappa * (self.even
                                 * dslash_hop(self.U, self._apply_Ainv(bo)))
        if self.symmetric:
            rhs = self._apply_Ainv(rhs)
        # CG on the pc normal equations
        res = cg(self.MdagM, self.Mdag(rhs), tol=tol, maxiter=maxiter)
        xe = self.even * res.x
        xo = self._apply_Ainv(bo + self.kappa
                              * (self.odd * dslash_hop(self.U, xe)))
        return xe + xo
