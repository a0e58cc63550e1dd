"""Wilson(-clover) operator in the planar production layout."""

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

from ..params import EigOperator
from ..ops.dslash_planar import dslash_hop_planar


def _g5_planar(psi):
    s = jnp.asarray([1.0, 1.0, -1.0, -1.0],
                    dtype=psi.dtype).reshape(1, 4, 1, 1, 1, 1, 1)
    return s * psi


def apply_clover_planar(A, psi):
    """A[2,4,3,4,3,T,Z,Y,X] (Hermitian site matrix), psi[2,4,3,T,Z,Y,X]."""
    Ar, Ai = A[0], A[1]
    pr, pi = psi[0], psi[1]
    outr = jnp.einsum("saubtzyx,ubtzyx->satzyx", Ar, pr) \
        - jnp.einsum("saubtzyx,ubtzyx->satzyx", Ai, pi)
    outi = jnp.einsum("saubtzyx,ubtzyx->satzyx", Ar, pi) \
        + jnp.einsum("saubtzyx,ubtzyx->satzyx", Ai, pr)
    return jnp.stack([outr, outi])


@dataclass
class WilsonDiracPlanar:
    """Planar twin of WilsonDirac (the production TPU operator)."""
    U: jnp.ndarray                       # [2, 4, 3, 3, T, Z, Y, X], phased
    kappa: float
    A: Optional[jnp.ndarray] = None      # planar clover or None

    @classmethod
    def from_complex(cls, dirac, dtype=jnp.float32) -> "WilsonDiracPlanar":
        from .convert import gauge_to_planar, clover_to_planar
        return cls(U=gauge_to_planar(dirac.U, dtype), kappa=dirac.kappa,
                   A=None if dirac.A is None else clover_to_planar(dirac.A, dtype))

    def M(self, psi):
        hop = dslash_hop_planar(self.U, psi)
        diag = psi if self.A is None else apply_clover_planar(self.A, psi)
        return diag - self.kappa * hop

    def Mdag(self, psi):
        return _g5_planar(self.M(_g5_planar(psi)))

    def MdagM(self, psi):
        return self.Mdag(self.M(psi))

    def MMdag(self, psi):
        return self.M(self.Mdag(psi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM, EigOperator.MMdag: self.MMdag}[which]

    @property
    def field_shape(self):
        # [2, 4, 3, T, Z, Y, X]
        return (2, 4, 3) + self.U.shape[4:]

    @property
    def dtype(self):
        return self.U.dtype
