"""Wilson(-clover) Dirac operator on the real-pair (rc) representation.

The production TPU twin of :mod:`mugiq_tpu.dirac` / :mod:`mugiq_tpu.ops.dslash`
(this backend has no complex dtypes).  Structure is identical: half-spinor
projected 8-direction hopping stencil via rolls + ceinsum; g5-hermiticity
gives Mdag.  Validated against the complex implementation in tests.
"""

from dataclasses import dataclass
from functools import lru_cache
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..params import EigOperator
from ..ops.dslash import _projector_decomp
from ..lattice import MU_TO_AXIS
from .cplx import to_rc, ceinsum


def shift_rc(field: jnp.ndarray, mu: int, sign: int, rank_offset: int = 0):
    """field(x + sign*mu) for rc arrays (extra trailing re/im axis)."""
    axis = MU_TO_AXIS[mu] + rank_offset
    return jnp.roll(field, -sign, axis=axis)


@lru_cache(maxsize=None)
def _projector_rc(mu: int, tag: str):
    q, r = _projector_decomp()[(mu, tag)]
    return np.stack([q.real, q.imag], -1), np.stack([r.real, r.imag], -1)


def _hop_term_rc(U_mu, psi, mu: int, forward: bool):
    q_np, r_np = _projector_rc(mu, "fwd" if forward else "bwd")
    q = jnp.asarray(q_np, dtype=psi.dtype)
    r = jnp.asarray(r_np, dtype=psi.dtype)
    if forward:
        nbr = shift_rc(psi, mu, +1)
        half = ceinsum("hs,tzyxsc->tzyxhc", q, nbr)
        half = ceinsum("tzyxab,tzyxhb->tzyxha", U_mu, half)
    else:
        nbr = shift_rc(psi, mu, -1)
        u_bwd = shift_rc(U_mu, mu, -1)
        half = ceinsum("hs,tzyxsc->tzyxhc", q, nbr)
        half = ceinsum("tzyxba,tzyxhb->tzyxha", u_bwd, half, conj_a=True)
    return ceinsum("sh,tzyxhc->tzyxsc", r, half)


def dslash_hop_rc(U: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """The 8-direction Wilson hopping term on rc arrays.

    U: [4, T, Z, Y, X, 3, 3, 2]; psi: [T, Z, Y, X, 4, 3, 2]."""
    out = None
    for mu in range(4):
        f = _hop_term_rc(U[mu], psi, mu, forward=True)
        b = _hop_term_rc(U[mu], psi, mu, forward=False)
        out = f + b if out is None else out + f + b
    return out


def _g5_rc(psi):
    s = jnp.asarray([1.0, 1.0, -1.0, -1.0],
                    dtype=psi.dtype).reshape(1, 1, 1, 1, 4, 1, 1)
    return s * psi


@dataclass
class WilsonDiracRC:
    """rc twin of WilsonDirac.  U is the phased gauge in rc layout; A the
    optional clover matrix [T,Z,Y,X,4,3,4,3,2]."""
    U: jnp.ndarray
    kappa: float
    A: Optional[jnp.ndarray] = None

    @classmethod
    def from_complex(cls, dirac) -> "WilsonDiracRC":
        return cls(U=to_rc(dirac.U), kappa=dirac.kappa,
                   A=None if dirac.A is None else to_rc(dirac.A))

    def M(self, psi):
        hop = dslash_hop_rc(self.U, psi)
        if self.A is None:
            diag = psi
        else:
            diag = ceinsum("tzyxsaub,tzyxub->tzyxsa", self.A, psi)
        return diag - self.kappa * hop

    def Mdag(self, psi):
        return _g5_rc(self.M(_g5_rc(psi)))

    def MdagM(self, psi):
        return self.Mdag(self.M(psi))

    def MMdag(self, psi):
        return self.M(self.Mdag(psi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM, EigOperator.MMdag: self.MMdag}[which]

    # -- term-wise interface (rc Galerkin probing, mirrors WilsonDirac's) --

    def diag_term(self, psi):
        if self.A is None:
            return psi
        return ceinsum("tzyxsaub,tzyxub->tzyxsa", self.A, psi)

    def hop_term(self, mu: int, sign: int, psi):
        return -self.kappa * _hop_term_rc(self.U[mu], psi, mu,
                                          forward=(sign > 0))

    @property
    def field_shape(self):
        return self.U.shape[1:5] + (4, 3, 2)

    @property
    def dtype(self):
        return self.U.dtype
