"""Wilson operator on the pallas kernel layout — the TPU production operator.

Fields live in the dslash kernel's native [T, 24, Z, Y*X] layout
(comp = r*12 + s*3 + c), so the eigensolver's Krylov algebra, the dslash
kernel, and the g5 applications all share one layout with no per-iteration
transposes.
"""

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..params import EigOperator
from .dslash_kernel import dslash_hop_pallas


def _g5_signs():
    """[24] sign vector: -1 on spin 2,3 components, duplicated for re/im."""
    s = np.ones(24, dtype=np.float32)
    for r in range(2):
        for sp in (2, 3):
            for c in range(3):
                s[r * 12 + sp * 3 + c] = -1.0
    return s


@dataclass
class WilsonDiracKernel:
    """Plain-Wilson production operator (clover pending a planar clover)."""
    U_k: jnp.ndarray      # [T, 4, 18, Z, YX], phased links, kernel layout
    kappa: float
    Y: int                # Y extent (to un-fuse YX when needed)

    def __post_init__(self):
        self.Ut_k = self.U_k[:, 3]
        self._g5 = jnp.asarray(_g5_signs(), dtype=self.U_k.dtype
                               ).reshape(1, 24, 1, 1)

    def M(self, psi):
        hop = dslash_hop_pallas(psi, self.U_k, self.Ut_k, Y=self.Y)
        return psi - self.kappa * hop

    def Mdag(self, psi):
        return self._g5 * self.M(self._g5 * psi)

    def MdagM(self, psi):
        return self.Mdag(self.M(psi))

    def MMdag(self, psi):
        return self.M(self.Mdag(psi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM, EigOperator.MMdag: self.MMdag}[which]

    @property
    def field_shape(self):
        T, _, _, Z, YX = (self.U_k.shape[0], None, None,
                          self.U_k.shape[3], self.U_k.shape[4])
        return (T, 24, Z, YX)

    @property
    def dtype(self):
        return self.U_k.dtype
