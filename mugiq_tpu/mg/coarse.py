"""Galerkin coarse operator: construction and application.

Replaces QUDA's DiracCoarse (the operator the reference eigensolves in the
MG path, mg_mugiq.h:37-38) with an explicitly materialised nearest-neighbour
coarse stencil

    (D_c phi)(X) = D[X] phi(X) + sum_mu [ Yp[mu][X] phi(X+mu)
                                        + Ym[mu][X] phi(X-mu) ]

with dense [2*nv, 2*nv] link matrices — batched MXU matmuls over the coarse
volume on TPU.

Construction is exact Galerkin D_c = R A P, computed term-by-term by probing:
the fine operator is a sum of a site-diagonal term and 8 directed hopping
terms (WilsonDirac.diag_term/hop_term — and StencilOperator exposes the same
interface, so coarsening composes recursively for 3+ level hierarchies).
For each coarse basis dof (sigma, v), apply each directed hop to P e_{sigma,v}
and split the restriction by whether the source site lies in the same or the
adjacent block (block-face masks).  Cost: ns_c*n_vec probes x 8 directed hops,
all batched.  Correctness is pinned by the Galerkin identity test
(D_c phi == R(A(P phi))).
"""

from dataclasses import dataclass
from typing import Callable, List

import jax
import jax.numpy as jnp

from ..params import EigOperator
from .transfer import Transfer, block_edge_mask

#: coarse lattice direction mu -> array axis in [Tc, Zc, Yc, Xc, n] fields
_MU_AXIS = (3, 2, 1, 0)


@dataclass
class StencilOperator:
    """Nearest-neighbour operator with dense links on a [T,Z,Y,X,ns,nc] field."""
    D: jnp.ndarray               # [T,Z,Y,X, n, n], n = ns*nc
    Yp: List[jnp.ndarray]        # 4 x [T,Z,Y,X, n, n]: couples phi(X+mu)
    Ym: List[jnp.ndarray]        # 4 x [T,Z,Y,X, n, n]: couples phi(X-mu)
    ns: int
    nc: int

    @property
    def field_shape(self):
        return self.D.shape[:4] + (self.ns, self.nc)

    @property
    def dtype(self):
        return self.D.dtype

    def _flat(self, phi):
        return phi.reshape(phi.shape[:4] + (self.ns * self.nc,))

    def _unflat(self, f):
        return f.reshape(f.shape[:4] + (self.ns, self.nc))

    def M(self, phi):
        f = self._flat(phi)
        out = jnp.einsum("tzyxij,tzyxj->tzyxi", self.D, f)
        for mu in range(4):
            ax = _MU_AXIS[mu]
            out = out + jnp.einsum("tzyxij,tzyxj->tzyxi", self.Yp[mu],
                                   jnp.roll(f, -1, axis=ax))
            out = out + jnp.einsum("tzyxij,tzyxj->tzyxi", self.Ym[mu],
                                   jnp.roll(f, +1, axis=ax))
        return self._unflat(out)

    def Mdag(self, phi):
        """Adjoint stencil: (D^dag phi)(X) = D[X]^H phi(X)
        + sum_mu Ym[mu][X+mu]^H phi(X+mu) + Yp[mu][X-mu]^H phi(X-mu)."""
        f = self._flat(phi)

        def ct(link):
            return jnp.conj(jnp.swapaxes(link, -1, -2))

        out = jnp.einsum("tzyxij,tzyxj->tzyxi", ct(self.D), f)
        for mu in range(4):
            ax = _MU_AXIS[mu]
            out = out + jnp.einsum(
                "tzyxij,tzyxj->tzyxi",
                ct(jnp.roll(self.Ym[mu], -1, axis=ax)), jnp.roll(f, -1, axis=ax))
            out = out + jnp.einsum(
                "tzyxij,tzyxj->tzyxi",
                ct(jnp.roll(self.Yp[mu], +1, axis=ax)), jnp.roll(f, +1, axis=ax))
        return self._unflat(out)

    def MdagM(self, phi):
        return self.Mdag(self.M(phi))

    def MMdag(self, phi):
        return self.M(self.Mdag(phi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM, EigOperator.MMdag: self.MMdag}[which]

    # -- term-wise interface for recursive Galerkin coarsening --

    def diag_term(self, phi):
        return self._unflat(jnp.einsum("tzyxij,tzyxj->tzyxi", self.D,
                                       self._flat(phi)))

    def hop_term(self, mu: int, sign: int, phi):
        f = self._flat(phi)
        ax = _MU_AXIS[mu]
        link = self.Yp[mu] if sign > 0 else self.Ym[mu]
        return self._unflat(jnp.einsum("tzyxij,tzyxj->tzyxi", link,
                                       jnp.roll(f, -sign, axis=ax)))


def galerkin_coarse_operator(fine_op, transfer: Transfer) -> StencilOperator:
    """Materialise R A P for a fine operator exposing diag_term/hop_term."""
    g = transfer.geom
    ns_c = g.ns_coarse
    n_vec = transfer.V.shape[-1]
    n = ns_c * n_vec

    probes = transfer.probe_fine_vectors()      # [n, T,Z,Y,X, ns, nc]

    # column index of probe (sigma, v) in the flattened coarse dof order
    # used by StencilOperator._flat: dof = sigma * n_vec + v  (matches the
    # probe stacking order in Transfer.probe_fine_vectors).

    def restrict_cols(fields, mask=None):
        """[n_probe, fine] -> [Tc,Zc,Yc,Xc, n_row, n_col] link matrix."""
        if mask is None:
            r = jax.vmap(transfer.restrict)(fields)
        else:
            r = jax.vmap(lambda h: transfer.restrict_masked(h, mask))(fields)
        # r: [n_col, Tc,Zc,Yc,Xc, ns_c, n_vec] -> [..., n_row, n_col]
        r = jnp.moveaxis(r, 0, -1)                    # [..., ns_c, n_vec, n_col]
        return r.reshape(r.shape[:4] + (n, n))

    dia = restrict_cols(jax.vmap(fine_op.diag_term)(probes))
    Yp, Ym = [], []
    for mu in range(4):
        h_fwd = jax.vmap(lambda p, m=mu: fine_op.hop_term(m, +1, p))(probes)
        h_bwd = jax.vmap(lambda p, m=mu: fine_op.hop_term(m, -1, p))(probes)
        mask_fwd = block_edge_mask(g, mu, +1)
        mask_bwd = block_edge_mask(g, mu, -1)
        Yp.append(restrict_cols(h_fwd, mask_fwd))
        Ym.append(restrict_cols(h_bwd, mask_bwd))
        dia = dia + restrict_cols(h_fwd, 1.0 - mask_fwd) \
                  + restrict_cols(h_bwd, 1.0 - mask_bwd)

    return StencilOperator(D=dia, Yp=Yp, Ym=Ym, ns=ns_c, nc=n_vec)
