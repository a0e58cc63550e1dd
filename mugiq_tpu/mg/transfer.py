"""Multigrid transfer operators: block aggregation, orthonormal basis, P/R.

Replaces QUDA's Transfer (consumed by the reference at mg_mugiq.h:40-53 and
prolongateEvec, lib/loop_mugiq.cpp:276-319).  Semantics follow QUDA's
aggregation-based MG:

* geometric blocks of size (bx, by, bz, bt) aggregate fine sites;
* the finest level aggregates spin chirally (spin_block=2: fine spins {0,1}
  and {2,3} -> 2 coarse spins, preserving g5 = diag(1,1,-1,-1)); coarser
  levels keep their 2 spins (spin_block=1);
* the n_vec null vectors are block-orthonormalised per (block, coarse spin)
  aggregate — here via one batched QR (MXU-friendly) instead of Gram-Schmidt.

The orthonormal basis tensor is V: [Tc, Zc, Yc, Xc, ns_c, agg, n_vec] with
agg = block_volume * spin_block * nc_fine; prolongation/restriction are
batched [agg, n_vec] matmuls over blocks.
"""

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BlockGeometry:
    fine_dims: Tuple[int, int, int, int]    # (X, Y, Z, T) extents, ref order
    block: Tuple[int, int, int, int]        # (bx, by, bz, bt)
    ns_fine: int
    nc_fine: int
    spin_block: int

    def __post_init__(self):
        for d, b in zip(self.fine_dims, self.block):
            assert d % b == 0, f"block {self.block} must divide dims {self.fine_dims}"
        assert self.ns_fine % self.spin_block == 0

    @property
    def coarse_dims(self):
        return tuple(d // b for d, b in zip(self.fine_dims, self.block))

    @property
    def ns_coarse(self):
        return self.ns_fine // self.spin_block

    @property
    def block_vol(self):
        bx, by, bz, bt = self.block
        return bx * by * bz * bt

    @property
    def agg(self):
        return self.block_vol * self.spin_block * self.nc_fine


def _block_agg(psi: jnp.ndarray, g: BlockGeometry) -> jnp.ndarray:
    """[T,Z,Y,X,ns,nc] -> [Tc,Zc,Yc,Xc,ns_c,agg].

    agg flattening order: (bt, bz, by, bx, spin-within-block, color)."""
    T, Z, Y, X = psi.shape[:4]
    bx, by, bz, bt = g.block
    r = psi.reshape(T // bt, bt, Z // bz, bz, Y // by, by, X // bx, bx,
                    g.ns_coarse, g.spin_block, g.nc_fine)
    # -> [Tc, Zc, Yc, Xc, ns_c, bt, bz, by, bx, sb, nc]
    r = r.transpose(0, 2, 4, 6, 8, 1, 3, 5, 7, 9, 10)
    return r.reshape(r.shape[:5] + (g.agg,))


def _unblock_agg(phi: jnp.ndarray, g: BlockGeometry) -> jnp.ndarray:
    """Inverse of _block_agg."""
    Tc, Zc, Yc, Xc = phi.shape[:4]
    bx, by, bz, bt = g.block
    r = phi.reshape(Tc, Zc, Yc, Xc, g.ns_coarse, bt, bz, by, bx,
                    g.spin_block, g.nc_fine)
    r = r.transpose(0, 5, 1, 6, 2, 7, 3, 8, 4, 9, 10)
    # [Tc, bt, Zc, bz, Yc, by, Xc, bx, ns_c, sb, nc]
    return r.reshape(Tc * bt, Zc * bz, Yc * by, Xc * bx,
                     g.ns_coarse * g.spin_block, g.nc_fine)


def block_edge_mask(g: BlockGeometry, mu: int, sign: int) -> jnp.ndarray:
    """[agg] 0/1 mask of aggregate components whose `sign*mu` neighbour lies
    in the adjacent block (fine coordinate at the block face)."""
    bx, by, bz, bt = g.block
    bdims = (bt, bz, by, bx)                 # order of agg flattening
    axis_of_mu = {0: 3, 1: 2, 2: 1, 3: 0}[mu]
    coords = np.indices(bdims)[axis_of_mu]
    edge = (coords == bdims[axis_of_mu] - 1) if sign > 0 else (coords == 0)
    full = np.broadcast_to(edge[..., None, None],
                           bdims + (g.spin_block, g.nc_fine))
    return jnp.asarray(full.reshape(-1).astype(np.float64))


@dataclass
class Transfer:
    """Orthonormal block-transfer P/R between a fine and a coarse level."""
    geom: BlockGeometry
    V: jnp.ndarray     # [Tc, Zc, Yc, Xc, ns_c, agg, n_vec]

    @classmethod
    def build(cls, null_vecs: jnp.ndarray, block: Tuple[int, int, int, int],
              spin_block: int) -> "Transfer":
        """null_vecs: [n_vec, T, Z, Y, X, ns, nc]."""
        n_vec = null_vecs.shape[0]
        T, Z, Y, X, ns, nc = null_vecs.shape[1:]
        g = BlockGeometry(fine_dims=(X, Y, Z, T), block=tuple(block),
                          ns_fine=ns, nc_fine=nc, spin_block=spin_block)
        blocked = jax.vmap(lambda v: _block_agg(v, g))(null_vecs)
        # -> [Tc, Zc, Yc, Xc, ns_c, agg, n_vec]
        Vraw = jnp.moveaxis(blocked, 0, -1)
        assert g.agg >= n_vec, (
            f"aggregate size {g.agg} must be >= n_vec {n_vec}")
        q, _ = jnp.linalg.qr(Vraw)            # batched reduced QR
        return cls(geom=g, V=q)

    @property
    def coarse_field_shape(self):
        Xc, Yc, Zc, Tc = self.geom.coarse_dims
        return (Tc, Zc, Yc, Xc, self.geom.ns_coarse, self.V.shape[-1])

    def restrict(self, psi: jnp.ndarray) -> jnp.ndarray:
        """R psi: [T,Z,Y,X,ns,nc] -> [Tc,Zc,Yc,Xc,ns_c,n_vec]."""
        h = _block_agg(psi, self.geom)
        return jnp.einsum("tzyxsav,tzyxsa->tzyxsv", jnp.conj(self.V), h)

    def restrict_masked(self, psi: jnp.ndarray, mask_agg: jnp.ndarray) -> jnp.ndarray:
        """R (mask * psi) with mask over the aggregate components."""
        h = _block_agg(psi, self.geom) * mask_agg.astype(psi.dtype)
        return jnp.einsum("tzyxsav,tzyxsa->tzyxsv", jnp.conj(self.V), h)

    def prolong(self, phi: jnp.ndarray) -> jnp.ndarray:
        """P phi: [Tc,Zc,Yc,Xc,ns_c,n_vec] -> [T,Z,Y,X,ns,nc]."""
        h = jnp.einsum("tzyxsav,tzyxsv->tzyxsa", self.V, phi)
        return _unblock_agg(h, self.geom)

    def probe_fine_vectors(self) -> jnp.ndarray:
        """P applied to the coarse unit basis e_{sigma,v} (1 at every coarse
        site): [ns_c * n_vec, T, Z, Y, X, ns, nc].  These are the Galerkin
        probing vectors — just the columns of V scattered to fine sites."""
        ns_c = self.geom.ns_coarse
        n_vec = self.V.shape[-1]
        probes = []
        for s in range(ns_c):
            for v in range(n_vec):
                e = jnp.zeros(self.coarse_field_shape, dtype=self.V.dtype)
                e = e.at[..., s, v].set(1.0)
                probes.append(self.prolong(e))
        return jnp.stack(probes)
