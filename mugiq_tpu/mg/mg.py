"""Multigrid environment — the MG_Mugiq analog.

Builds the level hierarchy (null vectors -> Transfer -> Galerkin coarse
operator, recursively for 2-4 levels, matching mg_mugiq.h:40-53) and provides
the recursive prolongation used by the loop pipeline
(prolongateEvec, lib/loop_mugiq.cpp:276-319).
"""

from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp

from ..params import MGParam
from ..utils import log, phase_timer
from .transfer import Transfer
from .coarse import StencilOperator, galerkin_coarse_operator
from .setup import setup_null_vectors


@dataclass
class MGEnv:
    """Holds per-level operators and transfers.  level_ops[0] is the fine
    Dirac operator; level_ops[-1] the coarsest StencilOperator."""
    level_ops: List[object]
    transfers: List[Transfer]
    params: MGParam

    @classmethod
    def build(cls, fine_dirac, params: MGParam) -> "MGEnv":
        n_coarse = params.n_level - 1
        assert len(params.geo_block_size) >= n_coarse, (
            "need a geo_block_size per coarse level")
        assert len(params.n_vec) >= n_coarse, "need an n_vec per coarse level"

        level_ops = [fine_dirac]
        transfers = []
        for lev in range(n_coarse):
            op = level_ops[-1]
            fshape = op.field_shape
            ns_fine = fshape[4]
            spin_block = 2 if ns_fine == 4 else 1
            with phase_timer(f"mg-null-vectors-l{lev}"):
                B = setup_null_vectors(
                    op.MdagM, fshape, op.dtype, params.n_vec[lev],
                    iters=params.setup_iters, seed=params.setup_seed + lev)
            with phase_timer(f"mg-transfer-l{lev}"):
                tr = Transfer.build(B, params.geo_block_size[lev], spin_block)
            with phase_timer(f"mg-galerkin-l{lev}"):
                coarse = galerkin_coarse_operator(op, tr)
            log(f"MGEnv: level {lev + 1} built — coarse dims "
                f"{tr.geom.coarse_dims}, ns={coarse.ns}, nc={coarse.nc}")
            transfers.append(tr)
            level_ops.append(coarse)
        return cls(level_ops=level_ops, transfers=transfers, params=params)

    @property
    def coarsest_op(self):
        return self.level_ops[-1]

    @property
    def n_coarse_levels(self):
        return len(self.transfers)

    def prolongate(self, phi: jnp.ndarray) -> jnp.ndarray:
        """Coarsest-level field -> fine field (recursive Transfer::P chain)."""
        for tr in reversed(self.transfers):
            phi = tr.prolong(phi)
        return phi

    def prolongate_batch(self, phis: jnp.ndarray) -> jnp.ndarray:
        f = self.prolongate
        return jax.jit(jax.vmap(f))(phis)

    def restrict(self, psi: jnp.ndarray) -> jnp.ndarray:
        """Fine field -> coarsest-level field (recursive Transfer::R chain)."""
        for tr in self.transfers:
            psi = tr.restrict(psi)
        return psi
