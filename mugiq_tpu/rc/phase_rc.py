"""Momentum projection on the rc representation (TPU production path)."""

import jax.numpy as jnp
import numpy as np

from ..gamma import gamma_map_sign, gamma_map_index
from .cplx import ceinsum


def map_gamma_g5_rc(data_pos: jnp.ndarray) -> jnp.ndarray:
    """rc twin of map_gamma_g5: gamma axis is axis 1 of
    [l, 16, T, Z, Y, X, 2]."""
    sign = gamma_map_sign()
    idx = gamma_map_index()
    inv = np.argsort(idx)
    s = jnp.asarray(sign[inv], dtype=data_pos.dtype)
    return data_pos[:, jnp.asarray(inv)] * s[None, :, None, None, None, None, None]


def momentum_project_rc(data_pos_mapped: jnp.ndarray,
                        phases_rc: jnp.ndarray) -> jnp.ndarray:
    """dataMom[l, g, t, p, 2] from dataPos[l, g, t, z, y, x, 2] and phases
    [Z, Y, X, P, 2] — the [T*nData, V3] x [V3, Nmom] complex GEMM as 4 real
    MXU GEMMs."""
    return ceinsum("lgtzyx,zyxp->lgtp", data_pos_mapped, phases_rc)
