"""Loop trace contraction on the rc representation (TPU production path)."""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..ops.contract import _gamma_flat_np
from .cplx import ceinsum


@lru_cache(maxsize=None)
def _gamma_flat_rc():
    g = _gamma_flat_np()
    return np.stack([g.real, g.imag], -1)


def loop_contract_rc(vL: jnp.ndarray, vR: jnp.ndarray,
                     inv_sigma: jnp.ndarray) -> jnp.ndarray:
    """rc twin of loop_contract: vL/vR [n,T,Z,Y,X,4,3,2], returns
    [16,T,Z,Y,X,2]."""
    w = inv_sigma.astype(vL.dtype)
    wL = vL * w[:, None, None, None, None, None, None, None]
    resG = ceinsum("ntzyxbc,ntzyxac->tzyxba", wL, vR, conj_a=True)
    G = jnp.asarray(_gamma_flat_rc(), dtype=vL.dtype)
    flat = resG.reshape(resG.shape[:4] + (16, 2))
    return ceinsum("gp,tzyxp->gtzyx", G, flat)
