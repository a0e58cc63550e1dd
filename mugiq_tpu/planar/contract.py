"""Loop trace contraction in the planar layout."""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.contract import _gamma_flat_np


@lru_cache(maxsize=None)
def _gamma_parts():
    g = _gamma_flat_np()          # [16 gammas, 16 spin-pairs] complex
    return g.real.copy(), g.imag.copy()


def loop_contract_planar(vL: jnp.ndarray, vR: jnp.ndarray,
                         inv_sigma: jnp.ndarray) -> jnp.ndarray:
    """vL/vR [n, 2, 4, 3, T, Z, Y, X] -> loop data [2, 16, T, Z, Y, X].

    resG(be, al) = sum_n w_n sum_c conj(vL)_be^c vR_al^c, projected on the
    16 gamma-basis matrices.  All einsums keep the lattice dims minor.
    """
    w = inv_sigma.astype(vL.dtype)
    wL = vL * w[:, None, None, None, None, None, None, None]
    Lr, Li = wL[:, 0], wL[:, 1]
    Rr, Ri = vR[:, 0], vR[:, 1]
    # conj(L)*R: re = LrRr + LiRi ; im = LrRi - LiRr  (contract n, c)
    rr = jnp.einsum("nbctzyx,nactzyx->batzyx", Lr, Rr, precision=jax.lax.Precision.HIGHEST) \
        + jnp.einsum("nbctzyx,nactzyx->batzyx", Li, Ri, precision=jax.lax.Precision.HIGHEST)
    ri = jnp.einsum("nbctzyx,nactzyx->batzyx", Lr, Ri, precision=jax.lax.Precision.HIGHEST) \
        - jnp.einsum("nbctzyx,nactzyx->batzyx", Li, Rr, precision=jax.lax.Precision.HIGHEST)
    shape = rr.shape[2:]
    rr = rr.reshape((16,) + shape)
    ri = ri.reshape((16,) + shape)
    Gr, Gi = (jnp.asarray(m, dtype=vL.dtype) for m in _gamma_parts())
    outr = jnp.einsum("gp,ptzyx->gtzyx", Gr, rr, precision=jax.lax.Precision.HIGHEST) \
        - jnp.einsum("gp,ptzyx->gtzyx", Gi, ri, precision=jax.lax.Precision.HIGHEST)
    outi = jnp.einsum("gp,ptzyx->gtzyx", Gr, ri, precision=jax.lax.Precision.HIGHEST) \
        + jnp.einsum("gp,ptzyx->gtzyx", Gi, rr, precision=jax.lax.Precision.HIGHEST)
    return jnp.stack([outr, outi])
