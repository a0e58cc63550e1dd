"""Loop trace contraction — all 16 gamma insertions, batched over eigenvectors.

Replaces loopContract_kernel (/root/reference/lib/mugiq_contract_kernels.cu:46-122):

    loopData(x, G) = sum_n (1/sigma_n) * Tr[ vL_n(x)^dag  Gamma(G)  vR_n(x) ]

where the color-trace spin-outer-product resG(be, al) = sum_c conj(vL)_be^c
vR_al^c is projected on each of the 16 gamma-basis matrices.  The reference
sums over eigenvectors via repeated '+=' kernel launches; here the
eigenvector sum is one batched einsum: the (n, c) contraction is a batched
matmul over sites that XLA places on the MXU, and the 16-gamma projection is
a small [16,16] matmul.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..gamma import gamma_basis


@lru_cache(maxsize=None)
def _gamma_flat_np():
    """[16 gammas, 16 spin-pairs] with spin pair (be, al) flattened."""
    return gamma_basis().reshape(16, 16)


def loop_contract(vL: jnp.ndarray, vR: jnp.ndarray, inv_sigma: jnp.ndarray) -> jnp.ndarray:
    """Accumulated trace over a batch of eigenvector pairs.

    vL, vR: [n, T, Z, Y, X, 4, 3]; inv_sigma: [n] real weights (1/sigma_n,
    contract_util.cuh:130-133).  Returns loopData [16, T, Z, Y, X] complex.
    """
    w = inv_sigma.astype(vL.real.dtype)
    wL = vL * w[:, None, None, None, None, None, None]
    # resG[x, be, al] = sum_n sum_c conj(wL)_be^c vR_al^c  (batched over sites)
    resG = jnp.einsum("ntzyxbc,ntzyxac->tzyxba", jnp.conj(wL), vR)
    G = jnp.asarray(_gamma_flat_np(), dtype=vL.dtype)
    return jnp.einsum("gp,tzyxp->gtzyx", G, resG.reshape(resG.shape[:4] + (16,)))


def loop_contract_single(vL: jnp.ndarray, vR: jnp.ndarray, inv_sigma: float) -> jnp.ndarray:
    """Single-pair variant (one eigenvector), for incremental accumulation."""
    return loop_contract(vL[None], vR[None], jnp.asarray([inv_sigma]))
