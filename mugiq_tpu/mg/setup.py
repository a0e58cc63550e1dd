"""Null-vector (near-kernel) setup for the multigrid hierarchy.

QUDA generates null vectors by approximately solving M x = 0 from random
starts (the reference forwards setup_inv_type/setup_maxiter etc. through
QudaMultigridParam, tests/eigensolve.cpp:406-604).  Here: inverse iteration —
a fixed number of CG iterations on the normal equations per random start,
batched over all vectors with vmap (one XLA program, MXU/ICI friendly).
"""

import jax
import jax.numpy as jnp

from ..solvers import cg


def setup_null_vectors(op_mdagm, field_shape, dtype, n_vec: int,
                       iters: int = 50, seed: int = 7) -> jnp.ndarray:
    """[n_vec, *field_shape] approximate near-kernel vectors of M.

    op_mdagm: the normal operator MdagM (Hermitian PSD).  Inverse iteration
    x ~ (MdagM)^-1 r amplifies the low modes of M; `iters` fixed CG steps
    approximate the inverse.
    """
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    rdt = jnp.zeros((), dtype).real.dtype
    shape = (n_vec,) + tuple(field_shape)
    b = (jax.random.normal(k1, shape, dtype=rdt)
         + 1j * jax.random.normal(k2, shape, dtype=rdt)).astype(dtype)

    def solve_one(rhs):
        res = cg(op_mdagm, rhs, tol=0.0, maxiter=iters)
        x = res.x
        return x / jnp.linalg.norm(x.reshape(-1))

    return jax.jit(jax.vmap(solve_one))(b)
