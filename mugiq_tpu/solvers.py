"""Krylov solvers (CG / BiCGStab).

The reference delegates all solves to QUDA (MG null-vector setup runs QUDA's
setup solver; SURVEY.md §2.3).  These are the TPU-native equivalents, used by
the multigrid null-vector setup and available as public API.
Fixed-iteration bodies run under ``lax.while_loop`` so the whole solve is one
XLA program; reductions over sharded fields become ICI all-reduces.
"""

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SolveResult(NamedTuple):
    x: jnp.ndarray
    resid: jnp.ndarray      # final relative residual
    iters: jnp.ndarray


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def cg(matvec: Callable, b: jnp.ndarray, x0=None, tol: float = 1e-8,
       maxiter: int = 1000) -> SolveResult:
    """Conjugate gradients for a Hermitian positive-definite operator."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    b_norm = jnp.sqrt(jnp.real(_dot(b, b)))

    r0 = b - matvec(x0)

    def cond(state):
        x, r, p, rs, k = state
        return jnp.logical_and(k < maxiter,
                               jnp.sqrt(jnp.real(rs)) > tol * b_norm)

    def body(state):
        x, r, p, rs, k = state
        ap = matvec(p)
        alpha = rs / _dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = _dot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, k + 1

    rs0 = _dot(r0, r0)
    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rs0, jnp.asarray(0)))
    return SolveResult(x=x, resid=jnp.sqrt(jnp.real(rs)) / b_norm, iters=k)


def cgne(matvec_M: Callable, matvec_Mdag: Callable, b: jnp.ndarray,
         x0=None, tol: float = 1e-8, maxiter: int = 1000) -> SolveResult:
    """Solve M x = b via the normal equations MdagM x = Mdag b with CG."""
    bn = matvec_Mdag(b)
    return cg(lambda v: matvec_Mdag(matvec_M(v)), bn, x0=x0, tol=tol,
              maxiter=maxiter)


def cg_realpair(matvec: Callable, b: jnp.ndarray, x0=None, tol: float = 1e-8,
                maxiter: int = 1000) -> SolveResult:
    """CG for a Hermitian-PD operator on real-pair fields (production path:
    no complex dtypes on this TPU backend).  All CG scalars are real for
    HPD systems, so plain real dots over the full real array suffice."""
    x0 = jnp.zeros_like(b) if x0 is None else x0

    def dot(a, c):
        return jnp.sum(a * c)

    b_norm = jnp.sqrt(dot(b, b))
    r0 = b - matvec(x0)

    def cond(state):
        x, r, p, rs, k = state
        return jnp.logical_and(k < maxiter, jnp.sqrt(rs) > tol * b_norm)

    def body(state):
        x, r, p, rs, k = state
        ap = matvec(p)
        alpha = rs / dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = dot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, k + 1

    rs0 = dot(r0, r0)
    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rs0, jnp.asarray(0)))
    return SolveResult(x=x, resid=jnp.sqrt(rs) / b_norm, iters=k)
