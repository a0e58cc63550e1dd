"""Thick-restart Lanczos (TRLM) with optional Chebyshev acceleration.

TPU-native replacement for the QUDA EigenSolver the reference invokes at
/root/reference/lib/eigsolve_mugiq.cpp:278-287 (eig_type TRLM, spectrum SR/LR,
use_poly_acc / poly_deg / a_min / a_max knobs mirrored from
include/eigsolve_mugiq.h:22-30).

Design:
* the Krylov basis lives as one [n_kr+1, n] array; each Lanczos step is a
  matvec + two [n_kr+1, n] GEMV-like passes (full re-orthogonalisation) that
  XLA maps onto the MXU; the basis rotation at restart is a single
  [n_kr, n] x [n_kr, k] matmul (the "batched rotate" of QUDA, done in one go).
* one restart cycle is a single jit-compiled function (static shapes, masked
  `fori_loop` over the fill index); the restart loop itself runs in python
  with host-side convergence checks every `check_interval` restarts.
* the projected matrix is maintained as a dense [n_kr, n_kr] Hermitian
  matrix: thick restarts make it arrow-shaped, and the full-reorth dots give
  the arrow column for free, so no special-casing is needed.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class LanczosResult:
    evals: np.ndarray        # Ritz values of the *iterated* operator, sorted
    evecs: jnp.ndarray       # [n_ev, n] Ritz vectors
    resids: np.ndarray       # residual estimates |beta * q_last|
    n_restarts: int
    converged: bool


def estimate_spectral_edge(matvec: Callable, v0: jnp.ndarray,
                           iters: int = 25, matvec_args: tuple = ()) -> float:
    """Upper spectral edge of a Hermitian PSD operator via power iteration.

    Used to auto-set a_max for Chebyshev acceleration when the caller leaves
    it 0 (the reference forwards a_max from CLI flags; QUDA can also
    auto-estimate).  Returns a 10%-padded estimate.

    matvec_args: operator operands passed as traced arguments (the
    fori_loop traces matvec; closure-captured fields would embed as HLO
    constants — see planar/lanczos._make_cycle).
    """
    @jax.jit
    def run(v0, *args):
        def body(_, v):
            w = matvec(v, *args)
            return w / jnp.linalg.norm(w.reshape(-1))

        v = v0 / jnp.linalg.norm(v0.reshape(-1))
        v = jax.lax.fori_loop(0, iters, body, v)
        return jnp.real(jnp.vdot(v, matvec(v, *args)))

    return float(run(v0, *matvec_args)) * 1.10


def chebyshev_op(matvec: Callable, poly_deg: int, a_min: float, a_max: float) -> Callable:
    """p(A) with p a Chebyshev polynomial damping [a_min, a_max].

    Maps [a_min, a_max] -> [-1, 1]; eigenvalues below a_min are amplified
    exponentially in poly_deg, so the smallest eigenvalues of A become the
    *largest* of p(A).  Matches QUDA's polynomial acceleration semantics
    (poly_deg / a_min / a_max, include/eigsolve_mugiq.h:27-30).
    """
    d = 0.5 * (a_max - a_min)
    c = 0.5 * (a_max + a_min)

    def scaled(v, *args):
        return (matvec(v, *args) - c * v) / d

    def apply(v, *args):
        """Extra positional args are forwarded to matvec (operator operands
        threaded as traced jit arguments — see planar/lanczos._make_cycle)."""
        if poly_deg == 0:
            return matvec(v, *args)
        tkm1 = v
        tk = scaled(v, *args)
        def body(_, carry):
            tkm1, tk = carry
            tkp1 = 2.0 * scaled(tk, *args) - tkm1
            return tk, tkp1
        tkm1, tk = jax.lax.fori_loop(1, poly_deg, body, (tkm1, tk))
        return tk

    return apply


def _make_cycle(matvec_flat: Callable, n: int, m: int, dtype):
    """Build the jitted single-restart-cycle function.

    Fills the Lanczos factorisation from index j0 to m; V is [m+1, n], Tmat
    is the projected Hermitian [m, m] matrix.  Returns updated (V, Tmat) and
    the final residual norm beta_m (V[m] is the normalised residual vector).
    """

    rdtype = jnp.zeros((), dtype).real.dtype

    @partial(jax.jit, static_argnames=())
    def cycle(V, Tmat, j0):
        def step(j, carry):
            V, Tmat, _ = carry
            w = matvec_flat(jax.lax.dynamic_index_in_dim(V, j, keepdims=False))
            # full re-orthogonalisation against V[0..j] (masked over all rows)
            idx = jnp.arange(m + 1)
            mask = (idx <= j)
            d = jnp.einsum("in,n->i", jnp.conj(V), w)
            d = jnp.where(mask, d, 0.0)
            w = w - jnp.einsum("i,in->n", d, V)
            # second Gram-Schmidt pass for numerical orthogonality
            d2 = jnp.einsum("in,n->i", jnp.conj(V), w)
            d2 = jnp.where(mask, d2, 0.0)
            w = w - jnp.einsum("i,in->n", d2, V)
            dtot = d + d2
            # projected-matrix column j: T[i, j] = <V_i, A V_j>, mirrored
            col = dtot[:m]
            colmask = mask[:m]
            Tmat = jnp.where(colmask[:, None] & (idx[None, :m] == j),
                             col[:, None], Tmat)
            Tmat = jnp.where((idx[:m, None] == j) & colmask[None, :],
                             jnp.conj(col)[None, :], Tmat)
            beta = jnp.linalg.norm(w)
            vnext = w / jnp.maximum(beta, jnp.finfo(w.real.dtype).tiny)
            V = jax.lax.dynamic_update_index_in_dim(V, vnext, j + 1, axis=0)
            # store beta on the (j+1, j) sub-diagonal (mirror handled above
            # when column j+1 is processed; needed explicitly for j = m-1)
            Tmat = jnp.where((idx[:m, None] == j + 1) & (idx[None, :m] == j),
                             beta.astype(dtype), Tmat)
            Tmat = jnp.where((idx[:m, None] == j) & (idx[None, :m] == j + 1),
                             beta.astype(dtype), Tmat)
            return V, Tmat, beta

        V, Tmat, beta_m = jax.lax.fori_loop(
            j0, m, step, (V, Tmat, jnp.zeros((), rdtype)))
        return V, Tmat, beta_m

    return cycle


def lanczos_hermitian(
    matvec: Callable,
    v0: jnp.ndarray,
    n_ev: int,
    n_kr: int,
    tol: float = 1e-8,
    max_restarts: int = 100,
    which: str = "SR",
    check_interval: int = 1,
    n_keep: Optional[int] = None,
) -> LanczosResult:
    """Compute n_ev extremal eigenpairs of a Hermitian operator.

    matvec acts on flattened vectors of the same shape as v0 (any pytree-free
    array); `which` is "SR" (smallest) or "LR" (largest), the two spectrum
    types valid for Lanczos in the reference driver
    (tests/eigensolve.cpp:253-255).
    """
    shape = v0.shape
    dtype = v0.dtype
    n = int(np.prod(shape))
    m = n_kr
    assert n_ev < m <= n, (n_ev, m, n)
    k = n_keep or min(n_ev + max(1, (m - n_ev) // 2), m - 2)
    k = max(k, n_ev)

    def matvec_flat(w):
        return matvec(w.reshape(shape)).reshape(-1)

    cycle = _make_cycle(matvec_flat, n, m, dtype)

    @jax.jit
    def rotate(V, Q_sel, theta_sel):
        # V_new[:k] = sum_i V[i] Q[i, sel]; V_new[k] = old residual V[m]
        Vk = jnp.einsum("ik,in->kn", Q_sel.astype(dtype), V[:m])
        V = V.at[:k].set(Vk)
        V = V.at[k].set(V[m])
        Tm = jnp.zeros((m, m), dtype=dtype)
        Tm = Tm.at[jnp.arange(k), jnp.arange(k)].set(theta_sel.astype(dtype))
        return V, Tm

    v0f = v0.reshape(-1)
    v0f = v0f / jnp.linalg.norm(v0f)
    V = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(v0f)
    Tmat = jnp.zeros((m, m), dtype=dtype)

    j0 = 0
    converged = False
    restarts_done = 0
    theta = q = beta_m = None
    for restart in range(max_restarts):
        V, Tmat, beta_m = cycle(V, Tmat, j0)
        theta, q = jnp.linalg.eigh(Tmat)           # ascending
        if which == "SR":
            sel = jnp.arange(k)
        elif which == "LR":
            sel = jnp.arange(m - 1, m - 1 - k, -1)
        else:
            raise ValueError(f"spectrum {which}: only SR/LR supported by Lanczos")
        resid = jnp.abs(beta_m * q[m - 1, sel])
        restarts_done = restart + 1
        if (restart + 1) % check_interval == 0 or restart == max_restarts - 1:
            r_np = np.asarray(resid[:n_ev])
            t_np = np.asarray(theta)[np.asarray(sel)][:n_ev]
            if np.all(r_np < tol * np.maximum(1.0, np.abs(t_np))):
                converged = True
                break
        if restart == max_restarts - 1:
            break  # keep theta/q consistent with the (unrotated) V for extraction
        V, Tmat = rotate(V, q[:, sel], theta[sel])
        j0 = k

    # final Ritz extraction
    sel_np = np.asarray(sel)
    Q_sel = q[:, sel_np[:n_ev]]
    evecs = jnp.einsum("ik,in->kn", Q_sel.astype(dtype), V[:m])
    # re-normalise (rotation is orthonormal up to roundoff)
    nrm = jnp.linalg.norm(evecs, axis=1, keepdims=True)
    evecs = evecs / nrm
    evals = np.asarray(theta)[sel_np[:n_ev]]
    resids = np.asarray(jnp.abs(beta_m * q[m - 1, sel_np[:n_ev]]))
    return LanczosResult(
        evals=evals,
        evecs=evecs.reshape((n_ev,) + shape),
        resids=resids,
        n_restarts=restarts_done,
        converged=converged,
    )
