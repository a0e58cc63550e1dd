"""Krylov-Schur (restarted Arnoldi) eigensolver for non-Hermitian operators.

Completes the eigensolver surface for the M / Mdag operator choices
(MuGiqEigOperator, enum_mugiq.h:20-27) that the reference serves through
QUDA's IR-Arnoldi.  Krylov-Schur restarting (Stewart) is the modern
equivalent of implicit restarts: contract the Arnoldi factorisation to the
wanted invariant subspace via an ordered Schur form, keep the residual
coupling row, and continue.

Device work (matvecs, orthogonalisation, basis rotation) runs in jit;
the small m x m Schur decomposition runs on host via scipy.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla


@dataclass
class ArnoldiResult:
    evals: np.ndarray        # complex Ritz values, selection-ordered
    evecs: jnp.ndarray       # [n_ev, ...shape]
    resids: np.ndarray
    n_restarts: int
    converged: bool


def _select(evals: np.ndarray, which: str) -> np.ndarray:
    """Indices sorted so the wanted end comes first."""
    key = {
        "SR": evals.real, "LR": -evals.real,
        "SM": np.abs(evals), "LM": -np.abs(evals),
        "SI": evals.imag, "LI": -evals.imag,
    }[which]
    return np.argsort(key, kind="stable")


def _make_cycle(matvec_flat, n, m, dtype):
    @partial(jax.jit)
    def cycle(V, H, j0):
        def step(j, carry):
            V, H, _ = carry
            w = matvec_flat(jax.lax.dynamic_index_in_dim(V, j, keepdims=False))
            idx = jnp.arange(m + 1)
            mask = idx <= j
            d = jnp.einsum("in,n->i", jnp.conj(V), w)
            d = jnp.where(mask, d, 0.0)
            w = w - jnp.einsum("i,in->n", d, V)
            d2 = jnp.einsum("in,n->i", jnp.conj(V), w)
            d2 = jnp.where(mask, d2, 0.0)
            w = w - jnp.einsum("i,in->n", d2, V)
            dtot = d + d2
            # column j of H (no hermitian mirroring — general operator)
            H = jnp.where(mask[:m, None] & (idx[None, :m] == j),
                          dtot[:m, None], H)
            beta = jnp.linalg.norm(w)
            vnext = w / jnp.maximum(beta, jnp.finfo(w.real.dtype).tiny)
            V = jax.lax.dynamic_update_index_in_dim(V, vnext, j + 1, axis=0)
            H = jnp.where((idx[:m, None] == j + 1) & (idx[None, :m] == j),
                          beta.astype(dtype), H)
            return V, H, beta

        rdtype = jnp.zeros((), dtype).real.dtype
        V, H, beta = jax.lax.fori_loop(j0, m, step, (V, H, jnp.zeros((), rdtype)))
        return V, H, beta

    return cycle


def arnoldi_krylov_schur(
    matvec: Callable,
    v0: jnp.ndarray,
    n_ev: int,
    n_kr: int,
    tol: float = 1e-8,
    max_restarts: int = 200,
    which: str = "SM",
    check_interval: int = 1,
) -> ArnoldiResult:
    shape = v0.shape
    dtype = v0.dtype
    n = int(np.prod(shape))
    m = n_kr
    assert n_ev < m <= n
    k = min(n_ev + max(1, (m - n_ev) // 2), m - 2)

    def matvec_flat(w):
        return matvec(w.reshape(shape)).reshape(-1)

    cycle = _make_cycle(matvec_flat, n, m, dtype)

    @jax.jit
    def rotate(V, Q_sel):
        Vk = jnp.einsum("ik,in->kn", Q_sel.astype(dtype), V[:m])
        V = V.at[:k].set(Vk)
        V = V.at[k].set(V[m])
        return V

    v0f = v0.reshape(-1)
    v0f = v0f / jnp.linalg.norm(v0f)
    V = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(v0f)
    H = jnp.zeros((m, m), dtype=dtype)

    j0 = 0
    converged = False
    theta = y = beta_m = sel = None
    H_host = None
    for restart in range(max_restarts):
        V, H, beta_m = cycle(V, H, j0)
        H_host = np.asarray(H)
        beta = float(beta_m)
        theta, y = np.linalg.eig(H_host)
        sel = _select(theta, which)
        resid = np.abs(beta * y[m - 1, sel])
        if (restart + 1) % check_interval == 0 or restart == max_restarts - 1:
            if np.all(resid[:n_ev] < tol * np.maximum(1.0, np.abs(theta[sel][:n_ev]))):
                converged = True
                break
        if restart == max_restarts - 1:
            break
        # ordered Schur form: wanted Ritz values in the leading block.
        # scipy has no ordschur; use schur(sort=pred) with a cutoff on the
        # selection key (ties may grow the kept block slightly).
        keymap = {
            "SR": lambda x: x.real, "LR": lambda x: -x.real,
            "SM": lambda x: np.abs(x), "LM": lambda x: -np.abs(x),
            "SI": lambda x: x.imag, "LI": lambda x: -x.imag,
        }[which]
        cutoff = np.sort(keymap(theta))[k - 1]
        T, Q, _sdim = sla.schur(H_host, output="complex",
                                sort=lambda x: bool(keymap(x) <= cutoff))
        # Any leading block of a Schur form spans a nested invariant subspace
        # (T triangular), so truncating at exactly k columns is always valid;
        # ties beyond k just converge in a later restart.
        # Contract the factorisation: A Vk = Vk T[:k,:k] + v_res bk with
        # residual coupling row bk = beta * Q[m-1, :k].
        V = rotate(V, jnp.asarray(Q[:, :k]))
        Hn = np.zeros((m, m), dtype=H_host.dtype)
        Hn[:k, :k] = T[:k, :k]
        Hn[k, :k] = beta * Q[m - 1, :k]
        H = jnp.asarray(Hn)
        j0 = k

    sel_np = sel[:n_ev]
    Y = jnp.asarray(y[:, sel_np])
    evecs = jnp.einsum("ik,in->kn", Y.astype(dtype), V[:m])
    nrm = jnp.linalg.norm(evecs, axis=1, keepdims=True)
    evecs = evecs / nrm
    resids = np.abs(float(beta_m) * y[m - 1, sel_np])
    return ArnoldiResult(
        evals=theta[sel_np],
        evecs=evecs.reshape((n_ev,) + shape),
        resids=resids,
        n_restarts=restart + 1,
        converged=converged,
    )
