"""Krylov-Schur Arnoldi on real-pair fields — production non-normal solver.

The TPU twin of eig/arnoldi.py (no complex dtypes on this backend): device
work (matvec, orthogonalisation, rotation) uses the same real-pair algebra
as planar/lanczos.py; the small m x m Hessenberg eig/Schur runs complex on
host.  Supports the M / Mdag operator choices of the reference
(enum_mugiq.h:20-27) with SR/LR/SM/LM/SI/LI selection.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from ..planar.lanczos import _make_ops, _norm


@dataclass
class ArnoldiRealpairResult:
    evals: np.ndarray
    evecs: jnp.ndarray        # [n_ev, ...field]
    resids: np.ndarray
    n_restarts: int
    converged: bool


def _select(evals, which):
    key = {"SR": evals.real, "LR": -evals.real,
           "SM": np.abs(evals), "LM": -np.abs(evals),
           "SI": evals.imag, "LI": -evals.imag}[which]
    return np.argsort(key, kind="stable")


def _make_cycle(matvec, m, rdtype, ax):
    dots, axpy_sub, _ = _make_ops(ax)

    @partial(jax.jit, donate_argnums=(0, 1))
    def cycle(V, Hmat, j0):
        def step(j, carry):
            V, Hmat, _ = carry
            w = matvec(jax.lax.dynamic_index_in_dim(V, j, keepdims=False))
            idx = jnp.arange(V.shape[0])
            mask = (idx <= j)
            d = dots(V, w)
            d = jnp.where(mask[:, None], d, 0.0)
            w = axpy_sub(w, d, V)
            d2 = dots(V, w)
            d2 = jnp.where(mask[:, None], d2, 0.0)
            w = axpy_sub(w, d2, V)
            dtot = d + d2
            # column j only (general operator: no hermitian mirror)
            setcol = mask[:m, None] & (idx[None, :m] == j)
            Hmat = jnp.where(setcol[..., None], dtot[:m][:, None, :], Hmat)
            beta = _norm(w)
            vnext = w / jnp.maximum(beta, jnp.finfo(rdtype).tiny)
            V = jax.lax.dynamic_update_index_in_dim(V, vnext, j + 1, axis=0)
            beta_rc = jnp.stack([beta, jnp.zeros((), rdtype)])
            sub = (idx[:m, None] == j + 1) & (idx[None, :m] == j)
            Hmat = jnp.where(sub[..., None], beta_rc, Hmat)
            return V, Hmat, beta

        V, Hmat, beta_m = jax.lax.fori_loop(
            j0, m, step, (V, Hmat, jnp.zeros((), rdtype)))
        return V, Hmat, beta_m

    return cycle


def arnoldi_krylov_schur_realpair(
    matvec: Callable,
    v0: jnp.ndarray,
    n_ev: int,
    n_kr: int,
    re_im_axis: int = 0,
    tol: float = 1e-6,
    max_restarts: int = 200,
    which: str = "SM",
    check_interval: int = 1,
) -> ArnoldiRealpairResult:
    shape = v0.shape
    ax = re_im_axis
    rdtype = v0.dtype
    m = n_kr
    k = min(n_ev + max(1, (m - n_ev) // 2), m - 2)

    _, _, rotate = _make_ops(ax)
    rotate_jit = jax.jit(rotate)
    cycle = _make_cycle(matvec, m, rdtype, ax)

    v0n = v0 / _norm(v0)
    V = jnp.zeros((m + 1,) + shape, dtype=rdtype).at[0].set(v0n)
    H = jnp.zeros((m, m, 2), dtype=rdtype)

    j0 = 0
    converged = False
    theta = y = beta = sel = None
    for restart in range(max_restarts):
        V, H, beta_m = cycle(V, H, j0)
        H_host = np.asarray(H[..., 0]) + 1j * np.asarray(H[..., 1])
        beta = float(beta_m)
        theta, y = np.linalg.eig(H_host)
        sel = _select(theta, which)
        resid = np.abs(beta * y[m - 1, sel])
        if (restart + 1) % check_interval == 0 or restart == max_restarts - 1:
            if np.all(resid[:n_ev]
                      < tol * np.maximum(1.0, np.abs(theta[sel][:n_ev]))):
                converged = True
                break
        if restart == max_restarts - 1:
            break
        keymap = {"SR": lambda x: x.real, "LR": lambda x: -x.real,
                  "SM": lambda x: np.abs(x), "LM": lambda x: -np.abs(x),
                  "SI": lambda x: x.imag, "LI": lambda x: -x.imag}[which]
        cutoff = np.sort(keymap(theta))[k - 1]
        T, Q, _sdim = sla.schur(H_host, output="complex",
                                sort=lambda x: bool(keymap(x) <= cutoff))
        Vk = rotate_jit(V[:m], jnp.asarray(Q[:, :k].real, rdtype),
                        jnp.asarray(Q[:, :k].imag, rdtype))
        V = V.at[:k].set(Vk)
        V = V.at[k].set(V[m])
        Hn = np.zeros((m, m), dtype=np.complex128)
        Hn[:k, :k] = T[:k, :k]
        Hn[k, :k] = beta * Q[m - 1, :k]
        H = jnp.asarray(np.stack([Hn.real, Hn.imag], -1), dtype=rdtype)
        j0 = k

    sel_np = sel[:n_ev]
    evecs = rotate_jit(V[:m], jnp.asarray(y[:, sel_np].real, rdtype),
                       jnp.asarray(y[:, sel_np].imag, rdtype))
    nrm = jnp.sqrt(jnp.sum(evecs * evecs,
                           axis=tuple(range(1, evecs.ndim)), keepdims=True))
    evecs = evecs / nrm
    return ArnoldiRealpairResult(
        evals=theta[sel_np],
        evecs=evecs,
        resids=np.abs(beta * y[m - 1, sel_np]),
        n_restarts=restart + 1,
        converged=converged,
    )
