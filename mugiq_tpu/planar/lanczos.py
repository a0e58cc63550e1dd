"""Thick-restart Lanczos on planar vectors — the TPU production eigensolver.

Krylov basis stored as V[m+1, 2, n] (re/im middle, flattened field minor):
the minor dim is the large one, so every dot/axpy runs on full (8, 128)
tiles, and the orthogonalisation/rotation matmuls contract over the basis
index on the MXU.  Identical restart semantics to eig/lanczos.py (complex
validation twin); projected matrix carried as [m, m, 2] and eigh'd on host.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class LanczosPlanarResult:
    evals: np.ndarray
    evecs: jnp.ndarray       # [n_ev, 2, ...field]
    resids: np.ndarray
    n_restarts: int
    converged: bool


def _cdots_all(V, w):
    """d_i = <V_i, w>: V [m1, 2, n], w [2, n] -> [m1, 2]."""
    re = jnp.einsum("irn,rn->i", V, w)
    im = jnp.einsum("in,n->i", V[:, 0], w[1]) \
        - jnp.einsum("in,n->i", V[:, 1], w[0])
    return jnp.stack([re, im], axis=-1)


def _caxpy_sub(w, d, V):
    """w - sum_i d_i V_i."""
    dr, di = d[..., 0], d[..., 1]
    wr = w[0] - jnp.einsum("i,in->n", dr, V[:, 0]) \
        + jnp.einsum("i,in->n", di, V[:, 1])
    wi = w[1] - jnp.einsum("i,in->n", dr, V[:, 1]) \
        - jnp.einsum("i,in->n", di, V[:, 0])
    return jnp.stack([wr, wi])


def _norm(w):
    return jnp.sqrt(jnp.sum(w * w))


def _make_cycle(matvec_flat, n, m, rdtype):
    @partial(jax.jit)
    def cycle(V, Tmat, j0):
        def step(j, carry):
            V, Tmat, _ = carry
            w = matvec_flat(jax.lax.dynamic_index_in_dim(V, j, keepdims=False))
            idx = jnp.arange(m + 1)
            mask = (idx <= j)
            d = _cdots_all(V, w)
            d = jnp.where(mask[:, None], d, 0.0)
            w = _caxpy_sub(w, d, V)
            d2 = _cdots_all(V, w)
            d2 = jnp.where(mask[:, None], d2, 0.0)
            w = _caxpy_sub(w, d2, V)
            dtot = d + d2
            col = dtot[:m]
            colmask = mask[:m]
            setcol = colmask[:, None] & (idx[None, :m] == j)
            setrow = (idx[:m, None] == j) & colmask[None, :]
            Tmat = jnp.where(setcol[..., None], col[:, None, :], Tmat)
            conj_col = col * jnp.asarray([1.0, -1.0], dtype=col.dtype)
            Tmat = jnp.where(setrow[..., None], conj_col[None, :, :], Tmat)
            beta = _norm(w)
            vnext = w / jnp.maximum(beta, jnp.finfo(rdtype).tiny)
            V = jax.lax.dynamic_update_index_in_dim(V, vnext, j + 1, axis=0)
            beta_rc = jnp.stack([beta, jnp.zeros((), rdtype)])
            sub = (idx[:m, None] == j + 1) & (idx[None, :m] == j)
            sup = (idx[:m, None] == j) & (idx[None, :m] == j + 1)
            Tmat = jnp.where(sub[..., None], beta_rc, Tmat)
            Tmat = jnp.where(sup[..., None], beta_rc, Tmat)
            return V, Tmat, beta

        V, Tmat, beta_m = jax.lax.fori_loop(
            j0, m, step, (V, Tmat, jnp.zeros((), rdtype)))
        return V, Tmat, beta_m

    return cycle


def _rotate_basis(V, Q_np, k_or_nev, m, rdtype):
    """V' = V[:m]^T Q (complex rotation in planar parts); Q_np [m, k]."""
    Qr = jnp.asarray(Q_np.real, dtype=rdtype)
    Qi = jnp.asarray(Q_np.imag, dtype=rdtype)
    Vr, Vi = V[:m, 0], V[:m, 1]
    newr = jnp.einsum("ik,in->kn", Qr, Vr) - jnp.einsum("ik,in->kn", Qi, Vi)
    newi = jnp.einsum("ik,in->kn", Qr, Vi) + jnp.einsum("ik,in->kn", Qi, Vr)
    return jnp.stack([newr, newi], axis=1)     # [k, 2, n]


def lanczos_hermitian_planar(
    matvec: Callable,
    v0: jnp.ndarray,
    n_ev: int,
    n_kr: int,
    tol: float = 1e-6,
    max_restarts: int = 100,
    which: str = "SR",
    check_interval: int = 1,
    n_keep: Optional[int] = None,
) -> LanczosPlanarResult:
    """v0: planar field [2, ...]; matvec maps planar field -> planar field."""
    shape = v0.shape
    assert shape[0] == 2
    rdtype = v0.dtype
    n = int(np.prod(shape[1:]))
    m = n_kr
    assert n_ev < m <= n
    k = n_keep or min(n_ev + max(1, (m - n_ev) // 2), m - 2)
    k = max(k, n_ev)

    def matvec_flat(w):
        return matvec(w.reshape(shape)).reshape(2, n)

    cycle = _make_cycle(matvec_flat, n, m, rdtype)

    v0f = v0.reshape(2, n)
    v0f = v0f / _norm(v0f)
    V = jnp.zeros((m + 1, 2, n), dtype=rdtype).at[0].set(v0f)
    Tmat = jnp.zeros((m, m, 2), dtype=rdtype)

    j0 = 0
    converged = False
    theta = q = beta_m = sel = None
    for restart in range(max_restarts):
        V, Tmat, beta_m = cycle(V, Tmat, j0)
        T_host = np.asarray(Tmat[..., 0]) + 1j * np.asarray(Tmat[..., 1])
        theta, q = np.linalg.eigh((T_host + T_host.conj().T) / 2)
        sel = (np.arange(k) if which == "SR"
               else np.arange(m - 1, m - 1 - k, -1))
        beta = float(beta_m)
        resid = np.abs(beta * q[m - 1, sel])
        if (restart + 1) % check_interval == 0 or restart == max_restarts - 1:
            t_np = theta[sel][:n_ev]
            if np.all(resid[:n_ev] < tol * np.maximum(1.0, np.abs(t_np))):
                converged = True
                break
        if restart == max_restarts - 1:
            break
        Vk = _rotate_basis(V, q[:, sel], k, m, rdtype)
        V = V.at[:k].set(Vk)
        V = V.at[k].set(V[m])
        Tn = np.zeros((m, m, 2), dtype=np.asarray(Tmat).dtype)
        Tn[np.arange(k), np.arange(k), 0] = theta[sel]
        Tmat = jnp.asarray(Tn)
        j0 = k

    sel_np = np.asarray(sel)[:n_ev]
    evecs = _rotate_basis(V, q[:, sel_np], n_ev, m, rdtype)
    nrm = jnp.sqrt(jnp.sum(evecs * evecs, axis=(1, 2), keepdims=True))
    evecs = evecs / nrm
    return LanczosPlanarResult(
        evals=theta[sel_np],
        evecs=evecs.reshape((n_ev, 2) + shape[1:]),
        resids=np.abs(float(beta_m) * q[m - 1, sel_np]),
        n_restarts=restart + 1,
        converged=converged,
    )
