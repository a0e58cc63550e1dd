"""Thick-restart Lanczos on real-pair vectors — the TPU production eigensolver.

Works on ANY real array layout whose `re_im_axis` has even extent with the
first half = real parts, second half = imaginary parts:

* planar fields [2, 4, 3, T, Z, Y, X]     (re_im_axis=0)
* pallas kernel fields [T, 24, Z, Y*X]    (re_im_axis=1; comp = r*12+s*3+c)

so the eigensolve runs directly on the dslash kernel's native layout with
no relayout per iteration.  Complex dots/axpys decompose into paired real
einsums over (views of) the two halves; the projected matrix is carried as
[m, m, 2] and eigh'd on host.  Restart semantics identical to the complex
eig/lanczos.py (the validation twin).
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
    evecs: jnp.ndarray       # [n_ev, ...field]
    resids: np.ndarray
    n_restarts: int
    converged: bool


def _split(x, ax):
    h = x.shape[ax] // 2
    idx_r = [slice(None)] * x.ndim
    idx_i = [slice(None)] * x.ndim
    idx_r[ax] = slice(0, h)
    idx_i[ax] = slice(h, None)
    return x[tuple(idx_r)], x[tuple(idx_i)]


def _norm(w):
    return jnp.sqrt(jnp.sum(w * w))


def _make_ops(ax):
    """Complex vector algebra on real-pair arrays with re/im split on `ax`
    (for a single vector; basis arrays V have a leading index, split ax+1)."""

    def dots(V, w):
        """d_i = <V_i, w> -> [m1, 2]."""
        re = jnp.einsum("i...,...->i", V, w)
        Vr, Vi = _split(V, ax + 1)
        wr, wi = _split(w, ax)
        im = jnp.einsum("i...,...->i", Vr, wi) - jnp.einsum("i...,...->i", Vi, wr)
        return jnp.stack([re, im], axis=-1)

    def axpy_sub(w, d, V):
        """w - sum_i d_i V_i."""
        dr, di = d[..., 0], d[..., 1]
        Vr, Vi = _split(V, ax + 1)
        wr, wi = _split(w, ax)
        wr = wr - jnp.einsum("i,i...->...", dr, Vr) \
            + jnp.einsum("i,i...->...", di, Vi)
        wi = wi - jnp.einsum("i,i...->...", dr, Vi) \
            - jnp.einsum("i,i...->...", di, Vr)
        return jnp.concatenate([wr, wi], axis=ax)

    def rotate(V, Qr, Qi):
        """V'_k = sum_i Q[i,k] V_i (complex Q in parts) -> [k, ...]."""
        Vr, Vi = _split(V, ax + 1)
        newr = jnp.einsum("ik,i...->k...", Qr, Vr) \
            - jnp.einsum("ik,i...->k...", Qi, Vi)
        newi = jnp.einsum("ik,i...->k...", Qr, Vi) \
            + jnp.einsum("ik,i...->k...", Qi, Vr)
        return jnp.concatenate([newr, newi], axis=ax + 1)

    return dots, axpy_sub, rotate


def _make_cycle(matvec, m, rdtype, ax):
    dots, axpy_sub, _ = _make_ops(ax)

    # donate V/Tmat: the caller rebinds them, and the basis is the dominant
    # HBM object (nKr x field) — donation avoids a full copy per cycle
    @partial(jax.jit, donate_argnums=(0, 1))
    def cycle(V, Tmat, j0):
        def step(j, carry):
            V, Tmat, _ = carry
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


def lanczos_hermitian_realpair(
    matvec: Callable,
    v0: jnp.ndarray,
    n_ev: int,
    n_kr: int,
    re_im_axis: int = 0,
    tol: float = 1e-6,
    max_restarts: int = 100,
    which: str = "SR",
    check_interval: int = 1,
    n_keep: Optional[int] = None,
) -> LanczosPlanarResult:
    """n_ev extremal eigenpairs of a Hermitian operator on real-pair fields."""
    shape = v0.shape
    ax = re_im_axis
    assert shape[ax] % 2 == 0
    rdtype = v0.dtype
    m = n_kr
    k = n_keep or min(n_ev + max(1, (m - n_ev) // 2), m - 2)
    k = max(k, n_ev)

    _, _, rotate = _make_ops(ax)
    cycle = _make_cycle(matvec, m, rdtype, ax)

    v0n = v0 / _norm(v0)
    V = jnp.zeros((m + 1,) + shape, dtype=rdtype).at[0].set(v0n)
    Tmat = jnp.zeros((m, m, 2), dtype=rdtype)

    rotate_jit = jax.jit(rotate)

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
        Qs = q[:, sel]
        Vk = rotate_jit(V[:m], jnp.asarray(Qs.real, rdtype),
                        jnp.asarray(Qs.imag, rdtype))
        V = V.at[:k].set(Vk)
        V = V.at[k].set(V[m])
        Tn = np.zeros((m, m, 2), dtype=np.asarray(Tmat).dtype)
        Tn[np.arange(k), np.arange(k), 0] = theta[sel]
        Tmat = jnp.asarray(Tn)
        j0 = k

    sel_np = np.asarray(sel)[:n_ev]
    Qs = q[:, sel_np]
    evecs = rotate_jit(V[:m], jnp.asarray(Qs.real, rdtype),
                       jnp.asarray(Qs.imag, rdtype))
    nrm = jnp.sqrt(jnp.sum(evecs * evecs,
                           axis=tuple(range(1, evecs.ndim)), keepdims=True))
    evecs = evecs / nrm
    return LanczosPlanarResult(
        evals=theta[sel_np],
        evecs=evecs,
        resids=np.abs(float(beta_m) * q[m - 1, sel_np]),
        n_restarts=restart + 1,
        converged=converged,
    )


def lanczos_hermitian_planar(matvec, v0, n_ev, n_kr, **kw):
    """Planar-layout wrapper (re/im on axis 0)."""
    return lanczos_hermitian_realpair(matvec, v0, n_ev, n_kr, re_im_axis=0,
                                      **kw)
