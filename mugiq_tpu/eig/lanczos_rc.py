"""Thick-restart Lanczos on the rc (real-pair) representation.

The TPU-production twin of :mod:`mugiq_tpu.eig.lanczos` — no complex dtypes
anywhere in the jitted path (this backend rejects them).  The Krylov basis
is V[m+1, n, 2]; complex dots/axpys decompose into paired real einsums; the
projected matrix is carried as Tmat[m, m, 2] and converted to complex only
on host for the (tiny) eigh.  Restart logic is shared semantics with the
complex implementation and validated against it in tests.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..rc.cplx import cnorm2


@dataclass
class LanczosRCResult:
    evals: np.ndarray
    evecs: jnp.ndarray       # [n_ev, ...rc field shape]
    resids: np.ndarray
    n_restarts: int
    converged: bool


def _cdots_all(V, w):
    """d_i = <V_i, w> for all rows: V [m1, n, 2], w [n, 2] -> [m1, 2]."""
    re = jnp.einsum("inc,nc->i", V, w)
    im = jnp.einsum("in,n->i", V[..., 0], w[..., 1]) \
        - jnp.einsum("in,n->i", V[..., 1], w[..., 0])
    return jnp.stack([re, im], axis=-1)


def _caxpy_sub(w, d, V):
    """w - sum_i d_i V_i (complex), d [m1, 2], V [m1, n, 2]."""
    dr, di = d[..., 0], d[..., 1]
    Vr, Vi = V[..., 0], V[..., 1]
    wr = w[..., 0] - jnp.einsum("i,in->n", dr, Vr) + jnp.einsum("i,in->n", di, Vi)
    wi = w[..., 1] - jnp.einsum("i,in->n", dr, Vi) - jnp.einsum("i,in->n", di, Vr)
    return jnp.stack([wr, wi], axis=-1)


def _make_cycle_rc(matvec_flat, n, m, rdtype):
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
            # column j: T[i, j] = d_i; hermitian mirror on row j
            setcol = colmask[:, None] & (idx[None, :m] == j)
            setrow = (idx[:m, None] == j) & colmask[None, :]
            Tmat = jnp.where(setcol[..., None], col[:, None, :], Tmat)
            conj_col = col * jnp.asarray([1.0, -1.0], dtype=col.dtype)
            Tmat = jnp.where(setrow[..., None], conj_col[None, :, :], Tmat)
            beta = jnp.sqrt(cnorm2(w))
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


def lanczos_hermitian_rc(
    matvec: Callable,
    v0: jnp.ndarray,
    n_ev: int,
    n_kr: int,
    tol: float = 1e-6,
    max_restarts: int = 100,
    which: str = "SR",
    check_interval: int = 1,
    n_keep: Optional[int] = None,
) -> LanczosRCResult:
    """n_ev extremal eigenpairs of a Hermitian operator acting on rc fields.

    v0: rc array [..., 2]; matvec maps rc field -> rc field.
    """
    shape = v0.shape
    assert shape[-1] == 2
    rdtype = v0.dtype
    n = int(np.prod(shape[:-1]))
    m = n_kr
    assert n_ev < m <= n
    k = n_keep or min(n_ev + max(1, (m - n_ev) // 2), m - 2)
    k = max(k, n_ev)

    def matvec_flat(w):
        return matvec(w.reshape(shape)).reshape(n, 2)

    cycle = _make_cycle_rc(matvec_flat, n, m, rdtype)

    @jax.jit
    def rotate(V, Qr, theta_sel):
        # Q from host eigh is complex; split into rc parts (Qr [m, k, 2])
        Vr, Vi = V[:m, :, 0], V[:m, :, 1]
        Qre, Qim = Qr[..., 0], Qr[..., 1]
        newr = jnp.einsum("ik,in->kn", Qre, Vr) - jnp.einsum("ik,in->kn", Qim, Vi)
        newi = jnp.einsum("ik,in->kn", Qre, Vi) + jnp.einsum("ik,in->kn", Qim, Vr)
        Vk = jnp.stack([newr, newi], axis=-1)
        V = V.at[:k].set(Vk)
        V = V.at[k].set(V[m])
        Tm = jnp.zeros((m, m, 2), dtype=rdtype)
        Tm = Tm.at[jnp.arange(k), jnp.arange(k), 0].set(theta_sel.astype(rdtype))
        return V, Tm

    v0f = v0.reshape(n, 2)
    v0f = v0f / jnp.sqrt(cnorm2(v0f))
    V = jnp.zeros((m + 1, n, 2), dtype=rdtype).at[0].set(v0f)
    Tmat = jnp.zeros((m, m, 2), dtype=rdtype)

    j0 = 0
    converged = False
    theta = q = beta_m = sel = None
    for restart in range(max_restarts):
        V, Tmat, beta_m = cycle(V, Tmat, j0)
        T_host = np.asarray(Tmat[..., 0]) + 1j * np.asarray(Tmat[..., 1])
        theta, q = np.linalg.eigh((T_host + T_host.conj().T) / 2)
        if which == "SR":
            sel = np.arange(k)
        elif which == "LR":
            sel = np.arange(m - 1, m - 1 - k, -1)
        else:
            raise ValueError(f"spectrum {which}: SR/LR only")
        beta = float(beta_m)
        resid = np.abs(beta * q[m - 1, sel])
        if (restart + 1) % check_interval == 0 or restart == max_restarts - 1:
            t_np = theta[sel][:n_ev]
            if np.all(resid[:n_ev] < tol * np.maximum(1.0, np.abs(t_np))):
                converged = True
                break
        if restart == max_restarts - 1:
            break
        Qsel = q[:, sel]
        Qrc = jnp.asarray(np.stack([Qsel.real, Qsel.imag], -1), dtype=rdtype)
        V, Tmat = rotate(V, Qrc, jnp.asarray(theta[sel]))
        j0 = k

    sel_np = np.asarray(sel)[:n_ev]
    Qsel = q[:, sel_np]
    Qrc = jnp.asarray(np.stack([Qsel.real, Qsel.imag], -1), dtype=rdtype)
    Vr, Vi = V[:m, :, 0], V[:m, :, 1]
    er = jnp.einsum("ik,in->kn", Qrc[..., 0], Vr) \
        - jnp.einsum("ik,in->kn", Qrc[..., 1], Vi)
    ei = jnp.einsum("ik,in->kn", Qrc[..., 0], Vi) \
        + jnp.einsum("ik,in->kn", Qrc[..., 1], Vr)
    evecs = jnp.stack([er, ei], axis=-1)
    nrm = jnp.sqrt(jnp.sum(evecs * evecs, axis=(1, 2), keepdims=True))
    evecs = evecs / nrm
    return LanczosRCResult(
        evals=theta[sel_np],
        evecs=evecs.reshape((n_ev,) + shape),
        resids=np.abs(float(beta_m) * q[m - 1, sel_np]),
        n_restarts=restart + 1,
        converged=converged,
    )
