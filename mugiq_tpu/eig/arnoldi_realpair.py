"""Krylov-Schur Arnoldi on real-pair fields — production non-normal solver.

The TPU twin of eig/arnoldi.py (no complex dtypes on this backend): device
work (matvec, orthogonalisation, rotation) uses the same real-pair algebra
as planar/lanczos.py; the small m x m Hessenberg eig/Schur runs complex on
host.  Supports the M / Mdag operator choices of the reference
(enum_mugiq.h:20-27) with SR/LR/SM/LM/SI/LI selection.
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from ..planar.lanczos import (_make_cycle, _make_ops, _make_rotate_update,
                              _norm)


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
    matvec_args: tuple = (),
    sharding=None,
    compile_cache: Optional[dict] = None,
) -> ArnoldiRealpairResult:
    """sharding / compile_cache: as in lanczos_hermitian_realpair — shard
    the basis over a device mesh / reuse jitted executables across calls.
    matvec_args: operator operands threaded through the jitted cycle as
    traced arguments (matvec(v, *matvec_args); see
    planar/lanczos._make_cycle)."""
    shape = v0.shape
    ax = re_im_axis
    rdtype = v0.dtype
    m = n_kr
    k = min(n_ev + max(1, (m - n_ev) // 2), m - 2)

    _, _, rotate = _make_ops(ax)
    cache = compile_cache if compile_cache is not None else {}
    ckey = ("arnoldi", m, k, shape, str(rdtype), ax, len(matvec_args))
    if cache.get("key") != ckey:
        cache.clear()
        cache["key"] = ckey
        cache["cycle"] = _make_cycle(matvec, m, rdtype, ax, hermitian=False)
        cache["rotate_update"] = _make_rotate_update(ax, m, k)
        cache["rotate"] = jax.jit(rotate)
        cache["pack"] = jax.jit(lambda H, b: jnp.concatenate(
            [jnp.reshape(H, (-1,)), jnp.reshape(b, (1,))]))
    cycle = cache["cycle"]
    rotate_update = cache["rotate_update"]
    rotate_jit = cache["rotate"]
    pack = cache["pack"]

    v0n = v0 / _norm(v0)
    V = jnp.zeros((m + 1,) + shape, dtype=rdtype).at[0].set(v0n)
    if sharding is not None:
        V = jax.device_put(V, sharding)
    H = jnp.zeros((m, m, 2), dtype=rdtype)

    j0 = 0
    converged = False
    theta = y = beta = sel = None
    for restart in range(max_restarts):
        V, H, beta_m = cycle(V, H, j0, *matvec_args)
        Hb = np.asarray(pack(H, beta_m))      # one host transfer
        beta = float(Hb[-1])
        H2 = Hb[:-1].reshape(m, m, 2)
        H_host = H2[..., 0] + 1j * H2[..., 1]
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
        # zero-padded row m: rotate over the FULL donated V buffer
        Qs = np.vstack([Q[:, :k], np.zeros((1, k), dtype=Q.dtype)])
        V = rotate_update(V, jnp.asarray(Qs.real, rdtype),
                          jnp.asarray(Qs.imag, rdtype))
        Hn = np.zeros((m, m), dtype=np.complex128)
        Hn[:k, :k] = T[:k, :k]
        Hn[k, :k] = beta * Q[m - 1, :k]
        H = jnp.asarray(np.stack([Hn.real, Hn.imag], -1), dtype=rdtype)
        j0 = k

    sel_np = sel[:n_ev]
    Ys = np.vstack([y[:, sel_np], np.zeros((1, n_ev), dtype=y.dtype)])
    evecs = rotate_jit(V, jnp.asarray(Ys.real, rdtype),
                       jnp.asarray(Ys.imag, rdtype))
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
