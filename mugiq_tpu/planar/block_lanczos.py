"""Thick-restart BLOCK Lanczos on real-pair vectors (production eigensolver).

Block generalization of :mod:`planar.lanczos`: each Krylov step applies the
operator to a BLOCK of ``b`` vectors (one batched kernel launch), fully
reorthogonalizes the block (CGS2 against the basis prefix + in-block complex
MGS QR), and records a block-tridiagonal projected matrix.  Degenerate or
clustered eigenvalues (free-field lattices have high multiplicities) are
resolved within one cycle instead of over many restarts, and the per-step
arithmetic runs at batch-``b`` arithmetic intensity.

The reference's eigensolver menu (QUDA TRLM consumed at
/root/reference/lib/eigsolve_mugiq.cpp:278-287) has no block variant; this
is a beyond-reference addition.  Layout/semantics otherwise identical to
``lanczos_hermitian_realpair`` (re/im split on ``re_im_axis``; works on the
pallas kernel layout directly).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .lanczos import (LanczosPlanarResult, _jrot, _make_ops, _norm, _split,
                      _PREC)


def _match(small, V):
    """Reduced-precision basis: cast the SMALL einsum operand down so the
    multi-GB basis is read natively (see planar/lanczos._make_ops.match);
    CPU keeps the promoting mixed-dtype form (no bf16xbf16=f32 dots)."""
    if (V.dtype == jnp.bfloat16 and small.dtype != V.dtype
            and jax.default_backend() != "cpu"):
        return small.astype(V.dtype), jnp.float32
    return small, None


def _dots_block(V, W, ax):
    """d[i, c, w] with c=0: Re<V_i, W_w>, c=1: Im<V_i, W_w> — one V pass.

    V [hi, *field]; W [b, *field] (re/im split on field axis ``ax``)."""
    Wb = jnp.stack([W, jax.vmap(lambda x: _jrot(x, ax))(W)], axis=0)
    Wb, pref = _match(Wb, V)
    return jnp.einsum("i...,cw...->icw", V, Wb, precision=_PREC,
                      preferred_element_type=pref)


def _axpy_sub_block(W, d, V, ax):
    """W_w - sum_i (d[i,0,w] + i d[i,1,w]) V_i; one V pass."""
    dm, pref = _match(d, V)
    C = jnp.einsum("icw,i...->cw...", dm, V, precision=_PREC,
                   preferred_element_type=pref)
    C = C.astype(W.dtype)
    return W - C[0] + jax.vmap(lambda x: _jrot(x, ax))(C[1])


def _qr_block(W, ax, rdtype):
    """Complex MGS QR of the b in-block vectors: W = Q R.

    Returns (Q [b, *field] orthonormal, R [b, b, 2] upper triangular with
    real non-negative diagonal).  b is small and static — fully unrolled."""
    b = W.shape[0]
    q = [W[j] for j in range(b)]
    R = jnp.zeros((b, b, 2), rdtype)
    for j in range(b):
        w = q[j]
        for _ in range(2):                      # MGS x2 (f32 orthogonality)
            for i in range(j):
                rr = jnp.sum(q[i] * w)          # Re<q_i, w>
                ri = jnp.sum(q[i] * _jrot(w, ax))   # Im = <<q_i, J w>>
                w = w - rr * q[i] + ri * _jrot(q[i], ax)
                R = R.at[i, j, 0].add(rr).at[i, j, 1].add(ri)
        nrm = _norm(w)
        R = R.at[j, j, 0].set(nrm)
        q[j] = w / jnp.maximum(nrm, jnp.finfo(rdtype).tiny)
    return jnp.stack(q), R


def _make_block_cycle(matvec_batch, m, b, rdtype, ax,
                      block_prefix: Optional[int] = 12):
    """Jitted block-Krylov cycle: block steps j0b..nb-1 over V [m+b, *field].

    Records the projected matrix exactly like the b=1 cycle (column block +
    conjugate row block + sub/super-diagonal R blocks), with the basis read
    only through full-array einsums on static prefixes (XLA folds
    leading-axis prefix slices into the dots — see planar/lanczos.py)."""
    nb = m // b

    def make_step(hi, op_args):
        """Block step valid while (j+1)*b <= hi (prefix V[:hi] static)."""
        def step(j, carry):
            V, Tmat, _ = carry
            jb = j * b
            # bf16 basis: the stored block feeds the operator AS-IS
            # (kernels upcast in-VMEM); algebra stays rdtype
            Wblk = jax.lax.dynamic_slice_in_dim(V, jb, b, axis=0)
            W = matvec_batch(Wblk, *op_args).astype(rdtype)
            Vp = V[:hi]
            idxh = jnp.arange(hi)
            maskh = (idxh < jb + b)[:, None, None]
            d = jnp.where(maskh, _dots_block(Vp, W, ax), 0.0)
            W = _axpy_sub_block(W, d, Vp, ax)
            d2 = jnp.where(maskh, _dots_block(Vp, W, ax), 0.0)
            W = _axpy_sub_block(W, d2, Vp, ax)
            Q, R = _qr_block(W, ax, rdtype)
            V = jax.lax.dynamic_update_slice_in_dim(V, Q.astype(V.dtype),
                                                    jb + b, axis=0)

            # column block: rows < (j+1)*b of columns jb..jb+b-1
            dc = (d + d2)                                  # [hi, 2, b]
            colblk = jnp.zeros((m, b, 2), rdtype).at[:hi].set(
                jnp.transpose(dc, (0, 2, 1)))
            rowmask = (jnp.arange(m) < jb + b)[:, None, None]
            cur = jax.lax.dynamic_slice(Tmat, (0, jb, 0), (m, b, 2))
            Tmat = jax.lax.dynamic_update_slice(
                Tmat, jnp.where(rowmask, colblk, cur), (0, jb, 0))
            # conjugate row block: rows jb..jb+b-1, columns < (j+1)*b
            rowblk = jnp.transpose(colblk, (1, 0, 2)) * jnp.asarray(
                [1.0, -1.0], rdtype)
            colmask = (jnp.arange(m) < jb + b)[None, :, None]
            cur = jax.lax.dynamic_slice(Tmat, (jb, 0, 0), (b, m, 2))
            Tmat = jax.lax.dynamic_update_slice(
                Tmat, jnp.where(colmask, rowblk, cur), (jb, 0, 0))
            # sub/super-diagonal R blocks (skipped for the residual block:
            # j+1 == nb; R is then returned as the coupling via carry)
            in_range = (jb + b < m)
            off = jnp.minimum(jb + b, m - b)
            cur = jax.lax.dynamic_slice(Tmat, (off, jb, 0), (b, b, 2))
            Tmat = jax.lax.dynamic_update_slice(
                Tmat, jnp.where(in_range, R, cur), (off, jb, 0))
            Rh = jnp.transpose(R, (1, 0, 2)) * jnp.asarray([1.0, -1.0],
                                                           rdtype)
            cur = jax.lax.dynamic_slice(Tmat, (jb, off, 0), (b, b, 2))
            Tmat = jax.lax.dynamic_update_slice(
                Tmat, jnp.where(in_range, Rh, cur), (jb, off, 0))
            return V, Tmat, R

        return step

    s = nb if block_prefix is None else max(1, block_prefix // b)
    bounds = [(bb * s, min((bb + 1) * s, nb))
              for bb in range((nb + s - 1) // s)]

    @partial(jax.jit, donate_argnums=(0, 1))
    def cycle(V, Tmat, j0b, *op_args):
        carry = (V, Tmat, jnp.zeros((b, b, 2), rdtype))
        for lo, hi in bounds:
            carry = jax.lax.fori_loop(jnp.maximum(j0b, lo), hi,
                                      make_step(hi * b, op_args), carry)
        return carry

    return cycle


def _make_block_restart_update(ax, m, b, k, rdtype):
    """V[:k] = rotated Ritz vectors, V[k:k+b] = residual block (old
    V[m:m+b]); T rebuilt on device: diag(theta_sel) + S coupling rows."""
    _, _, rotate = _make_ops(ax)

    @partial(jax.jit, donate_argnums=(0,))
    def restart_update(V, Qr, Qi, theta_sel, S):
        Vk = rotate(V[:m], Qr, Qi)               # [k, ...]
        vres = jax.lax.dynamic_slice_in_dim(V, m, b, axis=0)
        V = jax.lax.dynamic_update_slice_in_dim(V, Vk.astype(V.dtype), 0,
                                                axis=0)
        V = jax.lax.dynamic_update_slice_in_dim(V, vres, k, axis=0)
        Tn = jnp.zeros((m, m, 2), rdtype)
        Tn = Tn.at[jnp.arange(k), jnp.arange(k), 0].set(theta_sel)
        Tn = Tn.at[k:k + b, :k].set(S)           # [b, k, 2]
        Sh = jnp.transpose(S, (1, 0, 2)) * jnp.asarray([1.0, -1.0], rdtype)
        Tn = Tn.at[:k, k:k + b].set(Sh)
        return V, Tn

    return restart_update


def block_lanczos_hermitian_realpair(
    matvec: Callable,
    v0: jnp.ndarray,
    n_ev: int,
    n_kr: int,
    block_size: int = 4,
    re_im_axis: int = 0,
    tol: float = 1e-6,
    max_restarts: int = 100,
    which: str = "SR",
    check_interval: int = 1,
    matvec_batch: Optional[Callable] = None,
    matvec_args: tuple = (),
    v0_is_block: bool = False,
    seed: int = 7,
    sharding=None,
    compile_cache: Optional[dict] = None,
    basis_dtype=None,
) -> LanczosPlanarResult:
    """n_ev extremal eigenpairs of a Hermitian real-pair operator, block
    thick-restart Lanczos with block size ``block_size``.

    v0: one start vector (field shape) — the rest of the first block is
    filled with seeded Gaussian noise — or, with v0_is_block=True, a full
    [block_size, *field] start block.  n_kr is rounded down to a multiple
    of block_size.

    matvec_batch (optional): batched operator [b, *field] -> [b, *field];
    defaults to jax.vmap(matvec, over the block axis only) (safe for the
    BlockSpec pallas kernels, which use no program_id; pass an explicit
    batch for kernels that do).

    matvec_args: operator operands threaded through the jitted cycle as
    traced arguments (see planar/lanczos._make_cycle) — matvec is called
    as matvec(v, *matvec_args).
    """
    from .lanczos import normalize_which
    which = normalize_which(which)
    b = block_size
    ax = re_im_axis
    m = (n_kr // b) * b
    if m < 2 * b:
        raise ValueError(f"n_kr={n_kr} too small for block_size={b}")
    if matvec_batch is None:
        matvec_batch = jax.vmap(
            matvec, in_axes=(0,) + (None,) * len(matvec_args))

    if v0_is_block:
        if v0.shape[0] != b:
            raise ValueError(f"v0 block has {v0.shape[0]} != {b} vectors")
        W0 = v0
        shape = v0.shape[1:]
    else:
        shape = v0.shape
        rng = np.random.default_rng(seed)
        noise = jnp.asarray(rng.standard_normal((b - 1,) + shape), v0.dtype)
        W0 = jnp.concatenate([v0[None], noise], axis=0)
    rdtype = W0.dtype
    bdtype = basis_dtype or rdtype
    assert shape[ax] % 2 == 0

    # keep-count k: multiple of b (block steps restart at offset k)
    k = n_ev + max(1, (m - n_ev) // 2)
    k = min(((k + b - 1) // b) * b, m - b)
    k = max(k, ((n_ev + b - 1) // b) * b)
    if k > m - b:
        raise ValueError(f"n_kr={n_kr} too small: keep={k} + block={b} > "
                         f"m={m}; raise n_kr")

    _, _, rotate = _make_ops(ax)
    cache = compile_cache if compile_cache is not None else {}
    ckey = (m, b, k, shape, str(rdtype), str(bdtype), ax, len(matvec_args))
    if cache.get("key") != ckey:
        cache.clear()
        cache["key"] = ckey
        cache["cycle"] = _make_block_cycle(matvec_batch, m, b, rdtype, ax)
        cache["restart_update"] = _make_block_restart_update(
            ax, m, b, k, rdtype)
        cache["rotate"] = jax.jit(lambda V, Qr, Qi: rotate(V[:m], Qr, Qi))
        cache["pack"] = jax.jit(lambda T, B: jnp.concatenate(
            [jnp.reshape(T, (-1,)), jnp.reshape(B, (-1,))]))

        # basis init INSIDE one jit (mirrors the scalar solver): eager
        # zeros(...).at[:b].set() transiently holds TWO full V buffers
        # (16 GB at 32^3x64 nKr=48) — newly reachable here now that bf16
        # block bases are allowed at large volume
        def _init(W):
            Vz = jnp.zeros((m + b,) + shape, dtype=bdtype)
            return Vz.at[:b].set(_qr_block(W.astype(rdtype),
                                           ax, rdtype)[0].astype(bdtype))

        cache["init"] = (jax.jit(_init, out_shardings=sharding)
                         if sharding is not None else jax.jit(_init))
    cycle = cache["cycle"]
    restart_update = cache["restart_update"]

    V = cache["init"](W0)
    Tmat = jnp.zeros((m, m, 2), dtype=rdtype)

    j0b = 0
    converged = False
    theta = q = sel = None
    S_host = np.zeros((b, n_ev))
    for restart in range(max_restarts):
        V, Tmat, Bres = cycle(V, Tmat, j0b, *matvec_args)
        TB = np.asarray(cache["pack"](Tmat, Bres))
        T2 = TB[:m * m * 2].reshape(m, m, 2)
        B2 = TB[m * m * 2:].reshape(b, b, 2)
        T_host = T2[..., 0] + 1j * T2[..., 1]
        B_host = B2[..., 0] + 1j * B2[..., 1]
        theta, q = np.linalg.eigh((T_host + T_host.conj().T) / 2)
        sel = (np.arange(k) if which == "SR"
               else np.arange(m - 1, m - 1 - k, -1))
        S_host = B_host @ q[m - b:, sel]          # [b, k] coupling
        resid = np.linalg.norm(S_host, axis=0)
        if (restart + 1) % check_interval == 0 or restart == max_restarts - 1:
            t_np = theta[sel][:n_ev]
            if np.all(resid[:n_ev] < tol * np.maximum(1.0, np.abs(t_np))):
                converged = True
                break
        if restart == max_restarts - 1:
            break
        V, Tmat = restart_update(
            V, jnp.asarray(q[:, sel].real, rdtype),
            jnp.asarray(q[:, sel].imag, rdtype),
            jnp.asarray(theta[sel], rdtype),
            jnp.asarray(np.stack([S_host.real, S_host.imag], axis=-1),
                        rdtype))
        j0b = k // b

    sel_np = np.asarray(sel)[:n_ev]
    evecs = cache["rotate"](V, jnp.asarray(q[:, sel_np].real, rdtype),
                            jnp.asarray(q[:, sel_np].imag, rdtype))
    nrm = jnp.sqrt(jnp.sum(evecs * evecs,
                           axis=tuple(range(1, evecs.ndim)), keepdims=True))
    evecs = evecs / nrm
    return LanczosPlanarResult(
        evals=theta[sel_np],
        evecs=evecs,
        resids=np.linalg.norm(S_host[:, :n_ev], axis=0),
        n_restarts=restart + 1,
        converged=converged,
    )
