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

#: all basis einsums run at HIGHEST matmul precision: the TPU MXU default
#: truncates f32 inputs to bf16 per pass, and while that averages out in
#: long-contraction DOTS (~1e-6), einsums whose OUTPUT is a basis vector
#: (rotate/axpy: 48-term sums) leave ~bf16-eps (4e-3) relative noise in
#: every rotated vector — measured as a volume-independent ~3e-3 residual
#: floor on the chip that no restart count or refinement could beat.
_PREC = jax.lax.Precision.HIGHEST


def normalize_which(which: str) -> str:
    """Validate/normalize a spectrum selector for the Hermitian-PSD solvers.

    The production Lanczos solvers serve the normal operators MdagM/MMdag,
    whose spectrum is real and non-negative — magnitude ordering equals
    value ordering, so SM==SR and LM==LR (reference spectrum menu:
    QudaEigSpectrumType, consumed at eigsolve_mugiq.cpp:283-287).  SI/LI
    (imaginary ordering) are meaningless for a real spectrum and anything
    else is a typo: raise instead of silently computing the wrong end.
    """
    w = which.upper()
    if w in ("SR", "SM"):
        return "SR"
    if w in ("LR", "LM"):
        return "LR"
    raise ValueError(
        f"spectrum '{which}' unsupported by the Hermitian production "
        f"eigensolver (PSD operator: use SR/SM or LR/LM; SI/LI need the "
        f"Arnoldi path on a non-normal operator)")


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


def _jrot(x, ax):
    """J x: (xr, xi) -> (xi, -xr) on the re/im split axis.

    For re/im-paired arrays the full-array real dot <<a, b>> = sum a*b
    satisfies Re<a,b> = <<a, b>> and Im<a,b> = <<a, J b>> — so complex
    algebra decomposes into FULL-array einsums plus this cheap single-array
    shuffle, never slicing the large operand."""
    xr, xi = _split(x, ax)
    return jnp.concatenate([xi, -xr], axis=ax)


def _make_ops(ax):
    """Complex vector algebra on real-pair arrays with re/im split on `ax`
    (for a single vector; basis arrays V have a leading index, split ax+1).

    Perf-critical: the Krylov basis V (nKr x field, the dominant HBM
    object) is consumed ONLY by full-array einsums — one V read per op.
    Slicing V into halves would force XLA to materialize ~half-of-V
    copies per Lanczos step (dot operands can't be fused), which measured
    ~8x slower on the chip.  J is applied to the single-vector side
    (dots) or to the small einsum OUTPUT (axpy_sub / rotate) instead."""

    def match(small, V):
        """Cast the SMALL einsum operand to V's dtype when V is stored in
        a REDUCED precision.  A mixed-dtype einsum makes XLA CONVERT the
        large operand (a full f32 copy of the multi-GB bf16 basis per
        pass — measured 12x slower restarts at 32^3); same-dtype inputs +
        preferred_element_type=f32 read V natively with f32 accumulation.
        For f32/f64 bases this is a no-op (pref=None keeps native
        accumulation — f64 especially must not downcast).  CPU backend:
        keep the promoting mixed-dtype form — its dot runtime cannot
        execute BF16 x BF16 = F32."""
        if (V.dtype == jnp.bfloat16 and small.dtype != V.dtype
                and jax.default_backend() != "cpu"):
            return small.astype(V.dtype), jnp.float32
        return small, None

    def dots(V, w):
        """d_i = <V_i, w> -> [m1, 2]; exactly one pass over V."""
        wb, pref = match(jnp.stack([w, _jrot(w, ax)]), V)
        return jnp.einsum("i...,b...->ib", V, wb, precision=_PREC,
                          preferred_element_type=pref)

    def axpy_sub(w, d, V):
        """w - sum_i d_i V_i; exactly one pass over V."""
        dm, pref = match(d, V)
        C = jnp.einsum("ib,i...->b...", dm, V, precision=_PREC,
                       preferred_element_type=pref)
        return w - C[0].astype(w.dtype) + _jrot(C[1].astype(w.dtype), ax)

    def rotate(V, Qr, Qi):
        """V'_k = sum_i Q[i,k] V_i (complex Q in parts) -> [k, ...]."""
        Qb, pref = match(jnp.stack([Qr, Qi]), V)
        C = jnp.einsum("bik,i...->bk...", Qb, V, precision=_PREC,
                       preferred_element_type=pref)
        return C[0] - _jrot(C[1], ax + 1)

    return dots, axpy_sub, rotate


def _make_rotate_update(ax, m, k):
    """V[:k] = rotated basis, V[k] = residual (old V[m]) — one donated jit.
    The projected-matrix rebuild is left to the caller (Krylov-Schur needs
    a dense host-side Schur block; Lanczos uses _make_restart_update)."""
    _, _, rotate = _make_ops(ax)

    @partial(jax.jit, donate_argnums=(0,))
    def rotate_update(V, Qr, Qi):
        Vk = rotate(V, Qr, Qi)
        vres = V[m]
        return V.at[:k].set(Vk).at[k].set(vres)

    return rotate_update


def _make_restart_update(ax, m, k, rdtype, field_shape=None):
    """One jitted, V-donating call for the whole thick-restart update:
    V[:k] = rotated Ritz vectors, V[k] = residual vector (old V[m]),
    T rebuilt on device as diag(theta_sel).  Collapses what was four
    separate dispatches (rotate + two full-V copies + a host T upload)
    into a single executable.

    Large bases use a low-memory rotate: the stacked "bik,i...->bk..."
    form materializes a [2, k, field] temp (9 GB PADDED at 32^3x64
    nKr=32 — it OOMed one v5e chip); splitting into two einsums halves
    the peak temp at the cost of a second pass over V (irrelevant at the
    sizes where it triggers, ~1 ms of extra HBM traffic per restart)."""
    _, _, rotate = _make_ops(ax)
    lowmem = (field_shape is not None
              and 2 * k * int(np.prod(field_shape)) * 4 > 2 * 1024**3)

    def rotate_lowmem(V, Qr, Qi):
        # small operands cast down for reduced-precision bases (see
        # _make_ops.match); f32/f64 bases keep native accumulation
        bf = (V.dtype == jnp.bfloat16
              and jax.default_backend() != "cpu")
        pref = jnp.float32 if bf else None
        cast = (lambda q: q.astype(V.dtype)) if bf else (lambda q: q)
        Cr = jnp.einsum("ik,i...->k...", cast(Qr), V, precision=_PREC,
                        preferred_element_type=pref)
        Ci = jnp.einsum("ik,i...->k...", cast(Qi), V, precision=_PREC,
                        preferred_element_type=pref)
        return Cr - _jrot(Ci, ax + 1)

    rot = rotate_lowmem if lowmem else rotate

    @partial(jax.jit, donate_argnums=(0,))
    def restart_update(V, Qr, Qi, theta_sel):
        Vk = rot(V, Qr, Qi)                       # [k, ...] (rdtype)
        vres = V[m]
        V = V.at[:k].set(Vk.astype(V.dtype)).at[k].set(vres)
        Tn = jnp.zeros((m, m, 2), rdtype)
        Tn = Tn.at[jnp.arange(k), jnp.arange(k), 0].set(theta_sel)
        return V, Tn

    return restart_update


def _make_extract(ax, field_shape, chunk_bytes: int = 1 << 30):
    """Final Ritz-vector extraction V' = rotate(V, Q) with bounded temps.

    The stacked rotate ("bik,i...->bk...") materializes a [2, n_ev, field]
    temp — 6 GB at 32^3x64 nKr=48, which OOMed the extraction even though
    every restart fit.  Chunk the OUTPUT columns instead: each chunk costs
    two passes over V and a [chunk, field] temp."""
    _, _, rotate = _make_ops(ax)
    field_b = 4 * int(np.prod(field_shape))

    def _unitize(E):
        nrm = jnp.sqrt(jnp.sum(E * E, axis=tuple(range(1, E.ndim)),
                               keepdims=True))
        return E / nrm

    @jax.jit
    def one_chunk(V, qr, qi):
        bf = (V.dtype == jnp.bfloat16 and jax.default_backend() != "cpu")
        pref = jnp.float32 if bf else None
        cast = (lambda q: q.astype(V.dtype)) if bf else (lambda q: q)
        Cr = jnp.einsum("ik,i...->k...", cast(qr), V, precision=_PREC,
                        preferred_element_type=pref)
        Ci = jnp.einsum("ik,i...->k...", cast(qi), V, precision=_PREC,
                        preferred_element_type=pref)
        return _unitize(Cr - _jrot(Ci, ax + 1))

    def extract(V, Qr, Qi):
        """Returns a TUPLE of normalized column chunks; the caller frees V
        before concatenating (the single fused chunk+concat program held
        V + all chunks + the concat copy at once and OOMed at 32^3x64)."""
        ncols = Qr.shape[1]
        if 2 * ncols * field_b <= chunk_bytes:
            return (one_chunk(V, Qr, Qi),)
        chunk = max(1, chunk_bytes // (2 * field_b))
        return tuple(one_chunk(V, Qr[:, c0:c0 + chunk], Qi[:, c0:c0 + chunk])
                     for c0 in range(0, ncols, chunk))

    return extract


def _make_cycle(matvec, m, rdtype, ax, block: Optional[int] = 12,
                hermitian: bool = True):
    """Jitted Krylov cycle (steps j0..m-1, CGS2 full reorthogonalization).

    hermitian=True records the Lanczos T (column + conjugate row + real
    beta sub/super-diagonal); hermitian=False records only the Arnoldi/
    Krylov-Schur Hessenberg column + beta sub-diagonal.

    block: the cycle is split into step-blocks; within a block the
    orthogonalization einsums read only the STATIC prefix V[:block_hi].
    XLA folds a leading-axis prefix slice into the dot without a copy
    (measured on-chip: half-prefix dots run at ~0.5x full cost), so this
    cuts average V HBM traffic ~2x on a from-scratch cycle.  block=None
    disables (single fori over V[:m]).

    The returned cycle is called as cycle(V, Tmat, j0, *op_args) and the
    operator as matvec(v, *op_args): operator operands (links, clover)
    MUST flow through as traced arguments — a matvec that closes over
    device arrays embeds them as HLO constants, which bloats every compile
    and overflows the tunnelled backend's compile-request size limit at
    large volumes (604 MB of links at 32^3x64)."""
    dots, axpy_sub, _ = _make_ops(ax)

    def make_step(hi, op_args):
        """Step with prefix V[:hi] (valid for j <= hi-1)."""
        def step(j, carry):
            V, Tmat, _ = carry
            # V may be stored bf16 (mixed-precision basis): the stored
            # vector feeds the operator AS-IS (the pallas kernels upcast
            # in-VMEM — halves the operator's input traffic), the result
            # is upcast, and all algebra stays rdtype (f32) — einsums
            # against the bf16 basis promote, only stores round
            v = jax.lax.dynamic_index_in_dim(V, j, keepdims=False)
            w = matvec(v, *op_args).astype(rdtype)
            Vp = V[:hi]
            idxh = jnp.arange(hi)
            maskh = (idxh <= j)
            d = jnp.where(maskh[:, None], dots(Vp, w), 0.0)
            w = axpy_sub(w, d, Vp)
            d2 = jnp.where(maskh[:, None], dots(Vp, w), 0.0)
            w = axpy_sub(w, d2, Vp)
            col = jnp.zeros((m, 2), rdtype).at[:hi].set(d + d2)
            idx = jnp.arange(m)
            colmask = (idx <= j)
            setcol = colmask[:, None] & (idx[None, :] == j)
            Tmat = jnp.where(setcol[..., None], col[:, None, :], Tmat)
            beta = _norm(w)
            vnext = w / jnp.maximum(beta, jnp.finfo(rdtype).tiny)
            V = jax.lax.dynamic_update_index_in_dim(
                V, vnext.astype(V.dtype), j + 1, axis=0)
            beta_rc = jnp.stack([beta, jnp.zeros((), rdtype)])
            sub = (idx[:, None] == j + 1) & (idx[None, :] == j)
            Tmat = jnp.where(sub[..., None], beta_rc, Tmat)
            if hermitian:
                setrow = (idx[:, None] == j) & colmask[None, :]
                conj_col = col * jnp.asarray([1.0, -1.0], dtype=col.dtype)
                Tmat = jnp.where(setrow[..., None], conj_col[None, :, :],
                                 Tmat)
                sup = (idx[:, None] == j) & (idx[None, :] == j + 1)
                Tmat = jnp.where(sup[..., None], beta_rc, Tmat)
            return V, Tmat, beta

        return step

    s = m if block is None else block
    bounds = [(b * s, min((b + 1) * s, m)) for b in range((m + s - 1) // s)]

    # donate V/Tmat: the caller rebinds them, and the basis is the dominant
    # HBM object (nKr x field) — donation avoids a full copy per cycle
    @partial(jax.jit, donate_argnums=(0, 1))
    def cycle(V, Tmat, j0, *op_args):
        carry = (V, Tmat, jnp.zeros((), rdtype))
        for lo, hi in bounds:
            carry = jax.lax.fori_loop(jnp.maximum(j0, lo), hi,
                                      make_step(hi, op_args), carry)
        return carry

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
    matvec_args: tuple = (),
    sharding=None,
    compile_cache: Optional[dict] = None,
    basis_dtype=None,
    aot_tag: Optional[str] = None,
) -> LanczosPlanarResult:
    """n_ev extremal eigenpairs of a Hermitian operator on real-pair fields.

    matvec_args: operator operands (links, clover blocks) passed through
    the jitted cycle as TRACED arguments — matvec is called as
    matvec(v, *matvec_args).  Pass the fields here rather than closing
    over them: closures embed device arrays as HLO constants (see
    _make_cycle).  A plain closure matvec with matvec_args=() still works.

    sharding (optional): a NamedSharding for the FULL basis [m+1, *field]
    (e.g. parallel.shard_op.krylov_sharding).  The cycle's einsums then
    compile to sharded reductions (all-reduce over ICI) with matvec a
    sharded operator — nothing else changes; pass a matvec built for the
    same mesh (ShardedWilsonKernel).

    basis_dtype (optional, e.g. jnp.bfloat16): storage dtype of the Krylov
    basis V.  All arithmetic (operator, dots, orthogonalization, T) stays
    in v0's dtype — only stores into V round, so a bf16 basis halves the
    dominant HBM traffic of the cycle algebra at large volumes (the
    QUDA half-precision eigensolver analog).  Final residuals bottom out
    near bf16 storage eps (~4e-3 relative) — deflation-grade, not
    spectroscopy-grade.  Default: v0.dtype (exact f32 path).

    compile_cache (optional): a caller-owned dict; the jitted cycle /
    restart-update executables are stashed there so REPEATED eigensolves
    with the same operator skip re-tracing/compiling (each fresh call
    otherwise rebuilds the jit wrappers — ~20 s of compile on the
    tunnelled TPU, which dwarfs the ~0.4 s restarts).  Only pass a cache
    that was created for the SAME matvec (same operator + shapes).

    aot_tag (optional): with the executable disk cache enabled
    (aot_cache.enable_aot_cache), persist/reload the cycle and restart
    executables under this tag so even a COLD PROCESS skips
    trace+lower+compile.  The tag must uniquely identify the matvec
    (operator type, polynomial config, precisions) — shapes/dtypes are
    keyed automatically.
    """
    which = normalize_which(which)
    shape = v0.shape
    ax = re_im_axis
    assert shape[ax] % 2 == 0
    rdtype = v0.dtype
    m = n_kr
    k = n_keep or min(n_ev + max(1, (m - n_ev) // 2), m - 2)
    k = max(k, n_ev)

    bdtype = basis_dtype or rdtype
    _, _, rotate = _make_ops(ax)
    cache = compile_cache if compile_cache is not None else {}
    ckey = (m, k, shape, str(rdtype), str(bdtype), ax, len(matvec_args))
    if cache.get("key") != ckey:
        from ..aot_cache import maybe_aot
        cache.clear()
        cache["key"] = ckey
        wrap = ((lambda f, nm: maybe_aot(f, f"{aot_tag}-{nm}"))
                if aot_tag else (lambda f, nm: f))
        cache["cycle"] = wrap(_make_cycle(matvec, m, rdtype, ax), "cycle")
        cache["restart_update"] = wrap(
            _make_restart_update(ax, m, k, rdtype, field_shape=shape),
            "restart")
        cache["rotate"] = _make_extract(ax, shape)
        # T+beta fetched in ONE host transfer (each tunnel sync ~30 ms)
        cache["pack"] = jax.jit(lambda T, b: jnp.concatenate(
            [jnp.reshape(T, (-1,)), jnp.reshape(b, (1,))]))

        # basis init INSIDE one jit: eager zeros(...).at[0].set() holds two
        # full V buffers transiently (2 x 8 GB at 32^3x64 nKr=80 — OOMed)
        def _init(v):
            Vz = jnp.zeros((m + 1,) + shape, dtype=bdtype)
            return Vz.at[0].set((v / _norm(v)).astype(bdtype))

        cache["init"] = (jax.jit(_init, out_shardings=sharding)
                         if sharding is not None else jax.jit(_init))
    cycle = cache["cycle"]
    restart_update = cache["restart_update"]
    rotate_jit = cache["rotate"]
    pack = cache["pack"]

    V = cache["init"](v0)
    Tmat = jnp.zeros((m, m, 2), dtype=rdtype)

    j0 = 0
    converged = False
    theta = q = beta = sel = None
    for restart in range(max_restarts):
        V, Tmat, beta_m = cycle(V, Tmat, j0, *matvec_args)
        Tb = np.asarray(pack(Tmat, beta_m))
        beta = float(Tb[-1])
        T2 = Tb[:-1].reshape(m, m, 2)
        T_host = T2[..., 0] + 1j * T2[..., 1]
        theta, q = np.linalg.eigh((T_host + T_host.conj().T) / 2)
        sel = (np.arange(k) if which == "SR"
               else np.arange(m - 1, m - 1 - k, -1))
        resid = np.abs(beta * q[m - 1, sel])
        if (restart + 1) % check_interval == 0 or restart == max_restarts - 1:
            t_np = theta[sel][:n_ev]
            if np.all(resid[:n_ev] < tol * np.maximum(1.0, np.abs(t_np))):
                converged = True
                break
        if restart == max_restarts - 1:
            break
        # zero-padded row m: rotate over the FULL V buffer (a V[:m] slice
        # would materialize a near-full copy as the dot operand)
        Qs = np.vstack([q[:, sel], np.zeros((1, k), dtype=q.dtype)])
        V, Tmat = restart_update(V, jnp.asarray(Qs.real, rdtype),
                                 jnp.asarray(Qs.imag, rdtype),
                                 jnp.asarray(theta[sel], rdtype))
        j0 = k

    sel_np = np.asarray(sel)[:n_ev]
    Qs = np.vstack([q[:, sel_np], np.zeros((1, n_ev), dtype=q.dtype)])
    # extraction normalizes in-jit (eager evecs*evecs OOMed at 32^3 nKr=48);
    # chunks come back as a tuple and V is dropped before the concat (the
    # fused form held V + chunks + concat simultaneously)
    chunks = rotate_jit(V, jnp.asarray(Qs.real, rdtype),
                        jnp.asarray(Qs.imag, rdtype))
    V = Tmat = None
    evecs = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
    chunks = None
    return LanczosPlanarResult(
        evals=theta[sel_np],
        evecs=evecs,
        resids=np.abs(beta * q[m - 1, sel_np]),
        n_restarts=restart + 1,
        converged=converged,
    )


def rayleigh_ritz_refine(matvec, evecs, re_im_axis: int = 0,
                         matvec_args: tuple = (), aot_tag: str = None):
    """Second Rayleigh-Ritz pass on the ORIGINAL operator.

    Ritz vectors from a polynomial-accelerated solve bottom out at the
    CLUSTER WIDTH of the spectrum: p(A) cannot separate near-degenerate
    eigenvalues, so each returned vector mixes its cluster and its true
    residual ||Av - lam v|| equals the cluster spacing (measured ~4e-3 at
    32^3x64 — restarts stopped helping).  Projecting A itself onto the
    converged subspace and re-diagonalizing (a generalized 24x24 problem,
    host-side) resolves the clusters to working precision.

    evecs: [n, *field] real-pair Ritz vectors spanning the subspace.
    Returns (evecs', evals', resids') with evecs' unit-norm, ordered by
    ascending eigenvalue.  Device work: n operator applies + small
    projections + one chunked rotation; host: a dense n x n solve.
    """
    import scipy.linalg

    ax = re_im_axis
    n = evecs.shape[0]
    field_shape = evecs.shape[1:]

    # ALL projections accumulate in f64: the f32 reduction noise of a
    # 5e7-element dot (~2e-5 relative) times ||A||/cluster-gap is exactly
    # the ~3e-3 floor the refinement exists to remove (QUDA reduces in
    # double for single-precision fields for the same reason).  On TPU
    # f64 is emulated but accurate (~3e-15) — the catch is that x64 mode
    # breaks PALLAS tracing, so the operator apply (which traces the
    # pallas kernel) runs in a plain f32 jit and only the reductions are
    # traced under jax.enable_x64().  A bare .astype(f64) without x64
    # silently canonicalizes to f32 and the floor returns.
    red_axes = tuple(range(1, evecs.ndim))

    @jax.jit
    def apply(V, j, *a):
        v = jax.lax.dynamic_index_in_dim(V, j, keepdims=False)
        return v, matvec(v, *a)

    if aot_tag is not None:
        # executable disk cache for the matvec-tracing jits (the one-shot
        # refine cost ~31 s at 32^3x64, almost all trace+tunnel compile);
        # the caller's tag pins the operator identity baked into matvec
        from ..aot_cache import maybe_aot
        apply = maybe_aot(apply, f"{aot_tag}-rrr-apply")

    def project64(V, v, w):
        def red64(u):
            return jnp.sum((V * u[None]).astype(jnp.float64),
                           axis=red_axes)
        h = jnp.stack([red64(w), red64(_jrot(w, ax))], axis=-1)
        g = jnp.stack([red64(v), red64(_jrot(v, ax))], axis=-1)
        return h, g                        # H[:, j], G[:, j]  (each [n, 2])

    project64 = jax.jit(project64)
    Hc, Gc = [], []
    for j in range(n):
        # the apply traces pallas -> MUST be dispatched outside x64 mode
        v, w = apply(evecs, jnp.asarray(j, jnp.int32), *matvec_args)
        with jax.enable_x64():
            h, g = project64(evecs, v, w)
        Hc.append(np.asarray(h))
        Gc.append(np.asarray(g))
    H = np.stack([c[..., 0] + 1j * c[..., 1] for c in Hc], axis=1)
    G = np.stack([c[..., 0] + 1j * c[..., 1] for c in Gc], axis=1)
    H = (H + H.conj().T) / 2
    G = (G + G.conj().T) / 2
    theta, q = scipy.linalg.eigh(H.astype(np.complex128),
                                 G.astype(np.complex128))

    extract = _make_extract(ax, field_shape)
    chunks = extract(evecs, jnp.asarray(q.real, evecs.dtype),
                     jnp.asarray(q.imag, evecs.dtype))
    refined = (chunks[0] if len(chunks) == 1
               else jnp.concatenate(chunks, axis=0))

    @jax.jit
    def resid_diff(V, j, lam, *a):
        v = jax.lax.dynamic_index_in_dim(V, j, keepdims=False)
        w = matvec(v, *a)
        return lam * v - w

    if aot_tag is not None:
        from ..aot_cache import maybe_aot
        resid_diff = maybe_aot(resid_diff, f"{aot_tag}-rrr-resid")

    def norm64(d):
        return jnp.sqrt(jnp.sum((d * d).astype(jnp.float64)))

    norm64 = jax.jit(norm64)
    rs = []
    for j in range(n):
        d = resid_diff(refined, jnp.asarray(j, jnp.int32),
                       jnp.asarray(theta[j], evecs.dtype), *matvec_args)
        with jax.enable_x64():
            rs.append(float(norm64(d)))
    return refined, theta, np.asarray(rs)


def lanczos_hermitian_planar(matvec, v0, n_ev, n_kr, **kw):
    """Planar-layout wrapper (re/im on axis 0)."""
    return lanczos_hermitian_realpair(matvec, v0, n_ev, n_kr, re_im_axis=0,
                                      **kw)
