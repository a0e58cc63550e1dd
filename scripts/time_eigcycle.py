"""A/B timing of the production Lanczos cycle on the real TPU.

Old algebra: re/im-split einsums that slice the Krylov basis V (forces
materialized half-of-V copies per step).  New algebra (planar/lanczos.py):
J-rotation full-array einsums, one V read per op.

16^3x32, nKr=48, Wilson kernel op MdagM — the configuration CLAUDE.md
records at ~8.5 s/restart with the old algebra.

Run on the TPU backend (default); completion forced via f32 scalar
readback; tunnel RTT removed by chain differencing.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (16, 16, 16, 32)
NKR = 48

_SUM = jax.jit(lambda a: jnp.sum(a * a))


def force(x):
    return float(_SUM(x))


def _split(x, ax):
    h = x.shape[ax] // 2
    idx_r = [slice(None)] * x.ndim
    idx_i = [slice(None)] * x.ndim
    idx_r[ax] = slice(0, h)
    idx_i[ax] = slice(h, None)
    return x[tuple(idx_r)], x[tuple(idx_i)]


def make_ops_old(ax):
    def dots(V, w):
        re = jnp.einsum("i...,...->i", V, w)
        Vr, Vi = _split(V, ax + 1)
        wr, wi = _split(w, ax)
        im = jnp.einsum("i...,...->i", Vr, wi) - jnp.einsum("i...,...->i", Vi, wr)
        return jnp.stack([re, im], axis=-1)

    def axpy_sub(w, d, V):
        dr, di = d[..., 0], d[..., 1]
        Vr, Vi = _split(V, ax + 1)
        wr, wi = _split(w, ax)
        wr = wr - jnp.einsum("i,i...->...", dr, Vr) \
            + jnp.einsum("i,i...->...", di, Vi)
        wi = wi - jnp.einsum("i,i...->...", dr, Vi) \
            - jnp.einsum("i,i...->...", di, Vr)
        return jnp.concatenate([wr, wi], axis=ax)

    return dots, axpy_sub


def make_cycle(matvec, m, rdtype, ax, dots, axpy_sub):
    def _norm(w):
        return jnp.sqrt(jnp.sum(w * w))

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


def time_cycles(cycle, shape, label, reps=4):
    """Chain cycles on the same donated buffers (no host transfers inside
    the timed region); tunnel RTT removed by 1-vs-3 chain differencing."""
    V = jnp.asarray(np.random.default_rng(0).standard_normal(
        shape).astype(np.float32))
    T = jnp.zeros((NKR, NKR, 2), jnp.float32)
    force(V)                      # drain the host->device transfer
    V, T, b = cycle(V, T, 0)      # warm
    force(b[None])

    def chain(n):
        nonlocal V, T
        t0 = time.perf_counter()
        b = None
        for _ in range(n):
            V, T, b = cycle(V, T, 0)
        force(b[None])
        return time.perf_counter() - t0

    diffs = []
    for _ in range(reps):
        t1 = chain(1)
        t3 = chain(3)
        diffs.append((t3 - t1) / 2)
    per = float(np.median(diffs))
    print(f"{label}: {per:.3f} s/cycle ({NKR} steps, "
          f"{per/NKR*1e3:.1f} ms/step)  diffs={[f'{d:.3f}' for d in diffs]}",
          flush=True)
    return per


def main():
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk
    from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
    from mugiq_tpu.planar.lanczos import _make_ops

    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=1)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = dk.to_kernel_gauge(U_pl)
    op = WilsonDiracKernel(U_k=U_k, kappa=0.12, Y=DIMS[1])
    shape = (NKR + 1,) + op.field_shape

    # matvec-only chain for the floor
    f = jax.jit(op.MdagM)
    psi = jnp.asarray(np.random.default_rng(1).standard_normal(
        op.field_shape).astype(np.float32))
    force(f(psi))
    t1 = time.perf_counter(); o = psi
    for _ in range(10):
        o = f(o)
    force(o); t10 = time.perf_counter() - t1
    t1 = time.perf_counter(); o = psi
    for _ in range(60):
        o = f(o)
    force(o); t60 = time.perf_counter() - t1
    mv = (t60 - t10) / 50
    print(f"MdagM: {mv*1e3:.2f} ms/apply -> {mv*NKR:.2f} s floor/cycle",
          flush=True)

    dots_n, axpy_n, _ = _make_ops(1)
    cyc_new = make_cycle(op.MdagM, NKR, jnp.float32, 1, dots_n, axpy_n)
    time_cycles(cyc_new, shape, "NEW (J-rot, no V slices)")

    dots_o, axpy_o = make_ops_old(1)
    cyc_old = make_cycle(op.MdagM, NKR, jnp.float32, 1, dots_o, axpy_o)
    time_cycles(cyc_old, shape, "OLD (V-slicing)")


if __name__ == "__main__":
    main()
