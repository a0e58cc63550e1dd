"""Pallas kernels for the loop measurement on the kernel layout.

Round-4 flagship profile (artifacts/flagship32_cli.log): the measurement's
loop-contraction phase cost 141.5 s against a 77 s eigensolve — almost all
of it trace + tunnelled compile of the big unrolled planar contraction
graph (hundreds of full-volume HLO ops), not compute.  The reference's
analogous phase is ONE device kernel over all 16 gamma insertions
(/root/reference/lib/mugiq_contract_kernels.cu:46-122 loopContract_kernel).

This module is the TPU twin: small pallas kernels on the eigensolver's
native [T, 24, Z, Y*X] layout (grouped-lane view above the 256-lane wall),
so the measurement

* never relayouts the Krylov basis to planar,
* compiles in seconds (tiny kernel bodies instead of unrolled graphs),
* runs at HBM bandwidth (one read of L/R per contraction, VMEM-resident
  spin-pair accumulators across the evec batch).

Kernels:
* :func:`loop_contract_pallas` — batched v^dag(x) Gamma v(x) spin-pair
  sums over an evec batch, + the 16-gamma projection as one small matmul;
* :func:`covariant_displace_kernel_pallas` — covariant displacement
  psi(x) -> U_mu(x) psi(x+mu) (or U^dag_mu(x-mu) psi(x-mu)) in ONE pass,
  reusing the grouped-lane shift machinery of the dslash kernel.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dslash_kernel import make_gl_shift, pallas_call_auto
from ..displace import parse_disp_str


def pick_gl_by(Y: int, X: int) -> int:
    """Lane grouping for [Z, Y*X] -> [Z*NBy, by*X]: mirror the dslash
    kernel's default (by*X as close to 256 as possible; full width when
    Y*X already fits)."""
    if Y * X <= 256:
        return Y
    feasible = [b for b in (2, 4, 8, 16, 32) if Y % b == 0 and b < Y
                and b * X <= 512]
    if not feasible:
        return Y
    return min(feasible, key=lambda b: abs(b * X - 256))


# ---------------------------------------------------------------------------
# batched spin-pair contraction
# ---------------------------------------------------------------------------

def _make_contract_kernel():
    """out[p] += w_n * sum_c conj(L[n])_bc R[n]_ac per site, p = b*4+a for
    the real part and 16+p for the imaginary part (matches the pair order
    of production.loop_contract_production)."""
    f32 = jnp.float32

    def kernel(w_ref, l_ref, r_ref, out_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        # w_ref holds the whole [n, 1] weight vector (a (1,1) block fails
        # the TPU (8,128) block-divisibility rule); pick this step's entry
        w = w_ref[pl.program_id(1), 0].astype(f32)
        for b in range(4):
            for a in range(4):
                rr = ri = None
                for c in range(3):
                    lr = l_ref[0, 0, b * 3 + c].astype(f32)
                    li = l_ref[0, 0, 12 + b * 3 + c].astype(f32)
                    xr = r_ref[0, 0, a * 3 + c].astype(f32)
                    xi = r_ref[0, 0, 12 + a * 3 + c].astype(f32)
                    tr = lr * xr + li * xi          # Re conj(L) R
                    ti = lr * xi - li * xr          # Im conj(L) R
                    rr = tr if rr is None else rr + tr
                    ri = ti if ri is None else ri + ti
                p = b * 4 + a
                out_ref[0, p] += w * rr
                out_ref[0, 16 + p] += w * ri

    return kernel


@lru_cache(maxsize=None)
def _gamma_flat_f32():
    # plain numpy (a device array cached across traces leaks tracers)
    from ..ops.contract import _gamma_flat_np
    g = _gamma_flat_np()
    return (np.ascontiguousarray(g.real, np.float32),
            np.ascontiguousarray(g.imag, np.float32))


@partial(jax.jit, static_argnames=("Y", "by"))
def loop_contract_pallas(L_k, R_k, inv_sigma, Y: int, by: int = 0):
    """L_k/R_k [n, T, 24, Z, Y*X] -> [2, 16, T, Z, Y, X].

    sum_n inv_sigma[n] conj(L_n)(x) Gamma R_n(x), all 16 gammas.  The
    spin-pair sums run in one pallas kernel (grid (t, n), the [32, Z, YX]
    accumulator block stays VMEM-resident across the evec batch); the
    16x16 gamma projection is one small HIGHEST-precision matmul pair.
    """
    n, T, _, Z, YX = L_k.shape
    X = YX // Y
    if by == 0:
        by = pick_gl_by(Y, X)
    NBy = Y // by
    S, Lw = Z * NBy, by * X
    Lg = L_k.reshape(n, T, 24, S, Lw)
    Rg = R_k.reshape(n, T, 24, S, Lw)
    w2 = inv_sigma.astype(jnp.float32).reshape(n, 1)

    def bs(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    acc = pallas_call_auto(
        _make_contract_kernel(),
        grid=(T, n),
        in_specs=[
            bs((n, 1), lambda t, i: (0, 0)),
            bs((1, 1, 24, S, Lw), lambda t, i: (i, t, 0, 0, 0)),
            bs((1, 1, 24, S, Lw), lambda t, i: (i, t, 0, 0, 0)),
        ],
        out_specs=bs((1, 32, S, Lw), lambda t, i: (t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 32, S, Lw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(w2, Lg, Rg)

    acc = acc.reshape(T, 32, Z * YX)
    rr, ri = acc[:, :16], acc[:, 16:]
    Grn, Gin = _gamma_flat_f32()
    Gr, Gi = jnp.asarray(Grn), jnp.asarray(Gin)
    hi = jax.lax.Precision.HIGHEST
    e = lambda G, x: jnp.einsum("gp,tpv->gtv", G, x, precision=hi)
    outr = e(Gr, rr) - e(Gi, ri)
    outi = e(Gr, ri) + e(Gi, rr)
    return jnp.stack([outr, outi]).reshape(2, 16, T, Z, Y, X)


# ---------------------------------------------------------------------------
# covariant displacement (single pass, no spin structure)
# ---------------------------------------------------------------------------

def _make_disp_kernel(NBy, by, X, S, L, mu: int, sign: int):
    """out[s,a] = sum_b link[a,b] psi_shift[s,b]; spatial shifts in-VMEM,
    t neighbours via the block index maps chosen by the caller.  Link for
    sign<0 is the conj-transpose fetched at x-mu (spatial: shifted
    in-VMEM; t: the (i-1)%T input block)."""
    make_shift = make_gl_shift(NBy, by, X, S, L)
    f32 = jnp.float32

    def kernel(p_ref, u_ref, out_ref):
        shift = make_shift()

        def psi(s, c, r):
            v = p_ref[0, 0, r * 12 + s * 3 + c].astype(f32)
            return shift(v, mu, sign) if mu < 3 else v

        def link(a, b, r):
            if sign > 0:
                return u_ref[0, r * 9 + a * 3 + b].astype(f32)
            v = u_ref[0, r * 9 + b * 3 + a].astype(f32)
            if mu < 3:
                v = shift(v, mu, -1)
            return v if r == 0 else -v

        od = out_ref.dtype
        for s in range(4):
            for a in range(3):
                gr = gi = None
                for b in range(3):
                    ur, ui = link(a, b, 0), link(a, b, 1)
                    pr, pi = psi(s, b, 0), psi(s, b, 1)
                    tr = ur * pr - ui * pi
                    ti = ur * pi + ui * pr
                    gr = tr if gr is None else gr + tr
                    gi = ti if gi is None else gi + ti
                out_ref[0, 0, s * 3 + a] = gr.astype(od)
                out_ref[0, 0, 12 + s * 3 + a] = gi.astype(od)

    return kernel


@partial(jax.jit, static_argnames=("disp_str", "Y", "by"),
         donate_argnums=0)
def covariant_displace_kernel_pallas(psi_k, U_k, disp_str: str, Y: int,
                                     by: int = 0):
    """psi_k [n, T, 24, Z, Y*X] (batch), U_k [T, 4, 18, Z, Y*X] UNPHASED
    loop gauge -> displaced batch, same layout.  Semantics identical to
    planar.displace.covariant_displace_planar (reference covariant
    displacement, /root/reference/lib/displace_mugiq.cpp)."""
    d, sign = parse_disp_str(disp_str)
    n, T, _, Z, YX = psi_k.shape
    X = YX // Y
    if by == 0:
        by = pick_gl_by(Y, X)
    NBy = Y // by
    S, Lw = Z * NBy, by * X
    psi_g = psi_k.reshape(n, T, 24, S, Lw)
    Ud = U_k[:, d].reshape(T, 18, S, Lw)

    def bs(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    if d < 3:
        p_idx = lambda i, t: (i, t, 0, 0, 0)
        u_idx = lambda i, t: (t, 0, 0, 0)
    elif sign > 0:
        p_idx = lambda i, t: (i, (t + 1) % T, 0, 0, 0)
        u_idx = lambda i, t: (t, 0, 0, 0)
    else:
        p_idx = lambda i, t: (i, (t - 1) % T, 0, 0, 0)
        u_idx = lambda i, t: ((t - 1) % T, 0, 0, 0)

    out = pallas_call_auto(
        _make_disp_kernel(NBy, by, X, S, Lw, d, sign),
        grid=(n, T),
        in_specs=[
            bs((1, 1, 24, S, Lw), p_idx),
            bs((1, 18, S, Lw), u_idx),
        ],
        out_specs=bs((1, 1, 24, S, Lw), lambda i, t: (i, t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, T, 24, S, Lw), psi_k.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(psi_g, Ud)
    return out.reshape(n, T, 24, Z, YX)


# ---------------------------------------------------------------------------
# positional jit factories (AotJit needs plain positional signatures)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def contract_jit(Y: int, by: int = 0):
    """jit (L_k, R_k, inv_sigma) -> [2,16,T,Z,Y,X] with Y/by bound."""
    return jax.jit(partial(loop_contract_pallas, Y=Y, by=by))


@lru_cache(maxsize=None)
def displace_jit(disp_str: str, Y: int, by: int = 0):
    """jit (psi_batch_k, U_loop_k) -> displaced batch; donates the batch."""
    return jax.jit(partial(covariant_displace_kernel_pallas,
                           disp_str=disp_str, Y=Y, by=by),
                   donate_argnums=0)
