"""Stochastic (Hutchinson) loop traces on the production (real-pair) stack.

TPU twin of :mod:`mugiq_tpu.stochastic`: Z4 noise built on host in numpy,
deflated normal-equation solves with the real-pair CG and the pallas Wilson
operator on the kernel layout, contraction with the unrolled planar kernel.

    Tr[Gamma M^{-1}](x) = Tr[Gamma Mdefl^{-1}](x)
                        + E_eta[eta^dag Gamma (M^{-1} - Mdefl^{-1}) eta](x)
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .solvers import cg_realpair
from .production import loop_contract_production
from .utils import log, phase_timer
import mugiq_tpu.pallas.dslash_kernel as dk


def z4_noise_kernel_np(shape_tzyx, seed: int) -> np.ndarray:
    """Z4 spinor noise in kernel layout [T, 24, Z, Y*X] (numpy f32)."""
    T, Z, Y, X = shape_tzyx[3], shape_tzyx[2], shape_tzyx[1], shape_tzyx[0]
    rng = np.random.default_rng(seed)
    k = rng.integers(0, 4, size=(T, 12, Z, Y * X))
    table_r = np.asarray([1.0, 0.0, -1.0, 0.0], np.float32)
    table_i = np.asarray([0.0, 1.0, 0.0, -1.0], np.float32)
    return np.concatenate([table_r[k], table_i[k]], axis=1)


def _cdots_basis(evecs, w):
    """<v_i, w> for kernel-layout basis [n, T, 24, Z, YX]: complex dots via
    the contiguous re/im halves (comp = r*12 + ...)."""
    re = jnp.einsum("i...,...->i", evecs, w)
    Vr, Vi = evecs[:, :, :12], evecs[:, :, 12:]
    wr, wi = w[:, :12], w[:, 12:]
    im = jnp.einsum("i...,...->i", Vr, wi) - jnp.einsum("i...,...->i", Vi, wr)
    return re, im


def _caxpy_basis(dr, di, evecs):
    """sum_i d_i v_i (complex coefficients, kernel-layout basis)."""
    Vr, Vi = evecs[:, :, :12], evecs[:, :, 12:]
    outr = jnp.einsum("i,i...->...", dr, Vr) - jnp.einsum("i,i...->...", di, Vi)
    outi = jnp.einsum("i,i...->...", dr, Vi) + jnp.einsum("i,i...->...", di, Vr)
    return jnp.concatenate([outr, outi], axis=1)


@dataclass
class DeflationSpaceKernel:
    """Exact inverse on the span of MdagM eigenvectors (kernel layout)."""
    evecs: jnp.ndarray      # [n, T, 24, Z, YX]
    evals: jnp.ndarray      # [n] real (MdagM eigenvalues)
    M_evecs: jnp.ndarray    # [n, T, 24, Z, YX] = M v_n

    @classmethod
    def build(cls, op, evecs, evals):
        # unrolled over the (small) basis rather than vmap: works unchanged
        # for the sharded operator (shard_map under vmap is not needed)
        Mv = jnp.stack([op.M(evecs[i]) for i in range(evecs.shape[0])])
        return cls(evecs=evecs, evals=jnp.asarray(np.asarray(evals).real,
                                                  dtype=jnp.float32),
                   M_evecs=Mv)

    def apply_inv(self, rhs):
        """Mdefl^{-1} rhs = sum_n v_n lambda_n^{-1} <M v_n, rhs>."""
        dr, di = _cdots_basis(self.M_evecs, rhs)
        return _caxpy_basis(dr / self.evals, di / self.evals, self.evecs)

    def trace_contribution_planar(self, Y):
        """[2, 16, T, Z, Y, X]: sum_n lambda_n^{-1} (M v_n)^dag Gamma v_n.

        Pallas kernel-layout contraction — the planar unrolled form ran
        EAGERLY here and materialized every 100 MB spin-pair temporary
        (OOMed the round-4 stoch32 run at 32^3x64)."""
        try:
            multi = len(self.evecs.sharding.device_set) > 1
        except AttributeError:
            multi = False
        if multi:
            # sharded basis: planar contraction INSIDE one jit (sharding
            # propagates; eager unrolled form materializes every temp)
            @jax.jit
            def f(Mv, V, w):
                to_pl = jax.vmap(lambda v: dk.from_kernel_spinor(v, Y=Y))
                return loop_contract_production(to_pl(Mv), to_pl(V), w)
            return f(self.M_evecs, self.evecs, 1.0 / self.evals)
        from .pallas.contract_kernel import loop_contract_pallas
        return loop_contract_pallas(self.M_evecs, self.evecs,
                                    1.0 / self.evals, Y=Y)


def stochastic_loop_trace_production(
    op,                       # WilsonDiracKernel
    geom,
    n_noise: int,
    deflation: Optional[DeflationSpaceKernel] = None,
    solver_tol: float = 1e-6,
    solver_maxiter: int = 2000,
    seed: int = 99,
):
    """[2, 16, T, Z, Y, X] estimate of the per-site Tr[Gamma M^{-1}].

    op may be the single-device WilsonDiracKernel or the multi-chip
    ShardedWilsonKernel — noise vectors are placed with the operator's
    sharding (if any) and the CG/contraction algebra propagates it."""
    Y = geom.dims[1]
    from .params import EigOperator
    # operator operands THREADED as jit arguments: a jitted closure over
    # op.MdagM embeds the links as HLO constants (604 MB compile request
    # at 32^3x64 — hangs the tunnelled backend; see operator_with_args)
    fn_mm, op_args = op.operator_with_args(EigOperator.MdagM)
    fn_md, _ = op.operator_with_args(EigOperator.Mdag)

    @jax.jit
    def solve(rhs, *a):
        return cg_realpair(lambda v: fn_mm(v, *a), fn_md(rhs, *a),
                           tol=solver_tol, maxiter=solver_maxiter)

    from .pallas.contract_kernel import loop_contract_pallas
    place = getattr(op, "place", lambda x: x)
    sharded = getattr(op, "mesh", None) is not None
    if sharded:
        # sharded fields: the planar contraction propagates the sharding
        # through XLA (pallas grids don't)
        to_pl = jax.jit(lambda v: dk.from_kernel_spinor(v, Y=Y))
        contract = jax.jit(loop_contract_production)
    ones1 = jnp.ones((1,), jnp.float32)

    acc = None
    for i in range(n_noise):
        eta = place(jnp.asarray(z4_noise_kernel_np(geom.dims, seed + i)))
        rhs = eta
        s0 = None
        if deflation is not None:
            s0 = deflation.apply_inv(eta)
            rhs = eta - op.M(s0)
        with phase_timer("stochastic-solve"):
            res = solve(rhs, *op_args)
        log(f"stochastic production: noise {i}: iters={int(res.iters)} "
            f"resid={float(res.resid):.2e}")
        s = res.x  # remainder solve only: (M^{-1} - Mdefl^{-1}) eta
        if sharded:
            contrib = contract(to_pl(eta)[None], to_pl(s)[None], ones1)
        else:
            contrib = loop_contract_pallas(eta[None], s[None], ones1, Y=Y)
        acc = contrib if acc is None else acc + contrib
    data = acc / n_noise
    if deflation is not None:
        data = data + deflation.trace_contribution_planar(Y)
    return data
