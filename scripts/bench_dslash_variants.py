"""Sweep the dslash kernel variants on the real chip (16^3x32 f32).

Variants:
  base      — BlockSpec-pipelined, 1 t-slice/step (3x psi refetch)
  blocked   — manual-DMA t-window, bt in {2, 4} ((bt+2)/bt psi refetch,
              but pays an extra full psi copy for the t-extension concat)
  db        — psi 2-slot double-buffered manual DMA + BlockSpec links
  fused M   — A psi - kappa hop in one pass (the eigensolve op), for the
              per-application floor comparison

Chain-differenced timing (tunnel RTT cancels); data-dependent chains.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (16, 16, 16, 32)
FLOP = 1320

_SUM = jax.jit(lambda a: jnp.sum(a * a))


def force(x):
    return float(_SUM(x))


def time_apply(f, psi, label, n1=10, n2=60, reps=3):
    o = f(psi)
    force(o)
    per = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = psi
        for _ in range(n1):
            o = f(o)
        force(o)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        o = psi
        for _ in range(n2):
            o = f(o)
        force(o)
        t2 = time.perf_counter() - t0
        per = min(per, (t2 - t1) / (n2 - n1))
    vol = np.prod(DIMS)
    gf = FLOP * vol / per / 1e9
    print(f"{label:28s}: {per*1e6:8.1f} us/apply  {gf:7.1f} GFLOP/s",
          flush=True)
    return per


def main():
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk
    import mugiq_tpu.pallas.dslash_block_kernel as dbk

    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=1)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = dk.to_kernel_gauge(U_pl)
    Ut_k = U_k[:, 3]
    Y = DIMS[1]
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(
        (DIMS[3], 24, DIMS[2], DIMS[1] * DIMS[0])).astype(np.float32))
    force(psi); force(U_k)

    base = jax.jit(lambda p: dk.dslash_hop_pallas(p, U_k, Ut_k, Y=Y))
    t_base = time_apply(base, psi, "base (BlockSpec 3x)")

    for bt in (2, 4):
        try:
            f = jax.jit(lambda p, b=bt: dbk.dslash_hop_pallas_blocked(
                p, U_k, Ut_k, Y=Y, bt=b))
            time_apply(f, psi, f"blocked bt={bt}")
        except Exception as e:
            print(f"blocked bt={bt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    for bt in (2, 4):
        try:
            f = jax.jit(lambda p, b=bt: dbk.dslash_hop_pallas_db(
                p, U_k, Ut_k, Y=Y, bt=b))
            time_apply(f, psi, f"db bt={bt}")
        except Exception as e:
            print(f"db bt={bt}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    A0 = jnp.zeros((1,), jnp.float32)
    fm = jax.jit(lambda p: dk.wilson_m_pallas(p, U_k, Ut_k, A0, Y=Y,
                                              kappa=0.12))
    time_apply(fm, psi, "fused M (no clover)")

    # correctness cross-check of the blocked variants vs base
    ref = np.asarray(base(psi))
    for bt in (2, 4):
        try:
            got = np.asarray(dbk.dslash_hop_pallas_blocked(
                psi, U_k, Ut_k, Y=Y, bt=bt))
            err = np.abs(got - ref).max()
            print(f"blocked bt={bt} max|err| = {err:.2e}", flush=True)
        except Exception:
            pass


if __name__ == "__main__":
    main()
