"""Dslash variant sweep with device-side chains (robust to tunnel noise).

Each measurement is ONE dispatch: a lax.fori_loop applying the kernel n
times on device.  per-op = (t(n2) - t(n1)) / (n2 - n1) cancels dispatch +
readback overhead; no per-iteration host round trips.
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
N1, N2 = 50, 550   # ~60 ms of device work at N2: tunnel ms-noise < 2%

_SUM = jax.jit(lambda a: jnp.sum(a * a))


def force(x):
    return float(_SUM(x))


def time_chain(f, psi, label, reps=5):
    """f: psi -> psi (jittable). Chains inside jit; scale-normalized each
    step to avoid f32 overflow over long chains."""

    def body(i, x):
        y = f(x)
        # cheap renorm: divide by a constant ~spectral radius (VPU-trivial)
        return y * 0.12

    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n):
        return jax.lax.fori_loop(0, n, body, p)

    force(chain(psi, N1))
    force(chain(psi, N2))
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(chain(psi, N1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); force(chain(psi, N2)); t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / (N2 - N1))
    per = float(np.median(pers))
    vol = int(np.prod(DIMS))
    gf = FLOP * vol / per / 1e9
    print(f"{label:28s}: {per*1e6:8.1f} us/apply  {gf:7.1f} GFLOP/s  "
          f"(spread {min(pers)*1e6:.1f}..{max(pers)*1e6:.1f})", flush=True)
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

    time_chain(lambda p: dk.dslash_hop_pallas(p, U_k, Ut_k, Y=Y),
               psi, "base (BlockSpec 3x)")
    for bt in (2, 4, 8):
        try:
            time_chain(lambda p, b=bt: dbk.dslash_hop_pallas_blocked(
                p, U_k, Ut_k, Y=Y, bt=b), psi, f"blocked bt={bt}")
        except Exception as e:
            print(f"blocked bt={bt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    try:
        time_chain(lambda p: dbk.dslash_hop_pallas_db(
            p, U_k, Ut_k, Y=Y, bt=2), psi, "db bt=2")
    except Exception as e:
        print(f"db bt=2: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)

    A0 = jnp.zeros((1,), jnp.float32)
    time_chain(lambda p: dk.wilson_m_pallas(p, U_k, Ut_k, A0, Y=Y,
                                            kappa=0.12),
               psi, "fused M (no clover)")


if __name__ == "__main__":
    main()
