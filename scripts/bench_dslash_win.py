"""Sweep the t-windowed modular-DMA dslash on the real chip (16^3x32).

Variants: base (BlockSpec 3x refetch) as control; win bt in {2,4,8};
win fused-M; bf16-input variants (links-only and links+psi).

Device-side fori chains; per-op = chain-length difference (RTT cancels).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = tuple(int(x) for x in __import__("os").environ.get("BENCH_DIMS", "16,16,16,32").split(","))
FLOP = 1320
N1, N2 = (int(__import__("os").environ.get("BENCH_N1", 50)), int(__import__("os").environ.get("BENCH_N2", 550)))

_SUM = jax.jit(lambda a: jnp.sum(a * a))


def force(x):
    return float(_SUM(x))


def time_chain(f, psi, label, reps=5):
    def body(i, x):
        return f(x) * 0.12          # renorm: avoid f32 overflow over chains

    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n):
        return jax.lax.fori_loop(0, n, body, p)

    try:
        force(chain(psi, N1))
        force(chain(psi, N2))
    except Exception as e:
        print(f"{label:28s}: FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return None
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
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk
    import mugiq_tpu.pallas.dslash_win_kernel as dwk

    enable_compilation_cache()
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
    U_b = U_k.astype(jnp.bfloat16)
    Ut_b = Ut_k.astype(jnp.bfloat16)
    force(psi); force(U_k); force(U_b)

    time_chain(lambda p: dk.dslash_hop_pallas(p, U_k, Ut_k, Y=Y),
               psi, "base (BlockSpec 3x)")
    for bt in (2, 4, 8):
        time_chain(lambda p, b=bt: dwk.dslash_hop_pallas_win(
            p, U_k, Ut_k, Y=Y, bt=b), psi, f"win bt={bt}")
    time_chain(lambda p: dwk.wilson_m_pallas_win(
        p, U_k, Ut_k, jnp.zeros((1,), jnp.float32), Y=Y, kappa=0.12, bt=4),
        psi, "win fused M bt=4")
    for bt in (2, 4):
        time_chain(lambda p, b=bt: dwk.dslash_hop_pallas_win(
            p, U_b, Ut_b, Y=Y, bt=b), psi, f"win bf16-links bt={bt}")
    time_chain(lambda p: dwk.dslash_hop_pallas_win(
        p, U_b, Ut_b, Y=Y, bt=4, out_dtype=jnp.bfloat16),
        psi.astype(jnp.bfloat16), "win bf16 all bt=4")


if __name__ == "__main__":
    main()
