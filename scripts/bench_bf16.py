"""Time f32 vs bf16-link fused-M variants at 16^3x32 and 32^3x64 (real TPU).

Timing: in-jit fori chains, chain-length differencing (see bench.py).
Field operands are passed as traced jit ARGUMENTS — closure capture embeds
them as HLO constants, which overflows the tunnelled backend's compile
request at 32^3x64 (604 MB of links).

Run:  python scripts/bench_bf16.py [small|large|both]
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mugiq_tpu.profiling import enable_compilation_cache  # noqa: E402
import mugiq_tpu.pallas.dslash_kernel as dk               # noqa: E402
from mugiq_tpu.pallas.dslash_win_kernel import wilson_m_pallas_win  # noqa: E402

enable_compilation_cache()
KAPPA = 0.12


def time_chain(f, psi, U, A0, n1, n2, reps=4):
    s = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32) ** 2))

    @partial(jax.jit, static_argnames=("n",))
    def chain(p, U, Ut, A, n):
        return jax.lax.fori_loop(0, n, lambda i, x: f(x, U, Ut, A), p)

    Ut = U[:, 3]
    float(s(chain(psi, U, Ut, A0, n1)))
    float(s(chain(psi, U, Ut, A0, n2)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(s(chain(psi, U, Ut, A0, n1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(s(chain(psi, U, Ut, A0, n2)))
        t2 = time.perf_counter() - t0
        if t2 > t1:
            best = min(best, (t2 - t1) / (n2 - n1))
    return best


def run(dims, n1, n2):
    Lx, Ly, Lz, Lt = dims
    vol = Lx * Ly * Lz * Lt
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((Lt, 4, 18, Lz, Ly * Lx)),
                    dtype=jnp.float32)
    psi = jnp.asarray(rng.standard_normal((Lt, 24, Lz, Ly * Lx)),
                      dtype=jnp.float32)
    A0 = jnp.zeros((1,), jnp.float32)
    Ub = U.astype(jnp.bfloat16)
    flop = 1368 * vol      # hop 1320 + combine 48
    print(f"== {dims} (vol={vol}) ==", flush=True)

    def m_base(p, U_, Ut_, A_):
        return dk.wilson_m_pallas(p, U_, Ut_, A_, Y=Ly, kappa=KAPPA)

    def mk_win(bt):
        def m_win(p, U_, Ut_, A_):
            return wilson_m_pallas_win(p, U_, Ut_, A_, Y=Ly, kappa=KAPPA,
                                       bt=bt)
        return m_win

    variants = [("base f32", m_base, U), ("base bf16", m_base, Ub)]
    for bt in (2, 4):
        if Lt % bt == 0:
            variants += [(f"win{bt} f32", mk_win(bt), U),
                         (f"win{bt} bf16", mk_win(bt), Ub)]
    for name, f, Uv in variants:
        try:
            t = time_chain(f, psi, Uv, A0, n1, n2)
            print(f"  {name:12s}: {t*1e6:9.1f} us  "
                  f"{flop/t/1e9:8.0f} GFLOP/s", flush=True)
        except Exception as e:
            print(f"  {name:12s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("small", "both"):
        run((16, 16, 16, 32), 8, 408)
    if which in ("large", "both"):
        run((32, 32, 32, 64), 4, 54)
