"""32^3x64 dslash variant sweep on the real chip — the HBM-spilling size.

The full-width [Z, YX] kernels (base/win) cannot compile above ~256 lanes
(YX=1024 here -> remote-compile HTTP 500), so this size runs on the
y-blocked kernel family (tiles [Z, (by+2)*X] over a (T, Y/by) grid).  At
32^3x64 U (610 MB f32) + psi (201 MB) cannot stay VMEM-resident, so bf16
links' traffic halving should matter.  Informs the autotune default.

Operands are threaded as jit ARGUMENTS (a closure would embed the 610 MB
links as HLO constants and blow the tunnel's compile-request size).

Writes one JSON line per variant to artifacts/bench_dslash32.json.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)
FLOP = 1320
N1, N2 = 10, 110

_SUM = jax.jit(lambda a: jnp.sum(a * a))
RESULTS = []


def force(x):
    return float(_SUM(x))


def time_chain(f, psi, U, Ut, label, reps=4):
    """f(psi, U, Ut) -> psi'; U/Ut threaded as jit args, not constants."""

    @partial(jax.jit, static_argnames=("n",))
    def chain(p, u, ut, n):
        def body(i, x):
            return f(x, u, ut) * 0.12
        return jax.lax.fori_loop(0, n, body, p)

    try:
        t0 = time.perf_counter()
        force(chain(psi, U, Ut, N1))
        force(chain(psi, U, Ut, N2))
        print(f"{label:28s}: compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"{label:28s}: FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        RESULTS.append({"variant": label, "status": "compile-failed"})
        return None
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(chain(psi, U, Ut, N1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); force(chain(psi, U, Ut, N2)); t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / (N2 - N1))
    per = float(np.median(pers))
    vol = int(np.prod(DIMS))
    gf = FLOP * vol / per / 1e9
    print(f"{label:28s}: {per*1e6:8.1f} us/apply  {gf:7.1f} GFLOP/s  "
          f"(spread {min(pers)*1e6:.1f}..{max(pers)*1e6:.1f})", flush=True)
    RESULTS.append({"variant": label, "us_per_apply": round(per * 1e6, 1),
                    "gflops": round(gf, 1)})
    return per


def main():
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=1)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = jnp.asarray(dk.to_kernel_gauge(U_pl))
    Ut_k = U_k[:, 3]
    Y = DIMS[1]
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(
        (DIMS[3], 24, DIMS[2], DIMS[1] * DIMS[0])).astype(np.float32))
    U_b = U_k.astype(jnp.bfloat16)
    Ut_b = Ut_k.astype(jnp.bfloat16)
    force(psi); force(U_k); force(U_b)

    for by in (2, 4, 8):
        time_chain(lambda p, u, ut, b=by: dk.dslash_hop_pallas_yb(
            p, u, ut, Y=Y, by=b), psi, U_k, Ut_k, f"yb{by} f32")
    time_chain(lambda p, u, ut: dk.dslash_hop_pallas_yb(p, u, ut, Y=Y, by=4),
               psi, U_b, Ut_b, "yb4 bf16-links")
    time_chain(lambda p, u, ut: dk.dslash_hop_pallas_yb(p, u, ut, Y=Y, by=8),
               psi, U_b, Ut_b, "yb8 bf16-links")
    # fused M (the production operator's inner op)
    A0 = jnp.zeros((1,), jnp.float32)
    time_chain(lambda p, u, ut: dk.wilson_m_pallas_yb(
        p, u, ut, A0, Y=Y, kappa=0.12, by=4), psi, U_k, Ut_k, "M yb4 f32")
    time_chain(lambda p, u, ut: dk.wilson_m_pallas_yb(
        p, u, ut, A0.astype(jnp.bfloat16), Y=Y, kappa=0.12, by=4),
        psi, U_b, Ut_b, "M yb4 bf16-links")

    with open("/root/repo/artifacts/bench_dslash32.json", "w") as f:
        json.dump({"dims": DIMS, "flop_per_site": FLOP,
                   "results": RESULTS}, f, indent=1)
    print("wrote artifacts/bench_dslash32.json", flush=True)


if __name__ == "__main__":
    main()
