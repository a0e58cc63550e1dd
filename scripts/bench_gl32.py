"""Grouped-lane kernel at 32^3x64 (+16^3x32 sanity) on the real chip.

Compares gl{4,8} f32 / bf16-links / all-bf16 against the committed yb4
numbers (artifacts/bench_dslash32.json).  Appends to
artifacts/bench_gl32.json.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

_SUM = jax.jit(lambda a: jnp.sum((a * a).astype(jnp.float32)))
RESULTS = {}


def force(x):
    return float(_SUM(x))


def time_chain(fn, psi, args, label, vol, n1=8, n2=108, reps=4):
    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        return jax.lax.fori_loop(
            0, n, lambda i, x: (fn(x, *a) * 0.5).astype(p.dtype), p)

    try:
        t0 = time.perf_counter()
        force(chain(psi, n1, *args)); force(chain(psi, n2, *args))
        print(f"{label:24s}: compiled {time.perf_counter()-t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"{label:24s}: FAILED {type(e).__name__}: {str(e)[:80]}",
              flush=True)
        RESULTS[label] = "compile-failed"
        return None
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(chain(psi, n1, *args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); force(chain(psi, n2, *args)); t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / (n2 - n1))
    per = float(np.median(pers))
    gf = 1320 * vol / per / 1e9
    print(f"{label:24s}: {per*1e6:9.1f} us/apply {gf:7.1f} GFLOP/s",
          flush=True)
    RESULTS[label] = {"us": round(per * 1e6, 1), "gflops": round(gf, 1)}
    return per


def fields_for(DIMS, seed=1):
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk

    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=seed)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = jnp.asarray(dk.to_kernel_gauge(U_pl))
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(
        (DIMS[3], 24, DIMS[2], DIMS[1] * DIMS[0]))).astype(jnp.float32)
    return psi, U_k, U_k[:, 3]


def main():
    from mugiq_tpu.profiling import enable_compilation_cache
    import mugiq_tpu.pallas.dslash_kernel as dk

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)

    # sanity at 16^3x32 (vs base 86-91 us)
    psi, U, Ut = fields_for((16, 16, 16, 32))
    force(psi)
    time_chain(lambda x, u, ut: dk.dslash_hop_pallas_gl(x, u, ut, Y=16,
                                                        by=8),
               psi, (U, Ut), "gl8 16c f32", 131072)

    DIMS = (32, 32, 32, 64)
    vol = int(np.prod(DIMS))
    psi, U, Ut = fields_for(DIMS)
    psib = psi.astype(jnp.bfloat16)
    Ub, Utb = U.astype(jnp.bfloat16), Ut.astype(jnp.bfloat16)
    force(psi); force(psib); force(Ub)

    for by in (4, 8):
        time_chain(lambda x, u, ut, b=by: dk.dslash_hop_pallas_gl(
            x, u, ut, Y=32, by=b), psi, (U, Ut), f"gl{by} 32c f32", vol)
    time_chain(lambda x, u, ut: dk.dslash_hop_pallas_gl(
        x, u, ut, Y=32, by=8), psi, (Ub, Utb), "gl8 32c bf16-links", vol)
    time_chain(lambda x, u, ut: dk.dslash_hop_pallas_gl(
        x, u, ut, Y=32, by=8), psib, (Ub, Utb), "gl8 32c all-bf16", vol)
    # fused M
    A0 = jnp.zeros((1,), jnp.float32)
    time_chain(lambda x, u, ut: dk.wilson_m_pallas_gl(
        x, u, ut, A0, Y=32, kappa=0.12, by=8), psi, (U, Ut),
        "M gl8 32c f32", vol)
    time_chain(lambda x, u, ut: dk.wilson_m_pallas_gl(
        x, u, ut, A0.astype(jnp.bfloat16), Y=32, kappa=0.12, by=8),
        psi, (Ub, Utb), "M gl8 32c bf16-links", vol)

    with open("/root/repo/artifacts/bench_gl32.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("wrote artifacts/bench_gl32.json", flush=True)


if __name__ == "__main__":
    main()
