"""48^3x96 Wilson dslash feasibility + timing on one v5e chip.

Next-volume scaling evidence: 10.6M sites (5.4x the 32^3x64 flagship).
bf16 links (1.5 GB) + f32/bf16 spinors; grouped-lane psgl8 kernel
(by=8 -> 384-lane tiles, S=288).  Writes artifacts/bench_dslash48.json.
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

_SUM = None


def force(x):
    global _SUM
    if _SUM is None:
        _SUM = jax.jit(lambda a: jnp.sum((a * a).astype(jnp.float32)))
    return float(_SUM(x))


def main():
    import mugiq_tpu.pallas.dslash_kernel as dk
    from mugiq_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    T, Z, Y, X = 96, 48, 48, 48
    vol = T * Z * Y * X
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((T, 4, 18, Z, Y * X)),
                    dtype=jnp.bfloat16)
    Ut = U[:, 3]
    z1 = jnp.zeros((1,), jnp.float32)
    out = {"dims": [48, 48, 48, 96], "sites": vol, "links": "bf16",
           "hardware": "1x TPU v5e (tunnelled)"}

    for prec, sdt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        psi = jnp.asarray(rng.standard_normal((T, 24, Z, Y * X)),
                          dtype=sdt)

        @partial(jax.jit, static_argnames=("n",))
        def chain(p, n, u, ut):
            return jax.lax.fori_loop(
                0, n, lambda i, x: dk.wilson_m_pallas_gl(
                    x, u, ut, z1, Y=Y, kappa=0.12, by=8, ps=True), p)

        try:
            force(chain(psi, 2, U, Ut))
            force(chain(psi, 12, U, Ut))
            pers = []
            for _ in range(3):
                t0 = time.perf_counter(); force(chain(psi, 2, U, Ut))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); force(chain(psi, 12, U, Ut))
                t2 = time.perf_counter() - t0
                pers.append((t2 - t1) / 10)
            per = float(np.median(pers))
            out[f"spinor_{prec}_us"] = round(per * 1e6, 1)
            out[f"spinor_{prec}_gflops"] = round(1368 * vol / per / 1e9, 1)
            print(f"48^3x96 M psgl8 {prec} spinors: {per*1e6:.0f} us "
                  f"({out[f'spinor_{prec}_gflops']} GFLOP/s)", flush=True)
        except Exception as e:
            out[f"spinor_{prec}_error"] = f"{type(e).__name__}: {str(e)[:120]}"
            print(f"48^3 {prec}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    with open("/root/repo/artifacts/bench_dslash48.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/bench_dslash48.json", flush=True)


if __name__ == "__main__":
    main()
