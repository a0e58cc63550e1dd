"""32^3x64 eigensolve-phase timing: f32 vs bf16 Krylov basis vs packed pc.

At this volume the Lanczos cycle algebra (V reads/writes) dominates the
restart wall-clock, not the operator.  The two levers measured here:
  - basis_precision="bf16": V stored bf16, f32 arithmetic (2x V traffic);
  - even_odd=True: packed half-volume pc fields (2x V size) — and both.

Capped restarts, tol=0 — wall-clock only.  Writes
artifacts/time_eig32.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)
RESTARTS = 6


def main():
    import jax
    import jax.numpy as jnp
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.params import (DslashType, EigOperator, EigParam,
                                  GaugeParam, InvertParam)
    from mugiq_tpu.production import compute_evecs_production
    from mugiq_tpu import fields

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)

    t0 = time.perf_counter()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        U = np.asarray(fields.random_gauge(geom, seed=1,
                                           dtype=jnp.complex64))
    print(f"gauge built: {time.perf_counter()-t0:.1f} s", flush=True)

    gp = GaugeParam(dims=DIMS)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)

    results = {}
    configs = [
        ("full f32-basis nKr24", dict(n_kr=24), dict()),
        ("full bf16-basis nKr24", dict(n_kr=24),
         dict(basis_precision="bf16")),
        ("pc f32-basis nKr24", dict(n_kr=24), dict(even_odd=True)),
        ("pc bf16-basis nKr48", dict(n_kr=48),
         dict(even_odd=True, basis_precision="bf16")),
    ]
    for label, ekw, kw in configs:
        ep = EigParam(n_ev=8, tol=1e-30, max_restarts=RESTARTS,
                      operator=EigOperator.MdagM, check_interval=100,
                      **ekw)
        try:
            t0 = time.perf_counter()
            res, evals, sigma, rs = compute_evecs_production(
                U, gp, ip, ep, precision="bf16", **kw)
            dt = time.perf_counter() - t0
            per = dt / max(1, res.n_restarts)
            print(f"{label:24s}: total {dt:7.1f} s  "
                  f"{per:6.2f} s/restart (cold incl. compile)  "
                  f"maxres {max(rs):.2e}", flush=True)
            results[label] = {"total_s": round(dt, 1),
                              "s_per_restart_cold": round(per, 2),
                              "restarts": int(res.n_restarts),
                              "max_resid": float(max(rs)),
                              "evals2": [float(v) for v in evals[:2]]}
        except Exception as e:
            print(f"{label:24s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            results[label] = f"failed: {type(e).__name__}"

    with open("/root/repo/artifacts/time_eig32.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote artifacts/time_eig32.json", flush=True)


if __name__ == "__main__":
    main()
