"""32^3x64 even-odd preconditioned production eigensolve on the real chip.

The packed Schur operator (even_odd=True) works on half-volume fields:
each Krylov vector is ~100 MB instead of 200, so nKr=48 fits one v5e
(the full-volume path OOMs above nKr=24), and each MdagM costs four
half-volume parity hops (= two full-volume hops) on a better-conditioned
operator.  Reference semantics: QUDA_MATPC_EVEN_EVEN pc_solve
(eigsolve_mugiq.cpp:169-181).

Writes artifacts/time_production32_pc.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)
NEV, NKR = 16, 48
MAX_RESTARTS = 12


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
    ep = EigParam(n_ev=NEV, n_kr=NKR, tol=1e-30, max_restarts=MAX_RESTARTS,
                  operator=EigOperator.MdagM, check_interval=4)

    t0 = time.perf_counter()
    res, evals, sigma, rs = compute_evecs_production(
        U, gp, ip, ep, precision="bf16", even_odd=True)
    dt = time.perf_counter() - t0
    print(f"TOTAL: {dt:.1f} s  restarts={res.n_restarts} "
          f"({'converged' if res.converged else 'capped'})", flush=True)
    print(f"evals[:4]: {evals[:4]}", flush=True)
    print(f"max residual: {max(rs):.3e}", flush=True)

    out = {
        "dims": list(DIMS), "n_ev": NEV, "n_kr": NKR,
        "restarts": int(res.n_restarts), "precision": "bf16",
        "even_odd": True, "total_s": round(dt, 1),
        "max_residual": float(max(rs)),
        "evals4": [float(v) for v in evals[:4]],
        "hardware": "1x TPU v5e (tunnelled)",
    }
    with open("/root/repo/artifacts/time_production32_pc.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/time_production32_pc.json", flush=True)


if __name__ == "__main__":
    main()
