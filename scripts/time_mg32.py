"""MG-deflated production loops at 32^3x64 on the real chip.

2-level real-pair Galerkin hierarchy (block 4^4 -> 8x8x8x16 coarse,
nvec=12), coarse eigensolve + recursive prolongation + loops.  The MG
memory hog at this volume is the fine-volume Galerkin probe batch
(ns*nc probes x 201 MB); single-chip feasibility is part of what this
measures — the sharded path (mesh=...) is the documented fallback.

Writes artifacts/time_mg32.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)


def main():
    import jax
    import jax.numpy as jnp
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.params import (DslashType, EigOperator, EigParam,
                                  GaugeParam, InvertParam, LoopParam,
                                  MGParam)
    from mugiq_tpu.production import compute_loop_production
    from mugiq_tpu.utils import print_profile
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
    ep = EigParam(n_ev=8, n_kr=24, tol=1e-30, max_restarts=8,
                  operator=EigOperator.MdagM, check_interval=100)
    mg = MGParam(n_level=2, geo_block_size=[(4, 4, 4, 4)], n_vec=[12],
                 setup_iters=8)
    lp = LoopParam(momenta=[(0, 0, 0), (1, 0, 0)], do_mom_proj=True,
                   do_nonlocal=False, write_mom_space_hdf5=True,
                   fname_mom_h5="/tmp/loops32_mg.h5")

    t0 = time.perf_counter()
    res = compute_loop_production(U, gp, ip, ep, lp, use_mg=True, mg=mg,
                                  precision="bf16")
    dt = time.perf_counter() - t0
    print(f"TOTAL: {dt:.1f} s  restarts={res.n_restarts}", flush=True)
    print(f"evals[:4]: {res.evals[:4]}", flush=True)
    print(f"data_mom finite: {np.all(np.isfinite(res.data_mom))}",
          flush=True)
    print_profile()

    out = {"dims": list(DIMS), "levels": 2, "block": [4, 4, 4, 4],
           "n_vecs": 12, "n_ev": 8, "n_kr": 24,
           "restarts": int(res.n_restarts), "precision": "bf16",
           "total_s": round(dt, 1),
           "hardware": "1x TPU v5e (tunnelled)"}
    with open("/root/repo/artifacts/time_mg32.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/time_mg32.json", flush=True)


if __name__ == "__main__":
    main()
