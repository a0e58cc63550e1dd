"""MG-deflated production loops at 32^3x64 on the real chip.

2-level real-pair Galerkin hierarchy (block 4^4 -> 8x8x8x16 coarse,
nvec=12), coarse eigensolve + recursive prolongation + loops.  The
fine-level transfer/Galerkin runs ON CHIP via the KERNEL-layout path
(mg/kernel_mg.py, the production default at this volume — rc/split
layouts relayout catastrophically at 32^3x64; see CLAUDE.md).  The MG
hierarchy checkpoint is exercised: the first run saves, a second
production call loads it and skips setup.

Writes artifacts/time_mg32.json (phase breakdown + residuals).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)
CKPT = "/tmp/mg32_hierarchy.npz"


def main():
    import jax
    import jax.numpy as jnp
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.params import (DslashType, EigOperator, EigParam,
                                  GaugeParam, InvertParam, LoopParam,
                                  MGParam)
    from mugiq_tpu.production import compute_loop_production
    from mugiq_tpu.utils import PHASE_TIMES, print_profile, reset_profile

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)

    t0 = time.perf_counter()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        U = np.asarray(fields_random(geom, jnp))
    print(f"gauge built: {time.perf_counter()-t0:.1f} s", flush=True)

    gp = GaugeParam(dims=DIMS)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=8, n_kr=24, tol=1e-6, max_restarts=120,
                  operator=EigOperator.MdagM, check_interval=2)
    lp = LoopParam(momenta=[(0, 0, 0), (1, 0, 0)], do_mom_proj=True,
                   do_nonlocal=False, write_mom_space_hdf5=True,
                   fname_mom_h5="/tmp/loops32_mg.h5")

    runs = {}
    for tag, mg in (
        ("build", MGParam(n_level=2, geo_block_size=[(4, 4, 4, 4)],
                          n_vec=[12], setup_iters=8, vec_outfile=CKPT)),
        ("ckpt_load", MGParam(n_level=2, geo_block_size=[(4, 4, 4, 4)],
                              n_vec=[12], setup_iters=8, vec_infile=CKPT)),
    ):
        reset_profile()
        t0 = time.perf_counter()
        res = compute_loop_production(U, gp, ip, ep, lp, use_mg=True,
                                      mg=mg, precision="bf16")
        dt = time.perf_counter() - t0
        phases = {k: round(v, 1) for k, v in PHASE_TIMES.items()}
        print(f"[{tag}] TOTAL: {dt:.1f} s restarts={res.n_restarts} "
              f"converged={res.converged}", flush=True)
        print(f"[{tag}] coarse evals[:4]: {res.evals[:4]}", flush=True)
        print(f"[{tag}] coarse resids: "
              f"{['%.2e' % v for v in res.resids]}", flush=True)
        print(f"[{tag}] data_mom finite: "
              f"{np.all(np.isfinite(res.data_mom))}", flush=True)
        print_profile()
        runs[tag] = {
            "total_s": round(dt, 1), "phase_s": phases,
            "restarts": int(res.n_restarts),
            "converged": bool(res.converged),
            "coarse_evals4": [float(v) for v in res.evals[:4]],
            "coarse_max_resid": float(max(res.resids)),
            "data_mom_finite": bool(np.all(np.isfinite(res.data_mom)))}

    out = {"dims": list(DIMS), "levels": 2, "block": [4, 4, 4, 4],
           "n_vecs": 12, "n_ev": 8, "n_kr": 24, "precision": "bf16",
           "mg_setup": "on-chip KERNEL-layout transfer/Galerkin (mg/kernel_mg.py)",
           "runs": runs,
           "hardware": "1x TPU v5e (tunnelled)"}
    with open("/root/repo/artifacts/time_mg32.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/time_mg32.json", flush=True)


def fields_random(geom, jnp):
    from mugiq_tpu import fields
    return fields.random_gauge(geom, seed=1, dtype=jnp.complex64)


if __name__ == "__main__":
    main()
