"""Chip-accuracy error budget: f32 TPU production vs fp64 CPU validation.

BASELINE.md asks 1e-8 RELATIVE accuracy on loop correlators; the chip
pipeline is f32 with ~1e-5..1e-6 eigenvector residuals (f32 + HIGHEST +
Rayleigh-Ritz refine).  This script measures what those residuals actually
do to the physics output: the same 16^3x32 gauge runs through

  (a) the complex fp64 validation pipeline on CPU (api.compute_loop,
      tol 1e-10 — the reference's double-precision path,
      /root/reference/lib/eigsolve_mugiq.cpp:317-335), in a subprocess
      (x64 breaks pallas tracing, so the fp64 stage gets its own process);
  (b) the f32 production pipeline on the chip (poly-acc + refine).

and compares the momentum-projected correlators entry by entry.  The
deflated loop data is invariant under rotations within degenerate
eigenvalue clusters, so converged subspaces compare directly.

Writes artifacts/error_budget16.json.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (16, 16, 16, 32)
N_EV = 8
REF_NPZ = "/tmp/error_budget16_ref.npz"
MOMS = [(0, 0, 0), (1, 0, 0), (0, 1, 1)]


def cpu_reference():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import mugiq_tpu as mq
    from mugiq_tpu import fields
    from mugiq_tpu.lattice import LatticeGeometry

    geom = LatticeGeometry(DIMS)
    # RANDOM gauge: a weak/free-field gauge has exact momentum-shell
    # degeneracies, making the selected n_ev subspace ill-defined
    # between pipelines; a disordered gauge breaks them
    U = fields.random_gauge(geom, seed=3, dtype=jnp.complex128)
    gp = mq.GaugeParam(dims=DIMS)
    ip = mq.InvertParam(kappa=0.12)
    # Chebyshev-accelerated fp64 reference: the unaccelerated 400-restart
    # run bottomed out at 1.22e-4 residuals on this clustered spectrum
    # (96 min); the poly window resolves it
    ep = mq.EigParam(n_ev=N_EV, n_kr=24, tol=1e-10, max_restarts=150,
                     operator=mq.EigOperator.MdagM, check_interval=5,
                     use_poly_acc=True, poly_deg=16, a_min=0.25)
    lp = mq.params.LoopParam(momenta=MOMS, do_mom_proj=True)
    t0 = time.perf_counter()
    result, eig_res = mq.compute_loop(U, gp, ip, ep, lp)
    dt = time.perf_counter() - t0
    rs = np.asarray(eig_res.output.resids)
    np.savez(REF_NPZ, data_mom=np.asarray(result.data_mom),
             evals=np.asarray(eig_res.evals), resids=rs,
             wallclock=np.asarray(dt))
    print(f"[cpu-ref] fp64 pipeline: {dt:.1f} s  max_resid={rs.max():.2e}",
          flush=True)


def main():
    if "--cpu" in sys.argv:
        cpu_reference()
        return

    # fp64 reference in a subprocess (needs x64 on, which breaks pallas)
    if not os.path.exists(REF_NPZ):
        print("building fp64 CPU reference (subprocess)...", flush=True)
        subprocess.run([sys.executable, __file__, "--cpu"], check=True)
    ref = np.load(REF_NPZ)

    import jax
    import jax.numpy as jnp
    from mugiq_tpu import fields
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.params import (DslashType, EigOperator, EigParam,
                                  GaugeParam, InvertParam, LoopParam)
    from mugiq_tpu.production import compute_loop_production
    from mugiq_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        U = np.asarray(fields.random_gauge(geom, seed=3,
                                           dtype=jnp.complex64))

    gp = GaugeParam(dims=DIMS)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=N_EV, n_kr=24, tol=1e-6, max_restarts=60,
                  operator=EigOperator.MdagM, check_interval=2,
                  use_poly_acc=True, poly_deg=16, a_min=0.8)
    lp = LoopParam(momenta=MOMS, do_mom_proj=True)

    t0 = time.perf_counter()
    res = compute_loop_production(U, gp, ip, ep, lp)
    dt = time.perf_counter() - t0
    print(f"[chip] f32 production: {dt:.1f} s  "
          f"max_resid={max(res.resids):.2e}", flush=True)

    a = np.asarray(res.data_mom)          # [P, l, 16, T] complex
    b = np.asarray(ref["data_mom"])
    assert a.shape == b.shape, (a.shape, b.shape)
    scale = np.abs(b).max()
    mask = np.abs(b) > 1e-6 * scale       # entries that are physically zero
    rel = np.abs(a - b)[mask] / np.abs(b)[mask]
    rel_norm = np.linalg.norm(a - b) / np.linalg.norm(b)
    ev_rel = np.abs(np.asarray(res.evals) - ref["evals"]) / ref["evals"]

    out = {
        "dims": list(DIMS), "n_ev": N_EV, "momenta": [list(m) for m in MOMS],
        "cpu_fp64": {"max_resid": float(ref["resids"].max()),
                     "wallclock_s": float(ref["wallclock"])},
        "chip_f32": {"max_resid": float(max(res.resids)),
                     "wallclock_s": round(dt, 1)},
        "eval_rel_err_max": float(ev_rel.max()),
        "correlator_rel_err_max": float(rel.max()),
        "correlator_rel_err_median": float(np.median(rel)),
        "correlator_rel_err_normwise": float(rel_norm),
        "entries_compared": int(mask.sum()),
        "baseline_target": 1e-8,
        "meets_1e-8_target": bool(rel.max() < 1e-8),
        "hardware": "1x TPU v5e (tunnelled) vs CPU fp64",
    }
    with open("/root/repo/artifacts/error_budget16.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
