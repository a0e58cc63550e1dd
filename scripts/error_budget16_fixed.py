"""Chip-precision error budget on a FIXED subspace.

The f32-vs-fp64 comparison in error_budget16.py confounds two errors:
subspace selection (each pipeline converges its own Ritz basis) and
measurement-pipeline precision.  This script isolates the second — the
number the 1e-8 correlator target actually constrains once the basis is
fixed:

  1. converge eigenvectors ON CHIP (f32, poly + Rayleigh-Ritz refine);
  2. measure loops on chip with the production pallas pipeline;
  3. convert the SAME vectors to complex128 on the host and run the fp64
     validation measurement (ops/contract + phase, x64 scoped, CPU
     device — no pallas traced under x64);
  4. compare correlators entry by entry.

Every difference is then attributable to the f32 measurement arithmetic
(+ f32 storage of the vectors), not to which subspace was found.

Writes artifacts/error_budget16_fixed.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (16, 16, 16, 32)
N_EV = 8
MOMS = [(0, 0, 0), (1, 0, 0), (0, 1, 1)]


def main():
    import jax
    import jax.numpy as jnp
    from mugiq_tpu import fields
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.params import (DslashType, EigOperator, EigParam,
                                  GaugeParam, InvertParam, LoopParam)
    from mugiq_tpu.production import (_measure_production_kernel,
                                      compute_evecs_production)
    from mugiq_tpu.loop import LoopComputeParam, LoopComputer
    from mugiq_tpu.profiling import enable_compilation_cache
    import mugiq_tpu.pallas.dslash_kernel as dk

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)
    cpu0 = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu0):
        U = np.asarray(fields.random_gauge(geom, seed=3,
                                           dtype=jnp.complex64))

    gp = GaugeParam(dims=DIMS)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=N_EV, n_kr=24, tol=1e-6, max_restarts=60,
                  operator=EigOperator.MdagM, check_interval=2,
                  use_poly_acc=True, poly_deg=16, a_min=0.8)
    lp = LoopParam(momenta=MOMS, do_mom_proj=True)

    t0 = time.perf_counter()
    res, evals, sigma, rs = compute_evecs_production(U, gp, ip, ep, seed=7)
    t_eig = time.perf_counter() - t0
    print(f"[chip] eigensolve {t_eig:.1f} s max_resid={max(rs):.2e}",
          flush=True)

    # chip measurement (production pallas pipeline)
    cp = LoopComputeParam.build(geom, lp)
    evk = res.evecs + 0.0                 # keep a copy; measurement donates
    t0 = time.perf_counter()
    mom32, _ = _measure_production_kernel(geom, lp, cp, res.evecs, sigma,
                                          U, False)
    t_m32 = time.perf_counter() - t0

    # SAME vectors -> complex128 fp64 measurement on host CPU
    Y = geom.dims[1]
    evs = []
    for m in range(N_EV):
        pl = np.asarray(dk.from_kernel_spinor(evk[m], Y=Y))
        # planar [2,4,3,T,Z,Y,X] -> complex [T,Z,Y,X,4,3]
        c = (pl[0] + 1j * pl[1]).astype(np.complex128)
        evs.append(np.transpose(c, (2, 3, 4, 5, 0, 1)))
    ev64 = np.stack(evs)

    t0 = time.perf_counter()
    with jax.enable_x64():
        with jax.default_device(cpu0):
            computer = LoopComputer(geom, lp, U_disp=None)
            res64 = computer.compute(jnp.asarray(ev64),
                                     np.asarray(sigma, np.float64))
            mom64 = np.asarray(res64.data_mom)
    t_m64 = time.perf_counter() - t0
    print(f"[fp64] fixed-subspace measurement {t_m64:.1f} s", flush=True)

    a, b = np.asarray(mom32), mom64
    assert a.shape == b.shape, (a.shape, b.shape)
    scale = np.abs(b).max()
    mask = np.abs(b) > 1e-6 * scale
    rel = np.abs(a - b)[mask] / np.abs(b)[mask]
    rel_norm = np.linalg.norm(a - b) / np.linalg.norm(b)

    out = {
        "dims": list(DIMS), "n_ev": N_EV,
        "momenta": [list(m) for m in MOMS],
        "chip_eig_max_resid": float(max(rs)),
        "chip_measure_s": round(t_m32, 1),
        "fp64_measure_s": round(t_m64, 1),
        "fixed_subspace_rel_err_max": float(rel.max()),
        "fixed_subspace_rel_err_median": float(np.median(rel)),
        "fixed_subspace_rel_err_normwise": float(rel_norm),
        "entries_compared": int(mask.sum()),
        "interpretation": ("difference between the f32 pallas measurement "
                           "and the fp64 validation measurement of the "
                           "SAME eigenvectors — pure pipeline precision, "
                           "no subspace-selection confound"),
        "hardware": "1x TPU v5e (tunnelled) vs CPU fp64",
    }
    with open("/root/repo/artifacts/error_budget16_fixed.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
