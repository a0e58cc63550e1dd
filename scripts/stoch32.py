"""Deflated stochastic (Z4) loop trace at 32^3x64 on the real chip.

The north-star workload lists stochastic probing next to low-mode loops;
this commits scale evidence: a few Z4 probes through the production CG on
the pallas Wilson operator, with and without low-mode deflation, with
wall-clock and CG iteration counts (deflation must cut iterations).

Writes artifacts/stoch32.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)
N_EV = 8
N_NOISE = 4


def main():
    import jax
    import jax.numpy as jnp
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.params import (DslashType, EigOperator, EigParam,
                                  GaugeParam, InvertParam)
    from mugiq_tpu.production import (build_kernel_dirac,
                                      compute_evecs_production)
    from mugiq_tpu.stochastic_production import (
        DeflationSpaceKernel, stochastic_loop_trace_production)
    from mugiq_tpu import fields
    from mugiq_tpu.utils import PHASE_TIMES

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
    ep = EigParam(n_ev=N_EV, n_kr=24, tol=1e-5, max_restarts=20,
                  operator=EigOperator.MdagM, check_interval=2,
                  use_poly_acc=True, poly_deg=16, a_min=0.25)

    t0 = time.perf_counter()
    res, evals, sigma, rs = compute_evecs_production(U, gp, ip, ep, seed=11)
    t_eig = time.perf_counter() - t0
    print(f"eigensolve: {t_eig:.1f} s restarts={res.n_restarts} "
          f"max_resid={max(rs):.2e}", flush=True)

    op = build_kernel_dirac(U, gp, ip, precision="f32")

    # deflation wants the UNSCALED MdagM eigenvalues (undo any mass
    # normalization the eigensolve applied)
    from mugiq_tpu.params import MassNormalization
    scale = (0.25 / ip.kappa ** 2
             if ip.mass_normalization == MassNormalization.MASS else 1.0)
    t0 = time.perf_counter()
    defl = DeflationSpaceKernel.build(op, res.evecs,
                                      np.asarray(evals) / scale)
    t_defl = time.perf_counter() - t0

    import logging
    iters = {"deflated": [], "plain": []}
    h = logging.Handler()

    class Grab(logging.Handler):
        def __init__(self, key):
            super().__init__()
            self.key = key

        def emit(self, record):
            m = record.getMessage()
            if "iters=" in m:
                iters[self.key].append(int(m.split("iters=")[1].split()[0]))

    lg = logging.getLogger("mugiq_tpu")

    g1 = Grab("deflated")
    lg.addHandler(g1)
    t0 = time.perf_counter()
    data_defl = stochastic_loop_trace_production(
        op, geom, N_NOISE, deflation=defl, solver_tol=1e-5, seed=99)
    t_defl_run = time.perf_counter() - t0
    lg.removeHandler(g1)
    print(f"deflated probes: {t_defl_run:.1f} s iters={iters['deflated']}",
          flush=True)

    g2 = Grab("plain")
    lg.addHandler(g2)
    t0 = time.perf_counter()
    data_plain = stochastic_loop_trace_production(
        op, geom, N_NOISE, deflation=None, solver_tol=1e-5, seed=99)
    t_plain = time.perf_counter() - t0
    lg.removeHandler(g2)
    print(f"plain probes:    {t_plain:.1f} s iters={iters['plain']}",
          flush=True)

    finite = bool(np.all(np.isfinite(np.asarray(data_defl))))
    out = {"dims": list(DIMS), "n_noise": N_NOISE, "n_ev_deflation": N_EV,
           "solver_tol": 1e-5,
           "eigensolve_s": round(t_eig, 1),
           "eig_max_resid": float(max(rs)),
           "deflation_build_s": round(t_defl, 1),
           "probes_deflated_s": round(t_defl_run, 1),
           "probes_plain_s": round(t_plain, 1),
           "cg_iters_deflated": iters["deflated"],
           "cg_iters_plain": iters["plain"],
           "stochastic_solve_phase_s": round(
               PHASE_TIMES.get("stochastic-solve", 0.0), 1),
           "data_finite": finite,
           "hardware": "1x TPU v5e (tunnelled)"}
    with open("/root/repo/artifacts/stoch32.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/stoch32.json", flush=True)


if __name__ == "__main__":
    main()
