"""One-shot-overhead measurement at 32^3x64 (VERDICT round-3 item 3).

The round-3 production call spent ~40 s on trace + compile-cache loads
against ~5 s of restarts.  Round-4 landed (a) module-level measurement
jits, (b) caller-owned executable caches threaded through the whole
pipeline, (c) the ProductionSession / `mugiq-loop --serve` resident
server.  This measures what a SECOND production call costs in the
resident process — the reference's long-lived-process operating mode
(interface_mugiq.cpp:72-247) — vs the first.

Writes artifacts/overhead32.json.
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
                                  GaugeParam, InvertParam, LoopParam)
    from mugiq_tpu.server import ProductionSession
    from mugiq_tpu.utils import PHASE_TIMES, reset_profile
    from mugiq_tpu import fields

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)

    t0 = time.perf_counter()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        U1 = np.asarray(fields.random_gauge(geom, seed=1,
                                            dtype=jnp.complex64))
        U2 = np.asarray(fields.random_gauge(geom, seed=2,
                                            dtype=jnp.complex64))
    print(f"gauges built: {time.perf_counter()-t0:.1f} s", flush=True)

    gp = GaugeParam(dims=DIMS)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=8, n_kr=24, tol=1e-30, max_restarts=12,
                  operator=EigOperator.MdagM, check_interval=100)
    lp = LoopParam(momenta=[(0, 0, 0), (1, 0, 0)], do_mom_proj=True,
                   do_nonlocal=False, write_mom_space_hdf5=True,
                   fname_mom_h5="/tmp/loops32_oh.h5")

    sess = ProductionSession()
    calls = []
    for tag, U in (("first (cold executables)", U1),
                   ("second (resident, same config, NEW gauge)", U2),
                   ("third (repeat)", U1)):
        reset_profile()
        t0 = time.perf_counter()
        res = sess.compute_loop(U, gp, ip, ep, lp, precision="bf16",
                                basis_precision="bf16")
        dt = time.perf_counter() - t0
        ph = {k: round(v, 1) for k, v in PHASE_TIMES.items()}
        print(f"{tag}: TOTAL {dt:.1f} s  phases {ph}  "
              f"restarts={res.n_restarts}", flush=True)
        calls.append({"tag": tag, "total_s": round(dt, 1), "phase_s": ph,
                      "restarts": int(res.n_restarts),
                      "finite": bool(np.all(np.isfinite(res.data_mom)))})

    out = {"dims": list(DIMS), "config": "nEv=8 nKr=24 bf16/bf16, 12 "
           "capped restarts, 2 momenta, ultralocal",
           "calls": calls,
           "note": "second/third calls run in the resident session "
                   "(ProductionSession / mugiq-loop --serve): executable "
                   "caches keyed by configuration serve repeats; gauge "
                   "transfer + host prep are real per-call work",
           "hardware": "1x TPU v5e (tunnelled)"}
    with open("/root/repo/artifacts/overhead32.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/overhead32.json", flush=True)


if __name__ == "__main__":
    main()
