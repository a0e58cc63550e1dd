"""Flagship-scale production run on the real chip: 32^3x64 end-to-end.

Eigensolve (thick-restart Lanczos, kernel-layout, bf16 links) + ultra-local
+ displaced loops + momentum projection + HDF5, with per-phase wall-clock.
This is the single-chip memory ceiling case: the nKr=32 Krylov basis alone
is ~6.6 GB; links bf16 halve the gauge resident set.

Loose tolerance / capped restarts — the point is timing + end-to-end
integrity at scale, not physics.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)
# nKr=32 OOMs one v5e chip: the restart rotation holds V (6.6 GB) plus a
# non-aliased rotated output -> 18 GB > 15.75 GB HBM.  nKr=24 fits
# (V 5 GB); larger bases at this volume are what the sharded path
# (mesh=...) is for.
NEV, NKR = 8, 24
MAX_RESTARTS = 12


def main():
    import jax
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.params import (DslashType, EigOperator, EigParam,
                                  GaugeParam, InvertParam, LoopParam)
    from mugiq_tpu.production import compute_loop_production

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)

    # host-side complex gauge (random SU(3)); ~1.2 GB complex64
    t0 = time.perf_counter()
    from mugiq_tpu import fields
    import jax.numpy as jnp
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        U = np.asarray(fields.random_gauge(geom, seed=1, dtype=jnp.complex64))
    print(f"gauge built: {time.perf_counter()-t0:.1f} s", flush=True)

    gp = GaugeParam(dims=DIMS)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=NEV, n_kr=NKR, tol=1e-30, max_restarts=MAX_RESTARTS,
                  operator=EigOperator.MdagM, check_interval=4)
    lp = LoopParam(momenta=[(0, 0, 0), (1, 0, 0), (0, 1, 1)],
                   do_mom_proj=True, do_nonlocal=True,
                   disp_entries=["+z:1"], write_mom_space_hdf5=True,
                   fname_mom_h5="/tmp/loops32.h5")

    t0 = time.perf_counter()
    res = compute_loop_production(U, gp, ip, ep, lp, precision="bf16",
                                  basis_precision="bf16")
    dt = time.perf_counter() - t0
    print(f"TOTAL: {dt:.1f} s  restarts={res.n_restarts} "
          f"({'converged' if res.converged else 'capped'})", flush=True)
    print(f"evals[:4]: {res.evals[:4]}", flush=True)
    print(f"max residual: {max(res.resids):.3e}", flush=True)
    print(f"data_mom shape: {res.data_mom.shape}; "
          f"finite: {np.all(np.isfinite(res.data_mom))}", flush=True)
    from mugiq_tpu.utils import print_profile
    print_profile()


if __name__ == "__main__":
    main()
