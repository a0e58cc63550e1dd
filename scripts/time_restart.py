"""End-to-end production eigensolve restart timing on the real TPU.

Measures lanczos_hermitian_realpair wall-clock per restart at the CLAUDE.md
reference configuration (16^3x32, nKr=48, Wilson kernel MdagM) — the number
previously recorded at ~8.5 s/restart with the old V-slicing algebra.

Wall-clock here includes everything a production restart pays: the device
cycle, the Tmat host read (tunnel sync), host eigh, the rotate, and the
V updates.  We time a fixed number of restarts by capping max_restarts.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (16, 16, 16, 32)
NKR = 48
NEV = 16
RESTARTS = 6


def main():
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk
    from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
    from mugiq_tpu.planar.lanczos import lanczos_hermitian_realpair

    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=1)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = dk.to_kernel_gauge(U_pl)
    op = WilsonDiracKernel(U_k=U_k, kappa=0.12, Y=DIMS[1])

    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal(op.field_shape).astype(np.float32))

    cache = {}
    # warm: compile cycle + rotate on a 2-restart run
    t0 = time.perf_counter()
    lanczos_hermitian_realpair(op.MdagM, v0, n_ev=NEV, n_kr=NKR,
                               re_im_axis=1, tol=1e-30, max_restarts=2,
                               compile_cache=cache)
    print(f"warm (2 restarts incl. compile): {time.perf_counter()-t0:.1f} s",
          flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        res = lanczos_hermitian_realpair(op.MdagM, v0, n_ev=NEV, n_kr=NKR,
                                         re_im_axis=1, tol=1e-30,
                                         max_restarts=RESTARTS,
                                         compile_cache=cache)
        dt = time.perf_counter() - t0
        print(f"rep {rep}: {dt:.2f} s total, {dt/res.n_restarts:.3f} "
              f"s/restart ({res.n_restarts} restarts)", flush=True)

    # no-cache rep: what a one-shot production call pays (retrace+compile)
    t0 = time.perf_counter()
    res = lanczos_hermitian_realpair(op.MdagM, v0, n_ev=NEV, n_kr=NKR,
                                     re_im_axis=1, tol=1e-30,
                                     max_restarts=RESTARTS)
    dt = time.perf_counter() - t0
    print(f"no-cache rep: {dt:.2f} s total ({dt/res.n_restarts:.3f} "
          f"s/restart)", flush=True)


if __name__ == "__main__":
    main()
