"""Eigensolve CLI — the tests/eigensolve.cpp driver analog.

    python -m mugiq_tpu.cli.eigensolve --dims 8 8 8 16 --eig-nev 16 \
        --mugiq-use-mg yes --mg-block-size 4 4 4 4 --mg-nvec 24
"""

import argparse
import sys
import time

from .common import (add_dirac_args, add_eig_args, add_lattice_args,
                     add_mg_args, add_parallel_args, build_mesh,
                     build_mg_param, build_params, load_gauge_from_args,
                     setup_jax)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="mugiq-eigensolve",
        description="Compute eigenpairs of the (fine or MG-coarse) Dirac "
                    "operator (computeEvecsMuGiq / computeEvecsMuGiq_MG)")
    add_lattice_args(p)
    add_dirac_args(p)
    add_eig_args(p)
    add_mg_args(p)
    add_parallel_args(p)
    p.add_argument("--production", action="store_true",
                   help="run the TPU production path (real-pair/pallas "
                        "kernel-layout eigensolve, f32) instead of the "
                        "complex validation path")
    p.add_argument("--autotune", action="store_true",
                   help="autotune the pallas operator variant for this "
                        "lattice size (persists in the tune cache)")
    p.add_argument("--link-precision", choices=("f32", "bf16"),
                   default="f32",
                   help="production link/clover storage precision (bf16 = "
                        "QUDA half-precision analog; arithmetic stays f32)")
    p.add_argument("--basis-precision", choices=("f32", "bf16"),
                   default="f32",
                   help="production Krylov-basis storage precision (bf16 "
                        "halves the cycle-algebra HBM traffic; f32 "
                        "arithmetic; deflation-grade residuals)")
    args = p.parse_args(argv)
    setup_jax(args)

    from .. import api, fields
    from ..utils import log, print_profile

    gp, ip, ep = build_params(args)
    U, geom = load_gauge_from_args(args, gp)

    tot, sp, tm = fields.plaquette_np(U)
    log(f"Computed plaquette is {tot:.8f} "
        f"(spatial = {sp:.8f}, temporal = {tm:.8f})")

    if args.eig_vec_infile:
        from ..io.gauge_io import load_evecs
        evecs, evals, sigma, resids, attrs = load_evecs(args.eig_vec_infile)
        log(f"Loaded {evecs.shape[0]} eigenvectors from "
            f"{args.eig_vec_infile} (attrs: {dict(attrs)})")
        for i, lam in enumerate(evals):
            log(f"Mugiq: Eval[{i:04d}] = {lam.real:+.16e} {lam.imag:+.16e}")
        return 0

    import jax.numpy as jnp

    if args.production:
        import numpy as np
        from ..production import compute_evecs_production

        t0 = time.time()
        res, evals, sigma, resids = compute_evecs_production(
            np.asarray(U), gp, ip, ep, autotune=args.autotune,
            precision=args.link_precision, mesh=build_mesh(args),
            even_odd=args.solve_type == "direct-pc",
            basis_precision=args.basis_precision)
        if not res.converged:
            log("WARNING: production eigensolve did NOT converge to "
                "tolerance")
        for i in range(len(evals)):
            lam = complex(evals[i])
            log(f"Mugiq: Eval[{i:04d}] = {lam.real:+.16e} "
                f"{lam.imag:+.16e} , Residual = {resids[i]:+.16e}")
        for i in range(len(sigma)):
            log(f"Mugiq: Sigma[{i:04d}] = {sigma[i]:+.16e}")
        log(f"Time for solution = {time.time() - t0:.3f} s")
        print_profile()
        if args.eig_vec_outfile:
            from ..io.gauge_io import save_evecs
            save_evecs(args.eig_vec_outfile, res.evecs, evals,
                       sigma=sigma, resids=np.asarray(resids),
                       attrs={"dims": str(geom.dims), "kappa": str(ip.kappa),
                              "layout": "kernel-realpair"})
            log(f"Eigenvectors saved to {args.eig_vec_outfile}")
        return 0

    t0 = time.time()
    U_dev = jnp.asarray(U)   # validation path: complex device array (CPU)
    if args.mugiq_use_mg == "yes" and args.mugiq_compute_coarse == "yes":
        res = api.compute_evecs_mugiq_mg(U_dev, gp, ip, ep, build_mg_param(args))
    else:
        res = api.compute_evecs_mugiq(U_dev, gp, ip, ep,
                                      even_odd=args.solve_type == "direct-pc")
    res.print_evals()
    log(f"Time for solution = {time.time() - t0:.3f} s")
    print_profile()

    if args.eig_vec_outfile:
        from ..io.gauge_io import save_evecs
        save_evecs(args.eig_vec_outfile, res.evecs, res.evals,
                   sigma=res.sigma, resids=res.output.resids,
                   attrs={"dims": str(geom.dims), "kappa": str(ip.kappa)})
        log(f"Eigenvectors saved to {args.eig_vec_outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
