"""Disconnected-loop CLI — the tests/loop.cpp driver analog.

    python -m mugiq_tpu.cli.loop --dims 8 8 8 16 --momenta-filename moms.txt \
        --loop-do-nonlocal yes --displace-entry-string "+z:1,8;-x:3" \
        --loop-write-mom-space yes --loop-mom-space-filename loops.h5
"""

import argparse
import sys
import time

from .common import (add_dirac_args, add_eig_args, add_lattice_args,
                     add_mg_args, add_parallel_args, build_mesh,
                     build_mg_param, build_params, load_gauge_from_args,
                     read_momenta_file, setup_jax)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="mugiq-loop",
        description="Disconnected quark loops with (MG-deflated) eigenvectors "
                    "(computeLoop)")
    add_lattice_args(p)
    add_dirac_args(p)
    add_eig_args(p)
    add_mg_args(p)
    add_parallel_args(p)
    g = p.add_argument_group("loop")
    g.add_argument("--momenta-filename", default="",
                   help="file with 'px py pz' per line; default p=0 only")
    g.add_argument("--loop-ft-sign", choices=["plus", "minus"], default="minus")
    g.add_argument("--loop-calc-type", choices=["blas", "opt", "basic"],
                   default="opt")
    g.add_argument("--loop-write-mom-space", choices=["yes", "no"], default="no")
    g.add_argument("--loop-write-pos-space", choices=["yes", "no"], default="no")
    g.add_argument("--loop-do-momproj", choices=["yes", "no"], default="yes")
    g.add_argument("--loop-do-nonlocal", choices=["yes", "no"], default="no")
    g.add_argument("--displace-entry-string", default="",
                   help="e.g. '+z:1,8;-x:3'")
    g.add_argument("--loop-mom-space-filename", default="")
    g.add_argument("--loop-pos-space-filename", default="")
    g.add_argument("--loop-gauge-filename", default="",
                   help="separate (smeared) gauge for displacements")
    g.add_argument("--loop-coarse-ulocal", choices=["yes", "no"],
                   default="no",
                   help="ALSO assemble the ultra-local loop entirely in "
                        "coarse space from restricted gamma generators — "
                        "no eigenvector prolongation (the reference's "
                        "legacy formulation, mg/coarse_loop.py; requires "
                        "--mugiq-use-mg yes on the validation path)")
    g.add_argument("--production", action="store_true",
                   help="run the TPU production path (real-pair/pallas "
                        "kernels, f32) instead of the complex validation path")
    g.add_argument("--autotune", action="store_true",
                   help="autotune the pallas operator variant for this "
                        "lattice size (persists in the tune cache)")
    g.add_argument("--basis-precision", choices=("f32", "bf16"),
                   default="f32",
                   help="production Krylov-basis storage precision (bf16 "
                        "halves the cycle-algebra HBM traffic; f32 "
                        "arithmetic; deflation-grade residuals)")
    g.add_argument("--link-precision", choices=("f32", "bf16"),
                   default="f32",
                   help="production link/clover storage precision (bf16 = "
                        "QUDA half-precision analog; arithmetic stays f32)")
    g.add_argument("--serve", default="", metavar="DIR",
                   help="process-resident server mode: watch DIR for "
                        "request JSON files and serve them with warm "
                        "executable caches (amortizes the one-shot "
                        "trace/compile cost across production calls)")
    args = p.parse_args(argv)
    setup_jax(args)

    if args.serve:
        from ..server import serve
        serve(args.serve)
        return 0

    from .. import api, fields
    from ..io.gauge_io import load_gauge_np
    from ..params import CalcType, FTSign, LoopParam
    from ..utils import log, print_profile

    gp, ip, ep = build_params(args)
    U, geom = load_gauge_from_args(args, gp)

    momenta = (read_momenta_file(args.momenta_filename)
               if args.momenta_filename else [(0, 0, 0)])
    do_nonlocal = args.loop_do_nonlocal == "yes"
    if do_nonlocal and not args.displace_entry_string:
        p.error("--loop-do-nonlocal yes requires --displace-entry-string")
    if args.loop_write_mom_space == "yes" and not args.loop_mom_space_filename:
        p.error("--loop-write-mom-space yes requires --loop-mom-space-filename")
    if args.loop_write_pos_space == "yes" and not args.loop_pos_space_filename:
        p.error("--loop-write-pos-space yes requires --loop-pos-space-filename")

    lp = LoopParam(
        momenta=momenta,
        ft_sign=FTSign.MINUS if args.loop_ft_sign == "minus" else FTSign.PLUS,
        calc_type={"blas": CalcType.BLAS, "opt": CalcType.OPT_KERNEL,
                   "basic": CalcType.BASIC_KERNEL}[args.loop_calc_type],
        write_mom_space_hdf5=args.loop_write_mom_space == "yes",
        write_pos_space_hdf5=args.loop_write_pos_space == "yes",
        do_mom_proj=args.loop_do_momproj == "yes",
        do_nonlocal=do_nonlocal,
        disp_entries=[e for e in args.displace_entry_string.split(";") if e],
        fname_mom_h5=args.loop_mom_space_filename,
        fname_pos_h5=args.loop_pos_space_filename,
    )

    U_loop = None
    if args.loop_gauge_filename:
        U_loop = load_gauge_np(args.loop_gauge_filename, geom,
                               seed=args.gauge_seed)

    tot, sp, tm = fields.plaquette_np(U)
    log(f"Computed plaquette is {tot:.8f} "
        f"(spatial = {sp:.8f}, temporal = {tm:.8f})")

    use_mg = args.mugiq_use_mg == "yes"
    t0 = time.time()
    if args.production:
        import numpy as np
        from ..production import compute_loop_production

        res = compute_loop_production(
            U, gp, ip, ep, lp,
            U_loop_np=U_loop, autotune=args.autotune,
            precision=args.link_precision, mesh=build_mesh(args),
            basis_precision=args.basis_precision,
            use_mg=use_mg, mg=build_mg_param(args) if use_mg else None)
        for i, (lam, r) in enumerate(zip(res.evals, res.resids)):
            log(f"Mugiq: Eval[{i:04d}] = {lam:+.16e} , Residual = {r:+.16e}")
        for i, s in enumerate(res.sigma):
            log(f"Mugiq: Sigma[{i:04d}] = {s:+.16e}")
        if not res.converged:
            log("WARNING: production eigensolve did NOT converge to tolerance")
    else:
        import jax.numpy as jnp
        result, eig_res = api.compute_loop(
            jnp.asarray(U), gp, ip, ep, lp,
            compute_coarse=args.mugiq_compute_coarse == "yes",
            use_mg=use_mg,
            mg=build_mg_param(args) if use_mg else None,
            U_loop=None if U_loop is None else jnp.asarray(U_loop))
        eig_res.print_evals()
        if args.loop_coarse_ulocal == "yes":
            if eig_res.mg_env is None:
                p.error("--loop-coarse-ulocal requires --mugiq-use-mg yes "
                        "--mugiq-compute-coarse yes (coarse eigenvectors)")
            import numpy as np
            from ..mg.coarse_loop import coarse_loop_ulocal
            lam = np.asarray([complex(v).real for v in eig_res.evals])
            cl = coarse_loop_ulocal(eig_res.mg_env, eig_res.evecs,
                                    1.0 / lam, geom, momenta,
                                    int(lp.ft_sign))
            log(f"coarse-space ultra-local loop assembled: shape "
                f"{cl.shape}, |L|_max = {np.abs(cl).max():.6e}")
    log(f"Time for solution = {time.time() - t0:.3f} s")
    print_profile()
    return 0


if __name__ == "__main__":
    sys.exit(main())
