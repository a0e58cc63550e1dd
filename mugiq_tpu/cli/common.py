"""Shared CLI flags — the test_params_mugiq / QUDA make_app analog.

Mirrors the flag vocabulary of the reference drivers
(/root/reference/tests/test_params_mugiq.cpp:61-112 plus the QUDA standard
flags they build on), mapped onto this framework's parameters.  Flags that
only made sense for the CUDA/MPI runtime (--gridsize, pads, reconstruct) are
replaced by the mesh options.
"""

import argparse

import numpy as np

from ..params import (DslashType, EigOperator, EigParam, GaugeParam,
                      InvertParam, MGParam, MassNormalization, Spectrum)


def add_lattice_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("lattice")
    g.add_argument("--dims", type=int, nargs=4, metavar=("X", "Y", "Z", "T"),
                   default=[8, 8, 8, 16], help="global lattice dims")
    g.add_argument("--gauge", default="weak:0.2",
                   help="gauge source: unit | random | weak[:eps] | <nersc file>")
    g.add_argument("--gauge-seed", type=int, default=0)
    g.add_argument("--periodic-t", action="store_true",
                   help="periodic (instead of antiperiodic) fermion time BC")
    g.add_argument("--prec", choices=["single", "double"], default="single",
                   help="working precision (double forces the CPU/x64 path)")
    g.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu)")
    g.add_argument("--compile-cache", choices=["yes", "no"], default="yes",
                   help="persistent XLA executable cache (tune-cache analog)")


def add_dirac_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("dirac operator")
    g.add_argument("--dslash-type", choices=["wilson", "clover"],
                   default="wilson")
    g.add_argument("--kappa", type=float, default=None)
    g.add_argument("--mass", type=float, default=None)
    g.add_argument("--csw", type=float, default=1.0, help="clover coefficient")
    g.add_argument("--anisotropy", type=float, default=1.0)
    g.add_argument("--mass-normalization", choices=["kappa", "mass"],
                   default="kappa")
    g.add_argument("--solve-type", choices=["direct", "direct-pc"],
                   default="direct",
                   help="direct-pc eigensolves the even-odd preconditioned "
                        "operator (QUDA_DIRECT_PC_SOLVE analog)")


def add_eig_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("eigensolver")
    g.add_argument("--eig-nev", type=int, default=16)
    g.add_argument("--eig-nkr", type=int, default=48)
    g.add_argument("--eig-tol", type=float, default=1e-8)
    g.add_argument("--eig-max-restarts", type=int, default=200)
    g.add_argument("--eig-spectrum", choices=["SR", "LR"], default="SR")
    g.add_argument("--eig-operator", choices=["MdagM", "MMdag"],
                   default="MdagM",
                   help="Dirac matrix to eigensolve (use-norm-op/use-dagger)")
    g.add_argument("--eig-use-poly-acc", action="store_true")
    g.add_argument("--eig-poly-deg", type=int, default=50)
    g.add_argument("--eig-amin", type=float, default=0.1)
    g.add_argument("--eig-amax", type=float, default=0.0,
                   help="0 = auto-estimate")
    g.add_argument("--eig-seed", type=int, default=1234)
    g.add_argument("--eig-block-size", type=int, default=1,
                   help="block thick-restart Lanczos block size (>1; "
                   "production normal-operator path)")
    g.add_argument("--eig-vec-outfile", default="",
                   help="save eigenvectors/values (HDF5)")
    g.add_argument("--eig-vec-infile", default="",
                   help="load eigenvectors/values instead of solving "
                        "(checkpoint resume)")


def add_parallel_args(p: argparse.ArgumentParser):
    g = p.add_argument_group(
        "parallel (the reference's --gridsize / initComms, "
        "tests/eigensolve.cpp:683)")
    g.add_argument("--mesh", type=int, nargs="+", default=None, metavar="N",
                   help="device mesh shape over the (t[, z[, y]]) lattice "
                        "axes, e.g. --mesh 4 2; default: single device")
    g.add_argument("--dist-coordinator", default=None,
                   help="host:port of the jax.distributed coordinator "
                        "(multi-host; omit under a TPU pod launcher that "
                        "auto-detects)")
    g.add_argument("--dist-num-processes", type=int, default=None)
    g.add_argument("--dist-process-id", type=int, default=None)


def build_mesh(args):
    """Initialize multi-host (if requested) and build the device mesh."""
    if getattr(args, "dist_coordinator", None) or \
            getattr(args, "dist_num_processes", None):
        from ..parallel.distributed import init_distributed
        init_distributed(args.dist_coordinator, args.dist_num_processes,
                         args.dist_process_id)
    if getattr(args, "mesh", None) is None:
        return None
    from ..parallel.mesh import make_lattice_mesh
    return make_lattice_mesh(tuple(args.mesh))


def add_mg_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("multigrid")
    g.add_argument("--mugiq-use-mg", choices=["yes", "no"], default="no")
    g.add_argument("--mugiq-compute-coarse", choices=["yes", "no"],
                   default="yes")
    g.add_argument("--mg-levels", type=int, default=2)
    g.add_argument("--mg-block-size", type=int, nargs="+", default=[4, 4, 4, 4],
                   metavar="B", help="geo block per level, 4 ints per level")
    g.add_argument("--mg-nvec", type=int, nargs="+", default=[24])
    g.add_argument("--mg-setup-iters", type=int, default=50)
    g.add_argument("--mg-vec-outfile", default="",
                   help="save the built MG hierarchy (transfer bases + "
                        "Galerkin stencils; mg_vec_outfile analog)")
    g.add_argument("--mg-vec-infile", default="",
                   help="load a saved hierarchy instead of running the "
                        "null-vector setup (mg_vec_infile analog)")


def setup_jax(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.prec == "double":
        jax.config.update("jax_enable_x64", True)
    # persistent executable cache — the saveTuneCache analog
    # (lib/interface_mugiq.cpp:72): first compiles through the TPU tunnel
    # cost minutes; repeat runs of the same shapes skip them entirely.
    if getattr(args, "compile_cache", "yes") != "no":
        from ..profiling import enable_compilation_cache
        from ..aot_cache import enable_aot_cache
        try:
            enable_compilation_cache()
            # serialized-EXECUTABLE cache on top: a cold process skips
            # trace+lower too (probe_aot.json: 0.01 s load vs 4.8 s)
            enable_aot_cache()
        except Exception:
            pass  # read-only home etc. — never fatal


def build_params(args):
    gp = GaugeParam(dims=tuple(args.dims),
                    antiperiodic_t=not args.periodic_t,
                    anisotropy=args.anisotropy)
    kappa = args.kappa
    mass = args.mass
    if kappa is None and mass is None:
        kappa = 0.12
    ip = InvertParam(
        dslash_type=(DslashType.CLOVER_WILSON if args.dslash_type == "clover"
                     else DslashType.WILSON),
        kappa=kappa, mass=mass, csw=args.csw, anisotropy=args.anisotropy,
        mass_normalization=(MassNormalization.MASS
                            if args.mass_normalization == "mass"
                            else MassNormalization.KAPPA))
    ep = EigParam(n_ev=args.eig_nev, n_kr=args.eig_nkr, tol=args.eig_tol,
                  max_restarts=args.eig_max_restarts,
                  spectrum=Spectrum[args.eig_spectrum],
                  operator=EigOperator[args.eig_operator],
                  use_poly_acc=args.eig_use_poly_acc,
                  poly_deg=args.eig_poly_deg, a_min=args.eig_amin,
                  a_max=args.eig_amax, seed=args.eig_seed,
                  block_size=args.eig_block_size)
    return gp, ip, ep


def build_mg_param(args) -> MGParam:
    bs = args.mg_block_size
    n_coarse = args.mg_levels - 1
    if len(bs) == 4:
        blocks = [tuple(bs)] * n_coarse
    else:
        assert len(bs) == 4 * n_coarse, "--mg-block-size needs 4 ints per level"
        blocks = [tuple(bs[4 * i:4 * i + 4]) for i in range(n_coarse)]
    nv = args.mg_nvec
    if len(nv) == 1:
        nv = nv * n_coarse
    return MGParam(n_level=args.mg_levels, geo_block_size=blocks, n_vec=nv,
                   setup_iters=args.mg_setup_iters,
                   vec_outfile=getattr(args, "mg_vec_outfile", ""),
                   vec_infile=getattr(args, "mg_vec_infile", ""))


def load_gauge_from_args(args, gp: GaugeParam):
    """Returns (U as NUMPY complex, geom).

    Gauge setup stays host-side: complex device arrays cannot even be
    created on the TPU backend, so the CLI converts to device arrays only
    on the CPU/validation path (and the production path converts to the
    real-pair layouts itself)."""
    from ..lattice import LatticeGeometry
    from ..io.gauge_io import load_gauge_np

    geom = LatticeGeometry(gp.dims)
    return load_gauge_np(args.gauge, geom, seed=args.gauge_seed), geom


def read_momenta_file(path: str):
    """Momenta file: one 'px py pz' triple per line (tests/loop.cpp:723-746)."""
    moms = []
    with open(path) as f:
        for i, line in enumerate(f):
            parts = line.split()
            if not parts:
                continue
            if len(parts) < 3:
                raise ValueError(f"{path}: bad momenta line {i}: {line!r}")
            moms.append(tuple(int(x) for x in parts[:3]))
    if not moms:
        raise ValueError(f"{path}: no momenta found")
    return moms
