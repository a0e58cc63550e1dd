"""Public interface — the mugiq.h / interface_mugiq.cpp analog.

Mirrors the four entry points of /root/reference/include/mugiq.h:54-81:

* :func:`compute_evecs_mugiq`      <-> computeEvecsMuGiq (fine operator)
* :func:`compute_evecs_mugiq_mg`   <-> computeEvecsMuGiq_MG (MG-coarse op)
* :func:`compute_loop`             <-> computeLoop<Float>
* compute_evecs_quda_wrapper has no meaning here (it delegated wholesale to
  QUDA); :func:`compute_evecs_mugiq` is the single eigensolve entry point.
"""

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .lattice import LatticeGeometry
from .params import (EigParam, GaugeParam, InvertParam, LoopParam, MGParam)
from .dirac import WilsonDirac, make_dirac
from .eig.eigsolve import Eigensolver, EigsolveOutput
from .loop import LoopComputer, LoopResult
from .io.hdf5io import write_loops_hdf5_mom, write_loops_hdf5_pos
from .ops.phase import map_gamma_g5
from .utils import log, phase_timer


@dataclass
class EigsolveResult:
    output: EigsolveOutput
    dirac: WilsonDirac
    geom: LatticeGeometry
    mg_env: Optional[object] = None   # MGEnv when the coarse path was used

    @property
    def evecs(self):
        return self.output.evecs

    @property
    def evals(self):
        return self.output.evals

    @property
    def sigma(self):
        return self.output.sigma

    def print_evals(self):
        """printEvals analog (lib/eigsolve_mugiq.cpp:317-335)."""
        if not self.output.converged:
            log(f"WARNING: eigensolver did NOT converge to tolerance in "
                f"{self.output.n_restarts} restarts; residuals below are "
                f"as-is (raise n_kr / max_restarts)")
        for i, (lam, r) in enumerate(zip(self.output.evals, self.output.resids)):
            log(f"Mugiq: Eval[{i:04d}] = {lam.real:+.16e} {lam.imag:+.16e} , "
                f"Residual = {r:+.16e}")
        if self.output.sigma is not None:
            for i, s in enumerate(self.output.sigma):
                log(f"Mugiq: Sigma[{i:04d}] = {s:+.16e}")


def compute_evecs_mugiq(U: jnp.ndarray, gauge: GaugeParam, inv: InvertParam,
                        eig: EigParam,
                        even_odd: bool = False) -> EigsolveResult:
    """Eigenpairs of the fine Dirac matrix (computeEvecsMuGiq,
    lib/interface_mugiq.cpp:122-156).

    even_odd=True eigensolves the even-even Schur-preconditioned operator
    (the reference's pc_solve path, lib/eigsolve_mugiq.cpp:169-181);
    eigenvectors then live on the even sites of the full-layout field."""
    geom = LatticeGeometry(gauge.dims)
    dirac = make_dirac(U, gauge, inv)
    op_src = dirac
    v0_transform = None
    if even_odd:
        from .schur import SchurDirac
        op_src = SchurDirac.from_dirac(dirac)
        v0_transform = op_src.project_even
    with phase_timer("eigensolve"):
        solver = Eigensolver(op_src.operator(eig.operator), op_src.field_shape,
                             op_src.dtype, eig, inv,
                             v0_transform=v0_transform)
        out = solver.solve()
    return EigsolveResult(output=out, dirac=dirac, geom=geom)


def compute_evecs_mugiq_mg(U: jnp.ndarray, gauge: GaugeParam, inv: InvertParam,
                           eig: EigParam, mg: MGParam) -> EigsolveResult:
    """Eigenpairs of the MG-coarse operator (computeEvecsMuGiq_MG,
    lib/interface_mugiq.cpp:79-118)."""
    from .mg.mg import MGEnv

    geom = LatticeGeometry(gauge.dims)
    dirac = make_dirac(U, gauge, inv)
    with phase_timer("mg-setup"):
        mg_env = MGEnv.build(dirac, mg)
    coarse = mg_env.coarsest_op
    with phase_timer("eigensolve"):
        solver = Eigensolver(coarse.operator(eig.operator), coarse.field_shape,
                             coarse.dtype, eig, inv)
        out = solver.solve()
    return EigsolveResult(output=out, dirac=dirac, geom=geom, mg_env=mg_env)


def compute_loop(U: jnp.ndarray, gauge: GaugeParam, inv: InvertParam,
                 eig: EigParam, loop_param: LoopParam,
                 compute_coarse: bool = False, use_mg: bool = False,
                 mg: Optional[MGParam] = None,
                 U_loop: Optional[jnp.ndarray] = None) -> Tuple[LoopResult, EigsolveResult]:
    """Disconnected loops with (optionally multigrid-deflated) eigenvectors.

    Mirrors computeLoop<Float> (lib/interface_mugiq.cpp:175-248):
    eigensolve (fine or MG-coarse), prolongate coarse evecs to the fine
    lattice, run the loop pipeline, write HDF5.  ``U_loop`` is the separate
    (smeared) gauge for displacements (tests/loop.cpp:901-918); defaults to
    the unphased ``U``.
    """
    if use_mg and compute_coarse:
        if mg is None:
            raise ValueError("use_mg requires MGParam")
        eig_res = compute_evecs_mugiq_mg(U, gauge, inv, eig, mg)
        with phase_timer("prolongate"):
            fine_evecs = eig_res.mg_env.prolongate_batch(eig_res.evecs)
    else:
        eig_res = compute_evecs_mugiq(U, gauge, inv, eig)
        fine_evecs = eig_res.evecs

    if eig_res.sigma is None:
        raise ValueError("loop measurement requires the normal-operator "
                         "sigma weights (eig.operator MdagM/MMdag)")

    geom = eig_res.geom
    computer = LoopComputer(geom, loop_param,
                            U_disp=(U_loop if U_loop is not None else U))
    with phase_timer("loop-contraction"):
        result = computer.compute(fine_evecs, eig_res.sigma)

    if loop_param.do_mom_proj and (loop_param.write_mom_space_hdf5
                                   or loop_param.fname_mom_h5):
        fname = loop_param.fname_mom_h5
        if not fname:
            raise ValueError("write_mom_space_hdf5 set but fname_mom_h5 empty")
        write_loops_hdf5_mom(fname, result.data_mom, result.momenta,
                             result.cparam.slot_labels())
        log(f"compute_loop: momentum-space loop data written to {fname}")
    if loop_param.write_pos_space_hdf5:
        fname = loop_param.fname_pos_h5
        if not fname:
            raise ValueError("write_pos_space_hdf5 set but fname_pos_h5 empty")
        mapped = np.asarray(map_gamma_g5(result.data_pos))
        write_loops_hdf5_pos(fname, mapped, result.cparam.slot_labels())
        log(f"compute_loop: position-space loop data written to {fname}")

    return result, eig_res
