"""Disconnected-loop measurement driver — the Loop_Mugiq analog.

Implements the flagship pipeline of the reference
(computeCoarseLoop + performMomentumProjection + writeLoopsHDF5,
/root/reference/lib/loop_mugiq.cpp:440-525, 322-434, 529-656):

for each displacement entry (plus the ultra-local slot):
    vR <- eigenvector, displaced idisp times covariantly
    dataPos[slot, G, x] += (1/sigma_n) Tr[ v_n(x)^dag Gamma(G) vR_n(x) ]
then the g5*Gamma output remap, the momentum projection (MXU matmul over
the spatial volume), and HDF5 output.

Improvements over the reference (intentional):
* eigenvector prolongation is hoisted out of the displacement-entry loop
  (the reference recomputes it per entry, loop_mugiq.cpp:482);
* the eigenvector sum is one batched contraction instead of nEv kernel
  launches;
* displacements are batched over all eigenvectors at once.
"""

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lattice import LatticeGeometry
from .params import LoopParam, parse_disp_entry
from .displace import covariant_displace
from .ops.contract import loop_contract
from .ops.phase import phase_matrix, map_gamma_g5, momentum_project

N_GAMMA = 16


@dataclass
class LoopComputeParam:
    """Derived bookkeeping (mirrors LoopComputeParam, loop_mugiq.h:141-271)."""
    geom: LatticeGeometry
    n_mom: int
    disp_entries: List[Tuple[str, int, int]] = field(default_factory=list)
    # derived
    n_loop_per_entry: List[int] = field(default_factory=list)
    n_loop_offset: List[int] = field(default_factory=list)
    n_loop: int = 1
    n_data: int = N_GAMMA

    @classmethod
    def build(cls, geom: LatticeGeometry, lp: LoopParam):
        from .params import CalcType
        if lp.calc_type != CalcType.OPT_KERNEL:
            # reference parity: only LOOP_CALC_TYPE_OPT_KERNEL is live;
            # BLAS/BASIC error out (loop_mugiq.cpp calc-type dispatch,
            # SURVEY §2.2 — both paths exist only in lib/LEGACY)
            raise ValueError(
                f"loop calc_type {lp.calc_type.name} is not implemented "
                "(the reference supports only OPT_KERNEL; BLAS/BASIC are "
                "legacy-disabled there too)")
        entries = [parse_disp_entry(e) for e in lp.disp_entries] if lp.do_nonlocal else []
        per = [stop - start + 1 for (_, start, stop) in entries]
        offs = []
        acc = 1  # slot 0 is the ultra-local loop
        for p in per:
            offs.append(acc)
            acc += p
        n_loop = acc
        return cls(geom=geom, n_mom=len(list(lp.momenta)),
                   disp_entries=entries, n_loop_per_entry=per,
                   n_loop_offset=offs, n_loop=n_loop,
                   n_data=n_loop * N_GAMMA)

    def slot_labels(self) -> List[str]:
        """HDF5 disp-group label per loop slot, in slot order
        ('disp_0', 'disp_+z_1', ...; loop_mugiq.cpp:598-609)."""
        labels = ["disp_0"]
        for (dstr, start, stop) in self.disp_entries:
            for idisp in range(start, stop + 1):
                labels.append(f"disp_{dstr}_{idisp}")
        return labels


@dataclass
class LoopResult:
    data_pos: jnp.ndarray            # [nLoop, 16, T, Z, Y, X] raw traces T(G)
    data_mom: Optional[np.ndarray]   # [Nmom, nLoop, 16, totT] after g5-map+FT
    cparam: LoopComputeParam
    momenta: List[Tuple[int, int, int]]


class LoopComputer:
    """Drives the loop measurement for a set of (fine-level) eigenvectors."""

    def __init__(self, geom: LatticeGeometry, loop_param: LoopParam,
                 U_disp: Optional[jnp.ndarray] = None):
        """U_disp: unphased gauge used for covariant displacements (the
        smeared 'loop gauge' of the reference); required when do_nonlocal."""
        self.geom = geom
        self.lp = loop_param
        self.cparam = LoopComputeParam.build(geom, loop_param)
        self.U_disp = U_disp
        if loop_param.do_nonlocal and U_disp is None:
            raise ValueError("do_nonlocal requires a displacement gauge field")

    def compute(self, evecs: jnp.ndarray, sigma: np.ndarray) -> LoopResult:
        """evecs: [nEv, T, Z, Y, X, 4, 3] fine-level eigenvectors;
        sigma: [nEv] singular values (1/sigma weights the trace)."""
        cp = self.cparam
        inv_sigma = jnp.asarray(1.0 / np.asarray(sigma))
        shape_pos = (cp.n_loop, N_GAMMA) + self.geom.shape_tzyx

        contract = jax.jit(loop_contract)
        slots = [None] * cp.n_loop
        # ultra-local slot (vL = vR = v)
        slots[0] = contract(evecs, evecs, inv_sigma)

        for ie, (dstr, start, stop) in enumerate(cp.disp_entries):
            vR = evecs
            count = 0
            for idisp in range(1, stop + 1):
                vR = covariant_displace(self.U_disp, vR, dstr)
                if start <= idisp <= stop:
                    slots[cp.n_loop_offset[ie] + count] = contract(evecs, vR, inv_sigma)
                    count += 1

        data_pos = jnp.stack(slots)  # [nLoop, 16, T, Z, Y, X]
        assert data_pos.shape == shape_pos

        data_mom = None
        if self.lp.do_mom_proj:
            data_mom = self.momentum_projection(data_pos)
        return LoopResult(data_pos=data_pos, data_mom=data_mom, cparam=cp,
                          momenta=[tuple(m) for m in self.lp.momenta])

    def momentum_projection(self, data_pos: jnp.ndarray) -> np.ndarray:
        """g5-Gamma remap + spatial Fourier projection.

        Returns host array [Nmom, nLoop, 16, totT], the layout of the
        reference's broadcast buffer dataMom_bcast
        (t + locT*ig + locT*nG*iL + locT*nG*nLoop*im, loop_mugiq.cpp:415-418
        — time-fastest there, so index order (im, iL, ig, t) here).
        """
        ph = phase_matrix(self.geom, self.lp.momenta, int(self.lp.ft_sign),
                          data_pos.dtype)

        @jax.jit
        def project(dp):
            mapped = map_gamma_g5(dp)
            return momentum_project(mapped, ph)   # [l, g, t, p]

        lgtp = project(data_pos)
        return np.asarray(jnp.transpose(lgtp, (3, 0, 1, 2)))
