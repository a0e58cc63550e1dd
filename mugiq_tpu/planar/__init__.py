"""Planar (separate re/im, lattice-minor) production stack for TPU.

Layouts (see ops/dslash_planar.py for the rationale — TPU (8,128) tiling
needs the large lattice dims minor-most; complex dtypes are unsupported on
this backend entirely):

    spinor  [2, 4, 3, T, Z, Y, X]
    gauge   [2, 4, 3, 3, T, Z, Y, X]
    Krylov  [m+1, 2, n]  (flattened planar spinors)
    trace   [2, 16, T, Z, Y, X]
"""

from .dirac import WilsonDiracPlanar
from .contract import loop_contract_planar
from .phase import momentum_project_planar, map_gamma_g5_planar
from .lanczos import lanczos_hermitian_planar
from .convert import (spinor_to_planar, spinor_from_planar, gauge_to_planar,
                      clover_to_planar)
