"""mugiq_tpu — TPU-native framework for multigrid-deflated disconnected quark loops.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ckallidonis/mugiq
(plus the QUDA capabilities it consumes): Wilson / Wilson-clover Dirac operators,
multigrid hierarchy, thick-restart Lanczos eigensolver, covariant displacements,
disconnected-loop trace measurement with momentum projection, and HDF5 output.

The compute path is jax.numpy / Pallas over a 4D-sharded lattice
(``jax.sharding.Mesh`` with axes over z/t by default); halo exchange and global
reductions are inserted by XLA from ``jnp.roll`` / reductions over sharded arrays
(collective-permute / all-reduce over ICI), replacing the reference's
MPI+ghost-zone machinery (see SURVEY.md §2.4).
"""

from .config import default_real_dtype, default_complex_dtype
from .gamma import (
    GAMMA_NAMES,
    gamma_matrices,
    gamma_basis,
    gamma5,
    gamma_map_sign,
    gamma_map_index,
)
from .lattice import LatticeGeometry
from . import fields
from .params import (
    GaugeParam,
    InvertParam,
    EigParam,
    MGParam,
    LoopParam,
    DslashType,
    EigOperator,
    Spectrum,
)
from .dirac import WilsonDirac, make_dirac
from .api import (
    compute_evecs_mugiq,
    compute_evecs_mugiq_mg,
    compute_loop,
    EigsolveResult,
    LoopResult,
)

__version__ = "0.1.0"
