from .lanczos import lanczos_hermitian, LanczosResult, chebyshev_op, estimate_spectral_edge
from .eigsolve import Eigensolver, EigsolveOutput
