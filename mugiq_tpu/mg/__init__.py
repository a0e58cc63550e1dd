from .transfer import Transfer, BlockGeometry, block_edge_mask
from .coarse import StencilOperator, galerkin_coarse_operator
from .setup import setup_null_vectors
from .mg import MGEnv
