"""Momentum-projection phase matrix and projection.

Replaces phaseMatrix_kernel + the cuBLAS Zgemm momentum projection
(/root/reference/lib/mugiq_util_kernels.cu:3-35,
 /root/reference/lib/loop_mugiq.cpp:322-434):

    phase(x, p) = exp( i * sign * 2*pi * sum_d p_d x_d / L_d )
    dataMom[l, g, t, p] = sum_{z,y,x} dataPos[l, g, t, z, y, x] * phase(x, p)

The spatial contraction is a complex matmul [T*nData, V3] x [V3, Nmom] — on
TPU a single MXU einsum; on a sharded lattice the contraction over the
spatial axes is a partial-sum + XLA all-reduce, replacing the reference's
MPI_Reduce over COMM_SPACE.
"""

import jax.numpy as jnp
import numpy as np

from ..lattice import LatticeGeometry
from ..gamma import gamma_map_sign, gamma_map_index


def phase_matrix(geom: LatticeGeometry, momenta, ft_sign: int, dtype) -> jnp.ndarray:
    """Phase array [Z, Y, X, Nmom] (complex).

    momenta: sequence of (px, py, pz) integer triples (the reference's
    momMatrix rows); ft_sign in {-1, +1} selects the exponent sign
    (enum_mugiq.h:29-34).
    """
    mom = np.asarray(list(momenta), dtype=np.int64).reshape(-1, 3)
    Lx, Ly, Lz, _ = geom.dims
    z, y, x = np.meshgrid(np.arange(Lz), np.arange(Ly), np.arange(Lx), indexing="ij")
    # phi(x; p) = px*x/Lx + py*y/Ly + pz*z/Lz
    phi = (mom[:, 0][:, None, None, None] * x[None] / Lx
           + mom[:, 1][:, None, None, None] * y[None] / Ly
           + mom[:, 2][:, None, None, None] * z[None] / Lz)
    ph = np.exp(1j * ft_sign * 2.0 * np.pi * phi)      # [Nmom, Z, Y, X]
    return jnp.asarray(np.moveaxis(ph, 0, -1), dtype=dtype)


def map_gamma_g5(data_pos: jnp.ndarray) -> jnp.ndarray:
    """Apply the G -> g5*G output mapping on the gamma axis (axis 1).

    Replaces the remap half of convertIdxOrder_mapGamma_kernel
    (lib/mugiq_util_kernels.cu:88-97): out[:, index_map[i]] = sign[i]*in[:, i].
    The index-order conversion half (even/odd -> lexicographic) is a no-op
    here because fields are stored lexicographically already.
    """
    sign = gamma_map_sign()            # indexed by *input* gamma
    idx = gamma_map_index()            # output index for input i (= 15 - i)
    # out[:, j] = sign[inv[j]] * in[:, inv[j]] with inv[j] = 15 - j
    inv = np.argsort(idx)              # = idx itself (involution), kept explicit
    s = jnp.asarray(sign[inv], dtype=data_pos.real.dtype)
    return data_pos[:, jnp.asarray(inv)] * s[None, :, None, None, None, None]


def momentum_project(data_pos_mapped: jnp.ndarray, phases: jnp.ndarray) -> jnp.ndarray:
    """dataMom[l, g, t, p] from dataPos[l, g, t, z, y, x] and phases [Z,Y,X,P]."""
    return jnp.einsum("lgtzyx,zyxp->lgtp", data_pos_mapped, phases)
