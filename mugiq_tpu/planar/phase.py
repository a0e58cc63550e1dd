"""g5 remap + momentum projection in the planar layout."""

import jax
import jax.numpy as jnp
import numpy as np

from ..gamma import gamma_map_sign, gamma_map_index


def map_gamma_g5_planar(data: jnp.ndarray) -> jnp.ndarray:
    """data [l, 2, 16, T, Z, Y, X]: remap/sign on the gamma axis (axis 2)."""
    sign = gamma_map_sign()
    idx = gamma_map_index()
    inv = np.argsort(idx)
    s = jnp.asarray(sign[inv], dtype=data.dtype)
    return data[:, :, jnp.asarray(inv)] * s[None, None, :, None, None, None, None]


def momentum_project_planar(data: jnp.ndarray, phases_planar: jnp.ndarray
                            ) -> jnp.ndarray:
    """dataMom[l, 2, g, t, p] from data[l, 2, g, T, Z, Y, X] and phases
    [2, Z, Y, X, P].  The (z,y,x) contraction is the reference's cuBLAS GEMM;
    4 real MXU matmuls here."""
    dr, di = data[:, 0], data[:, 1]
    phr, phi_ = phases_planar[0], phases_planar[1]
    outr = jnp.einsum("lgtzyx,zyxp->lgtp", dr, phr, precision=jax.lax.Precision.HIGHEST) \
        - jnp.einsum("lgtzyx,zyxp->lgtp", di, phi_, precision=jax.lax.Precision.HIGHEST)
    outi = jnp.einsum("lgtzyx,zyxp->lgtp", dr, phi_, precision=jax.lax.Precision.HIGHEST) \
        + jnp.einsum("lgtzyx,zyxp->lgtp", di, phr, precision=jax.lax.Precision.HIGHEST)
    return jnp.stack([outr, outi], axis=1)


def phase_matrix_planar(geom, momenta, ft_sign, dtype=jnp.float32):
    """Host-built planar phase array [2, Z, Y, X, P]."""
    mom = np.asarray(list(momenta), dtype=np.int64).reshape(-1, 3)
    Lx, Ly, Lz, _ = geom.dims
    z, y, x = np.meshgrid(np.arange(Lz), np.arange(Ly), np.arange(Lx),
                          indexing="ij")
    phi = (mom[:, 0][:, None, None, None] * x[None] / Lx
           + mom[:, 1][:, None, None, None] * y[None] / Ly
           + mom[:, 2][:, None, None, None] * z[None] / Lz)
    ph = np.exp(1j * int(ft_sign) * 2.0 * np.pi * phi)   # [P, Z, Y, X]
    ph = np.moveaxis(ph, 0, -1)
    return jnp.asarray(np.stack([ph.real, ph.imag]), dtype=dtype)
