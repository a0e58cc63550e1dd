"""Layout converters between complex (validation) and planar (production)."""

import numpy as np
import jax.numpy as jnp


def spinor_to_planar(z, dtype=jnp.float32):
    """complex [T,Z,Y,X,4,3] -> planar [2,4,3,T,Z,Y,X] (host-side)."""
    a = np.asarray(z)
    p = np.stack([a.real, a.imag])                 # [2,T,Z,Y,X,4,3]
    return jnp.asarray(np.transpose(p, (0, 5, 6, 1, 2, 3, 4)), dtype=dtype)


def spinor_from_planar(p):
    """planar [2,4,3,T,Z,Y,X] -> complex numpy [T,Z,Y,X,4,3]."""
    a = np.asarray(p)
    a = np.transpose(a, (0, 3, 4, 5, 6, 1, 2))
    return a[0] + 1j * a[1]


def gauge_to_planar(U, dtype=jnp.float32):
    """complex [4,T,Z,Y,X,3,3] -> planar [2,4,3,3,T,Z,Y,X] (host-side)."""
    a = np.asarray(U)
    p = np.stack([a.real, a.imag])                 # [2,4,T,Z,Y,X,3,3]
    return jnp.asarray(np.transpose(p, (0, 1, 6, 7, 2, 3, 4, 5)), dtype=dtype)


def clover_to_planar(A, dtype=jnp.float32):
    """complex [T,Z,Y,X,4,3,4,3] -> planar [2,4,3,4,3,T,Z,Y,X]."""
    a = np.asarray(A)
    p = np.stack([a.real, a.imag])                 # [2,T,Z,Y,X,4,3,4,3]
    return jnp.asarray(np.transpose(p, (0, 5, 6, 7, 8, 1, 2, 3, 4)), dtype=dtype)
