"""Host-side construction of rc fields.

On this TPU backend even *creating* a complex device array fails, so all
complex-valued setup (gauge generation, boundary phases, noise) happens in
numpy on host and only the final real-pair array is transferred.
"""

import numpy as np
import jax.numpy as jnp

from ..lattice import LatticeGeometry
from ..fields import _project_su3


def _to_rc_np(z: np.ndarray) -> np.ndarray:
    return np.stack([z.real, z.imag], axis=-1)


def gauge_rc(geom: LatticeGeometry, kind: str = "random", seed: int = 0,
             antiperiodic_t: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """[4, T, Z, Y, X, 3, 3, 2] rc gauge field, built entirely on host."""
    shape = (4, *geom.shape_tzyx, 3, 3)
    if kind == "unit":
        u = np.broadcast_to(np.eye(3, dtype=np.complex128), shape).copy()
    elif kind == "random":
        rng = np.random.default_rng(seed)
        m = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        u = _project_su3(m)
    elif kind.startswith("weak"):
        eps = float(kind.split(":")[1]) if ":" in kind else 0.1
        rng = np.random.default_rng(seed)
        a = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        h = 0.5 * (a + np.conj(np.swapaxes(a, -1, -2)))
        tr = np.einsum("...ii->...", h) / 3.0
        h = h - tr[..., None, None] * np.eye(3)
        w, v = np.linalg.eigh(h)
        u = np.einsum("...ab,...b,...cb->...ac", v, np.exp(1j * eps * w),
                      np.conj(v))
    else:
        raise ValueError(f"unknown gauge kind {kind}")
    if antiperiodic_t:
        u[3, -1] *= -1.0
    return jnp.asarray(_to_rc_np(u), dtype=dtype)


def spinor_rc(geom: LatticeGeometry, seed: int = 0,
              dtype=jnp.float32) -> jnp.ndarray:
    """[T, Z, Y, X, 4, 3, 2] rc spinor with iid normal components."""
    rng = np.random.default_rng(seed)
    shape = (*geom.shape_tzyx, 4, 3, 2)
    return jnp.asarray(rng.standard_normal(shape), dtype=dtype)
