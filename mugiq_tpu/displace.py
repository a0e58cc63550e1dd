"""Covariant displacement of spinor fields.

Replaces the Displace class + covariantDisplacementVector CUDA kernel
(/root/reference/lib/displace.cpp, lib/mugiq_displace_kernels.cu:156-185):

    psi'(x) = U_d(x) psi(x + d)        for a '+' displacement
    psi'(x) = U_d^dag(x - d) psi(x - d) for a '-' displacement

The reference realises the neighbour access with an extended-halo gauge
field and ghost-zone indexing (displace.cpp:104-134); on TPU the shifts are
``jnp.roll`` on the (possibly sharded) global arrays, which XLA lowers to
ICI collective-permutes — no ghost zones needed.

The displacement gauge field is the *unphased* (smeared) loop gauge — the
reference loads a separate --loop-gauge-filename field for this
(tests/loop.cpp:901-918) and never applies fermion boundary phases to it.
"""

import jax.numpy as jnp

from .fields import shift

_DIRS = {"x": 0, "y": 1, "z": 2, "t": 3}


def parse_disp_str(disp_str: str):
    """'+z' -> (dir=2, sign=+1); matches WhichDisplaceDir/Sign
    (lib/displace.cpp:152-202)."""
    if len(disp_str) != 2 or disp_str[0] not in "+-" or disp_str[1] not in _DIRS:
        raise ValueError(f"cannot parse displacement string '{disp_str}'")
    return _DIRS[disp_str[1]], (+1 if disp_str[0] == "+" else -1)


def covariant_displace(U: jnp.ndarray, psi: jnp.ndarray, disp_str: str) -> jnp.ndarray:
    """One covariant displacement step of psi along disp_str.

    U: [4, T, Z, Y, X, 3, 3] unphased gauge; psi: [..., T, Z, Y, X, 4, 3]
    (leading batch axes allowed, e.g. the eigenvector index).
    """
    d, sign = parse_disp_str(disp_str)
    ro = psi.ndim - 6  # leading batch axes
    if sign > 0:
        nbr = shift(psi, d, +1, rank_offset=ro)
        return jnp.einsum("tzyxab,...tzyxsb->...tzyxsa", U[d], nbr)
    else:
        nbr = shift(psi, d, -1, rank_offset=ro)
        u_bwd = shift(U[d], d, -1)
        return jnp.einsum("tzyxba,...tzyxsb->...tzyxsa", jnp.conj(u_bwd), nbr)
