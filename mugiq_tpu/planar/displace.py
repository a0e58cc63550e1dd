"""Covariant displacement in the planar layout (unrolled, production path).

Same semantics as displace.covariant_displace; the color multiply is
unrolled to elementwise ops on [T, Z, Y, X] site arrays (batched tiny
dot_generals are pathological on TPU — see ops/dslash_unrolled.py).
"""

import jax.numpy as jnp

from ..lattice import MU_TO_AXIS
from ..displace import parse_disp_str


def _roll(a, mu, sign):
    return jnp.roll(a, -sign, axis=MU_TO_AXIS[mu] + (a.ndim - 4))


def covariant_displace_planar(U: jnp.ndarray, psi: jnp.ndarray,
                              disp_str: str) -> jnp.ndarray:
    """U planar [2,4,3,3,T,Z,Y,X] (unphased loop gauge), psi planar
    [n?, 2, 4, 3, T, Z, Y, X] (optional leading batch)."""
    d, sign = parse_disp_str(disp_str)
    batched = psi.ndim == 8
    if not batched:
        psi = psi[None]

    if sign > 0:
        ur = U[0, d]
        ui = U[1, d]
    else:
        ur = _roll(U[0, d], d, -1)
        ui = -_roll(U[1, d], d, -1)
        # dagger also transposes color; handled by index swap below

    out_r = [[None] * 3 for _ in range(4)]
    out_i = [[None] * 3 for _ in range(4)]
    pr = _roll(psi[:, 0], d, sign)
    pi = _roll(psi[:, 1], d, sign)
    for s in range(4):
        for a in range(3):
            gr = gi = None
            for b in range(3):
                if sign > 0:
                    lr, li = ur[a, b], ui[a, b]
                else:
                    lr, li = ur[b, a], ui[b, a]
                tr = lr * pr[:, s, b] - li * pi[:, s, b]
                ti = lr * pi[:, s, b] + li * pr[:, s, b]
                gr = tr if gr is None else gr + tr
                gi = ti if gi is None else gi + ti
            out_r[s][a] = gr
            out_i[s][a] = gi

    rows_r = jnp.stack([jnp.stack(row, axis=1) for row in out_r], axis=1)
    rows_i = jnp.stack([jnp.stack(row, axis=1) for row in out_i], axis=1)
    out = jnp.stack([rows_r, rows_i], axis=1)
    return out if batched else out[0]
