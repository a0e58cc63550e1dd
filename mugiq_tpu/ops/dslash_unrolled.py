"""Fully-unrolled planar Wilson dslash — no dot_general anywhere.

Measurement on the v5e chip showed both the rc-trailing layout AND the
planar einsum formulation stuck at ~3.5 GFLOP/s: XLA lowers the per-site
3x3 color contractions to batched tiny dot_generals, which TPU executes as
(padded) MXU tiles per site — catastrdophic.  The fix is the classic lattice
trick: unroll spin and color completely so the kernel is a pure chain of
elementwise multiply-adds over [T, Z, Y, X] site arrays (full VPU tiles,
fusable by XLA into a handful of HBM passes).

Spin structure is specialised per direction from the projector
factorisation (coefficients in {±1, ±i} — multiplications by i are
re/im swaps with sign flips, free at trace time).
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..lattice import MU_TO_AXIS
from .dslash import _projector_decomp


def _roll(a, mu, sign):
    """a(x + sign*mu) for a site array [..., T, Z, Y, X]."""
    return jnp.roll(a, -sign, axis=MU_TO_AXIS[mu] + (a.ndim - 4))


@lru_cache(maxsize=None)
def _proj_coeffs(mu: int, tag: str):
    """Integer-exact (coeff) tables: q [2, 4], r [4, 2] complex entries."""
    q, r = _projector_decomp()[(mu, tag)]
    # entries of q are rows of an orthonormal pair basis — they are NOT
    # always in {0, ±1, ±i} (SVD basis); round-trip through exact rationals
    # is unnecessary: we just unroll whatever the (constant) entries are.
    return q, r


def _cmac(acc, coeff: complex, zr, zi):
    """acc += coeff * z for a complex trace-time constant coeff.

    acc is a pair [ar, ai] of site arrays (python list, mutated)."""
    cr, ci = float(np.real(coeff)), float(np.imag(coeff))
    if cr != 0.0:
        acc[0] = zr * cr if acc[0] is None else acc[0] + zr * cr
        acc[1] = zi * cr if acc[1] is None else acc[1] + zi * cr
    if ci != 0.0:
        acc[0] = (-zi * ci) if acc[0] is None else acc[0] - zi * ci
        acc[1] = (zr * ci) if acc[1] is None else acc[1] + zr * ci
    return acc


def _hop_unrolled(Ur, Ui, psir, psii, mu: int, forward: bool):
    """One directed hop, fully unrolled.

    Ur/Ui: [3, 3, T, Z, Y, X] link parts (already the right link:
    U_mu(x) for forward; U_mu^dag(x-mu) handled by caller via shift+conj).
    psir/psii: [4, 3, T, Z, Y, X] neighbour spinor parts (already shifted).
    Returns (outr, outi) [4, 3, T, Z, Y, X] contributions.
    """
    q, r = _proj_coeffs(mu, "fwd" if forward else "bwd")

    # project: h[hs][c] = sum_s q[hs, s] psi[s][c]
    h = [[None, None] for _ in range(2 * 3)]     # (hs, c) -> [re, im]
    for hs in range(2):
        for s in range(4):
            coeff = q[hs, s]
            if coeff == 0:
                continue
            for c in range(3):
                _cmac(h[hs * 3 + c], coeff, psir[s, c], psii[s, c])

    # link multiply: g[hs][a] = sum_b U[a, b] h[hs][b]
    g = [[None, None] for _ in range(2 * 3)]
    for hs in range(2):
        for a in range(3):
            gr = gi = None
            for b in range(3):
                hr, hi = h[hs * 3 + b]
                ur, ui = Ur[a, b], Ui[a, b]
                tr = ur * hr - ui * hi
                ti = ur * hi + ui * hr
                gr = tr if gr is None else gr + tr
                gi = ti if gi is None else gi + ti
            g[hs * 3 + a] = [gr, gi]

    # reconstruct: out[s][c] = sum_hs r[s, hs] g[hs][c]
    outr = [[None] * 3 for _ in range(4)]
    outi = [[None] * 3 for _ in range(4)]
    for s in range(4):
        for hs in range(2):
            coeff = r[s, hs]
            if coeff == 0:
                continue
            for c in range(3):
                acc = [outr[s][c], outi[s][c]]
                _cmac(acc, coeff, g[hs * 3 + c][0], g[hs * 3 + c][1])
                outr[s][c], outi[s][c] = acc
    return outr, outi


def dslash_hop_unrolled(U: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """Planar-layout dslash with full spin-color unrolling.

    U [2, 4, 3, 3, T, Z, Y, X], psi [2, 4, 3, T, Z, Y, X] (same layouts as
    ops/dslash_planar.py).  Returns the hopping term, same layout as psi.
    """
    accr = [[None] * 3 for _ in range(4)]
    acci = [[None] * 3 for _ in range(4)]

    for mu in range(4):
        # forward: (1-g) U_mu(x) psi(x+mu)
        pr = _roll(psi[0], mu, +1)
        pi = _roll(psi[1], mu, +1)
        outr, outi = _hop_unrolled(U[0, mu], U[1, mu], pr, pi, mu, True)
        for s in range(4):
            for c in range(3):
                if outr[s][c] is not None:
                    accr[s][c] = outr[s][c] if accr[s][c] is None \
                        else accr[s][c] + outr[s][c]
                    acci[s][c] = outi[s][c] if acci[s][c] is None \
                        else acci[s][c] + outi[s][c]
        # backward: (1+g) U_mu^dag(x-mu) psi(x-mu)
        pr = _roll(psi[0], mu, -1)
        pi = _roll(psi[1], mu, -1)
        ur = _roll(U[0, mu], mu, -1)
        ui = -_roll(U[1, mu], mu, -1)
        # transpose color indices for the dagger
        ur = jnp.swapaxes(ur, 0, 1)
        ui = jnp.swapaxes(ui, 0, 1)
        outr, outi = _hop_unrolled(ur, ui, pr, pi, mu, False)
        for s in range(4):
            for c in range(3):
                if outr[s][c] is not None:
                    accr[s][c] = accr[s][c] + outr[s][c]
                    acci[s][c] = acci[s][c] + outi[s][c]

    rows_r = [jnp.stack(row) for row in accr]
    rows_i = [jnp.stack(row) for row in acci]
    return jnp.stack([jnp.stack(rows_r), jnp.stack(rows_i)])
