"""Coarse-space ultra-local loop: NO prolongation of eigenvectors.

The live reference pipeline prolongates coarse eigenvectors to the fine
lattice and contracts there (lib/loop_mugiq.cpp).  Its LEGACY tree records
the dual formulation (lib/LEGACY/loop_coarse.cu.LEGACY:334-340,
loop_coarse_ulocal.cu.LEGACY:406-452): restrict 12 spin-color unit
GENERATORS — unphased once, and phased+time-diluted per (momentum, t) —
through Transfer::R to the coarsest level, and assemble the ultra-local
loop entirely in coarse space:

    L_n(p,t) = sum_m w_m  u_m^dag r_i  *  gcoeff(n)_{ij}  *  v_j^dag u_m

with u_m the coarse eigenvectors, r_i = R(unit_i), v_j = R(phase *
delta_t * unit_j), and gcoeff(n)_{ij} = (gamma_n)_{s_i s_j} delta_{c_i
c_j} the dense 12x12 gamma coefficients
(lib/LEGACY/gamma.cu.LEGACY:136-199).

Because R = P^dag, this equals the fine-space contraction of the
prolongated eigenvectors exactly (up to roundoff) — the test pins that
equivalence.  The payoff is identical to the legacy rationale: the evec
batch never materializes at fine volume; the per-(p,t) work is 12
restrictions + small dense algebra.

Weights: ``weights`` defaults to 1/lambda_m (the legacy formula); pass
1/sigma_m to match the live pipeline's sigma convention.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..gamma import N_GAMMA, gamma_basis
from ..lattice import LatticeGeometry


@lru_cache(maxsize=None)
def _gcoeff_np():
    """[16, 12, 12] dense gamma coefficients in spin tensor color:
    gcoeff(n)[s*3+c, s'*3+c'] = (gamma_n)_{s s'} delta_{c c'}."""
    g = gamma_basis()                         # [16, 4, 4]
    eye3 = np.eye(3)
    return np.einsum("nab,cd->nacbd", g, eye3).reshape(N_GAMMA, 12, 12)


def _unit_generators_np(dims):
    """[12, T, Z, Y, X, 4, 3] unit spin-color generators: u_{s*3+c} is 1
    in component (s, c) at EVERY site (createUnphasedGammaUnitVectors,
    lib/LEGACY/utility_kernels.cu.LEGACY:8-40)."""
    X, Y, Z, T = dims
    u = np.zeros((12, T, Z, Y, X, 4, 3), dtype=np.complex128)
    for s in range(4):
        for c in range(3):
            u[s * 3 + c, ..., s, c] = 1.0
    return u


def _phase_np(geom: LatticeGeometry, mom, ft_sign: int):
    """[T, Z, Y, X] plane-wave phase exp(i*sign*2pi p.x/L) (spatial)."""
    X, Y, Z, T = geom.dims
    x = np.arange(X)[None, None, None, :]
    y = np.arange(Y)[None, None, :, None]
    z = np.arange(Z)[None, :, None, None]
    ph = 2 * np.pi * (mom[0] * x / X + mom[1] * y / Y + mom[2] * z / Z)
    return np.broadcast_to(np.exp(1j * ft_sign * ph), (T, Z, Y, X))


def coarse_loop_ulocal(env, evecs_coarse, weights, geom: LatticeGeometry,
                       momenta, ft_sign: int = -1) -> np.ndarray:
    """Assemble the ultra-local loop in coarse space.

    env: MGEnv (validation stack); evecs_coarse [nEv, *coarse_field];
    weights [nEv] real (1/lambda for the legacy normalization, 1/sigma
    for the live pipeline's).  Returns complex [P, 16, T] — the
    ultra-local slot of the loop data, gamma-inside-time-inside-momentum
    like the legacy host buffer (loop_coarse.cu.LEGACY:150-160).
    """
    dims = geom.dims
    X, Y, Z, T = dims
    n_ev = evecs_coarse.shape[0]
    units = _unit_generators_np(dims)
    dtype = evecs_coarse.dtype

    def cdot(a, b):
        """<a, b> = sum conj(a) b over all components."""
        return jnp.sum(jnp.conj(a) * b)

    # A[m, i] = <u_m, R(unit_i)>  (unphased, computed once)
    A = np.zeros((n_ev, 12), dtype=np.complex128)
    r_units = [env.restrict(jnp.asarray(units[i], dtype)) for i in range(12)]
    for m in range(n_ev):
        for i in range(12):
            A[m, i] = complex(cdot(evecs_coarse[m], r_units[i]))

    gco = _gcoeff_np()                        # [16, 12, 12]
    w = np.asarray(weights, dtype=np.float64)
    out = np.zeros((len(momenta), N_GAMMA, T), dtype=np.complex128)
    for ip, mom in enumerate(momenta):
        ph = _phase_np(geom, mom, ft_sign)
        for t in range(T):
            # time-diluted phased generators, restricted
            B = np.zeros((12, n_ev), dtype=np.complex128)
            for j in range(12):
                gen = np.zeros_like(units[j])
                gen[t] = units[j][t] * ph[t][..., None, None]
                vj = env.restrict(jnp.asarray(gen, dtype))
                for m in range(n_ev):
                    B[j, m] = complex(cdot(vj, evecs_coarse[m]))
            # L_n = sum_m w_m sum_ij gco[n,i,j] A[m,i] B[j,m]
            M = np.einsum("mi,jm,m->ij", A, B, w)
            out[ip, :, t] = np.einsum("nij,ij->n", gco, M)
    return out
