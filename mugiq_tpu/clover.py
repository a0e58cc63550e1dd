"""Clover (Sheikholeslami-Wohlert) term.

The reference supports QUDA's Wilson-clover operator
(makeChecks restricts to Wilson / clover-Wilson, lib/eigsolve_mugiq.cpp:214-215).
QUDA builds the clover field from the gauge field; here the same construction
is done in XLA:

    F_mu_nu(x) = (1/8i) (Q_mu_nu(x) - Q_mu_nu(x)^dag)

with Q_mu_nu the sum of the four "clover leaf" plaquettes around x, and the
site-diagonal clover operator

    A(x) = 1 + (c_sw * kappa / 2) * sum_{mu<nu} sigma_mu_nu (x) F_mu_nu(x) * 2

(the factor 2 from summing mu<nu only of the antisymmetric pair), i.e.
A = 1 + c_sw*kappa/2 * sigma_.F with sigma.F = sum_{mu,nu} (1/2) sigma F.
A is Hermitian and commutes with g5-hermiticity of the full operator.
Free field: F = 0 -> A = 1 (Wilson limit), validated in tests.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .gamma import sigma_munu
from .fields import shift


def _leaf(U, mu, nu):
    """Sum of the four clover-leaf loops in the (mu, nu) plane at each site.

    Q_mu_nu(x) = P(mu,nu) + P(nu,-mu) + P(-mu,-nu) + P(-nu,mu), each leaf a
    product of 4 links starting and ending at x, shape [T,Z,Y,X,3,3].
    """
    u_mu, u_nu = U[mu], U[nu]

    def mm(a, b):
        return jnp.einsum("...ab,...bc->...ac", a, b)

    def dag(a):
        return jnp.conj(jnp.swapaxes(a, -1, -2))

    # P1 = U_mu(x) U_nu(x+mu) U_mu^d(x+nu) U_nu^d(x)
    p1 = mm(mm(u_mu, shift(u_nu, mu, +1)), mm(dag(shift(u_mu, nu, +1)), dag(u_nu)))
    # P2 = U_nu(x) U_mu^d(x+nu-mu) U_nu^d(x-mu) U_mu(x-mu)
    p2 = mm(mm(u_nu, dag(shift(shift(u_mu, nu, +1), mu, -1))),
            mm(dag(shift(u_nu, mu, -1)), shift(u_mu, mu, -1)))
    # P3 = U_mu^d(x-mu) U_nu^d(x-mu-nu) U_mu(x-mu-nu) U_nu(x-nu)
    p3 = mm(mm(dag(shift(u_mu, mu, -1)), dag(shift(shift(u_nu, mu, -1), nu, -1))),
            mm(shift(shift(u_mu, mu, -1), nu, -1), shift(u_nu, nu, -1)))
    # P4 = U_nu^d(x-nu) U_mu(x-nu) U_nu(x+mu-nu) U_mu^d(x)
    p4 = mm(mm(dag(shift(u_nu, nu, -1)), shift(u_mu, nu, -1)),
            mm(shift(shift(u_nu, mu, +1), nu, -1), dag(u_mu)))
    return p1 + p2 + p3 + p4


def field_strength(U):
    """Clover-leaf field strength F[mu, nu, T,Z,Y,X, 3, 3] (Hermitian in color).

    F_mu_nu = (Q - Q^dag) / (8 i); antisymmetric under mu <-> nu.
    """
    planes = {}
    for mu in range(4):
        for nu in range(mu + 1, 4):
            q = _leaf(U, mu, nu)
            f = (q - jnp.conj(jnp.swapaxes(q, -1, -2))) / 8.0j
            planes[(mu, nu)] = f
    shape = planes[(0, 1)].shape
    F = jnp.zeros((4, 4) + shape, dtype=U.dtype)
    for (mu, nu), f in planes.items():
        F = F.at[mu, nu].set(f)
        F = F.at[nu, mu].set(-f)
    return F


@lru_cache(maxsize=None)
def _sigma_np():
    return sigma_munu()


def clover_field(U, kappa: float, csw: float) -> jnp.ndarray:
    """The site-diagonal clover matrix A[T,Z,Y,X, 4s, 3c, 4s, 3c] (as s,c pairs).

    A = 1 + (csw * kappa / 2) * sum_{mu,nu} (1/2) sigma_mu_nu F_mu_nu
      = 1 + (csw * kappa / 2) * sum_{mu<nu} sigma_mu_nu F_mu_nu.
    """
    F = field_strength(U)
    sig = jnp.asarray(_sigma_np(), dtype=U.dtype)
    # sum over mu<nu of sigma (spin) x F (color)
    sf = jnp.einsum("mnsu,mntzyxab->tzyxsaub", sig, F) * 0.5
    shape = sf.shape[:4]
    eye = jnp.einsum("su,ab->saub", jnp.eye(4, dtype=U.dtype), jnp.eye(3, dtype=U.dtype))
    return jnp.broadcast_to(eye, shape + (4, 3, 4, 3)).astype(U.dtype) \
        + (csw * kappa * 0.5) * sf


def apply_clover(A, psi):
    """psi'(x) = A(x) psi(x), spin-color dense per-site 12x12 application."""
    return jnp.einsum("tzyxsaub,tzyxub->tzyxsa", A, psi)


def clover_inverse(A):
    """Site-wise inverse of A (12x12 per site), for even-odd preconditioning."""
    shape = A.shape[:4]
    mat = A.reshape(shape + (12, 12))
    inv = jnp.linalg.inv(mat)
    return inv.reshape(shape + (4, 3, 4, 3))
