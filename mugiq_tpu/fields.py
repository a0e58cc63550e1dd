"""Gauge / spinor field construction and basic observables.

Replaces the QUDA field machinery consumed by the reference
(cudaGaugeField / ColorSpinorField; SURVEY.md §2.3) with plain jax arrays in
the [T,Z,Y,X,...] layout of :mod:`mugiq_tpu.lattice`, and the QUDA test-util
fixtures (``construct_gauge_field`` random/unit gauge, ``plaqQuda``) used by
the reference test drivers (/root/reference/tests/loop.cpp:852-858, 895-898).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .config import default_complex_dtype, real_dtype_for
from .lattice import LatticeGeometry, MU_TO_AXIS


def shift(field: jnp.ndarray, mu: int, sign: int, rank_offset: int = 0) -> jnp.ndarray:
    """field(x + sign*mu_hat) with periodic wrap.

    ``sign=+1`` fetches the forward neighbour.  Boundary phases (antiperiodic
    time) are handled by phasing the gauge links, not here (see
    :func:`apply_boundary_phase`).  Under a sharded mesh, XLA lowers the roll
    across a partitioned axis to a collective-permute over ICI — this is the
    halo exchange of the reference (SURVEY.md §2.4 item 2).
    """
    axis = MU_TO_AXIS[mu] + rank_offset
    return jnp.roll(field, -sign, axis=axis)


# ---------------------------------------------------------------------------
# Gauge construction
# ---------------------------------------------------------------------------

def unit_gauge(geom: LatticeGeometry, dtype=None) -> jnp.ndarray:
    """Free-field (unit) gauge configuration, shape [4, T, Z, Y, X, 3, 3].

    The analytically-checkable fixture (--unit-gauge in the reference tests).
    """
    dtype = dtype or default_complex_dtype()
    eye = jnp.eye(3, dtype=dtype)
    return jnp.broadcast_to(eye, (4, *geom.shape_tzyx, 3, 3)).astype(dtype)


def _project_su3(m: np.ndarray) -> np.ndarray:
    """Project a batch of complex 3x3 matrices onto SU(3) via QR + phase fix."""
    q, r = np.linalg.qr(m)
    # make R's diagonal real-positive so Q is Haar-distributed in U(3)
    d = np.einsum("...ii->...i", r)
    ph = d / np.abs(d)
    q = q * ph[..., None, :].conj()
    # remove overall det phase -> SU(3)
    det = np.linalg.det(q)
    q = q * (det.conj() ** (1.0 / 3.0) / np.abs(det) ** (1.0 / 3.0))[..., None, None]
    return q

def random_gauge(geom: LatticeGeometry, seed: int = 0, dtype=None) -> jnp.ndarray:
    """Haar-random SU(3) gauge field [4, T, Z, Y, X, 3, 3] (host-generated).

    Replaces the reference's random gauge fixture
    (construct_gauge_field with random links, tests/loop.cpp:856).
    """
    dtype = dtype or default_complex_dtype()
    rng = np.random.default_rng(seed)
    shape = (4, *geom.shape_tzyx, 3, 3)
    m = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    u = _project_su3(m)
    return jnp.asarray(u, dtype=dtype)


def weak_gauge(geom: LatticeGeometry, eps: float = 0.1, seed: int = 0, dtype=None) -> jnp.ndarray:
    """SU(3) field close to unity: exp(i eps H) with random Hermitian traceless H."""
    dtype = dtype or default_complex_dtype()
    rng = np.random.default_rng(seed)
    shape = (4, *geom.shape_tzyx, 3, 3)
    a = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    h = 0.5 * (a + np.conj(np.swapaxes(a, -1, -2)))
    tr = np.einsum("...ii->...", h) / 3.0
    h = h - tr[..., None, None] * np.eye(3)
    w, v = np.linalg.eigh(h)
    u = np.einsum("...ab,...b,...cb->...ac", v, np.exp(1j * eps * w), np.conj(v))
    return jnp.asarray(u, dtype=dtype)


def apply_boundary_phase(U: jnp.ndarray, antiperiodic_t: bool = True) -> jnp.ndarray:
    """Fold fermionic boundary phases into the links.

    Multiplies the t-links on the last time slice by -1 when the fermion
    field is antiperiodic in time (QUDA_ANTI_PERIODIC_T, the reference test
    default).  The Dirac operator then uses plain periodic shifts.
    Gauge observables (plaquette) are phase-insensitive.
    """
    if not antiperiodic_t:
        return U
    Lt = U.shape[1]
    t = jnp.arange(Lt)
    phase = jnp.where(t == Lt - 1, -1.0, 1.0).reshape(Lt, 1, 1, 1, 1, 1)
    return U.at[3].multiply(phase.astype(U.dtype))


# ---------------------------------------------------------------------------
# Observables
# ---------------------------------------------------------------------------

def plaquette_np(U) -> tuple:
    """Average plaquette in pure numpy — used where complex device arrays
    are unavailable (the TPU backend; see CLAUDE.md)."""
    u = np.asarray(U)

    def roll(a, mu, sign):
        return np.roll(a, -sign, axis={0: 3, 1: 2, 2: 1, 3: 0}[mu])

    spatial, temporal = [], []
    for mu in range(4):
        for nu in range(mu + 1, 4):
            tr = np.einsum("...ab,...bc,...dc,...ad->...",
                           u[mu], roll(u[nu], mu, +1),
                           np.conj(roll(u[mu], nu, +1)), np.conj(u[nu]))
            p = float(np.mean(tr.real)) / 3.0
            (temporal if nu == 3 else spatial).append(p)
    sp = sum(spatial) / len(spatial)
    tm = sum(temporal) / len(temporal)
    return (sp + tm) / 2.0, sp, tm


def plaquette(U: jnp.ndarray):
    """Average plaquette (total, spatial, temporal), normalised to 1 at U=1.

    Matches plaqQuda's (total, spatial, temporal) triple printed by the
    reference test drivers (tests/loop.cpp:895-898).
    """
    def plaq_munu(mu, nu):
        u_mu = U[mu]
        u_nu = U[nu]
        u_nu_xpmu = shift(u_nu, mu, +1)
        u_mu_xpnu = shift(u_mu, nu, +1)
        tr = jnp.einsum(
            "...ab,...bc,...dc,...ad->...",
            u_mu, u_nu_xpmu, jnp.conj(u_mu_xpnu), jnp.conj(u_nu),
        )
        return jnp.mean(tr.real) / 3.0

    spatial = []
    temporal = []
    for mu in range(4):
        for nu in range(mu + 1, 4):
            p = plaq_munu(mu, nu)
            (temporal if nu == 3 else spatial).append(p)
    sp = sum(spatial) / len(spatial)
    tm = sum(temporal) / len(temporal)
    return (sp + tm) / 2.0, sp, tm


# ---------------------------------------------------------------------------
# Spinor helpers
# ---------------------------------------------------------------------------

def random_spinor(geom: LatticeGeometry, seed: int = 0, dtype=None) -> jnp.ndarray:
    dtype = dtype or default_complex_dtype()
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    shape = (*geom.shape_tzyx, 4, 3)
    rdt = real_dtype_for(dtype)
    re = jax.random.normal(k1, shape, dtype=rdt)
    im = jax.random.normal(k2, shape, dtype=rdt)
    return (re + 1j * im).astype(dtype)


def inner(a: jnp.ndarray, b: jnp.ndarray):
    """<a, b> = sum conj(a) * b (QUDA blas::cDotProduct)."""
    return jnp.vdot(a, b)


def norm2(a: jnp.ndarray):
    """||a||^2 (QUDA blas::norm2)."""
    return jnp.real(jnp.vdot(a, a))
