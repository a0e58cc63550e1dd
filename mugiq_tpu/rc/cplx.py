"""Real-pair complex arithmetic ("rc" representation).

This TPU backend (and Pallas in general) has NO complex dtype support —
c64 ops fail UNIMPLEMENTED.  The production compute path therefore carries
complex fields as real arrays with a trailing (re, im) axis of size 2:

    complex array z[...]  <->  rc array x[..., 2],  x[..., 0]=Re, x[..., 1]=Im

All hot kernels (dslash, contraction, momentum projection, Krylov algebra)
have rc implementations built on these primitives.  A complex ``einsum``
becomes 4 real einsums (or 3 with Karatsuba — not used: the extra adds cost
more than the saved multiply on bandwidth-bound ops), which XLA maps to the
MXU exactly as it would the decomposed complex op on GPUs.

The complex-dtype implementations remain the validation path (CPU, fp64);
``to_rc``/``from_rc`` convert at the boundary and every rc kernel is tested
against its complex twin.
"""

import jax
import jax.numpy as jnp

#: HIGHEST matmul precision for all complex einsums: the TPU MXU default
#: truncates f32 inputs to bf16 per pass — einsums with vector/matrix
#: outputs (small contractions) inherit ~bf16-eps relative noise, which
#: floored the eigensolve at 3e-3 (see planar/lanczos._PREC).  The extra
#: MXU passes are free on the bandwidth-bound paths that use ceinsum.
_PREC = jax.lax.Precision.HIGHEST


def to_rc(z: jnp.ndarray) -> jnp.ndarray:
    """complex[...] -> float[..., 2]."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


def from_rc(x: jnp.ndarray) -> jnp.ndarray:
    """float[..., 2] -> complex[...]."""
    import jax.lax
    return jax.lax.complex(x[..., 0], x[..., 1])


def conj_rc(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.asarray([1.0, -1.0], dtype=x.dtype)


def cmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise complex multiply of rc arrays (broadcasting)."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def ceinsum(spec: str, a: jnp.ndarray, b: jnp.ndarray,
            conj_a: bool = False) -> jnp.ndarray:
    """Complex einsum on rc arrays: spec is the *complex* spec (no rc axis).

    conj_a applies complex conjugation to `a` (free — just sign flips).
    4 real einsums; on TPU these are MXU work when the spec is a
    contraction.
    """
    ar, ai = a[..., 0], a[..., 1]
    if conj_a:
        ai = -ai
    br, bi = b[..., 0], b[..., 1]
    rr = jnp.einsum(spec, ar, br, precision=_PREC)
    ii = jnp.einsum(spec, ai, bi, precision=_PREC)
    ri = jnp.einsum(spec, ar, bi, precision=_PREC)
    ir = jnp.einsum(spec, ai, br, precision=_PREC)
    return jnp.stack([rr - ii, ri + ir], axis=-1)


def cvdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """<a, b> = sum conj(a)*b over all complex elements -> rc scalar [2]."""
    ar = a[..., 0].reshape(-1)
    ai = a[..., 1].reshape(-1)
    br = b[..., 0].reshape(-1)
    bi = b[..., 1].reshape(-1)
    re = jnp.dot(ar, br) + jnp.dot(ai, bi)
    im = jnp.dot(ar, bi) - jnp.dot(ai, br)
    return jnp.stack([re, im])


def cnorm2(a: jnp.ndarray) -> jnp.ndarray:
    """||a||^2 (real scalar)."""
    f = a.reshape(-1)
    return jnp.dot(f, f)


def cscale(alpha_rc: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(complex scalar alpha) * x for rc arrays; alpha_rc shape [2]."""
    ar, ai = alpha_rc[0], alpha_rc[1]
    xr, xi = x[..., 0], x[..., 1]
    return jnp.stack([ar * xr - ai * xi, ar * xi + ai * xr], axis=-1)
