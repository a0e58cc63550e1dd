"""Precision configuration.

The reference library runs in float/double (template ``Float`` in
``/root/reference/lib/interface_mugiq.cpp:250-253``).  On TPU the MXU is
fp32/bf16, so the production path uses complex64; complex128 is available for
validation when ``jax_enable_x64`` is on (tests run this way on CPU).
"""

import jax
import jax.numpy as jnp


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_real_dtype():
    """float64 when x64 is enabled (validation), else float32 (TPU production)."""
    return jnp.float64 if x64_enabled() else jnp.float32


def default_complex_dtype():
    return jnp.complex128 if x64_enabled() else jnp.complex64


def complex_dtype_for(real_dtype) -> jnp.dtype:
    real_dtype = jnp.dtype(real_dtype)
    if real_dtype == jnp.float64:
        return jnp.dtype(jnp.complex128)
    return jnp.dtype(jnp.complex64)


def real_dtype_for(complex_dtype) -> jnp.dtype:
    complex_dtype = jnp.dtype(complex_dtype)
    if complex_dtype == jnp.complex128:
        return jnp.dtype(jnp.float64)
    return jnp.dtype(jnp.float32)
