"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

The reference validates eigenvalues/residuals at double precision
(lib/eigsolve_mugiq.cpp:317-335); tests run the same way on the CPU backend,
with 8 virtual devices so the multi-chip sharding path is exercised without
TPU hardware (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The environment's sitecustomize force-registers the tunnelled TPU backend
# and pins jax_platforms; override it after import — tests must run on the
# CPU backend (8 virtual devices, fp64).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def geom44():
    from mugiq_tpu.lattice import LatticeGeometry
    return LatticeGeometry((4, 4, 4, 4))


@pytest.fixture(scope="session")
def geom_small():
    from mugiq_tpu.lattice import LatticeGeometry
    return LatticeGeometry((4, 4, 2, 8))
