"""Kernel autotune + persistent tune cache (QUDA saveTuneCache analog)."""

import json

import numpy as np
import jax.numpy as jnp

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.planar.convert import spinor_to_planar, gauge_to_planar
import mugiq_tpu.pallas.dslash_kernel as dk
import mugiq_tpu.pallas.autotune as at
from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel

GEOM = LatticeGeometry((8, 4, 4, 8))
Y = 4


def test_tune_variants_cpu_returns_first_and_caches_nothing(tmp_path,
                                                            monkeypatch):
    monkeypatch.setattr(at, "_TUNE_PATH", str(tmp_path / "tune.json"))
    monkeypatch.setattr(at, "_cache", None)
    psi = jnp.zeros((4, 24, 2, 8), jnp.float32)
    name = at.tune_variants("op", {"a": lambda p: p, "b": lambda p: p}, psi)
    assert name == "a"          # CPU backend: untimed first variant


def test_tune_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(at, "_TUNE_PATH", str(tmp_path / "tune.json"))
    monkeypatch.setattr(at, "_cache", None)
    cache = at._load()
    key = at._key("wilson_m", (8, 24, 4, 32), "float32")
    cache[key] = {"variant": "win2", "us": {"base": 10.0, "win2": 8.0}}
    at.save_tune_cache()
    monkeypatch.setattr(at, "_cache", None)
    psi = jnp.zeros((8, 24, 4, 32), jnp.float32)
    name = at.tune_variants("wilson_m", {"base": lambda p: p,
                                         "win2": lambda p: p}, psi)
    assert name == "win2"       # cached winner wins without re-timing
    with open(tmp_path / "tune.json") as f:
        assert json.load(f)[key]["variant"] == "win2"


def test_tuned_operator_matches_untuned(tmp_path, monkeypatch):
    monkeypatch.setattr(at, "_TUNE_PATH", str(tmp_path / "tune.json"))
    monkeypatch.setattr(at, "_cache", None)
    U = fields.random_gauge(GEOM, seed=1, dtype=jnp.complex64)
    psi = fields.random_spinor(GEOM, seed=0, dtype=jnp.complex64)
    psi_k = dk.to_kernel_spinor(spinor_to_planar(psi))
    U_k = dk.to_kernel_gauge(gauge_to_planar(U))
    ref_op = WilsonDiracKernel(U_k=U_k, kappa=0.12, Y=Y)
    ref = np.asarray(ref_op.M(psi_k))
    tuned = WilsonDiracKernel(U_k=U_k, kappa=0.12, Y=Y).tune(psi_k)
    assert tuned._m_fn is not None
    np.testing.assert_allclose(np.asarray(tuned.M(psi_k)), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tuned.Mdag(psi_k)),
                               np.asarray(ref_op.Mdag(psi_k)), atol=1e-5)
