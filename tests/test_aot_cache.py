"""Serialized-executable disk cache: persist a compiled executable, reload
it in a fresh process, identical results; plain-jit fallback when off or
on multi-device sessions (deserialized executables bind to all devices)."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mugiq_tpu.aot_cache as ac

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
import mugiq_tpu.aot_cache as ac
ac._DIR = sys.argv[1]
f = jax.jit(lambda x, y: x @ y + 1.0)
a = jnp.asarray(np.arange(128, dtype=np.float32).reshape(8, 16))
b = jnp.asarray(np.arange(64, dtype=np.float32).reshape(16, 4))
w = ac.AotJit(f, "test-mm")
r = np.asarray(w(a, b))
import glob
n = len(glob.glob(f"{sys.argv[1]}/*.aotexe"))
loaded = any(v is not None for v in w._exes.values())
print(f"RESULT {float(r.sum()):.1f} FILES {n} LOADED {loaded}")
"""


def _run(tmp):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # single CPU device
    out = subprocess.run([sys.executable, "-c", _WORKER, str(tmp)],
                         capture_output=True, text=True, env=env,
                         cwd="/root/repo", timeout=240)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][0]
    parts = line.split()
    return float(parts[1]), int(parts[3]), parts[5] == "True"


def test_aot_cold_process_roundtrip(tmp_path):
    r1, n1, _ = _run(tmp_path)            # compiles + persists
    assert n1 == 1
    r2, n2, loaded = _run(tmp_path)       # FRESH process: loads from disk
    assert n2 == 1 and loaded
    assert r2 == r1


def test_aot_disabled_passthrough(monkeypatch):
    monkeypatch.setattr(ac, "_DIR", None)
    monkeypatch.delenv("MUGIQ_TPU_AOT_CACHE", raising=False)
    f = jax.jit(lambda x: x * 2)
    w = ac.AotJit(f, "t")
    assert float(jnp.sum(w(jnp.ones((4,))))) == 8.0
    assert not w._exes                    # cache off: never engaged


def test_aot_multidevice_passthrough(tmp_path, monkeypatch):
    """On the 8-device virtual mesh the wrapper must NOT engage."""
    monkeypatch.setattr(ac, "_DIR", str(tmp_path))
    if jax.local_device_count() == 1:
        pytest.skip("needs the multi-device test session")
    f = jax.jit(lambda x: x + 1)
    w = ac.AotJit(f, "t")
    assert float(jnp.sum(w(jnp.zeros((4,))))) == 4.0
    assert not list(tmp_path.glob("*.aotexe"))
