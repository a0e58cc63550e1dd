"""Process-resident production session/server: executable caches persist
across calls (the one-shot-overhead amortization; reference analog is the
long-lived process + tune cache, interface_mugiq.cpp:72-247)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from mugiq_tpu import fields
from mugiq_tpu.lattice import LatticeGeometry
from mugiq_tpu.params import (DslashType, EigOperator, EigParam, GaugeParam,
                              InvertParam, LoopParam)
from mugiq_tpu.server import ProductionSession, serve

GEOM = LatticeGeometry((4, 4, 4, 8))


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import mugiq_tpu.pallas.dslash_kernel as dkm
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(dkm.pl, "pallas_call", interp)


def _params():
    gp = GaugeParam(dims=GEOM.dims)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
    ep = EigParam(n_ev=4, n_kr=12, tol=1e-30, max_restarts=2,
                  operator=EigOperator.MdagM, check_interval=100)
    lp = LoopParam(momenta=[(0, 0, 0)], do_mom_proj=True)
    return gp, ip, ep, lp


def test_session_reuses_executables():
    gp, ip, ep, lp = _params()
    U1 = np.asarray(fields.weak_gauge(GEOM, eps=0.3, seed=1,
                                      dtype=jnp.complex64))
    U2 = np.asarray(fields.weak_gauge(GEOM, eps=0.3, seed=2,
                                      dtype=jnp.complex64))
    sess = ProductionSession()
    r1 = sess.compute_loop(U1, gp, ip, ep, lp)
    assert len(sess._caches) == 1
    cache = next(iter(sess._caches.values()))
    cyc = cache["cycle"]
    ray = cache["rayleigh"]
    r2 = sess.compute_loop(U2, gp, ip, ep, lp)      # same config, new gauge
    assert cache["cycle"] is cyc                    # no re-trace
    assert cache["rayleigh"] is ray
    assert np.all(np.isfinite(r1.data_mom)) and np.all(np.isfinite(r2.data_mom))
    # different gauges must give different spectra (operands flow as args)
    assert not np.allclose(r1.evals, r2.evals)


def test_serve_file_queue(tmp_path):
    req = {"dims": list(GEOM.dims), "gauge": "weak:0.3", "kappa": 0.12,
           "eig_nev": 4, "eig_nkr": 12, "eig_tol": 1e-30,
           "eig_max_restarts": 2, "eig_check_interval": 100,
           "momenta": [[0, 0, 0]]}
    with open(tmp_path / "job1.json", "w") as f:
        json.dump(req, f)
    n = serve(str(tmp_path), poll_s=0.05, max_requests=1)
    assert n == 1
    with open(tmp_path / "job1.result.json") as f:
        out = json.load(f)
    assert out["ok"], out
    assert len(out["evals"]) == 4 and np.all(np.isfinite(out["evals"]))
