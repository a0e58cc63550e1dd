"""Process-resident production service: amortize trace/compile across calls.

The 32^3x64 one-shot production call spends ~40 s on trace + compile-cache
loading against ~5 s of actual restarts (artifacts/time_production32.json).
The reference amortizes the analogous cost with a long-lived process and a
persistent tune cache (/root/reference/lib/interface_mugiq.cpp:72-247).
This module is the TPU answer:

* :class:`ProductionSession` — an in-process context holding the
  eigensolver executable caches (keyed by operator configuration) plus the
  module-level measurement jits, so every production call after the first
  with a given configuration runs at warm-restart speed;
* :func:`serve` — a file-queue server loop for `mugiq-loop --serve DIR`:
  drop `<name>.json` request files (CLI-flag-style keys) into DIR, the
  resident process executes them and writes `<name>.result.json`.
"""

import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .params import (DslashType, EigOperator, EigParam, GaugeParam,
                     InvertParam, LoopParam, MGParam, Spectrum)
from .utils import log


@dataclass
class ProductionSession:
    """Reusable flagship-production context.

    Example::

        sess = ProductionSession()
        res1 = sess.compute_loop(U1, gp, ip, ep, lp)   # compiles
        res2 = sess.compute_loop(U2, gp, ip, ep, lp)   # warm: same shapes
    """
    _caches: dict = field(default_factory=dict)

    def _cache_for(self, gauge, inv, eig, precision, basis_precision,
                   even_odd, mesh):
        # The cached Lanczos cycle / Rayleigh executables bake EVERYTHING
        # about the traced matvec in as closure/static constants — kappa,
        # csw, mass normalization, boundary phases, anisotropy, and the
        # Chebyshev window — so the key must cover the full operator
        # identity, not just shapes.  A request differing only in kappa
        # must NOT reuse the previous operator's executables.
        key = (tuple(gauge.dims), gauge.antiperiodic_t, gauge.anisotropy,
               inv.dslash_type, inv.kappa, inv.mass, inv.csw,
               inv.anisotropy, inv.mass_normalization,
               eig.n_kr, eig.n_ev, eig.operator, eig.spectrum,
               eig.use_poly_acc, eig.poly_deg, eig.a_min, eig.a_max,
               eig.block_size,
               precision, basis_precision, even_odd,
               None if mesh is None else tuple(mesh.shape.items()))
        return self._caches.setdefault(key, {})

    def compute_loop(self, U_np, gauge, inv, eig, loop_param, **kw):
        from .production import compute_loop_production

        cache = self._cache_for(gauge, inv, eig, kw.get("precision", "f32"),
                                kw.get("basis_precision", "f32"), False,
                                kw.get("mesh"))
        return compute_loop_production(U_np, gauge, inv, eig, loop_param,
                                       compile_cache=cache, **kw)

    def compute_evecs(self, U_np, gauge, inv, eig, **kw):
        from .production import compute_evecs_production

        cache = self._cache_for(gauge, inv, eig, kw.get("precision", "f32"),
                                kw.get("basis_precision", "f32"),
                                kw.get("even_odd", False), kw.get("mesh"))
        return compute_evecs_production(U_np, gauge, inv, eig,
                                        compile_cache=cache, **kw)


def _params_from_request(req: dict):
    """CLI-flag-style JSON keys -> param dataclasses (mirrors cli/loop.py)."""
    gauge = GaugeParam(dims=tuple(req["dims"]))
    inv = InvertParam(
        dslash_type=(DslashType.CLOVER_WILSON if req.get("clover")
                     else DslashType.WILSON),
        kappa=float(req.get("kappa", 0.12)),
        csw=float(req.get("csw", 1.0)))
    eig = EigParam(
        n_ev=int(req.get("eig_nev", 8)), n_kr=int(req.get("eig_nkr", 24)),
        tol=float(req.get("eig_tol", 1e-6)),
        max_restarts=int(req.get("eig_max_restarts", 100)),
        operator=EigOperator[req.get("eig_operator", "MdagM")],
        spectrum=Spectrum[req.get("eig_spectrum", "SR")],
        use_poly_acc=bool(req.get("eig_use_poly_acc", False)),
        poly_deg=int(req.get("eig_poly_deg", 16)),
        a_min=float(req.get("eig_amin", 0.0)),
        a_max=float(req.get("eig_amax", 0.0)),
        check_interval=int(req.get("eig_check_interval", 1)))
    lp = LoopParam(
        momenta=[tuple(m) for m in req.get("momenta", [(0, 0, 0)])],
        do_mom_proj=bool(req.get("do_momproj", True)),
        do_nonlocal=bool(req.get("do_nonlocal", False)),
        disp_entries=list(req.get("disp_entries", [])),
        write_mom_space_hdf5=bool(req.get("write_mom_space", False)),
        fname_mom_h5=req.get("mom_space_filename", ""),
        write_pos_space_hdf5=bool(req.get("write_pos_space", False)),
        fname_pos_h5=req.get("pos_space_filename", ""))
    return gauge, inv, eig, lp


def _load_gauge(req: dict, gauge: GaugeParam):
    from .lattice import LatticeGeometry
    from .io.gauge_io import load_gauge_np

    geom = LatticeGeometry(gauge.dims)
    return load_gauge_np(req.get("gauge", "random"), geom,
                         seed=int(req.get("seed", 1)))


def serve(watch_dir: str, poll_s: float = 0.5,
          max_requests: Optional[int] = None,
          session: Optional[ProductionSession] = None) -> int:
    """File-queue server loop.  Returns the number of requests served.

    Request: ``<name>.json`` in `watch_dir` (keys per _params_from_request,
    plus "gauge": path | unit | weak:eps | random:seed).  Response:
    ``<name>.result.json`` with evals/resids/timing.  A file named ``STOP``
    ends the loop (and max_requests bounds it for tests).
    """
    session = session or ProductionSession()
    served = 0
    log(f"production server watching {watch_dir}")
    while max_requests is None or served < max_requests:
        if os.path.exists(os.path.join(watch_dir, "STOP")):
            break
        reqs = sorted(f for f in os.listdir(watch_dir)
                      if f.endswith(".json") and ".result." not in f
                      and not os.path.exists(
                          os.path.join(watch_dir, f[:-5] + ".result.json")))
        if not reqs:
            time.sleep(poll_s)
            continue
        name = reqs[0][:-5]
        path = os.path.join(watch_dir, reqs[0])
        with open(path) as f:
            req = json.load(f)
        t0 = time.perf_counter()
        try:
            gauge, inv, eig, lp = _params_from_request(req)
            U = _load_gauge(req, gauge)
            res = session.compute_loop(
                U, gauge, inv, eig, lp,
                precision=req.get("link_precision", "f32"),
                basis_precision=req.get("basis_precision", "f32"))
            out = {"ok": True,
                   "wallclock_s": round(time.perf_counter() - t0, 2),
                   "evals": [float(v) for v in res.evals],
                   "resids": [float(v) for v in res.resids],
                   "converged": bool(res.converged),
                   "n_restarts": int(res.n_restarts)}
        except Exception as e:                       # report, keep serving
            out = {"ok": False, "error": f"{type(e).__name__}: {e}",
                   "wallclock_s": round(time.perf_counter() - t0, 2)}
        with open(os.path.join(watch_dir, name + ".result.json"), "w") as f:
            json.dump(out, f, indent=1)
        served += 1
        log(f"served {name}: ok={out['ok']} {out['wallclock_s']} s")
    return served
