"""Runtime kernel autotune + persistent tune cache.

The reference delegates kernel launch tuning to QUDA's autotuner and calls
``saveTuneCache()`` after every interface call
(/root/reference/lib/interface_mugiq.cpp:72,117,155,247); its LEGACY path
shows the intended per-kernel TunableVectorY sweep
(/root/reference/lib/LEGACY/loop_coarse_ulocal.cu.LEGACY:151-240).  The TPU
analog: measure the competing pallas dslash variants for THIS lattice size
on the live backend once, persist the winner keyed by
(backend, dims, dtype, op), and reuse it across processes.

Variants (see dslash_kernel.py / dslash_win_kernel.py):
  base   — BlockSpec-pipelined, one t-slice per grid step.  At local
           volumes whose chained working set stays VMEM-resident this is
           the fastest (measured 2000+ GFLOP/s at 16^3x32 f32).
  win:bt — t-windowed modular-DMA kernel, (bt+2)/bt psi traffic; wins when
           the working set spills to HBM (large local volumes) and for
           bf16 inputs.

Timing uses device-side fori chains (one dispatch + one data-dependent
readback per measurement; chain-length differencing cancels the tunnelled
backend's RTT — see bench.py).
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import log

_TUNE_PATH = os.environ.get(
    "MUGIQ_TUNE_CACHE",
    os.path.expanduser("~/.cache/mugiq_tpu_tune.json"))
_cache = None


def _load():
    global _cache
    if _cache is None:
        try:
            with open(_TUNE_PATH) as f:
                _cache = json.load(f)
        except (OSError, ValueError):
            _cache = {}
    return _cache


def save_tune_cache():
    """Persist the in-process tune results (reference: saveTuneCache())."""
    if _cache is None:
        return
    try:
        os.makedirs(os.path.dirname(_TUNE_PATH), exist_ok=True)
        with open(_TUNE_PATH, "w") as f:
            json.dump(_cache, f, indent=1, sort_keys=True)
    except OSError as e:       # read-only FS etc.: tuning still works
        log(f"tune cache not saved: {e}")


def _key(op_name, shape, dtype):
    backend = jax.default_backend()
    return f"{backend}|{op_name}|{'x'.join(map(str, shape))}|{dtype}"


def _time_chain(f, psi, *args, n1=4, n2=24, reps=3):
    """Chain-differenced timing of psi -> f(psi, *args).

    ``args`` (field operands like the gauge) are passed as traced jit
    arguments — a closure capture would embed them as HLO CONSTANTS, which
    at large volumes (e.g. 604 MB of links at 32^3x64) overflows the
    tunnelled backend's compile-request size limit."""
    s = jax.jit(lambda a: jnp.sum(a * a))

    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        return jax.lax.fori_loop(0, n, lambda i, x: f(x, *a) * 0.12, p)

    float(s(chain(psi, n1, *args)))
    float(s(chain(psi, n2, *args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(s(chain(psi, n1, *args)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(s(chain(psi, n2, *args)))
        t2 = time.perf_counter() - t0
        if t2 > t1:
            best = min(best, (t2 - t1) / (n2 - n1))
    return best


def tune_variants(op_name, variants, psi, *args, force=False):
    """Pick the fastest of ``variants`` ({name: (psi, *args)->psi}) for
    this shape.  ``args`` are forwarded to every variant as traced jit
    operands (NOT closure constants — see _time_chain).

    Returns the winning name.  Results persist in the tune cache; pass
    force=True to re-measure.  On the CPU backend (interpret-mode pallas)
    tuning is meaningless — the first variant is returned untimed.
    """
    cache = _load()
    key = _key(op_name, psi.shape, str(psi.dtype))
    if not force and key in cache:
        return cache[key]["variant"]
    first = next(iter(variants))
    if jax.default_backend() == "cpu":
        return first
    results = {}
    for name, f in variants.items():
        try:
            results[name] = _time_chain(f, psi, *args)
        except Exception as e:    # VMEM overflow etc.: variant infeasible
            log(f"tune {op_name}/{name}: failed ({type(e).__name__})")
    if not results:
        return first
    win = min(results, key=results.get)
    cache[key] = {"variant": win,
                  "us": {k: round(v * 1e6, 2) for k, v in results.items()}}
    save_tune_cache()
    log(f"tune {op_name} {key}: {cache[key]['us']} -> {win}")
    return win


def tune_wilson_m(U_k, Ut_k, A144, Y, kappa, has_clover, psi,
                  dagger=False, force=False):
    """Autotune the fused M(dag) kernel; returns (variant_name, callable).

    The timed variants take the field operands as jit arguments; the
    returned callable closes over them for convenience (single dispatch of
    an already-compiled executable embeds no constants)."""
    from .dslash_kernel import (wilson_m_pallas, wilson_m_pallas_gl,
                                wilson_m_pallas_glt, wilson_m_pallas_yb)
    from .dslash_win_kernel import wilson_m_pallas_win

    T = psi.shape[0]
    YX = psi.shape[-1]
    X = YX // Y
    variants = {}
    # full-width [Z, YX] kernels: compile-size wall above ~256 lanes
    # (measured: YX=256 compiles, 512 does not) — skip them at width
    if YX <= 256:
        variants["base"] = lambda p, U, Ut, A: wilson_m_pallas(
            p, U, Ut, A, Y=Y, kappa=kappa, dagger=dagger,
            has_clover=has_clover)
        # project-then-shift body: ~2.7x fewer shifted tiles (candidate
        # on the VMEM-resident regime where the VPU body matters)
        variants["psb"] = lambda p, U, Ut, A: wilson_m_pallas(
            p, U, Ut, A, Y=Y, kappa=kappa, dagger=dagger,
            has_clover=has_clover, ps=True)
        for bt in (2, 4):
            if T % bt == 0:
                variants[f"win{bt}"] = lambda p, U, Ut, A, b=bt: (
                    wilson_m_pallas_win(p, U, Ut, A, Y=Y, kappa=kappa, bt=b,
                                        dagger=dagger,
                                        has_clover=has_clover))
    # grouped-lane kernels: whole t-slice per grid step at any volume
    # (lane axis regrouped to by*X; at 32^3x64 the f32 variant runs at the
    # streaming-traffic roofline — 687 GFLOP/s vs yb4's 267)
    gl_feasible = [b for b in (4, 8, 16)
                   if Y % b == 0 and b < Y and 128 <= b * X <= 512]
    for by in gl_feasible:
        variants[f"gl{by}"] = lambda p, U, Ut, A, b=by: (
            wilson_m_pallas_gl(p, U, Ut, A, Y=Y, kappa=kappa, by=b,
                               dagger=dagger, has_clover=has_clover))
        variants[f"psgl{by}"] = lambda p, U, Ut, A, b=by: (
            wilson_m_pallas_gl(p, U, Ut, A, Y=Y, kappa=kappa, by=b,
                               dagger=dagger, has_clover=has_clover,
                               ps=True))
    if gl_feasible:
        # t-blocked gl and manual-DMA t-window variants: both measured
        # SLOWER than plain gl at 32^3x64 (BlockSpec pipelining degrades
        # with bt-sized blocks; bench_glt32{,b}.json) — swept only at the
        # default lane grouping to bound tune cost (each 32^3 compile is
        # minutes on the tunnelled backend).  VMEM-infeasible combos fail
        # to compile; tune catches that.
        by0 = min(gl_feasible, key=lambda b: abs(b * X - 256))
        for bt in (2, 4):
            if T % bt == 0 and T > bt:
                variants[f"glt{by0}.{bt}"] = (
                    lambda p, U, Ut, A, b=by0, t=bt: wilson_m_pallas_glt(
                        p, U, Ut, A, Y=Y, kappa=kappa, by=b, bt=t,
                        dagger=dagger, has_clover=has_clover))
                variants[f"wing{by0}.{bt}"] = (
                    lambda p, U, Ut, A, b=by0, t=bt: wilson_m_pallas_win(
                        p, U, Ut, A, Y=Y, kappa=kappa, bt=t, gl_by=b,
                        dagger=dagger, has_clover=has_clover))
    # y-blocked kernels: fallback when no gl grouping fits
    for by in (2, 4, 8):
        if Y % by == 0 and by < Y and (by + 2) * X <= 512:
            variants[f"yb{by}"] = lambda p, U, Ut, A, b=by: (
                wilson_m_pallas_yb(p, U, Ut, A, Y=Y, kappa=kappa, by=b,
                                   dagger=dagger, has_clover=has_clover))
    if not variants:
        variants["base"] = lambda p, U, Ut, A: wilson_m_pallas(
            p, U, Ut, A, Y=Y, kappa=kappa, dagger=dagger,
            has_clover=has_clover)
    name = tune_variants("wilson_m_dag" if dagger else "wilson_m",
                         variants, psi, U_k, Ut_k, A144, force=force)
    win = variants[name]
    return name, lambda p: win(p, U_k, Ut_k, A144)
