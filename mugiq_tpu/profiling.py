"""Profiling utilities — the TimeProfile / tune-cache analog.

The reference wraps phases in QUDA TimeProfile regions and persists an
autotune cache (saveTuneCache, lib/interface_mugiq.cpp:72,117,155,247).
Equivalents here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-readable trace of device execution;
* :func:`annotate` — named TraceAnnotation regions (visible in the trace);
* the per-phase wall-clock accumulation lives in :mod:`mugiq_tpu.utils`
  (phase_timer / print_profile);
* XLA's persistent compilation cache stands in for the tune cache —
  :func:`enable_compilation_cache` points it at a directory so repeat runs
  skip recompiles (compiles through the TPU tunnel cost minutes).
"""

import contextlib
import os

import jax


def enable_compilation_cache(path: str = None):
    """Persist compiled executables across processes (the tune-cache analog)."""
    path = path or os.environ.get("MUGIQ_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/mugiq_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a region; view with TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation inside a trace."""
    return jax.profiler.TraceAnnotation(name)


def flops_wilson_dslash(volume: int) -> int:
    """Standard Wilson dslash flop count (1320/site)."""
    return 1320 * volume


def bytes_wilson_dslash(volume: int, bytes_per_real: int = 4) -> int:
    """Minimum HBM traffic per application with perfect reuse:
    read psi once (96B at f32-pairs per 24 reals), write out, read 8 links."""
    per_site = (2 * 24 + 8 * 18) * bytes_per_real
    return per_site * volume
