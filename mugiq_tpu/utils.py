"""Logging, timing and memory diagnostics.

Replaces the reference's printfQuda / TimeProfile / printMemoryInfo triad
(/root/reference/lib/util_mugiq.cpp:6-40, lib/interface_mugiq.cpp:36-47).
"""

import contextlib
import logging
import os
import time
from collections import defaultdict

logger = logging.getLogger("mugiq_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[mugiq_tpu] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("MUGIQ_LOG_LEVEL", "INFO"))


def log(msg: str):
    logger.info(msg)


#: accumulated per-phase wall-clock, like QUDA's TimeProfile regions
PHASE_TIMES = defaultdict(float)
PHASE_COUNTS = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        PHASE_TIMES[name] += dt
        PHASE_COUNTS[name] += 1
        logger.debug(f"phase {name}: {dt:.3f}s")


def print_profile():
    """profile.Print() analog."""
    for name, t in sorted(PHASE_TIMES.items()):
        log(f"PROFILE {name:>20s}: {t:9.3f}s over {PHASE_COUNTS[name]} calls")


def reset_profile():
    PHASE_TIMES.clear()
    PHASE_COUNTS.clear()


def print_memory_info():
    """printCPUMemInfo/printGPUMemInfo analog (util_mugiq.cpp:6-40)."""
    try:
        import psutil  # pragma: no cover - optional
        vm = psutil.virtual_memory()
        log(f"CPU mem: used {vm.used/2**30:.2f} GiB / {vm.total/2**30:.2f} GiB")
    except ImportError:
        try:
            with open("/proc/meminfo") as f:
                info = dict(line.split(":")[:2] for line in f
                            if ":" in line)  # type: ignore[misc]
            tot = info.get("MemTotal", "?").strip()
            avail = info.get("MemAvailable", "?").strip()
            log(f"CPU mem: available {avail} / total {tot}")
        except OSError:
            pass
    try:
        import jax
        for d in jax.devices():
            stats = getattr(d, "memory_stats", lambda: None)()
            if stats:
                used = stats.get("bytes_in_use", 0)
                limit = stats.get("bytes_limit", 0)
                log(f"device {d}: {used/2**30:.2f} GiB / {limit/2**30:.2f} GiB")
    except Exception:  # pragma: no cover - diagnostics only
        pass
