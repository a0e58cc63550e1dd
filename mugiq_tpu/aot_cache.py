"""Disk cache of COMPILED executables: kills cold-process trace+compile.

The persistent XLA compilation cache avoids re-compiling, but a cold
process still pays tracing + lowering + cache negotiation per executable
(~40 s of the 32^3x64 production call, time_production32.json).  This
backend round-trips `jax.experimental.serialize_executable` payloads
(probe_aot.json: a real packed-Schur executable reloads in 0.01 s from a
2.3 MB payload vs 4.8 s warm compile), so jitted entry points wrapped in
:class:`AotJit` serialize their executables to disk keyed by (tag, input
avals, backend) and later processes skip straight to execution.

Opt-in: set ``MUGIQ_TPU_AOT_CACHE=<dir>`` (the CLI enables it under
``~/.cache/mugiq_tpu_aot`` alongside the XLA cache) or call
:func:`enable_aot_cache`.  Reference analog: the persistent tune cache +
long-lived process (interface_mugiq.cpp:72-247).
"""

import hashlib
import os
from typing import Optional

import jax

_DIR: Optional[str] = None


def enable_aot_cache(path: Optional[str] = None) -> str:
    """Enable the executable disk cache (default ~/.cache/mugiq_tpu_aot)."""
    global _DIR
    _DIR = path or os.environ.get(
        "MUGIQ_TPU_AOT_CACHE",
        os.path.expanduser("~/.cache/mugiq_tpu_aot"))
    os.makedirs(_DIR, exist_ok=True)
    return _DIR


def aot_cache_dir() -> Optional[str]:
    if _DIR is not None:
        return _DIR
    env = os.environ.get("MUGIQ_TPU_AOT_CACHE")
    if env:
        return enable_aot_cache(env)
    return None


class AotJit:
    """Wrap a jitted function with a disk executable cache.

    Transparent when the cache is disabled.  On first call with the cache
    enabled: try to deserialize a stored executable for (tag, avals,
    backend, jax version); else lower+compile once and persist.  Any
    serialization failure falls back to the plain jit silently (the cache
    is an optimization, never a correctness dependency)."""

    def __init__(self, jitfn, tag: str):
        self._jit = jitfn
        self._tag = tag
        # per-aval-key executables: calls with different shapes each get
        # their own entry instead of poisoning a single pinned executable
        # (a shape change used to raise inside _exe and permanently
        # disable the AOT path for the original shapes too)
        self._exes = {}

    def _key(self, args):
        parts = [self._tag, jax.default_backend(), jax.__version__]
        for a in jax.tree_util.tree_leaves(args):
            parts.append(f"{getattr(a, 'shape', ())}:"
                         f"{getattr(a, 'dtype', type(a).__name__)}")
        return hashlib.sha256("|".join(map(str, parts)).encode()).hexdigest()

    def __call__(self, *args):
        d = aot_cache_dir()
        if d is None or jax.local_device_count() != 1:
            # deserialized executables bind to ALL local devices — on a
            # multi-device session (virtual CPU mesh) stick to plain jit;
            # the production TPU session has one device
            return self._jit(*args)
        key = self._key(args)
        if key not in self._exes:
            import pickle
            from jax.experimental.serialize_executable import (
                serialize, deserialize_and_load)

            path = os.path.join(d, key + ".aotexe")
            try:
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        payload, in_tree, out_tree = pickle.load(f)
                    self._exes[key] = deserialize_and_load(
                        payload, in_tree, out_tree)
                else:
                    comp = self._jit.lower(*args).compile()
                    payload, in_tree, out_tree = serialize(comp)
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        pickle.dump((payload, in_tree, out_tree), f)
                    os.replace(tmp, path)
                    self._exes[key] = comp
            except Exception as e:          # fall back to the plain jit
                from .utils import log
                log(f"aot-cache: {self._tag}: {type(e).__name__}: "
                    f"{str(e)[:80]} (falling back to jit)")
                self._exes[key] = None
        exe = self._exes[key]
        if exe is not None:
            try:
                return exe(*args)
            except Exception:
                self._exes[key] = None      # stale executable: recompile
        return self._jit(*args)


def maybe_aot(jitfn, tag: str):
    """Wrap when the cache could ever be enabled (cheap pass-through)."""
    return AotJit(jitfn, tag)
