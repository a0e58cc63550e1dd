"""Calibrate the chip's actual HBM bandwidth (the dslash measures ~1.5 TB/s
effective, well above the v5e datasheet 819 GB/s — find the real roofline).

Streams: big-array copy (read+write), scaled copy, and a reduction
(read-only), timed with device-side fori chains.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N = 64 * 1024 * 1024          # 256 MB f32
N1, N2 = 20, 220

_SUM = jax.jit(lambda a: jnp.sum(a))


def force(x):
    return float(_SUM(x))


def main():
    print(f"backend: {jax.devices()}", flush=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(N),
                    dtype=jnp.float32)
    force(x)

    @partial(jax.jit, static_argnames=("n",))
    def copy_chain(p, n):
        return jax.lax.fori_loop(0, n, lambda i, a: a * 1.0000001, p)

    @partial(jax.jit, static_argnames=("n",))
    def sum_chain(p, n):
        # read-only: accumulate a scalar, re-salt p trivially via the scalar
        def body(i, carry):
            a, s = carry
            return a, s + jnp.sum(a) * 1e-30
        _, s = jax.lax.fori_loop(0, n, body, (p, jnp.zeros((), jnp.float32)))
        return s

    for label, chain, traffic in (
            ("copy (r+w)", copy_chain, 2 * x.nbytes),
            ("reduce (r)", sum_chain, x.nbytes)):
        force(chain(x, N1)); force(chain(x, N2))
        pers = []
        for _ in range(5):
            t0 = time.perf_counter(); force(chain(x, N1)); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); force(chain(x, N2)); t2 = time.perf_counter() - t0
            pers.append((t2 - t1) / (N2 - N1))
        per = float(np.median(pers))
        print(f"{label}: {per*1e6:9.1f} us/pass  -> {traffic/per/1e9:7.0f} "
              f"GB/s  (spread {min(pers)*1e6:.1f}..{max(pers)*1e6:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
