"""Does XLA fold a leading-axis prefix slice of a big operand into a dot
without materializing a copy on the TPU?

If yes, the Lanczos cycle can read V[:block_hi] per step-block and halve
average HBM traffic.  If no (copy), blocked chunk storage is needed.

Timing: chain-differenced as in bench.py (tunnel RTT cancels).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

M1 = 49
FIELD = (32, 24, 16, 256)    # 16^3x32 kernel layout, 12.6 MB f32

_SUM = jax.jit(lambda a: jnp.sum(a * a))


def force(x):
    return float(_SUM(x))


def timeit(fn, *args, reps=4):
    o = fn(*args); force(o)

    def chain(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        force(o)
        return time.perf_counter() - t0

    diffs = []
    for _ in range(reps):
        diffs.append((chain(9) - chain(3)) / 6)
    return float(np.median(diffs))


def main():
    print(f"backend: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((M1,) + FIELD).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(FIELD).astype(np.float32))
    force(V)

    @partial(jax.jit, static_argnames=("hi",))
    def dots_prefix(V, w, hi):
        return jnp.einsum("i...,...->i", V[:hi], w)

    t_full = timeit(dots_prefix, V, w, 49)
    t_half = timeit(dots_prefix, V, w, 25)
    t_quarter = timeit(dots_prefix, V, w, 13)
    gbs = V.nbytes / 1e9
    print(f"dots full  (49): {t_full*1e3:7.3f} ms  ({gbs/t_full:.0f} GB/s)",
          flush=True)
    print(f"dots half  (25): {t_half*1e3:7.3f} ms  (ratio {t_half/t_full:.2f},"
          f" free-slice would be ~0.51)", flush=True)
    print(f"dots quart (13): {t_quarter*1e3:7.3f} ms  (ratio "
          f"{t_quarter/t_full:.2f}, free ~0.27)", flush=True)

    # same question for the axpy direction (small x big -> field out)
    d = jnp.asarray(rng.standard_normal((M1,)).astype(np.float32))

    @partial(jax.jit, static_argnames=("hi",))
    def axpy_prefix(w, d, V, hi):
        return w - jnp.einsum("i,i...->...", d[:hi], V[:hi])

    t_full = timeit(axpy_prefix, w, d, V, 49)
    t_half = timeit(axpy_prefix, w, d, V, 25)
    print(f"axpy full  (49): {t_full*1e3:7.3f} ms", flush=True)
    print(f"axpy half  (25): {t_half*1e3:7.3f} ms  (ratio "
          f"{t_half/t_full:.2f})", flush=True)

    # inside a fori loop (carry-V, static slice in body) — mirrors the cycle
    @jax.jit
    def loop_sliced(V, w):
        def body(i, acc):
            dd = jnp.einsum("i...,...->i", V[:25], w)
            return acc + jnp.sum(dd)
        return jax.lax.fori_loop(0, 8, body, 0.0)

    @jax.jit
    def loop_full(V, w):
        def body(i, acc):
            dd = jnp.einsum("i...,...->i", V, w)
            return acc + jnp.sum(dd)
        return jax.lax.fori_loop(0, 8, body, 0.0)

    tf = timeit(loop_full, V, w)
    ts = timeit(loop_sliced, V, w)
    print(f"fori 8x full: {tf*1e3:7.3f} ms ; fori 8x half-slice: "
          f"{ts*1e3:7.3f} ms (ratio {ts/tf:.2f})", flush=True)


if __name__ == "__main__":
    main()
