"""Packed vs masked even-odd Schur operator on the real chip (16^3x32).

The masked SchurDiracKernel runs the full-volume dslash twice per M and
throws half of each result away; the packed kernel does the same arithmetic
on half-volume fields.  Target (VERDICT r2 item 2): packed >= 1.8x masked.

Writes artifacts/bench_schur.json.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (16, 16, 16, 32)
N1, N2 = 8, 208
_SUM = jax.jit(lambda a: jnp.sum(a * a))


def force(x):
    return float(_SUM(x))


def time_chain(fn, args, psi, label, reps=4):
    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        return jax.lax.fori_loop(0, n, lambda i, x: fn(x, *a) * 0.5, p)

    t0 = time.perf_counter()
    force(chain(psi, N1, *args))
    force(chain(psi, N2, *args))
    print(f"{label:12s}: compiled in {time.perf_counter()-t0:.0f}s",
          flush=True)
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(chain(psi, N1, *args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); force(chain(psi, N2, *args)); t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / (N2 - N1))
    per = float(np.median(pers))
    print(f"{label:12s}: {per*1e6:8.1f} us/apply "
          f"(spread {min(pers)*1e6:.1f}..{max(pers)*1e6:.1f})", flush=True)
    return per


def main():
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.rc.host import gauge_rc
    from mugiq_tpu.params import EigOperator
    import mugiq_tpu.pallas.dslash_kernel as dk
    from mugiq_tpu.pallas.dirac_kernel import SchurDiracKernel
    from mugiq_tpu.pallas.schur_kernel import SchurDiracKernelPacked

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=1)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = jnp.asarray(dk.to_kernel_gauge(U_pl))
    Y = DIMS[1]
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(
        (DIMS[3], 24, DIMS[2], DIMS[1] * DIMS[0])).astype(np.float32))

    masked = SchurDiracKernel(U_k=U_k, kappa=0.12, Y=Y)
    packed = SchurDiracKernelPacked(U_k=U_k, kappa=0.12, Y=Y)
    pe = jnp.asarray(packed.pack_even(psi))
    force(psi); force(pe); force(packed.U_e)

    # masked M: full-volume fields (closure links; single compiled op)
    t_masked = time_chain(lambda p: masked.M(p), (), psi, "masked M")
    fn, args = packed.operator_with_args(EigOperator.M)
    t_packed = time_chain(fn, args, pe, "packed M")
    fn2, args2 = packed.operator_with_args(EigOperator.MdagM)
    t_packed2 = time_chain(fn2, args2, pe, "packed MdagM")

    speedup = t_masked / t_packed
    print(f"speedup packed/masked: {speedup:.2f}x", flush=True)
    with open("/root/repo/artifacts/bench_schur.json", "w") as f:
        json.dump({"dims": DIMS,
                   "masked_m_us": round(t_masked * 1e6, 1),
                   "packed_m_us": round(t_packed * 1e6, 1),
                   "packed_mdagm_us": round(t_packed2 * 1e6, 1),
                   "speedup": round(speedup, 2)}, f, indent=1)
    print("wrote artifacts/bench_schur.json", flush=True)


if __name__ == "__main__":
    main()
