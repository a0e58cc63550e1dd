"""Diagnose the 32^3x64 dslash gap (267 GFLOP/s vs ~1300 traffic-bound).

Probes:
1. yb4 at 16^3x32 — if ~= base (86 us) the yb body is sound and the 32^3
   gap is memory-side; if much slower, the per-access halo concats are the
   bottleneck.
2. yb4 with bf16 spinors AND links AND output at 32^3x64 (traffic ~0.5x).
3. stream-copy kernel with the yb block structure at 32^3x64 — achievable
   bandwidth bound for this access pattern.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

_SUM = jax.jit(lambda a: jnp.sum((a * a).astype(jnp.float32)))


def force(x):
    return float(_SUM(x))


def time_chain(fn, psi, args, label, n1=8, n2=108, reps=4, scale=0.5):
    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        return jax.lax.fori_loop(
            0, n, lambda i, x: (fn(x, *a) * scale).astype(p.dtype), p)

    try:
        t0 = time.perf_counter()
        force(chain(psi, n1, *args)); force(chain(psi, n2, *args))
        print(f"{label:24s}: compiled {time.perf_counter()-t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"{label:24s}: FAILED {type(e).__name__}: {str(e)[:80]}",
              flush=True)
        return None
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(chain(psi, n1, *args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); force(chain(psi, n2, *args)); t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / (n2 - n1))
    per = float(np.median(pers))
    print(f"{label:24s}: {per*1e6:9.1f} us/apply", flush=True)
    return per


def stream_copy_yb(psi, Y, by):
    """Copy psi -> out with the yb grid/block structure (BW bound)."""
    T, C, Z, YX = psi.shape
    X = YX // Y
    NB = Y // by
    bw = by * X

    def kernel(src, out):
        out[...] = src[...]

    return pl.pallas_call(
        kernel,
        grid=(T, NB),
        in_specs=[pl.BlockSpec((1, C, Z, bw), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, Z, bw), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(psi.shape, psi.dtype),
    )(psi)


def fields_for(DIMS, dtype=jnp.float32, seed=1):
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk

    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=seed)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = jnp.asarray(dk.to_kernel_gauge(U_pl)).astype(dtype)
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(
        (DIMS[3], 24, DIMS[2], DIMS[1] * DIMS[0]))).astype(dtype)
    return psi, U_k, U_k[:, 3]


def main():
    from mugiq_tpu.profiling import enable_compilation_cache
    import mugiq_tpu.pallas.dslash_kernel as dk

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    out = {}

    # 1. yb4 at 16^3x32 (vs known base 86 us)
    psi, U, Ut = fields_for((16, 16, 16, 32))
    force(psi)
    p = time_chain(lambda x, u, ut: dk.dslash_hop_pallas_yb(x, u, ut, Y=16,
                                                            by=4),
                   psi, (U, Ut), "yb4 16^3x32 f32")
    out["yb4_16c_us"] = round(p * 1e6, 1) if p else None
    p = time_chain(lambda x, u, ut: dk.dslash_hop_pallas(x, u, ut, Y=16),
                   psi, (U, Ut), "base 16^3x32 f32")
    out["base_16c_us"] = round(p * 1e6, 1) if p else None

    # 2. 32^3x64 variants
    DIMS = (32, 32, 32, 64)
    psi, U, Ut = fields_for(DIMS)
    psib = psi.astype(jnp.bfloat16)
    Ub, Utb = U.astype(jnp.bfloat16), Ut.astype(jnp.bfloat16)
    force(psib); force(Ub)
    p = time_chain(lambda x, u, ut: dk.dslash_hop_pallas_yb(
        x, u, ut, Y=32, by=4), psib, (Ub, Utb), "yb4 32c all-bf16")
    if p:
        out["yb4_32c_bf16_us"] = round(p * 1e6, 1)
        out["yb4_32c_bf16_gflops"] = round(1320 * 2097152 / p / 1e9, 1)

    # 3. stream-copy bound (f32 and bf16)
    for nm, arr in (("f32", psi), ("bf16", psib)):
        p = time_chain(lambda x: stream_copy_yb(x, 32, 4), arr, (),
                       f"copy yb4 32c {nm}", scale=1.0)
        if p:
            gb = 2 * arr.size * arr.dtype.itemsize / p / 1e9
            out[f"copy_{nm}_us"] = round(p * 1e6, 1)
            out[f"copy_{nm}_gbs"] = round(gb, 1)
            print(f"   -> {gb:.0f} GB/s r+w", flush=True)

    with open("/root/repo/artifacts/exp32_diag.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/exp32_diag.json", flush=True)


if __name__ == "__main__":
    main()
