"""t-blocked grouped-lane kernel at 32^3x64 on the real chip.

The gl kernel is DMA-bound at this volume (f32 4.04 ms vs all-bf16
2.17 ms — exact traffic ratio; effective BW ~385 GB/s vs the 654 GB/s
streaming copy bound).  Candidates measured here:

  copy-probe  — same 5-input modular BlockSpec structure, near-zero VPU
                work: the achievable-DMA ceiling for this access pattern
                (tells whether the 385 GB/s is structural or body-bound);
  glt{by}.{bt} — t-blocked gl: psi refetch (bt+2)/bt instead of 3, t-links
                at t-1 reused from the centre U block for j>0.

Appends to artifacts/bench_glt32.json.
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
RESULTS = {}


def force(x):
    return float(_SUM(x))


def time_chain(fn, psi, args, label, vol, n1=8, n2=108, reps=4):
    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        return jax.lax.fori_loop(
            0, n, lambda i, x: (fn(x, *a) * 0.5).astype(p.dtype), p)

    try:
        t0 = time.perf_counter()
        force(chain(psi, n1, *args)); force(chain(psi, n2, *args))
        print(f"{label:24s}: compiled {time.perf_counter()-t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"{label:24s}: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        RESULTS[label] = "compile-failed"
        return None
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(chain(psi, n1, *args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); force(chain(psi, n2, *args)); t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / (n2 - n1))
    per = float(np.median(pers))
    gf = 1320 * vol / per / 1e9
    print(f"{label:24s}: {per*1e6:9.1f} us/apply {gf:7.1f} GFLOP/s",
          flush=True)
    RESULTS[label] = {"us": round(per * 1e6, 1), "gflops": round(gf, 1)}
    return per


def copy_probe(psi, U, Ut, Y, by):
    """Same block structure as the gl kernel, trivial body: measures the
    DMA ceiling of the 5-stream modular-index pipeline."""
    T, _, Z, YX = psi.shape
    X = YX // Y
    NBy = Y // by
    S, L = Z * NBy, by * X

    def kernel(pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref, out_ref):
        for comp in range(24):
            out_ref[0, comp] = (pc_ref[0, comp]
                                + 0.001 * pm_ref[0, comp]
                                + 0.001 * pp_ref[0, comp]
                                + 0.001 * Uc_ref[0, 0, comp % 18]
                                + 0.001 * Utm_ref[0, comp % 18])

    def bs(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    psi_g = psi.reshape(T, 24, S, L)
    U_g = U.reshape(T, 4, 18, S, L)
    Ut_g = Ut.reshape(T, 18, S, L)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            bs((1, 24, S, L), lambda i: ((i - 1) % T, 0, 0, 0)),
            bs((1, 24, S, L), lambda i: (i, 0, 0, 0)),
            bs((1, 24, S, L), lambda i: ((i + 1) % T, 0, 0, 0)),
            bs((1, 4, 18, S, L), lambda i: (i, 0, 0, 0, 0)),
            bs((1, 18, S, L), lambda i: ((i - 1) % T, 0, 0, 0)),
        ],
        out_specs=bs((1, 24, S, L), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 24, S, L), psi.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(psi_g, psi_g, psi_g, U_g, Ut_g)
    return out.reshape(T, 24, Z, YX)


def fields_for(DIMS, seed=1):
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk

    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=seed)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = jnp.asarray(dk.to_kernel_gauge(U_pl))
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(
        (DIMS[3], 24, DIMS[2], DIMS[1] * DIMS[0]))).astype(jnp.float32)
    return psi, U_k, U_k[:, 3]


def main():
    from mugiq_tpu.profiling import enable_compilation_cache
    import mugiq_tpu.pallas.dslash_kernel as dk

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)

    DIMS = (32, 32, 32, 64)
    vol = int(np.prod(DIMS))
    psi, U, Ut = fields_for(DIMS)
    psib = psi.astype(jnp.bfloat16)
    Ub, Utb = U.astype(jnp.bfloat16), Ut.astype(jnp.bfloat16)
    force(psi); force(psib); force(Ub)

    jcp = jax.jit(copy_probe, static_argnames=("Y", "by"))
    time_chain(lambda x, u, ut: jcp(x, u, ut, Y=32, by=8),
               psi, (U, Ut), "copy-probe f32", vol)

    for bt in (2, 4):
        time_chain(lambda x, u, ut, t=bt: dk.dslash_hop_pallas_glt(
            x, u, ut, Y=32, by=8, bt=t), psi, (U, Ut),
            f"glt8.{bt} 32c f32", vol)
    time_chain(lambda x, u, ut: dk.dslash_hop_pallas_glt(
        x, u, ut, Y=32, by=8, bt=2), psi, (Ub, Utb),
        "glt8.2 32c bf16-links", vol)
    for bt in (2, 4):
        time_chain(lambda x, u, ut, t=bt: dk.dslash_hop_pallas_glt(
            x, u, ut, Y=32, by=8, bt=t), psib, (Ub, Utb),
            f"glt8.{bt} 32c all-bf16", vol)
    # fused M (the production operator's actual hot call)
    A0 = jnp.zeros((1,), jnp.float32)
    for bt in (2, 4):
        time_chain(lambda x, u, ut, t=bt: dk.wilson_m_pallas_glt(
            x, u, ut, A0, Y=32, kappa=0.12, by=8, bt=t), psi, (U, Ut),
            f"M glt8.{bt} 32c f32", vol)
    time_chain(lambda x, u, ut: dk.wilson_m_pallas_glt(
        x, u, ut, A0.astype(jnp.bfloat16), Y=32, kappa=0.12, by=8, bt=2),
        psi, (Ub, Utb), "M glt8.2 32c bf16-links", vol)

    with open("/root/repo/artifacts/bench_glt32.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("wrote artifacts/bench_glt32.json", flush=True)


if __name__ == "__main__":
    main()
