"""DMA stream-count probe at 32^3x64 (VERDICT round-3 item 4).

The gl dslash is DMA-STRUCTURE-bound: a copy-probe with the same block
structure runs at stencil speed (bench_glt32.json), ~457 GB/s effective vs
654 streaming.  Hypothesis: the per-grid-step descriptor count (5 input
streams + 1 output) is the binder.  Test: copy kernels that all read the
SAME 162 components x [S, L] per step and write 24, varying ONLY how the
inputs are split into streams (5 / 4 / 3 / 2).  One stream is always the
chained state (so fori chains carry a data dependence); the rest are
static arrays.

If fewer streams is faster, the actionable variant is merging U+Ut into
one pre-packed array (5 -> 4 streams, no extra per-apply traffic).

Appends artifacts/probe_streams32.json.
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

X, Y, Z, T = 32, 32, 32, 64
BY = 8
NBY = Y // BY
S, L = Z * NBY, BY * X          # 128 x 256
VOL = X * Y * Z * T

_SUM = jax.jit(lambda a: jnp.sum((a * a).astype(jnp.float32)))


def force(x):
    return float(_SUM(x))


def bs(shape, idx):
    return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)


def make_probe(extra_comp_splits):
    """Probe with the chained 24-comp state plus len(extra_comp_splits)
    static streams whose comp counts sum to 138 (total in = 162 comps)."""
    assert sum(extra_comp_splits) == 138

    def probe(state, *extras):
        n_extra = len(extras)

        def kernel(*refs):
            st_ref = refs[0]
            out_ref = refs[-1]
            for comp in range(24):
                acc = st_ref[0, comp] * 1.0001
                k = comp
                for e in range(n_extra):
                    ce = extras[e].shape[1]
                    for j in range(ce // 24 + (1 if comp < ce % 24 else 0)):
                        acc = acc + 0.001 * refs[1 + e][0, (k + 24 * j) % ce]
                out_ref[0, comp] = acc

        in_specs = [bs((1, 24, S, L), lambda i: (i, 0, 0, 0))]
        for e in extras:
            ce = e.shape[1]
            in_specs.append(bs((1, ce, S, L), lambda i: (i, 0, 0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=bs((1, 24, S, L), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, 24, S, L), state.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(state, *extras)

    return probe


def time_chain(fn, psi, args, label, n1=8, n2=58, reps=4):
    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        return jax.lax.fori_loop(0, n, lambda i, x: fn(x, *a), p)

    try:
        t0 = time.perf_counter()
        force(chain(psi, n1, *args)); force(chain(psi, n2, *args))
        print(f"{label:28s}: compiled {time.perf_counter()-t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"{label:28s}: FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return None
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(chain(psi, n1, *args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); force(chain(psi, n2, *args)); t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / (n2 - n1))
    per = float(np.median(pers))
    bw = (162 + 24) * S * L * T * 4 / per / 1e9
    print(f"{label:28s}: {per*1e6:9.1f} us/step-chain  eff {bw:6.1f} GB/s",
          flush=True)
    return per


def main():
    from mugiq_tpu.profiling import enable_compilation_cache
    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)

    key = jax.random.PRNGKey(0)
    psi = jax.random.normal(key, (T, 24, S, L), jnp.float32)

    def extras(splits):
        return [jax.random.normal(jax.random.PRNGKey(10 + i),
                                  (T, c, S, L), jnp.float32)
                for i, c in enumerate(splits)]

    results = {}
    configs = [
        ("streams5 (24+24+24+72+18)", [24, 24, 72, 18]),
        ("streams4 (24+24+24+90)", [24, 24, 90]),
        ("streams3 (24+48+90)", [48, 90]),
        ("streams2 (24+138)", [138]),
    ]
    for label, splits in configs:
        per = time_chain(make_probe(splits), psi, extras(splits), label)
        if per is not None:
            results[label] = {"us": round(per * 1e6, 1),
                              "eff_gbps": round(
                                  (162 + 24) * S * L * T * 4 / per / 1e9, 1)}

    # reference: the REAL gl8 dslash for the same chain protocol
    import mugiq_tpu.pallas.dslash_kernel as dk
    U_k = jax.random.normal(key, (T, 4, 18, Z, Y * X), jnp.float32)
    psi_k = psi.reshape(T, 24, Z, Y * X)

    def dslash(p, U, Ut):
        return dk.wilson_m_pallas_gl(p, U, Ut, jnp.zeros((1,), jnp.float32),
                                     Y=Y, kappa=0.12, by=BY)

    per = time_chain(dslash, psi_k, (U_k, U_k[:, 3]), "gl8 dslash (real)")
    if per is not None:
        results["gl8 dslash"] = {"us": round(per * 1e6, 1),
                                 "gflops": round(1320 * VOL / per / 1e9, 1)}

    with open("/root/repo/artifacts/probe_streams32.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote artifacts/probe_streams32.json", flush=True)


if __name__ == "__main__":
    main()
