"""Round 2 of the 32^3x64 DMA-structure hunt on the real chip.

Findings so far (bench_glt32.json): copy-probe == gl8 dslash time — the
kernel is at the DMA-STRUCTURE ceiling (~390 GB/s effective), the body is
free, and t-blocking via BlockSpec (glt) made pipelining worse.

This script (a) retimes with NO inter-apply scaling op (the old chains
carried an extra full psi read+write per apply — 615 us at 32^3 f32,
additive on every prior number), (b) runs probe variants to find WHICH
aspect of the structure binds (stream count? modular index maps?), and
(c) measures the manual-DMA t-window kernel on the grouped-lane layout
(win-gl: fewer streams AND (bt+2)/bt psi traffic).

NOTE: chains apply the raw hop repeatedly — values overflow to inf after
~40 applies.  Timing is unaffected (TPU arithmetic is flush-free); the
readback only forces completion.

Appends to artifacts/bench_glt32b.json.
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


def time_chain(fn, psi, args, label, vol, n1=8, n2=108, reps=4,
               cast=True):
    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        body = ((lambda i, x: fn(x, *a).astype(p.dtype)) if cast
                else (lambda i, x: fn(x, *a)))
        return jax.lax.fori_loop(0, n, body, p)

    try:
        t0 = time.perf_counter()
        force(chain(psi, n1, *args)); force(chain(psi, n2, *args))
        print(f"{label:26s}: compiled {time.perf_counter()-t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"{label:26s}: FAILED {type(e).__name__}: {str(e)[:100]}",
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
    print(f"{label:26s}: {per*1e6:9.1f} us/apply {gf:7.1f} GFLOP/s",
          flush=True)
    RESULTS[label] = {"us": round(per * 1e6, 1), "gflops": round(gf, 1)}
    return per


def make_probe(Y, by, streams="full", semantics=None, modular=True):
    """DMA-structure probe: the gl kernel's block pipeline with a trivial
    body.  streams: 'full' (pm/pc/pp/U/Utm), '2' (pc only)."""

    def probe(psi, U, Ut):
        T, _, Z, YX = psi.shape
        X = YX // Y
        NBy = Y // by
        S, L = Z * NBy, by * X

        def bs(shape, idx):
            return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

        psi_g = psi.reshape(T, 24, S, L)
        if streams == "2":
            def kernel(pc_ref, out_ref):
                for comp in range(24):
                    out_ref[0, comp] = pc_ref[0, comp] * 1.0001
            in_specs = [bs((1, 24, S, L), lambda i: (i, 0, 0, 0))]
            args = [psi_g]
        else:
            def kernel(pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref, out_ref):
                for comp in range(24):
                    out_ref[0, comp] = (pc_ref[0, comp]
                                        + 0.001 * pm_ref[0, comp]
                                        + 0.001 * pp_ref[0, comp]
                                        + 0.001 * Uc_ref[0, 0, comp % 18]
                                        + 0.001 * Utm_ref[0, comp % 18])
            mm = ((lambda i: ((i - 1) % T, 0, 0, 0)) if modular
                  else (lambda i: (i, 0, 0, 0)))
            pm_map = ((lambda i: ((i + 1) % T, 0, 0, 0)) if modular
                      else (lambda i: (i, 0, 0, 0)))
            in_specs = [
                bs((1, 24, S, L), mm),
                bs((1, 24, S, L), lambda i: (i, 0, 0, 0)),
                bs((1, 24, S, L), pm_map),
                bs((1, 4, 18, S, L), lambda i: (i, 0, 0, 0, 0)),
                bs((1, 18, S, L), mm),
            ]
            args = [psi_g, psi_g, psi_g, U.reshape(T, 4, 18, S, L),
                    Ut.reshape(T, 18, S, L)]
        cp = dict(vmem_limit_bytes=110 * 1024 * 1024)
        if semantics:
            cp["dimension_semantics"] = semantics
        out = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=in_specs,
            out_specs=bs((1, 24, S, L), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, 24, S, L), psi.dtype),
            compiler_params=pltpu.CompilerParams(**cp),
        )(*args)
        return out.reshape(T, 24, Z, YX)

    return probe


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
    import mugiq_tpu.pallas.dslash_win_kernel as wk

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)

    DIMS = (32, 32, 32, 64)
    vol = int(np.prod(DIMS))
    psi, U, Ut = fields_for(DIMS)
    psib = psi.astype(jnp.bfloat16)
    Ub, Utb = U.astype(jnp.bfloat16), Ut.astype(jnp.bfloat16)
    force(psi); force(psib); force(Ub)

    # --- probes (no-scale chains from here on) ---
    for label, kw in [
        ("probe full", {}),
        ("probe 2stream", {"streams": "2"}),
        ("probe parallel-sem", {"semantics": ("parallel",)}),
        ("probe non-modular", {"modular": False}),
    ]:
        p = jax.jit(make_probe(32, 8, **kw))
        time_chain(lambda x, u, ut, f=p: f(x, u, ut), psi, (U, Ut),
                   label, vol)

    # --- clean gl8 baselines without the inter-apply scale op ---
    time_chain(lambda x, u, ut: dk.dslash_hop_pallas_gl(x, u, ut, Y=32,
                                                        by=8),
               psi, (U, Ut), "gl8 f32 clean", vol)
    time_chain(lambda x, u, ut: dk.dslash_hop_pallas_gl(
        x, u, ut, Y=32, by=8), psib, (Ub, Utb), "gl8 all-bf16 clean", vol)

    # --- manual-DMA t-window on the grouped-lane layout ---
    for bt in (2, 4):
        time_chain(lambda x, u, ut, t=bt: wk.dslash_hop_pallas_win(
            x, u, ut, Y=32, bt=t, gl_by=8), psi, (U, Ut),
            f"wing8.{bt} f32", vol)
    time_chain(lambda x, u, ut: wk.dslash_hop_pallas_win(
        x, u, ut, Y=32, bt=4, gl_by=8), psi, (Ub, Utb),
        "wing8.4 bf16-links", vol)
    time_chain(lambda x, u, ut: wk.dslash_hop_pallas_win(
        x, u, ut, Y=32, bt=4, gl_by=8, out_dtype=jnp.bfloat16),
        psib, (Ub, Utb), "wing8.4 all-bf16", vol)
    time_chain(lambda x, u, ut: wk.dslash_hop_pallas_win(
        x, u, ut, Y=32, bt=8, gl_by=8, out_dtype=jnp.bfloat16),
        psib, (Ub, Utb), "wing8.8 all-bf16", vol)

    with open("/root/repo/artifacts/bench_glt32b.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("wrote artifacts/bench_glt32b.json", flush=True)


if __name__ == "__main__":
    main()
