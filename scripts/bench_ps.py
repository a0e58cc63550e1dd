"""A/B the project-then-shift (ps) dslash body on the real chip.

Times (lax.fori chains, length differencing — CLAUDE.md timing rules):
  16^3x32: base vs psb hop            (the headline-bench regime)
  32^3x64: gl8 vs psgl8 fused M, f32 + bf16 links

Writes artifacts/bench_ps.json.
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402


_SUM = None


def force(x):
    global _SUM
    if _SUM is None:
        _SUM = jax.jit(lambda a: jnp.sum((a * a).astype(jnp.float32)))
    return float(_SUM(x))


def time_chain(mk_apply, psi, n1, n2, reps=3, args=()):
    """mk_apply(x, *args); operands threaded as jit ARGS (a closure embeds
    the links as HLO constants — HTTP 413 at 32^3)."""
    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        return jax.lax.fori_loop(0, n, lambda i, x: mk_apply(x, *a), p)

    force(chain(psi, n1, *args)); force(chain(psi, n2, *args))
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter(); force(chain(psi, n1, *args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); force(chain(psi, n2, *args))
        t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / (n2 - n1))
    return float(np.median(pers))


def main():
    import mugiq_tpu.pallas.dslash_kernel as dk
    from mugiq_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    out = {"hardware": "1x TPU v5e (tunnelled)"}

    # ---- 16^3x32 hop: base vs psb ----
    T, Z, Y, X = 32, 16, 16, 16
    vol = T * Z * Y * X
    psi = jnp.asarray(rng.standard_normal((T, 24, Z, Y * X)), jnp.float32)
    U = jnp.asarray(rng.standard_normal((T, 4, 18, Z, Y * X)), jnp.float32)
    Ut = U[:, 3]
    for tag, ps in (("base", False), ("psb", True)):
        per = time_chain(lambda x, u, ut, p=ps: dk.dslash_hop_pallas(
            x, u, ut, Y=Y, ps=p), psi, 8, 408, args=(U, Ut))
        out[f"hop16_{tag}_us"] = round(per * 1e6, 2)
        out[f"hop16_{tag}_gflops"] = round(1320 * vol / per / 1e9, 1)
        print(f"16^3 hop {tag}: {per*1e6:.1f} us "
              f"({out[f'hop16_{tag}_gflops']} GFLOP/s)", flush=True)

    # ---- 32^3x64 fused M: gl8 vs psgl8, f32 + bf16 ----
    T, Z, Y, X = 64, 32, 32, 32
    vol = T * Z * Y * X
    psi = jnp.asarray(rng.standard_normal((T, 24, Z, Y * X)), jnp.float32)
    U = jnp.asarray(rng.standard_normal((T, 4, 18, Z, Y * X)), jnp.float32)
    z1 = jnp.zeros((1,), jnp.float32)
    for prec, (p32, U32) in (("f32", (psi, U)),
                             ("bf16", (psi.astype(jnp.bfloat16),
                                       U.astype(jnp.bfloat16)))):
        Ut32 = U32[:, 3]
        for tag, ps in (("gl8", False), ("psgl8", True)):
            per = time_chain(lambda x, u, ut, a, p=ps: (
                dk.wilson_m_pallas_gl(x, u, ut, a, Y=Y, kappa=0.12, by=8,
                                      ps=p)), p32, 4, 44,
                args=(U32, Ut32, z1))
            out[f"m32_{prec}_{tag}_us"] = round(per * 1e6, 1)
            out[f"m32_{prec}_{tag}_gflops"] = round(1368 * vol / per / 1e9,
                                                    1)
            print(f"32^3 M {prec} {tag}: {per*1e6:.0f} us "
                  f"({out[f'm32_{prec}_{tag}_gflops']} GFLOP/s)",
                  flush=True)

    # ---- packed even-odd Schur MdagM at 16^3x32: ps on/off ----
    from mugiq_tpu.pallas.schur_kernel import SchurDiracKernelPacked
    T, Z, Y, X = 32, 16, 16, 16
    volh = T * Z * Y * X // 2
    U16 = jnp.asarray(rng.standard_normal((T, 4, 18, Z, Y * X)),
                      jnp.float32)
    for tag, psflag in (("pc", False), ("pspc", True)):
        op = SchurDiracKernelPacked(U_k=U16, kappa=0.12, Y=Y, ps=psflag)
        fn, args = op.operator_with_args(
            __import__("mugiq_tpu.params", fromlist=["EigOperator"]
                       ).EigOperator.MdagM)
        pe = jnp.asarray(rng.standard_normal(op.field_shape), jnp.float32)
        per = time_chain(lambda x, *a: fn(x, *a), pe, 4, 104, args=args)
        out[f"pc16_{tag}_us"] = round(per * 1e6, 1)
        print(f"16^3 packed MdagM {tag}: {per*1e6:.1f} us", flush=True)

    with open("/root/repo/artifacts/bench_ps.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/bench_ps.json", flush=True)


if __name__ == "__main__":
    main()
