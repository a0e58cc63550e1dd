"""Which grouped-lane tiling of the packed parity kernel compiles at
32^3x64?  (by=16 -> L=256 failed in time_eig32; the parity body carries
extra packed-x selects vs the plain dslash.)  Prints per-by outcome and
times the winner's M apply."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from mugiq_tpu.profiling import enable_compilation_cache
    import mugiq_tpu.pallas.schur_kernel as sk

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)

    T, Z, Y, X = 64, 32, 32, 32
    Xh = X // 2
    rng = np.random.default_rng(0)
    U_k = jnp.asarray(rng.standard_normal((T, 4, 18, Z, Y * X)),
                      dtype=jnp.float32)

    op = sk.SchurDiracKernelPacked(U_k=U_k, kappa=0.12, Y=Y)
    print(f"auto by = {op.by}", flush=True)
    pe = jnp.asarray(rng.standard_normal((T, 24, Z, Y * Xh)),
                     dtype=jnp.float32)
    _SUM = jax.jit(lambda a: jnp.sum((a * a).astype(jnp.float32)))

    best = None
    for by in (16, 8, 4):
        if not (Y % by == 0 and 128 <= by * Xh <= 512):
            continue
        op.by = by
        try:
            t0 = time.perf_counter()
            out = op.M(pe)
            float(_SUM(out))
            print(f"by={by} (L={by*Xh}): OK "
                  f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
            if best is None:
                best = by
        except Exception as e:
            print(f"by={by} (L={by*Xh}): FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

    if best is None:
        print("NO tiling compiles", flush=True)
        return

    op.by = best
    from functools import partial

    fn, args = op.operator_with_args(__import__(
        "mugiq_tpu.params", fromlist=["EigOperator"]).EigOperator.MdagM)

    @partial(jax.jit, static_argnames=("n",))
    def chain(p, n, *a):
        return jax.lax.fori_loop(0, n, lambda i, x: fn(x, *a), p)

    float(_SUM(chain(pe, 4, *args))); float(_SUM(chain(pe, 54, *args)))
    pers = []
    for _ in range(3):
        t0 = time.perf_counter(); float(_SUM(chain(pe, 4, *args)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(_SUM(chain(pe, 54, *args)))
        t2 = time.perf_counter() - t0
        pers.append((t2 - t1) / 50)
    per = float(np.median(pers))
    print(f"packed MdagM by={best}: {per*1e6:.1f} us/apply", flush=True)


if __name__ == "__main__":
    main()
