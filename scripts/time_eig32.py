"""32^3x64 eigensolve-phase timing: f32 vs bf16 Krylov basis vs packed pc.

Measures the WARM per-restart wall-clock of the production Lanczos.
Methodology: the operator/fields are built ONCE per config (the 605 MB
gauge transfer through the tunnel and the parity packing jitter by
seconds — differencing solver calls that rebuild them measures noise);
the same compile_cache then serves 2- and 8-restart solves (tol=0), the
difference isolates 6 steady restarts, min over repeats.

Writes artifacts/time_eig32.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)


def main():
    import jax
    import jax.numpy as jnp
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.params import (DslashType, EigOperator, GaugeParam,
                                  InvertParam)
    from mugiq_tpu.production import build_kernel_dirac, build_packed_schur
    from mugiq_tpu.planar.lanczos import lanczos_hermitian_realpair
    from mugiq_tpu import fields

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)

    t0 = time.perf_counter()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        U = np.asarray(fields.random_gauge(geom, seed=1,
                                           dtype=jnp.complex64))
    print(f"gauge built: {time.perf_counter()-t0:.1f} s", flush=True)

    gp = GaugeParam(dims=DIMS)
    ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)

    t0 = time.perf_counter()
    op_full = build_kernel_dirac(U, gp, ip, precision="bf16")
    op_pc = build_packed_schur(U, gp, ip, precision="bf16")
    print(f"operators built: {time.perf_counter()-t0:.1f} s", flush=True)

    rng = np.random.default_rng(7)
    v0_full = jnp.asarray(rng.standard_normal(
        (geom.Lt, 24, geom.Lz, geom.Ly * geom.Lx)), dtype=jnp.float32)
    v0_pc = jnp.asarray(rng.standard_normal(op_pc.field_shape),
                        dtype=jnp.float32)

    results = {}
    configs = [
        ("full f32-basis nKr24", op_full, v0_full, 24, None),
        ("full bf16-basis nKr24", op_full, v0_full, 24, jnp.bfloat16),
        ("pc f32-basis nKr24", op_pc, v0_pc, 24, None),
        ("pc bf16-basis nKr48", op_pc, v0_pc, 48, jnp.bfloat16),
    ]
    for label, op, v0, nkr, bdt in configs:
        try:
            fn, args = op.operator_with_args(EigOperator.MdagM)
            cache = {}

            def run(r):
                return lanczos_hermitian_realpair(
                    fn, v0, n_ev=8, n_kr=nkr, re_im_axis=1, tol=1e-30,
                    max_restarts=r, which="SR", check_interval=100,
                    matvec_args=args, compile_cache=cache,
                    basis_dtype=bdt)

            t0 = time.perf_counter()
            run(2)                                    # compile + warm
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); run(2)
                t2 = time.perf_counter() - t0
                t0 = time.perf_counter(); run(8)
                t8 = time.perf_counter() - t0
                if t8 > t2:
                    best = min(best, (t8 - t2) / 6)
            res = run(4)
            print(f"{label:24s}: {best:6.3f} s/restart warm "
                  f"(compile+first {compile_s:.0f}s)  "
                  f"maxres {max(res.resids):.2e}", flush=True)
            results[label] = {
                "s_per_restart_warm": round(best, 3),
                "compile_and_first_s": round(compile_s, 1),
                "n_kr": nkr,
                "max_resid": float(max(res.resids)),
                "evals2": [float(v) for v in res.evals[:2]]}
        except Exception as e:
            print(f"{label:24s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            results[label] = f"failed: {type(e).__name__}"

    with open("/root/repo/artifacts/time_eig32.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote artifacts/time_eig32.json", flush=True)


if __name__ == "__main__":
    main()
