"""Converged, deflation-grade 32^3x64 eigensolve on the real chip.

The committed flagship numbers so far are loose-tolerance capped runs
(max residual ~1e-2).  This run drives the packed even-odd Schur
operator (f32 links, f32 Krylov basis) to residual <= 1e-5 with
Chebyshev acceleration — the reference's correctness currency
(eigsolve_mugiq.cpp:289-315 residuals printed to 16 digits).

Protocol:
  1. plain TRLM pre-run (few restarts) -> Ritz estimates for the low end
     + power-iteration spectral edge -> Chebyshev window [a_min, a_max];
  2. Chebyshev-accelerated TRLM, re-run from scratch at increasing
     max_restarts (shared compile_cache; warm restarts ~0.5 s) and after
     each call measure TRUE residuals ||A v - lambda v|| of the
     unscaled pc MdagM on unit-norm evecs;
  3. stop at max_resid <= 1e-5 (or a plateau), commit the curve.

Writes artifacts/eig32_converged.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)
N_EV = 24
N_KR = 48
N_KEEP = 32          # restart-rotate temps are 2*k fields; nKr=80 OOMed
POLY_DEG = 12       # keep p_max/p_target ~< 1e2: the subspace floor is
                    # eps_f32 x (boost dynamic range); deg=32 floored at
                    # 4e-3 (e^12 range), deg=12 floors ~6e-6, and the
                    # per-MATVEC convergence rate is degree-independent
TARGET = 1e-5


def main():
    import jax
    import jax.numpy as jnp
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.params import (DslashType, EigOperator, GaugeParam,
                                  InvertParam)
    from mugiq_tpu.production import build_packed_schur
    from mugiq_tpu.planar.lanczos import (lanczos_hermitian_realpair,
                                      rayleigh_ritz_refine)
    from mugiq_tpu.eig.lanczos import chebyshev_op, estimate_spectral_edge
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
    op = build_packed_schur(U, gp, ip, precision="f32")
    fn, args = op.operator_with_args(EigOperator.MdagM)

    rng = np.random.default_rng(7)
    v0 = jnp.asarray(rng.standard_normal(op.field_shape), dtype=jnp.float32)

    # --- stage 1: window estimation -------------------------------------
    t0 = time.perf_counter()
    edge = estimate_spectral_edge(fn, v0, matvec_args=args)
    print(f"spectral edge est: {edge:.4f} ({time.perf_counter()-t0:.1f} s)",
          flush=True)

    pre_cache = {}
    t0 = time.perf_counter()
    pre = lanczos_hermitian_realpair(
        fn, v0, n_ev=N_EV + 8, n_kr=N_KR, re_im_axis=1, tol=1e-30,
        max_restarts=6, which="SR", check_interval=100, n_keep=N_KEEP + 4,
        matvec_args=args, compile_cache=pre_cache)
    print(f"pre-run: {time.perf_counter()-t0:.1f} s  "
          f"theta[0]={pre.evals[0]:.6f} theta[{N_EV-1}]={pre.evals[N_EV-1]:.6f} "
          f"theta[{N_EV+7}]={pre.evals[N_EV+7]:.6f}", flush=True)
    # a_min in the middle of the [theta_24, theta_32] band: high enough
    # that few unwanted modes compete for the nKr=48 basis, low enough
    # that the boundary target keeps a real boost
    a_min = 0.5 * (float(pre.evals[N_EV - 1]) + float(pre.evals[N_EV + 7]))
    a_max = float(edge)
    print(f"chebyshev window: deg={POLY_DEG} [{a_min:.4f}, {a_max:.4f}]",
          flush=True)
    del pre, pre_cache
    import gc
    gc.collect()

    def memstats(tag):
        try:
            st = jax.devices()[0].memory_stats()
            print(f"[{tag}] hbm in_use "
                  f"{st.get('bytes_in_use', 0)/2**30:.2f} GiB", flush=True)
        except Exception:
            pass

    memstats("after-pre")

    # --- true-residual check (unscaled pc MdagM, unit-norm evec) --------
    @jax.jit
    def rayleigh(v, *a):
        v = v / jnp.sqrt(jnp.sum(v * v))
        w = fn(v, *a)
        lam = jnp.sum(v * w)
        r = jnp.sqrt(jnp.sum((lam * v - w) ** 2))
        return lam, r

    def true_resids(evecs):
        lams, rs = [], []
        for i in range(evecs.shape[0]):
            lam, r = rayleigh(evecs[i], *args)
            lams.append(float(lam))
            rs.append(float(r))
        return np.asarray(lams), np.asarray(rs)

    # --- stage 2: Chebyshev-accelerated solve to target -----------------
    cheb = chebyshev_op(fn, POLY_DEG, a_min, a_max)
    cache = {}
    curve = []
    final = None
    t_total0 = time.perf_counter()
    for r in (4, 8, 16, 32, 64):
        t0 = time.perf_counter()
        for attempt in range(3):
            try:
                res = lanczos_hermitian_realpair(
                    cheb, v0, n_ev=N_EV, n_kr=N_KR, re_im_axis=1, tol=1e-30,
                    max_restarts=r, which="LR", check_interval=100,
                    n_keep=N_KEEP, matvec_args=args, compile_cache=cache)
                break
            except Exception as e:
                if "RESOURCE_EXHAUSTED" not in str(e) or attempt == 2:
                    raise
                print(f"OOM attempt {attempt}: gc + retry", flush=True)
                gc.collect(); time.sleep(5); memstats("retry")
        dt = time.perf_counter() - t0
        lams0, rs0 = true_resids(res.evecs)
        mx0 = float(np.sort(rs0)[:N_EV].max())
        # second Rayleigh-Ritz pass on the ORIGINAL operator: the poly
        # solve floors at the cluster width (~4e-3 here); projecting A
        # onto the converged subspace resolves the clusters
        t1 = time.perf_counter()
        refined, lams, rs = rayleigh_ritz_refine(fn, res.evecs,
                                                 re_im_axis=1,
                                                 matvec_args=args)
        dt_ref = time.perf_counter() - t1
        refined = None
        mx = float(rs[:N_EV].max())
        curve.append({"restarts": r, "call_s": round(dt, 1),
                      "refine_s": round(dt_ref, 1),
                      "max_resid_preref": mx0,
                      "max_resid": mx, "med_resid": float(np.median(rs)),
                      "lam_min": float(lams[0])})
        print(f"restarts={r:3d}: call {dt:6.1f} s  raw {mx0:.3e} -> "
              f"refined max_resid {mx:.3e}  med {np.median(rs):.3e}  "
              f"lam_min {lams[0]:.6f} (refine {dt_ref:.1f} s)", flush=True)
        res = None          # drop the evec block before the next call
        final = (lams, rs, r, dt)
        if mx <= TARGET:
            break
        if len(curve) >= 2:
            dr = curve[-1]["restarts"] - curve[-2]["restarts"]
            if curve[-1]["max_resid"] > curve[-2]["max_resid"] * 0.97 ** dr:
                print("plateau detected (<3%/restart), stopping", flush=True)
                break
    total_s = time.perf_counter() - t_total0

    lams, rs, r_fin, dt_fin = final
    scale = 0.25 / ip.kappa ** 2
    out = {
        "dims": list(DIMS), "operator": "packed even-odd Schur MdagM",
        "precision": "f32 links, f32 basis", "n_ev": N_EV, "n_kr": N_KR, "n_keep": N_KEEP,
        "chebyshev": {"deg": POLY_DEG, "a_min": round(a_min, 4),
                      "a_max": round(a_max, 4)},
        "target_resid": TARGET,
        "achieved_max_resid": float(rs[:N_EV].max()),
        "converged": bool(rs[:N_EV].max() <= TARGET),
        "restarts_to_converge": r_fin,
        "wallclock_final_call_s": round(dt_fin, 1),
        "wallclock_curve_total_s": round(total_s, 1),
        "evals_pc": [float(v) for v in lams[:N_EV]],
        "evals_mass_normalized": [float(v * scale) for v in lams[:N_EV]],
        "resids": [float(v) for v in rs[:N_EV]],
        "curve": curve,
        "hardware": "1x TPU v5e (tunnelled)",
    }
    with open("/root/repo/artifacts/eig32_converged.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/eig32_converged.json", flush=True)
    print(f"FINAL: max_resid={out['achieved_max_resid']:.3e} "
          f"restarts={r_fin} final_call={dt_fin:.1f}s", flush=True)


if __name__ == "__main__":
    main()
