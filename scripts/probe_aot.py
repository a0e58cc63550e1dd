"""Probe: does executable serialization work on the tunnelled TPU backend?

If `jax.experimental.serialize_executable` round-trips here, a disk cache
of compiled executables can kill the ~40 s cold-process trace+compile of
the 32^3x64 production call (VERDICT item 3).  Tests, in order:

  1. tiny jit: lower/compile/serialize/deserialize/execute;
  2. donated-arg executable (the Lanczos cycle pattern);
  3. a REAL production executable: the packed-Schur MdagM at 16^3x32,
     serialized, reloaded, numerically identical.

Prints PROBE-AOT lines; writes artifacts/probe_aot.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.serialize_executable import (serialize,
                                                       deserialize_and_load)

    print(f"backend: {jax.devices()}", flush=True)
    out = {}

    # 1. tiny
    try:
        f = jax.jit(lambda x: x * 2 + 1)
        t0 = time.perf_counter()
        comp = f.lower(jnp.ones((8, 128))).compile()
        t_c = time.perf_counter() - t0
        payload, in_tree, out_tree = serialize(comp)
        t0 = time.perf_counter()
        g = deserialize_and_load(payload, in_tree, out_tree)
        t_l = time.perf_counter() - t0
        r = np.asarray(g(jnp.ones((8, 128))))
        assert np.allclose(r, 3.0), r
        out["tiny"] = {"ok": True, "compile_s": round(t_c, 2),
                       "load_s": round(t_l, 2), "bytes": len(payload)}
        print(f"PROBE-AOT tiny ok compile={t_c:.2f}s load={t_l:.2f}s "
              f"{len(payload)} B", flush=True)
    except Exception as e:
        out["tiny"] = {"ok": False, "error": f"{type(e).__name__}: {e}"[:200]}
        print(f"PROBE-AOT tiny FAILED {type(e).__name__}: {e}", flush=True)

    # 2. donation
    if out["tiny"]["ok"]:
        try:
            f = jax.jit(lambda V, d: V.at[0].add(d), donate_argnums=(0,))
            comp = f.lower(jnp.zeros((16, 8, 128)), jnp.ones((8, 128))
                           ).compile()
            payload, in_tree, out_tree = serialize(comp)
            g = deserialize_and_load(payload, in_tree, out_tree)
            r = g(jnp.zeros((16, 8, 128)), jnp.ones((8, 128)))
            assert float(jnp.sum(r)) == 8 * 128
            out["donated"] = {"ok": True, "bytes": len(payload)}
            print("PROBE-AOT donated ok", flush=True)
        except Exception as e:
            out["donated"] = {"ok": False,
                              "error": f"{type(e).__name__}: {e}"[:200]}
            print(f"PROBE-AOT donated FAILED {type(e).__name__}: {e}",
                  flush=True)

    # 3. real production executable (16^3x32 packed Schur MdagM)
    if out["tiny"]["ok"]:
        try:
            from mugiq_tpu import fields
            from mugiq_tpu.lattice import LatticeGeometry
            from mugiq_tpu.params import (DslashType, EigOperator,
                                          GaugeParam, InvertParam)
            from mugiq_tpu.production import build_packed_schur

            geom = LatticeGeometry((16, 16, 16, 32))
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                U = np.asarray(fields.random_gauge(geom, seed=1,
                                                   dtype=jnp.complex64))
            gp = GaugeParam(dims=geom.dims)
            ip = InvertParam(dslash_type=DslashType.WILSON, kappa=0.12)
            op = build_packed_schur(U, gp, ip)
            fn, args = op.operator_with_args(EigOperator.MdagM)
            rng = np.random.default_rng(3)
            v0 = jnp.asarray(rng.standard_normal(op.field_shape),
                             dtype=jnp.float32)
            jf = jax.jit(fn)
            t0 = time.perf_counter()
            comp = jf.lower(v0, *args).compile()
            t_c = time.perf_counter() - t0
            ref = np.asarray(comp(v0, *args))
            t0 = time.perf_counter()
            payload, in_tree, out_tree = serialize(comp)
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            g = deserialize_and_load(payload, in_tree, out_tree)
            t_l = time.perf_counter() - t0
            got = np.asarray(g(v0, *args))
            assert np.allclose(got, ref, atol=1e-6), np.abs(got - ref).max()
            out["schur16"] = {"ok": True, "compile_s": round(t_c, 1),
                              "serialize_s": round(t_s, 2),
                              "load_s": round(t_l, 2),
                              "bytes": len(payload)}
            print(f"PROBE-AOT schur16 ok compile={t_c:.1f}s "
                  f"load={t_l:.2f}s payload={len(payload)/1e6:.1f} MB",
                  flush=True)
        except Exception as e:
            out["schur16"] = {"ok": False,
                              "error": f"{type(e).__name__}: {e}"[:300]}
            print(f"PROBE-AOT schur16 FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    with open("/root/repo/artifacts/probe_aot.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/probe_aot.json", flush=True)


if __name__ == "__main__":
    main()
