"""Headline benchmark: Wilson dslash site throughput on one TPU chip.

The reference publishes no numbers (BASELINE.md); the agreed metric is
dslash site-throughput at the standard 1320 flop/site Wilson count.
``vs_baseline`` reports the fraction of the bandwidth-roofline
("speed of light") estimate for this chip: the dslash moves ~1440 bytes/site
at complex64 (8 neighbour spinors + result + 8 links), so
SOL = HBM_BW / 1440 * 1320 flops.  v5e HBM ~ 819 GB/s -> ~751 GFLOP/s.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

DIMS = (16, 16, 16, 32)          # Lx, Ly, Lz, Lt
FLOP_PER_SITE = 1320             # standard Wilson dslash count
BYTES_PER_SITE_C64 = 9 * 96 + 8 * 72   # spinors + links, complex64
V5E_HBM_GBS = 819.0


def main():
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu import fields
    from mugiq_tpu.ops.dslash import dslash_hop

    geom = LatticeGeometry(DIMS)
    dtype = jnp.complex64
    U = fields.apply_boundary_phase(fields.unit_gauge(geom, dtype=dtype))
    psi = fields.random_spinor(geom, seed=0, dtype=dtype)

    f = jax.jit(dslash_hop)
    out = f(U, psi)
    jax.block_until_ready(out)   # compile + warm up

    n_inner = 20
    reps = 5
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = psi
        for _ in range(n_inner):
            o = f(U, o)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n_inner
        best = min(best, dt)

    vol = geom.volume
    gflops = FLOP_PER_SITE * vol / best / 1e9
    sol = V5E_HBM_GBS * 1e9 / BYTES_PER_SITE_C64 * FLOP_PER_SITE / 1e9
    print(json.dumps({
        "metric": "wilson_dslash_throughput",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / sol, 4),
    }))


if __name__ == "__main__":
    main()
