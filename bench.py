"""Headline benchmark: Wilson dslash site throughput on one TPU chip.

The reference publishes no numbers (BASELINE.md); the agreed metric is
dslash site-throughput at the standard 1320 flop/site Wilson count.
``vs_baseline`` reports the fraction of the bandwidth-roofline
("speed of light") estimate for this chip: the dslash moves ~768 bytes/site
at complex64 assuming perfect fusion (read psi once + 8 links + write out:
2*96 + 8*72), so SOL = HBM_BW / 768 * 1320 flops; v5e HBM ~ 819 GB/s
-> ~1408 GFLOP/s.

Timing notes: this environment tunnels to the TPU, so (a)
``block_until_ready`` does NOT actually block — completion is forced by a
scalar readback that depends on the result; (b) each sync pays a ~tens-of-ms
round trip — removed by differencing two chain lengths.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

DIMS = (16, 16, 16, 32)          # Lx, Ly, Lz, Lt
FLOP_PER_SITE = 1320             # standard Wilson dslash count
BYTES_PER_SITE_C64 = 2 * 96 + 8 * 72   # psi + out + links, complex64, fused
V5E_HBM_GBS = 819.0


_SUM = None


def _force(x):
    """Force completion via a data-dependent scalar readback.

    A jitted |x|^2 reduction to an f32 scalar — scalar slices / complex
    transfers hit UNIMPLEMENTED paths on the tunnelled backend."""
    global _SUM
    if _SUM is None:
        _SUM = jax.jit(lambda a: jnp.sum(jnp.abs(a) ** 2))
    return float(_SUM(x))


def _time_chain(f, U, psi, n):
    t0 = time.perf_counter()
    o = psi
    for _ in range(n):
        o = f(U, o)
    _force(o)
    return time.perf_counter() - t0


def main():
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu import fields
    from mugiq_tpu.ops.dslash import dslash_hop

    geom = LatticeGeometry(DIMS)
    dtype = jnp.complex64
    U = fields.apply_boundary_phase(fields.random_gauge(geom, seed=1, dtype=dtype))
    psi = fields.random_spinor(geom, seed=0, dtype=dtype)

    f = jax.jit(dslash_hop)
    _force(f(U, psi))            # compile + warm up

    n1, n2 = 10, 60
    per_op = float("inf")
    for _ in range(3):
        t1 = _time_chain(f, U, psi, n1)
        t2 = _time_chain(f, U, psi, n2)
        per_op = min(per_op, (t2 - t1) / (n2 - n1))

    vol = geom.volume
    gflops = FLOP_PER_SITE * vol / per_op / 1e9
    sol = V5E_HBM_GBS * 1e9 / BYTES_PER_SITE_C64 * FLOP_PER_SITE / 1e9
    print(f"dslash: {per_op*1e6:.1f} us/apply on {DIMS} "
          f"({vol} sites), SOL={sol:.0f} GFLOP/s", file=sys.stderr)
    print(json.dumps({
        "metric": "wilson_dslash_throughput",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / sol, 4),
    }))


if __name__ == "__main__":
    main()
