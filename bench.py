"""Headline benchmark: Wilson dslash site throughput on one TPU chip.

Runs the production rc (real-pair) dslash — this TPU backend has no complex
dtype support, so the rc path IS the production path (see rc/cplx.py).

The reference publishes no numbers (BASELINE.md); the agreed metric is
dslash site-throughput at the standard 1320 flop/site Wilson count.
``vs_baseline`` reports the fraction of the bandwidth-roofline
("speed of light") estimate for this chip: the dslash moves ~768 bytes/site
at f32-pair complex assuming perfect fusion (read psi once + 8 links +
write out: 2*96 + 8*72 bytes), so SOL = HBM_BW/768 * 1320; v5e HBM ~819 GB/s
-> ~1408 GFLOP/s.

Timing notes for the tunnelled backend: ``block_until_ready`` does NOT
actually block here — completion is forced by an f32 scalar readback that
depends on the result — and each sync pays a ~tens-of-ms round trip, removed
by differencing two chain lengths.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

DIMS = (16, 16, 16, 32)          # Lx, Ly, Lz, Lt
FLOP_PER_SITE = 1320             # standard Wilson dslash count
BYTES_PER_SITE = 2 * 96 + 8 * 72   # psi + out + links, f32 re/im pairs
V5E_HBM_GBS = 819.0

_SUM = None


def _force(x):
    """Force completion via a data-dependent f32 scalar readback."""
    global _SUM
    if _SUM is None:
        _SUM = jax.jit(lambda a: jnp.sum(a * a))
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
    from mugiq_tpu.rc.host import gauge_rc, spinor_rc
    import mugiq_tpu.pallas.dslash_kernel as dk

    # all complex-valued setup on host (device complex arrays are
    # unsupported here); only f32 arrays ever reach the chip
    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=1)
    psi_rc = spinor_rc(geom, seed=0)
    # rc [...,2] -> planar -> pallas kernel layout
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    psi_pl = jnp.transpose(psi_rc, (6, 4, 5, 0, 1, 2, 3))
    U_k = dk.to_kernel_gauge(U_pl)
    Ut_k = U_k[:, 3]
    psi_k = dk.to_kernel_spinor(psi_pl)
    Y = DIMS[1]

    f = jax.jit(lambda U, p: dk.dslash_hop_pallas(p, U, Ut_k, Y=Y))
    _force(f(U_k, psi_k))              # compile + warm up
    print("bench: compiled, timing...", file=sys.stderr)

    n1, n2 = 10, 60
    per_op = float("inf")
    for _ in range(3):
        t1 = _time_chain(f, U_k, psi_k, n1)
        t2 = _time_chain(f, U_k, psi_k, n2)
        per_op = min(per_op, (t2 - t1) / (n2 - n1))

    vol = geom.volume
    gflops = FLOP_PER_SITE * vol / per_op / 1e9
    sol = V5E_HBM_GBS * 1e9 / BYTES_PER_SITE * FLOP_PER_SITE / 1e9
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
