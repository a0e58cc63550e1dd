"""t-blocked pallas dslash with manual DMA — amortises the halo refetch.

The BlockSpec-pipelined kernel (dslash_kernel.py) fetches 3 full psi slices
per output slice (t-1, t, t+1): 3x the minimum spinor traffic.  Blocking bt
output slices per grid step cuts that to (bt+2)/bt, but overlapping halo
windows are not expressible with BlockSpec index maps (block offsets are
multiples of the block shape) — so this kernel takes the inputs as HBM refs
and DMAs the [i*bt, i*bt + bt + 2) window into VMEM scratch itself.

Inputs are t-extended on the host side of the jit (one cheap concat):
    psi_ext [T+2, 24, Z, YX] with psi_ext[0] = psi[T-1], psi_ext[T+1] = psi[0]
    U_loc   [T, 4, 18, Z, YX]
    Ut_sh   [T, 18, Z, YX]   (U_t at t-1: rolled by one slice)
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dslash_kernel import make_slice_compute, pallas_call_auto


def _make_blocked_kernel(Z, Y, X, bt):
    compute = make_slice_compute(Z, Y, X)

    def kernel(psi_hbm, u_hbm, ut_hbm, out_ref, psi_win, u_win, ut_win, sems):
        i = pl.program_id(0)
        t0 = i * bt
        cps = [
            pltpu.make_async_copy(psi_hbm.at[pl.ds(t0, bt + 2)], psi_win,
                                  sems.at[0]),
            pltpu.make_async_copy(u_hbm.at[pl.ds(t0, bt)], u_win, sems.at[1]),
            pltpu.make_async_copy(ut_hbm.at[pl.ds(t0, bt)], ut_win,
                                  sems.at[2]),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        for j in range(bt):
            def pref(off, jj=j):
                return lambda s, c, r: psi_win[jj + off, r * 12 + s * 3 + c]

            def write(s, c, ar, ai, jj=j):
                out_ref[jj, s * 3 + c] = ar
                out_ref[jj, 12 + s * 3 + c] = ai

            compute(pref(0), pref(1), pref(2),
                    lambda mu, a, b, r, jj=j: u_win[jj, mu, r * 9 + a * 3 + b],
                    lambda a, b, r, jj=j: ut_win[jj, r * 9 + a * 3 + b],
                    write)

    return kernel


def _make_db_kernel(Z, Y, X, bt):
    """Hybrid double-buffered kernel: psi halo windows via 2-slot manual DMA
    (overlapped with compute), links via auto-pipelined BlockSpecs.

    EXPERIMENTAL: at 16^3 local volume the combined VMEM footprint (2-slot
    psi windows + pallas-double-buffered link blocks + output) exceeds the
    16 MB VMEM by ~0.5 MB at bt=2 — needs z-split windows or shallower link
    pipelining before it can run at that size; smaller local volumes work."""
    compute = make_slice_compute(Z, Y, X)

    def kernel(psi_hbm, u_ref, ut_ref, out_ref, psi_win, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        def dma(idx, sl):
            return pltpu.make_async_copy(
                psi_hbm.at[pl.ds(idx * bt, bt + 2)], psi_win.at[sl],
                sems.at[sl])

        @pl.when(i == 0)
        def _():
            dma(0, slot).start()

        @pl.when(i + 1 < n)
        def _():
            dma(i + 1, nslot).start()

        dma(i, slot).wait()

        for j in range(bt):
            def pref(off, jj=j):
                return lambda s, c, r: psi_win[slot, jj + off,
                                               r * 12 + s * 3 + c]

            def write(s, c, ar, ai, jj=j):
                out_ref[jj, s * 3 + c] = ar
                out_ref[jj, 12 + s * 3 + c] = ai

            compute(pref(0), pref(1), pref(2),
                    lambda mu, a, b, r, jj=j: u_ref[jj, mu, r * 9 + a * 3 + b],
                    lambda a, b, r, jj=j: ut_ref[jj, r * 9 + a * 3 + b],
                    write)

    return kernel


@partial(jax.jit, static_argnames=("Y", "bt"))
def dslash_hop_pallas_db(psi_k: jnp.ndarray, U_k: jnp.ndarray,
                         Ut_k: jnp.ndarray, Y: int, bt: int = 2
                         ) -> jnp.ndarray:
    """Hopping term, double-buffered psi windows (periodic torus)."""
    T, _, Z, YX = psi_k.shape
    assert T % bt == 0, (T, bt)
    X = YX // Y

    psi_ext = jnp.concatenate([psi_k[-1:], psi_k, psi_k[:1]], axis=0)
    ut_shift = jnp.roll(Ut_k, 1, axis=0)

    kernel = _make_db_kernel(Z, Y, X, bt)
    return pallas_call_auto(
        kernel,
        grid=(T // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bt, 4, 18, Z, YX), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 18, Z, YX), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 24, Z, YX), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(psi_k.shape, psi_k.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bt + 2, 24, Z, YX), psi_k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(psi_ext, U_k, ut_shift)


@partial(jax.jit, static_argnames=("Y", "bt"))
def dslash_hop_pallas_blocked(psi_k: jnp.ndarray, U_k: jnp.ndarray,
                              Ut_k: jnp.ndarray, Y: int, bt: int = 2
                              ) -> jnp.ndarray:
    """Hopping term on kernel-layout arrays (t-blocked, periodic torus)."""
    T, _, Z, YX = psi_k.shape
    assert T % bt == 0, (T, bt)
    X = YX // Y

    psi_ext = jnp.concatenate([psi_k[-1:], psi_k, psi_k[:1]], axis=0)
    ut_shift = jnp.roll(Ut_k, 1, axis=0)      # Ut_sh[i] = U_t(i-1)

    kernel = _make_blocked_kernel(Z, Y, X, bt)
    grid = (T // bt,)

    return pallas_call_auto(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bt, 24, Z, YX), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(psi_k.shape, psi_k.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt + 2, 24, Z, YX), psi_k.dtype),
            pltpu.VMEM((bt, 4, 18, Z, YX), U_k.dtype),
            pltpu.VMEM((bt, 18, Z, YX), Ut_k.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(psi_ext, U_k, ut_shift)
