"""t-windowed pallas dslash: modular-index manual DMA, no host concat.

The round-1 blocked kernel (dslash_block_kernel.py) cut the 3x psi refetch
to (bt+2)/bt but paid for it with a host-side t-extension
``jnp.concatenate`` — a full extra psi read+write per application (psi
changes every apply, so it cannot be hoisted).  This kernel removes that:
the t-window [t0-1, t0+bt] is assembled inside the kernel from THREE manual
DMAs with modular row indices ((t0-1)%T, t0..t0+bt-1, (t0+bt)%T), which
BlockSpec index maps cannot express (offsets are block-granular).

Traffic per site per application (f32, bt=4):
    psi (bt+2)/bt x 96 + out 96 + links 360  = 600 B   (base kernel: 936 B)

The psi window is 2-slot double-buffered (next block's three segment DMAs
start before this block's compute).  Links ride the normal BlockSpec
pipeline; the one extra backward-t link row (U_t at t0-1, needed only by
the first slice of the block) is a fourth modular DMA.

Optionally the inputs may be bf16 (QUDA's half-precision analog — the
reference menu includes QUDA_HALF_PRECISION everywhere); tiles are upcast
to f32 immediately after load, all arithmetic is f32, and the output is
written in f32.  bf16 links halve the dominant traffic term.

Reference semantics: the same Wilson hopping term as
/root/reference/lib/mugiq_displace_kernels.cu's neighbour machinery +
QUDA's dslash (SURVEY.md §2.3); ghosts are unnecessary on a single chip
(periodic modular DMA) and ppermute halos replace them multi-chip.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dslash_kernel import (make_gl_compute, make_slice_compute,
                            pallas_call_auto)


def _make_win_kernel(Z, Y, X, bt, T, kappa=None, clover=False,
                     dagger=False, out_dtype=jnp.float32, gl_by=None):
    """out = hop(psi)               (kappa is None)
       out = A psi - kappa hop(psi) (kappa set; A=1 unless clover)

    Refs: psi_hbm [T,24,Z,YX] (ANY), ut_hbm [T,18,Z,YX] (ANY),
          u_ref [bt,4,18,Z,YX] (VMEM blocked), (A_ref [bt,144,Z,YX] VMEM),
          out_ref [bt,24,Z,YX] (VMEM blocked);
    scratch: psi_win [2, bt+2, 24, Z, YX], utm_win [2, 1, 18, Z, YX],
             sems [2, 4].

    gl_by: grouped-lane tiling (the [Z, YX] slice views as
    [Z*NBy, gl_by*X]; see dslash_kernel.make_gl_compute) — required above
    the ~256-lane compile wall.  The window DMA logic is layout-agnostic
    (whole t rows); only the stencil body changes.
    """
    if gl_by:
        compute = make_gl_compute(Z, Y // gl_by, gl_by, X, dagger=dagger)
    else:
        compute = make_slice_compute(Z, Y, X, dagger=dagger)
    f32 = jnp.float32

    def kernel(psi_hbm, ut_hbm, *rest):
        if clover:
            u_ref, a_ref, out_ref, psi_win, utm_win, sems = rest
        else:
            u_ref, out_ref, psi_win, utm_win, sems = rest
            a_ref = None
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dmas(idx, sl):
            t0 = idx * bt
            tm = (t0 - 1 + T) % T
            tp = (t0 + bt) % T
            return [
                pltpu.make_async_copy(psi_hbm.at[pl.ds(tm, 1)],
                                      psi_win.at[sl, pl.ds(0, 1)],
                                      sems.at[sl, 0]),
                pltpu.make_async_copy(psi_hbm.at[pl.ds(t0, bt)],
                                      psi_win.at[sl, pl.ds(1, bt)],
                                      sems.at[sl, 1]),
                pltpu.make_async_copy(psi_hbm.at[pl.ds(tp, 1)],
                                      psi_win.at[sl, pl.ds(bt + 1, 1)],
                                      sems.at[sl, 2]),
                pltpu.make_async_copy(ut_hbm.at[pl.ds(tm, 1)],
                                      utm_win.at[sl],
                                      sems.at[sl, 3]),
            ]

        slot = i % 2
        nslot = (i + 1) % 2

        @pl.when(i == 0)
        def _():
            for cp in dmas(0, 0):
                cp.start()

        @pl.when(i + 1 < n)
        def _():
            for cp in dmas(i + 1, nslot):
                cp.start()

        for cp in dmas(i, slot):
            cp.wait()

        for j in range(bt):
            def pref(off, jj=j):
                return lambda s, c, r: psi_win[
                    slot, jj + off, r * 12 + s * 3 + c].astype(f32)

            def ulink(mu, a, b, r, jj=j):
                return u_ref[jj, mu, r * 9 + a * 3 + b].astype(f32)

            def utm(a, b, r, jj=j):
                # U_t(t_j - 1): row t0-1 for j=0 (the modular DMA window),
                # row j-1 of the in-block link window otherwise.
                if jj == 0:
                    return utm_win[slot, 0, r * 9 + a * 3 + b].astype(f32)
                return u_ref[jj - 1, 3, r * 9 + a * 3 + b].astype(f32)

            if kappa is None:
                def write(s, c, ar, ai, jj=j):
                    out_ref[jj, s * 3 + c] = ar.astype(out_dtype)
                    out_ref[jj, 12 + s * 3 + c] = ai.astype(out_dtype)

                compute(pref(0), pref(1), pref(2), ulink, utm, write)
            else:
                hop = {}

                def write(s, c, ar, ai):
                    hop[(s, c)] = (ar, ai)

                compute(pref(0), pref(1), pref(2), ulink, utm, write)
                pc = pref(1)
                for s in range(4):
                    for c in range(3):
                        hr, hi = hop[(s, c)]
                        if a_ref is None:
                            dr, di = pc(s, c, 0), pc(s, c, 1)
                        else:
                            chi, k = s // 2, (s % 2) * 3 + c
                            dr = di = None
                            for jb in range(6):
                                sj, cj = 2 * chi + jb // 3, jb % 3
                                ar_ = a_ref[j, ((chi * 6 + k) * 6 + jb) * 2
                                            + 0].astype(f32)
                                ai_ = a_ref[j, ((chi * 6 + k) * 6 + jb) * 2
                                            + 1].astype(f32)
                                vr, vi = pc(sj, cj, 0), pc(sj, cj, 1)
                                tr = ar_ * vr - ai_ * vi
                                ti = ar_ * vi + ai_ * vr
                                dr = tr if dr is None else dr + tr
                                di = ti if di is None else di + ti
                        out_ref[j, s * 3 + c] = (
                            dr - kappa * hr).astype(out_dtype)
                        out_ref[j, 12 + s * 3 + c] = (
                            di - kappa * hi).astype(out_dtype)

    return kernel


def _win_call(psi_k, U_k, Ut_k, A144, Y, bt, kappa, clover, dagger,
              out_dtype, gl_by=None):
    T, _, Z, YX = psi_k.shape
    assert T % bt == 0, (T, bt)
    X = YX // Y
    kernel = _make_win_kernel(Z, Y, X, bt, T, kappa=kappa, clover=clover,
                              dagger=dagger, out_dtype=out_dtype,
                              gl_by=gl_by)
    if gl_by:
        assert Y % gl_by == 0, (Y, gl_by)
        S, L = Z * (Y // gl_by), gl_by * X
    else:
        S, L = Z, YX
    rs = lambda a: a.reshape(a.shape[:-2] + (S, L))
    psi_g, U_g, Ut_g = rs(psi_k), rs(U_k), rs(Ut_k)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),         # psi
        pl.BlockSpec(memory_space=pl.ANY),         # Ut (for the t0-1 row)
        pl.BlockSpec((bt, 4, 18, S, L), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),     # U window
    ]
    args = [psi_g, Ut_g, U_g]
    if clover:
        in_specs.append(pl.BlockSpec((bt, 144, S, L),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(rs(A144))
    out = pallas_call_auto(
        kernel,
        grid=(T // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, 24, S, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 24, S, L), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bt + 2, 24, S, L), psi_k.dtype),
            pltpu.VMEM((2, 1, 18, S, L), U_k.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(*args)
    return out.reshape(psi_k.shape)


@partial(jax.jit, static_argnames=("Y", "bt", "dagger", "out_dtype",
                                   "gl_by"))
def dslash_hop_pallas_win(psi_k, U_k, Ut_k, Y: int, bt: int = 4,
                          dagger: bool = False, out_dtype=None,
                          gl_by: int = None):
    """Hopping term, t-windowed modular-DMA kernel (periodic torus).

    psi_k [T,24,Z,YX]; U_k [T,4,18,Z,YX]; Ut_k [T,18,Z,YX] = U_k[:,3].
    Inputs may be bf16 (upcast in-kernel, f32 arithmetic); output dtype is
    f32 unless out_dtype is given (e.g. bf16 for an all-bf16 pipeline).
    gl_by: grouped-lane tiling for large volumes (see _make_win_kernel).
    """
    return _win_call(psi_k, U_k, Ut_k, None, Y, bt, None, False, dagger,
                     out_dtype or jnp.float32, gl_by=gl_by)


@partial(jax.jit, static_argnames=("Y", "bt", "kappa", "dagger",
                                   "has_clover", "gl_by"))
def wilson_m_pallas_win(psi_k, U_k, Ut_k, A144, Y: int, kappa: float,
                        bt: int = 4, dagger: bool = False,
                        has_clover: bool = False, gl_by: int = None):
    """Fused M(dag): A psi - kappa hop, t-windowed kernel.  A144
    [T,144,Z,YX] packed chiral clover blocks (ignored unless has_clover)."""
    return _win_call(psi_k, U_k, Ut_k, A144 if has_clover else None, Y, bt,
                     kappa, has_clover, dagger, jnp.float32, gl_by=gl_by)
