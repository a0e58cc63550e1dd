"""Multi-chip pallas dslash: shard_map + explicit ppermute halo exchange.

The XLA path (jnp.roll on sharded arrays) gets its halos from
compiler-inserted collective-permutes; the pallas kernel is a black box to
the propagation pass, so here the halo exchange is explicit, exactly the
reference's ghost-zone pattern (SURVEY.md §2.4 items 1-2) in TPU form:

* lattice sharded over t on a 1D mesh axis 't' (the reference's common
  --gridsize 1 1 1 N layout);
* each device ppermutes its boundary time slice to the neighbour over ICI
  (one slice per direction, 24*Z*YX floats);
* the local stencil runs the pallas kernel in "extended" mode (non-modular
  index maps over the halo-extended local array).

The halo transfer is issued before the kernel launch so XLA can overlap it
with whatever precedes; intra-kernel overlap (double-buffered DMA inside
the kernel) is a further optimisation.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..pallas.dslash_kernel import (_make_kernel, _make_m_kernel,
                                    pallas_call_auto)


@partial(jax.jit, static_argnames=("Y", "dagger"))
def dslash_hop_pallas_ext(psi_ext: jnp.ndarray, U_loc: jnp.ndarray,
                          Ut_shift: jnp.ndarray, Y: int,
                          dagger: bool = False) -> jnp.ndarray:
    """Local hopping term from a t-halo-extended spinor.

    psi_ext [T_loc+2, 24, Z, YX] (rows 0 and -1 are the received halos);
    U_loc [T_loc, 4, 18, Z, YX]; Ut_shift [T_loc, 18, Z, YX] with
    Ut_shift[i] = U_t(global t_i - 1).
    """
    Tl = U_loc.shape[0]
    _, _, Z, YX = psi_ext.shape
    X = YX // Y
    kernel = _make_kernel(Z, Y, X, dagger=dagger)

    spec_m = pl.BlockSpec((1, 24, Z, YX), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, 24, Z, YX), lambda i: (i + 1, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, 24, Z, YX), lambda i: (i + 2, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((1, 4, 18, Z, YX), lambda i: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_ut = pl.BlockSpec((1, 18, Z, YX), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    return pallas_call_auto(
        kernel,
        grid=(Tl,),
        in_specs=[spec_m, spec_c, spec_p, spec_u, spec_ut],
        out_specs=pl.BlockSpec((1, 24, Z, YX), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tl, 24, Z, YX), psi_ext.dtype),
    )(psi_ext, psi_ext, psi_ext, U_loc, Ut_shift)


@partial(jax.jit, static_argnames=("Y", "dagger"))
def dslash_hop_pallas_ext2(psi_ext: jnp.ndarray, U_ext: jnp.ndarray,
                           Ut_ext: jnp.ndarray, Y: int,
                           dagger: bool = False) -> jnp.ndarray:
    """Local hopping term from a (t, z)-halo-extended spinor.

    psi_ext [T_loc+2, 24, Z_loc+2, YX]; U_ext [T_loc, 4, 18, Z_loc+2, YX]
    (real z-halos — backward-z hops read the halo link row);
    Ut_ext [T_loc, 18, Z_loc+2, YX] (z-halo rows unused, may be zero).
    """
    Tl = U_ext.shape[0]
    Zp = psi_ext.shape[2]
    Zl = Zp - 2
    YX = psi_ext.shape[3]
    X = YX // Y
    kernel = _make_kernel(Zl, Y, X, dagger=dagger, z_ext=True)

    spec_m = pl.BlockSpec((1, 24, Zp, YX), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, 24, Zp, YX), lambda i: (i + 1, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, 24, Zp, YX), lambda i: (i + 2, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((1, 4, 18, Zp, YX), lambda i: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_ut = pl.BlockSpec((1, 18, Zp, YX), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    return pallas_call_auto(
        kernel,
        grid=(Tl,),
        in_specs=[spec_m, spec_c, spec_p, spec_u, spec_ut],
        out_specs=pl.BlockSpec((1, 24, Zl, YX), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tl, 24, Zl, YX), psi_ext.dtype),
    )(psi_ext, psi_ext, psi_ext, U_ext, Ut_ext)


@partial(jax.jit, static_argnames=("Y", "kappa", "dagger", "has_clover"))
def wilson_m_pallas_ext(psi_ext: jnp.ndarray, U_loc: jnp.ndarray,
                        Ut_shift: jnp.ndarray, A144, Y: int, kappa: float,
                        dagger: bool = False,
                        has_clover: bool = False) -> jnp.ndarray:
    """Fused local M(dag) = A psi - kappa*hop from a t-halo-extended spinor
    (the sharded twin of dslash_kernel.wilson_m_pallas; clover applied
    in-kernel as chiral 6x6 VMEM blocks, A144 [T_loc, 144, Z, YX])."""
    Tl = U_loc.shape[0]
    _, _, Z, YX = psi_ext.shape
    X = YX // Y
    kernel = _make_m_kernel(Z, Y, X, kappa, dagger, has_clover)

    spec_m = pl.BlockSpec((1, 24, Z, YX), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, 24, Z, YX), lambda i: (i + 1, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, 24, Z, YX), lambda i: (i + 2, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((1, 4, 18, Z, YX), lambda i: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_ut = pl.BlockSpec((1, 18, Z, YX), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [spec_m, spec_c, spec_p, spec_u, spec_ut]
    args = [psi_ext, psi_ext, psi_ext, U_loc, Ut_shift]
    if has_clover:
        in_specs.append(pl.BlockSpec((1, 144, Z, YX), lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(A144)
    return pallas_call_auto(
        kernel,
        grid=(Tl,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 24, Z, YX), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tl, 24, Z, YX), psi_ext.dtype),
    )(*args)


@partial(jax.jit, static_argnames=("Y", "kappa", "dagger", "has_clover"))
def wilson_m_pallas_ext2(psi_ext: jnp.ndarray, U_ext: jnp.ndarray,
                         Ut_ext: jnp.ndarray, A144, Y: int, kappa: float,
                         dagger: bool = False,
                         has_clover: bool = False) -> jnp.ndarray:
    """Fused local M(dag) from a (t, z)-halo-extended spinor.  A144 carries
    interior z rows only ([T_loc, 144, Z_loc, YX] — the clover term is
    site-local, no halo needed)."""
    Tl = U_ext.shape[0]
    Zp = psi_ext.shape[2]
    Zl = Zp - 2
    YX = psi_ext.shape[3]
    X = YX // Y
    kernel = _make_m_kernel(Zl, Y, X, kappa, dagger, has_clover, z_ext=True)

    spec_m = pl.BlockSpec((1, 24, Zp, YX), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, 24, Zp, YX), lambda i: (i + 1, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, 24, Zp, YX), lambda i: (i + 2, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((1, 4, 18, Zp, YX), lambda i: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_ut = pl.BlockSpec((1, 18, Zp, YX), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [spec_m, spec_c, spec_p, spec_u, spec_ut]
    args = [psi_ext, psi_ext, psi_ext, U_ext, Ut_ext]
    if has_clover:
        in_specs.append(pl.BlockSpec((1, 144, Zl, YX),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(A144)
    return pallas_call_auto(
        kernel,
        grid=(Tl,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 24, Zl, YX), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tl, 24, Zl, YX), psi_ext.dtype),
    )(*args)


def _shard_map_kwargs():
    if shard_map.__module__.startswith("jax.experimental"):
        return {"check_rep": False}
    return {"check_vma": False}


@partial(jax.jit, static_argnames=("Y", "kappa", "dagger", "has_clover"))
def _pallas_ext3(psi_ext, U_ext, Ut_ext, A144, Y: int, kappa,
                 dagger: bool = False, has_clover: bool = False):
    """Local M(dag) (or hop, kappa=None) from a (t, z, y)-halo-extended
    spinor — the 3D-mesh local stencil.

    psi_ext [Tl+2, 24, Zl+2, (Yl+2)*X]; U_ext [Tl, 4, 18, Zl+2, (Yl+2)*X]
    (real z/y link halos); Ut_ext like psi's trailing dims, z/y halo rows
    zero; A144 interior only [Tl, 144, Zl, Yl*X].  Y here is the LOCAL
    interior y extent Yl."""
    from ..pallas.dslash_kernel import _make_kernel as mk
    from ..pallas.dslash_kernel import _make_m_kernel as mkm

    Tl = U_ext.shape[0]
    Zp = psi_ext.shape[2]
    Zl = Zp - 2
    YXp = psi_ext.shape[3]
    X = YXp // (Y + 2)
    YXl = Y * X
    if kappa is None:
        kernel = mk(Zl, Y, X, dagger=dagger, z_ext=True, y_ext=True)
    else:
        kernel = mkm(Zl, Y, X, kappa, dagger, has_clover, z_ext=True,
                     y_ext=True)

    def bs(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    in_specs = [
        bs((1, 24, Zp, YXp), lambda i: (i, 0, 0, 0)),
        bs((1, 24, Zp, YXp), lambda i: (i + 1, 0, 0, 0)),
        bs((1, 24, Zp, YXp), lambda i: (i + 2, 0, 0, 0)),
        bs((1, 4, 18, Zp, YXp), lambda i: (i, 0, 0, 0, 0)),
        bs((1, 18, Zp, YXp), lambda i: (i, 0, 0, 0)),
    ]
    args = [psi_ext, psi_ext, psi_ext, U_ext, Ut_ext]
    if kappa is not None and has_clover:
        in_specs.append(bs((1, 144, Zl, YXl), lambda i: (i, 0, 0, 0)))
        args.append(A144)
    return pallas_call_auto(
        kernel,
        grid=(Tl,),
        in_specs=in_specs,
        out_specs=bs((1, 24, Zl, YXl), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tl, 24, Zl, YXl), psi_ext.dtype),
    )(*args)


def make_sharded_wilson_3d(mesh: Mesh, Y: int, X: int, kappa,
                           dagger: bool = False, has_clover: bool = False):
    """M(dag) (or hop, kappa=None) over a 3D ('t', 'z', 'y') mesh — three
    of the reference's four partitioned dimensions
    (/root/reference/tests/eigensolve.cpp:683 --gridsize,
    /root/reference/include/contract_util.cuh:89 comm_dim_partitioned).

    Kernel arrays [T, 24, Z, Y*X] shard t on axis 0, z on axis 2 and the
    y-major fused axis on 'y' (contiguous (Y/ny)*X-lane chunks).  Halos:
    one X-lane y-row, one z-row, one t-slice per side (ppermuted in y -> z
    -> t order so corners ride the later exchanges).  Y/X are the GLOBAL
    y/x extents."""
    nt, nz, ny = mesh.shape["t"], mesh.shape["z"], mesh.shape["y"]
    t_fwd = [(i, (i + 1) % nt) for i in range(nt)]
    t_bwd = [(i, (i - 1) % nt) for i in range(nt)]
    z_fwd = [(i, (i + 1) % nz) for i in range(nz)]
    z_bwd = [(i, (i - 1) % nz) for i in range(nz)]
    y_fwd = [(i, (i + 1) % ny) for i in range(ny)]
    y_bwd = [(i, (i - 1) % ny) for i in range(ny)]
    Yl = Y // ny

    def ext(a, axis, width, name, fwd, bwd):
        n = a.shape[axis]
        last = jax.lax.slice_in_dim(a, n - width, n, axis=axis)
        first = jax.lax.slice_in_dim(a, 0, width, axis=axis)
        halo_prev = jax.lax.ppermute(last, name, perm=fwd)
        halo_next = jax.lax.ppermute(first, name, perm=bwd)
        return jnp.concatenate([halo_prev, a, halo_next], axis=axis)

    def body(psi_loc, U_loc, Ut_loc, A_loc):
        # y first (X lanes), then z (rows, carrying y-corners), then t
        psi_y = ext(psi_loc, 3, X, "y", y_fwd, y_bwd)
        psi_zy = ext(psi_y, 2, 1, "z", z_fwd, z_bwd)
        halo_prev = jax.lax.ppermute(psi_zy[-1:], "t", perm=t_fwd)
        halo_next = jax.lax.ppermute(psi_zy[:1], "t", perm=t_bwd)
        psi_ext = jnp.concatenate([halo_prev, psi_zy, halo_next], axis=0)

        U_y = ext(U_loc, 4, X, "y", y_fwd, y_bwd)
        U_ext = ext(U_y, 3, 1, "z", z_fwd, z_bwd)

        ut_prev = jax.lax.ppermute(Ut_loc[-1:], "t", perm=t_fwd)
        ut_shift = jnp.concatenate([ut_prev, Ut_loc[:-1]], axis=0)
        ut_ext = jnp.pad(ut_shift, ((0, 0), (0, 0), (1, 1), (X, X)))
        return _pallas_ext3(psi_ext, U_ext, ut_ext, A_loc, Y=Yl,
                            kappa=kappa, dagger=dagger,
                            has_clover=has_clover)

    spec = P("t", None, "z", "y")
    a_spec = (P("t", None, "z", "y") if (kappa is not None and has_clover)
              else P("t", None, None, None))
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(spec, P("t", None, None, "z", "y"), spec, a_spec),
        out_specs=spec,
        **_shard_map_kwargs(),
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# halo/compute overlap: interior t-slices have NO data dependence on the
# ppermuted halos, so splitting the local stencil into an interior pass
# (slices 1..Tl-2) and a 2-slice boundary pass lets XLA's latency-hiding
# scheduler run the ICI transfer concurrently with the interior compute —
# the reference's interior/boundary overlap in QUDA's dslash (SURVEY.md §7
# hard-part 3).  Bit-exact with the fused form: same per-site arithmetic.
# ---------------------------------------------------------------------------

def _m_interior_call(psi_loc, U_loc, Ut_loc, A144, Y, kappa, dagger,
                     has_clover, z_ext=False):
    """M(dag) on interior output slices 1..Tl-2 (reads psi_loc only).

    z_ext: arrays carry z-halo rows (2D mesh); the interior here is
    interior-in-t only — z-halo reads stay in this pass (the z exchange is
    cheap relative to the t-slice transfer and runs before both passes).
    Returns [Tl-2, 24, Z(_loc), YX]."""
    Tl = U_loc.shape[0]
    Zp = psi_loc.shape[2]
    Zl = Zp - 2 if z_ext else Zp
    YX = psi_loc.shape[3]
    X = YX // Y
    if kappa is None:
        kernel = _make_kernel(Zl, Y, X, dagger=dagger, z_ext=z_ext)
    else:
        kernel = _make_m_kernel(Zl, Y, X, kappa, dagger, has_clover,
                                z_ext=z_ext)

    def bs(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    in_specs = [
        bs((1, 24, Zp, YX), lambda i: (i, 0, 0, 0)),        # pm (t = i)
        bs((1, 24, Zp, YX), lambda i: (i + 1, 0, 0, 0)),    # pc
        bs((1, 24, Zp, YX), lambda i: (i + 2, 0, 0, 0)),    # pp
        bs((1, 4, 18, U_loc.shape[3], YX),
           lambda i: (i + 1, 0, 0, 0, 0)),                  # U at t
        bs((1, 18, Ut_loc.shape[2], YX), lambda i: (i, 0, 0, 0)),  # Ut(t-1)
    ]
    args = [psi_loc, psi_loc, psi_loc, U_loc, Ut_loc]
    if kappa is not None and has_clover:
        in_specs.append(bs((1, 144, Zl, YX), lambda i: (i + 1, 0, 0, 0)))
        args.append(A144)
    return pallas_call_auto(
        kernel,
        grid=(Tl - 2,),
        in_specs=in_specs,
        out_specs=bs((1, 24, Zl, YX), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tl - 2, 24, Zl, YX), psi_loc.dtype),
    )(*args)


def _m_boundary_call(psi_loc, halo_prev, halo_next, U_loc, Ut_loc, ut_prev,
                     A144, Y, kappa, dagger, has_clover, z_ext=False):
    """M(dag) on the two t-boundary output slices {0, Tl-1} (consumes the
    ppermuted halos).  Returns [2, 24, Z(_loc), YX]."""
    Tl = U_loc.shape[0]
    Zp = psi_loc.shape[2]
    Zl = Zp - 2 if z_ext else Zp
    YX = psi_loc.shape[3]
    X = YX // Y
    if kappa is None:
        kernel = _make_kernel(Zl, Y, X, dagger=dagger, z_ext=z_ext)
    else:
        kernel = _make_m_kernel(Zl, Y, X, kappa, dagger, has_clover,
                                z_ext=z_ext)

    # 6 rows: [halo_prev, p0, p1, p_{Tl-2}, p_{Tl-1}, halo_next]
    psi_bnd = jnp.concatenate(
        [halo_prev, psi_loc[:1], psi_loc[1:2],
         psi_loc[Tl - 2:Tl - 1], psi_loc[-1:], halo_next], axis=0)
    U_bnd = jnp.concatenate([U_loc[:1], U_loc[-1:]], axis=0)
    ut_bnd = jnp.concatenate([ut_prev, Ut_loc[Tl - 2:Tl - 1]], axis=0)

    def bs(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    in_specs = [
        bs((1, 24, Zp, YX), lambda j: (3 * j, 0, 0, 0)),
        bs((1, 24, Zp, YX), lambda j: (3 * j + 1, 0, 0, 0)),
        bs((1, 24, Zp, YX), lambda j: (3 * j + 2, 0, 0, 0)),
        bs((1, 4, 18, U_bnd.shape[3], YX), lambda j: (j, 0, 0, 0, 0)),
        bs((1, 18, ut_bnd.shape[2], YX), lambda j: (j, 0, 0, 0)),
    ]
    args = [psi_bnd, psi_bnd, psi_bnd, U_bnd, ut_bnd]
    if kappa is not None and has_clover:
        A_bnd = jnp.concatenate([A144[:1], A144[-1:]], axis=0)
        in_specs.append(bs((1, 144, Zl, YX), lambda j: (j, 0, 0, 0)))
        args.append(A_bnd)
    return pallas_call_auto(
        kernel,
        grid=(2,),
        in_specs=in_specs,
        out_specs=bs((1, 24, Zl, YX), lambda j: (j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 24, Zl, YX), psi_loc.dtype),
    )(*args)


def _overlap_apply(psi_loc, halo_prev, halo_next, U_loc, Ut_loc, ut_prev,
                   A144, Y, kappa, dagger, has_clover, z_ext=False):
    """Interior/boundary-split local M(dag) or hop (kappa=None)."""
    Tl = U_loc.shape[0]
    bnd = _m_boundary_call(psi_loc, halo_prev, halo_next, U_loc, Ut_loc,
                           ut_prev, A144, Y, kappa, dagger, has_clover,
                           z_ext=z_ext)
    if Tl <= 2:
        return bnd[:Tl]
    interior = _m_interior_call(psi_loc, U_loc, Ut_loc, A144, Y, kappa,
                                dagger, has_clover, z_ext=z_ext)
    return jnp.concatenate([bnd[:1], interior, bnd[1:]], axis=0)


def make_sharded_wilson_m(mesh: Mesh, Y: int, kappa: float,
                          dagger: bool = False, has_clover: bool = False,
                          overlap: bool = True):
    """Fused sharded M(dag)(psi_k, U_k, Ut_k, A144) over a 1D 't' mesh:
    ppermute halo exchange + pallas stencil (hop + clover diagonal + kappa
    combine all in-kernel).

    overlap=True (default): interior/boundary split so the halo transfer
    overlaps interior compute (see _overlap_apply); bit-exact with the
    fused single-pass form."""
    nt = mesh.shape["t"]
    fwd = [(i, (i + 1) % nt) for i in range(nt)]
    bwd = [(i, (i - 1) % nt) for i in range(nt)]

    def body(psi_loc, U_loc, Ut_loc, A_loc):
        halo_prev = jax.lax.ppermute(psi_loc[-1:], "t", perm=fwd)
        halo_next = jax.lax.ppermute(psi_loc[:1], "t", perm=bwd)
        ut_prev = jax.lax.ppermute(Ut_loc[-1:], "t", perm=fwd)
        if overlap and psi_loc.shape[0] >= 2:
            return _overlap_apply(psi_loc, halo_prev, halo_next, U_loc,
                                  Ut_loc, ut_prev, A_loc, Y, kappa, dagger,
                                  has_clover)
        psi_ext = jnp.concatenate([halo_prev, psi_loc, halo_next], axis=0)
        ut_shift = jnp.concatenate([ut_prev, Ut_loc[:-1]], axis=0)
        return wilson_m_pallas_ext(psi_ext, U_loc, ut_shift, A_loc, Y=Y,
                                   kappa=kappa, dagger=dagger,
                                   has_clover=has_clover)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P("t"), P("t"), P("t"), P("t")),
        out_specs=P("t"),
        **_shard_map_kwargs(),
    )
    return jax.jit(sharded)


def make_sharded_wilson_m_2d(mesh: Mesh, Y: int, kappa: float,
                             dagger: bool = False, has_clover: bool = False,
                             overlap: bool = True):
    """Fused sharded M(dag) over a 2D ('t', 'z') mesh (see
    make_sharded_wilson_m).

    overlap=True: the z exchange runs first (one row per side), then the
    t-slice transfer — the large message — overlaps the interior-in-t
    compute via the interior/boundary split."""
    nt = mesh.shape["t"]
    nz = mesh.shape["z"]
    t_fwd = [(i, (i + 1) % nt) for i in range(nt)]
    t_bwd = [(i, (i - 1) % nt) for i in range(nt)]
    z_fwd = [(i, (i + 1) % nz) for i in range(nz)]
    z_bwd = [(i, (i - 1) % nz) for i in range(nz)]

    def zext(a, axis):
        last = jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis],
                                    axis=axis)
        first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        halo_prev = jax.lax.ppermute(last, "z", perm=z_fwd)
        halo_next = jax.lax.ppermute(first, "z", perm=z_bwd)
        return jnp.concatenate([halo_prev, a, halo_next], axis=axis)

    def body(psi_loc, U_loc, Ut_loc, A_loc):
        if overlap and psi_loc.shape[0] >= 2:
            # z-exchange first; t-halos of the z-extended slices carry the
            # corner rows (same values as t-extend-then-z-exchange)
            psi_z = zext(psi_loc, axis=2)
            U_ext = zext(U_loc, axis=3)
            ut_pad = jnp.pad(Ut_loc, ((0, 0), (0, 0), (1, 1), (0, 0)))
            halo_prev = jax.lax.ppermute(psi_z[-1:], "t", perm=t_fwd)
            halo_next = jax.lax.ppermute(psi_z[:1], "t", perm=t_bwd)
            ut_prev = jax.lax.ppermute(ut_pad[-1:], "t", perm=t_fwd)
            return _overlap_apply(psi_z, halo_prev, halo_next, U_ext,
                                  ut_pad, ut_prev, A_loc, Y, kappa, dagger,
                                  has_clover, z_ext=True)
        halo_prev = jax.lax.ppermute(psi_loc[-1:], "t", perm=t_fwd)
        halo_next = jax.lax.ppermute(psi_loc[:1], "t", perm=t_bwd)
        psi_t = jnp.concatenate([halo_prev, psi_loc, halo_next], axis=0)
        psi_ext = zext(psi_t, axis=2)
        U_ext = zext(U_loc, axis=3)
        ut_prev = jax.lax.ppermute(Ut_loc[-1:], "t", perm=t_fwd)
        ut_shift = jnp.concatenate([ut_prev, Ut_loc[:-1]], axis=0)
        ut_ext = jnp.pad(ut_shift, ((0, 0), (0, 0), (1, 1), (0, 0)))
        return wilson_m_pallas_ext2(psi_ext, U_ext, ut_ext, A_loc, Y=Y,
                                    kappa=kappa, dagger=dagger,
                                    has_clover=has_clover)

    spec = P("t", None, "z", None)
    a_spec = (P("t", None, "z", None) if has_clover
              else P("t", None, None, None))
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(spec, P("t", None, None, "z", None), spec, a_spec),
        out_specs=spec,
        **_shard_map_kwargs(),
    )
    return jax.jit(sharded)


def make_sharded_dslash_2d(mesh: Mesh, Y: int, dagger: bool = False,
                           overlap: bool = True):
    """dslash over a 2D ('t', 'z') mesh: explicit ppermute halos in both
    sharded directions (the reference's 4D domain decomposition restricted
    to the two leading lattice axes), pallas stencil on the extended local
    block.  Kernel arrays are [T, 24, Z, YX] sharded on axes 0 and 2.
    overlap: see make_sharded_wilson_m_2d."""
    nt = mesh.shape["t"]
    nz = mesh.shape["z"]
    t_fwd = [(i, (i + 1) % nt) for i in range(nt)]
    t_bwd = [(i, (i - 1) % nt) for i in range(nt)]
    z_fwd = [(i, (i + 1) % nz) for i in range(nz)]
    z_bwd = [(i, (i - 1) % nz) for i in range(nz)]

    def zext(a, axis):
        """Extend `a` with one halo row each side of `axis` via z-ppermute."""
        last = jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis],
                                    axis=axis)
        first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        halo_prev = jax.lax.ppermute(last, "z", perm=z_fwd)
        halo_next = jax.lax.ppermute(first, "z", perm=z_bwd)
        return jnp.concatenate([halo_prev, a, halo_next], axis=axis)

    def body(psi_loc, U_loc, Ut_loc):
        if overlap and psi_loc.shape[0] >= 2:
            psi_z = zext(psi_loc, axis=2)
            U_ext = zext(U_loc, axis=3)
            ut_pad = jnp.pad(Ut_loc, ((0, 0), (0, 0), (1, 1), (0, 0)))
            halo_prev = jax.lax.ppermute(psi_z[-1:], "t", perm=t_fwd)
            halo_next = jax.lax.ppermute(psi_z[:1], "t", perm=t_bwd)
            ut_prev = jax.lax.ppermute(ut_pad[-1:], "t", perm=t_fwd)
            return _overlap_apply(psi_z, halo_prev, halo_next, U_ext,
                                  ut_pad, ut_prev, None, Y, None, dagger,
                                  False, z_ext=True)
        # t halos first (z-exchange of the t-extended array then carries
        # the correct corner rows from the matching t-extension of the
        # z-neighbour)
        halo_prev = jax.lax.ppermute(psi_loc[-1:], "t", perm=t_fwd)
        halo_next = jax.lax.ppermute(psi_loc[:1], "t", perm=t_bwd)
        psi_t = jnp.concatenate([halo_prev, psi_loc, halo_next], axis=0)
        psi_ext = zext(psi_t, axis=2)
        U_ext = zext(U_loc, axis=3)
        ut_prev = jax.lax.ppermute(Ut_loc[-1:], "t", perm=t_fwd)
        ut_shift = jnp.concatenate([ut_prev, Ut_loc[:-1]], axis=0)
        # Ut z-halo rows are never read: zero-pad locally
        ut_ext = jnp.pad(ut_shift, ((0, 0), (0, 0), (1, 1), (0, 0)))
        return dslash_hop_pallas_ext2(psi_ext, U_ext, ut_ext, Y=Y,
                                      dagger=dagger)

    if shard_map.__module__.startswith("jax.experimental"):
        kwargs = {"check_rep": False}
    else:
        kwargs = {"check_vma": False}
    spec = P("t", None, "z", None)
    sharded = shard_map(body, mesh=mesh, in_specs=(spec, P("t", None, None, "z", None), spec),
                        out_specs=spec, **kwargs)
    return jax.jit(sharded)


def shard_kernel_fields_2d(mesh: Mesh, psi_k, U_k, Ut_k):
    s_psi = NamedSharding(mesh, P("t", None, "z", None))
    s_u = NamedSharding(mesh, P("t", None, None, "z", None))
    return (jax.device_put(psi_k, s_psi), jax.device_put(U_k, s_u),
            jax.device_put(Ut_k, s_psi))


def make_sharded_dslash(mesh: Mesh, Y: int, dagger: bool = False,
                        overlap: bool = True):
    """Returns dslash(psi_k, U_k, Ut_k) over t-sharded kernel-layout arrays.

    mesh must have a 't' axis; arrays are [T, ...] sharded on axis 0.
    overlap: see make_sharded_wilson_m.
    """
    nt = mesh.shape["t"]
    fwd = [(i, (i + 1) % nt) for i in range(nt)]
    bwd = [(i, (i - 1) % nt) for i in range(nt)]

    def body(psi_loc, U_loc, Ut_loc):
        # halo_from_prev = previous device's last slice = psi(t0 - 1)
        halo_prev = jax.lax.ppermute(psi_loc[-1:], "t", perm=fwd)
        # halo_from_next = next device's first slice = psi(t_end + 1)
        halo_next = jax.lax.ppermute(psi_loc[:1], "t", perm=bwd)
        # U_t at global t-1 per local slice: previous device's last t-link
        ut_prev = jax.lax.ppermute(Ut_loc[-1:], "t", perm=fwd)
        if overlap and psi_loc.shape[0] >= 2:
            return _overlap_apply(psi_loc, halo_prev, halo_next, U_loc,
                                  Ut_loc, ut_prev, None, Y, None, dagger,
                                  False)
        psi_ext = jnp.concatenate([halo_prev, psi_loc, halo_next], axis=0)
        ut_shift = jnp.concatenate([ut_prev, Ut_loc[:-1]], axis=0)
        return dslash_hop_pallas_ext(psi_ext, U_loc, ut_shift, Y=Y,
                                     dagger=dagger)

    # disable the replication/VMA check: the pallas out_shape carries no
    # varying-across-mesh annotation (check_rep on the legacy experimental
    # shard_map, check_vma on jax.shard_map)
    if shard_map.__module__.startswith("jax.experimental"):
        kwargs = {"check_rep": False}
    else:
        kwargs = {"check_vma": False}
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P("t"), P("t"), P("t")),
        out_specs=P("t"),
        **kwargs,
    )
    return jax.jit(sharded)


def shard_kernel_fields(mesh: Mesh, psi_k, U_k, Ut_k):
    """Place kernel-layout arrays t-sharded on the mesh."""
    s = NamedSharding(mesh, P("t"))
    return (jax.device_put(psi_k, s), jax.device_put(U_k, s),
            jax.device_put(Ut_k, s))
