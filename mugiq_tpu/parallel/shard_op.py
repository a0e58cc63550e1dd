"""Multi-chip Wilson(-clover) operator on the pallas kernel layout.

The sharded twin of ``pallas.dirac_kernel.WilsonDiracKernel``: kernel-layout
fields live t(-z)-sharded on a device mesh and M/Mdag run as ONE fused
shard_map + ppermute pallas pass per application — hopping term, clover
diagonal (chiral 6x6 blocks in VMEM) and the kappa combine all in-kernel,
exactly like the single-device fused operator.

This is what lets the production eigensolve and loop pipeline scale past
one chip's HBM (32^3x64 needs ~10 GB of Krylov basis at nKr=48 f32): the
Lanczos algebra in planar/lanczos.py is pure einsums over the basis, so
under jit with the basis sharded by this module's ``krylov_sharding`` the
reductions lower to all-reduces over ICI and nothing else changes.

Reference counterpart: QUDA's multi-GPU Dirac operator consumed at
lib/eigsolve_mugiq.cpp:169-207, with the 4D domain decomposition of
SURVEY.md §2.4 restricted to the (t, z) lattice axes.
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import EigOperator
from .shard_dslash import (make_sharded_dslash, make_sharded_dslash_2d,
                           make_sharded_wilson_m, make_sharded_wilson_m_2d)


def _is_2d(mesh: Mesh) -> bool:
    return "z" in mesh.shape and mesh.shape["z"] > 1


def _is_3d(mesh: Mesh) -> bool:
    return "y" in mesh.shape and mesh.shape["y"] > 1


def spinor_sharding(mesh: Mesh, n_leading: int = 0) -> NamedSharding:
    """Sharding for kernel-layout [T, 24, Z, YX] fields (optionally with
    ``n_leading`` replicated batch axes, e.g. the Krylov basis index)."""
    z = "z" if _is_2d(mesh) else None
    y = "y" if _is_3d(mesh) else None
    spec = ("t", None, z, y)
    return NamedSharding(mesh, P(*((None,) * n_leading + spec)))


def gauge_sharding(mesh: Mesh) -> NamedSharding:
    z = "z" if _is_2d(mesh) else None
    y = "y" if _is_3d(mesh) else None
    return NamedSharding(mesh, P("t", None, None, z, y))


def krylov_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the Lanczos/Arnoldi basis [m+1, T, 24, Z, YX]."""
    return spinor_sharding(mesh, n_leading=1)


def clover_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for clover chiral blocks [T, 2, 6, 6, 2, Z, YX]."""
    z = "z" if _is_2d(mesh) else None
    y = "y" if _is_3d(mesh) else None
    return NamedSharding(mesh, P("t", None, None, None, None, z, y))


@dataclass
class ShardedWilsonKernel:
    """Wilson(-clover) M/Mdag/MdagM/MMdag over a ('t'[, 'z']) device mesh.

    U_k [T, 4, 18, Z, YX] placed with gauge_sharding; A_blocks (optional)
    [T, 2, 6, 6, 2, Z, YX] clover chiral blocks, sharded on T (axis 0) and
    Z (axis 5) to match.
    """
    mesh: Mesh
    U_k: jnp.ndarray
    kappa: float
    Y: int
    A_blocks: Optional[jnp.ndarray] = None

    def __post_init__(self):
        from ..pallas.dslash_kernel import pack_clover_kernel144
        from .shard_dslash import make_sharded_wilson_3d

        is2d = _is_2d(self.mesh)
        is3d = _is_3d(self.mesh)
        self.Ut_k = self.U_k[:, 3]
        has_c = self.A_blocks is not None
        if has_c:
            self._A144 = pack_clover_kernel144(self.A_blocks)
        else:
            # dummy arg so the shard_map signature is static (t-split only)
            T = self.U_k.shape[0]
            self._A144 = jax.device_put(
                jnp.zeros((T, 1, 1, 1), self.U_k.dtype),
                NamedSharding(self.mesh, P("t", None, None, None)))
        if is3d:
            X = self.U_k.shape[-1] // self.Y
            self._hop = make_sharded_wilson_3d(self.mesh, self.Y, X, None)
            self._hop_dag = make_sharded_wilson_3d(self.mesh, self.Y, X,
                                                   None, dagger=True)
            self._m = make_sharded_wilson_3d(self.mesh, self.Y, X,
                                             self.kappa, has_clover=has_c)
            self._mdag = make_sharded_wilson_3d(self.mesh, self.Y, X,
                                                self.kappa, dagger=True,
                                                has_clover=has_c)
            return
        mk_hop = make_sharded_dslash_2d if is2d else make_sharded_dslash
        self._hop = mk_hop(self.mesh, self.Y)
        self._hop_dag = mk_hop(self.mesh, self.Y, dagger=True)
        # fused M/Mdag: one pallas pass (hop + clover diagonal + combine)
        mk_m = make_sharded_wilson_m_2d if is2d else make_sharded_wilson_m
        self._m = mk_m(self.mesh, self.Y, self.kappa, has_clover=has_c)
        self._mdag = mk_m(self.mesh, self.Y, self.kappa, dagger=True,
                          has_clover=has_c)

    def M(self, psi):
        return self._m(psi, self.U_k, self.Ut_k, self._A144)

    def Mdag(self, psi):
        # clover diagonal is Hermitian; dagger hop swaps spin projectors
        return self._mdag(psi, self.U_k, self.Ut_k, self._A144)

    def MdagM(self, psi):
        return self.Mdag(self.M(psi))

    def MMdag(self, psi):
        return self.M(self.Mdag(psi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM,
                EigOperator.MMdag: self.MMdag}[which]

    def operator_with_args(self, which: EigOperator):
        """(fn, args) with fn(psi, *args) — the sharded operator with its
        field operands as explicit arguments, for threading through jitted
        eigensolver cycles without embedding the (sharded) links as HLO
        constants (see pallas.dirac_kernel.operator_with_args)."""
        m, mdag = self._m, self._mdag
        fns = {
            EigOperator.M: lambda p, U, Ut, A: m(p, U, Ut, A),
            EigOperator.Mdag: lambda p, U, Ut, A: mdag(p, U, Ut, A),
            EigOperator.MdagM: lambda p, U, Ut, A: mdag(
                m(p, U, Ut, A), U, Ut, A),
            EigOperator.MMdag: lambda p, U, Ut, A: m(
                mdag(p, U, Ut, A), U, Ut, A),
        }
        return fns[which], (self.U_k, self.Ut_k, self._A144)

    @property
    def field_shape(self):
        return (self.U_k.shape[0], 24, self.U_k.shape[3], self.U_k.shape[4])

    @property
    def dtype(self):
        """Spinor dtype: always f32 (links may be stored bf16)."""
        return jnp.float32

    def place(self, psi_k):
        """Device-put a kernel-layout field with this operator's sharding."""
        return jax.device_put(psi_k, spinor_sharding(self.mesh))

    def place_gauge(self, U_k):
        return jax.device_put(U_k, gauge_sharding(self.mesh))

    @classmethod
    def from_kernel_op(cls, mesh: Mesh, op) -> "ShardedWilsonKernel":
        """Shard a single-device WilsonDiracKernel's fields over `mesh`."""
        A = op.A_blocks
        if A is not None:
            A = jax.device_put(A, clover_sharding(mesh))
        return cls(mesh=mesh,
                   U_k=jax.device_put(op.U_k, gauge_sharding(mesh)),
                   kappa=op.kappa, Y=op.Y, A_blocks=A)


# ---------------------------------------------------------------------------
# sharded packed even-odd Schur operator
# ---------------------------------------------------------------------------

def make_sharded_schur_m(mesh: Mesh, Y: int, kappa: float,
                         dagger: bool = False, has_clover: bool = False,
                         by: int = None):
    """Packed even-even Schur M(dag) over a 1D 't' mesh.

    Returns fn(pe, U_e, Ut_e, U_o, Ut_o, off_e, off_o, A_e, Ainv_o) on
    t-sharded PACKED fields [T, 24, Z, Y*Xh] — two ppermute+pallas parity
    passes (e->o then the fused o->e combine), the sharded twin of
    pallas.schur_kernel.SchurDiracKernelPacked._apply.  A_e/Ainv_o are
    packed clover blocks (dummy 1-arrays when has_clover=False)."""
    from ..pallas.schur_kernel import parity_hop_pallas_ext
    from .shard_dslash import _shard_map_kwargs

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    nt = mesh.shape["t"]
    fwd = [(i, (i + 1) % nt) for i in range(nt)]
    bwd = [(i, (i - 1) % nt) for i in range(nt)]
    k2 = float(kappa) ** 2

    def ext_t(a):
        halo_prev = jax.lax.ppermute(a[-1:], "t", perm=fwd)
        halo_next = jax.lax.ppermute(a[:1], "t", perm=bwd)
        return jnp.concatenate([halo_prev, a, halo_next], axis=0)

    def shift_ut(Ut):
        prev = jax.lax.ppermute(Ut[-1:], "t", perm=fwd)
        return jnp.concatenate([prev, Ut[:-1]], axis=0)

    def body(pe, U_e, Ut_e, U_o, Ut_o, off_e, off_o, A_e, Ainv_o):
        d_o = parity_hop_pallas_ext(
            ext_t(pe), U_o, U_e, shift_ut(Ut_e), off_o, Y=Y, dagger=dagger,
            A_post=Ainv_o if has_clover else None, by=by)
        return parity_hop_pallas_ext(
            ext_t(d_o), U_e, U_o, shift_ut(Ut_o), off_e, Y=Y,
            dagger=dagger, kappa2=k2, psi_out=pe,
            A_comb=A_e if has_clover else None, by=by)

    spec = P("t")
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(spec,) * 9,
        out_specs=spec,
        **_shard_map_kwargs(),
    )
    return jax.jit(sharded)


def make_sharded_schur_m_zy(mesh: Mesh, Y: int, kappa: float,
                            dagger: bool = False,
                            has_clover: bool = False):
    """Packed even-even Schur M(dag) over a 2D ('t','z') or 3D ('t','z','y')
    mesh — the packed twin of make_sharded_wilson_3d, so the best
    single-chip operator composes with every supported lattice
    decomposition (reference pc_solve under any --gridsize,
    /root/reference/lib/eigsolve_mugiq.cpp:169-181).

    Same signature as make_sharded_schur_m; fields are packed kernel-layout
    [T, 24, Z, Y*Xh] sharded t/z(/y).  Halos: one Xh-lane y-row (3D), one
    z-row, one t-slice per side, exchanged y -> z -> t so corners ride the
    later transfers; the local stencil is parity_hop_pallas_extzy."""
    from ..pallas.schur_kernel import parity_hop_pallas_extzy
    from .shard_dslash import _shard_map_kwargs

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    nt, nz = mesh.shape["t"], mesh.shape["z"]
    ny = mesh.shape.get("y", 1)
    is3d = ny > 1
    Yl = Y // ny
    k2 = float(kappa) ** 2

    def perms(n):
        return ([(i, (i + 1) % n) for i in range(n)],
                [(i, (i - 1) % n) for i in range(n)])

    t_fwd, t_bwd = perms(nt)
    z_fwd, z_bwd = perms(nz)
    y_fwd, y_bwd = perms(ny)

    def ext(a, axis, width, name, fwd, bwd):
        n = a.shape[axis]
        last = jax.lax.slice_in_dim(a, n - width, n, axis=axis)
        first = jax.lax.slice_in_dim(a, 0, width, axis=axis)
        halo_prev = jax.lax.ppermute(last, name, perm=fwd)
        halo_next = jax.lax.ppermute(first, name, perm=bwd)
        return jnp.concatenate([halo_prev, a, halo_next], axis=axis)

    def ext_zy(a, Xh):
        """z (rows, axis -2) and — on 3D meshes — y (Xh lanes, axis -1)
        halo extension of a local packed array."""
        if is3d:
            a = ext(a, a.ndim - 1, Xh, "y", y_fwd, y_bwd)
        return ext(a, a.ndim - 2, 1, "z", z_fwd, z_bwd)

    def ext_t(a):
        halo_prev = jax.lax.ppermute(a[-1:], "t", perm=t_fwd)
        halo_next = jax.lax.ppermute(a[:1], "t", perm=t_bwd)
        return jnp.concatenate([halo_prev, a, halo_next], axis=0)

    def shift_ut_ext(Ut, Xh):
        """Ut(global t-1), z/y halo rows zero (utm is never shifted)."""
        prev = jax.lax.ppermute(Ut[-1:], "t", perm=t_fwd)
        sh = jnp.concatenate([prev, Ut[:-1]], axis=0)
        pad = [(0, 0)] * sh.ndim
        pad[-2] = (1, 1)
        if is3d:
            pad[-1] = (Xh, Xh)
        return jnp.pad(sh, pad)

    def body(pe, U_e, Ut_e, U_o, Ut_o, off_e, off_o, A_e, Ainv_o):
        Xh = pe.shape[-1] // Yl
        Ue_zy, Uo_zy = ext_zy(U_e, Xh), ext_zy(U_o, Xh)
        offe_zy, offo_zy = ext_zy(off_e, Xh), ext_zy(off_o, Xh)
        d_o = parity_hop_pallas_extzy(
            ext_t(ext_zy(pe, Xh)), Uo_zy, Ue_zy, shift_ut_ext(Ut_e, Xh),
            offo_zy, Y=Yl, dagger=dagger,
            A_post=Ainv_o if has_clover else None, z_ext=True, y_ext=is3d)
        return parity_hop_pallas_extzy(
            ext_t(ext_zy(d_o, Xh)), Ue_zy, Uo_zy, shift_ut_ext(Ut_o, Xh),
            offe_zy, Y=Yl, dagger=dagger, kappa2=k2, psi_out=pe,
            A_comb=A_e if has_clover else None, z_ext=True, y_ext=is3d)

    y = "y" if is3d else None
    f_spec = P("t", None, "z", y)            # psi / off / A (packed)
    u_spec = P("t", None, None, "z", y)      # U [T, 4, 18, Z, YXh]
    ut_spec = P("t", None, "z", y)           # Ut [T, 18, Z, YXh]
    # without clover the A slots carry [T,1,1,1] dummies — t-shard only
    a_spec = f_spec if has_clover else P("t", None, None, None)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(f_spec, u_spec, ut_spec, u_spec, ut_spec,
                  f_spec, f_spec, a_spec, a_spec),
        out_specs=f_spec,
        **_shard_map_kwargs(),
    )
    return jax.jit(sharded)


@dataclass
class ShardedSchurKernelPacked:
    """Packed even-even Schur (Wilson or asymmetric clover pc) over a 1D
    't' device mesh — the sharded twin of SchurDiracKernelPacked.  Built
    from a single-device packed operator via :meth:`from_packed_op`; all
    packed operands (half-volume links, offset masks, clover blocks) are
    t-sharded and threaded as explicit jit arguments."""
    mesh: Mesh
    op: object          # SchurDiracKernelPacked (fields re-placed sharded)

    def __post_init__(self):
        has_c = self.op.A_e is not None
        multi = _is_2d(self.mesh) or _is_3d(self.mesh)
        y = "y" if _is_3d(self.mesh) else None
        z = "z" if multi else None
        f_s = NamedSharding(self.mesh, P("t", None, z, y))
        u_s = NamedSharding(self.mesh, P("t", None, None, z, y))
        putf = lambda a: jax.device_put(a, f_s)
        putu = lambda a: jax.device_put(a, u_s)
        self.U_e, self.U_o = putu(self.op.U_e), putu(self.op.U_o)
        self.Ut_e, self.Ut_o = putf(self.op.Ut_e), putf(self.op.Ut_o)
        self.off_e, self.off_o = putf(self.op.off_e), putf(self.op.off_o)
        if has_c:
            self.A_e = putf(self.op.A_e)
            self.Ainv_o = putf(self.op.Ainv_o)
        else:
            T = self.U_e.shape[0]
            dummy = jax.device_put(
                jnp.zeros((T, 1, 1, 1), self.U_e.dtype),
                NamedSharding(self.mesh, P("t", None, None, None)))
            self.A_e = self.Ainv_o = dummy
        if multi:
            # 2D/3D meshes: halo-extended full-width local stencil
            self._m = make_sharded_schur_m_zy(
                self.mesh, self.op.Y, self.op.kappa, has_clover=has_c)
            self._mdag = make_sharded_schur_m_zy(
                self.mesh, self.op.Y, self.op.kappa, dagger=True,
                has_clover=has_c)
            return
        by = getattr(self.op, "by", None)
        self._m = make_sharded_schur_m(self.mesh, self.op.Y, self.op.kappa,
                                       has_clover=has_c, by=by)
        self._mdag = make_sharded_schur_m(self.mesh, self.op.Y,
                                          self.op.kappa, dagger=True,
                                          has_clover=has_c, by=by)

    def _args(self):
        return (self.U_e, self.Ut_e, self.U_o, self.Ut_o,
                self.off_e, self.off_o, self.A_e, self.Ainv_o)

    def M(self, pe):
        return self._m(pe, *self._args())

    def Mdag(self, pe):
        return self._mdag(pe, *self._args())

    def MdagM(self, pe):
        return self.Mdag(self.M(pe))

    def MMdag(self, pe):
        return self.M(self.Mdag(pe))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM,
                EigOperator.MMdag: self.MMdag}[which]

    def operator_with_args(self, which: EigOperator):
        m, mdag = self._m, self._mdag
        fns = {
            EigOperator.M: lambda p, *a: m(p, *a),
            EigOperator.Mdag: lambda p, *a: mdag(p, *a),
            EigOperator.MdagM: lambda p, *a: mdag(m(p, *a), *a),
            EigOperator.MMdag: lambda p, *a: m(mdag(p, *a), *a),
        }
        return fns[which], self._args()

    # packing passthroughs (host-side, on full kernel-layout fields)
    def pack_even(self, psi_k):
        return self.op.pack_even(psi_k)

    def unpack_even(self, pe):
        return self.op.unpack_even(pe)

    def place(self, pe):
        z = "z" if _is_2d(self.mesh) else None
        y = "y" if _is_3d(self.mesh) else None
        return jax.device_put(pe, NamedSharding(self.mesh,
                                                P("t", None, z, y)))

    @property
    def field_shape(self):
        return self.op.field_shape

    @property
    def dtype(self):
        return jnp.float32

    @classmethod
    def from_packed_op(cls, mesh: Mesh, op) -> "ShardedSchurKernelPacked":
        """1D 't', 2D ('t','z') and 3D ('t','z','y') meshes — the packed
        operator composes with every supported lattice decomposition
        (reference pc_solve is grid-agnostic,
        /root/reference/lib/eigsolve_mugiq.cpp:169-181)."""
        return cls(mesh=mesh, op=op)
