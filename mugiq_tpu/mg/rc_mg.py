"""Multigrid on the rc (real-pair) representation — the TPU production MG.

Mirrors mg/transfer.py + mg/coarse.py + mg/mg.py with no complex dtypes
anywhere (this backend rejects them).  rc fields carry a trailing (re, im)
axis — slow-tiled on TPU but MG setup and coarse volumes are small; the
fine-level hot work (null-vector smoothing) runs on the pallas kernel path
through the caller.

Complex QR is a batched modified Gram-Schmidt in rc arithmetic (jnp.linalg
has no complex QR without complex dtypes); everything else is ceinsum.
Validated against the complex MG (Galerkin identity, transfer
orthonormality) in tests.
"""

from dataclasses import dataclass
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import EigOperator, MGParam
from ..rc.cplx import ceinsum
from ..utils import log, phase_timer
from .transfer import BlockGeometry, block_edge_mask

_MU_AXIS = (3, 2, 1, 0)


# ---------------------------------------------------------------------------
# rc block aggregation
# ---------------------------------------------------------------------------

def _block_agg_rc(psi: jnp.ndarray, g: BlockGeometry) -> jnp.ndarray:
    """[T,Z,Y,X,ns,nc,2] -> [Tc,Zc,Yc,Xc,ns_c,agg,2]."""
    T, Z, Y, X = psi.shape[:4]
    bx, by, bz, bt = g.block
    r = psi.reshape(T // bt, bt, Z // bz, bz, Y // by, by, X // bx, bx,
                    g.ns_coarse, g.spin_block, g.nc_fine, 2)
    r = r.transpose(0, 2, 4, 6, 8, 1, 3, 5, 7, 9, 10, 11)
    return r.reshape(r.shape[:5] + (g.agg, 2))


def _unblock_agg_rc(phi: jnp.ndarray, g: BlockGeometry) -> jnp.ndarray:
    Tc, Zc, Yc, Xc = phi.shape[:4]
    bx, by, bz, bt = g.block
    r = phi.reshape(Tc, Zc, Yc, Xc, g.ns_coarse, bt, bz, by, bx,
                    g.spin_block, g.nc_fine, 2)
    r = r.transpose(0, 5, 1, 6, 2, 7, 3, 8, 4, 9, 10, 11)
    return r.reshape(Tc * bt, Zc * bz, Yc * by, Xc * bx,
                     g.ns_coarse * g.spin_block, g.nc_fine, 2)


def _mgs_orthonormalize_rc(V: jnp.ndarray) -> jnp.ndarray:
    """Batched complex modified Gram-Schmidt on rc columns.

    V [..., agg, nvec, 2] -> column-orthonormal (complex) basis."""
    nvec = V.shape[-2]
    cols = [V[..., j, :] for j in range(nvec)]          # each [..., agg, 2]
    for j in range(nvec):
        for i in range(j):
            qi = cols[i]
            # d = <q_i, v_j> per batch element
            dr = jnp.sum(qi * cols[j], axis=(-2, -1))
            di = jnp.sum(qi[..., 0] * cols[j][..., 1]
                         - qi[..., 1] * cols[j][..., 0], axis=-1)
            cr = (dr[..., None] * qi[..., 0] - di[..., None] * qi[..., 1])
            ci = (dr[..., None] * qi[..., 1] + di[..., None] * qi[..., 0])
            cols[j] = cols[j] - jnp.stack([cr, ci], axis=-1)
        nrm = jnp.sqrt(jnp.sum(cols[j] * cols[j], axis=(-2, -1),
                               keepdims=True))
        cols[j] = cols[j] / jnp.maximum(nrm, jnp.finfo(V.dtype).tiny)
    return jnp.stack(cols, axis=-2)


@dataclass
class TransferRC:
    geom: BlockGeometry
    V: jnp.ndarray       # [Tc,Zc,Yc,Xc,ns_c,agg,nvec,2]

    @classmethod
    def build(cls, null_vecs_rc: jnp.ndarray, block, spin_block) -> "TransferRC":
        """null_vecs_rc: [n_vec, T, Z, Y, X, ns, nc, 2]."""
        n_vec = null_vecs_rc.shape[0]
        T, Z, Y, X, ns, nc = null_vecs_rc.shape[1:7]
        g = BlockGeometry(fine_dims=(X, Y, Z, T), block=tuple(block),
                          ns_fine=ns, nc_fine=nc, spin_block=spin_block)
        blocked = jax.vmap(lambda v: _block_agg_rc(v, g))(null_vecs_rc)
        Vraw = jnp.moveaxis(blocked, 0, -2)   # [...,ns_c,agg,nvec,2]
        V = _mgs_orthonormalize_rc(Vraw)
        return cls(geom=g, V=V)

    @property
    def coarse_field_shape(self):
        Xc, Yc, Zc, Tc = self.geom.coarse_dims
        return (Tc, Zc, Yc, Xc, self.geom.ns_coarse, self.V.shape[-2], 2)

    def restrict(self, psi, mask_agg=None):
        h = _block_agg_rc(psi, self.geom)
        if mask_agg is not None:
            h = h * mask_agg.astype(psi.dtype)[:, None]
        return ceinsum("tzyxsav,tzyxsa->tzyxsv", self.V, h, conj_a=True)

    def prolong(self, phi):
        h = ceinsum("tzyxsav,tzyxsv->tzyxsa", self.V, phi)
        return _unblock_agg_rc(h, self.geom)

    def probe_fine_vectors(self):
        ns_c = self.geom.ns_coarse
        n_vec = self.V.shape[-2]
        probes = []
        for s in range(ns_c):
            for v in range(n_vec):
                e = jnp.zeros(self.coarse_field_shape, dtype=self.V.dtype)
                e = e.at[..., s, v, 0].set(1.0)
                probes.append(self.prolong(e))
        return jnp.stack(probes)


# ---------------------------------------------------------------------------
# rc coarse stencil operator
# ---------------------------------------------------------------------------

@dataclass
class StencilOperatorRC:
    D: jnp.ndarray                # [T,Z,Y,X,n,n,2]
    Yp: List[jnp.ndarray]
    Ym: List[jnp.ndarray]
    ns: int
    nc: int

    @property
    def field_shape(self):
        return self.D.shape[:4] + (self.ns, self.nc, 2)

    @property
    def dtype(self):
        return self.D.dtype

    def _flat(self, phi):
        return phi.reshape(phi.shape[:4] + (self.ns * self.nc, 2))

    def _unflat(self, f):
        return f.reshape(f.shape[:4] + (self.ns, self.nc, 2))

    def M(self, phi):
        f = self._flat(phi)
        out = ceinsum("tzyxij,tzyxj->tzyxi", self.D, f)
        for mu in range(4):
            ax = _MU_AXIS[mu]
            out = out + ceinsum("tzyxij,tzyxj->tzyxi", self.Yp[mu],
                                jnp.roll(f, -1, axis=ax))
            out = out + ceinsum("tzyxij,tzyxj->tzyxi", self.Ym[mu],
                                jnp.roll(f, +1, axis=ax))
        return self._unflat(out)

    def Mdag(self, phi):
        f = self._flat(phi)

        def ct(link):
            return jnp.swapaxes(link, -2, -3) * jnp.asarray(
                [1.0, -1.0], dtype=link.dtype)

        out = ceinsum("tzyxij,tzyxj->tzyxi", ct(self.D), f)
        for mu in range(4):
            ax = _MU_AXIS[mu]
            out = out + ceinsum("tzyxij,tzyxj->tzyxi",
                                ct(jnp.roll(self.Ym[mu], -1, axis=ax)),
                                jnp.roll(f, -1, axis=ax))
            out = out + ceinsum("tzyxij,tzyxj->tzyxi",
                                ct(jnp.roll(self.Yp[mu], +1, axis=ax)),
                                jnp.roll(f, +1, axis=ax))
        return self._unflat(out)

    def MdagM(self, phi):
        return self.Mdag(self.M(phi))

    def MMdag(self, phi):
        return self.M(self.Mdag(phi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM, EigOperator.MMdag: self.MMdag}[which]

    def diag_term(self, phi):
        return self._unflat(ceinsum("tzyxij,tzyxj->tzyxi", self.D,
                                    self._flat(phi)))

    def hop_term(self, mu, sign, phi):
        f = self._flat(phi)
        ax = _MU_AXIS[mu]
        link = self.Yp[mu] if sign > 0 else self.Ym[mu]
        return self._unflat(ceinsum("tzyxij,tzyxj->tzyxi", link,
                                    jnp.roll(f, -sign, axis=ax)))

    def operator_with_args(self, which: EigOperator):
        """(fn, args) with the stencil tensors as EXPLICIT arguments —
        a closure operator embeds D/Yp/Ym as HLO constants (~340 MB at
        the 32^3x64 coarse level: HTTP 413 on the tunnelled backend)."""
        ns, nc = self.ns, self.nc

        def apply(phi, D, *links):
            op = StencilOperatorRC(D=D, Yp=list(links[:4]),
                                   Ym=list(links[4:]), ns=ns, nc=nc)
            return op.operator(which)(phi)

        return apply, (self.D, *self.Yp, *self.Ym)


def galerkin_coarse_operator_rc(fine_op, transfer: TransferRC,
                                place=None) -> StencilOperatorRC:
    """Exact R A P in rc arithmetic (same probing scheme as mg/coarse.py).

    place (optional): device-placement callable applied to the fine-volume
    probe batch (e.g. a t/z-sharded rc sharding — the ns_c*n_vec probes at
    fine volume dominate MG setup memory at 32^3x64)."""
    g = transfer.geom
    ns_c = g.ns_coarse
    n_vec = transfer.V.shape[-2]
    n = ns_c * n_vec

    probes = transfer.probe_fine_vectors()
    if place is not None:
        probes = place(probes)

    def restrict_cols(fields, mask=None):
        r = jax.vmap(lambda h: transfer.restrict(h, mask))(fields)
        r = jnp.moveaxis(r, 0, -2)          # [...,ns_c,n_vec,ncol,2]
        return r.reshape(r.shape[:4] + (n, n, 2))

    dia = restrict_cols(jax.vmap(fine_op.diag_term)(probes))
    Yp, Ym = [], []
    for mu in range(4):
        h_fwd = jax.vmap(lambda p, m=mu: fine_op.hop_term(m, +1, p))(probes)
        h_bwd = jax.vmap(lambda p, m=mu: fine_op.hop_term(m, -1, p))(probes)
        mask_fwd = block_edge_mask(g, mu, +1)
        mask_bwd = block_edge_mask(g, mu, -1)
        Yp.append(restrict_cols(h_fwd, mask_fwd))
        Ym.append(restrict_cols(h_bwd, mask_bwd))
        dia = dia + restrict_cols(h_fwd, 1.0 - mask_fwd) \
                  + restrict_cols(h_bwd, 1.0 - mask_bwd)

    return StencilOperatorRC(D=dia, Yp=Yp, Ym=Ym, ns=ns_c, nc=n_vec)


# ---------------------------------------------------------------------------
# production MG environment
# ---------------------------------------------------------------------------

def _cg_realpair(matvec, b, iters):
    """CG for a Hermitian-PD operator on real-pair fields (all CG scalars
    are real for HPD systems, so plain real dots suffice)."""

    def dot(a, c):
        return jnp.sum(a * c)

    def body(k, state):
        x, r, p, rs = state
        ap = matvec(p)
        alpha = rs / dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = dot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new

    x0 = jnp.zeros_like(b)
    r0 = b
    x, r, p, rs = jax.lax.fori_loop(0, iters, body, (x0, r0, r0, dot(r0, r0)))
    return x


@dataclass
class MGEnvRC:
    level_ops: List[object]      # [0] = fine rc/planar op, rest StencilOperatorRC
    transfers: List[TransferRC]
    params: MGParam

    @classmethod
    def build(cls, fine_op_rc, params: MGParam,
              fast_fine_op=None, mesh=None,
              setup_device=None, split: bool = False,
              kernel_impl: bool = False) -> "MGEnvRC":
        """fine_op_rc: operator with MdagM/diag_term/hop_term on rc fields
        (e.g. WilsonDiracRC).

        fast_fine_op: optional kernel-layout operator (WilsonDiracKernel or
        ShardedWilsonKernel) used only for the null-vector smoothing CG —
        the pallas MdagM is ~10x the rc XLA path; results are converted
        back to rc.

        mesh: shard the fine-level setup over a ('t'[, 'z']) device mesh —
        the smoothing runs per-vector on the sharded operator and the
        fine-volume rc null vectors are placed t/z-sharded so the transfer
        build and Galerkin probing distribute (the nc*ns fine-volume probe
        batch is the MG memory hog at scale).

        setup_device (optional): device the smoothed null vectors are
        placed on before the transfer build (a CPU device for large
        single-chip volumes — production._compute_loop_production_mg's
        host-side setup; fine_op_rc must live on the same device).

        split=True: build the FINE-level transfer/Galerkin with the
        split-layout (no-transpose) formulation of mg/rc_mg_split.py;
        operands are threaded as jit arguments.  Coarser levels keep the
        agg path (tiny).

        kernel_impl=True (requires fast_fine_op): the FINE-level transfer
        and Galerkin run entirely in the pallas KERNEL layout
        (mg/kernel_mg.py: masks + block reductions + per-direction pallas
        hops) — the ONLY formulation that compiles at 32^3x64 on this
        backend (rc-layout views relayout catastrophically: 19-60 GB
        compile requests).  The smoothed null vectors stay in the kernel
        layout; no rc conversion ever happens at fine volume."""
        n_coarse = params.n_level - 1
        level_ops = [fine_op_rc]
        transfers = []
        for lev in range(n_coarse):
            op = level_ops[-1]
            if op is None:
                # kernel_impl with no rc fine operator: derive the fine
                # dims from the pallas operator (rc fields never exist
                # at fine volume)
                assert kernel_impl and lev == 0 and fast_fine_op is not None
                T, _, _, Z, YX = fast_fine_op.U_k.shape
                Yf = fast_fine_op.Y
                fshape = (T, Z, Yf, YX // Yf, 4, 3, 2)
            else:
                fshape = op.field_shape
            ns = fshape[4]
            spin_block = 2 if ns == 4 else 1
            rng = np.random.default_rng(params.setup_seed + lev)
            with phase_timer(f"mg-rc-null-vectors-l{lev}"):
                if lev == 0 and fast_fine_op is not None:
                    import mugiq_tpu.pallas.dslash_kernel as dk

                    T, Z, Y, X = (fshape[0], fshape[1], fshape[2], fshape[3])
                    bk = jnp.asarray(rng.standard_normal(
                        (params.n_vec[lev], T, 24, Z, Y * X)),
                        dtype=jnp.float32)
                    # operator operands threaded as jit ARGUMENTS: a
                    # closure over fast_fine_op embeds the links as HLO
                    # constants — a 600+ MB compile request at 32^3x64
                    # that the tunnelled backend rejects (HTTP 413)
                    from ..params import EigOperator
                    ffn, fa = fast_fine_op.operator_with_args(
                        EigOperator.MdagM)
                    if mesh is not None:
                        # sharded operator: smooth per vector (shard_map
                        # composes with jit, not with this vmap batch)
                        from ..parallel.shard_op import spinor_sharding
                        bk = jax.device_put(bk, spinor_sharding(mesh, 1))
                        one = jax.jit(lambda rhs, *a: _cg_realpair(
                            lambda v: ffn(v, *a), rhs, params.setup_iters))
                        Bk = jnp.stack([one(bk[i], *fa)
                                        for i in range(bk.shape[0])])
                    elif int(np.prod(fshape[:4])) > (1 << 20):
                        # large volume: per-vector smoothing — the vmapped
                        # batch holds n_vec full CG states (x/r/p each
                        # n_vec x 200 MB at 32^3), which OOMs one chip
                        one = jax.jit(lambda rhs, *a: _cg_realpair(
                            lambda v: ffn(v, *a), rhs, params.setup_iters))
                        Bk = jnp.stack([one(bk[i], *fa)
                                        for i in range(bk.shape[0])])
                    else:
                        solve = jax.jit(jax.vmap(
                            lambda rhs, *a: _cg_realpair(
                                lambda v: ffn(v, *a), rhs,
                                params.setup_iters),
                            in_axes=(0,) + (None,) * len(fa)))
                        Bk = solve(bk, *fa)
                    if kernel_impl and lev == 0:
                        # kernel-layout impl: nulls STAY in kernel layout
                        nrm = jnp.sqrt(jnp.sum(
                            Bk * Bk, axis=(1, 2, 3, 4), keepdims=True))
                        B = Bk / nrm
                    else:
                        # kernel layout -> rc: [T,24,Z,YX] -> [T,Z,Y,X,s,c,2]
                        to_pl = jax.vmap(
                            lambda v: dk.from_kernel_spinor(v, Y=Y))
                        B_pl = to_pl(Bk)      # [n, 2, s, c, T, Z, Y, X]
                        B = jnp.transpose(B_pl, (0, 4, 5, 6, 7, 2, 3, 1))
                        if setup_device is not None:
                            B = jax.device_put(B, setup_device)
                else:
                    b = jnp.asarray(rng.standard_normal(
                        (params.n_vec[lev],) + tuple(fshape)), dtype=op.dtype)
                    solve = jax.jit(jax.vmap(
                        lambda rhs: _cg_realpair(op.MdagM, rhs,
                                                 params.setup_iters)))
                    B = solve(b)
                if not (kernel_impl and lev == 0):
                    nrm = jnp.sqrt(jnp.sum(
                        B * B, axis=tuple(range(1, B.ndim)), keepdims=True))
                    B = B / nrm
            if mesh is not None and lev == 0:
                from ..production import rc_sharding
                B = jax.device_put(B, rc_sharding(mesh, n_leading=1))
            if kernel_impl and lev == 0:
                from .kernel_mg import (TransferKernelMG,
                                        galerkin_wilson_kernel)
                if fast_fine_op is None or B.ndim != 5:
                    raise ValueError("kernel_impl requires fast_fine_op "
                                     "(kernel-layout null vectors)")
                Yext = fast_fine_op.Y
                with phase_timer(f"mg-kernel-transfer-l{lev}"):
                    tr = TransferKernelMG.build(
                        B, params.geo_block_size[lev], Yext)
                with phase_timer(f"mg-kernel-galerkin-l{lev}"):
                    coarse = galerkin_wilson_kernel(
                        fast_fine_op.U_k.astype(jnp.float32),
                        fast_fine_op.Ut_k.astype(jnp.float32),
                        fast_fine_op.kappa, tr)
            elif split and lev == 0:
                from .rc_mg_split import (TransferRCSplit,
                                          galerkin_wilson_rc_split,
                                          galerkin_coarse_operator_split)
                with phase_timer(f"mg-rc-transfer-l{lev}"):
                    tr = TransferRCSplit.build(B, params.geo_block_size[lev],
                                               spin_block)
                with phase_timer(f"mg-rc-galerkin-l{lev}"):
                    if getattr(op, "A", None) is None and hasattr(op, "U"):
                        coarse = galerkin_wilson_rc_split(
                            op.U, op.kappa, tr,
                            u_chunk=min(6, params.n_vec[lev]))
                    else:
                        coarse = galerkin_coarse_operator_split(op, tr)
            else:
                with phase_timer(f"mg-rc-transfer-l{lev}"):
                    tr = TransferRC.build(B, params.geo_block_size[lev],
                                          spin_block)
                with phase_timer(f"mg-rc-galerkin-l{lev}"):
                    coarse = galerkin_coarse_operator_rc(
                        op, tr,
                        place=(None if mesh is None or lev > 0 else
                               (lambda p: jax.device_put(
                                   p, rc_sharding(mesh, n_leading=1)))))
            log(f"MGEnvRC: level {lev + 1} built — coarse dims "
                f"{tr.geom.coarse_dims}, n={coarse.ns * coarse.nc}")
            transfers.append(tr)
            level_ops.append(coarse)
        return cls(level_ops=level_ops, transfers=transfers, params=params)

    @property
    def coarsest_op(self):
        return self.level_ops[-1]

    def prolongate(self, phi):
        for tr in reversed(self.transfers):
            phi = tr.prolong(phi)
        return phi

    def prolongate_batch(self, phis):
        """Recursive prolongation of an evec batch, one vector at a time —
        each level's prolong is its own operand-threaded jit (the fused
        all-vectors graph materialized 40 GB of padded temps at 32^3x64;
        per-vector dispatches reuse one small executable)."""
        outs = []
        for i in range(phis.shape[0]):
            phi = phis[i]
            for tr in reversed(self.transfers):
                phi = tr.prolong(phi)
            outs.append(phi)
        return jnp.stack(outs)

    # -- hierarchy checkpoint (reference: per-level mg_vec_infile/outfile,
    #    tests/eigensolve.cpp:584-590 — restartability = reuse of stored
    #    null/transfer vectors) --

    def save(self, path: str) -> None:
        """Save transfer bases AND Galerkin stencils: a load skips both the
        setup CG and the coarse-operator probing."""
        data = {"n_level": np.asarray(self.params.n_level)}
        for i, tr in enumerate(self.transfers):
            g = tr.geom
            # split/kernel-layout transfers checkpoint in the agg layout
            # (host numpy transpose) so save files stay format-compatible
            data[f"V{i}"] = np.asarray(tr.to_agg_V()
                                       if hasattr(tr, "to_agg_V") else tr.V)
            data[f"geom{i}"] = np.asarray(
                list(g.fine_dims) + list(g.block)
                + [g.ns_fine, g.nc_fine, g.spin_block], dtype=np.int64)
        for i, op in enumerate(self.level_ops[1:]):
            data[f"D{i}"] = np.asarray(op.D)
            for mu in range(4):
                data[f"Yp{i}_{mu}"] = np.asarray(op.Yp[mu])
                data[f"Ym{i}_{mu}"] = np.asarray(op.Ym[mu])
            data[f"nsnc{i}"] = np.asarray([op.ns, op.nc], dtype=np.int64)
        np.savez(path, **data)
        log(f"MGEnvRC: hierarchy saved to {path} "
            f"({len(self.transfers)} transfer level(s))")

    @classmethod
    def load(cls, path: str, fine_op_rc, params: MGParam,
             split: bool = False, kernel_impl: bool = False) -> "MGEnvRC":
        """Rebuild the hierarchy from a save() checkpoint (no setup CG, no
        Galerkin probing).  fine_op_rc must be the SAME operator the
        hierarchy was built for (same gauge/kappa).  split=True rebuilds
        the FINE transfer in the split layout (on-chip prolongation at
        large volumes)."""
        from .rc_mg_split import TransferRCSplit

        with np.load(path) as z:
            n_coarse = int(z["n_level"]) - 1
            transfers = []
            level_ops = [fine_op_rc]
            for i in range(n_coarse):
                gi = z[f"geom{i}"]
                g = BlockGeometry(fine_dims=tuple(int(d) for d in gi[:4]),
                                  block=tuple(int(b) for b in gi[4:8]),
                                  ns_fine=int(gi[8]), nc_fine=int(gi[9]),
                                  spin_block=int(gi[10]))
                if kernel_impl and i == 0:
                    from .kernel_mg import TransferKernelMG
                    transfers.append(TransferKernelMG.from_agg_V(
                        z[f"V{i}"], g, g.fine_dims[1]))
                elif split and i == 0:
                    transfers.append(TransferRCSplit.from_agg_V(
                        jnp.asarray(z[f"V{i}"]), g))
                else:
                    transfers.append(
                        TransferRC(geom=g, V=jnp.asarray(z[f"V{i}"])))
                ns, nc = (int(v) for v in z[f"nsnc{i}"])
                level_ops.append(StencilOperatorRC(
                    D=jnp.asarray(z[f"D{i}"]),
                    Yp=[jnp.asarray(z[f"Yp{i}_{mu}"]) for mu in range(4)],
                    Ym=[jnp.asarray(z[f"Ym{i}_{mu}"]) for mu in range(4)],
                    ns=ns, nc=nc))
        log(f"MGEnvRC: hierarchy loaded from {path} "
            f"({n_coarse} coarse level(s))")
        return cls(level_ops=level_ops, transfers=transfers, params=params)
