"""Kernel-layout MG transfer: the formulation that compiles at 32^3x64.

Round-4 probes showed the rc layout ([..., s, c, 2] trailing) CANNOT run
at 32^3x64 on this backend at all — any einsum/dot on its (split) views
makes the compiler materialize 16-64x padded relayouts (19-60 GB compile
requests).  This module rebuilds the fine-level transfer in the pallas
KERNEL layout [T, 24, Z, Y*X] (comp = r*12 + s*3 + c) using ONLY:

* in-order reshape views (free),
* elementwise multiplies with masks (native tiling),
* multi-axis reductions (fused; outputs are coarse-sized),
* the single-direction pallas hop (dslash_hop_pallas_gl_dir)

— never a dot_general on a fine-volume operand.  Coarse fields keep the
TransferRC convention [Tc,Zc,Yc,Xc,sc,nvec,2] so StencilOperatorRC and
the coarse eigensolve are unchanged.  Validated equal to TransferRC /
galerkin_coarse_operator_rc on CPU.

Reference: QUDA Transfer/DiracCoarse consumed at mg_mugiq.h:35-53.
"""

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import log, phase_timer
from .transfer import BlockGeometry
from .rc_mg import StencilOperatorRC


def _kview(f, g: BlockGeometry, Y: int):
    """[T, 24, Z, Y*X] -> [Tc,bt, r2,sc2,sb2,c3, Zc,bz, Yc,by, Xc,bx].

    All splits are in-order: a free reshape."""
    T, _, Z, YX = f.shape
    X = YX // Y
    bx, by_, bz, bt = g.block
    return f.reshape(T // bt, bt, 2, 2, 2, 3, Z // bz, bz,
                     Y // by_, by_, X // bx, bx)


def _kmerge(v, g: BlockGeometry):
    """Inverse of _kview."""
    Tc, bt = v.shape[0], v.shape[1]
    Zc, bz, Yc, by_, Xc, bx = v.shape[6:]
    return v.reshape(Tc * bt, 24, Zc * bz, Yc * by_ * Xc * bx)


# reduce axes of an r-SLICED split view [Tc,bt,sc,sb,c,Zc,bz,Yc,by,Xc,bx]
_RED = (1, 3, 4, 6, 8, 10)


def _rparts(v):
    """Split view -> (real, imag) 11-axis views."""
    return v[:, :, 0], v[:, :, 1]


def _block_dot_k(a, b):
    """Per-block complex <a, b> of split views -> (re, im) each
    [Tc, sc, Zc, Yc, Xc]."""
    ar, ai = _rparts(a)
    br, bi = _rparts(b)
    re = jnp.sum(ar * br + ai * bi, axis=_RED)
    im = jnp.sum(ar * bi - ai * br, axis=_RED)
    return re, im


def _bc(d):
    """[Tc, sc, Zc, Yc, Xc] -> broadcastable over an r-sliced view."""
    return d[:, None, :, None, None, :, None, :, None, :, None]


def _assemble(xr, xi, g):
    """(real, imag) 11-axis views -> kernel-layout field."""
    return _kmerge(jnp.stack([xr, xi], axis=2), g)


def _lane_sum_matrix_np(Y: int, X: int, by_: int, bx: int) -> np.ndarray:
    """[Y*X, Yc*Xc] 0/1 matrix summing each (by, bx) block of the fused
    lane axis (lane = y*X + x) into its coarse (yc, xc) slot."""
    Yc, Xc = Y // by_, X // bx
    S = np.zeros((Y * X, Yc * Xc), np.float32)
    for y in range(Y):
        for x in range(X):
            S[y * X + x, (y // by_) * Xc + (x // bx)] = 1.0
    return S


def _block_sum(p, g, Y, S):
    """[T, 12, Z, Y*X] -> [Tc, sc, Zc, Yc, Xc]: block-sum of a per-site
    product field by STAGED native reductions — splitting all block dims
    at once (the 12-dim view) makes the compiler materialize the reshape
    at 32x lane padding (6 GB per temp at 32^3x64, measured).

    Stages: comp (sb, c) reduce -> z-block reduce (2x sublane pad of a
    small array) -> lane block-sum as one MXU matmul with the 0/1
    selection matrix S [Y*X, Yc*Xc] -> t-block reduce (leading dim)."""
    bx, by_, bz, bt = g.block
    T, _, Z, YX = p.shape
    X = YX // Y
    Yc, Xc = Y // by_, X // bx
    a = jnp.sum(p.reshape(T, 2, 6, Z, YX), axis=2)       # [T, sc, Z, YX]
    a = jnp.sum(a.reshape(T, 2, Z // bz, bz, YX), axis=3)
    a = jnp.matmul(a, S, precision=jax.lax.Precision.HIGHEST)
    a = jnp.sum(a.reshape(T // bt, bt, 2, Z // bz, Yc * Xc), axis=1)
    return a.reshape(T // bt, 2, Z // bz, Yc, Xc)


@lru_cache(maxsize=None)
def _lane_S(Y: int, X: int, by_: int, bx: int):
    return jnp.asarray(_lane_sum_matrix_np(Y, X, by_, bx))


def _S_for(g, Y):
    bx, by_, _, _ = g.block
    return _lane_S(Y, g.fine_dims[0], by_, bx)


def _block_dot_fields(q, c, g, Y, S):
    """Per-block complex <q, c> of NATIVE kernel-layout fields ->
    (re, im) each [Tc, sc, Zc, Yc, Xc] via staged reductions."""
    qr, qi = q[:, :12], q[:, 12:]
    cr, ci = c[:, :12], c[:, 12:]
    re = _block_sum(qr * cr + qi * ci, g, Y, S)
    im = _block_sum(qr * ci - qi * cr, g, Y, S)
    return re, im


_SC12 = [0] * 6 + [1] * 6        # sc per s*c comp (s-major, c-minor)


def _coef_to_fine(d, g):
    """[Tc, sc, Zc, Yc, Xc] coarse coefficients -> [T, 12, Z, Y*X] NATIVE
    per-site field (upsample the SMALL array; never touch split layouts —
    broadcast-back multiplies on 12-axis views materialize 16-32x padded
    temps and blew the 15.75 GB HBM at 32^3x64)."""
    bx, by_, bz, bt = g.block
    d = jnp.repeat(d, bt, axis=0)
    d = jnp.repeat(d, bz, axis=2)
    d = jnp.repeat(d, by_, axis=3)
    d = jnp.repeat(d, bx, axis=4)          # [T, 2, Z, Y, X]
    # sc -> 12 comps is a plain 6x repeat (comp = s*3+c, s-major): a
    # broadcast XLA fuses into the consumer, NOT a gather (the indexed
    # form d[:, _SC12] materialized 2x-padded 1.5 GB copies per vector
    # in the 32^3x64 prolongation, round-4 OOM)
    d = jnp.repeat(d, 6, axis=1)           # [T, 12, Z, Y, X]
    T, _, Z, Yf, Xf = d.shape
    return d.reshape(T, 12, Z, Yf * Xf)


def _caxpy_fine(c, q, drf, dif):
    """c - (dr + i di) q on native kernel-layout fields with per-site
    coefficient fields drf/dif [T, 12, Z, Y*X]."""
    qr, qi = q[:, :12], q[:, 12:]
    cr, ci = c[:, :12], c[:, 12:]
    nr = cr - (drf * qr - dif * qi)
    ni = ci - (drf * qi + dif * qr)
    return jnp.concatenate([nr, ni], axis=1)


def _mgs_kernel(V, g, Y):
    """Complex MGS over the leading nvec axis (kernel-layout columns).

    Same ordering as rc_mg._mgs_orthonormalize_rc -> identical basis.
    FINE-GRAINED jits (one reused projection executable; a fused MGS
    graph compiles for tens of minutes through the tunnel), and all
    multiplies on NATIVE layouts via upsampled coefficient fields."""
    nvec = V.shape[0]

    S = _S_for(g, Y)

    @jax.jit
    def proj_sub(q, c):
        dr, di = _block_dot_fields(q, c, g, Y, S)
        return _caxpy_fine(c, q, _coef_to_fine(dr, g), _coef_to_fine(di, g))

    @jax.jit
    def normalize(c):
        nr, _ = _block_dot_fields(c, c, g, Y, S)
        inv = 1.0 / jnp.sqrt(jnp.maximum(nr, jnp.finfo(c.dtype).tiny))
        invf = _coef_to_fine(inv, g)
        return jnp.concatenate([c[:, :12] * invf, c[:, 12:] * invf], axis=1)

    out = []
    for j in range(nvec):
        c = V[j]
        for i in range(j):
            c = proj_sub(out[i], c)
        out.append(normalize(c))
    return jnp.stack(out)


def _edge_mask_np(g: BlockGeometry, Y: int, mu: int, sign: int) -> np.ndarray:
    """Fine-site mask [T, 1, Z, Y*X]: 1 where the sign*mu neighbour lies in
    the adjacent block (matches transfer.block_edge_mask site logic)."""
    X, _, Z, T = (g.fine_dims[0], g.fine_dims[1], g.fine_dims[2],
                  g.fine_dims[3])
    bx, by_, bz, bt = g.block
    t, z, y, x = np.meshgrid(np.arange(T), np.arange(Z), np.arange(Y),
                             np.arange(X), indexing="ij")
    coord = (x, y, z, t)[mu]
    b = (bx, by_, bz, bt)[mu]
    edge = (coord % b == (b - 1 if sign > 0 else 0))
    return edge.reshape(T, 1, Z, Y * X).astype(np.float32)


def _sc_mask_np(s: int) -> np.ndarray:
    """Comp-axis mask [1, 24, 1, 1] selecting coarse spin s (fine spins
    {2s, 2s+1}), both re and im halves."""
    m = np.zeros((2, 4, 3), np.float32)
    m[:, 2 * s:2 * s + 2, :] = 1.0
    return m.reshape(1, 24, 1, 1)


@dataclass
class TransferKernelMG:
    """Fine-level MG transfer on kernel-layout fields.

    V: [nvec, T, 24, Z, Y*X] block-orthonormal basis.  Coarse fields use
    the TransferRC layout [Tc,Zc,Yc,Xc,sc,nvec,2]."""
    geom: BlockGeometry
    Y: int
    V: jnp.ndarray

    @classmethod
    def build(cls, nulls_k: jnp.ndarray, block, Y: int) -> "TransferKernelMG":
        """nulls_k: [nvec, T, 24, Z, Y*X] kernel-layout null vectors."""
        T, _, Z, YX = nulls_k.shape[1:]
        X = YX // Y
        g = BlockGeometry(fine_dims=(X, Y, Z, T), block=tuple(block),
                          ns_fine=4, nc_fine=3, spin_block=2)
        V = _mgs_kernel(nulls_k, g, Y)      # manages its own (small) jits
        return cls(geom=g, Y=Y, V=V)

    @property
    def n_vec(self):
        return self.V.shape[0]

    @property
    def coarse_field_shape(self):
        Xc, Yc, Zc, Tc = self.geom.coarse_dims
        return (Tc, Zc, Yc, Xc, 2, self.n_vec, 2)

    # -- R / P (operand-threaded jits built lazily) ----------------------

    def restrict(self, psi_k):
        """[T,24,Z,YX] -> [Tc,Zc,Yc,Xc,sc,nvec,2]."""
        return _restrict_jit(self.geom, self.Y)(self.V, psi_k)

    def prolong(self, phi):
        """[Tc,Zc,Yc,Xc,sc,nvec,2] -> [T,24,Z,YX]."""
        return _prolong_jit(self.geom, self.Y, self.n_vec)(self.V, phi)

    # -- interop / checkpoint -------------------------------------------

    def to_agg_V(self) -> jnp.ndarray:
        """[Tc,Zc,Yc,Xc,sc,agg,nvec,2] (TransferRC storage) via host numpy
        (checkpoint compatibility)."""
        import mugiq_tpu.pallas.dslash_kernel as dk
        g = self.geom
        bx, by_, bz, bt = g.block
        vs = []
        for w in range(self.n_vec):
            pl = np.asarray(dk.from_kernel_spinor(self.V[w], Y=self.Y))
            rc = np.transpose(pl, (3, 4, 5, 6, 1, 2, 0))  # [T,Z,Y,X,s,c,2]
            T, Z, Y, X = rc.shape[:4]
            r = rc.reshape(T // bt, bt, Z // bz, bz, Y // by_, by_,
                           X // bx, bx, 2, 2, 3, 2)
            r = r.transpose(0, 2, 4, 6, 8, 1, 3, 5, 7, 9, 10, 11)
            vs.append(r.reshape(r.shape[:5] + (g.agg, 2)))
        return jnp.asarray(np.stack(vs, axis=-2))         # [...,agg,nvec,2]

    @classmethod
    def from_agg_V(cls, Vagg, geom: BlockGeometry, Y: int):
        """Inverse of to_agg_V (host-side)."""
        import mugiq_tpu.pallas.dslash_kernel as dk
        bx, by_, bz, bt = geom.block
        v = np.asarray(Vagg)                  # [...,sc,agg,nvec,2]
        n = v.shape[-2]
        v = v.reshape(v.shape[:5] + (bt, bz, by_, bx, 2, 3, n, 2))
        v = v.transpose(11, 0, 5, 1, 6, 2, 7, 3, 8, 4, 9, 10, 12)
        # [n, Tc,bt,Zc,bz,Yc,by,Xc,bx, sc,sb, c, 2] -> rc [n,T,Z,Y,X,s,c,2]
        sh = v.shape
        rc = v.reshape(sh[0], sh[1] * sh[2], sh[3] * sh[4], sh[5] * sh[6],
                       sh[7] * sh[8], 4, 3, 2)
        pl = np.transpose(rc, (0, 7, 5, 6, 1, 2, 3, 4))   # [n,2,s,c,T,Z,Y,X]
        Vk = jnp.stack([dk.to_kernel_spinor(jnp.asarray(
            np.ascontiguousarray(pl[w]), jnp.float32)) for w in range(sh[0])])
        return cls(geom=geom, Y=Y, V=Vk)


@partial(jax.jit, static_argnums=(0, 1))
def _restrict_impl(geom, Y, V, psi_k):
    g = geom
    # per-basis-vector block dots on NATIVE-layout operands (a vmapped
    # split view relayouts V with nvec minor: a 25 GB padded copy at
    # 32^3x64); XLA multi-output-fuses the w reductions into few passes
    S = _S_for(g, Y)
    outs = []
    for w in range(V.shape[0]):
        re, im = _block_dot_fields(V[w], psi_k, g, Y, S)
        outs.append(jnp.stack([re, im], axis=-1))
    out = jnp.stack(outs)                  # [w, Tc, sc, Zc, Yc, Xc, 2]
    return jnp.transpose(out, (1, 3, 4, 5, 2, 0, 6))


def _restrict_jit(geom, Y):
    return lambda V, p: _restrict_impl(geom, Y, V, p)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _prolong_impl(geom, Y, n_vec, V, phi):
    g = geom
    # accumulate per basis vector with NATIVE-layout coefficient fields
    # (see _coef_to_fine: split-view broadcasts blow HBM at 32^3x64)
    outr = outi = None
    for w in range(n_vec):
        prf = _coef_to_fine(jnp.transpose(phi[..., w, 0], (0, 4, 1, 2, 3)),
                            g)
        pif = _coef_to_fine(jnp.transpose(phi[..., w, 1], (0, 4, 1, 2, 3)),
                            g)
        Vr, Vi = V[w, :, :12], V[w, :, 12:]
        tr = Vr * prf - Vi * pif
        ti = Vr * pif + Vi * prf
        outr = tr if outr is None else outr + tr
        outi = ti if outi is None else outi + ti
    return jnp.concatenate([outr, outi], axis=1)


def _prolong_jit(geom, Y, n_vec):
    return lambda V, phi: _prolong_impl(geom, Y, n_vec, V, phi)


def galerkin_wilson_kernel(U_k, Ut_k, kappa: float,
                           transfer: TransferKernelMG) -> StencilOperatorRC:
    """Exact R A P for the fine WILSON level, all compute in the kernel
    layout: probes = masked basis columns, per-direction pallas hops,
    masked multiply+reduce restrictions.  Operands (links, basis) are
    threaded as jit arguments.  Output layout identical to
    galerkin_coarse_operator_rc (flat coarse index i = sc*n_vec + w)."""
    g = transfer.geom
    Y = transfer.Y
    n_vec = transfer.n_vec
    n = 2 * n_vec

    scm = [jnp.asarray(_sc_mask_np(s)) for s in range(2)]
    em = {(mu, sg): jnp.asarray(_edge_mask_np(g, Y, mu, sg))
          for mu in range(4) for sg in (+1, -1)}

    import mugiq_tpu.pallas.dslash_kernel as dk
    X = g.fine_dims[0]
    by_gl = None
    if Y * X > 256:
        feas = [b for b in (4, 8, 16)
                if Y % b == 0 and b < Y and 128 <= b * X <= 512]
        by_gl = min(feas, key=lambda b: abs(b * X - 256)) if feas else 8
    else:
        by_gl = max(b for b in (1, 2, 4) if Y % b == 0 and b < max(Y, 2))

    # FINE-GRAINED jits: one hop executable per direction (the pallas
    # entry point is already jitted on static (Y, by, mu, sign)) plus one
    # small masked-restrict executable, dispatched per probe column — a
    # single fused per-term graph (12 pallas calls + 24 reduce fusions)
    # compiles for tens of minutes through the tunnel at 32^3x64.
    @jax.jit
    def _probe(V, scmask, u):
        return jax.lax.dynamic_index_in_dim(V, u, keepdims=False) * scmask

    @jax.jit
    def _restrict_pair(V, h, emask, scale):
        hs = h * scale
        return (_restrict_impl(g, Y, V, hs * emask),
                _restrict_impl(g, Y, V, hs * (1.0 - emask)))

    @jax.jit
    def _restrict_one(V, h):
        return _restrict_impl(g, Y, V, h)

    mk = jnp.asarray(-kappa, jnp.float32)

    def term(mu, sign, V, U, Ut, scmask, emask):
        ys, ds = [], []
        for u in range(n_vec):
            p = _probe(V, scmask, jnp.asarray(u))
            h = dk.dslash_hop_pallas_gl_dir(p, U, Ut, Y=Y, mu=mu,
                                            sign=sign, by=by_gl)
            yc, dc = _restrict_pair(V, h, emask, mk)
            ys.append(yc)
            ds.append(dc)
        return jnp.stack(ys), jnp.stack(ds)    # [u, Tc,Zc,Yc,Xc,sc,w,2]

    def diag(V, scmask):
        return jnp.stack([_restrict_one(V, _probe(V, scmask, jnp.asarray(u)))
                          for u in range(n_vec)])

    def cols_to_block(cols):
        """[u, Tc,Zc,Yc,Xc,sc,w,2] -> [Tc,Zc,Yc,Xc, n(rows), u, 2]."""
        a = np.asarray(cols)
        a = np.moveaxis(a, 0, -2)               # [Tc,Zc,Yc,Xc,sc,w,u,2]
        sh = a.shape
        return a.reshape(sh[:4] + (sh[4] * sh[5], sh[6], 2))

    D_blocks, Yp_b, Ym_b = [], [[] for _ in range(4)], [[] for _ in range(4)]
    for s in range(2):
        dcols = cols_to_block(diag(transfer.V, scm[s]))
        for mu in range(4):
            yp, dp = term(mu, +1, transfer.V, U_k, Ut_k, scm[s], em[(mu, +1)])
            ym, dm = term(mu, -1, transfer.V, U_k, Ut_k, scm[s], em[(mu, -1)])
            Yp_b[mu].append(cols_to_block(yp))
            Ym_b[mu].append(cols_to_block(ym))
            dcols = dcols + cols_to_block(dp) + cols_to_block(dm)
        D_blocks.append(dcols)

    def assemble(blocks):
        return jnp.asarray(np.concatenate(blocks, axis=-2))

    return StencilOperatorRC(
        D=assemble(D_blocks),
        Yp=[assemble(Yp_b[mu]) for mu in range(4)],
        Ym=[assemble(Ym_b[mu]) for mu in range(4)],
        ns=2, nc=n_vec)
