"""Packed even-odd (half-volume) parity hop + Schur operator (pallas TPU).

The masked Schur operator (dirac_kernel.SchurDiracKernel) runs the full
dslash kernel twice and throws away half of each result with a parity
mask — 2x redundant arithmetic AND traffic on every pc solve (the
reference works on QUDA parity-subset fields instead:
lib/eigsolve_mugiq.cpp:169-181 pc_solve, parity indexing in
lib/mugiq_displace_kernels.cu:3-6).  This module packs fields to half
volume along x and runs a parity-restricted hop kernel.

Packed layout (kernel-native, x packed 2:1):
    psi_p:  [T, 24, Z, Y*Xh]   Xh = X/2; site (t,z,y,xh) of parity p is
                               x = 2*xh + (t+z+y+p) % 2  (x-fastest order)
    U_p:    [T, 4, 18, Z, Y*Xh]  links BASED at parity-p sites

Stencil structure after packing (output parity po, input parity 1-po,
row offset oo = (t+z+y+po) % 2):
    y/z/t hops: the neighbour keeps the SAME packed column xh — identical
        rolls / pipelined t-blocks as the full kernel, just on a
        half-width lane axis;
    x hops: the neighbour is xh or xh+/-1 depending on oo — computed as a
        select between the unshifted and rolled tile against a
        precomputed row-offset mask (VPU-cheap; rows are offset-uniform).
Forward links come from the OUTPUT-parity link array (based at x), the
backward links from the INPUT-parity array at the neighbour site (same
shift rule as the neighbour spinor fetch).

The second hop of the Schur complement fuses the identity combine:
out = psi_e - kappa^2 * hop_eo(hop_oe(psi_e)) in two kernel passes total
(the masked form needs two FULL-volume passes plus the combine).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import EigOperator
from .dslash_kernel import apply_hop, pallas_call_auto


# ---------------------------------------------------------------------------
# pack / unpack (host or traced; cheap gathers, run once per solve)
# ---------------------------------------------------------------------------

def _offsets_np(T, Z, Y, parity):
    """Row x-offset (t+z+y+parity) % 2 as int array [T, Z, Y]."""
    t, z, y = np.meshgrid(np.arange(T), np.arange(Z), np.arange(Y),
                          indexing="ij")
    return ((t + z + y + parity) % 2).astype(np.int32)


def offset_mask(T, Z, Y, Xh, parity, dtype=np.float32):
    """[T, 1, Z, Y*Xh] 0/1 mask of the OUTPUT-row x-offset oo (kernel
    input; rows are offset-uniform so the mask is constant along xh)."""
    off = _offsets_np(T, Z, Y, parity)                      # [T, Z, Y]
    m = np.repeat(off[..., None], Xh, axis=-1)              # [T, Z, Y, Xh]
    return jnp.asarray(m.reshape(T, 1, Z, Y * Xh).astype(dtype))


def pack_parity(field_k: jnp.ndarray, Y: int, parity: int) -> jnp.ndarray:
    """Full kernel-layout field [T, C, Z, Y*X] -> packed [T, C, Z, Y*Xh]
    holding only the parity-`parity` sites (x = 2*xh + (t+z+y+parity)%2)."""
    T, C, Z, YX = field_k.shape
    X = YX // Y
    assert X % 2 == 0, f"x extent must be even to pack parities: {X}"
    Xh = X // 2
    f = field_k.reshape(T, C, Z, Y, Xh, 2)
    off = jnp.asarray(_offsets_np(T, Z, Y, parity))         # [T, Z, Y]
    # elementwise select, NOT take_along_axis: the gather lowering fails
    # to compile on the tunnelled backend at 32^3x64 (605 MB operand)
    sel = (off[:, None, :, :, None] == 0)
    p = jnp.where(sel, f[..., 0], f[..., 1])
    return p.reshape(T, C, Z, Y * Xh)


def unpack_parities(even_k: jnp.ndarray, odd_k: jnp.ndarray, Y: int
                    ) -> jnp.ndarray:
    """Packed (even, odd) [T, C, Z, Y*Xh] -> full [T, C, Z, Y*X]."""
    T, C, Z, YXh = even_k.shape
    Xh = YXh // Y
    e = even_k.reshape(T, C, Z, Y, Xh)
    o = odd_k.reshape(T, C, Z, Y, Xh)
    off = jnp.asarray(_offsets_np(T, Z, Y, 0))[:, None, :, :, None]
    off = jnp.broadcast_to(off, e.shape)
    # even at slot off, odd at slot 1-off
    slot0 = jnp.where(off == 0, e, o)
    slot1 = jnp.where(off == 0, o, e)
    full = jnp.stack([slot0, slot1], axis=-1)               # [...,Xh,2]
    return full.reshape(T, C, Z, Y * 2 * Xh)


def pack_parity_gauge(U_k: jnp.ndarray, Y: int, parity: int) -> jnp.ndarray:
    """[T, 4, 18, Z, Y*X] -> [T, 4, 18, Z, Y*Xh] links based at parity-p
    sites (same packing rule as spinors, applied per direction)."""
    T, MU, C, Z, YX = U_k.shape
    return pack_parity(U_k.reshape(T, MU * C, Z, YX), Y, parity
                       ).reshape(T, MU, C, Z, YX // 2)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _make_parity_kernel(Z: int, Y: int, Xh: int, dagger: bool,
                        combine_kappa2, post_clover: bool = False,
                        comb_clover: bool = False, by: int = None,
                        z_ext: bool = False, y_ext: bool = False,
                        ps: bool = False):
    """Parity-restricted hop kernel body.

    by (optional): grouped-lane tiling — the [Z, Y*Xh] slice views as
    [Z*NBy, by*Xh] (NBy = Y/by, same linear order), keeping whole-t-slice
    blocks under the ~256-lane compile wall at large volumes (YXh = 512 at
    32^3).  Shift rules follow dslash_kernel.make_gl_compute: y is a lane
    roll with a two-level group-edge select, z an exact sublane roll by
    NBy; the packed-x select logic is untouched (x rows stay lane-local).

    refs: pm, pc, pp (input-parity psi t-1/t/t+1), Uo (output-parity links,
    centre), Ui (input-parity links, centre), Utm (input-parity t-links at
    t-1), off (output-row offset mask), [Apost (output-parity clover-inverse
    blocks, post_clover only)], [pe (output-parity psi centre, combine
    only)], [Acomb (output-parity clover blocks, comb_clover only)], out.

    combine_kappa2 = None -> out = hop;
    else out = pe - combine_kappa2 * hop (the fused Schur second pass).

    Clover pc (asymmetric even-even Schur, schur.SchurDirac semantics):
    post_clover applies packed chiral 6x6 blocks to the HOP result
    (out = Apost . hop — the A_oo^{-1} of the first pass), comb_clover
    replaces the combine's diagonal term with Acomb . pe
    (out = A_ee pe - kappa^2 hop).  Blocks are packed as in
    dslash_kernel.pack_clover_kernel144: idx = ((chi*6 + k)*6 + j)*2 + r.
    """
    assert not ((z_ext or y_ext) and by), \
        "halo-extended parity kernels use full-width tiles (by=None)"
    NBy = (Y // by) if by else 1
    Zc = Z + 2 if z_ext else Z            # compute-tile extents (w/ halos)
    Yc = Y + 2 if y_ext else Y
    S = Zc * NBy
    L = (by if by else Yc) * Xh
    f32 = jnp.float32

    def roll(a, shift, axis):
        return pltpu.roll(a, shift % a.shape[axis], axis=axis)

    def zshift(a, sign):
        """a at z+sign (exact sublane roll; stride NBy in gl tiling).  In
        z_ext mode the roll runs on the halo-extended tile — interior rows
        read true neighbours, edge pollution is sliced away at write."""
        return roll(a, -sign * NBy, axis=0)

    def yshift(a, sign):
        """a at y+sign: plain lane roll full-width; two-level group-edge
        select in gl tiling (cross to sublane +/-1 at the group edge, and
        jump -(NBy-1) sublanes at the global y wrap)."""
        if not by:
            return roll(a, -sign * Xh, axis=1)
        main = roll(a, -sign * Xh, axis=1)
        cross = roll(roll(a, -sign, axis=0), sign * (by - 1) * Xh, axis=1)
        ywrap = roll(roll(a, sign * (NBy - 1), axis=0),
                     sign * (by - 1) * Xh, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
        yi = lane // Xh
        yb = sub % NBy
        edge = (yi == (by - 1 if sign > 0 else 0))
        bedge = (yb == (NBy - 1 if sign > 0 else 0))
        return jnp.where(edge, jnp.where(bedge, ywrap, cross), main)

    def clover_mv(A_ref, get):
        """res[s][c] = (re, im) of the chiral 6x6 complex matvec of the
        component getter get(s, c) -> (re, im)."""
        res = [[None] * 3 for _ in range(4)]
        for s in range(4):
            for c in range(3):
                chi, k = s // 2, (s % 2) * 3 + c
                dr = di = None
                for j in range(6):
                    sj, cj = 2 * chi + j // 3, j % 3
                    ar_ = A_ref[0, ((chi * 6 + k) * 6 + j) * 2 + 0
                                ].astype(f32)
                    ai_ = A_ref[0, ((chi * 6 + k) * 6 + j) * 2 + 1
                                ].astype(f32)
                    vr, vi = get(sj, cj)
                    tr = ar_ * vr - ai_ * vi
                    ti = ar_ * vi + ai_ * vr
                    dr = tr if dr is None else dr + tr
                    di = ti if di is None else di + ti
                res[s][c] = (dr, di)
        return res

    def kernel(*refs):
        refs = list(refs)
        pm_ref, pc_ref, pp_ref, Uo_ref, Ui_ref, Utm_ref, off_ref = refs[:7]
        rest = refs[7:]
        Apost_ref = rest.pop(0) if post_clover else None
        pe_ref = rest.pop(0) if combine_kappa2 is not None else None
        Acomb_ref = rest.pop(0) if comb_clover else None
        (out_ref,) = rest

        col = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1) % Xh
        oo = off_ref[0, 0] > 0.5                     # [S, L] bool

        def xroll(a, sign):
            """a at packed column xh+sign with x wrap inside the row."""
            main = roll(a, -sign, axis=1)
            wrapped = roll(a, sign * (Xh - 1), axis=1)
            edge = (col == (Xh - 1 if sign > 0 else 0))
            return jnp.where(edge, wrapped, main)

        def x_fwd(a):
            # neighbour x+1: packed col xh (oo=0) or xh+1 (oo=1)
            return jnp.where(oo, xroll(a, +1), a)

        def x_bwd(a):
            # neighbour x-1: packed col xh-1 (oo=0) or xh (oo=1)
            return jnp.where(oo, a, xroll(a, -1))

        def pref(ref):
            return lambda s, c, r: ref[0, r * 12 + s * 3 + c].astype(f32)

        pm, pc, pp = pref(pm_ref), pref(pc_ref), pref(pp_ref)

        def uo(mu, a, b, r):
            return Uo_ref[0, mu, r * 9 + a * 3 + b].astype(f32)

        def ui(mu, a, b, r):
            return Ui_ref[0, mu, r * 9 + a * 3 + b].astype(f32)

        def utm(a, b, r):
            return Utm_ref[0, r * 9 + a * 3 + b].astype(f32)

        acc = [[None] * 3 for _ in range(4)]

        def add_acc(s, c, vr, vi):
            if acc[s][c] is None:
                acc[s][c] = (vr, vi)
            else:
                ar, ai = acc[s][c]
                acc[s][c] = (ar + vr, ai + vi)

        hop = partial(apply_hop, add_acc, dagger)

        if ps:
            # project-then-shift (see dslash_kernel.make_slice_compute
            # ps=True): forward hops shift the 12 projected components,
            # backward hops form U^dag h at the source site and shift the
            # 12-component product — the packed x selects, y group-edge
            # selects and z rolls all commute with per-site linear maps
            shifts = (x_fwd, lambda v: yshift(v, +1),
                      lambda v: zshift(v, +1))
            shifts_b = (x_bwd, lambda v: yshift(v, -1),
                        lambda v: zshift(v, -1))
            for mu in range(3):
                hop(mu, True,
                    get_psi=pc,
                    get_link=lambda a, b, r, m=mu: uo(m, a, b, r),
                    shift_h=shifts[mu])
                hop(mu, False,
                    get_psi=pc,
                    get_link=lambda a, b, r, m=mu: (
                        ui(m, b, a, r) if r == 0 else -ui(m, b, a, r)),
                    shift_g=shifts_b[mu])
        else:
            # ---- x: phase-masked packed shifts ----
            hop(0, True,
                get_psi=lambda s, c, r: x_fwd(pc(s, c, r)),
                get_link=lambda a, b, r: uo(0, a, b, r))
            hop(0, False,
                get_psi=lambda s, c, r: x_bwd(pc(s, c, r)),
                get_link=lambda a, b, r: (x_bwd(ui(0, b, a, r)) if r == 0
                                          else -x_bwd(ui(0, b, a, r))))
            # ---- y/z: packed column invariant -> lattice-axis shifts ----
            hop(1, True,
                get_psi=lambda s, c, r: yshift(pc(s, c, r), +1),
                get_link=lambda a, b, r: uo(1, a, b, r))
            hop(1, False,
                get_psi=lambda s, c, r: yshift(pc(s, c, r), -1),
                get_link=lambda a, b, r: (
                    yshift(ui(1, b, a, r), -1) if r == 0
                    else -yshift(ui(1, b, a, r), -1)))
            hop(2, True,
                get_psi=lambda s, c, r: zshift(pc(s, c, r), +1),
                get_link=lambda a, b, r: uo(2, a, b, r))
            hop(2, False,
                get_psi=lambda s, c, r: zshift(pc(s, c, r), -1),
                get_link=lambda a, b, r: (
                    zshift(ui(2, b, a, r), -1) if r == 0
                    else -zshift(ui(2, b, a, r), -1)))
        # ---- t: pipelined neighbour blocks ----
        hop(3, True,
            get_psi=lambda s, c, r: pp(s, c, r),
            get_link=lambda a, b, r: uo(3, a, b, r))
        hop(3, False,
            get_psi=lambda s, c, r: pm(s, c, r),
            get_link=lambda a, b, r: (utm(b, a, r) if r == 0
                                      else -utm(b, a, r)))

        if z_ext or y_ext:
            # hop tiles are halo-extended; diagonal/clover/combine operands
            # and the output are interior-only — slice the edge pollution
            # away here (matches dslash_kernel._make_m_kernel)
            slz = slice(NBy, Z * NBy + NBy) if z_ext else slice(None)
            sly = slice(Xh, -Xh) if y_ext else slice(None)
            acc = [[(acc[s][c][0][slz, sly], acc[s][c][1][slz, sly])
                    for c in range(3)] for s in range(4)]

        if Apost_ref is not None:
            # hop -> Apost . hop (the Schur complement's A_oo^{-1})
            acc = clover_mv(Apost_ref, lambda s, c: acc[s][c])

        od = out_ref.dtype
        if pe_ref is not None and Acomb_ref is not None:
            diag = clover_mv(
                Acomb_ref,
                lambda s, c: (pe_ref[0, s * 3 + c].astype(f32),
                              pe_ref[0, 12 + s * 3 + c].astype(f32)))
        for s in range(4):
            for c in range(3):
                hr, hi = acc[s][c]
                if pe_ref is None:
                    out_ref[0, s * 3 + c] = hr.astype(od)
                    out_ref[0, 12 + s * 3 + c] = hi.astype(od)
                else:
                    if Acomb_ref is not None:
                        er, ei = diag[s][c]
                    else:
                        er = pe_ref[0, s * 3 + c].astype(f32)
                        ei = pe_ref[0, 12 + s * 3 + c].astype(f32)
                    out_ref[0, s * 3 + c] = (
                        er - combine_kappa2 * hr).astype(od)
                    out_ref[0, 12 + s * 3 + c] = (
                        ei - combine_kappa2 * hi).astype(od)

    return kernel


def _gl_view(a, S, L):
    """[T, ..., Z, Y*Xh] -> [T, ..., S, L] (free reshape, same order)."""
    return a.reshape(a.shape[:-2] + (S, L))


@partial(jax.jit, static_argnames=("Y", "dagger", "kappa2", "by", "ps"))
def parity_hop_pallas(psi_in, U_out, U_in, Ut_in, off_out, Y: int,
                      dagger: bool = False, kappa2=None, psi_out=None,
                      A_post=None, A_comb=None, by: int = None,
                      ps: bool = False):
    """Hop from the input parity to the output parity on packed fields.

    psi_in   [T, 24, Z, Y*Xh]  input-parity spinor
    U_out    [T, 4, 18, Z, Y*Xh]  output-parity links
    U_in     [T, 4, 18, Z, Y*Xh]  input-parity links
    Ut_in    [T, 18, Z, Y*Xh]     = U_in[:, 3] (t-links pipeline view)
    off_out  [T, 1, Z, Y*Xh]      output-row offset mask (offset_mask)
    kappa2 (static) + psi_out: fused combine psi_out - kappa2 * hop.
    A_post   [T, 144, Z, Y*Xh]   packed OUTPUT-parity clover blocks applied
                                 to the hop result (A_oo^{-1} of the clover
                                 Schur complement's first pass)
    A_comb   [T, 144, Z, Y*Xh]   packed clover blocks on the combine's
                                 diagonal term: out = A psi_out - k^2 hop
                                 (asymmetric even-even pc second pass)
    Links/blocks may be bf16 (f32 in-kernel arithmetic).
    by: grouped-lane tiling (required above the ~256-lane compile wall,
        i.e. Y*Xh > 256 — see _make_parity_kernel).
    """
    T, _, Z, YXh = psi_in.shape
    Xh = YXh // Y
    if by:
        assert Y % by == 0, (Y, by)
        S, L = Z * (Y // by), by * Xh
    else:
        S, L = Z, YXh
    kernel = _make_parity_kernel(Z, Y, Xh, dagger, kappa2,
                                 post_clover=A_post is not None,
                                 comb_clover=A_comb is not None, by=by,
                                 ps=ps)

    def bspec(shape, tmap):
        return pl.BlockSpec(shape, lambda i, tm=tmap: (tm(i),) + (0,) * (
            len(shape) - 1), memory_space=pltpu.VMEM)

    in_specs = [
        bspec((1, 24, S, L), lambda i: (i - 1) % T),
        bspec((1, 24, S, L), lambda i: i),
        bspec((1, 24, S, L), lambda i: (i + 1) % T),
        bspec((1, 4, 18, S, L), lambda i: i),
        bspec((1, 4, 18, S, L), lambda i: i),
        bspec((1, 18, S, L), lambda i: (i - 1) % T),
        bspec((1, 1, S, L), lambda i: i),
    ]
    pg = _gl_view(psi_in, S, L)
    args = [pg, pg, pg, _gl_view(U_out, S, L), _gl_view(U_in, S, L),
            _gl_view(Ut_in, S, L), _gl_view(off_out, S, L)]
    if A_post is not None:
        in_specs.append(bspec((1, 144, S, L), lambda i: i))
        args.append(_gl_view(A_post, S, L))
    if kappa2 is not None:
        in_specs.append(bspec((1, 24, S, L), lambda i: i))
        args.append(_gl_view(psi_out, S, L))
    if A_comb is not None:
        assert kappa2 is not None, "A_comb requires the combine pass"
        in_specs.append(bspec((1, 144, S, L), lambda i: i))
        args.append(_gl_view(A_comb, S, L))
    out = pallas_call_auto(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=bspec((1, 24, S, L), lambda i: i),
        out_shape=jax.ShapeDtypeStruct((T, 24, S, L), psi_in.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)
    return out.reshape(psi_in.shape)


@partial(jax.jit, static_argnames=("Y", "dagger", "kappa2", "by"))
def parity_hop_pallas_ext(psi_ext, U_out, U_in, Ut_in_shift, off_out,
                          Y: int, dagger: bool = False, kappa2=None,
                          psi_out=None, A_post=None, A_comb=None,
                          by: int = None):
    """t-halo-extended parity hop — the sharded twin of parity_hop_pallas.

    psi_ext [T_loc+2, 24, Z, Y*Xh] (rows 0/-1 are ppermuted halos of the
    INPUT parity); U_out/U_in [T_loc, 4, 18, Z, Y*Xh]; Ut_in_shift
    [T_loc, 18, Z, Y*Xh] with Ut_in_shift[i] = U_in_t(global t_i - 1);
    off_out/psi_out/A_* local t slices.  Packed columns are invariant
    under t hops (the row x-offset flips with both t and parity), so the
    halo slices splice in exactly like the full kernel's."""
    Tl = U_out.shape[0]
    _, _, Z, YXh = psi_ext.shape
    Xh = YXh // Y
    if by:
        assert Y % by == 0, (Y, by)
        S, L = Z * (Y // by), by * Xh
    else:
        S, L = Z, YXh
    kernel = _make_parity_kernel(Z, Y, Xh, dagger, kappa2,
                                 post_clover=A_post is not None,
                                 comb_clover=A_comb is not None, by=by)

    def bspec(shape, tmap):
        return pl.BlockSpec(shape, lambda i, tm=tmap: (tm(i),) + (0,) * (
            len(shape) - 1), memory_space=pltpu.VMEM)

    in_specs = [
        bspec((1, 24, S, L), lambda i: i),
        bspec((1, 24, S, L), lambda i: i + 1),
        bspec((1, 24, S, L), lambda i: i + 2),
        bspec((1, 4, 18, S, L), lambda i: i),
        bspec((1, 4, 18, S, L), lambda i: i),
        bspec((1, 18, S, L), lambda i: i),
        bspec((1, 1, S, L), lambda i: i),
    ]
    pg = _gl_view(psi_ext, S, L)
    args = [pg, pg, pg, _gl_view(U_out, S, L), _gl_view(U_in, S, L),
            _gl_view(Ut_in_shift, S, L), _gl_view(off_out, S, L)]
    if A_post is not None:
        in_specs.append(bspec((1, 144, S, L), lambda i: i))
        args.append(_gl_view(A_post, S, L))
    if kappa2 is not None:
        in_specs.append(bspec((1, 24, S, L), lambda i: i))
        args.append(_gl_view(psi_out, S, L))
    if A_comb is not None:
        in_specs.append(bspec((1, 144, S, L), lambda i: i))
        args.append(_gl_view(A_comb, S, L))
    out = pallas_call_auto(
        kernel,
        grid=(Tl,),
        in_specs=in_specs,
        out_specs=bspec((1, 24, S, L), lambda i: i),
        out_shape=jax.ShapeDtypeStruct((Tl, 24, S, L), psi_ext.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)
    return out.reshape((Tl,) + psi_ext.shape[1:])


@partial(jax.jit, static_argnames=("Y", "dagger", "kappa2", "z_ext",
                                   "y_ext"))
def parity_hop_pallas_extzy(psi_ext, U_out_ext, U_in_ext, Ut_in_shift_ext,
                            off_ext, Y: int, dagger: bool = False,
                            kappa2=None, psi_out=None, A_post=None,
                            A_comb=None, z_ext: bool = True,
                            y_ext: bool = False):
    """(t[, z][, y])-halo-extended parity hop — the 2D/3D-mesh local
    stencil of the packed Schur operator (reference pc_solve under any
    --gridsize, /root/reference/lib/eigsolve_mugiq.cpp:169-181).

    psi_ext [Tl+2, 24, Zp, Yp*Xh] with Zp = Zl+2 (z_ext) and Yp = Yl+2
    (y_ext) — halo rows ppermuted by the caller; U/off arrays carry the
    SAME z/y halos on their local-t slices (Ut_in_shift_ext[i] = t-links
    at global t_i - 1; its halo rows may be zero).  psi_out/A_* are
    interior-only local slices.  Full-width tiles (no gl grouping)."""
    Tl = U_out_ext.shape[0]
    Zp = psi_ext.shape[2]
    YXp = psi_ext.shape[3]
    Zl = Zp - 2 if z_ext else Zp
    Yl = Y
    Yp = Yl + 2 if y_ext else Yl
    Xh = YXp // Yp
    YXl = Yl * Xh
    kernel = _make_parity_kernel(Zl, Yl, Xh, dagger, kappa2,
                                 post_clover=A_post is not None,
                                 comb_clover=A_comb is not None,
                                 z_ext=z_ext, y_ext=y_ext)

    def bspec(shape, tmap):
        return pl.BlockSpec(shape, lambda i, tm=tmap: (tm(i),) + (0,) * (
            len(shape) - 1), memory_space=pltpu.VMEM)

    in_specs = [
        bspec((1, 24, Zp, YXp), lambda i: i),
        bspec((1, 24, Zp, YXp), lambda i: i + 1),
        bspec((1, 24, Zp, YXp), lambda i: i + 2),
        bspec((1, 4, 18, Zp, YXp), lambda i: i),
        bspec((1, 4, 18, Zp, YXp), lambda i: i),
        bspec((1, 18, Zp, YXp), lambda i: i),
        bspec((1, 1, Zp, YXp), lambda i: i),
    ]
    args = [psi_ext, psi_ext, psi_ext, U_out_ext, U_in_ext,
            Ut_in_shift_ext, off_ext]
    if A_post is not None:
        in_specs.append(bspec((1, 144, Zl, YXl), lambda i: i))
        args.append(A_post)
    if kappa2 is not None:
        in_specs.append(bspec((1, 24, Zl, YXl), lambda i: i))
        args.append(psi_out)
    if A_comb is not None:
        assert kappa2 is not None, "A_comb requires the combine pass"
        in_specs.append(bspec((1, 144, Zl, YXl), lambda i: i))
        args.append(A_comb)
    return pallas_call_auto(
        kernel,
        grid=(Tl,),
        in_specs=in_specs,
        out_specs=bspec((1, 24, Zl, YXl), lambda i: i),
        out_shape=jax.ShapeDtypeStruct((Tl, 24, Zl, YXl), psi_ext.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)


# ---------------------------------------------------------------------------
# operator
# ---------------------------------------------------------------------------

@dataclass
class SchurDiracKernelPacked:
    """Even-even preconditioned Wilson(-clover) on PACKED half-volume
    fields, on [T, 24, Z, Y*Xh] even-parity spinors:

        Wilson:  M_pc = 1 - kappa^2 D_eo D_oe
        clover:  M_pc = A_ee - kappa^2 D_eo A_oo^{-1} D_oe
                 (asymmetric even-even Schur complement — g5-hermitian,
                 schur.SchurDirac semantics with symmetric=False)

    The packed twin of dirac_kernel.SchurDiracKernel (which masks parities
    on full-volume fields): identical spectrum/action on the even
    subspace, half the arithmetic and traffic per apply.  Reference
    semantics: QUDA_MATPC_EVEN_EVEN pc_solve (eigsolve_mugiq.cpp:169-181).

    A_blocks (optional): chiral-block clover matrix
    (clover_np.clover_chiral_blocks_np, full volume); the site-wise block
    inverse for A_oo^{-1} is computed host-side unless Ainv_blocks is
    given.  Both passes stay single-kernel: pass 1 fuses A_oo^{-1} onto
    the hop result, pass 2 fuses A_ee into the combine.

    precision="bf16": links/clover blocks stored bfloat16, f32
    arithmetic/spinors."""
    U_k: jnp.ndarray          # FULL kernel-layout links [T, 4, 18, Z, Y*X]
    kappa: float
    Y: int
    A_blocks: jnp.ndarray = None      # [T, 2, 6, 6, 2, Z, YX] or None
    Ainv_blocks: jnp.ndarray = None
    precision: str = "f32"
    ps: bool = True           # project-then-shift kernel body (round 5:
                              # ~2.7x less shift/select VPU work; exact
                              # up to f32 op order — bench_ps.json)

    def __post_init__(self):
        from .dslash_kernel import pack_clover_kernel144

        if self.precision == "bf16":
            self.U_k = self.U_k.astype(jnp.bfloat16)
        T, _, _, Z, YX = self.U_k.shape
        Xh = YX // self.Y // 2
        # grouped-lane tiling above the ~256-lane compile wall (packed
        # YXh = 512 at 32^3) — same rule as WilsonDiracKernel's gl default
        self.by = None
        if self.Y * Xh > 256:
            feasible = [b for b in (4, 8, 16)
                        if self.Y % b == 0 and b < self.Y
                        and 128 <= b * Xh <= 512]
            if not feasible:
                raise ValueError(
                    f"no grouped-lane tiling fits packed width "
                    f"Y*Xh={self.Y * Xh} (Y={self.Y}, Xh={Xh})")
            self.by = min(feasible, key=lambda b: abs(b * Xh - 256))
        self.U_e = pack_parity_gauge(self.U_k, self.Y, 0)
        self.U_o = pack_parity_gauge(self.U_k, self.Y, 1)
        self.Ut_e = self.U_e[:, 3]
        self.Ut_o = self.U_o[:, 3]
        self.off_e = offset_mask(T, Z, self.Y, Xh, 0)
        self.off_o = offset_mask(T, Z, self.Y, Xh, 1)
        self.A_e = self.Ainv_o = None
        if self.A_blocks is not None:
            if self.Ainv_blocks is None:
                from ..clover_np import invert_chiral_blocks_np
                self.Ainv_blocks = jnp.asarray(
                    invert_chiral_blocks_np(np.asarray(self.A_blocks)))
            A144 = pack_clover_kernel144(jnp.asarray(self.A_blocks))
            Ainv144 = pack_clover_kernel144(jnp.asarray(self.Ainv_blocks))
            if self.precision == "bf16":
                A144 = A144.astype(jnp.bfloat16)
                Ainv144 = Ainv144.astype(jnp.bfloat16)
            self.A_e = pack_parity(A144, self.Y, 0)
            self.Ainv_o = pack_parity(Ainv144, self.Y, 1)

    # packing helpers for even-parity fields
    def pack_even(self, psi_k):
        return pack_parity(psi_k, self.Y, 0)

    def unpack_even(self, pe):
        return unpack_parities(pe, jnp.zeros_like(pe), self.Y)

    def _apply(self, pe, U_e, Ut_e, U_o, Ut_o, off_e, off_o, dagger):
        # clover: M = A_ee pe - k^2 D_eo A_oo^{-1} D_oe pe; Mdag has the
        # identical two-pass structure with the dagger hop kernels (the
        # chiral blocks are Hermitian, A^dag = A)
        d_oe = parity_hop_pallas(pe, U_o, U_e, Ut_e, off_o, Y=self.Y,
                                 dagger=dagger, A_post=self.Ainv_o,
                                 by=self.by, ps=self.ps)
        return parity_hop_pallas(d_oe, U_e, U_o, Ut_o, off_e, Y=self.Y,
                                 dagger=dagger,
                                 kappa2=float(self.kappa) ** 2, psi_out=pe,
                                 A_comb=self.A_e, by=self.by, ps=self.ps)

    def M(self, pe):
        return self._apply(pe, self.U_e, self.Ut_e, self.U_o, self.Ut_o,
                           self.off_e, self.off_o, False)

    def Mdag(self, pe):
        return self._apply(pe, self.U_e, self.Ut_e, self.U_o, self.Ut_o,
                           self.off_e, self.off_o, True)

    def MdagM(self, pe):
        return self.Mdag(self.M(pe))

    def MMdag(self, pe):
        return self.M(self.Mdag(pe))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM,
                EigOperator.MMdag: self.MMdag}[which]

    def operator_with_args(self, which: EigOperator):
        """(fn, args) with the packed link/mask operands as explicit jit
        arguments (keeps them out of the eigensolver-cycle HLO; see
        WilsonDiracKernel.operator_with_args)."""
        Y, k2, by, ps = self.Y, float(self.kappa) ** 2, self.by, self.ps

        def m(pe, U_e, Ut_e, U_o, Ut_o, off_e, off_o, A_e, Ainv_o, dagger):
            d = parity_hop_pallas(pe, U_o, U_e, Ut_e, off_o, Y=Y,
                                  dagger=dagger, A_post=Ainv_o, by=by,
                                  ps=ps)
            return parity_hop_pallas(d, U_e, U_o, Ut_o, off_e, Y=Y,
                                     dagger=dagger, kappa2=k2, psi_out=pe,
                                     A_comb=A_e, by=by, ps=ps)

        fns = {
            EigOperator.M: lambda p, *a: m(p, *a, False),
            EigOperator.Mdag: lambda p, *a: m(p, *a, True),
            EigOperator.MdagM: lambda p, *a: m(m(p, *a, False), *a, True),
            EigOperator.MMdag: lambda p, *a: m(m(p, *a, True), *a, False),
        }
        return fns[which], (self.U_e, self.Ut_e, self.U_o, self.Ut_o,
                            self.off_e, self.off_o, self.A_e, self.Ainv_o)

    @property
    def field_shape(self):
        T, _, _, Z, YX = self.U_k.shape
        return (T, 24, Z, YX // 2)

    @property
    def dtype(self):
        return jnp.float32
