"""Pallas TPU kernel for the Wilson hopping term.

The XLA formulations leave the dslash ~10 HBM passes from optimal (measured:
einsum 52ms, fully-unrolled elementwise 5.6ms on 16^3x32 f32, vs ~0.6ms of
minimum traffic at the chip's achieved bandwidth).  This kernel makes the
fusion explicit: one grid step per time slice, all 8 directed hops computed
from VMEM, one read of psi/links per application.

Layouts (kernel-native):
    psi:  [T, 24, Z, Y*X]   (24 = spin*color*(re,im); site dims minor)
    U:    [T, 4, 18, Z, Y*X] (18 = 3*3*(re,im))
    Y*X fused so the lane dimension is full (Y*X >= 256 for 16^3);
    in-VMEM neighbour fetches are pltpu.roll on [Z, Y*X] tiles, with the
    fused-axis x-wrap fixed up by an edge mask (y-rolls are exact rolls by
    ±X on the fused axis; z-rolls roll the sublane axis).

Time neighbours come from extra pipelined input blocks of the same arrays
with modular index maps ((i±1) % T) — no ghost zones, no host halo copies.
The reference implements the same operation as a CUDA kernel over ghost
zones (SURVEY.md §2.3 'dslash/stencil operator'); here periodic wrap +
XLA/Pallas pipelining replace the ghost machinery.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.dslash import _projector_decomp


def pallas_call_auto(*args, **kwargs):
    """pl.pallas_call with interpret mode on the CPU backend (compiled
    pallas is TPU-only; CPU runs — tests, validation — emulate)."""
    if jax.default_backend() == "cpu":
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)


# ---------------------------------------------------------------------------
# layout converters (planar [2,4,3,T,Z,Y,X] <-> kernel [T,24,Z,Y*X])
# ---------------------------------------------------------------------------

def to_kernel_spinor(p):
    """planar [2,4,3,T,Z,Y,X] -> [T, 24, Z, Y*X] with comp = r*12 + s*3 + c.

    r-major component order keeps the re/im halves contiguous on the
    component axis, so the Krylov algebra can view them without relayout
    (k[:, :12] / k[:, 12:])."""
    r, s, c, T, Z, Y, X = p.shape
    q = jnp.transpose(p, (3, 0, 1, 2, 4, 5, 6))      # [T,2,4,3,Z,Y,X]
    return q.reshape(T, 24, Z, Y * X)


def from_kernel_spinor(k, Y):
    T, comp, Z, YX = k.shape
    X = YX // Y
    q = k.reshape(T, 2, 4, 3, Z, Y, X)
    return jnp.transpose(q, (1, 2, 3, 0, 4, 5, 6))


def to_kernel_gauge(u):
    """planar [2,4,3,3,T,Z,Y,X] -> [T, 4, 18, Z, Y*X], comp = r*9 + a*3 + b."""
    r, mu, a, b, T, Z, Y, X = u.shape
    q = jnp.transpose(u, (4, 1, 0, 2, 3, 5, 6, 7))   # [T,4,2,3,3,Z,Y,X]
    return q.reshape(T, 4, 18, Z, Y * X)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _qr(mu, forward):
    q, r = _projector_decomp()[(mu, "fwd" if forward else "bwd")]
    return q, r


def apply_hop(add_acc, dagger, mu, forward, get_psi, get_link,
              shift_h=None, shift_g=None):
    """One directed Wilson hop: project-to-half-spinor, SU(3) multiply,
    reconstruct, accumulate via add_acc(s, c, re, im).

    get_psi(s,c,r)->[Z,YX] neighbour spinor component, get_link(a,b,r)->
    [Z,YX] link component (link dagger handled by caller swapping (a,b)
    and negating im).  dagger=True computes the adjoint hop D^dag =
    g5 D g5: the link structure is identical, only the spin projectors
    swap sign of gamma ((1 -/+ g) -> (1 +/- g)) — g5 is fused away.
    Shared by the full-volume kernels (make_slice_compute) and the packed
    even-odd parity kernel (schur_kernel).

    shift_h / shift_g (optional, project-then-shift mode): get_psi /
    get_link then return SOURCE-site components and the shift is applied
    once to the 12 projected (shift_h, forward hops) or link-multiplied
    (shift_g, backward hops) components — shifts commute with per-site
    linear maps, and this cuts shifted tiles per spatial hop pair from
    24+24+18 to 12+12."""
    # operator dagger: swapped spin projectors (g5 fused away)
    q, r = _qr(mu, forward != dagger)
    # project to half spinor h[hs][c]
    h = {}
    for hs in range(2):
        for c in range(3):
            hr = hi = None
            for s in range(4):
                coeff = q[hs, s]
                if coeff == 0:
                    continue
                cr, ci = float(coeff.real), float(coeff.imag)
                pr = get_psi(s, c, 0)
                pi = get_psi(s, c, 1)
                tr = ti = None
                if cr != 0.0:
                    tr = pr * cr
                    ti = pi * cr
                if ci != 0.0:
                    tr = (-pi * ci) if tr is None else tr - pi * ci
                    ti = (pr * ci) if ti is None else ti + pr * ci
                hr = tr if hr is None else hr + tr
                hi = ti if hi is None else hi + ti
            h[(hs, c)] = (hr, hi)
    if shift_h is not None:
        # project-then-shift: the spin projection is per-site linear, so
        # shifting the 12 half-spinor components replaces shifting the 24
        # psi components (see make_slice_compute ps=True)
        h = {k: (shift_h(v[0]), shift_h(v[1])) for k, v in h.items()}
    # link multiply g[hs][a] = sum_b U[a,b] h[hs][b]
    g = {}
    for hs in range(2):
        for a in range(3):
            gr = gi = None
            for b in range(3):
                ur = get_link(a, b, 0)
                ui = get_link(a, b, 1)
                hr, hi = h[(hs, b)]
                tr = ur * hr - ui * hi
                ti = ur * hi + ui * hr
                gr = tr if gr is None else gr + tr
                gi = ti if gi is None else gi + ti
            g[(hs, a)] = (gr, gi)
    if shift_g is not None:
        # backward hops: U^dag(x-mu) h(x-mu) computed at the SOURCE site
        # and the 12-component product shifted once — replaces shifting 18
        # link + 24 psi components
        g = {k: (shift_g(v[0]), shift_g(v[1])) for k, v in g.items()}
    # reconstruct out[s][c] += r[s, hs] g[hs][c]
    for s in range(4):
        for hs in range(2):
            coeff = r[s, hs]
            if coeff == 0:
                continue
            cr, ci = float(coeff.real), float(coeff.imag)
            for c in range(3):
                gr, gi = g[(hs, c)]
                vr = vi = None
                if cr != 0.0:
                    vr = gr * cr
                    vi = gi * cr
                if ci != 0.0:
                    vr = (-gi * ci) if vr is None else vr - gi * ci
                    vi = (gr * ci) if vi is None else vi + gr * ci
                add_acc(s, c, vr, vi)


def make_slice_compute(Z: int, Y: int, X: int, dagger: bool = False,
                       ps: bool = False):
    """Per-time-slice dslash body, parameterised over component getters.

    Returns compute(pm, pc, pp, uc, utm, write) where pm/pc/pp(s, c, r) give
    the t-1 / t / t+1 neighbour spinor components as [Z, YX] arrays,
    uc(mu, a, b, r) / utm(a, b, r) the link components, and
    write(s, c, re, im) stores the result.  Shared between the
    BlockSpec-pipelined kernel and the manual-DMA t-blocked kernel.

    dagger=True computes the adjoint hopping term D^dag = g5 D g5: the link
    structure is identical, only the spin projectors swap sign of gamma
    ((1 -/+ g) -> (1 +/- g)) — g5 is fused away entirely.

    ps=True: project-then-shift — spatial shifts are applied to the 12
    projected half-spinor components (forward hops) / the 12 link-
    multiplied components (backward hops, links fetched at the SOURCE
    site) instead of to 24 psi + 18 link components.  Shifts commute
    with per-site linear maps, so the result is exact up to f32 op
    order; the shift/select VPU work drops ~2.7x.
    """
    YX = Y * X

    def roll(a, shift: int, axis: int):
        """pltpu.roll with any-sign shift (the primitive wants shift >= 0)."""
        n = a.shape[axis]
        return pltpu.roll(a, shift % n, axis=axis)

    def shift_site(a, mu: int, sign: int, col):
        """a(x + sign*mu_hat) for a [Z, YX] array; mu in {0(x),1(y),2(z)}."""
        if mu == 0:
            main = roll(a, -sign, axis=1)
            wrapped = roll(a, sign * (X - 1), axis=1)
            edge = (col == (X - 1 if sign > 0 else 0))
            return jnp.where(edge, wrapped, main)
        if mu == 1:
            return roll(a, -sign * X, axis=1)
        return roll(a, -sign, axis=0)

    def compute(pm, pc, pp, uc, utm, write):
        col = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 1) % X

        acc = [[None] * 3 for _ in range(4)]   # acc[s][c] = (re, im)

        def add_acc(s, c, vr, vi):
            if acc[s][c] is None:
                acc[s][c] = (vr, vi)
            else:
                ar, ai = acc[s][c]
                acc[s][c] = (ar + vr, ai + vi)

        def hop(mu, forward, get_psi, get_link, **kw):
            apply_hop(add_acc, dagger, mu, forward, get_psi, get_link, **kw)

        # ---- spatial directions: neighbours via in-VMEM shifts ----
        for mu in range(3):
            if ps:
                # forward: project at x+mu, shift the half spinor
                hop(mu, True,
                    get_psi=pc,
                    get_link=lambda a, b, r, m=mu: uc(m, a, b, r),
                    shift_h=lambda v, m=mu: shift_site(v, m, +1, col))
                # backward: U^dag(x-mu) h(x-mu) formed at the source site,
                # the 12-component product shifted once
                hop(mu, False,
                    get_psi=pc,
                    get_link=lambda a, b, r, m=mu: (
                        uc(m, b, a, r) if r == 0 else -uc(m, b, a, r)),
                    shift_g=lambda v, m=mu: shift_site(v, m, -1, col))
                continue
            # forward: (1 - g) U_mu(x) psi(x+mu)
            hop(mu, True,
                get_psi=lambda s, c, r, m=mu: shift_site(pc(s, c, r), m, +1, col),
                get_link=lambda a, b, r, m=mu: uc(m, a, b, r))
            # backward: (1 + g) U_mu(x-mu)^dag psi(x-mu)
            hop(mu, False,
                get_psi=lambda s, c, r, m=mu: shift_site(pc(s, c, r), m, -1, col),
                get_link=lambda a, b, r, m=mu: (
                    shift_site(uc(m, b, a, r), m, -1, col)
                    if r == 0 else
                    -shift_site(uc(m, b, a, r), m, -1, col)))
        # ---- time direction: neighbours from the t±1 slices ----
        hop(3, True,
            get_psi=lambda s, c, r: pp(s, c, r),
            get_link=lambda a, b, r: uc(3, a, b, r))
        hop(3, False,
            get_psi=lambda s, c, r: pm(s, c, r),
            get_link=lambda a, b, r: (utm(b, a, r) if r == 0 else -utm(b, a, r)))

        for s in range(4):
            for c in range(3):
                ar, ai = acc[s][c]
                write(s, c, ar, ai)

    return compute


def _make_kernel(Z: int, Y: int, X: int, dagger: bool = False,
                 z_ext: bool = False, y_ext: bool = False,
                 ps: bool = False):
    """BlockSpec-pipelined kernel (one t-slice per grid step).

    z_ext=True: input blocks carry one halo row on each side of the z axis
    (sharded-z operation).  All VPU work runs on the extended [Z+2, YX]
    tiles — the z-rolls then read the halo rows for the interior — and only
    the interior rows are written out.  The two wrapped edge rows of a roll
    land in the halo rows, which are never written.

    y_ext=True: input blocks additionally carry one halo y-ROW (X lanes) on
    each side of the fused y*x axis (sharded-y operation, 3D mesh).  The
    stencil body treats them as two extra y rows — x-wraps stay row-local,
    y-rolls read them for the interior — and the store skips them.

    Inputs may be bf16 (QUDA's half-precision analog): every load is upcast
    to f32, all arithmetic is f32, the store casts to the output dtype.
    """
    Zc = Z + 2 if z_ext else Z
    Yc = Y + 2 if y_ext else Y
    compute = make_slice_compute(Zc, Yc, X, dagger=dagger, ps=ps)
    sl = slice(1, Z + 1) if z_ext else slice(None)
    sly = slice(X, -X) if y_ext else slice(None)
    f32 = jnp.float32

    def kernel(pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref, out_ref):
        def pref(ref):
            return lambda s, c, r: ref[0, r * 12 + s * 3 + c].astype(f32)

        od = out_ref.dtype

        def write(s, c, ar, ai):
            out_ref[0, s * 3 + c] = ar[sl, sly].astype(od)
            out_ref[0, 12 + s * 3 + c] = ai[sl, sly].astype(od)

        compute(pref(pm_ref), pref(pc_ref), pref(pp_ref),
                lambda mu, a, b, r: Uc_ref[0, mu, r * 9 + a * 3 + b
                                           ].astype(f32),
                lambda a, b, r: Utm_ref[0, r * 9 + a * 3 + b].astype(f32),
                write)

    return kernel


def _make_m_kernel(Z: int, Y: int, X: int, kappa: float, dagger: bool,
                   clover: bool, z_ext: bool = False, y_ext: bool = False,
                   ps: bool = False):
    """Fused full-operator kernel: out = A psi - kappa * hop(psi)
    (A = 1 without clover).  The clover matrix arrives as chiral 6x6 blocks
    flattened to 144 components: idx = ((chi*6 + k)*6 + j)*2 + r.

    z_ext=True: spinor/gauge input blocks carry one z-halo row each side
    (sharded-z operation, see shard_dslash); the clover block carries only
    the Z interior rows (it is site-local), and only interior rows are
    written.  y_ext=True: one y-halo row (X lanes) each side of the fused
    axis (see _make_kernel).

    Inputs may be bf16: loads upcast to f32, f32 arithmetic, store casts to
    the output dtype."""
    Zc = Z + 2 if z_ext else Z
    Yc = Y + 2 if y_ext else Y
    compute = make_slice_compute(Zc, Yc, X, dagger=dagger, ps=ps)
    sl = slice(1, Z + 1) if z_ext else slice(None)
    sly = slice(X, -X) if y_ext else slice(None)
    f32 = jnp.float32

    def kernel(*refs):
        if clover:
            pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref, A_ref, out_ref = refs
        else:
            pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref = refs[:5]
            A_ref = None
            out_ref = refs[5]

        def pref(ref):
            return lambda s, c, r: ref[0, r * 12 + s * 3 + c].astype(f32)

        hop = {}

        def write(s, c, ar, ai):
            hop[(s, c)] = (ar, ai)

        compute(pref(pm_ref), pref(pc_ref), pref(pp_ref),
                lambda mu, a, b, r: Uc_ref[0, mu, r * 9 + a * 3 + b
                                           ].astype(f32),
                lambda a, b, r: Utm_ref[0, r * 9 + a * 3 + b].astype(f32),
                write)

        # diagonal + combine on interior rows only
        od = out_ref.dtype
        pc = lambda s, c, r: pref(pc_ref)(s, c, r)[sl, sly]
        for s in range(4):
            for c in range(3):
                hr, hi = hop[(s, c)]
                hr, hi = hr[sl, sly], hi[sl, sly]
                if A_ref is None:
                    dr = pc(s, c, 0)
                    di = pc(s, c, 1)
                else:
                    # chiral 6x6 complex matvec, unrolled
                    chi, k = s // 2, (s % 2) * 3 + c
                    dr = di = None
                    for j in range(6):
                        sj, cj = 2 * chi + j // 3, j % 3
                        ar_ = A_ref[0, ((chi * 6 + k) * 6 + j) * 2 + 0
                                    ].astype(f32)
                        ai_ = A_ref[0, ((chi * 6 + k) * 6 + j) * 2 + 1
                                    ].astype(f32)
                        vr = pc(sj, cj, 0)
                        vi = pc(sj, cj, 1)
                        tr = ar_ * vr - ai_ * vi
                        ti = ar_ * vi + ai_ * vr
                        dr = tr if dr is None else dr + tr
                        di = ti if di is None else di + ti
                out_ref[0, s * 3 + c] = (dr - kappa * hr).astype(od)
                out_ref[0, 12 + s * 3 + c] = (di - kappa * hi).astype(od)

    return kernel


def pack_clover_kernel144(A_blocks: jnp.ndarray) -> jnp.ndarray:
    """[T, 2, 6, 6, 2, Z, YX] -> [T, 144, Z, YX] (fused-M kernel packing)."""
    T = A_blocks.shape[0]
    Z, YX = A_blocks.shape[-2:]
    return A_blocks.reshape(T, 144, Z, YX)


@partial(jax.jit, static_argnames=("Y", "kappa", "dagger", "has_clover",
                                   "out_dtype", "ps"))
def wilson_m_pallas(psi_k: jnp.ndarray, U_k: jnp.ndarray, Ut_k: jnp.ndarray,
                    A144, Y: int, kappa: float, dagger: bool = False,
                    has_clover: bool = False,
                    out_dtype=None, ps: bool = False) -> jnp.ndarray:
    """Fused M(dag) application: A psi - kappa * hop (one kernel pass).

    A144: [T, 144, Z, YX] packed clover blocks (ignored unless has_clover).
    Inputs may be bf16 (f32 in-kernel arithmetic); out_dtype defaults to
    psi_k's dtype."""
    T, _, Z, YX = psi_k.shape
    X = YX // Y
    kernel = _make_m_kernel(Z, Y, X, kappa, dagger, has_clover, ps=ps)

    spec_c = pl.BlockSpec((1, 24, Z, YX), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, 24, Z, YX), lambda i: ((i - 1) % T, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, 24, Z, YX), lambda i: ((i + 1) % T, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((1, 4, 18, Z, YX), lambda i: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_ut = pl.BlockSpec((1, 18, Z, YX), lambda i: ((i - 1) % T, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [spec_m, spec_c, spec_p, spec_u, spec_ut]
    args = [psi_k, psi_k, psi_k, U_k, Ut_k]
    if has_clover:
        in_specs.append(pl.BlockSpec((1, 144, Z, YX), lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(A144)
    return pallas_call_auto(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 24, Z, YX), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(psi_k.shape,
                                       out_dtype or psi_k.dtype),
    )(*args)


@partial(jax.jit, static_argnames=("Y", "dagger", "out_dtype", "ps"))
def dslash_hop_pallas(psi_k: jnp.ndarray, U_k: jnp.ndarray, Ut_k: jnp.ndarray,
                      Y: int, dagger: bool = False,
                      out_dtype=None, ps: bool = False) -> jnp.ndarray:
    """Hopping term on kernel-layout arrays.

    psi_k [T, 24, Z, YX]; U_k [T, 4, 18, Z, YX]; Ut_k [T, 18, Z, YX] is the
    t-links view U_k[:, 3] (passed separately so the (i-1)%T block pipeline
    only fetches the t-direction links).  Inputs may be bf16 (f32 in-kernel
    arithmetic); out_dtype defaults to psi_k's dtype.
    """
    T, _, Z, YX = psi_k.shape
    X = YX // Y

    kernel = _make_kernel(Z, Y, X, dagger=dagger, ps=ps)

    spec_c = pl.BlockSpec((1, 24, Z, YX), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, 24, Z, YX), lambda i: ((i - 1) % T, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, 24, Z, YX), lambda i: ((i + 1) % T, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((1, 4, 18, Z, YX), lambda i: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_ut = pl.BlockSpec((1, 18, Z, YX), lambda i: ((i - 1) % T, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    flops = 1320 * T * Z * YX
    bytes_accessed = 4 * (3 * psi_k.size // T * T  # approx: psi x3
                          + U_k.size + Ut_k.size + psi_k.size)
    return pallas_call_auto(
        kernel,
        grid=(T,),
        in_specs=[spec_m, spec_c, spec_p, spec_u, spec_ut],
        out_specs=pl.BlockSpec((1, 24, Z, YX), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(psi_k.shape,
                                       out_dtype or psi_k.dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
    )(psi_k, psi_k, psi_k, U_k, Ut_k)


# ---------------------------------------------------------------------------
# grouped-lane kernel (large lattices, the fast path)
# ---------------------------------------------------------------------------

def make_gl_shift(NBy: int, by: int, X: int, S: int, L: int):
    """Site-shift factory for the grouped-lane view (sublane s = z*NBy+yb,
    lane l = yi*X + x).  Returns make() -> shift_site(a, mu, sign), to be
    called INSIDE a kernel body (the iotas must be traced there).  Shared
    by the dslash/hop kernels and the covariant-displacement kernel."""

    def roll(a, shift: int, axis: int):
        return pltpu.roll(a, shift % a.shape[axis], axis=axis)

    def make():
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
        x_id = lane % X
        yi = lane // X
        yb = sub % NBy

        def shift_site(a, mu: int, sign: int):
            if mu == 0:                       # x: lane roll + row wrap
                main = roll(a, -sign, axis=1)
                wrapped = roll(a, sign * (X - 1), axis=1)
                edge = (x_id == (X - 1 if sign > 0 else 0))
                return jnp.where(edge, wrapped, main)
            if mu == 1:                       # y: lane roll + group cross
                main = roll(a, -sign * X, axis=1)
                # group edge: cross to sublane +/-1, lane wraps to the
                # opposite end of the group
                cross = roll(roll(a, -sign, axis=0),
                             sign * (by - 1) * X, axis=1)
                # global y wrap: sublane jumps by -(NBy-1) instead of +1
                ywrap = roll(roll(a, sign * (NBy - 1), axis=0),
                             sign * (by - 1) * X, axis=1)
                edge = (yi == (by - 1 if sign > 0 else 0))
                bedge = (yb == (NBy - 1 if sign > 0 else 0))
                return jnp.where(edge, jnp.where(bedge, ywrap, cross), main)
            return roll(a, -sign * NBy, axis=0)   # z: exact sublane roll

        return shift_site

    return make


def make_gl_compute(Z: int, NBy: int, by: int, X: int, dagger: bool = False,
                    dirs=None, ps: bool = False):
    """Per-t-slice dslash body on the grouped-lane layout.

    The [Z, Y*X] minor dims of the kernel layout reshape FREELY (same
    linear order) to [Z*NBy, by*X] with sublane s = z*NBy + yb and lane
    l = yi*X + x (y = yb*by + yi).  This keeps one whole t-slice per grid
    step at any volume with a 128/256-lane tile — full-width [Z, Y*X]
    tiles stop compiling above ~256 lanes, and the y-blocked grid
    (dslash_hop_pallas_yb) pays strided 192-lane DMA (measured: copy
    bound drops to 328 GB/s) plus per-tile halo concats.

    Shifts: x as in the base kernel (lane roll + edge wrap);
    y = lane roll by X with a two-level select at the group edge
    (yi==by-1 crosses to sublane+1; yb==NBy-1 additionally wraps y);
    z = EXACT sublane roll by NBy; t = pipelined neighbour blocks.

    dirs (optional): restrict to a subset of hop directions, as a
    collection of (mu, sign) pairs — the per-direction hops the MG
    Galerkin probing needs (rc/planar per-direction hops cannot compile
    at 32^3 on this backend: their layouts relayout catastrophically).
    """
    S = Z * NBy
    L = by * X
    make_shift = make_gl_shift(NBy, by, X, S, L)

    def compute(pm, pc, pp, uc, utm, write):
        shift_site = make_shift()

        acc = [[None] * 3 for _ in range(4)]

        def add_acc(s, c, vr, vi):
            if acc[s][c] is None:
                acc[s][c] = (vr, vi)
            else:
                ar, ai = acc[s][c]
                acc[s][c] = (ar + vr, ai + vi)

        hop = partial(apply_hop, add_acc, dagger)
        want = (lambda mu, sg: dirs is None or (mu, sg) in dirs)

        for mu in range(3):
            if want(mu, +1):
                if ps:
                    # project-then-shift (see make_slice_compute ps=True)
                    hop(mu, True,
                        get_psi=pc,
                        get_link=lambda a, b, r, m=mu: uc(m, a, b, r),
                        shift_h=lambda v, m=mu: shift_site(v, m, +1))
                else:
                    hop(mu, True,
                        get_psi=lambda s, c, r, m=mu: shift_site(pc(s, c, r),
                                                                 m, +1),
                        get_link=lambda a, b, r, m=mu: uc(m, a, b, r))
            if want(mu, -1):
                if ps:
                    hop(mu, False,
                        get_psi=pc,
                        get_link=lambda a, b, r, m=mu: (
                            uc(m, b, a, r) if r == 0 else -uc(m, b, a, r)),
                        shift_g=lambda v, m=mu: shift_site(v, m, -1))
                else:
                    hop(mu, False,
                        get_psi=lambda s, c, r, m=mu: shift_site(pc(s, c, r),
                                                                 m, -1),
                        get_link=lambda a, b, r, m=mu: (
                            shift_site(uc(m, b, a, r), m, -1)
                            if r == 0 else
                            -shift_site(uc(m, b, a, r), m, -1)))
        if want(3, +1):
            hop(3, True,
                get_psi=lambda s, c, r: pp(s, c, r),
                get_link=lambda a, b, r: uc(3, a, b, r))
        if want(3, -1):
            hop(3, False,
                get_psi=lambda s, c, r: pm(s, c, r),
                get_link=lambda a, b, r: (utm(b, a, r) if r == 0
                                          else -utm(b, a, r)))

        zero = jnp.zeros((S, L), jnp.float32)
        for s in range(4):
            for c in range(3):
                ar, ai = acc[s][c] if acc[s][c] is not None else (zero, zero)
                write(s, c, ar, ai)

    return compute


def _make_gl_kernel(Z, NBy, by, X, kappa=None, dagger=False, clover=False,
                    dirs=None, ps=False):
    """Fused M(dag) (or hop, kappa=None) kernel on the grouped-lane view."""
    compute = make_gl_compute(Z, NBy, by, X, dagger=dagger, dirs=dirs, ps=ps)
    f32 = jnp.float32

    def kernel(*refs):
        if clover:
            pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref, A_ref, out_ref = refs
        else:
            pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref = refs[:5]
            A_ref = None
            out_ref = refs[5]

        def pref(ref):
            return lambda s, c, r: ref[0, r * 12 + s * 3 + c].astype(f32)

        od = out_ref.dtype
        if kappa is None:
            def write(s, c, ar, ai):
                out_ref[0, s * 3 + c] = ar.astype(od)
                out_ref[0, 12 + s * 3 + c] = ai.astype(od)

            compute(pref(pm_ref), pref(pc_ref), pref(pp_ref),
                    lambda mu, a, b, r: Uc_ref[0, mu, r * 9 + a * 3 + b
                                               ].astype(f32),
                    lambda a, b, r: Utm_ref[0, r * 9 + a * 3 + b
                                            ].astype(f32),
                    write)
            return

        hop = {}

        def write(s, c, ar, ai):
            hop[(s, c)] = (ar, ai)

        compute(pref(pm_ref), pref(pc_ref), pref(pp_ref),
                lambda mu, a, b, r: Uc_ref[0, mu, r * 9 + a * 3 + b
                                           ].astype(f32),
                lambda a, b, r: Utm_ref[0, r * 9 + a * 3 + b].astype(f32),
                write)
        pcd = pref(pc_ref)
        for s in range(4):
            for c in range(3):
                hr, hi = hop[(s, c)]
                if A_ref is None:
                    dr = pcd(s, c, 0)
                    di = pcd(s, c, 1)
                else:
                    chi, k = s // 2, (s % 2) * 3 + c
                    dr = di = None
                    for j in range(6):
                        sj, cj = 2 * chi + j // 3, j % 3
                        ar_ = A_ref[0, ((chi * 6 + k) * 6 + j) * 2
                                    + 0].astype(f32)
                        ai_ = A_ref[0, ((chi * 6 + k) * 6 + j) * 2
                                    + 1].astype(f32)
                        vr, vi = pcd(sj, cj, 0), pcd(sj, cj, 1)
                        tr = ar_ * vr - ai_ * vi
                        ti = ar_ * vi + ai_ * vr
                        dr = tr if dr is None else dr + tr
                        di = ti if di is None else di + ti
                out_ref[0, s * 3 + c] = (dr - kappa * hr).astype(od)
                out_ref[0, 12 + s * 3 + c] = (di - kappa * hi).astype(od)

    return kernel


def _gl_call(psi_k, U_k, Ut_k, A144, Y, by, kappa, clover, dagger,
             out_dtype, dirs=None, ps=False):
    T, _, Z, YX = psi_k.shape
    X = YX // Y
    assert Y % by == 0, (Y, by)
    NBy = Y // by
    S, L = Z * NBy, by * X
    kernel = _make_gl_kernel(Z, NBy, by, X, kappa=kappa, clover=clover,
                             dagger=dagger, dirs=dirs, ps=ps)
    # reshapes below are free: [Z, Y*X] -> [Z*NBy, by*X] is the same
    # linear order
    psi_g = psi_k.reshape(T, 24, S, L)
    U_g = U_k.reshape(T, 4, 18, S, L)
    Ut_g = Ut_k.reshape(T, 18, S, L)

    def bs(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    in_specs = [
        bs((1, 24, S, L), lambda i: ((i - 1) % T, 0, 0, 0)),
        bs((1, 24, S, L), lambda i: (i, 0, 0, 0)),
        bs((1, 24, S, L), lambda i: ((i + 1) % T, 0, 0, 0)),
        bs((1, 4, 18, S, L), lambda i: (i, 0, 0, 0, 0)),
        bs((1, 18, S, L), lambda i: ((i - 1) % T, 0, 0, 0)),
    ]
    args = [psi_g, psi_g, psi_g, U_g, Ut_g]
    if clover:
        in_specs.append(bs((1, 144, S, L), lambda i: (i, 0, 0, 0)))
        args.append(A144.reshape(T, 144, S, L))
    out = pallas_call_auto(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=bs((1, 24, S, L), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 24, S, L),
                                       out_dtype or psi_k.dtype),
        # whole-t-slice blocks at large volumes exceed the default 16 MB
        # scoped-vmem budget (46.5 MB at 32^3x64 f32) but fit the chip's
        # 128 MB VMEM comfortably — raise the per-kernel limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)
    return out.reshape(T, 24, Z, YX)


@partial(jax.jit, static_argnames=("Y", "by", "dagger", "out_dtype", "ps"))
def dslash_hop_pallas_gl(psi_k, U_k, Ut_k, Y: int, by: int = 8,
                         dagger: bool = False, out_dtype=None,
                         ps: bool = False):
    """Hopping term, grouped-lane kernel (one whole t-slice per grid step
    at any volume; see make_gl_compute).  ps: project-then-shift body."""
    return _gl_call(psi_k, U_k, Ut_k, None, Y, by, None, False, dagger,
                    out_dtype, ps=ps)


@partial(jax.jit, static_argnames=("Y", "by", "mu", "sign", "dagger"))
def dslash_hop_pallas_gl_dir(psi_k, U_k, Ut_k, Y: int, mu: int, sign: int,
                             by: int = 8, dagger: bool = False):
    """SINGLE-direction hopping term (1 -/+ gamma_mu) U psi(x +/- mu) on
    the grouped-lane kernel — the MG Galerkin probing primitive (matches
    rc.dirac_rc._hop_term_rc without the -kappa factor)."""
    return _gl_call(psi_k, U_k, Ut_k, None, Y, by, None, False, dagger,
                    None, dirs=((mu, sign),))


@partial(jax.jit, static_argnames=("Y", "by", "kappa", "dagger",
                                   "has_clover", "ps"))
def wilson_m_pallas_gl(psi_k, U_k, Ut_k, A144, Y: int, kappa: float,
                       by: int = 8, dagger: bool = False,
                       has_clover: bool = False, ps: bool = False):
    """Fused M(dag), grouped-lane kernel (large lattices).  ps:
    project-then-shift body (see make_slice_compute)."""
    return _gl_call(psi_k, U_k, Ut_k, A144 if has_clover else None, Y, by,
                    kappa, has_clover, dagger, None, ps=ps)


# ---------------------------------------------------------------------------
# t-blocked grouped-lane kernel (large lattices, HBM-bound regime)
# ---------------------------------------------------------------------------

def _make_glt_kernel(Z, NBy, by, X, bt, kappa=None, dagger=False,
                     clover=False):
    """Grouped-lane kernel over bt t-slices per grid step.

    The single-slice gl kernel fetches psi three times per output slice
    (t-1/t/t+1 pipelined blocks); at 32^3x64 it is purely DMA-bound
    (f32 4.04 ms vs all-bf16 2.17 ms — an exact traffic ratio), so the
    refetch is pure loss.  Blocking bt slices reuses the centre block for
    the interior t-neighbours: psi traffic drops to (bt+2)/bt slices per
    slice and the t-links at t-1 come from the centre U block for j>0.
    """
    compute = make_gl_compute(Z, NBy, by, X, dagger=dagger)
    f32 = jnp.float32

    def kernel(*refs):
        if clover:
            pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref, A_ref, out_ref = refs
        else:
            pm_ref, pc_ref, pp_ref, Uc_ref, Utm_ref = refs[:5]
            A_ref = None
            out_ref = refs[5]
        od = out_ref.dtype

        def pref(ref, jj):
            return lambda s, c, r: ref[jj, r * 12 + s * 3 + c].astype(f32)

        for j in range(bt):
            pm = pref(pm_ref, 0) if j == 0 else pref(pc_ref, j - 1)
            pp = pref(pp_ref, 0) if j == bt - 1 else pref(pc_ref, j + 1)
            uc = (lambda mu, a, b, r, jj=j:
                  Uc_ref[jj, mu, r * 9 + a * 3 + b].astype(f32))
            if j == 0:
                utm = lambda a, b, r: Utm_ref[0, r * 9 + a * 3 + b
                                              ].astype(f32)
            else:
                utm = (lambda a, b, r, jj=j:
                       Uc_ref[jj - 1, 3, r * 9 + a * 3 + b].astype(f32))

            if kappa is None:
                def write(s, c, ar, ai, jj=j):
                    out_ref[jj, s * 3 + c] = ar.astype(od)
                    out_ref[jj, 12 + s * 3 + c] = ai.astype(od)

                compute(pm, pref(pc_ref, j), pp, uc, utm, write)
                continue

            hop = {}

            def write(s, c, ar, ai):
                hop[(s, c)] = (ar, ai)

            compute(pm, pref(pc_ref, j), pp, uc, utm, write)
            pcd = pref(pc_ref, j)
            for s in range(4):
                for c in range(3):
                    hr, hi = hop[(s, c)]
                    if A_ref is None:
                        dr = pcd(s, c, 0)
                        di = pcd(s, c, 1)
                    else:
                        chi, k = s // 2, (s % 2) * 3 + c
                        dr = di = None
                        for jb in range(6):
                            sj, cj = 2 * chi + jb // 3, jb % 3
                            ar_ = A_ref[j, ((chi * 6 + k) * 6 + jb) * 2
                                        + 0].astype(f32)
                            ai_ = A_ref[j, ((chi * 6 + k) * 6 + jb) * 2
                                        + 1].astype(f32)
                            vr, vi = pcd(sj, cj, 0), pcd(sj, cj, 1)
                            tr = ar_ * vr - ai_ * vi
                            ti = ar_ * vi + ai_ * vr
                            dr = tr if dr is None else dr + tr
                            di = ti if di is None else di + ti
                    out_ref[j, s * 3 + c] = (dr - kappa * hr).astype(od)
                    out_ref[j, 12 + s * 3 + c] = (di - kappa * hi
                                                  ).astype(od)

    return kernel


def _glt_call(psi_k, U_k, Ut_k, A144, Y, by, bt, kappa, clover, dagger,
              out_dtype):
    T, _, Z, YX = psi_k.shape
    X = YX // Y
    assert Y % by == 0, (Y, by)
    assert T % bt == 0, (T, bt)
    NBy = Y // by
    S, L = Z * NBy, by * X
    kernel = _make_glt_kernel(Z, NBy, by, X, bt, kappa=kappa, clover=clover,
                              dagger=dagger)
    psi_g = psi_k.reshape(T, 24, S, L)
    U_g = U_k.reshape(T, 4, 18, S, L)
    Ut_g = Ut_k.reshape(T, 18, S, L)

    def bs(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    # pm/pp/Utm have block size 1 on t, so their index maps return ELEMENT
    # offsets; the centre/U/out blocks are bt-sized (map returns block idx).
    in_specs = [
        bs((1, 24, S, L), lambda i: ((i * bt - 1) % T, 0, 0, 0)),
        bs((bt, 24, S, L), lambda i: (i, 0, 0, 0)),
        bs((1, 24, S, L), lambda i: (((i + 1) * bt) % T, 0, 0, 0)),
        bs((bt, 4, 18, S, L), lambda i: (i, 0, 0, 0, 0)),
        bs((1, 18, S, L), lambda i: ((i * bt - 1) % T, 0, 0, 0)),
    ]
    args = [psi_g, psi_g, psi_g, U_g, Ut_g]
    if clover:
        in_specs.append(bs((bt, 144, S, L), lambda i: (i, 0, 0, 0)))
        args.append(A144.reshape(T, 144, S, L))
    out = pallas_call_auto(
        kernel,
        grid=(T // bt,),
        in_specs=in_specs,
        out_specs=bs((bt, 24, S, L), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 24, S, L),
                                       out_dtype or psi_k.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(*args)
    return out.reshape(T, 24, Z, YX)


@partial(jax.jit, static_argnames=("Y", "by", "bt", "dagger", "out_dtype"))
def dslash_hop_pallas_glt(psi_k, U_k, Ut_k, Y: int, by: int = 8,
                          bt: int = 2, dagger: bool = False,
                          out_dtype=None):
    """Hopping term, t-blocked grouped-lane kernel (see _make_glt_kernel)."""
    return _glt_call(psi_k, U_k, Ut_k, None, Y, by, bt, None, False, dagger,
                     out_dtype)


@partial(jax.jit, static_argnames=("Y", "by", "bt", "kappa", "dagger",
                                   "has_clover"))
def wilson_m_pallas_glt(psi_k, U_k, Ut_k, A144, Y: int, kappa: float,
                        by: int = 8, bt: int = 2, dagger: bool = False,
                        has_clover: bool = False):
    """Fused M(dag), t-blocked grouped-lane kernel (large lattices)."""
    return _glt_call(psi_k, U_k, Ut_k, A144 if has_clover else None, Y, by,
                     bt, kappa, has_clover, dagger, None)


# ---------------------------------------------------------------------------
# y-blocked kernel (large lattices)
# ---------------------------------------------------------------------------

def _make_yb_kernel(Z, by, X, NB, kappa=None, dagger=False, clover=False):
    """Fused M(dag) (or hop, kappa=None) with the fused y*x axis blocked.

    Tiles carry ``by`` whole y-rows plus one real y-halo row of X columns
    each side (extended width (by+2)*X).  Needed because the full dslash
    body on tiles wider than ~256 lanes trips this backend's compile-size
    wall (measured: YX=256 compiles, YX=512 does not) — the same operation
    on [Z, (by+2)X] tiles over a (T, Y/by) grid compiles at any volume.

    x-shifts stay block-local (the X-row wrap never crosses a y-block);
    y-shifts read the halo columns; z-shifts roll the (unblocked) sublane
    axis; t-neighbours are extra pipelined blocks as in the base kernel
    (zero-padded halos — t-hops have no y-shift, so halo columns of the
    t-tiles are never read for interior output columns).
    """
    ext = by + 2
    compute = make_slice_compute(Z, ext, X, dagger=dagger)
    f32 = jnp.float32

    def kernel(*refs):
        if clover:
            (pm_ref, pcm_ref, pc_ref, pcp_ref, pp_ref, Uc_ref, Uym_ref,
             Utm_ref, A_ref, out_ref) = refs
        else:
            (pm_ref, pcm_ref, pc_ref, pcp_ref, pp_ref, Uc_ref, Uym_ref,
             Utm_ref, out_ref) = refs
            A_ref = None
        zeros = jnp.zeros((Z, X), f32)

        def memo(f):
            """Build each extended tile ONCE per grid step: the hop body
            calls the component getters ~6x per component (once per
            directed hop), and re-executing the 3-way halo concat per call
            multiplied the VPU work several-fold (measured 20.3 vs 2.7 us
            per equal-size grid step against the base kernel at 32^3x64)."""
            cache = {}

            def get(*k):
                if k not in cache:
                    cache[k] = f(*k)
                return cache[k]
            return get

        @memo
        def pref_c(s, c, r):
            comp = r * 12 + s * 3 + c
            return jnp.concatenate(
                [pcm_ref[0, comp, :, -X:].astype(f32),
                 pc_ref[0, comp].astype(f32),
                 pcp_ref[0, comp, :, :X].astype(f32)], axis=-1)

        def pref_t(ref):
            @memo
            def get(s, c, r):
                comp = r * 12 + s * 3 + c
                return jnp.concatenate(
                    [zeros, ref[0, comp].astype(f32), zeros], axis=-1)
            return get

        @memo
        def uc(mu, a, b, r):
            comp = r * 9 + a * 3 + b
            left = (Uym_ref[0, comp, :, -X:].astype(f32) if mu == 1
                    else zeros)
            return jnp.concatenate(
                [left, Uc_ref[0, mu, comp].astype(f32), zeros], axis=-1)

        @memo
        def utm(a, b, r):
            comp = r * 9 + a * 3 + b
            return jnp.concatenate(
                [zeros, Utm_ref[0, comp].astype(f32), zeros], axis=-1)

        od = out_ref.dtype
        sl = slice(X, -X)
        if kappa is None:
            def write(s, c, ar, ai):
                out_ref[0, s * 3 + c] = ar[:, sl].astype(od)
                out_ref[0, 12 + s * 3 + c] = ai[:, sl].astype(od)

            compute(pref_t(pm_ref), pref_c, pref_t(pp_ref), uc, utm, write)
            return

        hop = {}

        def write(s, c, ar, ai):
            hop[(s, c)] = (ar[:, sl], ai[:, sl])

        compute(pref_t(pm_ref), pref_c, pref_t(pp_ref), uc, utm, write)
        pcd = lambda s, c, r: pc_ref[0, r * 12 + s * 3 + c].astype(f32)
        for s in range(4):
            for c in range(3):
                hr, hi = hop[(s, c)]
                if A_ref is None:
                    dr = pcd(s, c, 0)
                    di = pcd(s, c, 1)
                else:
                    chi, k = s // 2, (s % 2) * 3 + c
                    dr = di = None
                    for j in range(6):
                        sj, cj = 2 * chi + j // 3, j % 3
                        ar_ = A_ref[0, ((chi * 6 + k) * 6 + j) * 2
                                    + 0].astype(f32)
                        ai_ = A_ref[0, ((chi * 6 + k) * 6 + j) * 2
                                    + 1].astype(f32)
                        vr, vi = pcd(sj, cj, 0), pcd(sj, cj, 1)
                        tr = ar_ * vr - ai_ * vi
                        ti = ar_ * vi + ai_ * vr
                        dr = tr if dr is None else dr + tr
                        di = ti if di is None else di + ti
                out_ref[0, s * 3 + c] = (dr - kappa * hr).astype(od)
                out_ref[0, 12 + s * 3 + c] = (di - kappa * hi).astype(od)

    return kernel


def _yb_call(psi_k, U_k, Ut_k, A144, Y, by, kappa, clover, dagger,
             out_dtype):
    T, _, Z, YX = psi_k.shape
    X = YX // Y
    assert Y % by == 0, (Y, by)
    NB = Y // by
    bw = by * X
    kernel = _make_yb_kernel(Z, by, X, NB, kappa=kappa, clover=clover,
                             dagger=dagger)
    Uy_k = U_k[:, 1]

    def ps(tmap, ymap):
        return pl.BlockSpec((1, 24, Z, bw),
                            lambda i, j: (tmap(i), 0, 0, ymap(j)),
                            memory_space=pltpu.VMEM)

    in_specs = [
        ps(lambda i: (i - 1) % T, lambda j: j),        # psi t-1
        ps(lambda i: i, lambda j: (j - 1) % NB),       # psi y-1
        ps(lambda i: i, lambda j: j),                  # psi centre
        ps(lambda i: i, lambda j: (j + 1) % NB),       # psi y+1
        ps(lambda i: (i + 1) % T, lambda j: j),        # psi t+1
        pl.BlockSpec((1, 4, 18, Z, bw), lambda i, j: (i, 0, 0, 0, j),
                     memory_space=pltpu.VMEM),         # U centre
        pl.BlockSpec((1, 18, Z, bw), lambda i, j: (i, 0, 0, (j - 1) % NB),
                     memory_space=pltpu.VMEM),         # U_y at y-1
        pl.BlockSpec((1, 18, Z, bw), lambda i, j: ((i - 1) % T, 0, 0, j),
                     memory_space=pltpu.VMEM),         # U_t at t-1
    ]
    args = [psi_k, psi_k, psi_k, psi_k, psi_k, U_k, Uy_k, Ut_k]
    if clover:
        in_specs.append(pl.BlockSpec((1, 144, Z, bw),
                                     lambda i, j: (i, 0, 0, j),
                                     memory_space=pltpu.VMEM))
        args.append(A144)
    return pallas_call_auto(
        kernel,
        grid=(T, NB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 24, Z, bw), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(psi_k.shape,
                                       out_dtype or psi_k.dtype),
    )(*args)


@partial(jax.jit, static_argnames=("Y", "by", "dagger", "out_dtype"))
def dslash_hop_pallas_yb(psi_k, U_k, Ut_k, Y: int, by: int = 4,
                         dagger: bool = False, out_dtype=None):
    """Hopping term, y-blocked kernel (grid (T, Y/by)) — the large-lattice
    variant (see _make_yb_kernel)."""
    return _yb_call(psi_k, U_k, Ut_k, None, Y, by, None, False, dagger,
                    out_dtype)


@partial(jax.jit, static_argnames=("Y", "by", "kappa", "dagger",
                                   "has_clover"))
def wilson_m_pallas_yb(psi_k, U_k, Ut_k, A144, Y: int, kappa: float,
                       by: int = 4, dagger: bool = False,
                       has_clover: bool = False):
    """Fused M(dag), y-blocked kernel (large lattices)."""
    return _yb_call(psi_k, U_k, Ut_k, A144 if has_clover else None, Y, by,
                    kappa, has_clover, dagger, None)
