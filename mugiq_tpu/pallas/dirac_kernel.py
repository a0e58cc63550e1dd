"""Wilson operator on the pallas kernel layout — the TPU production operator.

Fields live in the dslash kernel's native [T, 24, Z, Y*X] layout
(comp = r*12 + s*3 + c), so the eigensolver's Krylov algebra, the dslash
kernel, and the g5 applications all share one layout with no per-iteration
transposes.
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..params import EigOperator
from .dslash_kernel import dslash_hop_pallas


def apply_clover_kernel(A_blocks: jnp.ndarray, psi_k: jnp.ndarray) -> jnp.ndarray:
    """Clover application on kernel-layout fields, unrolled.

    A_blocks [T, 2chiral, 6, 6, 2rc, Z, YX] (clover_np.clover_chiral_blocks_np);
    psi_k [T, 24, Z, YX] with comp = r*12 + s*3 + c, so each chirality block
    is a contiguous 6-component range.  Fully unrolled 6x6 complex matvec per
    chirality (per-site dot_generals are pathological on TPU).
    """
    pr = psi_k[:, :12]
    pi = psi_k[:, 12:]
    out_r = [None] * 12
    out_i = [None] * 12
    for chi in range(2):
        for k in range(6):
            acc_r = acc_i = None
            for j in range(6):
                ar = A_blocks[:, chi, k, j, 0]
                ai = A_blocks[:, chi, k, j, 1]
                vr = pr[:, 6 * chi + j]
                vi = pi[:, 6 * chi + j]
                tr = ar * vr - ai * vi
                ti = ar * vi + ai * vr
                acc_r = tr if acc_r is None else acc_r + tr
                acc_i = ti if acc_i is None else acc_i + ti
            out_r[6 * chi + k] = acc_r
            out_i[6 * chi + k] = acc_i
    rr = jnp.stack(out_r, axis=1)      # [T, 12, Z, YX]
    ii = jnp.stack(out_i, axis=1)
    return jnp.concatenate([rr, ii], axis=1)   # comp = r*12 + s*3 + c


def parity_masks_kernel(T, Z, Y, X, dtype=np.float32):
    """(even, odd) 0/1 masks [T, 1, Z, Y*X] for kernel-layout fields."""
    t, z, y, x = np.meshgrid(np.arange(T), np.arange(Z), np.arange(Y),
                             np.arange(X), indexing="ij")
    par = ((t + z + y + x) % 2).reshape(T, 1, Z, Y * X).astype(dtype)
    return jnp.asarray(1.0 - par), jnp.asarray(par)


@dataclass
class SchurDiracKernel:
    """Even-even preconditioned Wilson on the kernel layout (production twin
    of schur.SchurDirac, asymmetric == symmetric for plain Wilson):
    M_pc = 1 - kappa^2 P_e D P_o D."""
    U_k: jnp.ndarray
    kappa: float
    Y: int

    def __post_init__(self):
        self.Ut_k = self.U_k[:, 3]
        T, _, _, Z, YX = self.U_k.shape
        self.even, self.odd = parity_masks_kernel(T, Z, self.Y, YX // self.Y)

    def project_even(self, psi):
        return self.even * psi

    def M(self, psi):
        pe = self.even * psi
        d_oe = self.odd * dslash_hop_pallas(pe, self.U_k, self.Ut_k, Y=self.Y)
        hop_back = self.even * dslash_hop_pallas(d_oe, self.U_k, self.Ut_k,
                                                 Y=self.Y)
        return pe - self.kappa ** 2 * hop_back

    def Mdag(self, psi):
        pe = self.even * psi
        d_oe = self.odd * dslash_hop_pallas(pe, self.U_k, self.Ut_k,
                                            Y=self.Y, dagger=True)
        hop_back = self.even * dslash_hop_pallas(d_oe, self.U_k, self.Ut_k,
                                                 Y=self.Y, dagger=True)
        return pe - self.kappa ** 2 * hop_back

    def MdagM(self, psi):
        return self.Mdag(self.M(psi))

    def MMdag(self, psi):
        return self.M(self.Mdag(psi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM, EigOperator.MMdag: self.MMdag}[which]

    @property
    def field_shape(self):
        return (self.U_k.shape[0], 24, self.U_k.shape[3], self.U_k.shape[4])

    @property
    def dtype(self):
        return self.U_k.dtype


def _g5_signs():
    """[24] sign vector: -1 on spin 2,3 components, duplicated for re/im."""
    s = np.ones(24, dtype=np.float32)
    for r in range(2):
        for sp in (2, 3):
            for c in range(3):
                s[r * 12 + sp * 3 + c] = -1.0
    return s


@dataclass
class WilsonDiracKernel:
    """Wilson(-clover) production operator on the kernel layout.

    A_blocks (optional): chiral-block clover matrix from
    clover_np.clover_chiral_blocks_np; applied in the fused kernel as
    in-VMEM chiral 6x6 blocks.

    precision="bf16" stores the links (and clover blocks) in bfloat16 —
    QUDA's half-precision field analog — halving the dominant HBM traffic
    term (360 of 936 B/site).  Spinors stay f32 and ALL kernel arithmetic
    is f32 (loads upcast in-VMEM), so only the link representation is
    truncated (~3 significant digits on O(1) unitary entries)."""
    U_k: jnp.ndarray      # [T, 4, 18, Z, YX], phased links, kernel layout
    kappa: float
    Y: int                # Y extent (to un-fuse YX when needed)
    A_blocks: Optional[jnp.ndarray] = None
    precision: str = "f32"

    def __post_init__(self):
        from .dslash_kernel import pack_clover_kernel144

        if self.precision not in ("f32", "bf16"):
            raise ValueError(f"precision must be f32|bf16: {self.precision}")
        if self.precision == "bf16":
            self.U_k = self.U_k.astype(jnp.bfloat16)
            if self.A_blocks is not None:
                self.A_blocks = self.A_blocks.astype(jnp.bfloat16)
        self.Ut_k = self.U_k[:, 3]
        self._g5 = jnp.asarray(_g5_signs(), dtype=jnp.float32
                               ).reshape(1, 24, 1, 1)
        self._A144 = (jnp.zeros((1,), self.U_k.dtype) if self.A_blocks is None
                      else pack_clover_kernel144(self.A_blocks))
        self._m_fn = self._mdag_fn = None
        # untuned default: the full-width [Z, YX] kernels trip this
        # backend's compile-size wall above ~256 lanes (measured: YX=256
        # compiles, 512 does not) — large lattices default to the
        # grouped-lane kernel (whole t-slice per grid step, lane axis
        # regrouped to by*X; at-roofline at 32^3x64), y-blocked as a
        # fallback when no lane grouping fits.  VMEM-resident widths
        # default to the project-then-shift body (psb): 60.3 us vs 82.4
        # base at 16^3x32 f32 (artifacts/bench_ps.json) — the chained
        # regime is shift/select-issue-bound and ps cuts that ~2.7x.
        default = "psb"
        YX = self.U_k.shape[-1]
        X = YX // self.Y
        if YX > 256:
            gl_feasible = [b for b in (4, 8, 16)
                           if self.Y % b == 0 and b < self.Y
                           and 128 <= b * X <= 512]
            if gl_feasible:
                # ps body: f32 neutral (DMA-bound), bf16 +17% (1731 vs
                # 1478 GFLOP/s at 32^3x64 — bench_ps.json)
                default = (
                    f"psgl{min(gl_feasible, key=lambda b: abs(b*X-256))}")
            else:
                for by in (8, 4, 2):
                    if self.Y % by == 0 and (by + 2) * X <= 256:
                        default = f"yb{by}"
                        break
                else:
                    default = "yb2" if self.Y % 2 == 0 else "base"
        self._m_variant = self._mdag_variant = default

    def tune(self, psi=None, force=False):
        """Autotune the fused M/Mdag kernel variant for this lattice size on
        the live backend; the winner persists in the tune cache (the
        reference's QUDA autotune + saveTuneCache,
        lib/interface_mugiq.cpp:72)."""
        from .autotune import tune_wilson_m

        if psi is None:
            T, _, _, Z, YX = self.U_k.shape
            psi = jnp.zeros((T, 24, Z, YX), self.dtype) + 0.5
        has_c = self.A_blocks is not None
        self._m_variant, self._m_fn = tune_wilson_m(
            self.U_k, self.Ut_k, self._A144, self.Y, self.kappa, has_c,
            psi, dagger=False, force=force)
        self._mdag_variant, self._mdag_fn = tune_wilson_m(
            self.U_k, self.Ut_k, self._A144, self.Y, self.kappa, has_c,
            psi, dagger=True, force=force)
        return self

    def _dispatch_m(self, psi, U, Ut, A, dagger):
        """Apply the selected kernel variant (base / win:bt / gl:by /
        yb:by)."""
        from .dslash_kernel import (wilson_m_pallas, wilson_m_pallas_gl,
                                    wilson_m_pallas_glt, wilson_m_pallas_yb)
        from .dslash_win_kernel import wilson_m_pallas_win

        has_c = self.A_blocks is not None
        var = self._mdag_variant if dagger else self._m_variant
        if var.startswith("psgl"):
            return wilson_m_pallas_gl(psi, U, Ut, A, Y=self.Y,
                                      kappa=self.kappa, by=int(var[4:]),
                                      dagger=dagger, has_clover=has_c,
                                      ps=True)
        if var == "psb":
            return wilson_m_pallas(psi, U, Ut, A, Y=self.Y,
                                   kappa=self.kappa, dagger=dagger,
                                   has_clover=has_c, ps=True)
        if var.startswith("wing"):
            by, bt = (int(v) for v in var[4:].split("."))
            return wilson_m_pallas_win(psi, U, Ut, A, Y=self.Y,
                                       kappa=self.kappa, bt=bt, gl_by=by,
                                       dagger=dagger, has_clover=has_c)
        if var.startswith("win"):
            return wilson_m_pallas_win(psi, U, Ut, A, Y=self.Y,
                                       kappa=self.kappa, bt=int(var[3:]),
                                       dagger=dagger, has_clover=has_c)
        if var.startswith("glt"):
            by, bt = (int(v) for v in var[3:].split("."))
            return wilson_m_pallas_glt(psi, U, Ut, A, Y=self.Y,
                                       kappa=self.kappa, by=by, bt=bt,
                                       dagger=dagger, has_clover=has_c)
        if var.startswith("gl"):
            return wilson_m_pallas_gl(psi, U, Ut, A, Y=self.Y,
                                      kappa=self.kappa, by=int(var[2:]),
                                      dagger=dagger, has_clover=has_c)
        if var.startswith("yb"):
            return wilson_m_pallas_yb(psi, U, Ut, A, Y=self.Y,
                                      kappa=self.kappa, by=int(var[2:]),
                                      dagger=dagger, has_clover=has_c)
        return wilson_m_pallas(psi, U, Ut, A, Y=self.Y, kappa=self.kappa,
                               dagger=dagger, has_clover=has_c)

    def M(self, psi):
        """Fully fused: A psi - kappa*hop in ONE kernel pass (clover as
        in-VMEM chiral 6x6 blocks)."""
        if self._m_fn is not None:
            return self._m_fn(psi)
        return self._dispatch_m(psi, self.U_k, self.Ut_k, self._A144, False)

    def Mdag(self, psi):
        """M^dag via the dagger-variant fused kernel (g5 folded into the
        spin projectors; the clover diagonal is Hermitian)."""
        if self._mdag_fn is not None:
            return self._mdag_fn(psi)
        return self._dispatch_m(psi, self.U_k, self.Ut_k, self._A144, True)

    def MdagM(self, psi):
        return self.Mdag(self.M(psi))

    def MMdag(self, psi):
        return self.M(self.Mdag(psi))

    def operator(self, which: EigOperator) -> Callable:
        return {EigOperator.M: self.M, EigOperator.Mdag: self.Mdag,
                EigOperator.MdagM: self.MdagM, EigOperator.MMdag: self.MMdag}[which]

    def operator_with_args(self, which: EigOperator):
        """(fn, args) with fn(psi, *args): the operator with its field
        operands as EXPLICIT arguments, for threading through jitted
        eigensolver cycles (matvec_args=...).  A closure operator traced
        inside an outer jit embeds the links as HLO constants — which
        bloats every compile and overflows the tunnelled backend's
        compile-request limit at large volumes (604 MB at 32^3x64)."""
        def m(psi, U, Ut, A, dagger):
            return self._dispatch_m(psi, U, Ut, A, dagger)

        fns = {
            EigOperator.M: lambda p, U, Ut, A: m(p, U, Ut, A, False),
            EigOperator.Mdag: lambda p, U, Ut, A: m(p, U, Ut, A, True),
            EigOperator.MdagM: lambda p, U, Ut, A: m(
                m(p, U, Ut, A, False), U, Ut, A, True),
            EigOperator.MMdag: lambda p, U, Ut, A: m(
                m(p, U, Ut, A, True), U, Ut, A, False),
        }
        return fns[which], (self.U_k, self.Ut_k, self._A144)

    @property
    def field_shape(self):
        T, _, _, Z, YX = (self.U_k.shape[0], None, None,
                          self.U_k.shape[3], self.U_k.shape[4])
        return (T, 24, Z, YX)

    @property
    def dtype(self):
        """Spinor dtype: always f32 (links may be stored bf16)."""
        return jnp.float32
