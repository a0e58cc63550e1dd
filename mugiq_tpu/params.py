"""Parameter dataclasses.

Mirrors the parameter surface the reference consumes:
QudaGaugeParam / QudaInvertParam / QudaEigParam / QudaMultigridParam as set up
by the test drivers (/root/reference/tests/eigensolve.cpp:97-604) plus
MugiqLoopParam (/root/reference/include/mugiq.h:28-47), re-expressed as python
dataclasses with only the fields that affect this framework's behaviour.
"""

import enum
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


class DslashType(enum.Enum):
    WILSON = "wilson"
    CLOVER_WILSON = "clover-wilson"


class EigOperator(enum.Enum):
    """Which Dirac matrix to eigensolve (enum_mugiq.h:20-27)."""
    M = "M"
    Mdag = "Mdag"
    MdagM = "MdagM"
    MMdag = "MMdag"


class Spectrum(enum.Enum):
    """Part of spectrum requested (QUDA_SPECTRUM_*)."""
    SR = "SR"  # smallest real
    LR = "LR"  # largest real
    SM = "SM"  # smallest modulus
    LM = "LM"  # largest modulus
    SI = "SI"  # smallest imaginary
    LI = "LI"  # largest imaginary


class MassNormalization(enum.Enum):
    KAPPA = "kappa"
    MASS = "mass"  # QUDA_MASS_NORMALIZATION: rescale by 0.25/kappa^2


class FTSign(enum.IntEnum):
    """Sign of the Fourier-transform exponent (enum_mugiq.h:29-34)."""
    MINUS = -1
    PLUS = 1


class CalcType(enum.Enum):
    """Loop calculation flavour (enum_mugiq.h:36-42).

    On TPU all three reference flavours map onto the same fused einsum/Pallas
    path; the enum is kept for API parity.
    """
    BLAS = "blas"
    OPT_KERNEL = "opt"
    BASIC_KERNEL = "basic"


@dataclass
class GaugeParam:
    dims: Tuple[int, int, int, int]  # (Lx, Ly, Lz, Lt), global
    antiperiodic_t: bool = True      # QUDA_ANTI_PERIODIC_T
    anisotropy: float = 1.0


@dataclass
class InvertParam:
    """Dirac-operator parameters (subset of QudaInvertParam).

    kappa/mass relation follows the reference driver
    (tests/eigensolve.cpp:144-151): kappa = 1/(2*(1 + 3/anisotropy + mass)).
    """
    dslash_type: DslashType = DslashType.WILSON
    kappa: Optional[float] = None
    mass: Optional[float] = None
    csw: float = 0.0                 # clover coefficient
    anisotropy: float = 1.0
    mass_normalization: MassNormalization = MassNormalization.KAPPA

    def __post_init__(self):
        if self.kappa is None and self.mass is None:
            raise ValueError("set kappa or mass")
        if self.kappa is None:
            self.kappa = 1.0 / (2.0 * (1.0 + 3.0 / self.anisotropy + self.mass))
        elif self.mass is None:
            self.mass = 0.5 / self.kappa - (1.0 + 3.0 / self.anisotropy)


@dataclass
class EigParam:
    """Eigensolver parameters (mirrors MugiqEigParam, eigsolve_mugiq.h:16-51)."""
    n_ev: int = 16                   # eigenpairs requested (nConv)
    n_kr: int = 48                   # Krylov-space size
    tol: float = 1e-8
    max_restarts: int = 100
    spectrum: Spectrum = Spectrum.SR
    operator: EigOperator = EigOperator.MdagM   # use_norm_op/use_dagger
    use_poly_acc: bool = False
    poly_deg: int = 0
    a_min: float = 0.0
    a_max: float = 0.0               # 0 -> auto-estimate
    check_interval: int = 1          # restarts between convergence checks
    seed: int = 1234
    block_size: int = 1              # >1: block thick-restart Lanczos
                                     # (beyond-reference; normal ops only)


@dataclass
class MGParam:
    """Multigrid parameters (subset of QudaMultigridParam).

    geo_block_size[lev] aggregates fine dims (x,y,z,t); n_vec[lev] is the
    number of null vectors; spin aggregation on the finest level is chiral
    2-blocking (spin_block_size=2), coarser levels keep 2 spins
    (tests/eigensolve.cpp:469-492).
    """
    n_level: int = 2
    geo_block_size: List[Tuple[int, int, int, int]] = field(
        default_factory=lambda: [(4, 4, 4, 4)])
    n_vec: List[int] = field(default_factory=lambda: [24])
    setup_iters: int = 50            # null-vector smoothing iterations
    setup_tol: float = 1e-6
    setup_seed: int = 7
    # hierarchy checkpoint (the reference's per-level mg_vec_infile/outfile
    # forwarding, tests/eigensolve.cpp:584-590): outfile saves the built
    # transfer bases + Galerkin stencils; infile loads them, skipping the
    # setup CG entirely
    vec_outfile: str = ""
    vec_infile: str = ""


@dataclass
class LoopParam:
    """Disconnected-loop parameters (mirrors MugiqLoopParam, mugiq.h:28-47)."""
    momenta: Sequence[Tuple[int, int, int]] = field(default_factory=lambda: [(0, 0, 0)])
    ft_sign: FTSign = FTSign.MINUS
    calc_type: CalcType = CalcType.OPT_KERNEL
    write_mom_space_hdf5: bool = False
    write_pos_space_hdf5: bool = False
    do_mom_proj: bool = True
    do_nonlocal: bool = False
    disp_entries: List[str] = field(default_factory=list)  # e.g. ["+z:1,8", "-x:3"]
    fname_mom_h5: str = ""
    fname_pos_h5: str = ""


def parse_disp_entry(entry: str) -> Tuple[str, int, int]:
    """Parse one displacement entry '+z:1,8' -> ('+z', 1, 8).

    Grammar as in the reference driver (tests/loop.cpp:607-631 + the
    start/stop swap sanitisation of loop_mugiq.h:234-239).
    """
    parts = entry.split(":")
    if len(parts) != 2:
        raise ValueError(
            f"displacement entry '{entry}' has the wrong format; "
            "good entries: +z:1,8 , +x:3")
    disp_str = parts[0]
    if len(disp_str) != 2 or disp_str[0] not in "+-" or disp_str[1] not in "xyzt":
        raise ValueError(f"cannot parse displacement string '{disp_str}'")
    try:
        lims = [int(s) for s in parts[1].split(",")]
    except ValueError:
        raise ValueError(
            f"displacement entry '{entry}' has non-integer limits; "
            "good entries: +z:1,8 , +x:3") from None
    if len(lims) == 0 or len(lims) > 2:
        raise ValueError(f"wrong limits in displacement entry '{entry}'")
    start = lims[0]
    stop = lims[1] if len(lims) == 2 else lims[0]
    if start > stop:
        start, stop = stop, start
    return disp_str, start, stop


def parse_disp_entry_string(s: str) -> List[Tuple[str, int, int]]:
    """Parse the full --displace-entry-string grammar '+z:1,8;-x:3'."""
    return [parse_disp_entry(e) for e in s.split(";") if e]
