"""Lattice geometry and index conventions.

Array layout convention (TPU-first, replaces QUDA's FLOAT2/FLOAT4 site orders):

* gauge field   U[mu, T, Z, Y, X, a, b]   (mu: 0=x, 1=y, 2=z, 3=t; a,b color)
* spinor field  psi[T, Z, Y, X, s, c]     (s spin 0..3, c color 0..2)

With this layout ``array.reshape(-1)`` enumerates sites with x fastest, i.e.
the reference's full lexicographic order  x + Lx*(y + Ly*(z + Lz*t))
(``/root/reference/lib/mugiq_util_kernels.cu:93-94``).  The even/odd
checkerboard split of the reference is an internal storage detail of QUDA
fields; here parity is a derived mask (``parity_mask``) and all fields are
full-site ("nParity=2") which is what the measurement layer requires
(``/root/reference/lib/contract_wrappers.cu:100``).

Axis bookkeeping: lattice direction mu maps to array axis AXIS[mu]:
x -> 3, y -> 2, z -> 1, t -> 0 (for a spinor; shift by +1 for the gauge
field's leading mu axis).
"""

from dataclasses import dataclass
from functools import cached_property

import numpy as np

#: array axis (in a [T,Z,Y,X,...] field) for lattice direction mu=0..3 (x,y,z,t)
MU_TO_AXIS = (3, 2, 1, 0)

DIR_NAMES = ("x", "y", "z", "t")


@dataclass(frozen=True)
class LatticeGeometry:
    """Global lattice dimensions (X, Y, Z, T), reference ordering.

    ``dims[i]`` is the extent in direction i (0=x .. 3=t), matching the
    reference's ``localL``/``totalL`` arrays (include/loop_mugiq.h:202-212).
    On a device mesh these are *global* dims; sharding is handled by
    jax.sharding annotations, not by this class.
    """

    dims: tuple  # (Lx, Ly, Lz, Lt)

    def __post_init__(self):
        assert len(self.dims) == 4
        object.__setattr__(self, "dims", tuple(int(d) for d in self.dims))

    @property
    def Lx(self):
        return self.dims[0]

    @property
    def Ly(self):
        return self.dims[1]

    @property
    def Lz(self):
        return self.dims[2]

    @property
    def Lt(self):
        return self.dims[3]

    @property
    def shape_tzyx(self):
        """Array shape (T, Z, Y, X) for field allocation."""
        return (self.dims[3], self.dims[2], self.dims[1], self.dims[0])

    @property
    def volume(self):
        return self.dims[0] * self.dims[1] * self.dims[2] * self.dims[3]

    @property
    def volume3(self):
        """Spatial volume (no time)."""
        return self.dims[0] * self.dims[1] * self.dims[2]

    @cached_property
    def coords(self):
        """Integer coordinate arrays x, y, z, t each of shape (T, Z, Y, X)."""
        t, z, y, x = np.meshgrid(
            np.arange(self.Lt), np.arange(self.Lz),
            np.arange(self.Ly), np.arange(self.Lx), indexing="ij")
        return x, y, z, t

    @cached_property
    def parity(self):
        """Site parity (x+y+z+t) % 2, shape (T, Z, Y, X).

        Matches the reference's evenORodd (mugiq_displace_kernels.cu:3-6).
        """
        x, y, z, t = self.coords
        return ((x + y + z + t) % 2).astype(np.int8)

    def axis(self, mu: int, field_rank_offset: int = 0) -> int:
        """Array axis for direction mu in a [T,Z,Y,X,...] field.

        ``field_rank_offset`` shifts for leading batch axes (e.g. 1 for the
        gauge field's [mu, T, Z, Y, X, 3, 3] layout).
        """
        return MU_TO_AXIS[mu] + field_rank_offset
