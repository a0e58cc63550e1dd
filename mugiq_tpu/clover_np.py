"""Host-side (numpy) clover term construction.

Identical math to :mod:`mugiq_tpu.clover` but in pure numpy: on the TPU
environment every jnp op dispatches to the chip, where complex dtypes fail,
so the production path builds the clover matrix on host and ships only the
real-pair representation.  Cross-checked against the jnp implementation in
tests.
"""

import numpy as np

from .gamma import sigma_munu


def _roll(a, mu, sign):
    axis = {0: 3, 1: 2, 2: 1, 3: 0}[mu]
    return np.roll(a, -sign, axis=axis)


def _mm(a, b):
    return np.einsum("...ab,...bc->...ac", a, b)


def _dag(a):
    return np.conj(np.swapaxes(a, -1, -2))


def _leaf_np(U, mu, nu):
    u_mu, u_nu = U[mu], U[nu]
    p1 = _mm(_mm(u_mu, _roll(u_nu, mu, +1)),
             _mm(_dag(_roll(u_mu, nu, +1)), _dag(u_nu)))
    p2 = _mm(_mm(u_nu, _dag(_roll(_roll(u_mu, nu, +1), mu, -1))),
             _mm(_dag(_roll(u_nu, mu, -1)), _roll(u_mu, mu, -1)))
    p3 = _mm(_mm(_dag(_roll(u_mu, mu, -1)),
                 _dag(_roll(_roll(u_nu, mu, -1), nu, -1))),
             _mm(_roll(_roll(u_mu, mu, -1), nu, -1), _roll(u_nu, nu, -1)))
    p4 = _mm(_mm(_dag(_roll(u_nu, nu, -1)), _roll(u_mu, nu, -1)),
             _mm(_roll(_roll(u_nu, mu, +1), nu, -1), _dag(u_mu)))
    return p1 + p2 + p3 + p4


def clover_field_np(U: np.ndarray, kappa: float, csw: float) -> np.ndarray:
    """A[T,Z,Y,X,4,3,4,3] complex from a (phased) numpy gauge field."""
    U = np.asarray(U)
    sig = sigma_munu()
    shape = U.shape[1:5]
    sf = np.zeros(shape + (4, 3, 4, 3), dtype=np.complex128)
    for mu in range(4):
        for nu in range(mu + 1, 4):
            q = _leaf_np(U, mu, nu)
            f = (q - _dag(q)) / 8.0j
            sf += np.einsum("su,tzyxab->tzyxsaub", sig[mu, nu], f)
    eye = np.einsum("su,ab->saub", np.eye(4), np.eye(3))
    return eye[None, None, None, None] + (csw * kappa * 0.5) * sf


def clover_chiral_blocks_np(A: np.ndarray) -> np.ndarray:
    """Pack the (block-diagonal-in-chirality) clover matrix as two 6x6
    complex blocks -> real [T, 2chiral, 6, 6, 2rc, Z, Y, X]... flattened for
    the kernel layout as [T, 2, 6, 6, 2, Z, Y*X] float32.

    Chirality blocks: fine spins {0,1} and {2,3}; within a block the 6 dofs
    are (s_in * 3 + c), matching the kernel component order (comp =
    r*12 + s*3 + c, so each chiral block occupies a contiguous range).
    The off-chiral blocks of sigma.F vanish ([g5, sigma_mu_nu] = 0);
    validated in tests.
    """
    T, Z, Y, X = A.shape[:4]
    out = np.empty((T, 2, 6, 6, 2, Z, Y * X), dtype=np.float32)
    for chi in range(2):
        s0 = 2 * chi
        blk = A[:, :, :, :, s0:s0 + 2, :, s0:s0 + 2, :]   # [T,Z,Y,X,2,3,2,3]
        blk = blk.reshape(T, Z, Y * X, 6, 6)
        blk = np.moveaxis(blk, (3, 4), (1, 2))            # [T,6,6,Z,YX]
        out[:, chi, :, :, 0] = blk.real
        out[:, chi, :, :, 1] = blk.imag
    return out


def invert_chiral_blocks_np(A_blocks: np.ndarray) -> np.ndarray:
    """Site-wise inverse of packed chiral clover blocks.

    A_blocks [T, 2, 6, 6, 2, Z, YX] (clover_chiral_blocks_np) ->
    same-shape blocks of A^{-1} (per-site 6x6 complex inverses; the
    reference's cloverInvert analog used by the Schur complement's
    A_oo^{-1}).  Host-side numpy: setup cost, run once per gauge."""
    A_blocks = np.asarray(A_blocks, dtype=np.float32)
    T, _, _, _, _, Z, YX = A_blocks.shape
    out = np.empty_like(A_blocks)
    for chi in range(2):
        blk = (A_blocks[:, chi, :, :, 0].astype(np.complex128)
               + 1j * A_blocks[:, chi, :, :, 1])          # [T,6,6,Z,YX]
        blk = np.moveaxis(blk, (1, 2), (3, 4))            # [T,Z,YX,6,6]
        inv = np.linalg.inv(blk)
        inv = np.moveaxis(inv, (3, 4), (1, 2))
        out[:, chi, :, :, 0] = inv.real.astype(np.float32)
        out[:, chi, :, :, 1] = inv.imag.astype(np.float32)
    return out
