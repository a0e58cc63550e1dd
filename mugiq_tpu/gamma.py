"""Gamma-matrix algebra in the DeGrand-Rossi basis.

The reference keeps hard-coded sparse tables for the 16 gamma-basis matrices
(``/root/reference/include/gamma.h:32-71``).  Here the 16 matrices are
*generated* from the four base DeGrand-Rossi gammas via

    G(n) = g1^n0 . g2^n1 . g3^n2 . g4^n3,   n = n0 + 2*n1 + 4*n2 + 8*n3

(the parametrisation documented at ``gamma.h:25``), and the sparse
(row-value, column-index) representation used by the contraction kernel is
derived programmatically.  Each G(n) has exactly one nonzero per row with
value in {±1, ±i}.

Also provided: the G -> g5*G output mapping used when saving loop data
(``gamma.h:99-109``): the loop required contains g5*Gamma while the one
computed contains Gamma, so output index ig reads input index 15-ig with a
sign flip for input indices where g5*G(15-i) = -G(i)^T ... (derived here from
the algebra rather than hard-coded).
"""

from functools import lru_cache

import numpy as np

N_SPIN = 4
N_COLOR = 3
N_GAMMA = 16

#: Names of the 16 basis matrices, indexed by n (gamma.h:11-20 ordering).
GAMMA_NAMES = (
    "1", "g1", "g2", "g1g2",
    "g3", "g1g3", "g2g3", "g5g4",
    "g4", "g1g4", "g2g4", "g5g3",
    "g3g4", "g5g2", "g5g1", "g5",
)


def _base_gammas() -> np.ndarray:
    """The four DeGrand-Rossi gamma matrices (QUDA's basis), gx..gt."""
    i = 1j
    g1 = np.array([[0, 0, 0, i],
                   [0, 0, i, 0],
                   [0, -i, 0, 0],
                   [-i, 0, 0, 0]], dtype=np.complex128)
    g2 = np.array([[0, 0, 0, -1],
                   [0, 0, 1, 0],
                   [0, 1, 0, 0],
                   [-1, 0, 0, 0]], dtype=np.complex128)
    g3 = np.array([[0, 0, i, 0],
                   [0, 0, 0, -i],
                   [-i, 0, 0, 0],
                   [0, i, 0, 0]], dtype=np.complex128)
    g4 = np.array([[0, 0, 1, 0],
                   [0, 0, 0, 1],
                   [1, 0, 0, 0],
                   [0, 1, 0, 0]], dtype=np.complex128)
    return np.stack([g1, g2, g3, g4])


@lru_cache(maxsize=None)
def _gamma_basis_np() -> np.ndarray:
    """All 16 G(n) as a [16, 4, 4] complex array."""
    g = _base_gammas()
    out = np.zeros((N_GAMMA, N_SPIN, N_SPIN), dtype=np.complex128)
    for n in range(N_GAMMA):
        m = np.eye(N_SPIN, dtype=np.complex128)
        for mu in range(4):
            if (n >> mu) & 1:
                m = m @ g[mu]
        out[n] = m
    return out


def gamma_matrices() -> np.ndarray:
    """The four base gammas as a [4, 4, 4] array (gx, gy, gz, gt)."""
    return _base_gammas().copy()


def gamma_basis() -> np.ndarray:
    """All 16 basis matrices G(n), shape [16, 4, 4]."""
    return _gamma_basis_np().copy()


def gamma5() -> np.ndarray:
    """g5 = g1 g2 g3 g4 = diag(1, 1, -1, -1) in this basis."""
    return _gamma_basis_np()[15].copy()


def sigma_munu() -> np.ndarray:
    """sigma_{mu nu} = (i/2)[g_mu, g_nu], shape [4, 4, 4spin, 4spin].

    Used by the clover term; antisymmetric in (mu, nu).
    """
    g = _base_gammas()
    out = np.zeros((4, 4, N_SPIN, N_SPIN), dtype=np.complex128)
    for mu in range(4):
        for nu in range(4):
            out[mu, nu] = 0.5j * (g[mu] @ g[nu] - g[nu] @ g[mu])
    return out


@lru_cache(maxsize=None)
def _sparse_tables():
    """Derive per-row sparse (value, column) tables for each G(n).

    Matches the semantics of GammaRowValue/GammaColumnIndex
    (gamma.h:32-71): G(n)_{r, c} = row_value[n][r] iff c == col_index[n][r].
    """
    G = _gamma_basis_np()
    vals = np.zeros((N_GAMMA, N_SPIN), dtype=np.complex128)
    cols = np.zeros((N_GAMMA, N_SPIN), dtype=np.int32)
    for n in range(N_GAMMA):
        for r in range(N_SPIN):
            nz = np.nonzero(G[n, r])[0]
            assert len(nz) == 1, "each gamma-basis row has exactly one nonzero"
            cols[n, r] = nz[0]
            vals[n, r] = G[n, r, nz[0]]
    return vals, cols


def gamma_row_values() -> np.ndarray:
    return _sparse_tables()[0].copy()


def gamma_column_indices() -> np.ndarray:
    return _sparse_tables()[1].copy()


@lru_cache(maxsize=None)
def _gamma_map():
    """The G -> g5*G loop-output mapping (gamma.h:74-109).

    The measurement computes T(i) = Tr[... G(i) ...] but the saved loop L must
    contain g5*G.  In this basis g5*G(15-i) = s_i * G(i) with s_i in {±1, ±i};
    for the DeGrand-Rossi tables all s_i are ±1, so

        L(index_map[i]) = sign[i] * T(i),   index_map[i] = 15 - i.

    Derived from the algebra; validated against the reference's hard-coded
    sign set {3, 6, 9, 11, 12, 14} (gamma.h:99-102) in tests.  Note the
    reference folds an extra (-1) into the two entries whose *output name*
    carries a minus sign (L(11) = L(-g5g3), L(14) = L(-g5g1)), so the sign we
    want satisfies  g5 * G(15-i) = sign[i] * (±) G(i)  with (+) except for
    outputs 11 and 14 where the saved quantity is -g5g3 / -g5g1 respectively.
    The net effect reproduces exactly minusGamma = {3, 6, 9, 11, 12, 14}.
    """
    G = _gamma_basis_np()
    g5 = G[15]
    index_map = np.array([N_GAMMA - 1 - i for i in range(N_GAMMA)], dtype=np.int32)
    sign = np.zeros(N_GAMMA, dtype=np.float64)
    # The reference's table of output<-input relations (gamma.h:78-94) states
    # for output j = 15-i:  L(j) = sign * T(i)  where "L(j)" physically holds
    # g5*G(j) -- except j in {11, 14} where it holds -g5*G(j) (i.e. +g5g3 and
    # +g5g1 with the names "g5g3"/"g5g1", the basis matrices G(11), G(14)
    # themselves being -g5g3 and -g5g1).  Equivalently: the saved L(j) is
    # defined so that for all j, L(j) = Tr[... g5G'(j) ...] with
    # g5G'(j) = g5-times-the-*named* matrix.  We recover sign[i] from
    #   named(j) = g5 @ G(i) * sign[i]    with named(j) = G(j) up to the known
    # (-1) for j in {11, 14}.
    for i in range(N_GAMMA):
        j = int(index_map[i])
        named_j = G[j].copy()
        if j in (11, 14):  # G(11) = -g5g3, G(14) = -g5g1 (gamma.h:44,47)
            named_j = -named_j
        # want: g5 @ named_j == sign[i] * G(i)  =>  trace relation
        # Tr[rho^dag g5 named_j] = sign[i] Tr[rho^dag G(i)] for all rho.
        prod = g5 @ named_j
        # prod must be proportional to G(i)
        ratio = prod[np.nonzero(G[i])] / G[i][np.nonzero(G[i])]
        assert np.allclose(ratio, ratio[0])
        s = ratio[0]
        assert np.isclose(s.imag, 0.0)
        sign[i] = s.real
    return sign, index_map


def gamma_map_sign() -> np.ndarray:
    """sign[i]: factor applied to computed trace T(i) when saved (len 16)."""
    return _gamma_map()[0].copy()


def gamma_map_index() -> np.ndarray:
    """index_map[i] = 15 - i: output gamma index for computed index i."""
    return _gamma_map()[1].copy()
