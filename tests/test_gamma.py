"""Gamma algebra: closure, sparse tables, and the g5-map vs the reference's
hard-coded tables (/root/reference/include/gamma.h)."""

import numpy as np
import pytest

from mugiq_tpu import gamma


def test_clifford_algebra():
    g = gamma.gamma_matrices()
    for mu in range(4):
        for nu in range(4):
            anti = g[mu] @ g[nu] + g[nu] @ g[mu]
            expect = 2.0 * np.eye(4) if mu == nu else np.zeros((4, 4))
            np.testing.assert_allclose(anti, expect, atol=1e-14)


def test_gamma5():
    g5 = gamma.gamma5()
    np.testing.assert_allclose(g5, np.diag([1, 1, -1, -1]), atol=1e-14)


def test_hermiticity():
    g = gamma.gamma_matrices()
    for mu in range(4):
        np.testing.assert_allclose(g[mu], g[mu].conj().T, atol=1e-14)


def test_basis_single_nonzero_per_row():
    G = gamma.gamma_basis()
    for n in range(16):
        for r in range(4):
            assert np.count_nonzero(G[n, r]) == 1


def test_sparse_tables_match_reference():
    """Spot-check derived tables against hard-coded reference values
    (gamma.h:32-71): G1=g1 rows (i,i,-i,-i) cols (3,2,1,0); G15=g5."""
    vals = gamma.gamma_row_values()
    cols = gamma.gamma_column_indices()
    np.testing.assert_allclose(vals[1], [1j, 1j, -1j, -1j])
    np.testing.assert_array_equal(cols[1], [3, 2, 1, 0])
    np.testing.assert_allclose(vals[2], [-1, 1, 1, -1])
    np.testing.assert_array_equal(cols[2], [3, 2, 1, 0])
    np.testing.assert_allclose(vals[15], [1, 1, -1, -1])
    np.testing.assert_array_equal(cols[15], [0, 1, 2, 3])
    # G7 = g1g2g3 = g5g4: rows (1,1,-1,-1) cols (2,3,0,1)
    np.testing.assert_allclose(vals[7], [1, 1, -1, -1])
    np.testing.assert_array_equal(cols[7], [2, 3, 0, 1])


def test_gamma_map_matches_reference():
    """The derived g5-output map must reproduce minusGamma = {3,6,9,11,12,14}
    and indexMapGamma i -> 15-i (gamma.h:99-109)."""
    sign = gamma.gamma_map_sign()
    idx = gamma.gamma_map_index()
    np.testing.assert_array_equal(idx, [15 - i for i in range(16)])
    minus = set(np.nonzero(sign < 0)[0].tolist())
    assert minus == {3, 6, 9, 11, 12, 14}
    assert np.all(np.abs(sign) == 1.0)


def test_sigma_munu_antisymmetric_hermitian():
    sig = gamma.sigma_munu()
    for mu in range(4):
        for nu in range(4):
            np.testing.assert_allclose(sig[mu, nu], -sig[nu, mu], atol=1e-14)
            np.testing.assert_allclose(sig[mu, nu], sig[mu, nu].conj().T, atol=1e-14)
