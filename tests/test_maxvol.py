"""Tests for maxvol pivoting and localcross factorization."""

import numpy as np

from tt_irt_tpu import localcross, maxvol, maxvol_rect


def test_maxvol_dominance(rng):
    a = rng.standard_normal((60, 8))
    ind = maxvol(a)
    assert ind.shape == (8,)
    assert len(set(ind.tolist())) == 8
    b = np.linalg.solve(a[ind].T, a.T).T
    assert np.max(np.abs(b)) <= 1.1  # quasi-dominance


def test_maxvol_short_matrix(rng):
    a = rng.standard_normal((5, 8))
    ind = maxvol(a)
    np.testing.assert_array_equal(ind, np.arange(5))


def test_maxvol_rect(rng):
    a = rng.standard_normal((50, 6))
    ind = maxvol_rect(a, kmax=10)
    assert 6 <= len(ind) <= 10
    assert len(set(ind.tolist())) == len(ind)


def test_localcross_exact(rng):
    u0 = rng.standard_normal((30, 4))
    v0 = rng.standard_normal((4, 20))
    y = u0 @ v0
    u, v = localcross(y, 1e-12)
    assert u.shape[1] <= 6
    np.testing.assert_allclose(u @ v, y, atol=1e-9)
    # orthonormal left factor
    np.testing.assert_allclose(u.T @ u, np.eye(u.shape[1]), atol=1e-10)


def test_localcross_tolerance(rng):
    u0 = rng.standard_normal((30, 10))
    s = np.diag(2.0 ** -np.arange(10))
    v0 = rng.standard_normal((10, 25))
    y = u0 @ s @ v0
    u, v = localcross(y, 1e-2)
    rel = np.linalg.norm(u @ v - y) / np.linalg.norm(y)
    assert rel < 0.1
    assert u.shape[1] < 10


def test_localcross_zero(rng):
    u, v = localcross(np.zeros((5, 7)), 1e-8)
    np.testing.assert_allclose(u @ v, np.zeros((5, 7)))
