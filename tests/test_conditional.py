"""Conditional sampling through the triangular transport structure.

Oracle: conditionals of a banded Gaussian are Gaussian with closed-form
moments (precision-block algebra).  The sharp check is essinv between
the exact joint log-density and the returned log conditional density:
they differ by a constant (the log marginal at the conditioning point)
iff the conditional is exact, and essinv is shift-invariant, so
N/ESS ~ 1 pins correctness of both the samples and the density.

Covers both mechanisms: partial evaluation (single conditioning point,
any coordinate subset — rank-preserving core substitution) and the
partial inverse (per-seed conditioning rows through the prefix), plus
the DIRT variants (prefix and dirt_permute-relabeled subsets).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import (
    amen_cross_s, essinv, tt_dirt_approx, tt_dirt_cond_sample, tt_irt_cond,
    tt_irt_sqr,
)

CORR = 0.4
D = 5
N = 33
A = np.array([0.7, -0.4])


def lp(x):
    return -0.5 * (jnp.sum(x * x, axis=1)
                   + 2.0 * CORR * jnp.sum(x[:, :-1] * x[:, 1:], axis=1))


GRIDS = [np.linspace(-5, 5, N)] * D


def analytic_conditional(cond):
    rest = [i for i in range(D) if i not in cond]
    P = np.eye(D) + CORR * (np.eye(D, k=1) + np.eye(D, k=-1))
    Prr, Prf = P[np.ix_(rest, rest)], P[np.ix_(rest, cond)]
    return rest, -np.linalg.solve(Prr, Prf @ A), np.linalg.inv(Prr)


@pytest.fixture(scope="module")
def tt_f():
    def fun(ind):
        pts = jnp.stack([jnp.asarray(GRIDS[k])[np.asarray(ind)[:, k]]
                         for k in range(D)], 1)
        return np.asarray(jnp.exp(0.5 * lp(pts)))

    return amen_cross_s([N] * D, fun, 1e-8, tol_exit=1e-8).tt


@pytest.fixture(scope="module")
def seeds():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.uniform(1e-6, 1 - 1e-6, (1 << 13, D - 2)))


def _check(z, lfcond, seeds, cond):
    rest, mu, sig = analytic_conditional(cond)
    assert bool(jnp.all(z[:, jnp.asarray(cond)] == jnp.asarray(A)))
    zs = np.asarray(z[:, rest])
    m = seeds.shape[0]
    assert np.abs(zs.mean(0) - mu).max() < 5.0 / np.sqrt(m)
    assert np.abs(np.cov(zs.T) - sig).max() < 12.0 / np.sqrt(m)
    # exactness of the conditional density (shift-invariant chi^2)
    assert float(essinv(lp(z), lfcond)) < 1.02


def test_tt_irt_cond_prefix(tt_f, seeds):
    z, lfcond = tt_irt_cond(GRIDS, tt_f, A, seeds)
    _check(z, lfcond, seeds, [0, 1])

    with pytest.raises(ValueError):
        tt_irt_cond(GRIDS, tt_f, A, seeds[:, :-1])  # dims don't cover d
    with pytest.raises(ValueError):
        tt_irt_cond(GRIDS, tt_f, np.tile(A, (7, 1)), seeds)  # bad rows


def test_tt_irt_cond_arbitrary_subset(tt_f, seeds):
    # single conditioning point, non-prefix dims -> partial evaluation
    z, lfcond = tt_irt_cond(GRIDS, tt_f, A, seeds, cond_dims=[1, 3])
    _check(z, lfcond, seeds, [1, 3])
    # per-seed rows on a non-prefix subset must refuse
    with pytest.raises(ValueError):
        xrows = np.tile(A, (seeds.shape[0], 1)) + 0.01 * np.arange(
            seeds.shape[0])[:, None]
        tt_irt_cond(GRIDS, tt_f, xrows, seeds, cond_dims=[1, 3])


def test_tt_irt_cond_per_seed_rows_roundtrip(tt_f):
    # sharp identity: conditioning on z[:, :k] with the original seeds
    # must reproduce the joint transform and its density split
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.uniform(0.01, 0.99, (256, D)))
    z_full, lf_full = tt_irt_sqr(GRIDS, tt_f, q)
    z, lfcond = tt_irt_cond(GRIDS, tt_f, z_full[:, :2], q[:, 2:])
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_full),
                               atol=1e-8)
    _, lf_marg = tt_irt_sqr(GRIDS, tt_f, q[:, :2])  # marginal density
    np.testing.assert_allclose(np.asarray(lfcond),
                               np.asarray(lf_full - lf_marg), atol=1e-8)


@pytest.fixture(scope="module")
def dirt():
    return tt_dirt_approx(
        GRIDS, lambda x, b0, b1: (b1 - b0) * lp(x), [0.3, 1.0],
        stoptol=0.1, nswp=3, kickrank=2, testsamples=0, verb=0, seed=2)


def test_tt_dirt_cond_sample_prefix(dirt, seeds):
    z, lfcond, lfex = tt_dirt_cond_sample(dirt, A, seeds, logpostfun=lp)
    _check(z, lfcond, seeds, [0, 1])
    np.testing.assert_allclose(np.asarray(lfex), np.asarray(lp(z)),
                               rtol=1e-10)


@pytest.mark.skipif(bool(__import__("os").environ.get("TTIRT_TEST_TPU")),
                    reason="dirt_permute grows ranks to ~167; first "
                           "compile of those odd shapes on the chip "
                           "takes minutes and validates nothing new")
def test_tt_dirt_cond_sample_subset(dirt, seeds):
    # dirt_permute relabeling; smaller seed set (permuted ranks grow)
    z, lfcond = tt_dirt_cond_sample(dirt, A, seeds[:1024],
                                    cond_dims=[1, 3], perm_eps=1e-6)
    rest, mu, _ = analytic_conditional([1, 3])
    assert bool(jnp.all(z[:, jnp.asarray([1, 3])] == jnp.asarray(A)))
    zs = np.asarray(z[:, rest])
    assert np.abs(zs.mean(0) - mu).max() < 6.0 / np.sqrt(1024)
    assert float(essinv(lp(z), lfcond)) < 1.05


def test_tt_irt_cond_lin_mode():
    """v1 pipeline conditional: f is the density itself (tt_irt_lin.m);
    substitution gives the exact conditional without squaring."""
    def fun(ind):
        pts = jnp.stack([jnp.asarray(GRIDS[k])[np.asarray(ind)[:, k]]
                         for k in range(D)], 1)
        return np.asarray(jnp.exp(lp(pts)))  # density, not sqrt

    f = amen_cross_s([N] * D, fun, 1e-9, tol_exit=1e-9).tt
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(1e-6, 1 - 1e-6, (1 << 12, D - 2)))
    z, lfcond = tt_irt_cond(GRIDS, f, A, q, cond_dims=[1, 3], mode="lin")
    assert float(essinv(lp(z), lfcond)) < 1.02
    with pytest.raises(ValueError):
        tt_irt_cond(GRIDS, f, np.tile(A, (q.shape[0], 1)), q, mode="lin")
