"""Conditional sampling through the triangular transport structure.

Oracle: conditionals of a banded Gaussian are Gaussian with closed-form
moments (precision-block algebra).  The sharp check is essinv between
the exact joint log-density and the returned log conditional density:
they differ by a constant (the log marginal at the conditioning point)
iff the conditional is exact, and essinv is shift-invariant, so
N/ESS ~ 1 pins correctness of both the samples and the density.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import (
    amen_cross_s, essinv, tt_dirt_approx, tt_dirt_cond_sample, tt_irt_cond,
)

CORR = 0.4
D = 5
N = 33
K = 2  # conditioned block size
A = np.array([0.7, -0.4])


def lp(x):
    return -0.5 * (jnp.sum(x * x, axis=1)
                   + 2.0 * CORR * jnp.sum(x[:, :-1] * x[:, 1:], axis=1))


GRIDS = [np.linspace(-5, 5, N)] * D


def analytic_conditional():
    P = np.eye(D) + CORR * (np.eye(D, k=1) + np.eye(D, k=-1))
    Prr, Prf = P[K:, K:], P[K:, :K]
    return -np.linalg.solve(Prr, Prf @ A), np.linalg.inv(Prr)


@pytest.fixture(scope="module")
def seeds():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.uniform(1e-6, 1 - 1e-6, (1 << 13, D - K)))


def _check(z, lfcond, seeds):
    mu, sig = analytic_conditional()
    assert bool(jnp.all(z[:, :K] == jnp.asarray(A)))
    zs = np.asarray(z[:, K:])
    m = seeds.shape[0]
    assert np.abs(zs.mean(0) - mu).max() < 5.0 / np.sqrt(m)
    assert np.abs(np.cov(zs.T) - sig).max() < 12.0 / np.sqrt(m)
    # exactness of the conditional density (shift-invariant chi^2)
    assert float(essinv(lp(z), lfcond)) < 1.02


def test_tt_irt_cond_matches_analytic(seeds):
    def fun(ind):
        pts = jnp.stack([jnp.asarray(GRIDS[k])[np.asarray(ind)[:, k]]
                         for k in range(D)], 1)
        return np.asarray(jnp.exp(0.5 * lp(pts)))

    f = amen_cross_s([N] * D, fun, 1e-8, tol_exit=1e-8).tt
    z, lfcond = tt_irt_cond(GRIDS, f, A, seeds)
    _check(z, lfcond, seeds)

    with pytest.raises(ValueError):
        tt_irt_cond(GRIDS, f, A, seeds[:, :-1])  # dims don't cover d
    with pytest.raises(ValueError):
        tt_irt_cond(GRIDS, f, np.tile(A, (7, 1)), seeds)  # bad row count


def test_tt_dirt_cond_sample_matches_analytic(seeds):
    dirt = tt_dirt_approx(
        GRIDS, lambda x, b0, b1: (b1 - b0) * lp(x), [0.3, 1.0],
        stoptol=0.1, nswp=3, kickrank=2, testsamples=0, verb=0, seed=2)
    z, lfcond, lfex = tt_dirt_cond_sample(dirt, A, seeds, logpostfun=lp)
    _check(z, lfcond, seeds)
    np.testing.assert_allclose(np.asarray(lfex), np.asarray(lp(z)),
                               rtol=1e-10)
