"""Tests for the Fourier-basis SIRT."""

import jax
import jax.numpy as jnp
import numpy as np

from tt_irt_tpu import TT, essinv, tt_from_dense, tt_irt_fourier, tt_irt_sqr
from tt_irt_tpu.samplers.fourier import fourier_precompute


def _tnormal_sqrt_density(grids, corr=0.3):
    d = len(grids)
    prec = np.eye(d) + corr * (np.eye(d, k=1) + np.eye(d, k=-1))
    mesh = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([m.ravel() for m in mesh], axis=1)
    e = np.einsum("mi,ij,mj->m", pts, prec, pts)
    return np.exp(-0.25 * e).reshape([len(g) for g in grids])


def _grids(d, n=24, sigma=4.0):
    # reference-style uniform grid without left border on (-S, S]
    h = 2 * sigma / n
    return [np.arange(-n // 2 + 1, n // 2 + 1) * h for _ in range(d)]


def test_fourier_matches_spline_sampler(rng):
    grids = _grids(3, n=32)
    sq = _tnormal_sqrt_density(grids, corr=0.3)
    t = tt_from_dense(jnp.asarray(sq), eps=1e-12)
    q = jnp.asarray(rng.random((512, 3)) * 0.98 + 0.01)
    xf, lff = tt_irt_fourier(grids, t, q)
    xs, lfs = tt_irt_sqr(grids, t, q)
    # same seeds, same density: the two interpolations agree to their
    # respective interpolation errors on this smooth target
    assert np.max(np.abs(np.asarray(xf) - np.asarray(xs))) < 2e-2
    np.testing.assert_allclose(np.asarray(lff), np.asarray(lfs), atol=0.05)


def test_fourier_cdf_inversion_accuracy(rng):
    # Gaussian product density: compare against the exact truncated
    # normal inverse CDF (the Fourier interpolant of a smooth density on
    # a fine grid is spectrally accurate)
    from scipy.special import erf, erfinv

    n, sigma = 48, 5.0
    grids = _grids(1, n=n, sigma=sigma)
    g = np.exp(-0.25 * grids[0] ** 2)
    t = TT([jnp.asarray(g)[None, :, None]])
    q = jnp.asarray(rng.random((2048, 1)) * 0.99 + 0.005)
    xq, lf = tt_irt_fourier(grids, t, q)
    cdf_factor = 0.5 / erf(sigma / np.sqrt(2))
    exact = erfinv((np.asarray(q[:, 0]) - 0.5) / cdf_factor) * np.sqrt(2)
    assert np.max(np.abs(np.asarray(xq[:, 0]) - exact)) < 1e-5


def test_fourier_prep_reuse(rng):
    grids = _grids(2, n=16)
    sq = _tnormal_sqrt_density(grids, corr=0.2)
    t = tt_from_dense(jnp.asarray(sq), eps=1e-12)
    prep = fourier_precompute(grids, t)
    q = jnp.asarray(rng.random((128, 2)) * 0.98 + 0.01)
    x1, l1 = tt_irt_fourier(grids, t, q)
    x2, l2 = tt_irt_fourier(None, prep, q)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-12)


def test_fourier_dirt_end_to_end(rng):
    # DIRT with Fourier interpolation at levels >= 1 (the diffusion
    # example configuration, test_diffusion_dirt.m:150-152)
    from tt_irt_tpu import randref, tt_dirt_approx, tt_dirt_sample

    d = 3

    def logratio(x, b0, b1):
        quad = jnp.sum(x * x, axis=1) + \
            0.8 * jnp.sum(x[:, :-1] * x[:, 1:], axis=1)
        return -0.5 * (b1 - b0) * quad

    grids0 = [np.linspace(-5, 5, 17) for _ in range(d)]
    dirt = tt_dirt_approx(
        grids0, logratio, [0.1, 0.5, 1.0], stoptol=0.15, nswp=3,
        kickrank=2, testsamples=256, seed=1, reference="n4",
        interpolation="fourier", nq=[16] * d)
    q = randref("n4", jax.random.PRNGKey(3), (2048, d))
    z, lfapp, lfex = tt_dirt_sample(
        dirt, q, lambda x: logratio(x, 0.0, 1.0))
    tau = float(essinv(lfex, lfapp))
    assert tau < 2.0, tau

    # prepare-once serving hoists the per-level Fourier precompute
    # (the reference's struct reuse, tt_irt_fourier.m:106-137) and
    # must reproduce the per-call path bitwise
    from tt_irt_tpu import DirtSampler

    sampler = DirtSampler(dirt)
    assert sampler._upper is not None and sampler._upper[0] == "spectral"
    z2, lf2 = sampler(q)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z))
    np.testing.assert_array_equal(np.asarray(lf2), np.asarray(lfapp))


def test_chebyshev_sirt_exactness_1d():
    """Chebyshev-spectral SIRT (the native ftt.m/build_ftt analog):
    1-d inversion matches the analytic normal inverse CDF to the
    Newton tolerance, log-density to 1e-6."""
    from scipy import stats

    from tt_irt_tpu.samplers.chebyshev import lobatto_nodes, tt_irt_cheb

    n = 33
    x = lobatto_nodes(n, -4.0, 4.0)
    vals = np.exp(-x ** 2 / 2.0)          # sqrt of exp(-x^2)
    tt = TT([jnp.asarray(vals[None, :, None])])
    q = jnp.asarray(np.linspace(0.001, 0.999, 501)[:, None])
    xs, lf = tt_irt_cheb([x], tt, q)
    sigma = 1.0 / np.sqrt(2.0)
    exact = stats.norm.ppf(np.asarray(q)[:, 0], scale=sigma)
    assert np.max(np.abs(np.asarray(xs)[:, 0] - exact)) < 1e-4
    lpdf = stats.norm.logpdf(np.asarray(xs)[:, 0], scale=sigma)
    assert np.max(np.abs(np.asarray(lf) - lpdf)) < 1e-6


def test_chebyshev_sirt_multidim_quality():
    """d=3 coupled density: transported samples are statistically exact
    (N/ESS at the fp floor) against the true log-density."""
    from tt_irt_tpu import essinv
    from tt_irt_tpu.ops.tt import tt_from_dense
    from tt_irt_tpu.samplers.chebyshev import lobatto_nodes, tt_irt_cheb

    d = 3
    grids = [lobatto_nodes(25, -5, 5) for _ in range(d)]

    def sqrtdens(xs_):
        s = xs_ @ np.array([1.0, 0.8, 0.6])
        return np.exp(-0.25 * np.sum(xs_ ** 2, -1) - 0.05 * s ** 2)

    mesh = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([v.ravel() for v in mesh], -1)
    dense = sqrtdens(pts).reshape(25, 25, 25)
    ttd = tt_from_dense(jnp.asarray(dense), eps=1e-12)
    q3 = jax.random.uniform(jax.random.PRNGKey(0), (8192, d),
                            dtype=jnp.float64)
    z, lfa = tt_irt_cheb(grids, ttd, q3)
    lfex = 2.0 * np.log(sqrtdens(np.asarray(z)))
    tau = float(essinv(jnp.asarray(lfex), lfa))
    assert tau < 1.0001, tau


def test_dirt_chebyshev_interpolation():
    """DIRT with interpolation='chebyshev': levels >= 1 on Lobatto
    nodes, level 0 spline (tt_dirt_sample.m:69-71 semantics)."""
    from tt_irt_tpu import (
        essinv, randref, tt_dirt_approx, tt_dirt_sample,
    )

    d = 4
    grids = [np.linspace(-5, 5, 17) for _ in range(d)]

    def logratio(x, b0, b1):
        quad = jnp.sum(x * x, axis=1) + \
            0.6 * jnp.sum(x[:, :-1] * x[:, 1:], axis=1)
        return -0.5 * (b1 - b0) * quad

    dirt = tt_dirt_approx(grids, logratio, [0.1, 0.4, 1.0],
                          interpolation="chebyshev", reference="n3",
                          nswp=3, kickrank=2, stoptol=0.1,
                          testsamples=256, verb=0, seed=6)
    q = randref("n3", jax.random.PRNGKey(3), (2048, d))
    z, lfapp, lfex = tt_dirt_sample(dirt, q,
                                    lambda x: logratio(x, 0.0, 1.0))
    tau = float(essinv(lfex, lfapp))
    assert tau < 1.5, tau

    # prepare-once serving (hoisted ChebPrep) reproduces it bitwise
    from tt_irt_tpu import DirtSampler

    sampler = DirtSampler(dirt)
    assert sampler._upper is not None and sampler._upper[0] == "spectral"
    z2, lf2 = sampler(q)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z))
    np.testing.assert_array_equal(np.asarray(lf2), np.asarray(lfapp))
