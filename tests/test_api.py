"""One-call convenience API over the full pipeline."""
import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import DIRT, TT, sample_posterior


def lp(x):
    return -0.5 * (jnp.sum(x * x, axis=1)
                   + 0.8 * jnp.sum(x[:, :-1] * x[:, 1:], axis=1))


GRIDS = [np.linspace(-4, 4, 17)] * 6


def test_single_level_mcmc():
    res = sample_posterior(lp, GRIDS, 4096, tol=1e-6, seed=0)
    assert res.samples.shape == (4096, 6)
    assert res.weights is None and res.num_rejects is not None
    assert res.ess_inv < 1.05 and res.hellinger < 0.1
    assert isinstance(res.transport, TT) and res.evalcnt.sum() > 0
    # moments vs the analytic banded Gaussian
    cov = np.linalg.inv(np.eye(6) + 0.4 * (np.eye(6, k=1) + np.eye(6, k=-1)))
    emp = np.cov(np.asarray(res.samples).T)
    assert np.abs(emp - cov).max() < 0.1
    assert "N/ESS" in repr(res)


def test_qmc_iw_and_dirt_modes():
    res = sample_posterior(lp, GRIDS, 2048, tol=1e-6, qmc=True, seed=1)
    assert res.weights is not None and res.num_rejects is None
    np.testing.assert_allclose(res.weights.sum(), 1.0, rtol=1e-12)

    res2 = sample_posterior(
        lp, GRIDS, 2048, beta=[0.3, 1.0], seed=2, reference="n3",
        dirt_kwargs=dict(stoptol=0.2, nswp=2, kickrank=1, testsamples=0))
    assert isinstance(res2.transport, DIRT)
    assert res2.ess_inv < 1.1

    with pytest.raises(ValueError):
        sample_posterior(lp, GRIDS, 64, debias="nope")
