"""Tests for the ODE integrators and the Lorenz / predator-prey models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import essinv, mcmc_prune, randref, tt_dirt_approx, \
    tt_dirt_sample
from tt_irt_tpu.models.ode import dopri5_step, integrate_observed, \
    integrate_to, rk4
from tt_irt_tpu.models import lorenz as lz
from tt_irt_tpu.models import predator_prey as pp


def test_integrator_linear_exact():
    # dy/dt = A y with known matrix exponential
    a = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])  # rotation

    def rhs(t, y):
        return y @ a.T

    y0 = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    t1 = 1.5
    y = integrate_to(rhs, y0, 0.0, t1, steps=50)
    rot = np.array([[np.cos(t1), np.sin(t1)], [-np.sin(t1), np.cos(t1)]])
    np.testing.assert_allclose(np.asarray(y), y0 @ rot.T, atol=1e-9)
    yr = integrate_to(rhs, y0, 0.0, t1, steps=200, method="rk4")
    np.testing.assert_allclose(np.asarray(yr), y0 @ rot.T, atol=1e-8)


def test_integrate_observed_consistency():
    def rhs(t, y):
        return -0.5 * y

    y0 = jnp.ones((3, 2))
    ts = jnp.asarray([0.0, 1.0, 2.0, 4.0])
    states = integrate_observed(rhs, y0, ts, steps_per_interval=32)
    assert states.shape == (4, 3, 2)
    for i, t in enumerate(np.asarray(ts)):
        np.testing.assert_allclose(np.asarray(states[i]),
                                   np.exp(-0.5 * t) * np.ones((3, 2)),
                                   atol=1e-9)


def test_lorenz_rhs_cyclic():
    d = 6
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, d)))
    f = lz.lorenz_rhs(0.0, x)
    xn = np.asarray(x)
    for i in range(d):
        expect = (xn[:, (i + 1) % d] - xn[:, (i - 2) % d]) * \
            xn[:, (i - 1) % d] - xn[:, i] + 8.0
        np.testing.assert_allclose(np.asarray(f[:, i]), expect, atol=1e-12)


def test_lorenz_ll_peak_at_truth():
    prob = lz.LorenzProblem(d=6, seed=1, sigma_n=0.2)
    lp = prob.log_posterior_fn()
    x_true = jnp.asarray(prob.x0true)[None, :]
    rng = np.random.default_rng(2)
    x_far = x_true + jnp.asarray(rng.standard_normal((16, 6)))
    l_true = float(lp(x_true)[0])
    l_far = np.asarray(lp(x_far))
    assert np.all(l_far < l_true)


def test_lorenz_dirt_end_to_end():
    prob = lz.LorenzProblem(d=4, seed=3, sigma_n=0.2, n=13)
    dirt = tt_dirt_approx(
        prob.grids(), prob.tempered_logratio_fn(),
        [0.01, 0.1, 1.0], nswp=1, kickrank=0, y0=8, boundary=True,
        stoptol=0.1, reference="n3", testsamples=256, seed=0)
    q = randref("n3", jax.random.PRNGKey(5), (2048, 4))
    z, lfapp, lfex = tt_dirt_sample(dirt, q, prob.log_posterior_fn())
    tau = float(essinv(lfex, lfapp))
    assert tau < 5.0, tau
    res = mcmc_prune(z, lfex, lfapp, key=jax.random.PRNGKey(6))
    post_mean = np.asarray(res.y).mean(axis=0)
    # posterior concentrates near the truth (sigma_n=0.2 noise)
    assert np.max(np.abs(post_mean - prob.x0true)) < 0.5


def test_pp_rhs_dynamics():
    prob = pp.PredatorPreyProblem(seed=0)
    states = integrate_observed(
        pp.pp_rhs_factory(jnp.asarray(prob.xtrue)[None, :]),
        jnp.asarray(prob.xtrue[:2])[None, :],
        jnp.asarray(prob.obs_times), 64)[:, 0, :]
    s = np.asarray(states)
    # predator-prey oscillation: prey population stays positive + bounded
    assert np.all(s > 0)
    assert np.all(s[:, 0] < 150)
    # against the shipped paper data: same trajectory scale
    paper = pp.paper_observables()
    assert np.max(np.abs(s - paper)) < 12.0  # paper data has noise var 2


def test_pp_loglikelihood_normalized_peak():
    prob = pp.PredatorPreyProblem(seed=1)
    lp = prob.log_posterior_fn()
    ones = jnp.ones((1, 8))
    l_true = float(lp(ones)[0])
    rng = np.random.default_rng(3)
    x_off = jnp.asarray(1.0 + 0.3 * rng.standard_normal((8, 8)))
    x_off = jnp.clip(x_off, 0.6, 1.6)
    assert np.all(np.asarray(lp(x_off)) <= l_true + 1e-9)


@pytest.mark.slow
def test_pp_dirt_end_to_end():
    # Reference ladder/rank/grids (test_predator_prey_dirt.m:52-97).
    # This is a *statistical* integration test in the reference's own
    # style: across seeds the end-to-end N/ESS of this configuration
    # ranges ~2-125 (the construction gate accepts levels at N/ESS<50,
    # tt_dirt_approx.m:51-52); the assertions are calibrated to catch
    # real regressions (broken transports measure N/ESS 400-1000 and
    # >95% rejections) without flaking on stochastic variation.
    prob = pp.PredatorPreyProblem(seed=2, steps_per_interval=32)
    dirt = tt_dirt_approx(
        prob.grids(), prob.tempered_logratio_fn(),
        10.0 ** np.arange(-4, 0.5, 0.5), nswp=1, kickrank=0, y0=13,
        boundary=True, stoptol=0.1, reference="n4", testsamples=100,
        seed=0)  # testsamples=100 is the reference's own PP choice
                 # (test_predator_prey_dirt.m:97) - a permissive gate
    q = randref("n4", jax.random.PRNGKey(5), (1024, 8))
    z, lfapp, lfex = tt_dirt_sample(dirt, q, prob.log_posterior_fn())
    tau = float(essinv(lfex, lfapp))
    assert tau < 150.0, tau
    res = mcmc_prune(z, lfex, lfapp, key=jax.random.PRNGKey(6))
    rej = float(res.num_rejects) / 1024
    assert rej < 0.9, rej
    # normalized posterior mean near 1
    post_mean = np.asarray(res.y).mean(axis=0)
    assert np.max(np.abs(post_mean - 1.0)) < 0.25


def test_adaptive_dopri5_tolerance_scaling():
    """integrate_adaptive must deliver errors tracking rtol (ode45
    semantics, PP_loglikelihood.m:7-9) on a chaotic Lorenz flow over a
    long window where a coarse fixed grid is inaccurate."""
    from tt_irt_tpu.models.lorenz import lorenz_rhs
    from tt_irt_tpu.models.ode import integrate_adaptive, integrate_to

    rng = np.random.default_rng(0)
    y0 = jnp.asarray(1.0 + 0.5 * rng.standard_normal((16, 10)))
    t1 = 2.0
    ref = integrate_to(lorenz_rhs, y0, 0.0, t1, 4096)   # fine fixed ref

    errs = {}
    stats = {}
    for rtol in (1e-4, 1e-7):
        y, st = integrate_adaptive(lorenz_rhs, y0, 0.0, t1, rtol=rtol,
                                   atol=rtol * 1e-2, return_stats=True)
        errs[rtol] = float(jnp.max(jnp.abs(y - ref)))
        stats[rtol] = st
    # global error = local tolerance x Lyapunov amplification (~e^2.4
    # over t=2 on this flow); measured: 1.1e-2 at rtol 1e-4, 1.8e-5 at
    # 1e-7 — clean tolerance tracking with ~10x assertion headroom
    assert errs[1e-4] < 5e-2, errs
    assert errs[1e-7] < 2e-4, errs
    assert errs[1e-7] < errs[1e-4] * 0.1, errs
    # tighter tolerance must take more steps; all rows reach t1
    assert int(jnp.min(stats[1e-7]["nsteps"])) > \
        int(jnp.min(stats[1e-4]["nsteps"]))
    np.testing.assert_allclose(np.asarray(stats[1e-7]["t"]), t1,
                               atol=1e-9)


def test_adaptive_matches_fixed_step_likelihoods():
    """A/B at reference tolerances (VERDICT r02 #5): the adaptive and
    tuned-fixed-grid likelihoods must agree on both ODE problem suites."""
    from tt_irt_tpu.models import lorenz as lz
    from tt_irt_tpu.models import predator_prey as pp

    rng = np.random.default_rng(1)

    prob = lz.LorenzProblem(d=10, seed=0)
    x = jnp.asarray(prob.x0base[None, :]
                    + 0.3 * rng.standard_normal((32, 10)))
    ll_fix = lz.lorenz_ll(x, jnp.asarray(prob.data), prob.sigma_n,
                          steps=prob.steps)
    ll_ad = lz.lorenz_ll(x, jnp.asarray(prob.data), prob.sigma_n,
                         adaptive=True, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ll_ad), np.asarray(ll_fix),
                               rtol=1e-4, atol=1e-5)

    ppb = pp.PredatorPreyProblem(seed=0)
    xs = jnp.asarray(1.0 + 0.1 * rng.standard_normal((8, ppb.d)))
    lp_fix = pp.pp_loglikelihood(
        xs, jnp.asarray(ppb.data), jnp.asarray(ppb.obs_times),
        ppb.sigma_n, jnp.asarray(ppb.xtrue), np.asarray(ppb.ind),
        steps_per_interval=256)
    lp_ad = pp.pp_loglikelihood(
        xs, jnp.asarray(ppb.data), jnp.asarray(ppb.obs_times),
        ppb.sigma_n, jnp.asarray(ppb.xtrue), np.asarray(ppb.ind),
        adaptive=True, rtol=1e-6)
    # reference tolerance (RelTol 1e-6): likelihoods agree to ~1e-4
    np.testing.assert_allclose(np.asarray(lp_ad), np.asarray(lp_fix),
                               rtol=1e-4, atol=1e-3)


def test_adaptive_integrator_jits():
    """The while_loop form must compile inside jit (construction pushes
    trace the likelihood)."""
    from tt_irt_tpu.models.lorenz import lorenz_rhs
    from tt_irt_tpu.models.ode import integrate_adaptive

    @jax.jit
    def f(y0):
        return integrate_adaptive(lorenz_rhs, y0, 0.0, 0.1, rtol=1e-6)

    y = f(jnp.ones((4, 10)))
    assert np.all(np.isfinite(np.asarray(y)))
