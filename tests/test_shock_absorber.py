"""End-to-end shock absorber benchmark: TT-MH and TT-qIW pipelines.

Correctness criterion (SURVEY.md §4): statistical agreement between
independent methods on the same problem — the MH-debiased and
QMC+importance-weighted quantile estimates must agree, with sane
rejection rates and ESS (mirrors test_shock_absorber_tt.m:116-142)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import (
    amen_cross_s, essinv, iact, mcmc_prune, qmcnodes, tt_irt_lin,
)
from tt_irt_tpu.models import shock_absorber as sa


@pytest.fixture(scope="module")
def shock_setup():
    cfg = sa.ShockConfig(d=6, n=17, x=sa.paper_covariates())
    lpifun = cfg.log_posterior_fn()
    grids = cfg.grids()

    def cross_fun(ind):
        ind = np.asarray(ind)
        theta = jnp.stack(
            [jnp.asarray(grids[k])[ind[:, k]] for k in range(cfg.d + 2)],
            axis=1)
        return np.asarray(jnp.exp(lpifun(theta)))

    res = amen_cross_s([cfg.n] * (cfg.d + 2), cross_fun, 0.0,
                       tol_exit=0.05, y0=8, kickrank=2, nswp=20, seed=0)
    return cfg, lpifun, grids, res


def test_cross_converges(shock_setup):
    cfg, lpifun, grids, res = shock_setup
    assert res.evalcnt[0] > 0
    assert max(res.tt.ranks) <= 60


def test_ttmh_and_qiw_agree(shock_setup):
    cfg, lpifun, grids, res = shock_setup
    m = 1 << 14

    # --- TT-MH branch (tt_irt_debias 'mcmc') ---
    key = jax.random.PRNGKey(42)
    key, k1, k2 = jax.random.split(key, 3)
    z = jax.random.uniform(k1, (m, cfg.d + 2), dtype=jnp.float64)
    y, lfapp = tt_irt_lin(grids, res.tt, z)
    lfex = lpifun(y)
    mh = mcmc_prune(y, lfex, lfapp, key=k2)
    rej_rate = float(mh.num_rejects) / m
    assert rej_rate < 0.40, rej_rate
    q_mh, q_mh_newton = sa.quantile_qoi(mh.y)

    # --- TT-qIW branch (QMC seeds + importance weights) ---
    zq = jnp.asarray(qmcnodes(cfg.d + 2, 14, seed=7))
    yq, lfapp_q = tt_irt_lin(grids, res.tt, zq)
    lfex_q = lpifun(yq)
    w = jnp.exp(lfex_q - lfapp_q)
    q_iw, q_iw_newton = sa.quantile_qoi(yq, is_weight=w)

    # diagnostics
    tau_ess = float(essinv(lfex_q, lfapp_q))
    assert tau_ess < 3.0, tau_ess
    tau_iact = float(np.mean(iact(np.asarray(mh.y))))
    assert tau_iact < 6.0, tau_iact

    # the headline QoI: two independent debiasing methods agree
    assert np.isfinite(float(q_mh)) and float(q_mh) > 0
    rel = abs(float(q_mh) - float(q_iw)) / float(q_iw)
    assert rel < 0.05, (float(q_mh), float(q_iw))
    rel_newton = abs(float(q_mh_newton) - float(q_iw_newton)) / \
        float(q_iw_newton)
    assert rel_newton < 0.05

    # quantile magnitude sanity: same scale as the data (10^4 km)
    assert 5e3 < float(q_mh) < 5e4


def test_posterior_mode_scale(shock_setup):
    # lambda posterior concentrates away from 0; beta0 near log(30796)
    cfg, lpifun, grids, res = shock_setup
    m = 1 << 13
    key = jax.random.PRNGKey(3)
    z = jax.random.uniform(key, (m, cfg.d + 2), dtype=jnp.float64)
    y, lfapp = tt_irt_lin(grids, res.tt, z)
    lam = np.asarray(y[:, -1])
    b0 = np.asarray(y[:, 0])
    assert 1.0 < lam.mean() < 6.0
    assert abs(b0.mean() - np.log(30796.0)) < 0.5
