"""Shock-absorber reliability model: censored Weibull regression with a
Normal-Gamma prior.

Reference: matlab/examples/shock_absorber/{shock_log_prior.m,
shock_log_weibull.m, shock_quantiles.m, test_shock_absorber_tt.m} and the
paper data table (test_shock_absorber_tt.m:50-54).  The covariates used
in the Stat&Comp paper ship as data/shock-xdata-d6.dat (a data fixture,
reference README.md:18).

Parameter layout theta (M, d+2): [beta_0, beta_1..beta_d, lambda].
Everything is vectorized over the sample axis and jit-friendly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SHOCK_Y", "SHOCK_CENSORED", "ShockConfig", "log_prior",
    "log_likelihood", "log_posterior", "quantile_qoi", "paper_covariates",
]

# Failure/censoring data from the paper (test_shock_absorber_tt.m:50-54)
SHOCK_Y = np.array([
    6700, 6950, 7820, 8790, 9120, 9660, 9820, 11310, 11690, 11850, 11880,
    12140, 12200, 12870, 13150, 13330, 13470, 14040, 14300, 17520, 17540,
    17890, 18420, 18960, 18980, 19410, 20100, 20100, 20150, 20320, 20900,
    22700, 23490, 26510, 27410, 27490, 27890, 28100], dtype=np.float64)
SHOCK_CENSORED = np.array([
    0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 0, 1, 1, 1, 0, 0, 1, 1, 1,
    1, 1, 1, 0, 1, 1, 1, 0, 0, 1, 0, 1, 0, 1, 1], dtype=np.float64)

_ALPHA = 6.8757   # Normal-Gamma shape (shock_log_prior.m:6)
_BETA = 2.2932    # Normal-Gamma rate  (shock_log_prior.m:7)
_UNDERFLOW_SHIFT = np.log(3.0e4)  # shock_log_weibull.m:19


def paper_covariates() -> np.ndarray:
    """The (d=6, m=38) covariate matrix used in the paper experiments."""
    path = os.path.join(os.path.dirname(__file__), "data",
                        "shock-xdata-d6.dat")
    return np.loadtxt(path)


@dataclass
class ShockConfig:
    """Grid/domain configuration (test_shock_absorber_tt.m:71-98)."""

    d: int = 6            # number of covariates
    n: int = 17           # grid points per variable
    x: Optional[np.ndarray] = None  # covariates (d, m); None -> random
    seed: int = 0
    y: np.ndarray = field(default_factory=lambda: SHOCK_Y.copy())
    censored: np.ndarray = field(
        default_factory=lambda: SHOCK_CENSORED.copy())

    def __post_init__(self):
        if self.x is None:
            rng = np.random.default_rng(self.seed)
            self.x = rng.standard_normal(
                (self.d, self.y.shape[0])) / self.d
        self.x = np.asarray(self.x, dtype=np.float64)
        self.beta_mean = np.zeros(self.d + 1)
        self.beta_mean[0] = np.log(30796.0)
        self.beta_var = np.ones(self.d + 1)
        self.beta_var[0] = 0.1563
        a = self.beta_mean - 3.0 * np.sqrt(self.beta_var)
        b = 2.0 * self.beta_mean - a
        self.a = np.concatenate([a, [0.0]])
        self.b = np.concatenate([b, [13.0]])

    def grids(self) -> list:
        return [np.linspace(self.a[i], self.b[i], self.n)
                for i in range(self.d + 2)]

    def log_posterior_fn(self):
        x = jnp.asarray(self.x)
        y = jnp.asarray(self.y)
        c = jnp.asarray(self.censored)
        bm = jnp.asarray(self.beta_mean)
        bv = jnp.asarray(self.beta_var)

        @jax.jit
        def lpifun(theta):
            return log_likelihood(theta, x, y, c) + \
                log_prior(theta, bm, bv)

        return lpifun


def log_prior(theta, beta_mean, beta_var):
    """Normal-Gamma log prior (shock_log_prior.m:4-10)."""
    lam = theta[:, -1]
    betas = theta[:, :-1]
    quad = -0.5 * jnp.sum(
        (betas - beta_mean[None, :]) ** 2 * lam[:, None] / beta_var[None, :],
        axis=1)
    return (_ALPHA - 0.5) * jnp.log(lam) - _BETA * lam + quad


def log_likelihood(theta, x, y, censored):
    """Censored Weibull log likelihood, vectorized over samples and data
    (replaces the reference's per-datum loop, shock_log_weibull.m:12-22,
    with one batched matmul + masked reduction)."""
    d = theta.shape[1] - 2
    beta0 = theta[:, 0]
    betas = theta[:, 1:d + 1]
    lam = theta[:, -1]
    logeta = beta0[:, None] + betas @ x          # (M, m)
    yeta = y[None, :] / jnp.exp(logeta)
    pow_term = yeta ** lam[:, None]
    log_y = jnp.log(y)[None, :]
    uncensored = (jnp.log(lam)[:, None] - logeta
                  + (lam[:, None] - 1.0) * (log_y - logeta)
                  - pow_term + _UNDERFLOW_SHIFT)
    censored_term = -pow_term
    f = jnp.where(censored[None, :] > 0, censored_term, uncensored)
    return jnp.sum(f, axis=1)


def log_posterior(theta, config: ShockConfig):
    return config.log_posterior_fn()(theta)


def quantile_qoi(z, x_pred=None, is_weight=None, q: float = 0.05,
                 newton_iters: int = 20):
    """Posterior 95% reliability quantile QoI (shock_quantiles.m):
    returns (mean-of-quantiles, quantile-of-mean-density) — the second via
    a fixed-iteration Newton solve on the mean Weibull CDF."""
    z = jnp.asarray(z)
    d = z.shape[1] - 2
    if x_pred is None:
        x_pred = jnp.zeros((d,))
    theta1 = jnp.exp(z[:, 0] + z[:, 1:d + 1] @ x_pred)
    theta2 = z[:, -1]
    if is_weight is not None:
        w = jnp.asarray(is_weight)
        zex = jnp.sum(w)

        def avg(v):
            return jnp.sum(v * w) / zex
    else:
        def avg(v):
            return jnp.mean(v)

    qf = theta1 * (-jnp.log(q)) ** (1.0 / theta2)
    qf = jnp.where(qf > 1e7, 0.0, qf)
    q_post = avg(qf)

    def newton_step(qn, _):
        r = avg(jnp.exp(-(qn / theta1) ** theta2)) / q - 1.0
        jac = avg(jnp.exp(-(qn / theta1) ** theta2)
                  * (theta2 / theta1) * (qn / theta1) ** (theta2 - 1.0)) / q
        return qn + r / jac, None

    q_newton, _ = jax.lax.scan(newton_step, q_post, None,
                               length=newton_iters)
    return q_post, q_newton
