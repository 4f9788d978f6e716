"""Lorenz-96-type initial-state inference (the d=40 stress benchmark).

Reference: matlab/examples/lorenz/{lorenz_rhs.m, lorenz_ll.m,
test_lorenz.m}.  Cyclic Lorenz dynamics with forcing 8; the inference
target is the initial state given noisy observations of the even
coordinates at t=0.1, with a standard-normal prior around x0true and the
prior-tempered DIRT target ll*(b2-b1) + lprior*(b2^0.25 - b1^0.25)
(test_lorenz.m:120).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ode import integrate_to

__all__ = ["lorenz_rhs", "lorenz_ll", "LorenzProblem"]

_FORCING = 8.0  # lorenz_rhs.m:21
_T_OBS = 0.1    # lorenz_ll.m:5


def lorenz_rhs(t, x):
    """Cyclic Lorenz RHS on a batched state (M, d):
    f_i = (x_{i+1} - x_{i-2}) x_{i-1} - x_i + 8."""
    xp1 = jnp.roll(x, -1, axis=-1)
    xm1 = jnp.roll(x, 1, axis=-1)
    xm2 = jnp.roll(x, 2, axis=-1)
    return (xp1 - xm2) * xm1 - x + _FORCING


def lorenz_ll(x0, data, sigma_n, steps: int = 40,
              adaptive: bool = False, rtol: float = 1e-6,
              atol: float = 1e-8):
    """Gaussian log-likelihood of even-coordinate observations at t=0.1
    (lorenz_ll.m: observe Y(:, 2:2:end), misfit / (2 sigma_n^2)).

    ``adaptive=True`` integrates with the error-controlled
    Dormand-Prince pair (ode45 tolerance semantics, lorenz_ll.m:5-12)
    instead of the tuned fixed grid."""
    if adaptive:
        from .ode import integrate_adaptive

        y = integrate_adaptive(lorenz_rhs, x0, 0.0, _T_OBS, rtol=rtol,
                               atol=atol)
    else:
        y = integrate_to(lorenz_rhs, x0, 0.0, _T_OBS, steps)
    obs = y[:, 1::2]
    return -0.5 * jnp.sum((data[None, :] - obs) ** 2, axis=1) / sigma_n**2


@dataclass
class LorenzProblem:
    """Synthesized Lorenz inference problem (test_lorenz.m defaults:
    d=10 trial / d=40 paper, sigma_n=0.1, x0true=ones, sigma_truth=0.01,
    n=17 grid on [-10,10], R0=15, beta=10^(-4:1/2:0), reference 'n3')."""

    d: int = 10
    sigma_n: float = 0.1
    sigma_truth: float = 0.01
    a: float = 10.0
    n: int = 17
    seed: int = 0
    steps: int = 40
    adaptive: bool = False
    rtol: float = 1e-6
    x0true: Optional[np.ndarray] = None
    data: Optional[np.ndarray] = None
    beta: np.ndarray = field(
        default_factory=lambda: 10.0 ** np.arange(-4, 0.5, 0.5))

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        if self.x0true is None:
            self.x0base = np.ones(self.d)
            self.x0true = self.x0base + \
                self.sigma_truth * rng.standard_normal(self.d)
        else:
            self.x0base = np.asarray(self.x0true, dtype=np.float64)
            self.x0true = self.x0base
        if self.data is None:
            xend = integrate_to(lorenz_rhs,
                                jnp.asarray(self.x0true)[None, :],
                                0.0, _T_OBS, self.steps)[0]
            self.data = np.asarray(xend[1::2]) + \
                self.sigma_n * rng.standard_normal(self.d // 2)
        self.data = np.asarray(self.data, dtype=np.float64)

    def grids(self) -> list:
        return [np.linspace(-self.a, self.a, self.n)
                for _ in range(self.d)]

    def log_prior(self, x):
        return -0.5 * jnp.sum(
            (x - jnp.asarray(self.x0base)[None, :]) ** 2, axis=1)

    def log_likelihood(self, x):
        return lorenz_ll(x, jnp.asarray(self.data), self.sigma_n,
                         self.steps, adaptive=self.adaptive,
                         rtol=self.rtol)

    def log_posterior_fn(self):
        @jax.jit
        def lp(x):
            return self.log_likelihood(x) + self.log_prior(x)

        return lp

    def tempered_logratio_fn(self):
        """The prior-tempered DIRT ratio of test_lorenz.m:120."""
        @jax.jit
        def fn(x, b1, b2):
            return self.log_likelihood(x) * (b2 - b1) + \
                self.log_prior(x) * (b2**0.25 - b1**0.25)

        return fn
