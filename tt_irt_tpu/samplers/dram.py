"""DRAM: delayed-rejection adaptive Metropolis baseline sampler.

The reference downloads an external MATLAB `dramrun` for its comparison
baselines (utils/check_mcmc.m; used by test_*_dram.m).  This is a
self-contained TPU-native equivalent: the chain evolves under
`lax.scan`, proposals/accepts are batched over independent chains
(vmapped), covariance adaptation follows Haario et al. (AM) with a
second-stage delayed-rejection proposal scaled down by `drscale`.

Capabilities mirror dramrun as used by the reference baselines:
Gaussian proposal with adapted covariance, bounds via rejection,
2-stage DR, burn-in discard.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dram"]


class DRAMResult(NamedTuple):
    chain: jnp.ndarray       # (nsteps, nchains, d)
    logpost: jnp.ndarray     # (nsteps, nchains)
    accept_rate: jnp.ndarray  # scalar
    cov: jnp.ndarray         # final adapted covariance (d, d)


def dram(logpost: Callable, x0, nsteps: int, *, key=None,
         cov0=None, bounds=None, adapt_start: int = 100,
         adapt_interval: int = 10, drscale: float = 5.0,
         scale: Optional[float] = None, burnin: int = 0) -> DRAMResult:
    """Run DRAM chains.

    Args:
      logpost: (M, d) -> (M,) log posterior, vectorized (jit-friendly).
      x0: (nchains, d) initial states (or (d,) for one chain).
      nsteps: chain length (after burn-in it is nsteps - burnin).
      cov0: initial proposal covariance (default: scaled identity).
      bounds: optional (lo, hi) arrays; proposals outside are rejected.
      drscale: second-stage proposal shrink factor.
    """
    x0 = jnp.atleast_2d(jnp.asarray(x0))
    nchains, d = x0.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    if scale is None:
        scale = 2.38 / np.sqrt(d)
    if cov0 is None:
        cov0 = jnp.eye(d) * 0.1
    cov0 = jnp.asarray(cov0)
    lo = jnp.asarray(bounds[0]) if bounds is not None else None
    hi = jnp.asarray(bounds[1]) if bounds is not None else None

    def in_bounds(x):
        if lo is None:
            return jnp.ones(x.shape[:-1], bool)
        return jnp.all((x >= lo) & (x <= hi), axis=-1)

    lp0 = logpost(x0)

    def step(carry, inp):
        x, lp, mean, m2, count, nacc, chol = carry
        k = inp
        k1, k2, k3, k4 = jax.random.split(k, 4)
        # stage 1 proposal
        eps = jax.random.normal(k1, x.shape)
        y1 = x + scale * eps @ chol.T
        lpy1 = jnp.where(in_bounds(y1), logpost(y1), -jnp.inf)
        a1 = jnp.exp(jnp.minimum(lpy1 - lp, 0.0))
        u1 = jax.random.uniform(k2, a1.shape)
        acc1 = u1 < a1
        # stage 2 (delayed rejection) from the rejected chains
        eps2 = jax.random.normal(k3, x.shape)
        y2 = x + (scale / drscale) * eps2 @ chol.T
        lpy2 = jnp.where(in_bounds(y2), logpost(y2), -jnp.inf)
        # DR acceptance (Mira 2001; as in dramrun):
        # alpha2 = min(1, pi(y2) q(y2,y1) (1-a(y2,y1)) /
        #              (pi(x) q(x,y1) (1-a(x,y1))))
        a_y2y1 = jnp.exp(jnp.minimum(lpy1 - lpy2, 0.0))
        # proposal density ratio q(y2,y1)/q(x,y1) for the stage-1 kernel
        def q1_log(a, b):
            diff = a - b
            sol = jax.scipy.linalg.solve_triangular(
                chol, diff.T, lower=True).T / scale
            return -0.5 * jnp.sum(sol * sol, axis=-1)

        lq_num = q1_log(y2, y1)
        lq_den = q1_log(x, y1)
        la2 = (lpy2 - lp + lq_num - lq_den
               + jnp.log1p(-jnp.minimum(a_y2y1, 1.0 - 1e-15))
               - jnp.log1p(-jnp.minimum(a1, 1.0 - 1e-15)))
        a2 = jnp.exp(jnp.minimum(la2, 0.0))
        u2 = jax.random.uniform(k4, a2.shape)
        acc2 = (~acc1) & (u2 < a2) & jnp.isfinite(lpy2)
        xn = jnp.where(acc1[:, None], y1,
                       jnp.where(acc2[:, None], y2, x))
        lpn = jnp.where(acc1, lpy1, jnp.where(acc2, lpy2, lp))
        nacc = nacc + jnp.sum(acc1 | acc2)
        # AM adaptation (running mean/second-moment over all chains)
        count = count + nchains
        delta = xn - mean[None, :]
        mean = mean + jnp.sum(delta, axis=0) / count
        m2 = m2 + delta.T @ (xn - mean[None, :])

        def adapt(_):
            cov = m2 / jnp.maximum(count - 1, 1) + 1e-10 * jnp.eye(d)
            return jnp.linalg.cholesky(cov)

        it = count // nchains
        do_adapt = (it > adapt_start) & (it % adapt_interval == 0)
        chol = jax.lax.cond(do_adapt, adapt, lambda _: chol, None)
        return (xn, lpn, mean, m2, count, nacc, chol), (xn, lpn)

    keys = jax.random.split(key, nsteps)
    init = (x0, lp0, jnp.zeros(d), jnp.zeros((d, d)),
            jnp.asarray(0), jnp.asarray(0), jnp.linalg.cholesky(cov0))
    (xf, lpf, _, m2, count, nacc, chol), (chain, lps) = jax.lax.scan(
        step, init, keys)
    accept_rate = nacc / (nsteps * nchains)
    cov = m2 / jnp.maximum(count - 1, 1)
    return DRAMResult(chain[burnin:], lps[burnin:], accept_rate, cov)
