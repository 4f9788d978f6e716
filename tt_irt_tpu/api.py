"""One-call convenience front-ends over the full pipeline.

The reference's workflow (build a TT of the density by cross, transport
seeds, debias, compute diagnostics — e.g. test_shock_absorber_tt.m:
116-142) takes ~five calls; `sample_posterior` packages it for the
common case while returning every intermediate object so nothing is
hidden.  Pure convenience — the layered API stays primary.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .constructors.amen_cross import amen_cross_s
from .constructors.dirt_build import tt_dirt_approx
from .samplers.debias import mcmc_prune
from .samplers.diagnostics import essinv, hellinger
from .samplers.dirt import tt_dirt_sample
from .samplers.irt import tt_irt_sqr
from .samplers.qmc import qmcnodes
from .samplers.reference import randref

__all__ = ["sample_posterior", "PosteriorResult"]


@dataclass
class PosteriorResult:
    """Everything the pipeline produced (nothing hidden)."""

    samples: jnp.ndarray          # debiased posterior samples (M, d)
    logpost: jnp.ndarray          # exact unnormalized log-density at samples
    weights: Optional[np.ndarray]  # IS weights (qmc/iw mode), else None
    ess_inv: float                # N/ESS of the raw transport proposals
    hellinger: float              # Hellinger(proposal, posterior)
    num_rejects: Optional[int]    # MH rejections (mcmc mode), else None
    transport: object             # the TT (single-level) or DIRT stack
    grids: list                   # the grid vectors actually used
    evalcnt: np.ndarray           # model evaluations spent building

    def __repr__(self):
        mode = "iw" if self.weights is not None else "mcmc"
        return (f"PosteriorResult(M={self.samples.shape[0]}, "
                f"d={self.samples.shape[1]}, N/ESS={self.ess_inv:.3f}, "
                f"hellinger={self.hellinger:.3g}, debias={mode!r})")


def sample_posterior(logpost: Callable, grids: Sequence, m: int, *,
                     beta: Optional[Sequence[float]] = None,
                     tol: float = 1e-4,
                     debias: str = "mcmc",
                     qmc: bool = False,
                     seed: int = 0,
                     reference: str = "uniform",
                     verb: int = 0,
                     cross_kwargs: Optional[dict] = None,
                     dirt_kwargs: Optional[dict] = None) -> PosteriorResult:
    """Draw ``m`` debiased samples from an unnormalized log-density.

    Args:
      logpost: vectorized ``x (M, d) -> (M,)`` unnormalized log-density
        (JAX-traceable runs batched on device; plain numpy works too).
      grids: list of d grid vectors covering the support.
      m: number of samples.
      beta: tempering ladder — None/[1.0] builds a single-level TT of
        sqrt(density) by AMEn cross (the TT-MH/TT-qIW pipeline);
        an increasing ladder builds a DIRT stack (concentrated
        posteriors).
      tol: cross tolerance.
      debias: 'mcmc' (Metropolis rejection, correlated but unweighted)
        or 'iw' (importance weights, independent but weighted).
      qmc: transport a randomized rank-1 lattice instead of
        pseudo-random seeds (TT-qIW; forces debias='iw').
      reference: DIRT reference measure ('uniform' or e.g. 'n4').
      cross_kwargs / dirt_kwargs: forwarded verbatim.

    Returns:
      PosteriorResult with samples, diagnostics and the transport
      object (reusable via tt_irt_sqr / tt_dirt_sample directly).
    """
    grids = [np.asarray(g).reshape(-1) for g in grids]
    d = len(grids)
    key = jax.random.PRNGKey(seed)
    if qmc:
        debias = "iw"
    deep = beta is not None and len(list(beta)) > 1

    if deep:
        dirt = tt_dirt_approx(grids, lambda x, b0, b1:
                              (b1 - b0) * logpost(x),
                              list(beta), reference=reference, verb=verb,
                              seed=seed, **(dirt_kwargs or {}))
        if qmc:
            pts = qmcnodes(d, int(np.ceil(np.log2(m))), seed=seed)[:m]
            q = randref(reference, jnp.asarray(pts))
        else:
            key, sub = jax.random.split(key)
            q = randref(reference, sub, (m, d))
        z, lfapp, lfex = tt_dirt_sample(dirt, q, logpost)
        transport, evalcnt = dirt, np.atleast_1d(dirt.evalcnt)
    else:
        gr = [jnp.asarray(g) for g in grids]

        def fun(ind):
            pts = jnp.stack([gr[k][jnp.asarray(ind)[:, k]]
                             for k in range(d)], 1)
            return np.asarray(jnp.exp(0.5 * logpost(pts)))

        res = amen_cross_s([len(g) for g in grids], fun, tol,
                           tol_exit=tol, verb=verb, seed=seed,
                           **(cross_kwargs or {}))
        if qmc:
            q = jnp.asarray(qmcnodes(d, int(np.ceil(np.log2(m))),
                                     seed=seed)[:m])
        else:
            key, sub = jax.random.split(key)
            q = jax.random.uniform(sub, (m, d), dtype=jnp.float64)
        z, lfapp = tt_irt_sqr(grids, res.tt, q)
        lfex = logpost(z)
        transport, evalcnt = res.tt, np.atleast_1d(res.evalcnt)

    einv = float(essinv(lfex, lfapp))
    hell = float(hellinger(lfex, lfapp))
    if debias == "mcmc":
        key, sub = jax.random.split(key)
        mh = mcmc_prune(z, lfex, lfapp, key=sub)
        return PosteriorResult(mh.y, mh.lfex, None, einv, hell,
                               int(mh.num_rejects), transport, grids,
                               evalcnt)
    if debias == "iw":
        return PosteriorResult(z, lfex,
                               np.asarray(_iw_weights(lfex, lfapp)),
                               einv, hell, None, transport, grids,
                               evalcnt)
    raise ValueError(f"debias={debias!r} (want 'mcmc' or 'iw')")


def _iw_weights(lfex, lfapp):
    lfex1 = jnp.asarray(lfex)
    if lfex1.ndim == 2:
        lfex1 = lfex1[:, 0]
    lw = lfex1 - jnp.asarray(lfapp)
    lw = lw - jnp.max(lw)
    w = jnp.exp(lw)
    return w / jnp.sum(w)
