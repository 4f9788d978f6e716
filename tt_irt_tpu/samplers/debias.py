"""Debiasing of transport proposals: Metropolis-Hastings rejection and
importance weighting.

Reference: matlab/samplers/mcmc_prune.m, iw_prune.m, tt_irt_debias.m.
The reference's sequential rejection loop becomes a `lax.scan` whose carry
is the current chain state — the proposals are independent, so the whole
chain is one linear scan over precomputed log-density pairs (no model
evaluations inside the loop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.tt import TT
from .irt import tt_irt_lin

__all__ = ["mcmc_prune", "iw_prune", "tt_irt_debias",
           "rejection_histogram"]


class MCMCResult(NamedTuple):
    y: jnp.ndarray        # pruned samples (M, d)
    lfex: jnp.ndarray     # exact data at pruned samples (M,) or (M, R+1)
    lfapp: jnp.ndarray    # proposal log density at pruned samples (M,)
    num_rejects: jnp.ndarray   # scalar int
    accepted: jnp.ndarray      # bool mask: proposal i accepted
    rej_hist: "object" = None  # rejection-lag histogram, see mcmc_prune


def rejection_histogram(accepted):
    """Consecutive-rejection histogram (mcmc_prune.m:34-42): hist[k-1] =
    number of length-k rejection runs terminated by an acceptance (a
    trailing unterminated run is not counted, as in the reference)."""
    import numpy as np

    a = np.asarray(accepted)[1:]          # steps 1..M-1
    idx = np.nonzero(a)[0]
    if idx.size == 0:
        return np.zeros(0, np.int64)
    prev = np.concatenate([[-1], idx[:-1]])
    runs = idx - prev - 1
    runs = runs[runs > 0]
    if runs.size == 0:
        return np.zeros(0, np.int64)
    return np.bincount(runs)[1:]


@jax.jit
def _mcmc_scan(y, lfex, lfapp, u):
    lfex2 = lfex if lfex.ndim == 2 else lfex[:, None]

    def step(carry, inp):
        yc, lec, lac = carry
        yp, lep, lap, ui = inp
        alpha = jnp.exp(lep[0] - lec[0] - lap + lac)
        acc = alpha >= ui
        ynew = jnp.where(acc, yp, yc)
        lenew = jnp.where(acc, lep, lec)
        lanew = jnp.where(acc, lap, lac)
        return (ynew, lenew, lanew), (ynew, lenew, lanew, acc)

    init = (y[0], lfex2[0], lfapp[0])
    _, (ys, les, las, accs) = jax.lax.scan(
        step, init, (y[1:], lfex2[1:], lfapp[1:], u))
    ys = jnp.concatenate([y[:1], ys], axis=0)
    les = jnp.concatenate([lfex2[:1], les], axis=0)
    las = jnp.concatenate([lfapp[:1], las], axis=0)
    accs = jnp.concatenate([jnp.ones((1,), bool), accs])
    if lfex.ndim == 1:
        les = les[:, 0]
    return ys, les, las, accs


def mcmc_prune(y, lfex, lfapp, key=None, u=None) -> MCMCResult:
    """Independence-proposal MH rejection over a proposed chain.

    Args:
      y: (M, d) proposals; lfex: (M,) or (M, R+1) exact log-density (+QoI);
      lfapp: (M,) proposal log-density; key or u: randomness (uniforms).
    Returns MCMCResult; ``num_rejects`` matches mcmc_prune.m:24-43.
    """
    y = jnp.asarray(y)
    lfex = jnp.asarray(lfex)
    lfapp = jnp.asarray(lfapp).reshape(-1)
    m = y.shape[0]
    if u is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        u = jax.random.uniform(key, (m - 1,), dtype=jnp.float64)
    ys, les, las, accs = _mcmc_scan(y, lfex, lfapp, u)
    return MCMCResult(ys, les, las, m - 1 - jnp.sum(accs[1:]), accs,
                      rejection_histogram(accs))


class IWResult(NamedTuple):
    lfex: jnp.ndarray       # weighted data: data * (Fex/Fapp)/Z
    isstd: jnp.ndarray      # relative std of the normalized ratio
    max_ratio: jnp.ndarray  # max of the normalized ratio
    err1: jnp.ndarray       # empirical L1 error <|Fex - Fapp|>/Fapp


@jax.jit
def iw_prune(lfex, lfapp) -> IWResult:
    """Self-normalized importance-weight correction (iw_prune.m:19-30).
    lfex may be (M,) or (M, R+1) with the log-density in column 0."""
    lfex = jnp.asarray(lfex)
    lfapp = jnp.asarray(lfapp).reshape(-1)
    lfex2 = lfex if lfex.ndim == 2 else lfex[:, None]
    ratio = jnp.exp(lfex2[:, 0] - lfapp)
    renorm = jnp.mean(ratio)
    w = ratio / renorm
    max_ratio = jnp.max(w)
    err1 = jnp.mean(jnp.abs(jnp.exp(lfex2[:, 0] - jnp.log(renorm))
                            - jnp.exp(lfapp)) / jnp.exp(lfapp))
    weighted = lfex2 * w[:, None]
    if lfex.ndim == 1:
        weighted = weighted[:, 0]
    isstd = jnp.sqrt(jnp.mean((w - 1.0) ** 2))
    return IWResult(weighted, isstd, max_ratio, err1)


def tt_irt_debias(m, lffun, f: TT, grid, correction: str = "mcmc", key=None):
    """Single-level TT proposal + debias driver (tt_irt_debias.m).

    Args:
      m: number of samples (draws uniform seeds) or an (M, d) seed array.
      lffun: exact log-density function, (M, d) -> (M,) or (M, R+1).
      f: TT approximation of the density (not its sqrt).
      grid: grid vectors for tt_irt_lin.
      correction: 'mcmc' or 'iw'.
    Returns dict with samples/log-densities/diagnostics.
    """
    import time as _time

    if key is None:
        key = jax.random.PRNGKey(0)
    d = f.d
    if jnp.isscalar(m) or (isinstance(m, int)):
        key, sub = jax.random.split(key)
        z = jax.random.uniform(sub, (int(m), d), dtype=jnp.float64)
    else:
        z = jnp.asarray(m)
    t0 = _time.perf_counter()
    y, lfapp = tt_irt_lin(grid, f, z)
    jax.block_until_ready((y, lfapp))
    # time_invcdf: wall time in the IRT itself (tt_irt_debias.m:22,49)
    time_invcdf = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    lfex = lffun(y)
    jax.block_until_ready(lfex)
    time_eval = _time.perf_counter() - t0
    if correction.lower().startswith("mcmc"):
        key, sub = jax.random.split(key)
        res = mcmc_prune(y, lfex, lfapp, key=sub)
        return {
            "y": res.y, "lFex": res.lfex, "lFapp": res.lfapp,
            "bias": res.num_rejects, "accepted": res.accepted,
            "time_invcdf": time_invcdf, "time_eval": time_eval,
        }
    res = iw_prune(lfex, lfapp)
    return {
        "y": y, "lFex": res.lfex, "lFapp": lfapp, "bias": res.isstd,
        "max_ratio": res.max_ratio, "err1": res.err1,
        "time_invcdf": time_invcdf, "time_eval": time_eval,
    }
