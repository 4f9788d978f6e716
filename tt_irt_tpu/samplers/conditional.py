"""Exact conditional sampling through the triangular transport structure.

The (S)IRT map is lower-triangular (Knothe--Rosenblatt): coordinate k of
the output depends only on seed coordinates 1..k.  Compositions of
triangular maps with diagonal reference maps (the DIRT stack) stay
triangular.  Triangularity gives conditionals for free:

    z_{k+1:d} | z_{1:k} = x  is sampled by
      (1) q_fix = T^{-1}_{1:k}(x)   — the *partial* forward Rosenblatt
          (only the first k coordinates are inverted; the reference's
          marginal-sampling support D<d, tt_irt_sqr.m:104, is the same
          mechanism run in reverse), then
      (2) z = T([q_fix, q_rest]) with fresh reference seeds q_rest.

The log *conditional* pushforward density is the full log-density minus
the log marginal of the conditioned block — both of which the samplers
already return.

The reference toolbox only exposes the marginal direction (sampling the
first D<d variables); the conditional direction has no analog there,
although it is the standard use of triangular transport in data
assimilation / inverse problems (e.g. conditioning a joint
parameter-observation map on observed data).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.tt import TT
from .dirt import DIRT, tt_dirt_inverse, tt_dirt_sample
from .irt import tt_irt_sqr, tt_rt_sqr

__all__ = ["tt_irt_cond", "tt_dirt_cond_sample"]


def _broadcast_fix(xfix, m):
    xfix = jnp.atleast_2d(jnp.asarray(xfix))
    if xfix.shape[0] == 1 and m > 1:
        xfix = jnp.broadcast_to(xfix, (m, xfix.shape[1]))
    if xfix.shape[0] != m:
        raise ValueError(
            f"xfix has {xfix.shape[0]} rows, seeds have {m}; pass one "
            "conditioning row (broadcast) or one per seed row")
    return xfix


def tt_irt_cond(grid, f: TT, xfix, q_rest, **kwargs):
    """Sample z_{k+1:d} | z_{1:k} = xfix from a single sqrt-density TT.

    Args:
      grid: the d grid vectors (as in tt_irt_sqr).
      f: TT of sqrt(PDF).
      xfix: (k,) or (M, k) conditioning values for the FIRST k
        coordinates (condition on a different block by permuting the TT
        before the build — triangular maps condition on prefixes).
      q_rest: (M, d-k) uniform seeds for the remaining coordinates.
      kwargs: forwarded to the underlying samplers (block, precision...).

    Returns:
      (z, lfcond): samples (M, d) whose first k columns equal ``xfix``
      and log conditional density log p(z_{k+1:d} | z_{1:k}) (M,).
    """
    q_rest = jnp.atleast_2d(jnp.asarray(q_rest))
    m = q_rest.shape[0]
    xfix = _broadcast_fix(xfix, m)
    k = xfix.shape[1]
    if k + q_rest.shape[1] != f.d:
        raise ValueError(
            f"xfix ({k} cols) + q_rest ({q_rest.shape[1]} cols) must "
            f"cover all {f.d} dimensions")
    # partial forward Rosenblatt: seeds of the conditioned block and its
    # log marginal density
    q_fix, lf_marg = tt_rt_sqr(grid, f, xfix, **kwargs)
    z, lf_full = tt_irt_sqr(grid, f,
                            jnp.concatenate([q_fix, q_rest], axis=1),
                            **kwargs)
    # the roundtrip reproduces xfix to fp error; pin it exactly
    z = z.at[:, :k].set(xfix)
    return z, lf_full - lf_marg


def tt_dirt_cond_sample(dirt: DIRT, xfix, q_rest, logpostfun=None,
                        precision=None):
    """Sample z_{k+1:d} | z_{1:k} = xfix from a DIRT pushforward.

    Args:
      dirt: a built DIRT stack (spline interpolation — the partial
        inverse rides tt_dirt_inverse, which carries the reference's
        spline-only guard, tt_dirt_inverse.m:14-19).
      xfix: (k,) or (M, k) conditioning values for the first k
        sample-space coordinates.
      q_rest: (M, d-k) REFERENCE-space seeds for the remaining
        coordinates ([0,1] uniform or (-S,S) truncated normal,
        whatever ``dirt.reference`` is — e.g. from ``randref``).
      logpostfun: optional exact joint log-density; if given, the exact
        log conditional (up to the marginal's constant) is returned too.
      precision: forwarded to tt_dirt_sample.

    Returns:
      (z, lfcond) or (z, lfcond, lfex_joint): samples (M, d) with the
      first k columns pinned to ``xfix``, the log conditional
      pushforward density, and optionally the exact joint log-density.
    """
    q_rest = jnp.atleast_2d(jnp.asarray(q_rest))
    m = q_rest.shape[0]
    xfix = _broadcast_fix(xfix, m)
    k = xfix.shape[1]
    if k + q_rest.shape[1] != dirt.d:
        raise ValueError(
            f"xfix ({k} cols) + q_rest ({q_rest.shape[1]} cols) must "
            f"cover all {dirt.d} dimensions")
    q_fix, lf_marg = tt_dirt_inverse(dirt, xfix)
    q = jnp.concatenate([q_fix, q_rest], axis=1)
    out = tt_dirt_sample(dirt, q, logpostfun=logpostfun,
                         precision=precision)
    z, lf_full = out[0], out[1]
    z = z.at[:, :k].set(xfix)
    lfcond = lf_full - lf_marg
    if logpostfun is not None:
        return z, lfcond, out[2]
    return z, lfcond
