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
from .irt import tt_irt_lin, tt_irt_sqr, tt_rt_sqr

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


def _perm_for(cond_dims, d):
    cond_dims = [int(c) for c in cond_dims]
    if len(set(cond_dims)) != len(cond_dims) or not all(
            0 <= c < d for c in cond_dims):
        raise ValueError(f"cond_dims must be distinct dims in 0..{d-1}: "
                         f"{cond_dims}")
    rest = [i for i in range(d) if i not in set(cond_dims)]
    perm = cond_dims + rest
    inv = [0] * d
    for i, p in enumerate(perm):
        inv[p] = i
    return perm, inv


def tt_irt_cond(grid, f: TT, xfix, q_rest, cond_dims=None,
                mode: str = "sqr", **kwargs):
    """Sample the conditional z_rest | z_cond = xfix from a sqrt-density TT.

    Two exact mechanisms, chosen automatically:

    * xfix is ONE conditioning point (a single row): **partial
      evaluation** — the fixed coordinates are substituted into the
      cores by linear interpolation (ops/tt.py tt_partial_eval), which
      is rank-preserving and works for ANY ``cond_dims`` subset; the
      conditional is then an ordinary (d-k)-dim SIRT of the substituted
      TT.  (The spline samplers realize the multilinear interpolant of
      ``f`` squared, so the substituted TT squared IS the exact
      conditional of the realized joint.)
    * xfix has one row PER SEED: **partial inverse** — forward-
      Rosenblatt the conditioned block to its seeds and push
      [q_fix, q_rest] forward.  Prefix conditioning only (triangular
      maps condition on prefixes; for another subset, build or
      tt_permute the TT with those dims leading).

    Args:
      grid: the d grid vectors (as in tt_irt_sqr).
      f: TT of sqrt(PDF).
      xfix: (k,) one conditioning point, or (M, k) one per seed row.
      cond_dims: which coordinates xfix fixes (default: the first k).
        Arbitrary subsets require the single-point form.
      mode: 'sqr' (f is the sqrt-density, SIRT — default) or 'lin'
        (f is the density itself, the v1 tt_irt_lin.m pipeline;
        single-point form only — the reference has no forward
        transform for the lin map either).
      q_rest: (M, d-k) uniform seeds for the remaining coordinates (in
        original-dimension order).
      kwargs: forwarded to the underlying samplers (block, precision...).

    Returns:
      (z, lfcond): samples (M, d) whose conditioned columns equal
      ``xfix`` and log conditional density log p(z_rest | z_cond) (M,).
    """
    q_rest = jnp.atleast_2d(jnp.asarray(q_rest))
    xarr = jnp.atleast_2d(jnp.asarray(xfix))
    single_point = xarr.shape[0] == 1
    if cond_dims is not None and sorted(int(c) for c in cond_dims) != \
            list(range(len(list(cond_dims)))):
        if not single_point:
            raise ValueError(
                "per-seed xfix supports prefix conditioning only; for "
                "an arbitrary subset pass ONE conditioning row, or "
                "tt_permute the TT so the subset leads")
    if single_point:
        if len(grid) != f.d:
            raise ValueError("conditioning requires grid as a list of "
                             "d grid vectors")
        from ..ops.tt import tt_partial_eval

        dims = (list(range(xarr.shape[1])) if cond_dims is None
                else [int(c) for c in cond_dims])
        if len(dims) != xarr.shape[1]:
            raise ValueError(f"xfix has {xarr.shape[1]} values for "
                             f"{len(dims)} conditioned dims")
        if len(dims) + q_rest.shape[1] != f.d:
            raise ValueError(
                f"xfix ({len(dims)} cols) + q_rest ({q_rest.shape[1]} "
                f"cols) must cover all {f.d} dimensions")
        f_sub, grids_sub = tt_partial_eval(f, grid, dims, xarr[0])
        sampler = {"sqr": tt_irt_sqr, "lin": tt_irt_lin}[mode]
        z_rest, lfcond = sampler(grids_sub, f_sub, q_rest, **kwargs)
        m = q_rest.shape[0]
        rest = [i for i in range(f.d) if i not in set(dims)]
        z = jnp.zeros((m, f.d), z_rest.dtype)
        z = z.at[:, jnp.asarray(rest)].set(z_rest)
        z = z.at[:, jnp.asarray(dims)].set(
            jnp.broadcast_to(xarr[0], (m, len(dims))))
        return z, lfcond
    if mode != "sqr":
        raise ValueError("per-seed conditioning rows require mode='sqr' "
                         "(no forward transform exists for the lin map)")
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
                        precision=None, cond_dims=None,
                        perm_eps: float = 1e-12):
    """Sample the conditional z_rest | z_cond = xfix from a DIRT pushforward.

    Args:
      dirt: a built DIRT stack (spline interpolation — the partial
        inverse rides tt_dirt_inverse, which carries the reference's
        spline-only guard, tt_dirt_inverse.m:14-19).
      xfix: (k,) or (M, k) conditioning values for the first k
        sample-space coordinates — or for ``cond_dims`` if given (the
        stack is relabeled via dirt_permute, truncation <= ``perm_eps``
        per TT, and output columns return in the ORIGINAL order; the
        caller's ``logpostfun`` still receives original-order samples).
        NOTE: unlike the single-TT case (which substitutes coordinates
        rank-preservingly), reordering a TT can genuinely grow its
        ranks — conditioning a deep stack on a badly-separated subset
        costs serve time.  If a conditioning pattern is known upfront,
        build the DIRT with those coordinates leading.
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
    if cond_dims is not None:
        from .dirt import dirt_permute

        perm, inv = _perm_for(cond_dims, dirt.d)
        inv_arr = jnp.asarray(inv)
        lpperm = (None if logpostfun is None
                  else (lambda zp: logpostfun(zp[:, inv_arr])))
        out = tt_dirt_cond_sample(dirt_permute(dirt, perm, perm_eps),
                                  xfix, q_rest, logpostfun=lpperm,
                                  precision=precision)
        return (out[0][:, inv_arr],) + out[1:]
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
