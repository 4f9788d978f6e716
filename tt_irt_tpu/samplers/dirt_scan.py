"""Fused deep IRT: the whole DIRT stack in ONE device program.

``tt_dirt_sample`` (dirt.py) loops levels on the host — one device
dispatch per level per block.  Through the remote-TPU tunnel each
dispatch costs ~0.3-1 s of latency, so a 13-level Lorenz serve pays
~7 s of pure latency per 2^18-sample block, and DIRT *construction*
(whose ratio callback pushes every cross probe batch through all built
levels, tt_dirt_approx.m:463-479) pays it on every cross step.

Here the level loop moves inside the compiled program: all level TTs
share the reference grid and (after zero-padding to the global maximum
rank) one shape, so levels stack on a new leading axis and the deep
transform becomes a `lax.scan` over levels whose body is the per-level
`lax.scan` over dims (irt_scan.py), with the truncated-normal CDF maps
(tt_dirt_sample.m:36,54,60) fused between levels.  The level-0
transform (its own grids/TT) is traced into the same program: ONE
dispatch per sample block regardless of depth.

Eligibility mirrors the per-level scan fast path: spline
interpolation, full-joint sampling, uniform mode size.  Ineligible
stacks fall back to the host loop transparently.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .irt import _canon_grid, _num_blocks, _pad_rows
from .irt_scan import _PRECISIONS, _fwd, _prep, can_use_scan, stack_padded
from .reference import tnormal_logdensity_shift, tnormal_to_uniform

__all__ = ["can_fuse", "dirt_sample_fused"]


def _canon_stack(dirt):
    """Boundary-extrapolated (tt_irt_sqr.m:56-62) grids and TTs for
    every level, as the per-level dispatch would see them."""
    levels = [_canon_grid(dirt.x, f) for f in dirt.fs]
    level0 = _canon_grid(dirt.x0, dirt.f0)
    return levels, level0


def can_fuse(dirt, dsample: int) -> bool:
    """True when the whole stack can run as one fused scan program."""
    if not str(dirt.interpolation).lower().startswith("s"):
        return False
    if dirt.nlevels < 1 or dsample != dirt.d:
        return False
    try:
        levels, (g0, f0) = _canon_stack(dirt)
    except ValueError:
        return False
    if not can_use_scan(f0, g0, dsample):
        return False
    return all(can_use_scan(f, g, dsample) for g, f in levels)


def _stack_levels(fs, grids):
    """Zero-pad every level's cores to the global max rank and stack to
    (L, d, r, n, r); grids stack to (d, n) (shared across levels)."""
    rmax = max(max(c.shape[0], c.shape[2]) for f in fs for c in f.cores)
    lstacks = []
    for f in fs:
        cores = []
        for c in f.cores:
            r1, n, r2 = c.shape
            cp = jnp.zeros((rmax, n, rmax), c.dtype)
            cores.append(cp.at[:r1, :, :r2].set(c))
        lstacks.append(jnp.stack(cores, axis=0))
    cstack = jnp.stack(lstacks, axis=0)                    # (L, d, r, n, r)
    xstack = jnp.stack([jnp.asarray(g) for g in grids], axis=0)
    return cstack, xstack


@partial(jax.jit, static_argnames=("precision", "stable"))
def _prep_fused(lcores, xstack, c0stack, x0stack, precision, stable):
    """Backward preparations: vmap over the level axis for levels 1..L
    (identical shapes) plus the level-0 prep — one compiled program."""
    preps = jax.vmap(
        lambda cs: _prep("sqr", cs, xstack, precision, stable))(lcores)
    prep0 = _prep("sqr", c0stack, x0stack, precision, stable)
    return preps, prep0


@partial(jax.jit, static_argnames=("precision", "sigma"))
def _fwd_fused(precision, sigma, preps, prep0, q):
    """One sample block through levels L..1 then level 0 — one dispatch.

    ``sigma`` is the truncated-normal half-width (None = uniform
    reference); the erf CDF maps and the reference log-density
    subtraction run between levels exactly as the host loop does
    (tt_dirt_sample.m:36,54,60)."""
    pdt = jnp.dtype(_PRECISIONS[precision][1])
    zdt = jnp.float32 if precision == "f32" else jnp.float64

    def level_body(carry, prep_j):
        z, lfapp = carry
        if sigma is not None:
            z = tnormal_to_uniform(z, sigma)
        z, dlf = _fwd("sqr", precision, prep_j, z)
        z = z.astype(zdt)
        lfapp = lfapp + dlf
        if sigma is not None:
            lfapp = lfapp - tnormal_logdensity_shift(z, sigma).astype(pdt)
        return (z, lfapp), None

    z0 = q.astype(zdt)
    lf0 = jnp.zeros((q.shape[0],), pdt)
    # levels are stacked 0..L-1; the transform applies L-1 down to 0
    (z, lfapp), _ = jax.lax.scan(level_body, (z0, lf0), preps,
                                 reverse=True)
    if sigma is not None:
        z = tnormal_to_uniform(z, sigma)
    z, dlf = _fwd("sqr", precision, prep0, z)
    return z.astype(zdt), lfapp + dlf


def dirt_sample_fused(dirt, q, precision=None, block: int | None = None):
    """Fused tt_dirt_sample: (z, lFapp) with one dispatch per block.

    Call through ``tt_dirt_sample`` — it falls back to the host loop
    when ``can_fuse`` says no."""
    if precision is None:
        precision = "f64"
    q = jnp.asarray(q)
    sigma = dirt.sigma
    levels, (g0, f0) = _canon_stack(dirt)
    lcores, xstack = _stack_levels([f for _, f in levels], levels[0][0])
    c0stack, x0stack = stack_padded(f0, g0)
    stable = jax.default_backend() != "tpu"
    preps, prep0 = _prep_fused(lcores, xstack, c0stack, x0stack,
                               precision, stable)
    m = q.shape[0]
    if block is None:
        block = 1 << 18
    nb = _num_blocks(m, block)
    if nb <= 1:
        return _fwd_fused(precision, sigma, preps, prep0, q)
    padded = _pad_rows(q, nb * block)
    zs, lfs = [], []
    for b in range(nb):
        zb, lb = _fwd_fused(precision, sigma, preps, prep0,
                            jax.lax.slice_in_dim(padded, b * block,
                                                 (b + 1) * block))
        zs.append(zb)
        lfs.append(lb)
    return (jnp.concatenate(zs, axis=0)[:m],
            jnp.concatenate(lfs, axis=0)[:m])
