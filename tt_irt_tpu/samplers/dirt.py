"""Deep Inverse Rosenblatt Transport: the layered transform stack.

Reference: matlab/samplers/tt_dirt_sample.m, tt_dirt_inverse.m and the
IRTstruct checkpoint format (constructors/README.md:13-27).  The stack is
a pytree — TT cores, grids and the tempering ladder are leaves — so a
trained DIRT serializes with orbax and passes through jit boundaries
unchanged, and construction is resumable by appending levels
(tt_dirt_approx.m:154-173 semantics, see constructors/dirt_build.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tt import TT
from .irt import tt_irt_sqr, tt_rt_sqr
from .reference import (
    reference_sigma,
    tnormal_logdensity_shift,
    tnormal_to_uniform,
    uniform_to_tnormal,
)

__all__ = ["DIRT", "tt_dirt_sample", "tt_dirt_inverse",
           "serve_precision", "dirt_round"]


def serve_precision(dirt: "DIRT") -> str:
    """Dimension-aware default serving precision.

    Measured depth/width sweep on the shipped Lorenz checkpoints
    (v5e, 2^20 samples, BENCH_NOTES "serve precision policy", round 3):

    | stack              | f32 N/ESS | 'hi' N/ESS | f32 / 'hi' serve |
    | d=10, 13 levels    | 1.093     | 1.093      | 4.8 s / 5.1 s    |
    | d=20, 13 levels    | 1.243     | 1.243      | 8.3 s / 17.8 s   |
    | d=40, 14 levels    | 1.77      | 1.57       | ~21 s / ~21 s    |

    The f32 per-level tail error (~1e-6) compounds across the
    *dimension* chain, not the level count: raw-sample quality is
    indistinguishable through d=20 even at 13 composed levels, and
    diverges mildly at d=40 — where the factor-form 'hi' step is also
    no slower (the serve-CDF avoids the Gram outer-product
    materialization).  Debiased estimates are exact in every mode (the
    returned log-density is the exact Jacobian of the realized map).
    Policy: 'f32' below d=40; 'hi' at d>=40 where it is better on both
    axes."""
    return "hi" if dirt.d >= 40 else "f32"


def dirt_round(dirt: "DIRT", eps: float, rmax=None) -> "DIRT":
    """Round every level's sqrt-ratio TT to relative tolerance ``eps``
    (ops/tt.py tt_round) — a serve-side rank/quality knob.

    Serve cost per level scales ~r^2, so shrinking ranks trades
    raw-sample quality (N/ESS) for throughput; debiasing stays exact
    either way (the returned log-density is the Jacobian of the
    *realized* map).  Measured end-to-end on the shipped lz40n33
    checkpoint at 2^20 seeds on v5e ('hi', rank-bucketed serving,
    round-5 benchmarks/bench_dirt_round.py): eps=0 ranks 23
    everywhere, 9.69 s (108.2k samples/s), N/ESS 1.819; eps=3e-3
    shrinks the first four levels to 18-22 but buys only ~1% serve
    time (9.61 s) at N/ESS 1.891; eps=1e-2 reaches ranks 12-22 on the
    first ten levels and serves in 8.88 s (118.1k/s, +9%) at N/ESS
    1.691 at these seeds — rounding perturbs the realized map, and
    the perturbed proposal can measure either side of the unrounded
    one's quality.  The rank reduction only buys serve time with
    rank-bucketed serving (DirtSampler ragged_step, the default):
    global max-rank padding pads the savings away.  The late
    (high-beta) levels are genuinely full-rank and do not shrink —
    the knob helps most on stacks built with generous rank caps.
    The reference has no analog (its IRTstruct is served as-built);
    this exists because serving is the TPU-resident production path
    here."""
    from ..ops.tt import tt_round

    return DIRT(tt_round(dirt.f0, eps, rmax),
                [tt_round(t, eps, rmax) for t in dirt.fs],
                dirt.x0, dirt.x, dirt.beta, dirt.lfshift,
                dirt.reference, dirt.interpolation,
                evalcnt=dirt.evalcnt, fprev=dirt.fprev,
                history=dirt.history)


def dirt_permute(dirt: "DIRT", perm, eps: float = 1e-12) -> "DIRT":
    """Reorder the DIRT's coordinates: returns the stack that would have
    been built on the permuted target.

    Every per-level operation (erf reference maps, per-dim spline IRT)
    is dimension-wise, so a global relabeling of coordinates commutes
    with the whole transform: permuting each level's TT (ops/tt.py
    tt_permute, truncation <= ``eps`` relative per TT) and the grid
    lists yields an exactly equivalent pushforward on permuted
    coordinates.  Used by tt_dirt_cond_sample(cond_dims=...) to
    condition on arbitrary coordinate subsets of the triangular map."""
    from ..ops.tt import tt_permute

    perm = [int(p) for p in perm]
    return DIRT(tt_permute(dirt.f0, perm, eps),
                [tt_permute(t, perm, eps) for t in dirt.fs],
                [dirt.x0[p] for p in perm],
                [dirt.x[p] for p in perm] if dirt.x else dirt.x,
                dirt.beta, dirt.lfshift,
                dirt.reference, dirt.interpolation,
                evalcnt=dirt.evalcnt,
                fprev=None,  # resume warm-start is order-specific
                history=dirt.history)


@jax.tree_util.register_pytree_node_class
class DIRT:
    """DIRT stack: level-0 sqrt-density + L sqrt-ratio TTs over a beta
    ladder.  This is the checkpoint format: a plain pytree of arrays."""

    __slots__ = ("f0", "fs", "x0", "x", "beta", "lfshift", "reference",
                 "interpolation", "evalcnt", "fprev", "history")

    def __init__(self, f0: TT, fs: Sequence[TT], x0, x, beta,
                 lfshift=0.0, reference: str = "uniform",
                 interpolation: str = "spline", evalcnt=None, fprev=None,
                 history=None):
        self.f0 = f0
        self.fs = tuple(fs)
        self.x0 = [jnp.asarray(g).reshape(-1) for g in x0]
        self.x = [jnp.asarray(g).reshape(-1) for g in x] if x is not None else []
        self.beta = jnp.asarray(beta)
        self.lfshift = lfshift
        self.reference = reference
        self.interpolation = interpolation
        self.evalcnt = evalcnt if evalcnt is not None else np.zeros(0, np.int64)
        self.fprev = fprev
        # Structured construction trace: one record (plain dict of
        # floats/lists) per cross attempt — the inspectable analog of
        # the reference's live level diagnostics
        # (tt_dirt_approx.m:354-412).  Host-side metadata only: NOT a
        # pytree leaf and not carried through jit boundaries (a traced
        # copy of the stack has history=None); save_dirt/load_dirt
        # persist it in the JSON header.
        self.history = history

    @property
    def nlevels(self) -> int:
        return len(self.fs)

    @property
    def d(self) -> int:
        return self.f0.d

    @property
    def sigma(self) -> Optional[float]:
        return reference_sigma(self.reference)

    def tree_flatten(self):
        # fprev is a TT of arrays -> it must be a leaf subtree (tracers
        # may flow through it); evalcnt goes into aux and therefore must
        # be hashable for jit caching, so it is stored as a tuple.
        leaves = (self.f0, self.fs, self.x0, self.x, self.beta,
                  self.lfshift, self.fprev)
        aux = (self.reference, self.interpolation,
               tuple(int(v) for v in np.atleast_1d(self.evalcnt)))
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        f0, fs, x0, x, beta, lfshift, fprev = leaves
        return cls(f0, fs, x0, x, beta, lfshift,
                   reference=aux[0], interpolation=aux[1],
                   evalcnt=np.asarray(aux[2], np.int64), fprev=fprev)

    def __repr__(self):
        return (f"DIRT(d={self.d}, levels={self.nlevels}, "
                f"beta={np.asarray(self.beta)}, reference={self.reference!r}, "
                f"interpolation={self.interpolation!r})")


def _resolve_precision(dirt: DIRT, precision):
    if precision is not None:
        return precision
    return "f64" if dirt.f0.dtype == jnp.float64 else "f32"


def _prepare_level_preps(dirt: DIRT, precision, stable, fused,
                         ragged_step: int = 4):
    """Per-level forward preparations for the spline upper levels,
    vmapped per RANK BUCKET.

    Levels are zero-padded only to their rank rounded up to a multiple
    of ``ragged_step`` (capped at the stack max) and stacked per
    bucket, so a ``dirt_round``'ed level's forward costs ~its OWN r^2
    instead of the global max rank's (the serve-cost lever of
    dirt_round; global padding was a vmap artifact — the reference
    serves per-level cores as-built, tt_irt_sqr.m:43-81).  The vmapped
    per-bucket prep keeps the L-x batching win (the prep is
    overhead-bound: ~137 ms/level of f64-emulated small ops at the
    lz40n33 shape).  NOTE: padded results agree only to working
    precision, not bitwise — XLA regroups reduction trees per shape,
    so real summands associate differently (measured 2.7e-15 on the
    f64 prep).  Every consumer of a given stack must therefore use the
    SAME bucketing (tt_dirt_sample and DirtSampler both default to
    step 4).  Returns a per-level list of prep pytrees, or None when
    the stack is not scan-eligible."""
    from .irt import _canon_grid
    from .irt_scan import _prep_levels_jit, can_use_scan, stack_padded

    if dirt.nlevels < 1:
        return None
    level_cs, xstack = [], None
    for f in dirt.fs:
        gs, fc = _canon_grid(dirt.x, f)
        if not can_use_scan(fc, gs, fc.d):
            return None
        cs, xstack = stack_padded(fc, gs)
        level_cs.append(cs)
    if len({(c.shape[0], c.shape[2]) for c in level_cs}) > 1:
        return None  # levels disagree on (d, n): no common program
    rmax = max(c.shape[1] for c in level_cs)
    step = int(ragged_step)

    def bucket_rank(r):
        if step <= 0:
            return rmax
        return min(-(-r // step) * step, rmax)

    buckets: dict = {}
    for j, cs in enumerate(level_cs):
        buckets.setdefault(bucket_rank(cs.shape[1]), []).append((j, cs))
    per_level = [None] * dirt.nlevels
    for rb, items in sorted(buckets.items()):
        padded = []
        for _, cs in items:
            r = cs.shape[1]
            if r < rb:
                cs = jnp.pad(cs, ((0, 0), (0, rb - r), (0, 0),
                                  (0, rb - r)))
            padded.append(cs)
        preps = _prep_levels_jit("sqr", jnp.stack(padded, axis=0),
                                 xstack, precision, stable, fused=fused)
        for pos, (j, _) in enumerate(items):
            per_level[j] = jax.tree_util.tree_map(
                lambda a, _p=pos: a[_p], preps)
    return per_level


def _serve_upper_levels(dirt: DIRT, z, lfapp, precision):
    """Deep-serve fast path for the spline upper levels: vmapped
    backward preparation per rank bucket (see _prepare_level_preps),
    then the usual blocked forward per level.  Returns (z, lfapp) or
    None if the stack is not eligible."""
    import jax as _jax

    from .irt import auto_block
    from .irt_scan import _use_fused, fwd_blocked

    prec = _resolve_precision(dirt, precision)
    stable = _jax.default_backend() != "tpu"
    fused = _use_fused("sqr", prec)
    preps = _prepare_level_preps(dirt, prec, stable, fused)
    if preps is None:
        return None
    sigma = dirt.sigma
    block = auto_block(z.shape[0])
    for j in range(dirt.nlevels - 1, -1, -1):
        if sigma is not None:
            z = tnormal_to_uniform(z, sigma)
        z, dlf = fwd_blocked("sqr", prec, preps[j], z, block, fused)
        lfapp = lfapp + dlf
        if sigma is not None:
            lfapp = lfapp - tnormal_logdensity_shift(
                z, sigma, reduced=prec != "f64")
    return z, lfapp


def _level_irt(dirt: DIRT, f: TT, z, precision=None):
    interp = str(dirt.interpolation).lower()
    if interp.startswith("s"):
        return tt_irt_sqr(dirt.x, f, z, precision=precision)
    if interp.startswith("c"):
        from .chebyshev import tt_irt_cheb

        return tt_irt_cheb(dirt.x, f, z)
    from .fourier import tt_irt_fourier

    return tt_irt_fourier(dirt.x, f, z)


def tt_dirt_sample(dirt: DIRT, q, logpostfun=None, precision=None,
                   use_fused: bool | None = None):
    """Push reference-space seeds through the DIRT stack (levels L..1,
    then the level-0 spline IRT — tt_dirt_sample.m:33-73).

    Args:
      q: (M, d) seeds — [0,1]^d for uniform reference, (-S,S]^d truncated
         normal otherwise.
      logpostfun: optional exact log-density, evaluated at the output.
      precision: 'f64' (default), 'f32', 'mixed' or 'hi' — forwarded to
        the spline IRT kernels (see samplers/irt_scan.py).
      use_fused: force/forbid the fused whole-stack device program
        (dirt_scan.py; default automatic — used whenever eligible).
    Returns:
      (z, lFapp) or (z, lFapp, lFex): samples, log pushforward density,
      and exact log-density if requested.
    """
    from .dirt_scan import can_fuse, dirt_sample_fused

    z = jnp.asarray(q)
    if use_fused is None:
        # Default the fused whole-stack program on only under tracing:
        # inside a jit (e.g. mesh-sharded construction pushes) the host
        # level loop would unroll into an O(L)-long program, while on
        # the real chip the host loop's async dispatch queue already
        # hides tunnel latency and XLA optimizes per-level programs
        # better (measured: loop 7.95 s vs fused 10.28 s for 2^20
        # samples through 12 levels at d=40).
        use_fused = isinstance(z, jax.core.Tracer) and \
            can_fuse(dirt, z.shape[1])
    if use_fused:
        z, lfapp = dirt_sample_fused(dirt, z, precision)
        if logpostfun is not None:
            return z, lfapp, logpostfun(z)
        return z, lfapp
    sigma = dirt.sigma
    lfapp = jnp.zeros((z.shape[0],), z.dtype)
    served = None
    if dirt.interpolation.startswith("s") and \
            not isinstance(z, jax.core.Tracer):
        served = _serve_upper_levels(dirt, z, lfapp, precision)
    if served is not None:
        z, lfapp = served
    else:
        for j in range(dirt.nlevels - 1, -1, -1):
            if sigma is not None:
                z = tnormal_to_uniform(z, sigma)
            z, dlf = _level_irt(dirt, dirt.fs[j], z, precision)
            lfapp = lfapp + dlf
            if sigma is not None:
                # subtract the reference log-density at the new points
                lfapp = lfapp - tnormal_logdensity_shift(
                    z, sigma,
                    reduced=_resolve_precision(dirt, precision) != "f64")
    if sigma is not None:
        z = tnormal_to_uniform(z, sigma)
    # Level 0 is always spline: the un-tempered density is not band-limited
    # (tt_dirt_sample.m:69-71).
    z, dlf = tt_irt_sqr(dirt.x0, dirt.f0, z, precision=precision)
    lfapp = lfapp + dlf
    if logpostfun is not None:
        return z, lfapp, logpostfun(z)
    return z, lfapp


def tt_dirt_inverse(dirt: DIRT, x):
    """Inverse map sample-space -> reference-space (tt_dirt_inverse.m):
    level 0 forward-Rosenblatt first, then levels 1..L."""
    if not dirt.interpolation.startswith("s"):
        raise NotImplementedError(
            "dirt_inverse supports spline interpolation only "
            "(matches the reference guard, tt_dirt_inverse.m:14-19)")
    sigma = dirt.sigma
    q = jnp.asarray(x)
    q, lfapp = tt_rt_sqr(dirt.x0, dirt.f0, q)
    if sigma is not None:
        q = uniform_to_tnormal(q, sigma)
    for j in range(dirt.nlevels):
        if sigma is not None:
            # remove reference log-density (constant dropped as in :51)
            lfapp = lfapp + 0.5 * jnp.sum(q * q, axis=-1)
        q, dlf = tt_rt_sqr(dirt.x, dirt.fs[j], q)
        lfapp = lfapp + dlf
        if sigma is not None:
            q = uniform_to_tnormal(q, sigma)
    return q, lfapp
