"""Production serving: prepare a DIRT once, push many sample batches.

``tt_dirt_sample`` (dirt.py) re-runs the backward semi-marginalization
of every level on every call — correct for one-shot use, but in a
serving loop the checkpoint is fixed and that work is pure overhead:
at the shipped Lorenz-40 stack (14 levels, n=33, r=23) the vmapped
prep is 1.7 s and the level-0 prep ~0.4 s of a 17 s serve (measured
v5e, BENCH_NOTES round 3 "deep-serve decomposition").  ``DirtSampler``
hoists all of it into construction:

    sampler = DirtSampler(dirt, precision="hi")
    z, lfapp = sampler(q1)        # steady-state: forward passes only
    z, lfapp = sampler(q2)

The forward semantics are identical to ``tt_dirt_sample`` (same
kernels, same precision modes) — ``tests/test_dirt.py`` asserts
bitwise-equal outputs.

Reference: the reference has no serving split (tt_dirt_sample.m
recomputes its marginalizations per call inside tt_irt_sqr.m:63-80);
the prepare/serve split is the TPU-native redesign of its workflow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dirt import (
    DIRT,
    _level_irt,
    _prepare_level_preps,
    _resolve_precision,
    serve_precision,
)
from .irt import _canon_grid, auto_block, tt_irt_sqr
from .irt_scan import (
    _prep_jit,
    _use_fused,
    can_use_scan,
    fwd_blocked,
    stack_padded,
)
from .reference import (
    tnormal_logdensity_shift,
    tnormal_to_uniform,
)

__all__ = ["DirtSampler", "IrtSampler"]


class IrtSampler:
    """Prepared single-TT Rosenblatt transform: the backward
    marginalization (f64 on TPU — ~2.5 s per call at the Lorenz-40
    production shape, measured benchmarks/microbench_fwd.py) runs once
    at construction; calls are forward passes only.

        sampler = IrtSampler(grids, f, precision="hi")
        x1, lf1 = sampler(q1)      # steady-state: forward only
        x2, lf2 = sampler(q2)

    Bitwise-identical to ``tt_irt_sqr``/``tt_rt_sqr``/``tt_irt_lin``
    (same prep/forward kernels; tests/test_irt.py pins it).

    Args:
      grid: list of d grid vectors (or concatenated vector).
      f: TT of sqrt(PDF) ('sqr'/'rt') or PDF ('lin') on the grid.
      mode: 'sqr' (inverse Rosenblatt), 'rt' (forward), or 'lin'.
      precision: scan-path precision ('f64'/'f32'/'mixed'/'hi'/'hid'/
        'ds'); None = dtype default.
      block: forward block size (default auto_block).

    Falls back to the per-call general path when the rank-padded scan
    does not apply (non-uniform grid sizes); the prepare-once benefit
    then does not apply, but the API stays total.
    """

    def __init__(self, grid, f, mode: str = "sqr",
                 precision: str | None = None, block: int | None = None):
        if mode not in ("sqr", "rt", "lin"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self.block = block
        grids, fc = _canon_grid(grid, f)
        if precision is None:
            precision = "f64" if fc.dtype == jnp.float64 else "f32"
        self.precision = precision
        self._grid, self._f = grid, f
        self._prep = None
        self._fused = _use_fused(mode, precision)
        if can_use_scan(fc, grids, fc.d):
            stable = jax.default_backend() != "tpu"
            cs, xs = stack_padded(fc, grids)
            self._prep = _prep_jit(mode, cs, xs, precision, stable,
                                   fused=self._fused)

    def sample(self, q):
        """Transform seeds (IRT/lin) or samples (rt); returns (x, lf)."""
        q = jnp.asarray(q)
        if self._prep is None:
            from .irt import tt_irt_lin, tt_rt_sqr
            fn = {"sqr": tt_irt_sqr, "rt": tt_rt_sqr,
                  "lin": tt_irt_lin}[self.mode]
            return fn(self._grid, self._f, q, block=self.block,
                      precision=self.precision)
        block = auto_block(q.shape[0], self.block)
        return fwd_blocked(self.mode, self.precision, self._prep, q,
                           block, self._fused)

    __call__ = sample


class DirtSampler:
    """Prepared DIRT transport: backward marginalizations cached.

    Args:
      dirt: a DIRT stack (built or loaded from a checkpoint).
      precision: 'f64'/'f32'/'mixed'/'hi'/'hid'/'ds', 'auto' for the
        depth-aware policy (serve_precision), or None for the dtype
        default (matches tt_dirt_sample).
      block: forward block size (default auto_block).
      ragged_step: levels are zero-padded to their rank rounded UP to
        a multiple of this (capped at the stack max) and bucketed, so
        a ``dirt_round``'ed level's forward costs ~its OWN r^2 instead
        of the global max rank's (the reference serves per-level cores
        as-built, tt_irt_sqr.m:43-81 — global padding was a vmap
        artifact).  Different bucketings agree to working precision
        (not bitwise: XLA regroups reduction trees per shape — see
        _prepare_level_preps); the default step matches
        tt_dirt_sample's serve path, which IS bitwise-identical.
        0 = pad all levels to the global max.
    """

    def __init__(self, dirt: DIRT, precision: str | None = None,
                 block: int | None = None, ragged_step: int = 4):
        if precision == "auto":
            precision = serve_precision(dirt)
        self.dirt = dirt
        self.precision = _resolve_precision(dirt, precision)
        self.block = block
        self._sigma = dirt.sigma
        stable = jax.default_backend() != "tpu"
        self._fused = _use_fused("sqr", self.precision)

        # ---- upper levels: vmapped preps over rank-bucketed stacks
        # (shared with tt_dirt_sample's serve path so the two stay
        # bitwise-equal at the default step; see _prepare_level_preps
        # for why padding is only working-precision-neutral) ----
        self._upper = None
        if dirt.nlevels and dirt.interpolation.startswith("s"):
            per_level = _prepare_level_preps(
                dirt, self.precision, stable, self._fused,
                ragged_step=ragged_step)
            if per_level is not None:
                self._upper = ("perlevel", per_level)
        elif dirt.nlevels:
            # Fourier/Chebyshev stacks: hoist the spectral precompute
            # (FFT of cores + coefficient squaring) per level — the
            # reference's precompute-struct reuse, tt_irt_fourier.m:
            # 106-137; tt_irt_fourier/tt_irt_cheb accept the prep
            # object in place of the TT.
            interp = dirt.interpolation.lower()
            if interp.startswith("c"):
                from .chebyshev import cheb_precompute as _pre
            else:
                from .fourier import fourier_precompute as _pre
            self._upper = ("spectral",
                           [_pre(dirt.x, f) for f in dirt.fs])

        # ---- level 0 ----
        self._prep0 = None
        gs0, f0c = _canon_grid(dirt.x0, dirt.f0)
        if can_use_scan(f0c, gs0, f0c.d):
            cs0, xs0 = stack_padded(f0c, gs0)
            self._prep0 = _prep_jit("sqr", cs0, xs0, self.precision,
                                    stable, fused=self._fused)


    def sample(self, q, logpostfun=None):
        """tt_dirt_sample with cached preparations; same return shape."""
        dirt = self.dirt
        z = jnp.asarray(q)
        sigma = self._sigma
        block = auto_block(z.shape[0], self.block)
        lfapp = jnp.zeros((z.shape[0],), z.dtype)
        for j in range(dirt.nlevels - 1, -1, -1):
            if sigma is not None:
                z = tnormal_to_uniform(z, sigma)
            if self._upper is not None and self._upper[0] == "perlevel":
                z, dlf = fwd_blocked("sqr", self.precision,
                                     self._upper[1][j], z, block,
                                     self._fused)
            elif self._upper is not None:
                # spectral: prep object replaces the TT (grid unused)
                z, dlf = _level_irt(dirt, self._upper[1][j], z,
                                    self.precision)
            else:
                z, dlf = _level_irt(dirt, dirt.fs[j], z, self.precision)
            lfapp = lfapp + dlf
            if sigma is not None:
                lfapp = lfapp - tnormal_logdensity_shift(
                    z, sigma, reduced=self.precision != "f64")
        if sigma is not None:
            z = tnormal_to_uniform(z, sigma)
        if self._prep0 is not None:
            z, dlf = fwd_blocked("sqr", self.precision, self._prep0, z,
                                 block, self._fused)
        else:
            z, dlf = tt_irt_sqr(dirt.x0, dirt.f0, z,
                                precision=self.precision)
        lfapp = lfapp + dlf
        if logpostfun is not None:
            return z, lfapp, logpostfun(z)
        return z, lfapp

    __call__ = sample
