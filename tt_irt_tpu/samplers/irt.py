"""Inverse / forward Rosenblatt transforms through a tensor train.

TPU-first re-design of the reference samplers (matlab/samplers/tt_irt_lin.m,
tt_irt_sqr.m, tt_rt_sqr.m and the C kernel utils/tt_irt1_int64.c):

* the per-sample loops + MEX ``tracemult`` batched GEMMs become one fused
  chain of batched contractions (``einsum``) over the whole sample block;
* the scalar binary search over CDF columns becomes a fixed-trip-count
  vectorized bisection with ``take_along_axis`` gathers;
* sample blocking (Mb=2^12.. 2^16 in the reference, tuned for CPU caches)
  becomes a host-side dispatch loop over one compiled block program
  (adaptive power-of-two blocks up to 2^18 to amortize device dispatch
  latency; see irt_scan.py for why not lax.map);
* everything is shape-static and jit-compiled once per TT rank signature;
  the d-dimensional recursion is an unrolled loop (ranks differ per dim).

All transforms are pure: ``(grid, tt, seeds) -> (samples, log_density)``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.tt import TT

__all__ = ["tt_irt_lin", "tt_irt_sqr", "tt_rt_sqr"]

# Sample blocking: every dispatch through the TPU tunnel costs ~0.5-1 s
# of round-trip latency on the axon backend, so blocks are as large as
# memory allows — up to 2^18 samples per dispatch (intermediates are
# O(block * r^2) ~ a few hundred MB), padded to powers of two so the
# number of distinct compiled programs stays logarithmic.
# TTIRT_MAX_LOG2_BLOCK overrides the cap for perf experiments.
import os as _os

_MAX_BLOCK = 1 << int(_os.environ.get("TTIRT_MAX_LOG2_BLOCK", 18))
_MIN_BLOCK = 1 << 10


def auto_block(m: int, block=None) -> int:
    if block is not None:
        return int(block)
    b = _MIN_BLOCK
    while b < m and b < _MAX_BLOCK:
        b <<= 1
    return b


# ---------------------------------------------------------------------------
# Shared small pieces
# ---------------------------------------------------------------------------

def _grid_spacings(x: jnp.ndarray) -> jnp.ndarray:
    """h[0] = 0, h[i] = x[i] - x[i-1] (reference tt_irt_sqr.m:49-50)."""
    return jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.diff(x)])


def _trapz_cdf(fk: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Cumulative trapezoid integral along the last axis; C[..., 0] = 0."""
    dc = 0.5 * (fk[..., :-1] + fk[..., 1:]) * h[1:]
    zero = jnp.zeros(fk.shape[:-1] + (1,), fk.dtype)
    return jnp.concatenate([zero, jnp.cumsum(dc, axis=-1)], axis=-1)


def _fix_degenerate(fk, ck, x):
    """Rows whose CDF mass is <= 0 fall back to the uniform density on the
    grid box (reference zero-fix, tt_irt_lin.m:94-100)."""
    total = ck[..., -1:]
    bad = total <= 0.0
    unif_f = jnp.ones_like(fk)
    unif_c = jnp.broadcast_to(x - x[0], ck.shape)
    fk = jnp.where(bad, unif_f, fk)
    ck = jnp.where(bad, unif_c, ck)
    total = ck[..., -1:]
    return fk / total, ck / total


def _bisect_cdf(ck: jnp.ndarray, q: jnp.ndarray, n: int) -> jnp.ndarray:
    """Vectorized bisection: largest i0 with Ck[m, i0] < q (clamped to
    [0, n-2]).  Fixed trip count = ceil(log2(n-1)) replaces the reference's
    data-dependent while loop of tracemult gathers (tt_irt_lin.m:110-116)."""
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, n - 1, jnp.int32)
    for _ in range(max(1, math.ceil(math.log2(max(n - 1, 2))) + 1)):
        mid = (lo + hi) // 2
        cmid = jnp.take_along_axis(ck, mid[:, None], axis=1)[:, 0]
        left = q > cmid
        lo = jnp.where(left, mid, lo)
        hi = jnp.where(left, hi, mid)
    return jnp.clip(lo, 0, n - 2)


def _gather_cols(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]


def _invert_quadratic(f1, f2, c1, q, x1, x2):
    """Invert the quadratic CDF segment (linear density between grid nodes):
    solve A*(x-x1)^2 + f1*(x-x1) = q - c1 (reference tt_irt_sqr.m:156-169).

    Uses the citardauq root form 2t / (f1 + sqrt(f1^2 + 4At)) instead of
    the reference's (-f1 + sqrt(D)) / (2A): the latter cancels
    catastrophically when the density is nearly flat (A -> 0 makes
    sqrt(D) - f1 an ulp-level difference divided by a tiny A — observed
    1e-4-scale sample errors in the reference formula at flat cells).
    The stable form needs no A==0 special case, degrades smoothly to
    the linear solve, and is clipped into [x1, x2]."""
    h3 = x2 - x1
    aq = 0.5 * (f2 - f1) / h3
    t = q - c1
    dq = f1 * f1 + 4.0 * aq * t
    den = f1 + jnp.sqrt(jnp.maximum(dq, 0.0))
    safe_den = jnp.where(den <= 0.0, 1.0, den)
    xk = jnp.where(den <= 0.0, x1, x1 + 2.0 * t / safe_den)
    return jnp.clip(xk, x1, x2)


def _interp_prefix(phi, core, i0, la, lb):
    """phi_new[m] = phi[m] @ (la[m]*core[:, i0[m], :] + lb[m]*core[:, i0[m]+1, :]).

    Replaces the reference's three tracemult MEX calls (tt_irt_sqr.m:196-206)
    with gathered batched contractions."""
    g1 = jnp.take(core, i0, axis=1)       # (r1, M, r2)
    g2 = jnp.take(core, i0 + 1, axis=1)   # (r1, M, r2)
    g = g1 * la[None, :, None] + g2 * lb[None, :, None]
    phi = jnp.einsum("mi,imj->mj", phi, g)
    # per-sample renormalization: the conditional is scale-invariant and
    # the running product overflows the f32 exponent range of TPU f64
    # emulation over many dims.
    scale = jnp.maximum(jnp.max(jnp.abs(phi), axis=1, keepdims=True),
                        1e-300)
    return phi / scale


def _num_blocks(m: int, mb: int) -> int:
    return -(-m // mb)


def _pad_rows(a: jnp.ndarray, rows: int) -> jnp.ndarray:
    if a.shape[0] == rows:
        return a
    pad = jnp.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)
    return jnp.concatenate([a, pad], axis=0)


def _extrapolate_boundary(core, x):
    """If the TT core misses the two boundary grid points, extend it by
    linear extrapolation (reference tt_irt_sqr.m:56-62)."""
    n = x.shape[0]
    if core.shape[1] == n:
        return core
    if core.shape[1] != n - 2:
        raise ValueError(
            f"core has {core.shape[1]} points, grid has {n}: expected n or n-2")
    h = jnp.diff(x)
    left = core[:, 0:1, :] - (core[:, 1:2, :] - core[:, 0:1, :]) * (h[0] / h[1])
    right = core[:, -1:, :] + (core[:, -1:, :] - core[:, -2:-1, :]) * (
        (h[-1] + h[-2]) / h[-2])
    return jnp.concatenate([left, core, right], axis=1)


def _canon_grid(grid, tt: TT):
    """Normalize grid input to a list of d 1-D arrays and extrapolate cores
    to the boundary if needed.  Accepts a list of vectors or one shared
    vector."""
    d = tt.d
    if isinstance(grid, (list, tuple)):
        gs = [jnp.asarray(g).reshape(-1) for g in grid]
    else:
        g = jnp.asarray(grid).reshape(-1)
        # Either one shared grid for every dim, or the per-dim grids
        # concatenated (reference passes them stacked, tt_irt_sqr.m:31-40).
        total = sum(c.shape[1] for c in tt.cores)
        total_b = sum(c.shape[1] + 2 for c in tt.cores)
        if d > 1 and g.shape[0] in (total, total_b):
            gs, pos = [], 0
            for c in tt.cores:
                nk = c.shape[1] if g.shape[0] == total else c.shape[1] + 2
                gs.append(g[pos:pos + nk])
                pos += nk
        else:
            gs = [g] * d
    cores = [_extrapolate_boundary(c, x) for c, x in zip(tt.cores, gs)]
    return gs, TT(cores)


# ---------------------------------------------------------------------------
# Backward (preparation) passes
# ---------------------------------------------------------------------------

def _prepare_sqr(tt: TT, grids, stable: bool | None = None):
    """Right-to-left semi-marginalization for the squared (SIRT) sampler.

    P_k = ∫ f^{(>=k)} ⊗ f^{(>=k)} dx_{>k} as an (r_k, r_k, n_k) field.
    The integral over x_{>k} is carried as the Gram matrix
    G = ∫ f^{(>k)} f^{(>k)T}: the reference carries its thin R factor via
    QR (tt_irt_sqr.m:63-80), but the factor only ever enters through
    G = R R^T, so carrying G directly is exact and keeps TPU-hostile QR
    out of the device program (f64 QR on TPU compiles pathologically
    slowly).  ``stable=None`` selects by backend (QR off-TPU)."""
    import jax as _jax

    if stable is None:
        stable = _jax.default_backend() != "tpu"
    d = tt.d
    ps = [None] * d
    hs = [None] * d
    if stable:
        # reference QR carry (tt_irt_sqr.m:63-80): full precision for
        # ill-conditioned (concentrated) semi-marginals
        rfac = jnp.eye(tt.cores[-1].shape[2], dtype=tt.dtype)
        for k in range(d - 1, -1, -1):
            core = tt.cores[k]
            r1, n, r2 = core.shape
            x = grids[k]
            h = _grid_spacings(x)
            hs[k] = h
            w = jnp.sqrt(0.5 * jnp.concatenate(
                [h[1:2], h[1:-1] + h[2:], h[-1:]]))
            b = jnp.einsum("anb,bc->anc", core, rfac)
            ps[k] = jnp.einsum("anc,bnc->abn", b, b)
            if k > 0:
                mat = jnp.reshape(b * w[None, :, None], (r1, -1)).T
                rfac = jnp.linalg.qr(mat)[1].T
                rfac = rfac / jnp.maximum(jnp.max(jnp.abs(rfac)), 1e-300)
        return ps, hs
    gram = jnp.eye(tt.cores[-1].shape[2], dtype=tt.dtype)
    for k in range(d - 1, -1, -1):
        core = tt.cores[k]
        r1, n, r2 = core.shape
        x = grids[k]
        h = _grid_spacings(x)
        hs[k] = h
        w2 = 0.5 * jnp.concatenate([h[1:2], h[1:-1] + h[2:], h[-1:]])
        t = jnp.einsum("anc,cd->and", core, gram)
        pk = jnp.einsum("and,bnd->abn", t, core)        # (r1, r1, n)
        ps[k] = pk
        if k > 0:
            gram = jnp.einsum("abn,n->ab", pk, w2)
            gram = 0.5 * (gram + gram.T)
            # scale-invariant renormalization (TPU f64 emulation has
            # only the f32 exponent range; products over d dims overflow)
            gram = gram / jnp.maximum(jnp.max(jnp.abs(gram)), 1e-300)
    return ps, hs


def _prepare_lin(tt: TT, grids):
    """Right-to-left trapezoid integration of raw cores (tt_irt_lin.m:37-59):
    P_k = ∫ f^{(>=k)} dx_{>k} as an (r_k, n_k) field."""
    d = tt.d
    ps = [None] * d
    hs = [None] * d
    pprev = jnp.ones((tt.cores[-1].shape[2],), tt.dtype)
    for k in range(d - 1, -1, -1):
        core = tt.cores[k]
        x = grids[k]
        h = _grid_spacings(x)
        hs[k] = h
        b = jnp.einsum("anb,b->an", core, pprev)        # (r1, n)
        ps[k] = b
        if k > 0:
            pprev = jnp.sum(0.5 * (b[:, :-1] + b[:, 1:]) * h[1:], axis=1)
            # scale-invariant renormalization (see _prepare_sqr)
            pprev = pprev / jnp.maximum(jnp.max(jnp.abs(pprev)), 1e-300)
    return ps, hs


# ---------------------------------------------------------------------------
# Forward passes (per block)
# ---------------------------------------------------------------------------

def _forward_block_sqr(q, cores, ps, grids, dsample):
    mb = q.shape[0]
    dtype = ps[0].dtype
    phi = jnp.ones((mb, cores[0].shape[0]), dtype)
    xq = []
    lf = jnp.zeros((mb,), dtype)
    for k in range(dsample):
        x = grids[k]
        n = x.shape[0]
        # Conditional marginal: quadratic form of the prefix with the
        # semi-marginal Gram field (replaces tracemult squaring,
        # tt_irt_sqr.m:108-111).
        t = jnp.einsum("mi,ijn->mjn", phi, ps[k])
        fk = jnp.einsum("mj,mjn->mn", phi, t)
        ck = _trapz_cdf(fk, _grid_spacings(x))
        fk, ck = _fix_degenerate(fk, ck, x)
        qk = q[:, k]
        i0 = _bisect_cdf(ck, qk, n)
        c1 = _gather_cols(ck, i0)
        f1 = _gather_cols(fk, i0)
        f2 = _gather_cols(fk, i0 + 1)
        x1 = x[i0]
        x2 = x[i0 + 1]
        xk = _invert_quadratic(f1, f2, c1, qk, x1, x2)
        xq.append(xk)
        la = (x2 - xk) / (x2 - x1)
        lb = (xk - x1) / (x2 - x1)
        lf = lf + jnp.log(f1 * la + f2 * lb)
        if k < dsample - 1:
            phi = _interp_prefix(phi, cores[k], i0, la, lb)
    return jnp.stack(xq, axis=1), lf


def _forward_block_lin(q, cores, ps, grids, dsample):
    mb = q.shape[0]
    dtype = ps[0].dtype
    phi = jnp.ones((mb, cores[0].shape[0]), dtype)
    xq = []
    lf = jnp.zeros((mb,), dtype)
    for k in range(dsample):
        x = grids[k]
        n = x.shape[0]
        fk = jnp.abs(phi @ ps[k])  # (M, n); abs forces nonneg (lin.m:86)
        ck = _trapz_cdf(fk, _grid_spacings(x))
        fk, ck = _fix_degenerate(fk, ck, x)
        qk = q[:, k]
        i0 = _bisect_cdf(ck, qk, n)
        c1 = _gather_cols(ck, i0)
        f1 = _gather_cols(fk, i0)
        f2 = _gather_cols(fk, i0 + 1)
        x1 = x[i0]
        x2 = x[i0 + 1]
        xk = _invert_quadratic(f1, f2, c1, qk, x1, x2)
        xq.append(xk)
        la = (x2 - xk) / (x2 - x1)
        lb = (xk - x1) / (x2 - x1)
        lf = lf + jnp.log(f1 * la + f2 * lb)
        if k < dsample - 1:
            phi = _interp_prefix(phi, cores[k], i0, la, lb)
    return jnp.stack(xq, axis=1), lf


def _forward_block_rt(xin, cores, ps, grids, dsample):
    """Forward Rosenblatt (x -> u), exact inverse of the sqr sampler
    (reference tt_rt_sqr.m:126-151): bisect the grid on x, then *evaluate*
    the quadratic CDF instead of inverting it."""
    mb = xin.shape[0]
    dtype = ps[0].dtype
    phi = jnp.ones((mb, cores[0].shape[0]), dtype)
    qout = []
    lf = jnp.zeros((mb,), dtype)
    for k in range(dsample):
        x = grids[k]
        n = x.shape[0]
        t = jnp.einsum("mi,ijn->mjn", phi, ps[k])
        fk = jnp.einsum("mj,mjn->mn", phi, t)
        ck = _trapz_cdf(fk, _grid_spacings(x))
        fk, ck = _fix_degenerate(fk, ck, x)
        xk = xin[:, k]
        # bisection over grid positions
        xrow = jnp.broadcast_to(x[None, :], (mb, n))
        i0 = _bisect_cdf(xrow, xk, n)
        c1 = _gather_cols(ck, i0)
        f1 = _gather_cols(fk, i0)
        f2 = _gather_cols(fk, i0 + 1)
        x1 = x[i0]
        x2 = x[i0 + 1]
        h3 = x2 - x1
        aq = 0.5 * (f2 - f1) / h3
        qk = aq * (xk - x1) ** 2 + f1 * (xk - x1) + c1
        qout.append(qk)
        la = (x2 - xk) / h3
        lb = (xk - x1) / h3
        lf = lf + jnp.log(f1 * la + f2 * lb)
        if k < dsample - 1:
            phi = _interp_prefix(phi, cores[k], i0, la, lb)
    return jnp.stack(qout, axis=1), lf


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

@jax.jit
def _irt_sqr_jit(grids, tt, q):
    ps, _ = _prepare_sqr(tt, grids)
    dsample = min(tt.d, q.shape[1])
    return _forward_block_sqr(q, tt.cores, ps, grids, dsample)


@jax.jit
def _irt_lin_jit(grids, tt, q):
    ps, _ = _prepare_lin(tt, grids)
    dsample = min(tt.d, q.shape[1])
    return _forward_block_lin(q, tt.cores, ps, grids, dsample)


@jax.jit
def _rt_sqr_jit(grids, tt, x):
    ps, _ = _prepare_sqr(tt, grids)
    dsample = min(tt.d, x.shape[1])
    return _forward_block_rt(x, tt.cores, ps, grids, dsample)


def _host_blocked(jit_fn, grids, f, seeds, block):
    """Host-side block loop (NOT lax.map: nesting the per-dim recursion
    inside another scan explodes TPU compile time; see irt_scan.py).
    One compiled block program serves any sample count."""
    m = seeds.shape[0]
    nb = _num_blocks(m, block)
    if nb <= 1:
        return jit_fn(grids, f, seeds)
    padded = _pad_rows(seeds, nb * block)
    xs_parts, lf_parts = [], []
    for b in range(nb):
        chunk = jax.lax.slice_in_dim(padded, b * block, (b + 1) * block)
        xb, lb = jit_fn(grids, f, chunk)
        xs_parts.append(xb)
        lf_parts.append(lb)
    return (jnp.concatenate(xs_parts, axis=0)[:m],
            jnp.concatenate(lf_parts, axis=0)[:m])


def _dispatch(mode, grid, f, q, block, use_scan, precision=None):
    """Pick the rank-padded scan fast path (one compiled scan body, see
    irt_scan.py) when shapes allow, else the general unrolled path."""
    q = jnp.asarray(q)
    grids, f = _canon_grid(grid, f)
    dsample = min(f.d, q.shape[1])
    block = auto_block(q.shape[0], block)
    from .irt_scan import can_use_scan, irt_scan, stack_padded

    if use_scan is None:
        use_scan = can_use_scan(f, grids, dsample)
    if use_scan:
        cstack, xstack = stack_padded(f, grids)
        if precision is None:
            precision = "f64" if f.dtype == jnp.float64 else "f32"
        return irt_scan(mode, cstack, xstack, q, block, precision)
    jit_fn = {"sqr": _irt_sqr_jit, "lin": _irt_lin_jit,
              "rt": _rt_sqr_jit}[mode]
    return _host_blocked(jit_fn, grids, f, q, block)


def tt_irt_sqr(grid, f: TT, q, block: int | None = None,
               use_scan: bool | None = None,
               precision: str | None = None):
    """SIRT: inverse Rosenblatt transform through sqrt(density) in TT.

    Args:
      grid: list of d grid vectors (with boundaries), or concatenated vector.
      f: TT of sqrt(PDF) on the grid (boundary points may be missing; they
         are restored by linear extrapolation as in tt_irt_sqr.m:56-62).
      q: (M, D) seeds in [0,1]^D, D <= d samples the marginal of the first
         D variables.
      use_scan: force/forbid the rank-padded scan fast path (default:
         automatic — used when grids are uniform and D == d).
      precision: 'f64', 'f32', 'mixed', 'hi', 'hid' or 'ds' (scan path only)
         — see irt_scan.py.  On TPU 'f32' meets the 1e-6 sample-parity
         bar at full speed; 'hi' adds factor-form (cancellation-free)
         conditionals for ill-conditioned TTs.
    Returns:
      (xq, lFapp): samples (M, D) and log approximate density (M,).
    """
    return _dispatch("sqr", grid, f, q, block, use_scan, precision)


def tt_irt_lin(grid, f: TT, q, block: int | None = None,
               use_scan: bool | None = None,
               precision: str | None = None):
    """v1 IRT through the density itself (linear splines, tt_irt_lin.m)."""
    return _dispatch("lin", grid, f, q, block, use_scan, precision)


def tt_rt_sqr(grid, f: TT, x, block: int | None = None,
              use_scan: bool | None = None,
              precision: str | None = None):
    """Forward Rosenblatt transform (x -> u), inverse of tt_irt_sqr."""
    return _dispatch("rt", grid, f, x, block, use_scan, precision)
