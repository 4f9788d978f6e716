"""Greedy two-site TT-cross (the TT-Toolbox ``greedy2_cross`` analog).

The reference's DIRT constructor offers ``crossmethod='greedy2_cross'``
as an alternative backend (tt_dirt_approx.m:181-188) that downloads
TT-Toolbox.  This is a self-contained re-design of that algorithm
(greedy restricted cross interpolation, Savostyanov & Oseledets):

* per bond k the interpolation is the classic cross formula
  A(rows, J_k) inv(A(I_k, J_k)) A(I_k, cols) on the two-site local
  matrix (rows = I_{k-1} x i_k, cols = i_{k+1} x J_{k+1});
* each sweep searches the local *residual* for its largest entry by
  rook pivoting (alternating argmax over one evaluated column / row —
  O(n r) evaluations per pivot instead of the O(n^2 r^2) full search)
  and appends the pivot to both index sets: rank grows by at most one
  per bond per sweep, exactly where the error says it must;
* index sets are nested by construction (each new row is an element of
  the merged I_{k-1} x mode grid), so the final cores assemble from
  the already-evaluated interpolation blocks.

Like amen_cross (see its module docstring), the sweep is host-side
control flow and every function evaluation is one vectorized batch —
a JAX density runs them as jitted device batches.
"""

from __future__ import annotations

import math

import numpy as np

from .amen_cross import CrossResult
from ..ops.tt import TT

__all__ = ["greedy_cross"]


def _merge_rows(jl, n):
    """Merged (prefix, mode) rows, prefix fastest: row = a + rl*im."""
    rl = jl.shape[0] if jl.size else 1
    kl = jl.shape[1]
    out = np.empty((rl * n, kl + 1), dtype=np.int64)
    out[:, :kl] = np.tile(jl, (n, 1))
    out[:, kl] = np.repeat(np.arange(n, dtype=np.int64), rl)
    return out


def _merge_cols(n, jr):
    """Merged (mode, suffix) cols, mode fastest: col = im + n*c."""
    rr = jr.shape[0] if jr.size else 1
    kr = jr.shape[1]
    out = np.empty((n * rr, 1 + kr), dtype=np.int64)
    out[:, 0] = np.tile(np.arange(n, dtype=np.int64), rr)
    out[:, 1:] = np.repeat(jr, n, axis=0)
    return out


def greedy_cross(n, fun, tol, *, nswp=20, y0=None, tol_exit=None,
                 verb=0, seed=0, rmax=None, rook_iters=2, cache=True,
                 mesh=None) -> CrossResult:
    """Greedy rook-pivoted TT-cross of ``fun(ind) -> (M,)`` over 0-based
    integer multi-indices with mode sizes ``n``.

    Args:
      n: sequence of mode sizes.
      fun: vectorized index function (same contract as amen_cross_s's
        ifun).
      tol: residual acceptance threshold (relative to the largest seen
        |value|); a bond stops growing when its rook residual is below.
      y0: initial index (d,) — defaults to the grid midpoint, matching
        the reference's y0mid (tt_dirt_approx.m:183-184).
      nswp / tol_exit / rmax: sweep cap, exit threshold (defaults to
        tol), hard rank cap.
      cache: memoize evaluated fibers across sweeps, so evaluation
        cost scales with *new* pivots instead of sweeps (the
        reference's greedy cross reuses evaluated fibers too) — the
        interpolation blocks u/w repeat almost entirely between
        sweeps and in the final core assembly.
      mesh: optional jax.sharding.Mesh — probe batches evaluate with
        the sample axis sharded over the mesh (requires jittable fun;
        see amen_cross_s).
    Returns CrossResult (statvals/statind are None).
    """
    rng = np.random.default_rng(seed)
    n = [int(v) for v in np.asarray(n).reshape(-1)]
    d = len(n)
    tol_exit = tol if tol_exit is None else tol_exit
    evalcnt = [0, 0]

    if mesh is not None:
        from ..parallel.mesh import sharded_batch_fn

        fun = sharded_batch_fn(mesh, fun)

    def _call(ind):
        """Evaluate fun padded to a power-of-two batch (>= 32): keeps a
        jitted density's compile count logarithmic, and makes the batch
        shapes device-count-divisible so a mesh build equals a
        single-device build bitwise (see amen_cross_s)."""
        m = ind.shape[0]
        mpad = 1 << max(5, (m - 1).bit_length())
        if mpad != m:
            ind = np.concatenate(
                [ind, np.broadcast_to(ind[:1], (mpad - m, ind.shape[1]))],
                axis=0)
        return np.asarray(fun(ind), dtype=np.float64).reshape(-1)[:m]

    fibcache: dict = {}

    def feval(ind):
        ind = np.ascontiguousarray(ind, dtype=np.int64)
        if not cache:
            evalcnt[0] += ind.shape[0]
            return _call(ind)
        keys = [r.tobytes() for r in ind]
        miss = np.fromiter((k not in fibcache for k in keys), dtype=bool,
                           count=len(keys))
        midx = np.flatnonzero(miss)
        if midx.size:
            vals = _call(ind[midx])
            evalcnt[0] += int(midx.size)
            for j, v in zip(midx, vals):
                fibcache[keys[j]] = float(v)
        return np.fromiter((fibcache[k] for k in keys), dtype=np.float64,
                           count=len(keys))

    if y0 is None:
        y0 = np.array([(nk - 1) // 2 for nk in n], dtype=np.int64)
    else:
        y0 = np.asarray(y0, dtype=np.int64).reshape(-1)

    # nested index sets for bond b (between dims b-1 and b): left
    # prefixes lsets[b] (r_b, b) over dims 0..b-1 and right suffixes
    # rsets[b] (r_b, d-b) over dims b..d-1; rank-1 midpoint init
    lsets = [None] * d
    rsets = [None] * d
    for b in range(1, d):
        lsets[b] = y0[None, :b].copy()
        rsets[b] = y0[None, b:].copy()

    fmax = 0.0
    swp = 0
    max_res = np.inf
    while swp < nswp and max_res > tol_exit * max(fmax, 1e-300):
        swp += 1
        max_res = 0.0
        for b in range(1, d):
            lprev = lsets[b - 1] if b - 1 >= 1 else np.zeros((1, 0),
                                                             np.int64)
            rnext = rsets[b + 1] if b + 1 <= d - 1 else np.zeros(
                (1, 0), np.int64)
            rows = _merge_rows(lprev, n[b - 1])      # (rl*n, b) prefixes
            cols = _merge_cols(n[b], rnext)          # (n*rr, d-b)
            # positions of the current pivots inside rows/cols
            rowsel = _positions(rows, lsets[b])
            colsel = _positions(cols, rsets[b])
            rk = lsets[b].shape[0]
            # interpolation blocks (fresh values each sweep)
            u = feval(_cat(np.repeat(rows, rk, axis=0),
                           np.tile(rsets[b], (rows.shape[0], 1))))
            u = u.reshape(rows.shape[0], rk)          # A(rows, J_b)
            w = feval(_cat(np.repeat(lsets[b], cols.shape[0], axis=0),
                           np.tile(cols, (rk, 1))))
            w = w.reshape(rk, cols.shape[0])          # A(I_b, cols)
            p = u[rowsel]                             # A(I_b, J_b)
            fmax = max(fmax, float(np.max(np.abs(u))),
                       float(np.max(np.abs(w))))
            uinv = u @ np.linalg.solve(
                p + 1e-300 * np.eye(rk), w)           # approx on probes

            # rook pivot search on the residual
            if rmax is not None and rk >= rmax:
                continue
            j = int(rng.integers(0, cols.shape[0]))
            i = -1
            res = 0.0
            for _ in range(rook_iters):
                cvals = feval(_cat(rows,
                                   np.tile(cols[j], (rows.shape[0], 1))))
                rcol = cvals - u @ np.linalg.solve(
                    p + 1e-300 * np.eye(rk), cvals[rowsel])
                i = int(np.argmax(np.abs(rcol)))
                rvals = feval(_cat(np.tile(rows[i], (cols.shape[0], 1)),
                                   cols))
                rrow = rvals - u[i] @ np.linalg.solve(
                    p + 1e-300 * np.eye(rk), w)
                jnew = int(np.argmax(np.abs(rrow)))
                res = float(np.abs(rrow[jnew]))
                if jnew == j:
                    break
                j = jnew
            max_res = max(max_res, res)
            fmax = max(fmax, res)
            if res > tol * max(fmax, 1e-300):
                newrow = rows[i]
                newcol = cols[j]
                dup = (np.any(np.all(lsets[b] == newrow, axis=1))
                       or np.any(np.all(rsets[b] == newcol, axis=1)))
                if not dup:
                    lsets[b] = np.concatenate([lsets[b], newrow[None]],
                                              axis=0)
                    rsets[b] = np.concatenate([rsets[b], newcol[None]],
                                              axis=0)
        if verb:
            ranks = [1] + [lsets[b].shape[0] for b in range(1, d)] + [1]
            print(f"=greedy_cross= swp={swp}, max_res={max_res:.3e}, "
                  f"max_rank={max(ranks)}, evals={evalcnt[0]}")

    # ---- assemble the interpolant cores ----
    cores = []
    for k in range(d):
        lprev = lsets[k] if k >= 1 else np.zeros((1, 0), np.int64)
        rl = lprev.shape[0]
        if k < d - 1:
            rk = rsets[k + 1].shape[0]
            rows = _merge_rows(lprev, n[k])
            vals = feval(_cat(np.repeat(rows, rk, axis=0),
                              np.tile(rsets[k + 1], (rows.shape[0], 1))))
            a_block = vals.reshape(rl * n[k], rk)
            rowsel = _positions(rows, lsets[k + 1])
            p = a_block[rowsel]
            core = np.linalg.solve(p.T, a_block.T).T   # A inv(P)
            cores.append(np.reshape(core, (rl, n[k], rk), order="F"))
        else:
            rows = _merge_rows(lprev, n[k])
            vals = feval(rows)
            cores.append(np.reshape(vals, (rl, n[k], 1), order="F"))

    import jax.numpy as jnp

    tt = TT([jnp.asarray(c) for c in cores])
    return CrossResult(tt, None, None, [None] + lsets[1:] + [None],
                      (evalcnt[0], evalcnt[1]))


def _cat(a, b):
    return np.concatenate([a, b], axis=1)


def _positions(universe, subset):
    """Positions of each subset row inside the universe rows (all rows
    unique; subset guaranteed nested by construction)."""
    # encode rows as void for row-wise matching
    uv = np.ascontiguousarray(universe).view(
        [("", universe.dtype)] * universe.shape[1]).reshape(-1)
    sv = np.ascontiguousarray(subset).view(
        [("", subset.dtype)] * subset.shape[1]).reshape(-1)
    order = np.argsort(uv)
    pos = order[np.searchsorted(uv, sv, sorter=order)]
    if not np.all(uv[pos] == sv):
        raise RuntimeError("index sets lost nestedness")
    return pos
