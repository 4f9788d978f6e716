"""Fused Pallas kernels for the per-dimension IRT step (TPU serve path).

The XLA scan path (samplers/irt_scan.py) materializes two large
intermediates per dimension in HBM: the conditional factor/Gram product
(``(Mb, n*r)`` / ``(Mb, r^2)``) and the interpolated prefix update
(``(Mb, r^2)``) — at the Lorenz-40 production shape (n=33, r=23,
Mb=2^18) that is ~2.2 GB of HBM round trips per dimension, which the
round-2 profiling identified as the deep-serve bottleneck (~85% of the
transform; BENCH_NOTES "time decomposition").  These kernels keep those
intermediates in VMEM.

Design for the MXU (not a translation of the reference C kernels): every
contraction is a full-width lane-aligned matmul; the awkward
"reshape (T, n*r) -> (T, n, r) then reduce" patterns — which Mosaic
cannot lay out without lane-splitting relayouts — become matmuls against
tiny constant 0/1 matrices:

* segment-sum  S[(x*r + j), x] = 1   folds ||.||^2 over j per grid node;
* replication  E[i, (i*r + j)] = 1   broadcasts phi_i across j;
* tiling      E2[j, (i*r + j)] = 1   broadcasts phi_j across i;
* selection   S2[(i*r + j), j] = 1   folds the batched matvec over i.

This costs ~2x the theoretical MACs of the minimal contraction but runs
them at near-peak MXU utilization (K = n*r or r^2, i.e. 529-759, vs the
XLA path's K = r or n = 23-33) with zero HBM intermediates.  The CDF
build + inversion between the two kernels stays in XLA (it needs f64 /
double-single scalar work and is ~15% of the step).

Reference hot loop being replaced: tt_irt_sqr.m:96-207 (three tracemult
MEX calls per dim per block) / utils/tt_irt1_int64.c:88-181.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "factor_conditional", "gram_conditional", "condition_update",
    "seg_sum_matrix", "repl_matrix", "tile_matrix", "select_matrix",
    "fused_enabled", "cdf_bracket_factor", "dc_matrix", "prefix_suffix_matrix",
]

_HI = jax.lax.Precision.HIGHEST


def fused_level() -> int:
    """Opt-in via TTIRT_FUSED_STEP (the XLA path is the default and the
    reference implementation): 1 = the two narrow contraction kernels
    (factor/gram_conditional + condition_update), 2 = the whole-dim CDF
    kernel (cdf_bracket_factor + condition_update; factor family only —
    gram falls back to level 1).  Measured on v5e (BENCH_NOTES r03): at
    the n=17/r=13 bench shape the fused paths are launch-overhead bound
    and do not win; enable where measurements justify."""
    env = os.environ.get("TTIRT_FUSED_STEP")
    if env is None or env in ("0", "false", "off"):
        return 0
    return 2 if env == "2" else 1


def fused_enabled() -> bool:
    return fused_level() > 0


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile(m: int) -> int:
    """Largest power-of-two row tile (<= TTIRT_FUSED_TILE) dividing m —
    the grid must cover every row exactly."""
    t = int(os.environ.get("TTIRT_FUSED_TILE", 1024))
    while m % t:
        t //= 2
    return max(t, 1)


# ---------------------------------------------------------------------------
# Constant 0/1 structure matrices (host-built, cached per shape)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def seg_sum_matrix(n: int, r: int):
    """(n*r, n): column x sums positions x*r..x*r+r-1."""
    s = np.zeros((n * r, n), np.float32)
    for x in range(n):
        s[x * r:(x + 1) * r, x] = 1.0
    return s  # numpy: a trace-safe constant (jax arrays made inside a
    # trace would leak out of it through the lru_cache)


@functools.lru_cache(maxsize=64)
def repl_matrix(r: int, cols: int):
    """(r, r*cols): E[i, i*cols + j] = 1 — phi @ E puts phi_i at every
    position of block i."""
    e = np.zeros((r, r * cols), np.float32)
    for i in range(r):
        e[i, i * cols:(i + 1) * cols] = 1.0
    return e


@functools.lru_cache(maxsize=64)
def tile_matrix(r: int, blocks: int):
    """(r, blocks*r): E2[j, i*r + j] = 1 — phi @ E2 tiles phi across
    the blocks."""
    e = np.zeros((r, blocks * r), np.float32)
    for i in range(blocks):
        e[np.arange(r), i * r + np.arange(r)] = 1.0
    return e


@functools.lru_cache(maxsize=64)
def select_matrix(r1: int, r2: int):
    """(r1*r2, r2): S2[i*r2 + j, j] = 1 — sums blocks elementwise."""
    s = np.zeros((r1 * r2, r2), np.float32)
    for i in range(r1):
        s[i * r2 + np.arange(r2), np.arange(r2)] = 1.0
    return s


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _factor_kernel(phi_ref, b_ref, s_ref, fk_ref):
    # v = phi @ B : (T, n*r) lives only in VMEM
    v = jnp.dot(phi_ref[:], b_ref[:], precision=_HI,
                preferred_element_type=jnp.float32)
    fk_ref[:] = jnp.dot(v * v, s_ref[:], precision=_HI,
                        preferred_element_type=jnp.float32)


def factor_conditional(phi, bmat):
    """fk[m, x] = || phi[m] @ B_x ||^2 for B packed as (r, n*r) with
    B[:, x*r + j] = B_x[:, j].  phi: (M, r) f32.  Returns (M, n) f32.

    The fused form of _step_factor's conditional (irt_scan.py): one
    (T,r)x(r,n*r) matmul + one (T,n*r)x(n*r,n) segment-sum matmul per
    tile, both at full MXU K-depth."""
    m, r = phi.shape
    nr = bmat.shape[1]
    n = nr // r
    t = _tile(m)
    with jax.enable_x64(False):
        # under jax_enable_x64 the grid/index-map constants trace as
        # i64, which Mosaic rejects (same workaround as pallas_irt.py)
        return pl.pallas_call(
        _factor_kernel,
        grid=(m // t,),
        in_specs=[
            pl.BlockSpec((t, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, nr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=_interpret(),
    )(phi.astype(jnp.float32), bmat, seg_sum_matrix(n, r))


def _gram_kernel(phi_ref, p_ref, e1_ref, e2_ref, fk_ref):
    pe1 = jnp.dot(phi_ref[:], e1_ref[:], precision=_HI,
                  preferred_element_type=jnp.float32)
    pe2 = jnp.dot(phi_ref[:], e2_ref[:], precision=_HI,
                  preferred_element_type=jnp.float32)
    fk_ref[:] = jnp.dot(pe1 * pe2, p_ref[:], precision=_HI,
                        preferred_element_type=jnp.float32)


def gram_conditional(phi, pmat):
    """fk[m, x] = phi[m] P_x phi[m]^T for P packed as (r*r, n) with
    P[i*r + j, x] = P_x[i, j].  The fused form of _step's Gram
    conditional: the (M, r^2) outer product never reaches HBM."""
    m, r = phi.shape
    rr, n = pmat.shape
    t = _tile(m)
    with jax.enable_x64(False):
        return pl.pallas_call(
        _gram_kernel,
        grid=(m // t,),
        in_specs=[
            pl.BlockSpec((t, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rr, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, rr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, rr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=_interpret(),
    )(phi.astype(jnp.float32), pmat, repl_matrix(r, r), tile_matrix(r, r))


def _update_kernel(phi_ref, i0_ref, la_ref, lb_ref, c_ref, e_ref,
                   s2_ref, out_ref):
    t, r = phi_ref.shape
    n = c_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    i0 = i0_ref[:]                                        # (T, 1) int32
    w = (jnp.where(iota == i0, la_ref[:], 0.0)
         + jnp.where(iota == i0 + 1, lb_ref[:], 0.0))     # (T, n)
    b = jnp.dot(w, c_ref[:], precision=_HI,
                preferred_element_type=jnp.float32)       # (T, r*r)
    pe = jnp.dot(phi_ref[:], e_ref[:], precision=_HI,
                 preferred_element_type=jnp.float32)      # (T, r*r)
    phi_new = jnp.dot(pe * b, s2_ref[:], precision=_HI,
                      preferred_element_type=jnp.float32)  # (T, r)
    scale = jnp.max(jnp.abs(phi_new), axis=1, keepdims=True)
    out_ref[:] = phi_new / jnp.maximum(scale, 1e-30)


def condition_update(phi, i0, la, lb, cmat):
    """phi'[m] = normalize( phi[m] @ (la[m] C[i0[m]] + lb[m] C[i0[m]+1]) )
    for C unfolded as (n, r*r) with C[x, i*r + j] = core[i, x, j].

    The fused form of the prefix conditioning (w one-hot build +
    w@cmat + batched matvec + renorm of irt_scan._step/_step_factor):
    the (M, r^2) interpolated-core product never reaches HBM, and the
    one-hot weights are rebuilt in VMEM from (i0, la, lb)."""
    m, r = phi.shape
    n, rr = cmat.shape
    t = _tile(m)
    with jax.enable_x64(False):
        return pl.pallas_call(
        _update_kernel,
        grid=(m // t,),
        in_specs=[
            pl.BlockSpec((t, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, rr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, rr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rr, r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, r), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, r), jnp.float32),
        interpret=_interpret(),
    )(phi.astype(jnp.float32), i0[:, None].astype(jnp.int32),
      la[:, None].astype(jnp.float32), lb[:, None].astype(jnp.float32),
      cmat, repl_matrix(r, r), select_matrix(r, r))


# ---------------------------------------------------------------------------
# Whole-dim CDF kernel: conditional + CDF rows + bracket + readout
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def dc_matrix(n: int, h: tuple):
    """(n, n-1) trapezoid matrix: dc = fk @ D with
    D[i, j] = 0.5*h[j+1]*(delta_{i,j} + delta_{i,j+1}) — the matmul form
    of 0.5*(fk[:, :-1] + fk[:, 1:]) * h[1:] (lane-shift-free for
    Mosaic)."""
    d = np.zeros((n, n - 1), np.float32)
    hv = np.asarray(h, np.float32)
    for j in range(n - 1):
        d[j, j] = 0.5 * hv[j + 1]
        d[j + 1, j] = 0.5 * hv[j + 1]
    return d


@functools.lru_cache(maxsize=64)
def prefix_suffix_matrix(nm1: int):
    """(n-1, 2(n-1)) block [L | U]: one matmul produces both the prefix
    cumsum (ck without its leading zero) and the suffix cumsum (cr
    without its trailing zero).  Unit multipliers: numerically equal to
    sequential cumsums (irt_scan._tri_mats)."""
    idx = np.arange(nm1)
    lmat = (idx[:, None] <= idx[None, :]).astype(np.float32)
    umat = (idx[:, None] >= idx[None, :]).astype(np.float32)
    return np.concatenate([lmat, umat], axis=1)


def _cdf_bracket_kernel(rt: bool, n: int, phi_ref, qp_ref, b_ref, s_ref,
                        d_ref, lu_ref, hrow_ref, xg_ref, out_ref,
                        i0_ref):
    """One IRT dimension's full f32 row space in VMEM: conditional
    density, trapezoid CDF from both sides, count-based bracket locate,
    one-hot readout.  Only (T,) bracket scalars leave the kernel."""
    t = phi_ref.shape[0]
    v = jnp.dot(phi_ref[:], b_ref[:], precision=_HI,
                preferred_element_type=jnp.float32)         # (T, n*r)
    fk = jnp.dot(v * v, s_ref[:], precision=_HI,
                 preferred_element_type=jnp.float32)        # (T, n)
    dc = jnp.dot(fk, d_ref[:], precision=_HI,
                 preferred_element_type=jnp.float32)        # (T, n-1)
    bad = jnp.sum(dc, axis=1, keepdims=True) <= 0.0
    hrow = hrow_ref[:]                                      # (1, n-1)
    dc = jnp.where(bad, jnp.broadcast_to(hrow, dc.shape), dc)
    fk = jnp.where(bad, jnp.ones_like(fk), fk)
    cklu = jnp.dot(dc, lu_ref[:], precision=_HI,
                   preferred_element_type=jnp.float32)      # (T, 2(n-1))
    ckp = cklu[:, :n - 1]                # prefix sums = ck[1:]
    crp = cklu[:, n - 1:]                # suffix sums = cr[:-1]
    zero = jnp.zeros((t, 1), jnp.float32)
    ck = jnp.concatenate([zero, ckp], axis=1)               # (T, n)
    cr = jnp.concatenate([crp, zero], axis=1)               # (T, n)
    tot = ck[:, n - 1:n]                                    # (T, 1)
    qp = qp_ref[:]                                          # (T, 1)
    xg = xg_ref[:]                       # (2, n): x32, xlo
    x32row = xg[0:1, :]                                     # (1, n)
    if rt:
        below = (jnp.broadcast_to(x32row, (t, n)) <
                 qp).astype(jnp.int32)
        i0 = jnp.clip(jnp.sum(below, axis=1, keepdims=True) - 1,
                      0, n - 2)
    else:
        qt = qp * tot
        ut = (1.0 - qp) * tot
        i0l = (jnp.sum((ck < qt).astype(jnp.int32), axis=1,
                       keepdims=True) - 1)
        i0r = (jnp.sum((cr > ut).astype(jnp.int32), axis=1,
                       keepdims=True) - 1)
        i0 = jnp.clip(jnp.where(qp > 0.5, i0r, i0l), 0, n - 2)
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    oh0 = (iota == i0).astype(jnp.float32)                  # (T, n)
    oh1 = (iota == i0 + 1).astype(jnp.float32)

    def read(rows, oh):
        return jnp.sum(rows * oh, axis=1, keepdims=True)    # (T, 1)

    x32b = jnp.broadcast_to(x32row, (t, n))
    xlob = jnp.broadcast_to(xg[1:2, :], (t, n))
    out_ref[:] = jnp.concatenate(
        [read(ck, oh0), read(cr, oh1), read(fk, oh0), read(fk, oh1),
         read(x32b, oh0), read(xlob, oh0), read(x32b, oh1),
         read(xlob, oh1), tot], axis=1)                     # (T, 9)
    i0_ref[:] = i0


def cdf_bracket_factor(phi, qp32, bmat, dmat, hrow, xg, mode="irt"):
    """Fused conditional + serve-CDF + bracket for the factor family.

    Computes fk[m, x] = ||phi[m] @ B_x||^2, the two-sided trapezoid CDF
    (0/1-triangular-matmul cumsums — numerically equal to sequential
    cumsums) and the count-based bracket, entirely in VMEM; returns the
    f64-exact bracket scalars

        (c1, cr2, f1, f2, x1h, x1l, x2h, x2l, tot), i0

    each (M,) f32 (+ i0 int32), from which the XLA epilogue
    (irt_scan._serve_solve) runs the f64 quadratic inversion.  The
    (M, n*r) conditional product and all (M, n) CDF rows never reach
    HBM — at the d=40/n=33/r=23 production shape the XLA path
    materializes ~2.7 GB of them per dimension, the measured deep-serve
    bottleneck (BENCH_NOTES r03; reference hot loop
    tt_irt_sqr.m:96-207).

    Bracket semantics match irt_scan._cdf_invert_serve except that the
    comparison targets qt/ut are formed in f32 from the f32 total
    (one extra rounding vs the XLA path's f64-product-then-round) — a
    <=1-cell bracket shift at rounding-boundary seeds, within the
    mode's ~1e-7-cell error budget (tests/test_pallas.py parity).

    Per-dim operands are DEVICE arrays (scan-sliceable inside the
    lax.scan over dimensions): dmat (n, n-1) trapezoid matrix
    (irt_scan._serve_dmat), hrow (1, n-1) grid spacings h[1:], xg
    (2, n) = [f32(grid), f64-residual(grid)]."""
    m, r = phi.shape
    nr = bmat.shape[1]
    n = nr // r
    t = _tile(m)
    with jax.enable_x64(False):
        out, i0 = pl.pallas_call(
            functools.partial(_cdf_bracket_kernel, mode == "rt", n),
            grid=(m // t,),
            in_specs=[
                pl.BlockSpec((t, r), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, nr), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nr, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, n - 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n - 1, 2 * (n - 1)), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n - 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((t, 9), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m, 9), jnp.float32),
                jax.ShapeDtypeStruct((m, 1), jnp.int32),
            ],
            interpret=_interpret(),
        )(phi.astype(jnp.float32), qp32[:, None].astype(jnp.float32),
          bmat, seg_sum_matrix(n, r), dmat.astype(jnp.float32),
          prefix_suffix_matrix(n - 1), hrow.astype(jnp.float32),
          xg.astype(jnp.float32))
    return out, i0[:, 0]
