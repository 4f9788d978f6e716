"""Rank-padded scan fast path for the IRT/RT transforms.

The general path in ``irt.py`` unrolls the d-dimensional recursion
(ranks differ per dim), which makes the XLA program O(d) large — at the
Lorenz-40 stress shape that is minutes of TPU compile time.  Here all TT
ranks are zero-padded to the maximum rank so every dimension has the
same shape, and the whole recursion becomes ONE `lax.scan` body compiled
once.  Zero padding is exact: every contraction is linear in the padded
entries, so the padded lanes contribute nothing.

Precision modes (see _PRECISIONS):

* 'f64'   — reference-accurate everywhere (native on CPU, emulated and
  ~100x slower on TPU).
* 'f32' / 'mixed' — Gram-form conditionals (fk = (phi ⊗ phi) @ P, one
  MXU matmul per dim); 'mixed' promotes the CDF build + quadratic
  inversion to f64.  The Gram form squares the condition number, so the
  low-density tails carry absolute error at the f32 matmul floor —
  relative tail error ~ eps/rho at density ratio rho.
* 'hi'    — FACTOR-form conditionals: the backward semi-marginal Gram
  G_k is carried in f64 and Cholesky-factored per dim (the scan analog
  of the reference's QR trick, tt_irt_sqr.m:63-80), and the forward
  pass computes fk = ||phi @ (C_k L_k)||^2 — a positive sum of squares
  with NO cancellation, so the tail error improves to ~ eps/sqrt(rho).
  CDF rows run in f32 via triangular-matmul cumsums with f64 bracket
  scalars (_cdf_invert_serve) — the deep-serve default (measured N/ESS
  on the 14-level Lorenz-40 stack equals the double-single variant).
  All matmuls run at Precision.HIGHEST (the TPU default for f32
  operands is bf16 passes, ~2e-3 relative — useless here).
* 'hid'   — 'hi' with double-single CDF rows (~2^-48,
  _cdf_invert_fast): the belt-and-braces parity mode.
* 'ds'    — 'hid' plus double-single (compensated f32) carries for the
  prefix interface phi and the core interpolation, removing the error
  accumulated across the d-dim conditioning chain (ops/doublesingle.py).
  The remaining floor is the f32 accumulation inside the MXU matmul.

Bandwidth note: the Gram-form conditional is computed as
``fk = (phi ⊗ phi) @ P`` — an (Mb, r^2) outer product times an
(r^2, n) matrix — instead of the naive (Mb, r, n) chained einsum.  This
keeps the largest intermediate at O(Mb r^2) instead of O(Mb r n) and
maps the hot op onto a single MXU matmul per dimension.  The factor
form costs the same MACs with an (Mb, n r) intermediate.

Used automatically by tt_irt_sqr / tt_irt_lin / tt_rt_sqr when the grid
is uniform across dimensions and the full joint is sampled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.doublesingle import (
    ds_cumsum,
    ds_from_f64,
    ds_mul,
    ds_scale_exact,
    ds_sum_pairwise,
    ds_to_f64,
    two_sum,
)
from ..ops.tt import TT
from .irt import (
    _grid_spacings,
    _invert_quadratic,
    _num_blocks,
    _pad_rows,
)

__all__ = ["stack_padded", "irt_scan", "can_use_scan",
           "resolved_serve_modes"]

# TPU matmuls on f32 operands default to single-pass bf16 (~2e-3
# relative); every matmul in this module states its precision.
# TTIRT_MXU_PRECISION=HIGH selects 3-pass bf16 for perf experiments
# (measure accuracy before trusting it for the 1e-6 parity claim).
import os as _os  # noqa: E402

_HI = getattr(jax.lax.Precision,
              _os.environ.get("TTIRT_MXU_PRECISION", "HIGHEST"))

# TTIRT_STREAMS=2 splits factor-family forward blocks into two
# independent half-batch chains (VPU/MXU software pipelining
# experiment).  Read once at import: jit caches key on static args, so
# a runtime env flip would silently reuse the old program.
_STREAMS = int(_os.environ.get("TTIRT_STREAMS", "1"))

# K-packed factor matmuls for the 'hi' hot loop: emulate the bf16
# split products of Precision.HIGHEST in ONE MXU dot (3x the K
# utilization at the r=23-33 production contraction depths).  Default:
# the full nine-product pack on TPU-class backends for precision='hi',
# off on CPU (native f32 FMA is both faster and more accurate there).
# Measured on v5e at the d=40/n=33/r=23 production shape, 2^18 rows:
# 0.630 s vs 0.945 s HIGHEST (1.5x), with d=40 stress-TT parity
# 1.11e-7 max sample dev vs 6.84e-8 for HIGHEST — the same class,
# with wide headroom under the 1e-5 regression bar.
#
# The pack is correct ONLY with the integer bit-split in
# _bf16_split_f32: a cast-based split is silently zeroed by the TPU
# compiler's bf16 propagation pass (every split scheme then collapses
# to a single-pass bf16 matmul, fk rel err 1.1e-2 — see that
# docstring and BENCH_NOTES round 3, 'hi-pack').
#
# TTIRT_HI_PACK overrides: 0 = off everywhere, 6 = six-product pack,
# 9 = nine-product, 62 = six products as two single-K-tile dots
# (a compiler-behavior probe; no measured advantage over 6/9).
_HI_PACK_ENV = _os.environ.get("TTIRT_HI_PACK", "")

# TTIRT_HI_ORTHO=1 enables the orthonormal-core serveb path ('hi'
# factor family): prep right-orthogonalizes the cores against the
# trapezoid weights (Q_k = L_k^{-1} C_k L_{k+1}, f64), so the forward
# prefix update is a 2-point readout of the conditional matrix v
# instead of the (Mb,n)x(n,r^2) core matmul — the bdot stage (~37% of
# the serveb scan at the d=40 production shape) disappears.
# Orthonormality (sum_x w2 Q Q^T = I) bounds the Q rows, so the f32
# carry has RELATIVE eps error along every direction — the same basis
# the reference's QR marginalization samples in (tt_irt_sqr.m:63-80).
#
# OPT-IN, measured SLOWER on v5e (6.30 vs 4.43 ms/dim at the d=40
# production shape, benchmarks/probe_ortho2.py): with a second
# consumer of v, XLA stops fusing the conditional square-sum into the
# vdot epilogue and materializes v for two full reads (+~2.4 GB/dim),
# outweighing the ~1.7 GB/dim the removed bdot chain saves.  Kept as
# the numerically-preferred basis for a future fused (Pallas)
# post-vdot stage, where the single-read structure is exactly what
# VMEM residency wants.  See BENCH_NOTES round 3.
# (knob resolution lives in ops/pallas_plan.kernel_plan — the single
# decision point for the opt-in Pallas/basis family, with the measured
# A/B table that keeps every kernel opt-in)


def _hi_pack() -> int:
    """Resolved pack width: 0 = unpacked HIGHEST matmuls.

    Defaults on ONLY for TPU-class backends: the bit-split pack's
    entire rationale is TPU MXU K-tiling, and its correctness depends
    on the TPU compiler's bf16-propagation behavior (validated on v5e;
    see _bf16_split_f32).  Other accelerators (GPU) get the unpacked
    HIGHEST path unless TTIRT_HI_PACK forces the pack."""
    if _HI_PACK_ENV:
        if _HI_PACK_ENV in ("0", "false"):
            return 0
        if _HI_PACK_ENV in ("9", "62"):
            return int(_HI_PACK_ENV)
        return 6
    return 9 if jax.default_backend() == "tpu" else 0


def _bf16_split_f32(v):
    """Round f32 to the nearest bf16-representable f32 (half away from
    zero) via integer bits, plus the exact f32 residual.

    WHY BITS AND NOT CASTS: the TPU compiler's bf16 propagation pass
    demotes ``x - f32(bf16(x))`` to bf16 arithmetic whenever the
    residual's consumers are bf16-typed — which makes every residual
    EXACTLY ZERO under jit and silently collapses any software
    split-precision scheme into a single-pass bf16 matmul (measured:
    fk rel err 1.1e-2, identical for 6-product, 9-product, and
    separate-dots variants, = the DEFAULT-precision error; even
    optimization_barrier does not stop it).  Bitcast + integer
    mask/round leaves no f32->bf16 convert in the graph, so the pass
    has nothing to latch onto; the same probe then measures 6.7e-7
    (vs 3.6e-7 for Precision.HIGHEST).  See BENCH_NOTES round 3,
    'hi-pack'."""
    vb = jax.lax.bitcast_convert_type(v, jnp.uint32)
    hb = ((vb + jnp.asarray(0x8000, jnp.uint32))
          & jnp.asarray(0xFFFF0000, jnp.uint32))
    h32 = jax.lax.bitcast_convert_type(hb, jnp.float32)
    return h32, v - h32


def _to_bf16_bits(a32):
    """Exact f32 -> bf16 reinterpret for values already rounded to
    bf16 precision (low 16 mantissa bits zero)."""
    return jax.lax.bitcast_convert_type(
        (jax.lax.bitcast_convert_type(a32, jnp.uint32) >> 16)
        .astype(jnp.uint16), jnp.bfloat16)


def _bf16_parts3(x):
    """Split f32 into three bf16 parts with x = h + m + l held exactly
    in f32 (verified recon error 0.0 under jit on v5e); see
    _bf16_split_f32 for why this must use integer bit manipulation."""
    x = x.astype(jnp.float32)
    h32, r1 = _bf16_split_f32(x)
    m32, r2 = _bf16_split_f32(r1)
    l32, _ = _bf16_split_f32(r2)
    return _to_bf16_bits(h32), _to_bf16_bits(m32), _to_bf16_bits(l32)


def _pack6_lhs(a):
    """(..., K) -> (..., 6K) bf16: the left operand of the K-packed
    HIGHEST-equivalent matmul (see _pack6_rhs)."""
    ah, am, al = _bf16_parts3(a)
    return jnp.concatenate([ah, ah, am, am, ah, al], axis=-1)


def _pack9_lhs(a):
    """(..., K) -> (..., 9K) bf16: left operand of the FULL-product
    pack (see _pack9_rhs)."""
    ah, am, al = _bf16_parts3(a)
    return jnp.concatenate([ah, ah, am, am, ah, al, am, al, al],
                           axis=-1)


def _pack9_rhs(b):
    """(..., K, N) -> (..., 9K, N) bf16: ALL NINE products of the
    exact 3-way bf16 splits a = ah+am+al, b = bh+bm+bl (the bit-split
    represents any normal f32 exactly — verified recon error 0.0 on
    v5e).  Unlike the 6-product pack, nothing above ~2^-33 relative
    is dropped, so the only error left is the f32 accumulation itself
    — the same floor the hardware HIGHEST passes have.  Cost:
    ceil(9K/128) MXU K-tiles per dot — at the production r=23
    contraction, 9K = 207 <= 2 tiles, i.e. the SAME cost as the
    6-product pack and ~3x fewer passes than HIGHEST; at K=n=33,
    9K = 297 -> 3 tiles (2x fewer).  Measured (v5e, d=40/n=33/r=23,
    2^18 rows): 0.630 s vs 0.945 s unpacked HIGHEST — 1.5x — at
    stress parity 1.11e-7 vs 6.84e-8.  Ordering is
    big-products-first (hh, hm, mh, mm, hl, lh, ml, lm, ll) so
    sequential accumulation adds small corrections to a settled
    partial sum."""
    bh, bm, bl = _bf16_parts3(b)
    return jnp.concatenate([bh, bm, bh, bm, bl, bh, bl, bm, bl],
                           axis=-2)


def _pack6_rhs(b):
    """(..., K, N) -> (..., 6K, N) bf16 such that

        dot(_pack6_lhs(a), _pack6_rhs(b)) = sum of the six significant
        bf16 split products  ah bh + ah bm + am bh + am bm + ah bl
        + al bh  (each term representable to ~2^-24 relative),
        accumulated in f32 by ONE MXU dot.

    Why: an f32 HIGHEST matmul runs as multiple MXU passes; at the IRT
    hot-loop shapes the contraction depth is K = r or n (23-33), so
    each pass uses <= 26% of the systolic array's K=128 dimension.
    Packing six split products along K instead (K -> 6K = 138-198,
    1-2 MXU tiles) performs the analogous MACs at ~3x the K
    utilization.  The split MUST be the integer bit-split
    (_bf16_split_f32) — a cast-based split is zeroed by the TPU
    compiler's bf16 propagation.  Prefer _pack9_rhs (the default):
    same measured speed, strictly smaller representation error."""
    bh, bm, bl = _bf16_parts3(b)
    return jnp.concatenate([bh, bm, bh, bm, bl, bh], axis=-2)


def can_use_scan(tt: TT, grids, dsample: int) -> bool:
    n0 = grids[0].shape[0]
    return (dsample == tt.d
            and all(g.shape[0] == n0 for g in grids)
            and all(c.shape[1] == n0 for c in tt.cores)
            and tt.cores[0].shape[0] == 1
            and tt.cores[-1].shape[2] == 1)


def stack_padded(tt: TT, grids):
    """Zero-pad all cores to (rmax, n, rmax) and stack: (d, r, n, r);
    stack grids to (d, n)."""
    rmax = max(max(c.shape[0], c.shape[2]) for c in tt.cores)
    cores = []
    for c in tt.cores:
        r1, n, r2 = c.shape
        cp = jnp.zeros((rmax, n, rmax), c.dtype)
        cp = cp.at[:r1, :, :r2].set(c)
        cores.append(cp)
    cstack = jnp.stack(cores, axis=0)
    xstack = jnp.stack([jnp.asarray(g) for g in grids], axis=0)
    return cstack, xstack


def _trapz_w2(hstack):
    """Composite trapezoid weights from the spacing rows."""
    return 0.5 * jnp.concatenate([hstack[:, 1:2],
                                  hstack[:, 1:-1] + hstack[:, 2:],
                                  hstack[:, -1:]], axis=1)


def _prepare_scan(cstack, xstack, stable: bool = False):
    """Backward semi-marginalization as a reversed scan (Gram form).

    Two carries for the integral over x_{>k}:
    * stable=True: the reference's thin R factor via QR
      (tt_irt_sqr.m:63-80) — full working precision even when the
      semi-marginals are ill-conditioned (concentrated late DIRT
      levels), but QR inside the device program is pathologically slow
      to compile on TPU;
    * stable=False: carry the Gram matrix G = R R^T directly — exact in
      exact arithmetic, squares the condition number; used on TPU where
      the sampler runs in reduced precision anyway ('hi'/'ds' instead
      carry the f64 Gram + Cholesky, see _prepare_scan_factor).
    The caller picks by backend."""
    d, r, n, _ = cstack.shape
    hstack = jax.vmap(_grid_spacings)(xstack)              # (d, n)
    w2 = _trapz_w2(hstack)                                 # (d, n)

    if stable:
        def body(rfac, inp):
            core, w2k = inp                                # (r,n,r), (n,)
            b = jnp.einsum("anb,bc->anc", core, rfac,
                           precision=_HI)                  # (r, n, r)
            pk = jnp.einsum("anc,bnc->abn", b, b, precision=_HI)
            wb = b * jnp.sqrt(w2k)[None, :, None]
            mat = jnp.reshape(wb, (r, n * r)).T
            # Rank padding (stack_padded) leaves exact-zero columns in
            # `mat`, so R is singular and the QR *backward* rule (which
            # divides by diag(R)) emits NaN cotangents that poison every
            # core gradient.  Append an eps*I block scaled to the matrix:
            # the Gram (and hence the primal) moves by eps^2 ~ 1e-28
            # relative — far below f64 resolution — while diag(R) >= eps
            # keeps the VJP finite (eps must clear ~1e-15 relative:
            # smaller values overflow inside the triple-product backward
            # and reintroduce the NaNs; measured 1e-30 fails, 1e-15 ok).
            scale_in = jnp.maximum(jnp.max(jnp.abs(mat)), 1e-300)
            eps_rows = (1e-14 * scale_in) * jnp.eye(r, dtype=mat.dtype)
            mat = jnp.concatenate([mat, eps_rows], axis=0)
            rnew = jnp.linalg.qr(mat)[1].T                 # (r, r)
            scale = jnp.maximum(jnp.max(jnp.abs(rnew)), 1e-300)
            return rnew / scale, pk

        init = jnp.eye(r, dtype=cstack.dtype)
    else:
        def body(gram, inp):
            core, w2k = inp                                # (r,n,r), (n,)
            t = jnp.einsum("anc,cd->and", core, gram, precision=_HI)
            pk = jnp.einsum("and,bnd->abn", t, core, precision=_HI)
            gnew = jnp.einsum("abn,n->ab", pk, w2k, precision=_HI)
            gnew = 0.5 * (gnew + gnew.T)
            # renormalize: the conditional CDFs are normalized row-wise,
            # so the carried scale is arbitrary; without this the product
            # over d dims overflows the f32 exponent range that TPU f64
            # emulation (f32-pair arithmetic) is limited to.
            scale = jnp.maximum(jnp.max(jnp.abs(gnew)), 1e-300)
            return gnew / scale, pk

        init = jnp.eye(r, dtype=cstack.dtype)

    rev = (jnp.flip(cstack, 0), jnp.flip(w2, 0))
    _, p_rev = jax.lax.scan(body, init, rev)
    return jnp.flip(p_rev, 0), hstack                      # (d, r, r, n)


def _prepare_scan_factor(cstack, xstack, ortho: bool = False):
    """Backward semi-marginalization in FACTOR form, f64 throughout.

    Carries the suffix Gram G_k in f64 and emits the per-dim factor
    B_k(j) = C_k(j) @ L_k with G_k = L_k L_k^T (Cholesky) — the scan
    analog of the reference's QR-marginalization (tt_irt_sqr.m:63-80).
    The forward pass then evaluates the conditional as a positive sum
    of squares ||phi @ B_k(j)||^2, which keeps the RELATIVE error of
    low-density tails at the working-precision floor instead of the
    absolute floor the Gram form has.  Cost: d Cholesky factorizations
    of r x r — negligible even under TPU f64 emulation.

    ``ortho=True`` emits the weighted-right-orthonormal cores
    Q_k = L_k^{-1} B_k instead (sum_x w2[x] Q_k(x) Q_k(x)^T = I up to
    the Cholesky jitter): the forward carry is then psi_k = phi_k L_k
    and the prefix update is psi_k = la*v[i0] + lb*v[i0+1], a 2-point
    readout of the conditional matrix v = psi_{k-1} Q_k — no second
    core matmul per dim (see _step_factor_ob).  Conditionals and
    samples are identical in exact arithmetic (per-dim scalar factors
    cancel in the normalized CDF)."""
    cstack = cstack.astype(jnp.float64)
    xstack = xstack.astype(jnp.float64)
    d, r, n, _ = cstack.shape
    hstack = jax.vmap(_grid_spacings)(xstack)
    w2 = _trapz_w2(hstack)
    eye = jnp.eye(r, dtype=jnp.float64)

    def chol_jittered(gram):
        # The gram is PSD by construction (a sum of weighted outer
        # products), but accumulated rounding can push trailing
        # eigenvalues of a rank-deficient gram below -1e-14*diag and
        # NaN the factorization (observed with degenerate rank-1 cores
        # padded to full rank).  Tiered jitter: try 1e-14 (exact-level,
        # covers padded zero lanes), escalate to 1e-10 / 1e-6 only when
        # the smaller factorization is non-finite — perturbing only
        # eigendirections that carry <=1e-6 of the mass.  eigh-free:
        # the axon TPU backend cannot compile eigh (BENCH_NOTES).
        dmax = jnp.max(jnp.diagonal(gram))
        ls = [jnp.linalg.cholesky(gram + (e * dmax + 1e-290) * eye)
              for e in (1e-14, 1e-10, 1e-6)]
        out = ls[-1]
        for cand in ls[-2::-1]:
            out = jnp.where(jnp.all(jnp.isfinite(cand)), cand, out)
        return out

    def body(gram, inp):
        core, w2k = inp                                    # (r,n,r), (n,)
        # padded lanes carry exact-zero diagonal: jitter keeps the
        # Cholesky finite there; the factor columns stay exactly zero
        # because the padded core columns are zero.
        lfac = chol_jittered(gram)
        b = jnp.einsum("anc,cd->and", core, lfac)          # (r, n, r)
        gnew = jnp.einsum("anc,bnc,n->ab", b, b, w2k)
        gnew = 0.5 * (gnew + gnew.T)
        scale = jnp.maximum(jnp.max(jnp.abs(gnew)), 1e-300)
        gnew = gnew / scale
        if ortho:
            # Q_k = L_k^{-1} B_k (padded lanes stay exactly zero: their
            # B rows and L off-diagonals are zero).  The prefix scale
            # factors sqrt(scale_k) cancel in the normalized CDF.
            lnew = chol_jittered(gnew)
            out = jnp.reshape(
                jax.scipy.linalg.solve_triangular(
                    lnew, jnp.reshape(b, (r, n * r)), lower=True),
                (r, n, r))
        else:
            out = b
        return gnew, out

    rev = (jnp.flip(cstack, 0), jnp.flip(w2, 0))
    _, b_rev = jax.lax.scan(body, eye, rev)
    return jnp.flip(b_rev, 0), hstack                      # (d, r, n, r)


def _prepare_scan_lin(cstack, xstack):
    """Backward trapezoid integration for the linear (density) sampler."""
    d, r, n, _ = cstack.shape
    hstack = jax.vmap(_grid_spacings)(xstack)

    def body(pprev, inp):
        core, hk = inp
        b = jnp.einsum("anb,b->an", core, pprev,
                       precision=_HI)                      # (r, n)
        pnext = jnp.sum(0.5 * (b[:, :-1] + b[:, 1:]) * hk[1:], axis=1)
        # scale-invariant renormalization (see _prepare_scan)
        scale = jnp.maximum(jnp.max(jnp.abs(pnext)), 1e-300)
        return pnext / scale, b

    e0 = jnp.zeros((r,), cstack.dtype).at[0].set(1.0)
    rev = (jnp.flip(cstack, 0), jnp.flip(hstack, 0))
    _, p_rev = jax.lax.scan(body, e0, rev)
    return jnp.flip(p_rev, 0), hstack                      # (d, r, n)


def _cdf_invert(mode, n, fk, xp, h, qp):
    """Shared CDF build + bracket locate + quadratic solve, in fk's
    dtype (the promoted precision).  Gather-free: TPU gathers over a
    middle axis are ~10x slower than dense one-hot contractions, so the
    bracket index comes from a count reduction and bracket values from
    one-hot row dots.

    TWO-SIDED inversion: seeds past the median invert against the
    right-tail mass (a reversed cumsum of only-small terms) instead of
    ``q - C(x)`` with C near 1.  The one-sided form amplifies the
    CDF's absolute rounding floor by 1/f(x) in the far tail — the
    condition number of the map is intrinsic, but summing from the
    near side keeps the perturbation at eps * (local tail mass), so
    the realized error stays ~eps * (tail decay length) even where
    f ~ 1e-11 (observed: a 1.7e-4 one-sided outlier at d=40 collapses
    to the working-precision floor).  Returns (out, dlf, la, lb, oh0,
    oh1)."""
    cdt = fk.dtype
    dc = 0.5 * (fk[..., :-1] + fk[..., 1:]) * h[1:]        # (Mb, n-1)
    total = jnp.sum(dc, axis=-1, keepdims=True)
    # degenerate rows (no mass) fall back to the uniform density on the
    # grid box (reference zero-fix, tt_irt_lin.m:94-100)
    bad = total <= 0.0
    dc = jnp.where(bad, (xp[1:] - xp[:-1])[None, :], dc)
    fk = jnp.where(bad, jnp.ones_like(fk), fk)
    total = jnp.sum(dc, axis=-1, keepdims=True)
    dc = dc / total
    fk = fk / total
    zero = jnp.zeros(fk.shape[:-1] + (1,), cdt)
    ck = jnp.concatenate([zero, jnp.cumsum(dc, axis=-1)], axis=-1)
    # right-tail mass at each node, summed from the right
    cr = jnp.concatenate([jnp.flip(jnp.cumsum(jnp.flip(dc, -1), -1), -1),
                          zero], axis=-1)                  # (Mb, n)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
    if mode == "rt":
        below = (xp[None, :] < qp[:, None]).astype(jnp.int32)
        # exclude the last point so i0 <= n-2
        i0 = jnp.clip(jnp.sum(below[:, :], axis=1) - 1, 0, n - 2)
    else:
        right = qp > 0.5
        below = (ck < qp[:, None]).astype(jnp.int32)
        i0l = jnp.sum(below, axis=1) - 1
        above = (cr > (1.0 - qp)[:, None]).astype(jnp.int32)
        i0r = jnp.sum(above, axis=1) - 1
        i0 = jnp.clip(jnp.where(right, i0r, i0l), 0, n - 2)
    oh0 = (iota == i0[:, None]).astype(cdt)                # (Mb, n)
    oh1 = (iota == (i0 + 1)[:, None]).astype(cdt)
    c1 = jnp.sum(ck * oh0, axis=1)
    cr2 = jnp.sum(cr * oh1, axis=1)
    f1 = jnp.sum(fk * oh0, axis=1)
    f2 = jnp.sum(fk * oh1, axis=1)
    x1 = jnp.sum(xp[None, :] * oh0, axis=1)
    x2 = jnp.sum(xp[None, :] * oh1, axis=1)
    if mode == "rt":
        xk = qp
        aq = 0.5 * (f2 - f1) / (x2 - x1)
        cl_ = aq * (xk - x1) ** 2 + f1 * (xk - x1) + c1
        # mirrored evaluation from the right for the upper half
        yk = x2 - xk
        cr_ = 1.0 - (f2 * yk - aq * yk * yk + cr2)
        out = jnp.where(cl_ > 0.5, cr_, cl_)
    else:
        xl_ = _invert_quadratic(f1, f2, c1, qp, x1, x2)
        # mirror: invert the reflected cell for mass-from-the-right
        xr_ = -_invert_quadratic(f2, f1, cr2, 1.0 - qp, -x2, -x1)
        xk = jnp.where(right, xr_, xl_)
        out = xk
    la = (x2 - xk) / (x2 - x1)
    lb = (xk - x1) / (x2 - x1)
    dlf = jnp.log(f1 * la + f2 * lb)
    return out, dlf, la, lb, i0, oh0, oh1


import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=32)
def _tri_mats(nm1: int):
    """0/1 triangular cumsum matrices (numpy: trace-safe constants).
    L[j, i] = 1 for j <= i (prefix sums), U[j, i] = 1 for j >= i
    (suffix sums).  A cumsum as ``dc @ L`` is numerically EQUIVALENT to
    the sequential cumsum — unit multipliers make every product exact
    and the MXU accumulates in f32 — while replacing the multi-pass
    cumsum/flip chains with one matmul each (measured: the CDF stage of
    the serve-shape step drops substantially, BENCH_NOTES r03)."""
    idx = _np.arange(nm1)
    lmat = (idx[:, None] <= idx[None, :]).astype(_np.float32)
    umat = (idx[:, None] >= idx[None, :]).astype(_np.float32)
    return lmat, umat


def _cdf_invert_serve(mode, n, fk, xp, h32, qp):
    """Two-sided CDF inversion with pure-f32 rows and f64 restricted to
    the per-sample bracket scalars — the serve-speed variant of
    ``_cdf_invert_fast`` without the double-single cumsums.

    Why f32 rows are enough here: the TWO-SIDED scheme always sums the
    CDF from the near side, so the absolute rounding floor of a bracket
    value is ~eps_f32 * (mass on the near side of the bracket), and the
    within-cell solve error stays at ~1e-6-7 of a cell width everywhere
    — tails included (the deep-tail seeds are the WELL-conditioned case
    for near-side summation).  The ds-cumsum path ('hid') keeps the
    2^-48 row precision for parity-critical work; this path trades ~5x
    row-precision slack (still under the 1e-6-scale bar, verified in
    tests/test_precision.py) for removing the associative-scan op soup
    that dominates the deep-serve step (~58% measured, BENCH_NOTES
    r03).  Cumsums run as 0/1 triangular MXU matmuls (exact, see
    _tri_mats).  Returns f64 scalars like _cdf_invert_fast."""
    lmat, umat = _tri_mats(n - 1)
    dc = 0.5 * (fk[..., :-1] + fk[..., 1:]) * h32[1:]      # (Mb, n-1)
    total = jnp.sum(dc, axis=-1, keepdims=True)
    bad = total <= 0.0
    dc = jnp.where(bad, h32[1:], dc)
    fk = jnp.where(bad, jnp.ones_like(fk), fk)
    zero = jnp.zeros(fk.shape[:-1] + (1,), fk.dtype)
    ck = jnp.concatenate(
        [zero, jnp.matmul(dc, jnp.asarray(lmat), precision=_HI)],
        axis=-1)                                           # (Mb, n)
    cr = jnp.concatenate(
        [jnp.matmul(dc, jnp.asarray(umat), precision=_HI), zero],
        axis=-1)                                           # (Mb, n)
    tot = ck[:, -1].astype(jnp.float64)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    xp32 = xp.astype(jnp.float32)
    xplo = (xp - xp32.astype(jnp.float64)).astype(jnp.float32)
    if mode == "rt":
        qp32 = qp.astype(jnp.float32)
        below = (xp32[None, :] < qp32[:, None]).astype(jnp.int32)
        i0 = jnp.clip(jnp.sum(below, axis=1) - 1, 0, n - 2)
        right = jnp.zeros(qp.shape, bool)
        qt = ut = jnp.zeros_like(qp)
    else:
        right = qp > 0.5
        qt = qp * tot
        ut = (1.0 - qp) * tot
        qt32 = qt.astype(jnp.float32)
        ut32 = ut.astype(jnp.float32)
        i0l = jnp.sum((ck < qt32[:, None]).astype(jnp.int32), axis=1) - 1
        i0r = jnp.sum((cr > ut32[:, None]).astype(jnp.int32), axis=1) - 1
        i0 = jnp.clip(jnp.where(right, i0r, i0l), 0, n - 2)
    oh0 = (iota == i0[:, None]).astype(jnp.float32)        # (Mb, n)
    oh1 = (iota == (i0 + 1)[:, None]).astype(jnp.float32)

    def read64(rows, oh):
        # one exact nonzero term per row: the f32->f64 cast is exact
        return jnp.sum(rows * oh, axis=1).astype(jnp.float64)

    c1 = read64(ck, oh0)
    cr2 = read64(cr, oh1)
    f1 = read64(fk, oh0)
    f2 = read64(fk, oh1)
    x1 = read64(xp32[None, :], oh0) + read64(xplo[None, :], oh0)
    x2 = read64(xp32[None, :], oh1) + read64(xplo[None, :], oh1)
    if mode == "rt":
        xk = qp
        yk = x2 - xk
        aq = 0.5 * (f2 - f1) / (x2 - x1)
        cl_ = aq * (xk - x1) ** 2 + f1 * (xk - x1) + c1
        cr_ = tot - (f2 * yk - aq * yk * yk + cr2)
        out = jnp.where(cl_ > 0.5 * tot, cr_, cl_) / tot
    else:
        xl_ = _invert_quadratic(f1, f2, c1, qt, x1, x2)
        xr_ = -_invert_quadratic(f2, f1, cr2, ut, -x2, -x1)
        xk = jnp.where(right, xr_, xl_)
        out = xk
    la = (x2 - xk) / (x2 - x1)
    lb = (xk - x1) / (x2 - x1)
    dlf = jnp.log(f1 * la + f2 * lb) - jnp.log(tot)
    return out, dlf, la, lb, i0, oh0, oh1


def _cdf_invert_fast(mode, n, fk, xp, h32, qp):
    """Two-sided CDF inversion with f32 + double-single row work and
    f64 restricted to per-sample (Mb,) vectors.

    Emulated f64 on TPU costs ~10x per element; the (Mb, n) CDF rows
    are the bulk, so they run in f32 with compensated (double-single,
    ~2^-48) cumsums — the same effective precision as the emulated-f64
    path — and the one-hot bracket reads are error-free by
    construction.  Only the ~10 per-sample scalars (bracket values,
    quadratic solve, log-density) are promoted to f64.

    fk: (Mb, n) f32, unnormalized, nonnegative.  xp: (n,) f64 grid.
    h32: (n,) f32 spacings.  qp: (Mb,) f64 seeds (x values for 'rt').
    Returns (out, dlf, la, lb, oh0, oh1) with f64 scalars and f32
    one-hots."""
    dc = 0.5 * (fk[..., :-1] + fk[..., 1:]) * h32[1:]      # (Mb, n-1)
    total = jnp.sum(dc, axis=-1, keepdims=True)
    # degenerate rows (no mass) fall back to the uniform density on the
    # grid box (reference zero-fix, tt_irt_lin.m:94-100)
    bad = total <= 0.0
    dc = jnp.where(bad, h32[1:], dc)
    fk = jnp.where(bad, jnp.ones_like(fk), fk)
    ch, cl = ds_cumsum(dc, axis=-1)                        # (Mb, n-1)
    zero = jnp.zeros(fk.shape[:-1] + (1,), fk.dtype)
    ckh = jnp.concatenate([zero, ch], axis=-1)
    ckl = jnp.concatenate([zero, cl], axis=-1)
    crh_, crl_ = ds_cumsum(jnp.flip(dc, -1), axis=-1)
    crh = jnp.concatenate([jnp.flip(crh_, -1), zero], axis=-1)
    crl = jnp.concatenate([jnp.flip(crl_, -1), zero], axis=-1)
    tot = (ckh[:, -1].astype(jnp.float64)
           + ckl[:, -1].astype(jnp.float64))               # (Mb,)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
    xp32 = xp.astype(jnp.float32)
    xplo = (xp - xp32.astype(jnp.float64)).astype(jnp.float32)
    if mode == "rt":
        qp32 = qp.astype(jnp.float32)
        below = (xp32[None, :] < qp32[:, None]).astype(jnp.int32)
        # exclude the last point so i0 <= n-2
        i0 = jnp.clip(jnp.sum(below, axis=1) - 1, 0, n - 2)
        right = jnp.zeros(qp.shape, bool)
        qt = ut = jnp.zeros_like(qp)
    else:
        right = qp > 0.5
        qt = qp * tot
        ut = (1.0 - qp) * tot
        qth, qtl = ds_from_f64(qt)
        uth, utl = ds_from_f64(ut)
        # lexicographic ds compare: pairs are normalized (|lo| <= ulp(hi))
        ltl = (ckh < qth[:, None]) | ((ckh == qth[:, None])
                                      & (ckl < qtl[:, None]))
        i0l = jnp.sum(ltl.astype(jnp.int32), axis=1) - 1
        gtr = (crh > uth[:, None]) | ((crh == uth[:, None])
                                      & (crl > utl[:, None]))
        i0r = jnp.sum(gtr.astype(jnp.int32), axis=1) - 1
        i0 = jnp.clip(jnp.where(right, i0r, i0l), 0, n - 2)
    oh0 = (iota == i0[:, None]).astype(jnp.float32)        # (Mb, n)
    oh1 = (iota == (i0 + 1)[:, None]).astype(jnp.float32)

    def read_ds(hpart, lpart, oh):
        # one-hot row dots are error-free: exactly one nonzero term
        return (jnp.sum(hpart * oh, axis=1).astype(jnp.float64)
                + jnp.sum(lpart * oh, axis=1).astype(jnp.float64))

    c1 = read_ds(ckh, ckl, oh0)
    cr2 = read_ds(crh, crl, oh1)
    f1 = jnp.sum(fk * oh0, axis=1).astype(jnp.float64)
    f2 = jnp.sum(fk * oh1, axis=1).astype(jnp.float64)
    x1 = read_ds(xp32[None, :], xplo[None, :], oh0)
    x2 = read_ds(xp32[None, :], xplo[None, :], oh1)
    if mode == "rt":
        xk = qp
        yk = x2 - xk
        aq = 0.5 * (f2 - f1) / (x2 - x1)
        cl_ = aq * (xk - x1) ** 2 + f1 * (xk - x1) + c1
        cr_ = tot - (f2 * yk - aq * yk * yk + cr2)
        out = jnp.where(cl_ > 0.5 * tot, cr_, cl_) / tot
    else:
        # unnormalized solve: density, mass and targets share the scale
        xl_ = _invert_quadratic(f1, f2, c1, qt, x1, x2)
        xr_ = -_invert_quadratic(f2, f1, cr2, ut, -x2, -x1)
        xk = jnp.where(right, xr_, xl_)
        out = xk
    la = (x2 - xk) / (x2 - x1)
    lb = (xk - x1) / (x2 - x1)
    dlf = jnp.log(f1 * la + f2 * lb) - jnp.log(tot)
    return out, dlf, la, lb, i0, oh0, oh1


def _step(mode, n, cdf_dtype, carry, inp):
    """One dimension of the transform, Gram form (f64/f32/mixed).

    ``cdf_dtype`` lets the CDF build + inversion run at higher precision
    than the bulk contractions; the prefix conditioning runs as an
    interpolation-matrix matmul against the unfolded core."""
    phi, lf = carry                                        # (Mb, r), (Mb,)
    pk, core, x, h, qk = inp
    mb, r = phi.shape
    cdt = pk.dtype  # contraction dtype (may be lower than the carry's)
    if mode == "lin":
        fk = jnp.abs(jnp.matmul(phi.astype(cdt), pk,
                                precision=_HI))            # (Mb, n)
    else:
        # outer product in the carry precision, matmul in cdt: the
        # MXU matmul dominates cost; the f64 outer product is small
        g = (phi[:, :, None] * phi[:, None, :]).reshape(mb, r * r)
        fk = jnp.matmul(g.astype(cdt), jnp.reshape(pk, (r * r, n)),
                        precision=_HI)                     # (Mb, n)
    # ---- CDF build + inversion (possibly promoted precision) ----
    if cdt == jnp.float32 and cdf_dtype == jnp.float64:
        # 'mixed': f32 rows + compensated cumsums + f64 scalars
        out, dlf, la, lb, _, oh0, oh1 = _cdf_invert_fast(
            mode, n, jnp.maximum(fk, 0.0), x.astype(jnp.float64),
            h.astype(jnp.float32), qk.astype(jnp.float64))
    else:
        fk = fk.astype(cdf_dtype)
        xp = x.astype(cdf_dtype)
        qp = qk.astype(cdf_dtype)
        out, dlf, la, lb, _, oh0, oh1 = _cdf_invert(
            mode, n, fk, xp, h.astype(cdf_dtype), qp)
    lf = lf + dlf.astype(lf.dtype)
    # prefix conditioning via the interpolation matrix:
    # W (Mb, n) with la at i0 and lb at i0+1; B = W @ unfold(core).
    w = (la[:, None].astype(cdt) * oh0.astype(cdt)
         + lb[:, None].astype(cdt) * oh1.astype(cdt))
    core_mat = jnp.reshape(jnp.transpose(core, (1, 0, 2)), (n, r * r))
    b = jnp.reshape(jnp.matmul(w, core_mat, precision=_HI),
                    (mb, r, r)).astype(phi.dtype)
    phi = jnp.einsum("mi,mij->mj", phi, b, precision=_HI)
    # per-sample renormalization: the conditional is scale-invariant and
    # the running product would overflow the f32 exponent range of TPU
    # f64 emulation over many dims.
    scale = jnp.maximum(jnp.max(jnp.abs(phi), axis=1, keepdims=True),
                        jnp.asarray(1e-30, phi.dtype))
    phi = phi / scale
    return (phi, lf), out


def _step_factor(mode, n, cdfk, packed, carry, inp):
    """One dimension, factor form in f32 ('hi'/'hid'): the conditional
    is the positive square-sum fk = ||phi @ B_k(j)||^2 —
    cancellation-free, so tail relative error sits at ~eps/sqrt(rho)
    instead of the Gram form's eps/rho.  CDF bracket scalars in f64;
    rows per ``cdfk`` ('serve' = f32 matmul-cumsums, 'ds' =
    double-single).  ``packed``: 0 = HIGHEST matmuls; 6/9 = operands
    arrive K-packed (_pack6_rhs/_pack9_rhs) and both big matmuls run
    as single K-packed bf16 dots (opt-in, see _hi_pack)."""
    phi, lf = carry                                        # (Mb, r) f32
    bmat, cmat, x, h, qk = inp             # (r, n*r), (n, r*r) unfolded
    mb, r = phi.shape
    plhs = _pack9_lhs if packed == 9 else _pack6_lhs

    def pdot(a_packed, b_packed, nseg):
        if packed == 62:
            # two dots of 3 packed segments each (<= 128 K-lanes at
            # the production r/n), summed in f32 — isolates the
            # packed scheme from any cross-K-tile partial handling
            # inside a single multi-tile bf16 dot
            k3 = (a_packed.shape[-1] // nseg) * (nseg // 2)
            return (jnp.dot(a_packed[..., :k3], b_packed[:k3],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(a_packed[..., k3:], b_packed[k3:],
                              preferred_element_type=jnp.float32))
        return jnp.dot(a_packed, b_packed,
                       preferred_element_type=jnp.float32)

    nseg = 9 if packed == 9 else 6
    if packed:
        v = pdot(plhs(phi), bmat, nseg)                    # (Mb, n*r)
    else:
        v = jnp.matmul(phi, bmat, precision=_HI)           # (Mb, n*r)
    v = jnp.reshape(v, (mb, n, r))
    fk = jnp.sum(v * v, axis=2)                            # (Mb, n) f32
    invert = _cdf_invert_serve if cdfk == "serve" else _cdf_invert_fast
    out, dlf, la, lb, _, oh0, oh1 = invert(
        mode, n, fk, x, h.astype(jnp.float32), qk)
    lf = lf + dlf
    w = (la[:, None].astype(jnp.float32) * oh0
         + lb[:, None].astype(jnp.float32) * oh1)
    if packed:
        b = jnp.reshape(pdot(plhs(w), cmat, nseg), (mb, r, r))
    else:
        b = jnp.reshape(jnp.matmul(w, cmat, precision=_HI), (mb, r, r))
    phi = jnp.einsum("mi,mij->mj", phi, b, precision=_HI)
    scale = jnp.maximum(jnp.max(jnp.abs(phi), axis=1, keepdims=True),
                        jnp.asarray(1e-30, phi.dtype))
    phi = phi / scale
    return (phi, lf), out


def _step_ds(mode, n, carry, inp):
    """One dimension, factor form with double-single carries ('ds').

    The prefix interface phi and the interpolated core product are
    carried as unevaluated f32 pairs (~2^-48 relative), so conditioning
    error does not accumulate across the d dims; each big contraction
    is 2-3 HIGHEST-precision MXU matmuls plus O(Mb n r) VPU
    compensation ops.  The residual error floor is the f32 accumulation
    inside the hi@hi matmul."""
    (phh, phl), lf = carry                                 # (Mb, r) x2
    bh, bl, ch, cl, x, h, qk = inp                         # b* (r, n*r)
    mb, r = phh.shape
    # v = phi @ B in double-single (split product; the dominant term's
    # own accumulation error is the mode's floor)
    v1 = jnp.matmul(phh, bh, precision=_HI)                # (Mb, n*r)
    v2 = jnp.matmul(phh, bl, precision=_HI) + \
        jnp.matmul(phl, bh, precision=_HI)
    vh, vl = two_sum(v1, v2)
    vh = jnp.reshape(vh, (mb, n, r))
    vl = jnp.reshape(vl, (mb, n, r))
    sqh, sql = ds_mul(vh, vl, vh, vl)
    fh, fl = ds_sum_pairwise(sqh, sql, axis=2)
    fk = ds_to_f64(fh, fl)                                 # (Mb, n)
    out, dlf, la, lb, _, oh0, oh1 = _cdf_invert(mode, n, fk, x, h, qk)
    lf = lf + dlf
    # interpolation weights exact in ds (la/lb are f64)
    w64 = la[:, None] * oh0 + lb[:, None] * oh1            # (Mb, n) f64
    wh, wl = ds_from_f64(w64)
    b1 = jnp.matmul(wh, ch, precision=_HI)                 # (Mb, r*r)
    b2 = jnp.matmul(wh, cl, precision=_HI) + \
        jnp.matmul(wl, ch, precision=_HI)
    bh2, bl2 = two_sum(b1, b2)
    bh2 = jnp.reshape(bh2, (mb, r, r))
    bl2 = jnp.reshape(bl2, (mb, r, r))
    # phi_new = phi @ b as a ds-compensated batched matvec (r is small:
    # O(Mb r^2) VPU work)
    ph, pl = ds_mul(phh[:, :, None], phl[:, :, None], bh2, bl2)
    phh, phl = ds_sum_pairwise(ph, pl, axis=1)             # (Mb, r)
    denom = jnp.maximum(jnp.max(jnp.abs(phh), axis=1, keepdims=True),
                        jnp.asarray(1e-30, jnp.float32))
    phh, phl = ds_scale_exact(phh, phl, denom)             # exact: 2^k
    return ((phh, phl), lf), out


def _cdf_rows32(mode, n, fk, x32, xlo, h32, qp32, um32):
    """Pure-f32 CDF rows + bracket + one-hot readout + f32 weight solve
    — the in-scan half of the BATCHED-epilogue serve path ('serveb').

    Emits the 9 bracket scalars (c1, cr2, f1, f2, x1h, x1l, x2h, x2l,
    tot) per sample for the f64 epilogue that runs ONCE for all dims
    after the scan (_serve_solve), plus f32 interpolation weights
    (la, lb) and the bracket one-hots for the in-scan prefix update.
    No f64 (TPU-emulated) arithmetic remains in the scan body: the
    weights come from an f32 citardauq solve, which perturbs the
    CONDITIONING point by ~1e-7 of a cell — the same class as the f64
    path's own cast of la/lb to f32 before the prefix matmul.  The
    OUTPUT samples and log-density still come from the f64 epilogue.

    Bracket targets are formed as qp32*tot32 (one extra f32 rounding
    vs the f64-product-then-round of _cdf_invert_serve): a <=1-cell
    bracket shift at rounding-boundary seeds, with consistent one-hot
    readouts and a clipped in-cell solve — within the mode's error
    budget (pinned by tests/test_precision.py).  um32 = f32(1 - qp)
    is rounded from the f64 seed so right-tail targets keep full f32
    RELATIVE precision."""
    lmat, umat = _tri_mats(n - 1)
    dc = 0.5 * (fk[..., :-1] + fk[..., 1:]) * h32[1:]      # (Mb, n-1)
    total = jnp.sum(dc, axis=-1, keepdims=True)
    bad = total <= 0.0
    dc = jnp.where(bad, h32[1:], dc)
    fk = jnp.where(bad, jnp.ones_like(fk), fk)
    zero = jnp.zeros(fk.shape[:-1] + (1,), fk.dtype)
    ck = jnp.concatenate(
        [zero, jnp.matmul(dc, jnp.asarray(lmat), precision=_HI)],
        axis=-1)                                           # (Mb, n)
    cr = jnp.concatenate(
        [jnp.matmul(dc, jnp.asarray(umat), precision=_HI), zero],
        axis=-1)                                           # (Mb, n)
    tot = ck[:, -1]                                        # (Mb,) f32
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    if mode == "rt":
        below = (x32[None, :] < qp32[:, None]).astype(jnp.int32)
        i0 = jnp.clip(jnp.sum(below, axis=1) - 1, 0, n - 2)
        right = jnp.zeros(qp32.shape, bool)
        qt = ut = jnp.zeros_like(qp32)
    else:
        right = qp32 > 0.5
        qt = qp32 * tot
        ut = um32 * tot
        i0l = jnp.sum((ck < qt[:, None]).astype(jnp.int32), axis=1) - 1
        i0r = jnp.sum((cr > ut[:, None]).astype(jnp.int32), axis=1) - 1
        i0 = jnp.clip(jnp.where(right, i0r, i0l), 0, n - 2)
    oh0 = (iota == i0[:, None]).astype(jnp.float32)        # (Mb, n)
    oh1 = (iota == (i0 + 1)[:, None]).astype(jnp.float32)

    def read(rows, oh):
        return jnp.sum(rows * oh, axis=1)                  # (Mb,) f32

    c1 = read(ck, oh0)
    cr2 = read(cr, oh1)
    f1 = read(fk, oh0)
    f2 = read(fk, oh1)
    x1 = read(x32[None, :], oh0)
    x2 = read(x32[None, :], oh1)
    out9 = jnp.stack(
        [c1, cr2, f1, f2, x1, read(xlo[None, :], oh0), x2,
         read(xlo[None, :], oh1), tot], axis=1)            # (Mb, 9)
    # f32 weight solve for the prefix conditioning only
    if mode == "rt":
        xk = qp32
    else:
        xl_ = _invert_quadratic(f1, f2, c1, qt, x1, x2)
        xr_ = -_invert_quadratic(f2, f1, cr2, ut, -x2, -x1)
        xk = jnp.where(right, xr_, xl_)
    la = jnp.clip((x2 - xk) / (x2 - x1), 0.0, 1.0)
    return out9, oh0, oh1, la, 1.0 - la


def _step_gram_b(mode, n, carry, inp):
    """Gram-form serveb step ('gs'): the conditional is ONE matmul
    fk = (phi (x) phi) @ P against the precomputed Gram semi-marginals
    — no (Mb, n*r) conditional matrix v is ever materialized, cutting
    the per-dim HBM traffic from ~3.5 GB (factor form: v write+read
    1.6 GB + b 1.1 GB + packs) to ~2.3 GB (g 1.1 GB + b 1.1 GB).
    Numerics: the Gram product squares the condition number, so tail
    conditionals carry ABSOLUTE error at the f32 matmul floor
    (~eps * max fk) — the 'f32'/'mixed' tail class, not 'hi''s
    eps/sqrt(rho); rows/brackets run the serve-CDF scheme and the
    within-cell solve is the batched ds epilogue (_serve_solve_ds).
    Measured (d=40 stress + lz40n33 14-level N/ESS): statistically
    indistinguishable from 'hi' AND full f64.  Pinned by
    tests/test_precision.py.

    ON-CHIP VERDICT (v5e, lz40n33 production shape, round 4): 8.07
    ms/dim vs the factor serveb's 5.41 — SLOWER despite ~35% less
    nominal traffic, because XLA materializes the (Mb, r, r) outer
    product with its r=23 trailing axis lane-padded to 128 (a ~5x
    byte blowup), while the factor form's (Mb, n*r = 759) stays
    ~lane-aligned.  Kept as the measured negative result that pins
    why the factor form is the production path; 'gs' is a sound
    (quality == 'hi') alternative on CPU."""
    phi = carry                                            # (Mb, r) f32
    pmat, cmat, x32, xlo, h32, qp32, um32 = inp
    mb, r = phi.shape
    g = jnp.reshape(phi[:, :, None] * phi[:, None, :], (mb, r * r))
    fk = jnp.maximum(jnp.matmul(g, pmat, precision=_HI), 0.0)
    out9, oh0, oh1, la, lb = _cdf_rows32(mode, n, fk, x32, xlo, h32,
                                         qp32, um32)
    w = la[:, None] * oh0 + lb[:, None] * oh1
    b = jnp.reshape(jnp.matmul(w, cmat, precision=_HI), (mb, r, r))
    phi = jnp.einsum("mi,mij->mj", phi, b, precision=_HI)
    scale = jnp.maximum(jnp.max(jnp.abs(phi), axis=1, keepdims=True),
                        jnp.asarray(1e-30, phi.dtype))
    phi = phi / scale
    return phi, out9


def _step_factor_b(mode, n, packed, carry, inp):
    """_step_factor with the f64 epilogue REMOVED from the scan: one
    dimension's f32 row work emits the bracket scalars as a scan output
    and the batched f64 solve runs once after the scan (_fwd 'serveb').
    The scan body is then f32/bf16-only — at the d=40 production shape
    the serialized per-dim emulated-f64 tail was ~28% of the step
    (BENCH_NOTES round-3 decomposition)."""
    phi = carry                                            # (Mb, r) f32
    bmat, cmat, x32, xlo, h32, qp32, um32 = inp
    mb, r = phi.shape
    plhs = _pack9_lhs if packed == 9 else _pack6_lhs
    if packed:
        v = jnp.dot(plhs(phi), bmat,
                    preferred_element_type=jnp.float32)    # (Mb, n*r)
    else:
        v = jnp.matmul(phi, bmat, precision=_HI)
    v = jnp.reshape(v, (mb, n, r))
    fk = jnp.sum(v * v, axis=2)                            # (Mb, n) f32
    out9, oh0, oh1, la, lb = _cdf_rows32(mode, n, fk, x32, xlo, h32,
                                         qp32, um32)
    w = la[:, None] * oh0 + lb[:, None] * oh1
    if packed:
        b = jnp.reshape(jnp.dot(plhs(w), cmat,
                                preferred_element_type=jnp.float32),
                        (mb, r, r))
    else:
        b = jnp.reshape(jnp.matmul(w, cmat, precision=_HI), (mb, r, r))
    phi = jnp.einsum("mi,mij->mj", phi, b, precision=_HI)
    scale = jnp.maximum(jnp.max(jnp.abs(phi), axis=1, keepdims=True),
                        jnp.asarray(1e-30, phi.dtype))
    phi = phi / scale
    return phi, out9


def _step_factor_ob(mode, n, packed, carry, inp):
    """_step_factor_b on weighted-right-orthonormal cores (ortho prep,
    _prepare_scan_factor(ortho=True)): the carried interface is
    psi_k = phi_k L_k, so the prefix update is the 2-point readout
    psi = la*v[i0] + lb*v[i0+1] of the already-computed conditional
    matrix v — the (Mb,n)x(n,r^2) core matmul, its bf16 packing and
    the (Mb,r,r)-batched prefix einsum (the 'bdot' stage, ~37% of the
    serveb scan at the d=40 production shape, BENCH_NOTES round 3) all
    disappear.  Orthonormality keeps ||Q rows|| bounded, so the f32
    psi carry has relative-eps error in every direction regardless of
    the suffix-Gram condition number (measured up to 5e12 on the
    shipped lz40n33 checkpoint)."""
    psi = carry                                            # (Mb, r) f32
    qmat, x32, xlo, h32, qp32, um32 = inp
    mb, r = psi.shape
    plhs = _pack9_lhs if packed == 9 else _pack6_lhs
    if packed:
        v = jnp.dot(plhs(psi), qmat,
                    preferred_element_type=jnp.float32)    # (Mb, n*r)
    else:
        v = jnp.matmul(psi, qmat, precision=_HI)
    v = jnp.reshape(v, (mb, n, r))
    fk = jnp.sum(v * v, axis=2)                            # (Mb, n) f32
    out9, oh0, oh1, la, lb = _cdf_rows32(mode, n, fk, x32, xlo, h32,
                                         qp32, um32)
    w = la[:, None] * oh0 + lb[:, None] * oh1              # (Mb, n)
    # 2-point readout as an explicit mapped reduce: einsum here emits
    # a dot_general with batch=Mb, M=1 — a pathological MXU shape —
    # while mul+sum fuses into one VPU pass over v
    psi = jnp.sum(w[:, :, None] * v, axis=1)               # (Mb, r)
    scale = jnp.maximum(jnp.max(jnp.abs(psi), axis=1, keepdims=True),
                        jnp.asarray(1e-30, psi.dtype))
    psi = psi / scale
    return psi, out9


def _step_factor_fused(mode, n, carry, inp):
    """_step_factor with the two big contractions fused into Pallas
    kernels (ops/pallas_step.py): the (Mb, n*r) factor product and the
    (Mb, r^2) interpolated-core product stay in VMEM — the XLA path
    round-trips ~2.2 GB/dim through HBM at the d=40 production shape."""
    from ..ops.pallas_step import condition_update, factor_conditional

    phi, lf = carry                                        # (Mb, r) f32
    bmat, cmat, x, h, qk = inp
    fk = factor_conditional(phi, bmat)                     # (Mb, n) f32
    out, dlf, la, lb, i0, _, _ = _cdf_invert_serve(
        mode, n, fk, x, h.astype(jnp.float32), qk)
    lf = lf + dlf
    phi = condition_update(phi, i0, la.astype(jnp.float32),
                           lb.astype(jnp.float32), cmat)
    return (phi, lf), out


# Serve-epilogue arithmetic: 'ds' (default) runs the within-cell
# quadratic inversion in double-single f32 pairs (~2^-47, well under
# the 1e-5 'hi' parity bar) with the log-density in f32; 'f64' keeps
# the emulated-f64 epilogue.  The f64 epilogue was measured at
# ~0.059 s/level-block at the lz40n33 production shape — ~25% of the
# serve forward and NOT bandwidth-bound (BENCH_NOTES round-3 stage
# attribution); the ds version is pure VPU f32 (VERDICT r03 task 2a).
_SERVE_EPI_ENV = _os.environ.get("TTIRT_SERVE_EPI", "ds")

# Per-dim log-density precision of the ds epilogue.  The interpolated-
# density RATIO is f32-exact to ~1e-7 relative either way; the LOG is
# the accuracy-limiting op: XLA:TPU lowers f32 log to an approximate
# polynomial, and the on-chip r04 suite measured the all-f32 tail at
# dl ~5.9e-4 on the d=40 stress map (~1.5e-5 abs/term) — 6x past the
# 1e-4 'hi' band that the same tests met at r03 with the f64 log
# (TPU_SUITE_r04.json: the 4 failures are all this clause; CPU's
# correctly-rounded f32 log passes the band).  Default 'ds' takes the
# log in double-single f32 (ops/doublesingle.ds_log32: exact frexp
# split + ds atanh series, ~2e-14 relative) — same accuracy class as
# the emulated-f64 log with none of its emulated transcendental chain.
# TTIRT_SERVE_DLF=f64 selects the emulated-f64 log (the r04 hotfix
# path, 67a57d4); =f32 re-enables the all-f32 tail for workloads that
# only consume samples.
_SERVE_DLF = _os.environ.get("TTIRT_SERVE_DLF", "ds")
if _SERVE_DLF not in ("ds", "f64", "f32"):
    import warnings as _warnings

    _warnings.warn(
        f"TTIRT_SERVE_DLF={_SERVE_DLF!r} is not one of 'ds'/'f64'/'f32'"
        " — falling back to the default 'ds' log path", stacklevel=2)
    _SERVE_DLF = "ds"


def _dlf_log(num32, tot32):
    ratio = num32 / tot32
    if _SERVE_DLF == "f32":
        return jnp.log(ratio)
    if _SERVE_DLF == "f64":
        return jnp.log(ratio.astype(jnp.float64))
    from ..ops.doublesingle import ds_log32, ds_to_f64

    # ds_log32 keeps documented FTZ semantics (-inf for subnormal
    # input); a subnormal RATIO on a non-FTZ backend (CPU) would then
    # diverge from the f64 path's finite ~-90 and can turn downstream
    # log-density differences (MH acceptance) into (-inf)-(-inf)=NaN
    # (ADVICE r04).  Rescale subnormal ratios by 2^24 — exact on CPU,
    # where it matters — and subtract 24*ln2 after the log.  On TPU
    # arithmetic is DAZ, so the scaled value flushes to zero and the
    # result stays -inf exactly as every other path treats it.
    from jax import lax

    bits = lax.bitcast_convert_type(ratio, jnp.int32)
    subn = ((bits & 0x7F800000) == 0) & ((bits & 0x007FFFFF) != 0)
    r2 = jnp.where(subn, ratio * jnp.float32(16777216.0), ratio)
    out = ds_to_f64(*ds_log32(r2))
    return jnp.where(subn, out - 24.0 * 0.6931471805599453, out)


def _ds_lex_lt(ah, al, bh, bl):
    """Lexicographic < on normalized double-single pairs."""
    return (ah < bh) | ((ah == bh) & (al < bl))


def _invert_quadratic_ds(fa, fb, th, tl, uah, ual, ubh, ubl):
    """Citardauq quadratic-CDF inversion (see irt._invert_quadratic)
    in double-single f32: solve A(x-ua)^2 + fa (x-ua) = t on [ua, ub]
    with A = (fb-fa)/(2(ub-ua)).  fa/fb are exact f32 (the CDF rows'
    dtype); t, ua, ub arrive as ds pairs.  ~2^-47 relative — the same
    class as the emulated-f64 path against the 1e-5 parity bar."""
    from ..ops.doublesingle import (ds_add, ds_div, ds_mul, ds_sqrt,
                                    ds_sub, two_prod)

    zero = jnp.zeros_like(fa)
    h3h, h3l = ds_sub(ubh, ubl, uah, ual)
    aqh, aql = ds_div(0.5 * (fb - fa), zero, h3h, h3l)
    # dq = fa^2 + 4 aq t  (fa^2 error-free via two_prod)
    ph, pl = two_prod(fa, fa)
    qth, qtl = ds_mul(aqh, aql, th, tl)
    dqh, dql = ds_add(ph, pl, 4.0 * qth, 4.0 * qtl)
    neg = dqh < 0.0
    dqh = jnp.where(neg, 0.0, dqh)
    dql = jnp.where(neg, 0.0, dql)
    sh, sl = ds_sqrt(dqh, dql)
    denh, denl = ds_add(fa, zero, sh, sl)
    bad = denh <= 0.0
    denh = jnp.where(bad, 1.0, denh)
    denl = jnp.where(bad, 0.0, denl)
    rh, rl = ds_div(2.0 * th, 2.0 * tl, denh, denl)
    xkh, xkl = ds_add(uah, ual, rh, rl)
    xkh = jnp.where(bad, uah, xkh)
    xkl = jnp.where(bad, ual, xkl)
    # clip into [ua, ub] (component-wise where keeps pairs normalized)
    lt = _ds_lex_lt(xkh, xkl, uah, ual)
    xkh = jnp.where(lt, uah, xkh)
    xkl = jnp.where(lt, ual, xkl)
    gt = _ds_lex_lt(ubh, ubl, xkh, xkl)
    xkh = jnp.where(gt, ubh, xkh)
    xkl = jnp.where(gt, ubl, xkl)
    return xkh, xkl


def _serve_solve_ds(mode, out9, qp):
    """Double-single serve epilogue: numerically the ds twin of
    ``_serve_solve``.  The log-density takes the ratio's log in
    double-single f32 by default (_SERVE_DLF='ds', ops/doublesingle.
    ds_log32 at ~2e-14 relative; 'f64'/'f32' env overrides keep the
    r04 hotfix path and the all-f32 tail — the f32 tail met the 1e-4
    band on CPU's correctly-rounded log but measured dl ~6e-4 on-chip,
    where XLA lowers f32 log approximately).  All other
    (Mb,)-vector arithmetic is f32 VPU work; the only f64 ops left
    are the seed split and the final sample reconstruction (one
    convert + add each)."""
    from ..ops.doublesingle import (ds_add, ds_div, ds_from_f64,
                                    ds_mul, ds_sub, ds_to_f64, two_sum)

    c1 = out9[:, 0]
    cr2 = out9[:, 1]
    f1 = out9[:, 2]
    f2 = out9[:, 3]
    x1h, x1l = out9[:, 4], out9[:, 5]
    x2h, x2l = out9[:, 6], out9[:, 7]
    tot = out9[:, 8]
    qh, ql = ds_from_f64(qp)
    zero = jnp.zeros_like(qh)
    if mode == "rt":
        # forward Rosenblatt: evaluate the CDF at x = qp
        xkh, xkl = qh, ql
        ykh, ykl = ds_sub(x2h, x2l, xkh, xkl)     # x2 - x
        dxh, dxl = ds_sub(xkh, xkl, x1h, x1l)     # x - x1
        h3h, h3l = ds_sub(x2h, x2l, x1h, x1l)
        aqh, aql = ds_div(0.5 * (f2 - f1), zero, h3h, h3l)
        # cl = aq dx^2 + f1 dx + c1
        t1h, t1l = ds_mul(dxh, dxl, dxh, dxl)
        t1h, t1l = ds_mul(aqh, aql, t1h, t1l)
        t2h, t2l = ds_mul(f1, zero, dxh, dxl)
        clh, cll = ds_add(t1h, t1l, t2h, t2l)
        clh, cll = ds_add(clh, cll, c1, zero)
        # cr = tot - (f2 yk - aq yk^2 + cr2)
        u1h, u1l = ds_mul(f2, zero, ykh, ykl)
        u2h, u2l = ds_mul(ykh, ykl, ykh, ykl)
        u2h, u2l = ds_mul(aqh, aql, u2h, u2l)
        sh_, sl_ = ds_sub(u1h, u1l, u2h, u2l)
        sh_, sl_ = ds_add(sh_, sl_, cr2, zero)
        crh, crl = ds_sub(tot, zero, sh_, sl_)
        use_r = clh > 0.5 * tot
        oh = jnp.where(use_r, crh, clh)
        ol = jnp.where(use_r, crl, cll)
        outh, outl = ds_div(oh, ol, tot, zero)
        out = ds_to_f64(outh, outl)
        lah = (x2h - qh) / (x2h - x1h)
        lbh = 1.0 - lah
        dlf = _dlf_log(f1 * lah + f2 * lbh, tot)
        return out, dlf, lah, lbh
    # inverse Rosenblatt: selector must equal the in-scan f32 choice
    right = qh > 0.5
    # t = target - bracket mass, both sides built from the near tail
    umh, uml = two_sum(jnp.ones_like(qh), -qh)
    uml = uml - ql                                 # 1 - q in ds
    tgh = jnp.where(right, umh, qh)
    tgl = jnp.where(right, uml, ql)
    tth, ttl = ds_mul(tgh, tgl, tot, zero)
    ca = jnp.where(right, cr2, c1)
    th, tl = ds_sub(tth, ttl, ca, zero)
    fa = jnp.where(right, f2, f1)
    fb = jnp.where(right, f1, f2)
    uah = jnp.where(right, -x2h, x1h)
    ual = jnp.where(right, -x2l, x1l)
    ubh = jnp.where(right, -x1h, x2h)
    ubl = jnp.where(right, -x1l, x2l)
    xsh, xsl = _invert_quadratic_ds(fa, fb, th, tl, uah, ual, ubh, ubl)
    xkh = jnp.where(right, -xsh, xsh)
    xkl = jnp.where(right, -xsl, xsl)
    out = ds_to_f64(xkh, xkl)
    # log-density in f32: la/lb from ds numerator (x2 - xk cancels when
    # xk -> x2; the ds subtract keeps la's ABSOLUTE error ~2^-24 of a
    # cell, so the f-interp error stays ~eps * |f2 - f1|)
    nh, _nl = ds_sub(x2h, x2l, xkh, xkl)
    la32 = jnp.clip(nh / (x2h - x1h), 0.0, 1.0)
    lb32 = 1.0 - la32
    # dlf: double-single log of the f32 ratio by default (see
    # _SERVE_DLF above — the all-f32 tail measured 6e-4 on lfapp
    # on-chip, past the 1e-4 'hi' band); TTIRT_SERVE_DLF=f64 keeps the
    # emulated-f64 log, =f32 the log-free-of-f64 tail when only
    # samples are consumed.
    dlf = _dlf_log(f1 * la32 + f2 * lb32, tot)
    return out, dlf, la32, lb32


def _serve_solve(mode, out9, i0, qp):
    """f64 epilogue of the whole-dim CDF kernel
    (ops/pallas_step.cdf_bracket_factor): the within-cell quadratic
    inversion on (Mb,) vectors only — the same tail as
    _cdf_invert_serve after its one-hot readout.  Dispatches to the
    double-single variant (_serve_solve_ds) unless TTIRT_SERVE_EPI=f64
    — the emulated-f64 version was ~25% of a serve level-block on v5e
    and not bandwidth-bound (BENCH_NOTES r03 attribution)."""
    if _SERVE_EPI_ENV != "f64":
        return _serve_solve_ds(mode, out9, qp)
    f64 = jnp.float64
    c1 = out9[:, 0].astype(f64)
    cr2 = out9[:, 1].astype(f64)
    f1 = out9[:, 2].astype(f64)
    f2 = out9[:, 3].astype(f64)
    x1 = out9[:, 4].astype(f64) + out9[:, 5].astype(f64)
    x2 = out9[:, 6].astype(f64) + out9[:, 7].astype(f64)
    tot = out9[:, 8].astype(f64)
    if mode == "rt":
        xk = qp
        yk = x2 - xk
        aq = 0.5 * (f2 - f1) / (x2 - x1)
        cl_ = aq * (xk - x1) ** 2 + f1 * (xk - x1) + c1
        cr_ = tot - (f2 * yk - aq * yk * yk + cr2)
        out = jnp.where(cl_ > 0.5 * tot, cr_, cl_) / tot
    else:
        # selector must match the in-kernel/in-scan f32 bracket choice
        # exactly at rounding-boundary seeds (qp in (0.5, 0.5 + 2^-25)
        # rounds to f32 0.5): derive it from the same f32 value
        right = qp.astype(jnp.float32) > 0.5
        # select the one-sided solve's OPERANDS instead of computing
        # both solves: the emulated-f64 sqrt/div chain in
        # _invert_quadratic is the expensive part of this epilogue
        # (~25% of a serve level was epilogue+fixed costs), and the
        # where-merge is bitwise identical to solving both sides
        ta = jnp.where(right, (1.0 - qp) * tot, qp * tot)
        fa = jnp.where(right, f2, f1)
        fb = jnp.where(right, f1, f2)
        ca = jnp.where(right, cr2, c1)
        ua = jnp.where(right, -x2, x1)
        ub = jnp.where(right, -x1, x2)
        xs_ = _invert_quadratic(fa, fb, ca, ta, ua, ub)
        xk = jnp.where(right, -xs_, xs_)
        out = xk
    inv21 = 1.0 / (x2 - x1)
    la = (x2 - xk) * inv21
    lb = (xk - x1) * inv21
    dlf = jnp.log((f1 * la + f2 * lb) / tot)
    return out, dlf, la, lb


def _step_factor_fused2(mode, n, carry, inp):
    """One dimension with the ENTIRE f32 row space — conditional
    product, two-sided trapezoid CDF, bracket locate, one-hot readout —
    in a single Pallas kernel (cdf_bracket_factor), so no (Mb, n*r) or
    (Mb, n) array reaches HBM; the f64 work runs on (Mb,) vectors in
    XLA (_serve_solve) and the prefix update is the fused
    condition_update kernel.  TTIRT_FUSED_STEP=2."""
    from ..ops.pallas_step import cdf_bracket_factor, condition_update

    phi, lf = carry                                        # (Mb, r) f32
    bmat, cmat, dmat, hrow, xg, qk = inp
    out9, i0 = cdf_bracket_factor(
        phi, qk.astype(jnp.float32), bmat, dmat, hrow, xg,
        mode="rt" if mode == "rt" else "irt")
    out, dlf, la, lb = _serve_solve(mode, out9, i0, qk)
    lf = lf + dlf
    phi = condition_update(phi, i0, la.astype(jnp.float32),
                           lb.astype(jnp.float32), cmat)
    return (phi, lf), out


def _step_gram_fused(mode, n, cdf_dtype, carry, inp):
    """_step (Gram form, f32/mixed) with fused Pallas contractions."""
    from ..ops.pallas_step import condition_update, gram_conditional

    phi, lf = carry                                        # (Mb, r) f32
    pmat, cmat, x, h, qk = inp                # (r*r, n), (n, r*r)
    fk = gram_conditional(phi, pmat)                       # (Mb, n)
    if cdf_dtype == jnp.float64:
        out, dlf, la, lb, i0, _, _ = _cdf_invert_fast(
            mode, n, jnp.maximum(fk, 0.0), x.astype(jnp.float64),
            h.astype(jnp.float32), qk.astype(jnp.float64))
    else:
        out, dlf, la, lb, i0, _, _ = _cdf_invert(
            mode, n, fk.astype(cdf_dtype), x.astype(cdf_dtype),
            h.astype(cdf_dtype), qk.astype(cdf_dtype))
    lf = lf + dlf.astype(lf.dtype)
    phi = condition_update(phi, i0, la.astype(jnp.float32),
                           lb.astype(jnp.float32), cmat)
    return (phi, lf), out


_PRECISIONS = {
    # name -> (contraction dtype, CDF dtype, family, CDF kernel)
    # CDF kernel: 'plain' = _cdf_invert in the CDF dtype; 'ds' =
    # _cdf_invert_fast (double-single rows, ~2^-48); 'serve' =
    # _cdf_invert_serve (f32 rows via triangular-matmul cumsums + f64
    # bracket scalars — the deep-serve fast path, ~5x looser rows but
    # still under the 1e-6-scale bar; see its docstring).
    "f64": ("float64", "float64", "gram", "plain"),
    "f32": ("float32", "float32", "gram", "plain"),
    "mixed": ("float32", "float64", "gram", "ds"),
    "hi": ("float32", "float64", "factor",
           _os.environ.get("TTIRT_HI_CDF", "serveb")),
    "hid": ("float32", "float64", "factor", "ds"),
    "ds": ("float32", "float64", "ds", "plain"),
    # 'gs' = gram-serveb: one (Mb, r^2) @ (r^2, n) conditional matmul
    # (no v materialization, ~2.3 GB/dim vs the factor form's ~3.5),
    # serve-CDF rows, batched ds epilogue.  Tail class = gram
    # ('f32'/'mixed'), NOT 'hi' — see _step_gram_b.
    "gs": ("float32", "float64", "gramb", "serveb"),
}
# TTIRT_HI_CDF: 'serveb' (default — batched f64 epilogue after an
# f32-only scan), 'serve' (per-dim f64 bracket scalars in-loop), or
# 'ds' (double-single rows, == 'hid').


def _family(mode, precision):
    """The kernel family actually used: 'lin' has no factor analog."""
    fam = _PRECISIONS[precision][2]
    return "gram" if mode == "lin" else fam


def _use_fused(mode, precision) -> int:
    """Fused Pallas per-dim kernel level (0 = XLA path): applies to the
    f32-contraction sqr/rt paths (ops/pallas_step.py; Mosaic has no
    f64).  Level 2 (whole-dim CDF kernel) exists for the factor family
    only; gram clamps to level 1.  All Pallas/basis knobs resolve in
    ONE place: ops/pallas_plan.kernel_plan (which also carries the
    measured A/B table that keeps every kernel opt-in)."""
    from ..ops.pallas_plan import kernel_plan

    cdt, _, fam, _cdfk = _PRECISIONS[precision]
    lvl = kernel_plan().fused
    if not (lvl and cdt == "float32" and mode in ("sqr", "rt")
            and fam in ("gram", "factor")):
        return 0
    return min(lvl, 2 if fam == "factor" else 1)


def _ortho_applies(mode, precision, fused) -> bool:
    """The orthonormal-core serve path replaces the factor family
    exactly where the batched-epilogue ('serveb') branch runs; the
    merged Pallas dim kernel and the two-stream/fused variants keep
    the raw-core factor operands.  The odim kernel (fused post-vdot
    whole-dim kernel, ops/pallas_odim.py) implies this path — that
    kernel exists only on the orthonormal basis.  Knob resolution:
    ops/pallas_plan.kernel_plan."""
    from ..ops.pallas_plan import kernel_plan

    _, _, fam, cdfk = _PRECISIONS[precision]
    plan = kernel_plan()
    return (fam == "factor" and mode in ("sqr", "rt")
            and plan.ortho
            and cdfk == "serveb" and not fused and _STREAMS != 2
            and _hi_pack() != 62 and not plan.dim_kernel)


def _prep(mode, cstack, xstack, precision, stable, fused=False):
    """Backward preparation; returns the pytree the forward pass scans
    over (everything except the per-block seeds)."""
    cdt, pdt, _, _cdfk = _PRECISIONS[precision]
    family = _family(mode, precision)
    if family == "gramb":
        # Gram semi-marginals prepared in f64, downcast to f32 for the
        # single conditional matmul; cores unfolded like the factor
        # serveb path (the prefix update is identical).
        pstack, hstack = _prepare_scan(cstack.astype(jnp.float64),
                                       xstack.astype(jnp.float64),
                                       stable=stable)
        d, r, n = cstack.shape[0], cstack.shape[1], cstack.shape[2]
        pmat = jnp.reshape(pstack, (d, r * r, n)).astype(jnp.float32)
        cmat = jnp.reshape(jnp.transpose(cstack.astype(jnp.float32),
                                         (0, 2, 1, 3)), (d, n, r * r))
        return (pmat, cmat, xstack.astype(jnp.float64),
                hstack.astype(jnp.float64))
    if family == "gram":
        cs = cstack.astype(cdt)
        xs = xstack.astype(pdt)
        if mode == "lin":
            pstack, hstack = _prepare_scan_lin(cs, xstack.astype(cdt))
        else:
            pstack, hstack = _prepare_scan(cs, xstack.astype(cdt),
                                           stable=stable)
        if fused:
            # packed operands for the fused Pallas step: P as (r*r, n),
            # the core unfolded as (n, r*r)
            d, r, n, _ = cs.shape
            pmat = jnp.reshape(pstack, (d, r * r, n))
            cmat = jnp.reshape(jnp.transpose(cs, (0, 2, 1, 3)),
                               (d, n, r * r))
            return (pmat, cmat, xs, hstack.astype(pdt))
        return (pstack, cs, xs, hstack.astype(pdt))
    # factor families prepare in f64 and downcast the emitted factor
    if family == "factor" and _ortho_applies(mode, precision, fused):
        qstack, hstack = _prepare_scan_factor(cstack, xstack,
                                              ortho=True)
        d, r, n, _ = qstack.shape
        qmat = jnp.reshape(qstack, (d, r, n * r)).astype(jnp.float32)
        pw = _hi_pack()
        if pw and (precision == "hi" or _HI_PACK_ENV):
            pk = _pack9_rhs if pw == 9 else _pack6_rhs
            qmat = pk(qmat)
        return (qmat, xstack.astype(jnp.float64),
                hstack.astype(jnp.float64))
    bstack, hstack = _prepare_scan_factor(cstack, xstack)
    d, r, n, _ = bstack.shape
    bmat = jnp.reshape(bstack, (d, r, n * r))
    cmat = jnp.reshape(jnp.transpose(cstack.astype(jnp.float64),
                                     (0, 2, 1, 3)), (d, n, r * r))
    xs = xstack.astype(jnp.float64)
    hs = hstack.astype(jnp.float64)
    if family == "factor":
        bmat32 = bmat.astype(jnp.float32)
        cmat32 = cmat.astype(jnp.float32)
        pw = _hi_pack()
        if pw and not fused and (precision == "hi" or _HI_PACK_ENV):
            # K-packed operands: ONE bf16 dot per big matmul
            # (_pack9_rhs docstring).  Backend-default packing applies
            # to 'hi' only; 'hid' stays unpacked unless TTIRT_HI_PACK
            # forces it, preserving it as the conservative A/B path.
            pk = _pack9_rhs if pw == 9 else _pack6_rhs
            return (pk(bmat32), pk(cmat32), xs, hs)
        return (bmat32, cmat32, xs, hs)
    bh, bl = ds_from_f64(bmat)
    ch, cl = ds_from_f64(cmat)
    return (bh, bl, ch, cl, xs, hs)


def _fwd(mode, precision, prep, q, fused=False):
    """Forward pass over one sample block given prepared marginals."""
    cdt, pdt, _, cdfk = _PRECISIONS[precision]
    family = _family(mode, precision)
    mb = q.shape[0]
    if family == "gramb":
        pmat, cmat, xs, hs = prep
        r = int(round(cmat.shape[2] ** 0.5))
        n = cmat.shape[1]
        x32s = xs.astype(jnp.float32)
        xlos = (xs - x32s.astype(jnp.float64)).astype(jnp.float32)
        h32s = hs.astype(jnp.float32)
        q64 = q.astype(jnp.float64).T                     # (d, mb)
        qp32 = q64.astype(jnp.float32)
        um32 = (1.0 - q64).astype(jnp.float32)
        phi0 = jnp.zeros((mb, r), jnp.float32).at[:, 0].set(1.0)
        _, outs9 = jax.lax.scan(
            partial(_step_gram_b, mode, n), phi0,
            (pmat, cmat, x32s, xlos, h32s, qp32, um32))
        dd = outs9.shape[0]
        out, dlf, _, _ = _serve_solve(
            mode, jnp.reshape(outs9, (dd * mb, 9)), None,
            jnp.reshape(q64, (dd * mb,)))
        lf = jnp.sum(jnp.reshape(dlf, (dd, mb)),
                     axis=0).astype(jnp.float64)
        return jnp.reshape(out, (dd, mb)).T, lf
    if family == "gram":
        if fused:
            pmat, cmat, xs, hs = prep
            d, rr, n = pmat.shape
            r = int(round(rr ** 0.5))
            phi0 = jnp.zeros((mb, r), jnp.float32).at[:, 0].set(1.0)
            lf0 = jnp.zeros((mb,), pdt)
            xsq = (pmat, cmat, xs, hs, q.astype(pdt).T)
            (_, lf), outs = jax.lax.scan(
                partial(_step_gram_fused, mode, n, jnp.dtype(pdt)),
                (phi0, lf0), xsq)
            return outs.T, lf
        pstack, cs, xs, hs = prep
        d, r = cs.shape[0], cs.shape[1]
        n = cs.shape[2]
        # NOTE: the prefix chain stays in the contraction dtype in the
        # gram family.  Promoting it to f64 was measured to cost ~20x
        # on TPU (emulated f64 elementwise); 'ds' carries it as an f32
        # pair instead.
        phi0 = jnp.zeros((mb, r), cs.dtype).at[:, 0].set(1.0)
        lf0 = jnp.zeros((mb,), pdt)
        xsq = (pstack, cs, xs, hs, q.astype(pdt).T)
        (_, lf), outs = jax.lax.scan(
            partial(_step, mode, n, jnp.dtype(pdt)), (phi0, lf0), xsq)
        return outs.T, lf
    if family == "factor" and len(prep) == 3:
        # orthonormal-core serveb path (_ortho_applies): pure f32/bf16
        # scan with the 2-point prefix readout, one f64 epilogue
        qmat, xs, hs = prep
        kr = qmat.shape[1]
        packed = 0
        if qmat.dtype == jnp.bfloat16:
            packed = 9 if _hi_pack() == 9 else 6
            kr //= packed
        r = kr
        n = qmat.shape[2] // r
        x32s = xs.astype(jnp.float32)
        xlos = (xs - x32s.astype(jnp.float64)).astype(jnp.float32)
        h32s = hs.astype(jnp.float32)
        q64 = q.astype(jnp.float64).T                     # (d, mb)
        qp32 = q64.astype(jnp.float32)
        um32 = (1.0 - q64).astype(jnp.float32)
        psi0 = jnp.zeros((mb, r), jnp.float32).at[:, 0].set(1.0)
        from ..ops.pallas_odim import odim_kernel_enabled, odim_step
        if odim_kernel_enabled():
            # fused post-vdot whole-dim kernel: all row intermediates
            # VMEM-resident; only psi + the bracket scalars reach HBM
            xgs = jnp.stack([x32s, xlos], axis=1)         # (d, 2, n)
            hrows = h32s[:, None, 1:]                     # (d, 1, n-1)
            kmode = "rt" if mode == "rt" else "irt"

            def kbody(psi, inp):
                qd, hr, xgd, qk, uk = inp
                return odim_step(psi, qk, uk, qd, hr, xgd, mode=kmode)

            _, outs9 = jax.lax.scan(
                kbody, psi0, (qmat, hrows, xgs, qp32, um32))
        else:
            _, outs9 = jax.lax.scan(
                partial(_step_factor_ob, mode, n, packed), psi0,
                (qmat, x32s, xlos, h32s, qp32, um32))
        dd = outs9.shape[0]
        out, dlf, _, _ = _serve_solve(
            mode, jnp.reshape(outs9, (dd * mb, 9)), None,
            jnp.reshape(q64, (dd * mb,)))
        lf = jnp.sum(jnp.reshape(dlf, (dd, mb)),
                     axis=0).astype(jnp.float64)
        return jnp.reshape(out, (dd, mb)).T, lf
    if family == "factor":
        bmat, cmat, xs, hs = prep
        d = bmat.shape[0]
        # K-packed prep (hi-pack): cmat is (d, pw*n, r*r), so r comes
        # from the unpacked last axis and pw follows from bmat's
        # packed K relative to it (pw in {6, 9}; 1 = unpacked).
        r = int(round(cmat.shape[2] ** 0.5))
        pw = bmat.shape[1] // r
        packed = 0 if bmat.dtype != jnp.bfloat16 else pw
        if packed == 6 and _hi_pack() == 62:
            packed = 62          # same 6K prep, two single-tile dots
        n = cmat.shape[1] // max(pw, 1)
        streams = _STREAMS
        if fused == 2:
            # whole-dim CDF kernel: per-dim trapezoid/grid operands as
            # device stacks the scan can slice (cdf_bracket_factor)
            x32 = xs.astype(jnp.float32)
            xlo = (xs - x32.astype(jnp.float64)).astype(jnp.float32)
            xgs = jnp.stack([x32, xlo], axis=1)            # (d, 2, n)
            e0 = _np.eye(n, n - 1, dtype=_np.float32)
            e1 = _np.eye(n, n - 1, k=-1, dtype=_np.float32)
            hcol = hs[:, None, 1:].astype(jnp.float32)     # (d, 1, n-1)
            dstack = 0.5 * (e0 + e1)[None] * hcol          # (d, n, n-1)
            phi0 = jnp.zeros((mb, r), jnp.float32).at[:, 0].set(1.0)
            lf0 = jnp.zeros((mb,), jnp.float64)
            xsq = (bmat, cmat, dstack, hcol, xgs,
                   q.astype(jnp.float64).T)
            (_, lf), outs = jax.lax.scan(
                partial(_step_factor_fused2, mode, n), (phi0, lf0), xsq)
            return outs.T, lf
        if cdfk == "serveb" and not fused and _STREAMS != 2:
            # Batched-epilogue serve path: the scan body is pure
            # f32/bf16 (emits the 9 bracket scalars per dim), and ONE
            # vectorized f64 solve handles all d dims afterwards —
            # removing the serialized per-dim emulated-f64 tail (~28%
            # of the step at the d=40 production shape, BENCH_NOTES
            # round-3 decomposition).
            x32s = xs.astype(jnp.float32)                 # (d, n)
            xlos = (xs - x32s.astype(jnp.float64)).astype(jnp.float32)
            h32s = hs.astype(jnp.float32)
            q64 = q.astype(jnp.float64).T                 # (d, mb)
            qp32 = q64.astype(jnp.float32)
            um32 = (1.0 - q64).astype(jnp.float32)
            phi0 = jnp.zeros((mb, r), jnp.float32).at[:, 0].set(1.0)
            from ..ops.pallas_dim import (_kernel_pack,
                                          dim_kernel_enabled, dim_step)
            if dim_kernel_enabled() and (packed in (0, 9)):
                # merged per-dim Pallas kernel: all row intermediates
                # VMEM-resident, only phi + the bracket scalars reach
                # HBM (ops/pallas_dim.py)
                bk, ck_ = bmat, cmat
                if packed == 9 and not _kernel_pack():
                    # rebuild the plain f32 operands from the exact
                    # bf16 pack (h + m + l = original, bit-exact):
                    # pack9 row blocks are [h, m, h, m, l, h, l, m, l]
                    def unpack(p9):
                        k1 = p9.shape[1] // 9
                        return (p9[:, :k1].astype(jnp.float32)
                                + p9[:, k1:2 * k1].astype(jnp.float32)
                                + p9[:, 4 * k1:5 * k1]
                                .astype(jnp.float32))
                    bk = unpack(bmat)
                    ck_ = unpack(cmat)
                elif packed == 0 and _kernel_pack():
                    bk = jax.vmap(_pack9_rhs)(bmat)
                    ck_ = jax.vmap(_pack9_rhs)(cmat)
                xgs = jnp.stack([x32s, xlos], axis=1)     # (d, 2, n)
                e0 = _np.eye(n, n - 1, dtype=_np.float32)
                e1 = _np.eye(n, n - 1, k=-1, dtype=_np.float32)
                hcol = h32s[:, None, 1:]                  # (d, 1, n-1)
                dstack = 0.5 * (e0 + e1)[None] * hcol     # (d, n, n-1)
                kmode = "rt" if mode == "rt" else "irt"

                def kbody(phi, inp):
                    bkd, ckd, dm, hr, xgd, qk, uk = inp
                    return dim_step(phi, qk, uk, bkd, ckd, dm, hr, xgd,
                                    mode=kmode)

                _, outs9 = jax.lax.scan(
                    kbody, phi0, (bk, ck_, dstack, hcol, xgs,
                                  qp32, um32))
            else:
                xsq = (bmat, cmat, x32s, xlos, h32s, qp32, um32)
                _, outs9 = jax.lax.scan(
                    partial(_step_factor_b, mode, n, packed), phi0, xsq)
            dd = outs9.shape[0]
            out, dlf, _, _ = _serve_solve(
                mode, jnp.reshape(outs9, (dd * mb, 9)), None,
                jnp.reshape(q64, (dd * mb,)))
            lf = jnp.sum(jnp.reshape(dlf, (dd, mb)),
                     axis=0).astype(jnp.float64)
            return jnp.reshape(out, (dd, mb)).T, lf
        if cdfk == "serveb":
            cdfk = "serve"      # fused / two-stream paths keep the
            # in-loop serve-CDF (same rows, per-dim f64 scalars)
        step = partial(_step_factor_fused, mode, n) if fused \
            else partial(_step_factor, mode, n, cdfk, packed)
        if streams == 2 and not fused and mb % 2 == 0:
            # software pipelining: two independent half-batch chains in
            # one scan body let the XLA scheduler overlap one stream's
            # VPU-bound CDF stage with the other's MXU matmuls (a
            # single chain strictly alternates matmul -> CDF -> matmul,
            # idling each unit half the time).
            h1 = mb // 2
            phi0 = jnp.zeros((h1, r), jnp.float32).at[:, 0].set(1.0)
            lf0 = jnp.zeros((h1,), jnp.float64)
            qT = q.astype(jnp.float64).T                  # (d, mb)

            def step2(carry, inp):
                ca, cb = carry
                bm, cm, xv, hv, qk = inp
                ca2, outa = step(ca, (bm, cm, xv, hv, qk[:h1]))
                cb2, outb = step(cb, (bm, cm, xv, hv, qk[h1:]))
                return (ca2, cb2), (outa, outb)

            ((_, lfa), (_, lfb)), (outa, outb) = jax.lax.scan(
                step2, ((phi0, lf0), (phi0, lf0)),
                (bmat, cmat, xs, hs, qT))
            return (jnp.concatenate([outa.T, outb.T], axis=0),
                    jnp.concatenate([lfa, lfb], axis=0))
        phi0 = jnp.zeros((mb, r), jnp.float32).at[:, 0].set(1.0)
        lf0 = jnp.zeros((mb,), jnp.float64)
        xsq = (bmat, cmat, xs, hs, q.astype(jnp.float64).T)
        (_, lf), outs = jax.lax.scan(step, (phi0, lf0), xsq)
        return outs.T, lf
    bh, bl, ch, cl, xs, hs = prep
    d, r = bh.shape[0], bh.shape[1]
    n = ch.shape[1]
    phh0 = jnp.zeros((mb, r), jnp.float32).at[:, 0].set(1.0)
    phl0 = jnp.zeros((mb, r), jnp.float32)
    lf0 = jnp.zeros((mb,), jnp.float64)
    xsq = (bh, bl, ch, cl, xs, hs, q.astype(jnp.float64).T)
    ((_, _), lf), outs = jax.lax.scan(partial(_step_ds, mode, n),
                                      ((phh0, phl0), lf0), xsq)
    return outs.T, lf


_prep_jit = partial(jax.jit, static_argnames=("mode", "precision",
                                              "stable", "fused"))(
    lambda mode, cstack, xstack, precision, stable, fused=False:
    _prep(mode, cstack, xstack, precision, stable, fused))

_fwd_jit = partial(jax.jit, static_argnames=("mode", "precision",
                                             "fused"))(
    lambda mode, precision, prep, q, fused=False:
    _fwd(mode, precision, prep, q, fused))


@partial(jax.jit, static_argnames=("mode", "precision", "stable",
                                   "fused"))
def _irt_scan_one(mode, cstack, xstack, q, precision="f64",
                  stable=False, fused=False):
    """One-shot scan transform for a single sample block (kept for
    direct use in tests; irt_scan() splits prep from the block loop)."""
    prep = _prep(mode, cstack, xstack, precision, stable, fused)
    return _fwd(mode, precision, prep, q, fused)


@partial(jax.jit, static_argnames=("mode", "precision", "stable",
                                   "fused"))
def _prep_levels_jit(mode, cstacks, xstack, precision, stable,
                     fused=False):
    """Backward preparation vmapped over a stack of L same-shape TTs
    (cstacks: (L, d, r, n, r), shared grids).

    One fused program replaces L separate prep dispatches — the prep is
    overhead-bound (many tiny r x r ops, f64-emulated for the factor
    family: measured 137 ms/level at the lz40n33 shape, i.e. ~2 s of a
    14-level deep serve), and vmapping widens every op by L for ~free.
    Used by the deep-serve fast path (samplers/dirt.py)."""
    return jax.vmap(
        lambda cs: _prep(mode, cs, xstack, precision, stable, fused))(
        cstacks)


def fwd_blocked(mode, precision, prep, q, block, fused=False):
    """Host-side block loop over one compiled forward program (see
    irt_scan); ``prep`` is a prepared-marginal pytree from _prep."""
    m = q.shape[0]
    nb = _num_blocks(m, block)
    if nb <= 1:
        return _fwd_jit(mode, precision, prep, q, fused=fused)
    padded = _pad_rows(q, nb * block)
    xs_parts, lf_parts = [], []
    for b in range(nb):
        xb, lb = _fwd_jit(mode, precision, prep,
                          jax.lax.slice_in_dim(padded, b * block,
                                               (b + 1) * block),
                          fused=fused)
        xs_parts.append(xb)
        lf_parts.append(lb)
    xs = jnp.concatenate(xs_parts, axis=0)[:m]
    lf = jnp.concatenate(lf_parts, axis=0)[:m]
    return xs, lf


def irt_scan(mode, cstack, xstack, q, block, precision="f64"):
    """Blocked scan-based transform, mode in {'sqr','lin','rt'}.

    Preparation (the backward marginalization) runs ONCE; blocking the
    forward pass is a *host-side* loop over equally-shaped slices
    reusing one compiled block program.  (Wrapping the per-dim scan in
    a `lax.map` over blocks — a nested scan — takes the TPU compiler
    from seconds to effectively forever; a dispatch loop costs
    microseconds per block and compiles once for any M.)"""
    # QR-stabilized marginalization off-TPU (see _prepare_scan)
    stable = jax.default_backend() != "tpu"
    fused = _use_fused(mode, precision)
    prep = _prep_jit(mode, cstack, xstack, precision, stable,
                     fused=fused)
    return fwd_blocked(mode, precision, prep, q, block, fused)


def resolved_serve_modes() -> dict:
    """The resolved serve-numerics mode matrix, as actually in force on
    this backend (VERDICT r04 weak #4: bench records must carry the
    env-default matrix their figures depend on — TTIRT_SERVE_DLF went
    f32->f64->ds within one round and made serve numbers incomparable
    from the artifacts alone)."""
    from .reference import _use_poly_map

    return {
        "dlf": _SERVE_DLF,
        "epi": _SERVE_EPI_ENV,
        "hi_pack": _hi_pack(),
        "hi_ortho": bool(_os.environ.get("TTIRT_HI_ORTHO")),
        "tnormal": "poly" if _use_poly_map() else "erf",
        "backend": __import__("jax").default_backend(),
    }
