"""Rank-padded scan fast path for the IRT/RT transforms.

The general path in ``irt.py`` unrolls the d-dimensional recursion
(ranks differ per dim), which makes the XLA program O(d) large — at the
Lorenz-40 stress shape that is minutes of TPU compile time.  Here all TT
ranks are zero-padded to the maximum rank so every dimension has the
same shape, and the whole recursion becomes ONE `lax.scan` body compiled
once.  Zero padding is exact: every contraction is linear in the padded
entries, so the padded lanes contribute nothing.

Bandwidth note: the conditional marginal is computed as
``fk = (phi ⊗ phi) @ P`` — an (Mb, r^2) outer product times an
(r^2, n) matrix — instead of the naive (Mb, r, n) chained einsum.  This
keeps the largest intermediate at O(Mb r^2) instead of O(Mb r n) and
maps the hot op onto a single MXU matmul per dimension.

Used automatically by tt_irt_sqr / tt_irt_lin / tt_rt_sqr when the grid
is uniform across dimensions and the full joint is sampled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.tt import TT
from .irt import (
    _bisect_cdf,
    _fix_degenerate,
    _gather_cols,
    _grid_spacings,
    _invert_quadratic,
    _num_blocks,
    _pad_rows,
    _trapz_cdf,
)

__all__ = ["stack_padded", "irt_scan", "can_use_scan"]


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


def _prepare_scan(cstack, xstack, stable: bool = False):
    """Backward semi-marginalization as a reversed scan.

    Two carries for the integral over x_{>k}:
    * stable=True: the reference's thin R factor via QR
      (tt_irt_sqr.m:63-80) — full working precision even when the
      semi-marginals are ill-conditioned (concentrated late DIRT
      levels), but QR inside the device program is pathologically slow
      to compile on TPU;
    * stable=False: carry the Gram matrix G = R R^T directly — exact in
      exact arithmetic, squares the condition number; used on TPU where
      the sampler runs in reduced precision anyway.
    The caller picks by backend."""
    d, r, n, _ = cstack.shape
    hstack = jax.vmap(_grid_spacings)(xstack)              # (d, n)
    w2 = 0.5 * jnp.concatenate([hstack[:, 1:2],
                                hstack[:, 1:-1] + hstack[:, 2:],
                                hstack[:, -1:]], axis=1)   # (d, n)

    if stable:
        def body(rfac, inp):
            core, w2k = inp                                # (r,n,r), (n,)
            b = jnp.einsum("anb,bc->anc", core, rfac)      # (r, n, r)
            pk = jnp.einsum("anc,bnc->abn", b, b)
            wb = b * jnp.sqrt(w2k)[None, :, None]
            mat = jnp.reshape(wb, (r, n * r)).T
            rnew = jnp.linalg.qr(mat)[1].T                 # (r, r)
            scale = jnp.maximum(jnp.max(jnp.abs(rnew)), 1e-300)
            return rnew / scale, pk

        init = jnp.eye(r, dtype=cstack.dtype)
    else:
        def body(gram, inp):
            core, w2k = inp                                # (r,n,r), (n,)
            t = jnp.einsum("anc,cd->and", core, gram)
            pk = jnp.einsum("and,bnd->abn", t, core)
            gnew = jnp.einsum("abn,n->ab", pk, w2k)
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


def _prepare_scan_lin(cstack, xstack):
    """Backward trapezoid integration for the linear (density) sampler."""
    d, r, n, _ = cstack.shape
    hstack = jax.vmap(_grid_spacings)(xstack)

    def body(pprev, inp):
        core, hk = inp
        b = jnp.einsum("anb,b->an", core, pprev)           # (r, n)
        pnext = jnp.sum(0.5 * (b[:, :-1] + b[:, 1:]) * hk[1:], axis=1)
        # scale-invariant renormalization (see _prepare_scan)
        scale = jnp.maximum(jnp.max(jnp.abs(pnext)), 1e-300)
        return pnext / scale, b

    e0 = jnp.zeros((r,), cstack.dtype).at[0].set(1.0)
    rev = (jnp.flip(cstack, 0), jnp.flip(hstack, 0))
    _, p_rev = jax.lax.scan(body, e0, rev)
    return jnp.flip(p_rev, 0), hstack                      # (d, r, n)


def _step(mode, n, cdf_dtype, carry, inp):
    """One dimension of the transform, gather-free.

    TPU gathers over a middle axis are an order of magnitude slower than
    dense contractions, so every lookup is expressed as a one-hot /
    interpolation-weight contraction (MXU matmuls + VPU reductions):
    the bracket index comes from a count reduction, bracket values from
    one-hot row dots, and the prefix conditioning from an interpolation
    matrix times the unfolded core.  ``cdf_dtype`` lets the CDF build +
    inversion run at higher precision than the bulk contractions."""
    phi, lf = carry                                        # (Mb, r), (Mb,)
    pk, core, x, h, qk = inp
    mb, r = phi.shape
    cdt = pk.dtype  # contraction dtype (may be lower than the carry's)
    if mode == "lin":
        fk = jnp.abs(phi.astype(cdt) @ pk)                 # (Mb, n)
    else:
        # outer product in the carry precision, matmul in cdt: the
        # MXU matmul dominates cost; the f64 outer product is small
        g = (phi[:, :, None] * phi[:, None, :]).reshape(mb, r * r)
        fk = g.astype(cdt) @ jnp.reshape(pk, (r * r, n))   # (Mb, n)
    # ---- CDF build + inversion (possibly promoted precision) ----
    fk = fk.astype(cdf_dtype)
    xp = x.astype(cdf_dtype)
    qp = qk.astype(cdf_dtype)
    ck = _trapz_cdf(fk, h.astype(cdf_dtype))
    fk, ck = _fix_degenerate(fk, ck, xp)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
    if mode == "rt":
        below = (xp[None, :] < qp[:, None]).astype(jnp.int32)
        # exclude the last point so i0 <= n-2
        i0 = jnp.clip(jnp.sum(below[:, :], axis=1) - 1, 0, n - 2)
    else:
        below = (ck < qp[:, None]).astype(jnp.int32)
        i0 = jnp.clip(jnp.sum(below, axis=1) - 1, 0, n - 2)
    oh0 = (iota == i0[:, None]).astype(cdf_dtype)          # (Mb, n)
    oh1 = (iota == (i0 + 1)[:, None]).astype(cdf_dtype)
    c1 = jnp.sum(ck * oh0, axis=1)
    f1 = jnp.sum(fk * oh0, axis=1)
    f2 = jnp.sum(fk * oh1, axis=1)
    x1 = jnp.sum(xp[None, :] * oh0, axis=1)
    x2 = jnp.sum(xp[None, :] * oh1, axis=1)
    if mode == "rt":
        xk = qp
        aq = 0.5 * (f2 - f1) / (x2 - x1)
        out = aq * (xk - x1) ** 2 + f1 * (xk - x1) + c1
    else:
        xk = _invert_quadratic(f1, f2, c1, qp, x1, x2)
        out = xk
    la = (x2 - xk) / (x2 - x1)
    lb = (xk - x1) / (x2 - x1)
    lf = lf + jnp.log(f1 * la + f2 * lb).astype(lf.dtype)
    # prefix conditioning via the interpolation matrix:
    # W (Mb, n) with la at i0 and lb at i0+1; B = W @ unfold(core).
    w = (la[:, None] * oh0 + lb[:, None] * oh1).astype(cdt)
    core_mat = jnp.reshape(jnp.transpose(core, (1, 0, 2)), (n, r * r))
    b = jnp.reshape(w @ core_mat, (mb, r, r)).astype(phi.dtype)
    phi = jnp.einsum("mi,mij->mj", phi, b)
    # per-sample renormalization: the conditional is scale-invariant and
    # the running product would overflow the f32 exponent range of TPU
    # f64 emulation over many dims.
    scale = jnp.maximum(jnp.max(jnp.abs(phi), axis=1, keepdims=True),
                        jnp.asarray(1e-30, phi.dtype))
    phi = phi / scale
    return (phi, lf), out


def _forward_scan(mode, q, pstack, cstack, xstack, hstack,
                  cdf_dtype=None):
    mb = q.shape[0]
    d, r = cstack.shape[0], cstack.shape[1]
    n = cstack.shape[2]
    cdf_dtype = cdf_dtype or cstack.dtype
    # NOTE: the prefix chain stays in the contraction dtype on purpose.
    # Promoting it to f64 was measured to cost ~20x on TPU (emulated
    # f64 elementwise) while leaving the sample error unchanged: the
    # error floor of reduced precision comes from the CDF inversion's
    # sensitivity to density rounding in low-density regions, not from
    # rounding accumulating across the conditioning chain.
    phi0 = jnp.zeros((mb, r), cstack.dtype).at[:, 0].set(1.0)
    lf0 = jnp.zeros((mb,), cdf_dtype)
    xs = (pstack, cstack, xstack, hstack, q.T)
    (_, lf), outs = jax.lax.scan(partial(_step, mode, n, cdf_dtype),
                                 (phi0, lf0), xs)
    return outs.T, lf


_PRECISIONS = {
    # name -> (contraction dtype, CDF/inversion dtype)
    "f64": ("float64", "float64"),
    "f32": ("float32", "float32"),
    "mixed": ("float32", "float64"),
}


@partial(jax.jit, static_argnames=("mode", "precision", "stable"))
def _irt_scan_one(mode, cstack, xstack, q, precision="f64",
                  stable=False):
    """One-shot scan transform for a single sample block.

    ``precision``: 'f64' (reference-accurate), 'f32' (fastest), or
    'mixed' — bulk contractions in f32 on the MXU, CDF build and
    quadratic inversion in f64 (TPU f64 is emulated and slow; the CDF
    arrays are O(M n), 10x smaller than the contraction traffic, so
    promoting only them buys back the accuracy cheaply)."""
    cdt, pdt = _PRECISIONS[precision]
    cstack = cstack.astype(cdt)
    xstack = xstack.astype(pdt)
    q = q.astype(pdt)
    if mode == "lin":
        pstack, hstack = _prepare_scan_lin(cstack, xstack.astype(cdt))
    else:
        pstack, hstack = _prepare_scan(cstack, xstack.astype(cdt),
                                       stable=stable)
    return _forward_scan(mode, q, pstack, cstack,
                         xstack, hstack.astype(pdt),
                         cdf_dtype=jnp.dtype(pdt))


def irt_scan(mode, cstack, xstack, q, block, precision="f64"):
    import jax as _jax

    # QR-stabilized marginalization off-TPU (see _prepare_scan)
    stable = _jax.default_backend() != "tpu"
    """Blocked scan-based transform, mode in {'sqr','lin','rt'}.

    Blocking is a *host-side* loop over equally-shaped slices reusing
    one compiled block program.  (Wrapping the per-dim scan in a
    `lax.map` over blocks — a nested scan — takes the TPU compiler from
    seconds to effectively forever; a dispatch loop costs microseconds
    per block and compiles once for any M.)"""
    m = q.shape[0]
    nb = _num_blocks(m, block)
    if nb <= 1:
        return _irt_scan_one(mode, cstack, xstack, q, precision, stable)
    padded = _pad_rows(q, nb * block)
    xs_parts, lf_parts = [], []
    for b in range(nb):
        xb, lb = _irt_scan_one(mode, cstack, xstack,
                               jax.lax.slice_in_dim(padded, b * block,
                                                    (b + 1) * block),
                               precision, stable)
        xs_parts.append(xb)
        lf_parts.append(lb)
    xs = jnp.concatenate(xs_parts, axis=0)[:m]
    lf = jnp.concatenate(lf_parts, axis=0)[:m]
    return xs, lf
