"""Chebyshev-spectral SIRT: polynomial interpolation of the TT cores
with exact squaring, analytic CDF integration and masked Newton
inversion.

This is the framework's analog of the reference's external spectral
backend (``ftt.m`` / ``build_ftt``, tt_dirt_approx.m:18,190-196 — a
functional-TT SIRT over polynomial bases).  Instead of wrapping that
third-party package, the same capability is built natively, mirroring
the structure of the Fourier SIRT (samplers/fourier.py) in a purely
real basis:

* cores live on Chebyshev-Gauss-Lobatto nodes; coefficients come from
  the small cosine Vandermonde solve (n <= ~40 per dim);
* the square of a degree-(n-1) interpolant is exact on the 2n-1-point
  Lobatto fine grid (polynomial band-limit, like the Fourier path's
  2x-fine grid);
* the CDF integrates analytically coefficient-wise:
  int T_k = T_{k+1}/(2(k+1)) - T_{k-1}/(2(k-1));
* backward semi-marginalization carries a Gram matrix with
  Clenshaw-Curtis quadrature on the fine grid — exact for products of
  the interpolants;
* inversion = fine-grid bisection bracket + quadratic initial guess +
  the same damped masked Newton as the Fourier path, with T_k and
  T'_k evaluated in angle form (cos(k acos t), k sin(k th)/sin th).

Use inside DIRT with ``interpolation='chebyshev'`` (levels >= 1 on
Lobatto nodes; level 0 stays spline, as in tt_dirt_sample.m:69-71).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tt import TT

__all__ = ["tt_irt_cheb", "cheb_precompute", "lobatto_nodes"]

_NEWTON_MAX_ITERS = 16
_NEWTON_TOL = 1e-7


def lobatto_nodes(n: int, a: float = -1.0, b: float = 1.0) -> np.ndarray:
    """n Chebyshev-Gauss-Lobatto nodes on [a, b], ascending."""
    t = np.cos(np.pi * np.arange(n - 1, -1, -1) / (n - 1))
    return 0.5 * (b - a) * (t + 1.0) + a


def _cheb_vander(t, ncoef):
    """V[j, k] = T_k(t_j) in angle form (|t| <= 1)."""
    th = np.arccos(np.clip(t, -1.0, 1.0))
    return np.cos(np.outer(th, np.arange(ncoef)))


def _clenshaw_curtis_weights(nf):
    """Quadrature weights on the nf Lobatto nodes (ascending), exact for
    polynomials of degree <= nf-1: w = V^{-T} m with the Chebyshev
    moments m_k = int_{-1}^1 T_k = 2/(1-k^2) (even k), 0 (odd)."""
    t = np.cos(np.pi * np.arange(nf - 1, -1, -1) / (nf - 1))
    v = _cheb_vander(t, nf)
    k = np.arange(nf)
    mom = np.where(k % 2 == 0, 2.0 / (1.0 - k ** 2 + (k % 2)), 0.0)
    mom[1::2] = 0.0
    return np.linalg.solve(v.T, mom)


def _integrate_coeffs_matrix(nc):
    """Matrix B (nc+1, nc): coefficients of the antiderivative
    int_{-1}^t sum c_k T_k, in the T basis, with the constant chosen so
    the antiderivative vanishes at t = -1."""
    b = np.zeros((nc + 1, nc))
    # d/dt relation: int T_0 = T_1; int T_1 = T_2/4 (+ const);
    # int T_k = T_{k+1}/(2(k+1)) - T_{k-1}/(2(k-1)), k >= 2
    b[1, 0] = 1.0
    if nc > 1:
        b[2, 1] = 0.25
    for k in range(2, nc):
        b[k + 1, k] += 1.0 / (2.0 * (k + 1))
        b[k - 1, k] -= 1.0 / (2.0 * (k - 1))
    # fix the constant: value at t=-1 is sum_j b[j] T_j(-1) = sum b[j] (-1)^j
    tm1 = (-1.0) ** np.arange(nc + 1)
    b[0, :] -= tm1 @ b
    return b


@jax.tree_util.register_pytree_node_class
class ChebPrep:
    """Precomputed per-dimension sampling data (cf. FourierPrep)."""

    __slots__ = ("lfine", "coeffs", "vinv_f", "bint", "mid", "half",
                 "nmode")

    def __init__(self, lfine, coeffs, vinv_f, bint, mid, half, nmode):
        self.lfine = tuple(lfine)    # (r1, nf, rc) values on fine nodes
        self.coeffs = tuple(coeffs)  # (r1, n, r2) Chebyshev coefficients
        self.vinv_f = tuple(vinv_f)  # (nf, nf) fine values -> fine coeffs
        self.bint = tuple(bint)      # (nf+1, nf) antiderivative map
        self.mid = tuple(mid)
        self.half = tuple(half)
        self.nmode = tuple(nmode)

    def tree_flatten(self):
        return ((self.lfine, self.coeffs, self.vinv_f, self.bint),
                (self.mid, self.half, self.nmode))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], children[3],
                   *aux)


def cheb_precompute(grid, f: TT) -> ChebPrep:
    """Build per-dim Chebyshev data; grids must be Lobatto nodes."""
    d = f.d
    if isinstance(grid, (list, tuple)):
        grids = [np.asarray(g).reshape(-1) for g in grid]
    else:
        grids = [np.asarray(grid).reshape(-1)] * d

    lfine, coeffs, vinvf_l, bint_l, mids, halves, ns = \
        [], [], [], [], [], [], []
    gram = np.eye(f.cores[-1].shape[2])
    for k in range(d - 1, -1, -1):
        core = np.asarray(f.cores[k])
        r1, n, r2 = core.shape
        x = grids[k]
        if x.shape[0] != n:
            raise ValueError("grid/core size mismatch")
        a, b = float(x[0]), float(x[-1])
        mid, half = 0.5 * (a + b), 0.5 * (b - a)
        t = (x - mid) / half
        tref = lobatto_nodes(n)
        if not np.allclose(t, tref, atol=1e-8):
            raise ValueError(
                f"dim {k}: grid is not Chebyshev-Lobatto "
                "(use lobatto_nodes)")
        v = _cheb_vander(tref, n)
        ck = np.einsum("kj,ajb->akb", np.linalg.inv(v), core)
        nf = 2 * n - 1
        tf = lobatto_nodes(nf)
        vf = _cheb_vander(tf, n)                    # eval coarse on fine
        ffine = np.einsum("fk,akb->afb", vf, ck)    # (r1, nf, r2)
        lchol = np.linalg.cholesky(
            gram + 1e-300 * np.eye(gram.shape[0])
            + 1e-14 * np.trace(gram) * np.eye(gram.shape[0]))
        lfine.append(jnp.asarray(np.einsum("afb,bc->afc", ffine, lchol)))
        coeffs.append(jnp.asarray(ck))
        vff = _cheb_vander(tf, nf)
        vinvf_l.append(jnp.asarray(np.linalg.inv(vff)))
        bint_l.append(jnp.asarray(_integrate_coeffs_matrix(nf)))
        mids.append(mid)
        halves.append(half)
        ns.append(int(n))
        # Gram update: Clenshaw-Curtis on the fine grid is exact for
        # the degree-(2n-2) product (times the half-width Jacobian)
        wcc = _clenshaw_curtis_weights(nf) * half
        gram_new = np.einsum("ajc,j,cd,bjd->ab", ffine, wcc, gram, ffine)
        gram = 0.5 * (gram_new + gram_new.T)
        gram = gram / max(np.max(np.abs(gram)), 1e-300)
    return ChebPrep(tuple(reversed(lfine)), tuple(reversed(coeffs)),
                    tuple(reversed(vinvf_l)), tuple(reversed(bint_l)),
                    tuple(reversed(mids)), tuple(reversed(halves)),
                    tuple(reversed(ns)))


def _cheb_eval_batch(coefs, t):
    """sum_k coefs[:, k] T_k(t) and its derivative, per sample.
    coefs (Mb, nc), t (Mb,) in [-1, 1]."""
    nc = coefs.shape[1]
    th = jnp.arccos(jnp.clip(t, -1.0, 1.0))
    kk = jnp.arange(nc, dtype=jnp.float64)
    ct = jnp.cos(th[:, None] * kk[None, :])         # T_k(t)
    val = jnp.sum(coefs * ct, axis=1)
    # T'_k = k sin(k th)/sin th; guard the endpoints with the limit
    # T'_k(+-1) = (+-1)^{k+1} k^2
    sth = jnp.sin(th)
    st = jnp.sin(th[:, None] * kk[None, :])
    safe = sth > 1e-7
    # endpoint limits: T'_k(1) = k^2, T'_k(-1) = (-1)^(k+1) k^2
    endsign = jnp.where(t[:, None] >= 0.0, 1.0,
                        jnp.where(kk[None, :] % 2 == 0, -1.0, 1.0))
    dct = jnp.where(safe[:, None],
                    kk * st / jnp.where(safe, sth, 1.0)[:, None],
                    kk ** 2 * endsign)
    der = jnp.sum(coefs * dct, axis=1)
    return val, der


def _forward_block_cheb(q, prep: ChebPrep, dsample):
    mb = q.shape[0]
    r0 = prep.lfine[0].shape[0]
    phi = jnp.ones((mb, r0), jnp.float64)
    lf = jnp.zeros((mb,), jnp.float64)
    xq = []
    for k in range(dsample):
        lfk = prep.lfine[k]                         # (r1, nf, rc)
        n = prep.nmode[k]
        nf = 2 * n - 1
        half = prep.half[k]
        tf = jnp.asarray(lobatto_nodes(nf))
        # conditional on the fine nodes: positive sum of squares
        w = jnp.einsum("mi,ife->mfe", phi, lfk)
        fvals = jnp.sum(w * w, axis=2)              # (Mb, nf)
        bad = jnp.all(fvals <= 0.0, axis=1, keepdims=True)
        fvals = jnp.where(bad, jnp.ones_like(fvals), fvals)
        # Chebyshev coefficients of the conditional (exact: degree 2n-2)
        ghat = fvals @ prep.vinv_f[k].T             # (Mb, nf)
        # analytic CDF coefficients (antiderivative, zero at t=-1)
        chat = ghat @ prep.bint[k].T                # (Mb, nf+1)
        # CDF values on the fine grid for the bracket search
        vfull = _cheb_vander(np.asarray(lobatto_nodes(nf)), nf + 1)
        cvals = chat @ jnp.asarray(vfull).T         # (Mb, nf)
        cmax = cvals[:, -1]
        qk = q[:, k]
        target = qk * cmax
        lo = jnp.zeros((mb,), jnp.int32)
        hi = jnp.full((mb,), nf - 1, jnp.int32)
        for _ in range(int(math.ceil(math.log2(nf))) + 1):
            mid_i = (lo + hi) // 2
            cmid = jnp.take_along_axis(cvals, mid_i[:, None], axis=1)[:, 0]
            left = target > cmid
            lo = jnp.where(left, mid_i, lo)
            hi = jnp.where(left, hi, mid_i)
        i0 = jnp.clip(lo, 0, nf - 2)
        c1 = jnp.take_along_axis(cvals, i0[:, None], axis=1)[:, 0]
        f1 = jnp.take_along_axis(fvals, i0[:, None], axis=1)[:, 0]
        f2 = jnp.take_along_axis(fvals, i0[:, None] + 1, axis=1)[:, 0]
        t1 = tf[i0]
        t2 = tf[i0 + 1]
        # citardauq quadratic initial guess on the bracket
        aq = 0.5 * (f2 - f1) / jnp.maximum(t2 - t1, 1e-300)
        tq = target - c1
        dq = f1 * f1 + 4.0 * aq * tq
        den = f1 + jnp.sqrt(jnp.maximum(dq, 0.0))
        safe_den = jnp.where(den <= 0.0, 1.0, den)
        tg = jnp.where(den <= 0.0, t1, t1 + 2.0 * tq / safe_den)
        tg = jnp.clip(tg, -1.0, 1.0)
        # masked damped Newton on C(t)/cmax - q
        chat_n = chat / cmax[:, None]
        tk, jac_t = _newton_cheb(tg, chat_n, qk)
        xq.append(tk * half + prep.mid[k])
        # density of the realized transform in x units: |C'(t)|/half
        lf = lf + jnp.log(jnp.maximum(jac_t / half, 1e-300))
        if k < dsample - 1:
            nck = prep.coeffs[k].shape[1]
            th = jnp.arccos(jnp.clip(tk, -1.0, 1.0))
            tkbasis = jnp.cos(th[:, None]
                              * jnp.arange(nck, dtype=jnp.float64)[None])
            bsel = jnp.einsum("akb,sk->sab", prep.coeffs[k], tkbasis)
            phi = jnp.einsum("mi,mij->mj", phi, bsel)
            scale = jnp.maximum(
                jnp.max(jnp.abs(phi), axis=1, keepdims=True), 1e-300)
            phi = phi / scale
    return jnp.stack(xq, axis=1), lf


def _newton_cheb(t0, chat_n, qk):
    """Damped masked Newton on resid(t) = C_n(t) - q (cf. fourier.py)."""
    def cf(t):
        val, der = _cheb_eval_batch(chat_n, t)
        return val - qk, der

    def cond(state):
        it, t, active, _ = state
        return jnp.logical_and(it < _NEWTON_MAX_ITERS, jnp.any(active))

    def body(state):
        it, t, active, jac = state
        resid, fval = cf(t)
        jac = jnp.where(active, jnp.abs(fval), jac)
        still = jnp.abs(resid) > _NEWTON_TOL
        tn = jnp.clip(t - resid / (jnp.abs(fval) + jnp.abs(resid)),
                      -1.0, 1.0)
        t = jnp.where(active & still, tn, t)
        return it + 1, t, active & still, jac

    r0, f0 = cf(t0)
    init = (jnp.asarray(0), t0, jnp.ones(t0.shape, bool), jnp.abs(f0))
    _, t, _, jac = jax.lax.while_loop(cond, body, init)
    _, ft = cf(t)
    return t, jnp.abs(ft)


@partial(jax.jit, static_argnames=("dsample",))
def _irt_cheb_one(prep, q, dsample):
    return _forward_block_cheb(q, prep, dsample)


def tt_irt_cheb(grid, f, q, block: int | None = None):
    """Inverse Rosenblatt through sqrt(density) with Chebyshev-spectral
    interpolation (the native ftt.m/build_ftt analog).

    ``grid`` must hold Chebyshev-Gauss-Lobatto nodes per dim
    (``lobatto_nodes``); ``f`` a TT of sqrt-density values on them, or
    a precomputed ``ChebPrep``.  Returns (samples, log density).
    """
    prep = f if isinstance(f, ChebPrep) else cheb_precompute(grid, f)
    q = jnp.asarray(q)
    if block is None:
        from .irt import auto_block

        block = min(auto_block(q.shape[0]), 1 << 15)
    dsample = min(len(prep.nmode), q.shape[1])
    m = q.shape[0]
    nb = -(-m // block)
    if nb <= 1:
        return _irt_cheb_one(prep, q, dsample)
    pad = jnp.zeros((nb * block - m, q.shape[1]), q.dtype)
    padded = jnp.concatenate([q, pad], axis=0)
    xs, lfs = [], []
    for b in range(nb):
        xb, lb = _irt_cheb_one(
            prep, jax.lax.slice_in_dim(padded, b * block,
                                       (b + 1) * block), dsample)
        xs.append(xb)
        lfs.append(lb)
    return (jnp.concatenate(xs, axis=0)[:m],
            jnp.concatenate(lfs, axis=0)[:m])
