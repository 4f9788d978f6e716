"""Fourier-basis SIRT: trigonometric interpolation of the TT cores with
analytic CDF integration and masked Newton inversion.

Reference: matlab/samplers/tt_irt_fourier.m.  Same mathematical content,
TPU-first realization:

* the reference builds continuous Fourier transforms with scaled FFTs and
  an O(n^2) double loop for the coefficient convolution of the square
  (tt_irt_fourier.m:96-101); here the grids are small (2n <= ~64), so
  we use explicit DFT matrices — unitary small matmuls that map onto the
  MXU and sidestep FFT index conventions entirely.  Squaring happens
  pointwise on the 2x-fine grid (exact: the square is band-limited
  within the fine basis).
* the right-chunk integral is carried as a real Gram matrix with
  *rectangular* quadrature, which is exact for products of band-limited
  interpolants on the uniform grid (the reference carries a QR factor,
  :75-77 — see irt.py for why QR is kept off the TPU path).
* the shrinking active-set Newton (:248-279) becomes a fixed-shape
  masked Newton under `lax.while_loop`, with the same damping
  Jac + |Resid| and residual tolerance.
* ALL device arithmetic is real-pair: complex values are carried as
  (re, im) planes and complex matmuls run as doubled real matmuls
  ([wr wi] = [pr pi] @ [[Lr Li], [-Li Lr]]).  The TPU PJRT backend has
  no complex types at all ("Element type C128 is not supported on
  TPU"), so a complex-typed sampler simply would not run on the target
  hardware; the doubled real form is also what the MXU wants.  Complex
  appears only in the host-side (numpy) precompute.

Grid convention (reference :6): uniform without the left border,
x = ((-n+1):n)*h + X0, period interval (-S, S] + X0.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tt import TT

__all__ = ["tt_irt_fourier", "fourier_precompute"]

_NEWTON_MAX_ITERS = 16    # tt_irt_fourier.m:20
_NEWTON_TOL = 1e-7        # tt_irt_fourier.m:21
_DEFAULT_BLOCK = 1 << 12  # fourier blocks are smaller: O(block*4n*2r)
_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
class FourierPrep:
    """Precomputed per-dimension sampling data (the reference's reusable
    struct, tt_irt_fourier.m:106-137).  Arrays are pytree leaves; the
    grid geometry (x0/S/h/n per dim) is static aux data so it stays
    concrete under jit."""

    __slots__ = ("lfine", "coeffs", "x0", "s", "h", "nhalf")

    def __init__(self, lfine, coeffs, x0, s, h, nhalf):
        # real-pair storage (no complex dtypes reach the device):
        self.lfine = tuple(lfine)    # per dim: (2*r1, 4n, 2*rc) real —
        #   the doubled embedding [[Lr, Li], [-Li, Lr]] of the complex
        #   (r1, 4n, rc) fine-grid factor
        self.coeffs = tuple(coeffs)  # per dim: (r1, 2n, r2, 2) real —
        #   (re, im) planes of the complex Fourier coefficients
        self.x0 = tuple(x0)
        self.s = tuple(s)
        self.h = tuple(h)
        self.nhalf = tuple(nhalf)

    def tree_flatten(self):
        return (self.lfine, self.coeffs), (self.x0, self.s, self.h,
                                           self.nhalf)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


def _freqs(n):
    """Frequency integers m = -n+1 .. n."""
    return np.arange(-n + 1, n + 1)


def _double_embed(a_c, axis0, axis2):
    """Real doubled embedding of a complex array along two axes:
    [[Re, Im], [-Im, Re]], so that the real matmul
    [pr pi] @ embed(L) equals [Re(p@L)  Im(p@L)]."""
    top = np.concatenate([a_c.real, a_c.imag], axis=axis2)
    bot = np.concatenate([-a_c.imag, a_c.real], axis=axis2)
    return np.concatenate([top, bot], axis=axis0)


def fourier_precompute(grid, f: TT) -> FourierPrep:
    """Build the per-dim Fourier data for sampling."""
    d = f.d
    if isinstance(grid, (list, tuple)):
        grids = [np.asarray(g).reshape(-1) for g in grid]
    else:
        g = np.asarray(grid).reshape(-1)
        total = sum(c.shape[1] for c in f.cores)
        if d > 1 and g.shape[0] == total:
            grids, pos = [], 0
            for c in f.cores:
                grids.append(g[pos:pos + c.shape[1]])
                pos += c.shape[1]
        else:
            grids = [g] * d

    lfine, coeffs, x0s, ss, hs, ns = [], [], [], [], [], []
    gram = np.eye(f.cores[-1].shape[2])
    # backward pass: real Gram carry with rectangular quadrature
    for k in range(d - 1, -1, -1):
        core = np.asarray(f.cores[k])
        r1, n2, r2 = core.shape
        x = grids[k]
        if n2 % 2:
            raise ValueError("Fourier SIRT needs an even number of grid "
                             "points (tt_irt_fourier.m:43-45)")
        if x.shape[0] != n2:
            raise ValueError("grid/core size mismatch")
        n = n2 // 2
        h = x[1] - x[0]
        if not np.allclose(np.diff(x), h, atol=1e-12):
            raise ValueError(f"grid not uniform in dim {k}")
        s = n * h
        x0 = (x[0] - h + x[-1]) * 0.5     # midpoint (reference :66)
        xc = x - x0                        # centered: (-n+1..n)*h
        m = _freqs(n)
        # coefficients: inverse DFT of values, c = E^{-1} v;
        # E[j,mi] = exp(i pi m xc_j / S), unitary up to 1/(2n)
        einv = np.exp(-1j * math.pi * np.outer(m, xc / s)) / (2 * n)
        ck = np.einsum("mj,ajb->amb", einv, core)          # (r1, 2n, r2)
        # fine grid: 4n points (-2n+1..2n)*(h/2)
        xf = np.arange(-2 * n + 1, 2 * n + 1) * (h / 2.0)
        efine = np.exp(1j * math.pi * np.outer(xf / s, m))  # (4n, 2n)
        ffine = np.einsum("fm,amb->afb", efine, ck)        # (r1, 4n, r2)
        # chol of the right Gram -> |.|^2 form for the semi-marginal
        lchol = np.linalg.cholesky(
            gram + 1e-300 * np.eye(gram.shape[0])
            + 1e-14 * np.trace(gram) * np.eye(gram.shape[0]))
        lf_c = np.einsum("afb,bc->afc", ffine, lchol)      # (r1, 4n, rc)
        lfine.append(jnp.asarray(_double_embed(lf_c, 0, 2)))
        coeffs.append(jnp.asarray(np.stack([ck.real, ck.imag], axis=-1)))
        x0s.append(float(x0))
        ss.append(float(s))
        hs.append(float(h))
        ns.append(int(n))
        # Gram update: exact rectangular quadrature on the coarse grid
        gram_new = h * np.einsum("ajc,cd,bjd->ab", core, gram, core)
        gram = 0.5 * (gram_new + gram_new.T)
        gram = gram / max(np.max(np.abs(gram)), 1e-300)
    return FourierPrep(tuple(reversed(lfine)), tuple(reversed(coeffs)),
                       tuple(reversed(x0s)), tuple(reversed(ss)),
                       tuple(reversed(hs)), tuple(reversed(ns)))


def _forward_block_fourier(q, prep: FourierPrep, dsample):
    mb = q.shape[0]
    r0 = prep.lfine[0].shape[0] // 2
    # real-pair prefix: phi = [Re | Im], (Mb, 2*r)
    phi = jnp.concatenate([jnp.ones((mb, r0), jnp.float64),
                           jnp.zeros((mb, r0), jnp.float64)], axis=1)
    lf = jnp.zeros((mb,), jnp.float64)
    xq = []
    for k in range(dsample):
        lfk = prep.lfine[k]                  # (2*r1, 4n, 2*rc) real
        s = prep.s[k]
        n = prep.nhalf[k]
        n4 = 4 * n
        mfine_np = np.arange(-2 * n + 1, 2 * n + 1).astype(np.float64)
        mfine = jnp.asarray(mfine_np)
        xf_np = np.arange(-2 * n + 1, 2 * n + 1) * (prep.h[k] / 2.0)
        xf = jnp.asarray(xf_np)
        # conditional marginal on the fine grid: the doubled embedding
        # gives w2[..., :rc] = Re(phi.L), w2[..., rc:] = Im(phi.L), so
        # the square-sum over the WHOLE last axis is sum_e |phi.L|^2
        w2 = jnp.einsum("mi,ife->mfe", phi, lfk, precision=_HI)
        fvals = jnp.sum(w2 * w2, axis=2)                    # (Mb, 4n) >= 0
        # degenerate rows -> uniform
        bad = jnp.all(fvals <= 0.0, axis=1, keepdims=True)
        fvals = jnp.where(bad, jnp.ones_like(fvals), fvals)
        # Fourier coefficients of the conditional (exact on fine basis):
        # ghat = fvals @ efinv.T with efinv = exp(-i pi m xf / S)/4n,
        # as one real matmul against the stacked [Re | Im] columns
        ang_inv = (-math.pi / s) * np.outer(xf_np, mfine_np)  # (4n, 4n)
        einv2 = jnp.asarray(np.concatenate(
            [np.cos(ang_inv), np.sin(ang_inv)], axis=1) / n4)  # (4n, 8n)
        g2 = jnp.matmul(fvals, einv2, precision=_HI)         # (Mb, 8n)
        gr, gi = g2[:, :n4], g2[:, n4:]
        g0 = gr[:, 2 * n - 1]                                # m = 0 slot
        # CDF: C(x) = g0*(x+S) + sum_{m!=0} ghat_m S/(i pi m)
        #                         (e^{i pi m x/S} - (-1)^m)
        # 1/i = -i: chat = ghat * s/(i pi m) -> (cr, ci) =
        #   (gi * s/(pi m), -gr * s/(pi m)), zeroed at m = 0
        km_np = np.where(mfine_np == 0.0, 0.0,
                         s / (math.pi * np.where(mfine_np == 0.0, 1.0,
                                                 mfine_np)))
        km = jnp.asarray(km_np)
        cr = gi * km[None, :]
        ci = -gr * km[None, :]
        sign_m = jnp.asarray((-1.0) ** np.arange(-2 * n + 1, 2 * n + 1))
        cconst = g0 * s - jnp.sum(cr * sign_m[None, :], axis=1)
        # Re(chat @ efine.T) = cr @ cos.T - ci @ sin.T, stacked lhs
        ang_f = (math.pi / s) * np.outer(xf_np, mfine_np)    # (4n, 4n)
        ef2 = jnp.asarray(np.concatenate(
            [np.cos(ang_f), -np.sin(ang_f)], axis=1).T)      # (8n, 4n)
        cvals = (jnp.matmul(jnp.concatenate([cr, ci], axis=1), ef2,
                            precision=_HI)
                 + g0[:, None] * xf[None, :] + cconst[:, None])  # (Mb,4n)
        cmax = cvals[:, -1]
        qk = q[:, k]
        # bisection on the fine grid for the initial bracket
        target = qk * cmax
        lo = jnp.zeros((mb,), jnp.int32)
        hi = jnp.full((mb,), n4 - 1, jnp.int32)
        for _ in range(int(math.ceil(math.log2(n4))) + 1):
            mid = (lo + hi) // 2
            cmid = jnp.take_along_axis(cvals, mid[:, None], axis=1)[:, 0]
            left = target > cmid
            lo = jnp.where(left, mid, lo)
            hi = jnp.where(left, hi, mid)
        i0 = jnp.clip(lo, 0, n4 - 2)
        c1 = jnp.take_along_axis(cvals, i0[:, None], axis=1)[:, 0]
        f1 = jnp.take_along_axis(fvals, i0[:, None], axis=1)[:, 0]
        f2 = jnp.take_along_axis(fvals, i0[:, None] + 1, axis=1)[:, 0]
        x1 = xf[i0]
        hf = prep.h[k] / 2.0
        # citardauq root form (see irt._invert_quadratic): stable when
        # the density is nearly flat (aq -> 0)
        aq = 0.5 * (f2 - f1) / hf
        tq = target - c1
        dq = f1 * f1 + 4.0 * aq * tq
        den = f1 + jnp.sqrt(jnp.maximum(dq, 0.0))
        safe_den = jnp.where(den <= 0.0, 1.0, den)
        xg = jnp.where(den <= 0.0, x1, x1 + 2.0 * tq / safe_den)
        xg = jnp.clip(xg, -s, s)
        # Newton refinement on the normalized residual C(x)/cmax - q
        cr_n = cr / cmax[:, None]
        ci_n = ci / cmax[:, None]
        a0_n = g0 / cmax
        shift = cconst / cmax - qk
        # fold the constant - q into the m=0 channel by adding to the
        # linear part's offset: residual(x) = sum Re[chat_n e] + a0 x + shift
        xk, jac = _newton_invert_resid(xg, cr_n, ci_n, a0_n, shift, s,
                                       mfine)
        xq.append(xk + prep.x0[k])
        lf = lf + jnp.log(jnp.maximum(jac, 1e-300))
        if k < dsample - 1:
            # condition the prefix on xk via the core's trigonometric
            # interpolant (reference :290-301), in real pairs:
            # b = sum_m c_m e(x)^m with e = cos + i sin
            mcoarse = jnp.asarray(_freqs(n), dtype=jnp.float64)
            ang = (math.pi / s) * xk[:, None] * mcoarse[None, :]
            er, ei = jnp.cos(ang), jnp.sin(ang)              # (Mb, 2n)
            ckr = prep.coeffs[k][..., 0]                     # (r1, 2n, r2)
            cki = prep.coeffs[k][..., 1]
            br = (jnp.einsum("amb,sm->sab", ckr, er, precision=_HI)
                  - jnp.einsum("amb,sm->sab", cki, ei, precision=_HI))
            bi = (jnp.einsum("amb,sm->sab", ckr, ei, precision=_HI)
                  + jnp.einsum("amb,sm->sab", cki, er, precision=_HI))
            r1 = ckr.shape[0]
            phr, phii = phi[:, :r1], phi[:, r1:]
            nphr = (jnp.einsum("mi,mij->mj", phr, br, precision=_HI)
                    - jnp.einsum("mi,mij->mj", phii, bi, precision=_HI))
            nphi = (jnp.einsum("mi,mij->mj", phr, bi, precision=_HI)
                    + jnp.einsum("mi,mij->mj", phii, br, precision=_HI))
            phi = jnp.concatenate([nphr, nphi], axis=1)
            scale = jnp.maximum(
                jnp.max(jnp.abs(phi), axis=1, keepdims=True), 1e-300)
            phi = phi / scale
    return jnp.stack(xq, axis=1), lf


def _newton_invert_resid(xk0, cr, ci, a0, shift, s, mfine):
    """Masked damped Newton on resid(x) = sum Re[chat e(x)] + a0*x + shift,
    with chat carried as the real pair (cr, ci):
    Re[c e] = cr cos - ci sin;  d/dx Re[c e] = -(pi m / s)(cr sin + ci cos).
    """
    def cf(x):
        ang = (math.pi / s) * x[:, None] * mfine[None, :]
        er, ei = jnp.cos(ang), jnp.sin(ang)
        resid = jnp.sum(cr * er - ci * ei, axis=1) + a0 * x + shift
        fval = (jnp.sum((-math.pi / s) * mfine[None, :]
                        * (cr * ei + ci * er), axis=1) + a0)
        return resid, fval

    def cond(state):
        it, x, active, _ = state
        return jnp.logical_and(it < _NEWTON_MAX_ITERS, jnp.any(active))

    def body(state):
        it, x, active, jac = state
        resid, fval = cf(x)
        jac = jnp.where(active, jnp.abs(fval), jac)
        still = jnp.abs(resid) > _NEWTON_TOL
        xn = jnp.clip(x - resid / (jnp.abs(fval) + jnp.abs(resid)), -s, s)
        x = jnp.where(active & still, xn, x)
        return it + 1, x, active & still, jac

    r0, f0 = cf(xk0)
    init = (jnp.asarray(0), xk0, jnp.ones(xk0.shape, bool), jnp.abs(f0))
    _, x, _, jac = jax.lax.while_loop(cond, body, init)
    _, fx = cf(x)
    return x, jnp.abs(fx)


@partial(jax.jit, static_argnames=("dsample",))
def _irt_fourier_one(prep, q, dsample):
    return _forward_block_fourier(q, prep, dsample)


def _irt_fourier_jit(prep, q, dsample, block):
    # host-side block loop; see irt_scan.py for why not lax.map
    m = q.shape[0]
    nb = -(-m // block)
    if nb <= 1:
        return _irt_fourier_one(prep, q, dsample)
    pad = jnp.zeros((nb * block - m, q.shape[1]), q.dtype)
    padded = jnp.concatenate([q, pad], axis=0)
    xs, lf = [], []
    for b in range(nb):
        xb, lb = _irt_fourier_one(
            prep, jax.lax.slice_in_dim(padded, b * block,
                                       (b + 1) * block), dsample)
        xs.append(xb)
        lf.append(lb)
    return (jnp.concatenate(xs, axis=0)[:m],
            jnp.concatenate(lf, axis=0)[:m])


def tt_irt_fourier(grid, f, q, block: int | None = None):
    """Inverse Rosenblatt through sqrt(density) with trigonometric
    interpolation (reference tt_irt_fourier.m).

    ``f`` may be a TT or a precomputed ``FourierPrep`` (the reference's
    struct-reuse mode, :106-137).  Returns (samples, log density).
    """
    if isinstance(f, FourierPrep):
        prep = f
    else:
        prep = fourier_precompute(grid, f)
    q = jnp.asarray(q)
    if block is None:
        from .irt import auto_block

        block = min(auto_block(q.shape[0]), 1 << 15)
    dsample = min(len(prep.nhalf), q.shape[1])
    return _irt_fourier_jit(prep, q, dsample, block)
