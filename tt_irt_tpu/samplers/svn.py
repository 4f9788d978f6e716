"""Stein Variational Newton baseline.

The reference downloads an external SVN_H implementation for its
predator-prey comparison (examples/predator_prey/check_svn.m,
test_predator_prey_svn.m:88).  This is a self-contained JAX version:
particles move under the Stein-Newton update with a scaled-Hessian RBF
kernel; gradients and Gauss-Newton Hessians of -log posterior come from
autodiff (the reference needs hand-coded sensitivity ODEs,
PP_RHS_grad.m — autodiff replaces them wholesale).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["svn"]


class SVNResult(NamedTuple):
    particles: jnp.ndarray   # (N, d)
    steps: int
    grad_norm: jnp.ndarray


def svn(neg_logpost: Callable, x0, *, steps: int = 30,
        step_size: float = 1.0, damping: float = 1e-2,
        max_step: float | None = None, bounds=None,
        spd_mode: str | None = None) -> SVNResult:
    """Stein Variational Newton with a Hessian-scaled RBF kernel.

    Args:
      neg_logpost: scalar function of one sample (d,) -> (); vmapped and
        differentiated internally.
      x0: (N, d) initial particles.
      max_step: trust-region cap on the per-particle update norm (the
        Newton direction can overshoot into regions where stiff forward
        models blow up).
      bounds: optional (lo, hi) box; particles are clipped into it.
      spd_mode: how the per-particle Hessians are made SPD — 'eigh'
        (eigenvalue clipping at ``damping``; the accurate choice) or
        'gershgorin' (diagonal shift by the Gershgorin lower-eigenvalue
        bound; avoids the batched-eigh custom call that some remote TPU
        backends cannot compile).  Default: by backend ('eigh' off-TPU).
    """
    x = jnp.asarray(x0)
    n, d = x.shape
    if max_step is None:
        max_step = float(jnp.std(x) + 0.1)
    if spd_mode is None:
        spd_mode = "gershgorin" if jax.default_backend() == "tpu" \
            else "eigh"
    grad_f = jax.vmap(jax.grad(neg_logpost))

    def gn_hess(xi):
        # Gauss-Newton approximation: J^T J of the gradient (drop the
        # second-order term); fall back to full Hessian when cheap
        return jax.hessian(neg_logpost)(xi)

    hess_f = jax.vmap(gn_hess)
    eyed = jnp.eye(d)

    def _spdify(h):
        if spd_mode == "eigh":
            w, v = jnp.linalg.eigh(h)
            w = jnp.maximum(w, damping)
            return jnp.einsum("nab,nb,ncb->nac", v, w, v)
        # Gershgorin: lambda_min >= min_i (h_ii - sum_{j!=i} |h_ij|);
        # shift the diagonal so the bound reaches ``damping``
        h = 0.5 * (h + jnp.swapaxes(h, 1, 2))
        offsum = jnp.sum(jnp.abs(h), axis=2) - jnp.abs(
            jnp.diagonal(h, axis1=1, axis2=2))
        lmin = jnp.min(jnp.diagonal(h, axis1=1, axis2=2) - offsum,
                       axis=1)                              # (N,)
        shift = jnp.maximum(damping - lmin, 0.0)
        return h + shift[:, None, None] * eyed[None]

    def body(x, _):
        g = grad_f(x)                       # (N, d)
        h = hess_f(x)                       # (N, d, d)
        h = _spdify(h)                      # SPD-ify the Hessians
        m = jnp.mean(h, axis=0)             # metric for the kernel
        # anisotropic RBF kernel with metric M/d
        diff = x[:, None, :] - x[None, :, :]           # (N, N, d)
        md = jnp.einsum("nmd,de,nme->nm", diff, m, diff) / d
        kmat = jnp.exp(-0.5 * md)                      # (N, N)
        gk = -jnp.einsum("nm,de,nme->nmd", kmat, m, diff) / d  # grad_x k
        # Stein gradient: v_i = (1/N) sum_m [ -k(m,i) g_m + grad_k(m,i) ]
        phi = (-(kmat.T @ g) + jnp.sum(gk, axis=0)) / n       # (N, d)
        # Newton metric: H_i = (1/N) sum_m [k^2 H_m + grad_k grad_k^T]
        hsum = jnp.einsum("mn,mab->nab", kmat**2, h) / n + \
            jnp.einsum("mnd,mne->nde", gk, gk) / n
        hsum = hsum + damping * jnp.eye(d)[None]
        # hsum is SPD by construction (SPD-ified H, PSD kernel terms,
        # damping shift): batched Cholesky + triangular solves replace
        # the batched-LU custom call that remote TPU backends reject
        # (the solve_blockdiag fallback pattern, als_cross.py:39-46 —
        # but Cholesky compiles on-device, no host round trip needed)
        lfac = jnp.linalg.cholesky(hsum)
        y = jax.lax.linalg.triangular_solve(
            lfac, phi[:, :, None], left_side=True, lower=True)
        dx = jax.lax.linalg.triangular_solve(
            lfac, y, left_side=True, lower=True, transpose_a=True)[:, :, 0]
        # trust region: cap the per-particle displacement
        nrm = jnp.linalg.norm(dx, axis=1, keepdims=True)
        dx = dx * jnp.minimum(1.0, max_step / jnp.maximum(nrm, 1e-30))
        xn = x + step_size * dx
        if bounds is not None:
            xn = jnp.clip(xn, jnp.asarray(bounds[0]),
                          jnp.asarray(bounds[1]))
        return xn, None

    x, _ = jax.lax.scan(body, x, None, length=steps)
    gnorm = jnp.linalg.norm(grad_f(x)) / n
    return SVNResult(x, steps, gnorm)
