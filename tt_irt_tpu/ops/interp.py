"""Interpolation utilities: dense Lagrange matrices and TT evaluation at
arbitrary points.

Reference: matlab/utils/lagrange_interpolant.m (log-space barycentric
products for overflow safety) and matlab/utils/tt_sample_lagr.m (per-
sample sequential core contraction — here one batched gather/matmul
chain over all samples at once).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .tt import TT

__all__ = ["lagrange_matrix", "tt_sample_lagrange"]


def lagrange_matrix(x, y):
    """Dense Lagrange interpolation matrix L with f(y) ~= L @ f(x).

    Log-space products (reference lagrange_interpolant.m:17-27): products
    of many |y - x_j| factors overflow/underflow; accumulate logs and
    signs instead.
    """
    x = jnp.asarray(x).reshape(-1)
    y = jnp.asarray(y).reshape(-1)
    n = x.shape[0]
    diff_yx = y[:, None] - x[None, :]                  # (m, n)
    diff_xx = x[:, None] - x[None, :]                  # (n, n)
    eye = jnp.eye(n, dtype=bool)
    logw = jnp.sum(jnp.log(jnp.abs(jnp.where(eye, 1.0, diff_xx))), axis=1)
    sgnw = jnp.prod(jnp.where(eye, 1.0, jnp.sign(diff_xx)), axis=1)
    # numerator: product over j != i of (y - x_j)
    log_num_all = jnp.sum(jnp.log(jnp.abs(
        jnp.where(diff_yx == 0.0, 1.0, diff_yx))), axis=1)  # (m,)
    sgn_num_all = jnp.prod(jnp.sign(
        jnp.where(diff_yx == 0.0, 1.0, diff_yx)), axis=1)
    safe = jnp.where(diff_yx == 0.0, 1.0, diff_yx)
    log_num = log_num_all[:, None] - jnp.log(jnp.abs(safe))
    sgn_num = sgn_num_all[:, None] * jnp.sign(safe)
    lmat = sgn_num * jnp.exp(log_num - logw[None, :]) / sgnw[None, :]
    # exact hit: y == x_i -> row is the unit vector
    hit = diff_yx == 0.0
    any_hit = jnp.any(hit, axis=1, keepdims=True)
    lmat = jnp.where(any_hit, hit.astype(lmat.dtype), lmat)
    return lmat


def tt_sample_lagrange(t: TT, grids: Sequence, points) -> jnp.ndarray:
    """Evaluate a TT tensor at arbitrary continuous points via per-dim
    Lagrange interpolation.  points: (M, d) -> values (M,) (or (M, b)
    for block tensors with right boundary rank b > 1).

    The reference loops over samples (tt_sample_lagr.m:34-50); here the
    interpolation matrices are applied to all samples as one batched
    contraction chain per dimension.
    """
    points = jnp.asarray(points)
    m = points.shape[0]
    r0 = t.cores[0].shape[0]
    prefix = jnp.ones((m, r0), dtype=t.dtype)
    for k in range(t.d):
        lmat = lagrange_matrix(grids[k], points[:, k])   # (M, n)
        # contract: prefix (M, r1), core (r1, n, r2), lmat (M, n)
        pc = jnp.einsum("ma,anb->mnb", prefix, t.cores[k])
        prefix = jnp.einsum("mnb,mn->mb", pc, lmat)
    if prefix.shape[1] == 1:
        return prefix[:, 0]
    return prefix
