"""Batched gather-GEMM primitive (`tracemult` parity).

The reference's hot C kernel (matlab/utils/tracemult.c, MATLAB fallback
tracemultm.m) computes ``C[:, :, i] = A[:, :, i] @ B[:, :, j[i]]`` —
batched matmul with a gather on B's batch index — and the 2-argument
gather ``C[i] = A[i, j[i]]``.  The samplers here never call it (their
contraction chains are fused einsums), but the primitive is part of the
reference's public utility surface, so it is provided for parity and
for user code built on it.

Layout note: the reference uses MATLAB (n1, n2, batch) arrays; here the
batch axis leads — (batch, n1, n2) — which is the JAX-native layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tracemult", "tracemult_gather"]


@jax.jit
def tracemult(a, b, j=None):
    """C[i] = A[i] @ B[j[i]] (j defaults to arange: plain batched matmul).

    a: (M, p, q); b: (K, q, r); j: (M,) int indices into b's batch.
    Returns (M, p, r).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if j is not None:
        b = jnp.take(b, jnp.asarray(j), axis=0)
    return jnp.einsum("ipq,iqr->ipr", a, b)


@jax.jit
def tracemult_gather(a, j):
    """C[i] = A[i, j[i]] (the reference's 2-argument form,
    tracemult.c 2-arg path used for the CDF bisection gathers)."""
    a = jnp.asarray(a)
    j = jnp.asarray(j)
    return jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]
