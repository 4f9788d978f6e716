"""Tests for the fused Pallas IRT kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import tt_from_dense, tt_irt_sqr
from tt_irt_tpu.ops.pallas_irt import pallas_irt_sqr


def _gauss_sqrt(grids, corr):
    d = len(grids)
    prec = np.eye(d) + corr * (np.eye(d, k=1) + np.eye(d, k=-1))
    mesh = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([m.ravel() for m in mesh], axis=1)
    e = np.einsum("mi,ij,mj->m", pts, prec, pts)
    return np.exp(-0.25 * e).reshape([len(g) for g in grids])


def test_pallas_kernel_matches_scan(rng):
    grids = [np.linspace(-3, 3, 17) for _ in range(4)]
    t = tt_from_dense(jnp.asarray(_gauss_sqrt(grids, 0.3)), eps=1e-12)
    q = jnp.asarray(rng.random((300, 4)))
    x64, l64 = tt_irt_sqr(grids, t, q)
    xp, lp = pallas_irt_sqr(grids, t, q, block=128, interpret=True)
    # f32-class agreement with the f64 scan result
    assert np.max(np.abs(np.asarray(xp, dtype=np.float64)
                         - np.asarray(x64))) < 5e-2
    assert np.max(np.abs(np.asarray(lp, dtype=np.float64)
                         - np.asarray(l64))) < 1e-3
    # moments agree tightly
    assert np.max(np.abs(np.asarray(xp).mean(0)
                         - np.asarray(x64).mean(0))) < 1e-3


def test_pallas_kernel_padding(rng):
    grids = [np.linspace(-2, 2, 9) for _ in range(3)]
    t = tt_from_dense(jnp.asarray(_gauss_sqrt(grids, 0.0)), eps=1e-12)
    q = jnp.asarray(rng.random((100, 3)))  # not a block multiple
    xp, lp = pallas_irt_sqr(grids, t, q, block=64, interpret=True)
    assert xp.shape == (100, 3)
    assert np.all(np.isfinite(np.asarray(xp)))
