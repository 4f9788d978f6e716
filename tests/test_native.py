"""Cross-validation of the native C++ IRT kernel against the JAX path."""

import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import tt_from_dense, tt_irt_lin, tt_irt_sqr
from tt_irt_tpu.native import build_native, native_available, tt_irt_native


pytestmark = pytest.mark.skipif(
    not (build_native() and native_available()),
    reason="g++/OpenMP build unavailable")


def _gauss(grids, corr):
    d = len(grids)
    prec = np.eye(d) + corr * (np.eye(d, k=1) + np.eye(d, k=-1))
    mesh = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([m.ravel() for m in mesh], axis=1)
    e = np.einsum("mi,ij,mj->m", pts, prec, pts)
    return np.exp(-0.5 * e).reshape([len(g) for g in grids])


def test_native_matches_jax_lin(rng):
    grids = [np.linspace(-3, 3, 13) for _ in range(3)]
    t = tt_from_dense(jnp.asarray(_gauss(grids, 0.4)), eps=1e-12)
    q = rng.random((256, 3))
    xn, ln = tt_irt_native(grids, t, q, mode="lin")
    xj, lj = tt_irt_lin(grids, t, jnp.asarray(q))
    np.testing.assert_allclose(xn, np.asarray(xj), atol=1e-10)
    np.testing.assert_allclose(ln, np.asarray(lj), atol=1e-8)


def test_native_matches_jax_sqr(rng):
    grids = [np.linspace(-3, 3, 15) for _ in range(4)]
    t = tt_from_dense(jnp.asarray(np.sqrt(_gauss(grids, -0.3))), eps=1e-13)
    q = rng.random((256, 4))
    xn, ln = tt_irt_native(grids, t, q, mode="sqr")
    xj, lj = tt_irt_sqr(grids, t, jnp.asarray(q))
    np.testing.assert_allclose(xn, np.asarray(xj), atol=1e-10)
    np.testing.assert_allclose(ln, np.asarray(lj), atol=1e-8)
