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


def _rand_tt_stack(d, n, r, seed=0):
    from tt_irt_tpu import TT
    from tt_irt_tpu.samplers.irt_scan import stack_padded

    rng = np.random.default_rng(seed)
    x = np.linspace(-6, 6, n)
    cores = []
    for k in range(d):
        r1 = 1 if k == 0 else r
        r2 = 1 if k == d - 1 else r
        c = np.exp(-(x[None, :, None] ** 2) / 14.0) * \
            rng.uniform(0.2, 1.0, (r1, 1, r2))
        cores.append(jnp.asarray(np.broadcast_to(c, (r1, n, r2)).copy()))
    tt = TT(cores)
    return stack_padded(tt, [jnp.asarray(x)] * d)


@pytest.mark.parametrize("fused", [1, 2])
def test_fused_step_levels_match_hi(rng, fused):
    """TTIRT_FUSED_STEP levels (1 = narrow contraction kernels, 2 =
    whole-dim CDF kernel cdf_bracket_factor) against the XLA 'hi' path
    (interpret mode on CPU).  Level 2 re-rounds the bracket targets in
    f32 (see its docstring) — tolerance is the serve-CDF error budget,
    not bitwise."""
    from tt_irt_tpu.samplers.irt_scan import _irt_scan_one

    cs, xs = _rand_tt_stack(8, 17, 9, seed=5)
    q = jnp.asarray(rng.random((400, 8)))
    # deep-tail seeds stress the two-sided inversion
    q = q.at[0, :].set(1e-9).at[1, :].set(1.0 - 1e-9)
    o_ref, lf_ref = _irt_scan_one("sqr", cs, xs, q, precision="hi",
                                  fused=0)
    o_f, lf_f = _irt_scan_one("sqr", cs, xs, q, precision="hi",
                              fused=fused)
    assert float(jnp.max(jnp.abs(o_f - o_ref))) < 2e-5
    assert float(jnp.max(jnp.abs(lf_f - lf_ref))) < 2e-4
    # rt-mode roundtrip through the same fused level
    xq, _ = _irt_scan_one("rt", cs, xs, o_f, precision="hi",
                          fused=fused)
    assert float(jnp.max(jnp.abs(xq - q))) < 1e-6
