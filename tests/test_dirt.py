"""Tests for DIRT construction and deep sampling.

Strategy: targets with analytic structure (correlated Gaussians) so the
pushforward quality is measurable exactly; resume semantics; the
reference's ESS self-test gate; and the uniform/truncated-normal
reference variants (tt_dirt_approx.m capabilities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import (
    DIRT, essinv, hellinger, mcmc_prune, tt_dirt_approx, tt_dirt_inverse,
    tt_dirt_sample,
)


def banded_gauss_logpost(x, corr=0.5):
    quad = jnp.sum(x * x, axis=1) + \
        2.0 * corr * jnp.sum(x[:, :-1] * x[:, 1:], axis=1)
    return -0.5 * quad


def logratio(x, b0, b1, corr=0.5):
    return (b1 - b0) * banded_gauss_logpost(x, corr)


D = 4
GRIDS = [np.linspace(-5, 5, 17) for _ in range(D)]
BETA = [0.1, 0.3, 1.0]


@pytest.fixture(scope="module")
def trained_dirt():
    return tt_dirt_approx(
        GRIDS, logratio, BETA, stoptol=0.1, nswp=3, kickrank=2,
        testsamples=512, verb=0, seed=3)


def test_dirt_quality(trained_dirt):
    key = jax.random.PRNGKey(7)
    q = jax.random.uniform(key, (4096, D), dtype=jnp.float64)
    z, lfapp, lfex = tt_dirt_sample(
        trained_dirt, q, lambda x: logratio(x, 0.0, 1.0))
    tau = float(essinv(lfex, lfapp))
    hl = float(hellinger(lfex, lfapp))
    assert tau < 1.5, tau
    assert hl < 0.25, hl
    res = mcmc_prune(z, lfex, lfapp, key=jax.random.PRNGKey(8))
    rej = float(res.num_rejects) / q.shape[0]
    assert rej < 0.25, rej
    # posterior covariance check
    prec = np.eye(D) + 0.5 * (np.eye(D, k=1) + np.eye(D, k=-1))
    cov = np.linalg.inv(prec)
    emp = np.cov(np.asarray(res.y).T)
    assert np.max(np.abs(emp - cov)) < 0.15


def test_dirt_inverse_roundtrip(trained_dirt):
    key = jax.random.PRNGKey(11)
    q = jax.random.uniform(key, (256, D), dtype=jnp.float64,
                           minval=0.01, maxval=0.99)
    z, lf = tt_dirt_sample(trained_dirt, q)
    q2, lf2 = tt_dirt_inverse(trained_dirt, z)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lf2), np.asarray(lf), atol=1e-6)


def test_dirt_resume_appends_levels(trained_dirt):
    # build first two levels, then extend with the full ladder
    partial = tt_dirt_approx(
        GRIDS, logratio, BETA[:2], stoptol=0.1, nswp=3, kickrank=2,
        testsamples=256, verb=0, seed=3)
    assert partial.nlevels == 1
    full = tt_dirt_approx(
        GRIDS, logratio, BETA, stoptol=0.1, nswp=3, kickrank=2,
        testsamples=256, verb=0, seed=3, irtstruct=partial)
    assert full.nlevels == 2
    assert np.allclose(np.asarray(full.beta), BETA)
    q = jax.random.uniform(jax.random.PRNGKey(1), (512, D),
                           dtype=jnp.float64)
    z, lfapp, lfex = tt_dirt_sample(
        full, q, lambda x: logratio(x, 0.0, 1.0))
    assert float(essinv(lfex, lfapp)) < 2.0


def test_dirt_resume_rejects_mismatches(trained_dirt):
    # the checkpoint is authoritative: wrong grids / ladders / references
    # must fail loudly instead of silently re-gridding existing levels
    with pytest.raises(ValueError, match="shorter"):
        tt_dirt_approx(GRIDS, logratio, BETA[:1], testsamples=0,
                       irtstruct=trained_dirt)
    with pytest.raises(ValueError, match="prefix"):
        tt_dirt_approx(GRIDS, logratio, [0.2, 0.3, 1.0], testsamples=0,
                       irtstruct=trained_dirt)
    bad_grids = [np.linspace(-4, 4, 17) for _ in range(D)]
    with pytest.raises(ValueError, match="x0 grids"):
        tt_dirt_approx(bad_grids, logratio, BETA, testsamples=0,
                       irtstruct=trained_dirt)
    with pytest.raises(ValueError, match="reference"):
        tt_dirt_approx(GRIDS, logratio, BETA, testsamples=0,
                       reference="normal 4", irtstruct=trained_dirt)
    with pytest.raises(ValueError, match="nq="):
        tt_dirt_approx(GRIDS, logratio, list(BETA) + [1.0001],
                       testsamples=0, nq=[12] * D, irtstruct=trained_dirt)


def test_dirt_passes_jit_boundary(trained_dirt):
    # the DIRT pytree must be a valid jit argument: aux data (evalcnt)
    # hashable, fprev arrays in the leaves
    from tt_irt_tpu.samplers.irt import _canon_grid, _irt_sqr_jit

    @jax.jit
    def level0_push(dirt, q):
        gs, tt2 = _canon_grid(dirt.x0, dirt.f0)
        return _irt_sqr_jit(gs, tt2, q)

    q = jax.random.uniform(jax.random.PRNGKey(4), (32, D),
                           dtype=jnp.float64)
    z, lf = level0_push(trained_dirt, q)
    assert z.shape == (32, D)
    assert np.all(np.isfinite(np.asarray(z)))


def test_dirt_normal_reference():
    dirt = tt_dirt_approx(
        GRIDS, logratio, BETA, stoptol=0.15, nswp=3, kickrank=2,
        testsamples=512, verb=0, seed=5, reference="normal 4", nq=[17] * D)
    assert dirt.sigma == 4.0
    key = jax.random.PRNGKey(2)
    from tt_irt_tpu import randref

    q = randref("normal 4", key, (2048, D))
    z, lfapp, lfex = tt_dirt_sample(
        dirt, q, lambda x: logratio(x, 0.0, 1.0))
    tau = float(essinv(lfex, lfapp))
    assert tau < 2.0, tau


def test_dirt_is_pytree(trained_dirt):
    leaves = jax.tree_util.tree_leaves(trained_dirt)
    assert len(leaves) > 0
    rebuilt = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(trained_dirt), leaves)
    assert isinstance(rebuilt, DIRT)
    q = jax.random.uniform(jax.random.PRNGKey(0), (64, D),
                           dtype=jnp.float64)
    z1, l1 = tt_dirt_sample(trained_dirt, q)
    z2, l2 = tt_dirt_sample(rebuilt, q)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


def test_dirt_ess_gate_raises():
    # an impossible quality gate must trigger the bounded-recompute error
    with pytest.raises(RuntimeError, match="giving up"):
        tt_dirt_approx(
            GRIDS, logratio, BETA, stoptol=0.5, nswp=1, kickrank=0, y0=1,
            testsamples=256, verb=0, seed=0, recompute=1.0 + 1e-9)


def test_dirt_irtdenom():
    # IRT-density-denominator ratio mode (tt_dirt_approx.m:30-31,463-479)
    dirt = tt_dirt_approx(
        GRIDS, logratio, BETA, stoptol=0.1, nswp=3, kickrank=2,
        testsamples=512, verb=0, seed=4, irtdenom=True)
    q = jax.random.uniform(jax.random.PRNGKey(9), (2048, D),
                           dtype=jnp.float64)
    z, lfapp, lfex = tt_dirt_sample(
        dirt, q, lambda x: logratio(x, 0.0, 1.0))
    assert float(essinv(lfex, lfapp)) < 2.0


def test_dirt_fused_matches_loop(trained_dirt):
    """The fused whole-stack program (dirt_scan.py) must reproduce the
    host-side level loop exactly (same kernels, same order)."""
    from tt_irt_tpu.samplers.dirt_scan import can_fuse

    assert can_fuse(trained_dirt, D)
    q = jax.random.uniform(jax.random.PRNGKey(11), (512, D),
                           dtype=jnp.float64)
    z1, lf1 = tt_dirt_sample(trained_dirt, q, use_fused=False)
    z2, lf2 = tt_dirt_sample(trained_dirt, q, use_fused=True)
    assert float(jnp.max(jnp.abs(z1 - z2))) < 1e-12
    assert float(jnp.max(jnp.abs(lf1 - lf2))) < 1e-10


def test_dirt_fused_normal_reference_and_precisions():
    """Fused path with truncated-normal maps between levels, at every
    reduced precision (sample parity vs the f64 loop)."""
    dirt = tt_dirt_approx(
        GRIDS, logratio, BETA, stoptol=0.1, nswp=2, kickrank=2,
        reference="n3", testsamples=256, verb=0, seed=5)
    from tt_irt_tpu import randref

    q = randref("n3", jax.random.PRNGKey(13), (512, D))
    z1, lf1 = tt_dirt_sample(dirt, q, use_fused=False)
    z2, lf2 = tt_dirt_sample(dirt, q, use_fused=True)
    assert float(jnp.max(jnp.abs(z1 - z2))) < 1e-12
    for prec, tol in [("mixed", 5e-5), ("hi", 5e-5), ("f32", 5e-4)]:
        z3, _ = tt_dirt_sample(dirt, q, precision=prec, use_fused=True)
        assert float(jnp.max(jnp.abs(z1 - z3))) < tol, prec


def test_dirt_level_marginal_diagnostics(trained_dirt):
    """Structured per-level marginal diagnostics (the reference's
    plotdiag curves, tt_dirt_approx.m:202-252, without plotting)."""
    from tt_irt_tpu import tt_marginals
    from tt_irt_tpu.ops.tt import tt_full

    for f in [trained_dirt.f0] + list(trained_dirt.fs):
        m1, m2 = tt_marginals(f, pair=(0, 1))
        full = np.asarray(tt_full(f))
        for k in range(f.d):
            ax = tuple(a for a in range(f.d) if a != k)
            np.testing.assert_allclose(m1[k], full.sum(axis=ax),
                                       rtol=1e-10)
        np.testing.assert_allclose(
            m2, full.sum(axis=tuple(range(2, f.d))), rtol=1e-10)


def test_dirt_build_history(trained_dirt, tmp_path):
    """The structured construction trace (the inspectable analog of the
    reference's live per-level diagnostics, tt_dirt_approx.m:354-412):
    one record per cross attempt with gate stats and the test chain's
    marginal evolution; persisted by save_dirt/load_dirt; not a pytree
    leaf (a jitted copy carries history=None)."""
    h = trained_dirt.history
    assert h is not None and len(h) >= len(BETA)
    accepted = [r for r in h if r["accepted"]]
    assert [r["level"] for r in accepted] == list(range(len(BETA)))
    assert [r["beta"] for r in accepted] == list(BETA)
    for r in h:
        assert r["evals"] > 0 and len(r["ranks"]) == D + 1
        assert r["tau"] is None or np.isfinite(r["tau"])
        if "marginal_mean" in r:
            assert len(r["marginal_mean"]) == D
            assert all(np.isfinite(v) for v in r["marginal_mean"])
            assert all(v > 0 for v in r["marginal_std"])
    # levels >= 1 carry the gate stats
    for r in accepted[1:]:
        assert np.isfinite(r["hellinger"]) and 0 <= r["reject_rate"] <= 1
    # checkpoint roundtrip preserves the trace verbatim
    from tt_irt_tpu.utils.checkpoint import load_dirt, save_dirt

    path = str(tmp_path / "hist_ck")
    save_dirt(path, trained_dirt)
    assert load_dirt(path).history == h
    # pytree flatten drops it (host metadata, not traced state)
    leaves, aux = trained_dirt.tree_flatten()
    rebuilt = DIRT.tree_unflatten(aux, leaves)
    assert rebuilt.history is None


def test_dirt_sampler_matches_sample(trained_dirt):
    """DirtSampler (prepare-once serving handle) must reproduce
    tt_dirt_sample exactly: same kernels, hoisted preparation."""
    from tt_irt_tpu import DirtSampler

    q = jax.random.uniform(jax.random.PRNGKey(11), (512, D),
                           dtype=jnp.float64)
    for prec in ("f64", "hi"):
        z0, lf0 = tt_dirt_sample(trained_dirt, q, precision=prec)
        sampler = DirtSampler(trained_dirt, precision=prec)
        z1, lf1 = sampler(q)
        assert np.array_equal(np.asarray(z0), np.asarray(z1)), prec
        assert np.array_equal(np.asarray(lf0), np.asarray(lf1)), prec
    # repeated calls reuse the cached prep and stay deterministic
    z2, lf2 = sampler(q)
    assert np.array_equal(np.asarray(z1), np.asarray(z2))


def test_dirt_sampler_ragged_ranks(trained_dirt):
    """Rank-bucketed (ragged) serving: levels padded only to their
    bucket rank must reproduce global-max padding to working precision
    (padding is not bitwise-neutral: XLA regroups reduction trees per
    shape — measured 2.7e-15 on the f64 prep), while a rounded level's
    prep actually carries the smaller rank — the serve-cost lever
    dirt_round feeds (VERDICT r03 task 2b)."""
    from tt_irt_tpu import DirtSampler
    from tt_irt_tpu.ops.tt import tt_round

    # force genuinely different level ranks: crush level 1 to rank 2
    fs = [tt_round(trained_dirt.fs[0], 0.0, rmax=2)] + \
        list(trained_dirt.fs[1:])
    dirt = DIRT(trained_dirt.f0, fs, trained_dirt.x0, trained_dirt.x,
                trained_dirt.beta, trained_dirt.lfshift,
                trained_dirt.reference, trained_dirt.interpolation)
    q = jax.random.uniform(jax.random.PRNGKey(13), (512, D),
                           dtype=jnp.float64)
    s_global = DirtSampler(dirt, precision="hi", ragged_step=0)
    s_ragged = DirtSampler(dirt, precision="hi", ragged_step=1)
    # the ragged sampler's level-0 prep is genuinely smaller
    sz_ragged = sum(a.size for a in
                    jax.tree_util.tree_leaves(s_ragged._upper[1][0]))
    sz_global = sum(a.size for a in
                    jax.tree_util.tree_leaves(s_global._upper[1][0]))
    assert sz_ragged < sz_global, (sz_ragged, sz_global)
    z0, lf0 = s_global(q)
    z1, lf1 = s_ragged(q)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lf0), np.asarray(lf1),
                               atol=1e-4)
    # the default-step sampler matches the one-shot serve path bitwise
    # (identical bucketing, samplers/dirt.py _prepare_level_preps)
    z2, lf2 = tt_dirt_sample(dirt, q, precision="hi")
    s_def = DirtSampler(dirt, precision="hi")
    z3, lf3 = s_def(q)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z3))
    np.testing.assert_array_equal(np.asarray(lf2), np.asarray(lf3))


def test_tnormal_poly_map_parity():
    """The double-single Chebyshev truncated-normal map (the TPU
    default — the emulated-f64 erf cost 1.47 s of a 10.6 s deep serve,
    round-4 attribution) must match the f64 erf map to ~1e-14
    absolute over the full support, for every sigma the examples
    use."""
    import math

    from tt_irt_tpu.samplers import reference as rf

    for sig in (3.0, 4.0):
        z = jnp.asarray(np.linspace(-sig, sig, 100001))
        u_erf = jax.scipy.special.erf(z / math.sqrt(2.0)) \
            * rf._cdf_factor(sig) + 0.5
        u_poly = rf._tnormal_to_uniform_poly(z, sig)
        assert float(jnp.max(jnp.abs(u_poly - u_erf))) < 5e-14


def test_dirt_sampler_normal_reference_and_auto():
    from tt_irt_tpu import DirtSampler, randref

    dirt = tt_dirt_approx(
        GRIDS, logratio, BETA, stoptol=0.15, nswp=3, kickrank=2,
        testsamples=512, verb=0, seed=5, reference="normal 4",
        nq=[17] * D)
    q = randref("normal 4", jax.random.PRNGKey(3), (1024, D))
    z0, lf0 = tt_dirt_sample(dirt, q, precision="hi")
    s = DirtSampler(dirt, precision="auto")
    assert s.precision == "f32"  # d=4 < 40: depth policy picks f32
    s_hi = DirtSampler(dirt, precision="hi")
    z1, lf1 = s_hi(q)
    assert np.array_equal(np.asarray(z0), np.asarray(z1))
    assert np.array_equal(np.asarray(lf0), np.asarray(lf1))


def test_dirt_round(trained_dirt):
    """dirt_round: tiny eps preserves the sampled transport nearly
    exactly; coarse eps shrinks ranks.  Serve-side rank/quality knob
    (no reference analog — the IRTstruct is served as-built)."""
    from tt_irt_tpu import dirt_round, tt_dirt_sample

    q = jnp.asarray(np.random.default_rng(5).uniform(size=(256, D)))
    z0, lf0 = tt_dirt_sample(trained_dirt, q)
    tight = dirt_round(trained_dirt, 1e-12)
    z1, lf1 = tt_dirt_sample(tight, q)
    assert float(jnp.max(jnp.abs(z1 - z0))) < 1e-8
    coarse = dirt_round(trained_dirt, 0.2)
    total0 = sum(sum(r * r for r in t.ranks)
                 for t in [trained_dirt.f0, *trained_dirt.fs])
    total1 = sum(sum(r * r for r in t.ranks)
                 for t in [coarse.f0, *coarse.fs])
    assert total1 < total0
    z2, _ = tt_dirt_sample(coarse, q)
    assert np.isfinite(np.asarray(z2)).all()
