"""Tests for MH/IW debiasing, diagnostics, QMC and reference measures."""

import jax
import jax.numpy as jnp
import numpy as np

from tt_irt_tpu import (
    essinv, hellinger, iact, iw_prune, mcmc_prune, qmcnodes, randref,
)
from tt_irt_tpu.samplers.reference import (
    tnormal_to_uniform, uniform_to_tnormal,
)


def numpy_mcmc_oracle(y, lfex, lfapp, u):
    """Direct transcription of the reference rejection loop
    (mcmc_prune.m:24-43) as the spec."""
    y = y.copy()
    lfex = lfex.copy()
    lfapp = lfapp.copy()
    nrej = 0
    for i in range(len(lfapp) - 1):
        alpha = np.exp(lfex[i + 1] - lfex[i] - lfapp[i + 1] + lfapp[i])
        if alpha < u[i]:
            y[i + 1] = y[i]
            lfex[i + 1] = lfex[i]
            lfapp[i + 1] = lfapp[i]
            nrej += 1
    return y, lfex, lfapp, nrej


def test_mcmc_prune_matches_oracle(rng):
    m, d = 500, 3
    y = rng.standard_normal((m, d))
    lfex = rng.standard_normal(m)
    lfapp = lfex + 0.3 * rng.standard_normal(m)
    u = rng.random(m - 1)
    res = mcmc_prune(y, lfex, lfapp, u=jnp.asarray(u))
    yo, leo, lao, nrejo = numpy_mcmc_oracle(y, lfex, lfapp, u)
    np.testing.assert_allclose(np.asarray(res.y), yo, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.lfex), leo, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.lfapp), lao, atol=1e-12)
    assert int(res.num_rejects) == nrejo


def test_mcmc_prune_perfect_proposal(rng):
    # identical densities: every proposal accepted
    m = 100
    y = rng.standard_normal((m, 2))
    lf = rng.standard_normal(m)
    res = mcmc_prune(y, lf, lf, key=jax.random.PRNGKey(0))
    assert int(res.num_rejects) == 0
    np.testing.assert_allclose(np.asarray(res.y), y)


def test_iw_prune(rng):
    m = 2000
    lfapp = rng.standard_normal(m)
    lfex = lfapp.copy()  # perfect proposal
    res = iw_prune(lfex, lfapp)
    np.testing.assert_allclose(float(res.isstd), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(res.max_ratio), 1.0, atol=1e-12)
    # QoI weighting: columns beyond 0 scaled by normalized ratio
    qoi = rng.standard_normal(m)
    lf2 = np.stack([lfex, qoi], axis=1)
    res2 = iw_prune(lf2, lfapp)
    np.testing.assert_allclose(np.asarray(res2.lfex[:, 1]), qoi, atol=1e-12)


def test_essinv_hellinger(rng):
    m = 5000
    lfapp = rng.standard_normal(m)
    np.testing.assert_allclose(float(essinv(lfapp, lfapp)), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(hellinger(lfapp, lfapp)), 0.0,
                               atol=1e-12)
    # a slightly perturbed proposal has N/ESS = E[w^2]/E[w]^2 > 1
    lfex = lfapp + 0.1 * rng.standard_normal(m)
    tau = float(essinv(lfex, lfapp))
    assert 1.0 < tau < 1.2


def test_iact_iid_and_correlated(rng):
    n = 20000
    x = rng.standard_normal(n)
    assert abs(iact(x) - 1.0) < 0.3
    # AR(1) with phi: exact IACT (2tau convention) = (1+phi)/(1-phi)
    phi = 0.8
    ar = np.empty(n)
    ar[0] = 0.0
    eps = rng.standard_normal(n)
    for i in range(1, n):
        ar[i] = phi * ar[i - 1] + eps[i]
    est = iact(ar)
    expect = (1 + phi) / (1 - phi)  # = 9
    assert abs(est - expect) / expect < 0.3, (est, expect)


def test_qmc_stratification(rng):
    pts = qmcnodes(5, 10, seed=1)
    assert pts.shape == (1024, 5)
    assert pts.min() >= 0 and pts.max() < 1
    # QMC means converge much faster than sqrt(N)
    assert np.all(np.abs(pts.mean(axis=0) - 0.5) < 0.01)
    lat = qmcnodes(5, 10, seed=1, method="lattice")
    assert lat.shape == (1024, 5)
    assert np.all(np.abs(lat.mean(axis=0) - 0.5) < 0.05)


def test_randref_tnormal_roundtrip(rng):
    u = rng.random((1000, 3))
    z = uniform_to_tnormal(jnp.asarray(u), 4.0)
    assert float(jnp.max(jnp.abs(z))) <= 4.0 + 1e-9
    u2 = tnormal_to_uniform(z, 4.0)
    np.testing.assert_allclose(np.asarray(u2), u, atol=1e-9)
    # randref with key draws inside the support
    y = randref("normal 3", jax.random.PRNGKey(0), (500, 2))
    assert float(jnp.max(jnp.abs(y))) <= 3.0
    # uniform passthrough of given points (QMC transform mode)
    np.testing.assert_allclose(np.asarray(randref("uniform", u)), u)


def test_rejection_histogram():
    """Rejection-lag histogram parity (mcmc_prune.m:34-42): oracle
    recomputation with an explicit loop."""
    import numpy as np
    from tt_irt_tpu.samplers.debias import rejection_histogram

    rng = np.random.default_rng(3)
    acc = rng.random(200) < 0.6
    acc[0] = True
    hist = rejection_histogram(acc)
    # reference-style loop oracle
    expect = {}
    seq = 0
    for i in range(1, len(acc)):
        if not acc[i]:
            seq += 1
        elif seq > 0:
            expect[seq] = expect.get(seq, 0) + 1
            seq = 0
    oracle = np.zeros(max(expect) if expect else 0, np.int64)
    for k, v in expect.items():
        oracle[k - 1] = v
    np.testing.assert_array_equal(hist, oracle)


def test_mcmc_prune_returns_histogram():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tt_irt_tpu import mcmc_prune

    m = 500
    y = jnp.asarray(np.random.default_rng(0).standard_normal((m, 2)))
    lfex = -0.5 * jnp.sum(y * y, axis=1)
    lfapp = jnp.zeros((m,))
    res = mcmc_prune(y, lfex, lfapp, key=jax.random.PRNGKey(1))
    assert res.rej_hist is not None
    assert int(np.sum(res.rej_hist * np.arange(
        1, len(res.rej_hist) + 1))) <= int(res.num_rejects)


def test_cbc_lattice_exact_and_effective():
    """Fast CBC (FFT over the {+-5^a} group layers) must equal the
    naive O(N^2) CBC error evaluation exactly, and the constructed
    lattice must beat MC on a smooth integrand (the construction that
    replaces the reference's downloaded Kuo vector, qmcnodes.m:4)."""
    from tt_irt_tpu.samplers.qmc import _omega_alpha2, cbc_lattice

    m, d = 7, 5
    n = 1 << m
    om = _omega_alpha2(n)
    kk = np.arange(n)
    z = cbc_lattice(m, d)
    assert z[0] == 1 and all(v % 2 == 1 for v in z)
    # each component must be a global minimizer of the CBC objective
    gamma = np.arange(1, d + 1, dtype=float) ** -2.0
    p = 1.0 + gamma[0] * om
    for s in range(1, d):
        errs = np.array([np.sum(om[(kk * c) % n] * p)
                         for c in range(1, n, 2)])
        mine = np.sum(om[(kk * z[s]) % n] * p)
        assert mine <= errs.min() + 1e-9 * abs(errs.min())
        p = p * (1.0 + gamma[s] * om[(kk * z[s]) % n])
    # integration quality: randomized lattice beats MC on smooth f
    d2, log2n = 6, 12
    pts = qmcnodes(d2, log2n, seed=3, method="lattice")
    mc = np.random.default_rng(4).random((1 << log2n, d2))

    def f(x):
        return np.prod(1.0 + (x - 0.5) * np.sin(3 * x), axis=1)

    xq, wq = np.polynomial.legendre.leggauss(50)
    xq, wq = 0.5 * (xq + 1), 0.5 * wq
    exact = np.sum(wq * (1.0 + (xq - 0.5) * np.sin(3 * xq))) ** d2
    assert abs(f(pts).mean() - exact) < 0.1 * abs(f(mc).mean() - exact)


def test_iact_ar1_known_autocorrelation():
    """UWerr Gamma-method validation against AR(1) chains whose IACT is
    exactly (1+phi)/(1-phi) (VERDICT: window logic + error estimate)."""
    from tt_irt_tpu.samplers.diagnostics import iact

    rng = np.random.default_rng(0)
    n = 100_000
    for phi in (0.0, 0.7, 0.9):
        e = rng.standard_normal(n)
        x = np.empty(n)
        x[0] = e[0]
        for i in range(1, n):
            x[i] = phi * x[i - 1] + e[i]
        est, err = iact(x, return_error=True)
        exact = (1 + phi) / (1 - phi)
        assert abs(est - exact) < max(5 * err, 0.2 * exact + 0.1), \
            (phi, est, err)
        if phi > 0:
            assert err > 0
