"""Tests for the IRT/RT transforms.

Oracle strategy (SURVEY.md §4): a straightforward per-sample numpy
implementation of the linear-spline CDF inversion serves as the algorithm
spec; the vectorized JAX kernels must reproduce it to fp tolerance.  On
top: the inverse-function property rt(irt(q)) == q, and statistical
agreement of sample moments with analytic densities.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tt_irt_tpu import TT, tt_from_dense, tt_irt_lin, tt_irt_sqr, tt_rt_sqr


# ---------------------------------------------------------------------------
# numpy oracle: linear-spline IRT for a dense density on a grid
# ---------------------------------------------------------------------------

def oracle_irt_dense(grids, dens, q):
    """Per-sample inverse Rosenblatt of a dense density array (d dims)."""
    d = len(grids)
    m = q.shape[0]
    out = np.zeros((m, d))
    lf = np.zeros(m)
    for s in range(m):
        cond = dens.copy()
        for k in range(d):
            x = grids[k]
            n = len(x)
            # marginalize remaining dims by trapezoid
            f = cond
            for j in range(d - 1, k, -1):
                xj = grids[j]
                w = np.zeros(len(xj))
                w[:-1] += 0.5 * np.diff(xj)
                w[1:] += 0.5 * np.diff(xj)
                f = np.tensordot(f, w, axes=([f.ndim - 1], [0]))
            f = np.maximum(f, 0.0)
            h = np.diff(x)
            dc = 0.5 * (f[:-1] + f[1:]) * h
            c = np.concatenate([[0.0], np.cumsum(dc)])
            if c[-1] <= 0:
                f = np.ones(n)
                c = np.concatenate([[0.0], np.cumsum(h)])
            fn = f / c[-1]
            cn = c / c[-1]
            qk = q[s, k]
            i0 = int(np.searchsorted(cn, qk, side="right")) - 1
            i0 = min(max(i0, 0), n - 2)
            # force reference bracket convention (q > C moves left edge)
            while i0 > 0 and cn[i0] >= qk:
                i0 -= 1
            while i0 < n - 2 and cn[i0 + 1] < qk:
                i0 += 1
            x1, x2 = x[i0], x[i0 + 1]
            f1, f2, c1 = fn[i0], fn[i0 + 1], cn[i0]
            a = 0.5 * (f2 - f1) / (x2 - x1)
            if a == 0.0:
                xk = x1 if f1 == 0.0 else x1 + (qk - c1) / f1
            else:
                disc = f1 * f1 + 4 * a * (qk - c1)
                xk = x1 + (-f1 + np.sqrt(abs(disc))) / (2 * a)
            xk = min(max(xk, x1), x2)
            out[s, k] = xk
            la = (x2 - xk) / (x2 - x1)
            lb = (xk - x1) / (x2 - x1)
            lf[s] += np.log(f1 * la + f2 * lb)
            # condition the density on x_k = xk by linear interpolation
            cond = cond[i0] * la + cond[i0 + 1] * lb
    return out, lf


def _gauss_density(grids, corr=0.0):
    """Correlated Gaussian on a tensor grid (dense)."""
    d = len(grids)
    cov = np.eye(d) + corr * (np.ones((d, d)) - np.eye(d))
    prec = np.linalg.inv(cov)
    mesh = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([m.ravel() for m in mesh], axis=1)
    e = np.einsum("mi,ij,mj->m", pts, prec, pts)
    return np.exp(-0.5 * e).reshape([len(g) for g in grids])


def test_irt_lin_matches_oracle(rng):
    grids = [np.linspace(-3, 3, 13), np.linspace(-3, 3, 17),
             np.linspace(-3, 3, 11)]
    dens = _gauss_density(grids, corr=0.4)
    t = tt_from_dense(jnp.asarray(dens), eps=1e-12)
    q = rng.random((64, 3))
    xq, lf = tt_irt_lin(grids, t, jnp.asarray(q))
    xo, lo = oracle_irt_dense(grids, dens, q)
    np.testing.assert_allclose(np.asarray(xq), xo, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lf), lo, atol=1e-8)


def test_irt_sqr_matches_oracle(rng):
    grids = [np.linspace(-3, 3, 15), np.linspace(-3, 3, 15)]
    dens = _gauss_density(grids, corr=-0.3)
    # sqr sampler works on sqrt(density); its implied density is the
    # square of the TT interpolant -> oracle on the squared interpolant
    # only matches where sqrt is exactly TT-represented; use rank-full TT.
    t = tt_from_dense(jnp.asarray(np.sqrt(dens)), eps=1e-14)
    q = rng.random((48, 2))
    xq, lf = tt_irt_sqr(grids, t, jnp.asarray(q))
    # oracle: dense *squared* density of the same interpolant values
    sq = np.asarray(np.sqrt(dens))
    xo, _ = oracle_irt_sqr_dense(grids, sq, q)
    np.testing.assert_allclose(np.asarray(xq), xo, atol=1e-8)


def oracle_irt_sqr_dense(grids, sqrt_dens, q):
    """Oracle for the squared sampler: the conditional marginal at dim k is
    the trapezoid-weighted sum of *squared* conditioned nodal values over
    the trailing dims (the Gram semi-marginal of tt_irt_sqr.m:63-80 in
    dense form); conditioning interpolates the sqrt values linearly."""
    d = len(grids)
    m = q.shape[0]
    out = np.zeros((m, d))
    lf = np.zeros(m)
    for s in range(m):
        cond = sqrt_dens.copy()
        for k in range(d):
            x = grids[k]
            n = len(x)
            f = cond ** 2
            for j in range(cond.ndim - 1, 0, -1):
                xj = grids[k + j]
                w = np.zeros(len(xj))
                w[:-1] += 0.5 * np.diff(xj)
                w[1:] += 0.5 * np.diff(xj)
                f = np.tensordot(f, w, axes=([f.ndim - 1], [0]))
            h = np.diff(x)
            dc = 0.5 * (f[:-1] + f[1:]) * h
            c = np.concatenate([[0.0], np.cumsum(dc)])
            if c[-1] <= 0:
                f = np.ones(n)
                c = np.concatenate([[0.0], np.cumsum(h)])
            fn = f / c[-1]
            cn = c / c[-1]
            qk = q[s, k]
            i0 = int(np.searchsorted(cn, qk, side="right")) - 1
            i0 = min(max(i0, 0), n - 2)
            while i0 > 0 and cn[i0] >= qk:
                i0 -= 1
            while i0 < n - 2 and cn[i0 + 1] < qk:
                i0 += 1
            x1, x2 = x[i0], x[i0 + 1]
            f1, f2v, c1 = fn[i0], fn[i0 + 1], cn[i0]
            a = 0.5 * (f2v - f1) / (x2 - x1)
            if a == 0.0:
                xk = x1 if f1 == 0.0 else x1 + (qk - c1) / f1
            else:
                disc = f1 * f1 + 4 * a * (qk - c1)
                xk = x1 + (-f1 + np.sqrt(abs(disc))) / (2 * a)
            xk = min(max(xk, x1), x2)
            out[s, k] = xk
            la = (x2 - xk) / (x2 - x1)
            lb = (xk - x1) / (x2 - x1)
            lf[s] += np.log(f1 * la + f2v * lb)
            cond = cond[i0] * la + cond[i0 + 1] * lb
    return out, lf


def test_rt_inverts_irt(rng):
    grids = [np.linspace(-2, 2, 19) for _ in range(4)]
    dens = _gauss_density(grids, corr=0.25)
    t = tt_from_dense(jnp.asarray(np.sqrt(dens)), eps=1e-13)
    q = jnp.asarray(rng.random((256, 4)))
    xq, lf_i = tt_irt_sqr(grids, t, q)
    q2, lf_f = tt_rt_sqr(grids, t, xq)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-9)
    np.testing.assert_allclose(np.asarray(lf_f), np.asarray(lf_i), atol=1e-9)


def test_irt_sqr_product_density_moments(rng):
    # independent product density: samples must match per-dim inverse CDF
    grids = [np.linspace(-4, 4, 33) for _ in range(3)]
    t_cores = []
    sigmas = [1.0, 0.5, 1.5]
    for s in sigmas:
        g = np.exp(-0.25 * (grids[0] / s) ** 2)  # sqrt of gaussian pdf
        t_cores.append(jnp.asarray(g)[None, :, None])
    t = TT(t_cores)
    m = 1 << 14
    q = jnp.asarray(rng.random((m, 3)))
    xq, _ = tt_irt_sqr(grids, t, q)
    xq = np.asarray(xq)
    for k, s in enumerate(sigmas):
        assert abs(xq[:, k].mean()) < 0.05 * s + 0.05
        assert abs(xq[:, k].std() - s) < 0.08 * s


def test_irt_marginal_subset(rng):
    grids = [np.linspace(-2, 2, 15) for _ in range(4)]
    dens = _gauss_density(grids, corr=0.3)
    t = tt_from_dense(jnp.asarray(np.sqrt(dens)), eps=1e-13)
    q_full = jnp.asarray(rng.random((128, 4)))
    q_marg = q_full[:, :2]
    x_full, _ = tt_irt_sqr(grids, t, q_full)
    x_marg, _ = tt_irt_sqr(grids, t, q_marg)
    assert x_marg.shape == (128, 2)
    np.testing.assert_allclose(np.asarray(x_marg),
                               np.asarray(x_full[:, :2]), atol=1e-10)


def test_irt_blocking_invariance(rng):
    grids = [np.linspace(-2, 2, 9) for _ in range(3)]
    dens = _gauss_density(grids, corr=0.1)
    t = tt_from_dense(jnp.asarray(dens), eps=1e-12)
    q = jnp.asarray(rng.random((100, 3)))
    x1, l1 = tt_irt_lin(grids, t, q, block=32)
    x2, l2 = tt_irt_lin(grids, t, q, block=1 << 14)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-12)


def test_irt_boundary_extrapolation(rng):
    # TT given without boundary points: cores are extrapolated
    grids = [np.linspace(-2, 2, 11) for _ in range(2)]
    dens = _gauss_density(grids, corr=0.0)
    inner = dens[1:-1, 1:-1]
    t_in = tt_from_dense(jnp.asarray(np.sqrt(inner)), eps=1e-13)
    q = jnp.asarray(rng.random((32, 2)))
    xq, lf = tt_irt_sqr(grids, t_in, q)
    assert np.all(np.isfinite(np.asarray(xq)))
    assert np.all(np.isfinite(np.asarray(lf)))


def test_gram_carry_matches_qr_path(rng):
    """The TPU default ships the Gram-carry semi-marginalization
    (stable=False) while CI forces CPU where the QR carry is default —
    exercise the Gram branch explicitly on an ill-conditioned TT and
    compare against the QR path (round-1 advisor finding)."""
    import jax

    from tt_irt_tpu.samplers.irt import _canon_grid, _prepare_sqr, \
        _forward_block_sqr
    from tt_irt_tpu.samplers.irt_scan import _irt_scan_one, stack_padded

    d, n, r = 5, 17, 4
    grids = [np.linspace(-2, 2, n) for _ in range(d)]
    cores = []
    rs = np.random.default_rng(11)
    x = np.linspace(-1, 1, n)
    for k in range(d):
        r1 = 1 if k == 0 else r
        r2 = 1 if k == d - 1 else r
        core = np.log1p(np.exp(rs.standard_normal((r1, n, r2))))
        # widely separated rank-channel scales -> ill-conditioned
        # semi-marginal Gram (condition number squared by the carry)
        if 0 < k < d - 1:
            core[0, :, :] *= 1e4
            core[:, :, -1] *= 1e-4
        cores.append(jnp.asarray(core))
    tt = TT(cores)
    gs, tt2 = _canon_grid(grids, tt)
    q = jnp.asarray(rng.random((128, d)))

    # unrolled path: QR carry vs Gram carry
    ps_qr, _ = _prepare_sqr(tt2, gs, stable=True)
    ps_gram, _ = _prepare_sqr(tt2, gs, stable=False)
    x_qr, lf_qr = _forward_block_sqr(q, tt2.cores, ps_qr, gs, d)
    x_gram, lf_gram = _forward_block_sqr(q, tt2.cores, ps_gram, gs, d)
    np.testing.assert_allclose(np.asarray(x_gram), np.asarray(x_qr),
                               atol=1e-7)

    # scan path: stable=False vs stable=True block programs
    cstack, xstack = stack_padded(tt2, gs)
    xs_s, lf_s = _irt_scan_one("sqr", cstack, xstack, q, "f64", True)
    xs_g, lf_g = _irt_scan_one("sqr", cstack, xstack, q, "f64", False)
    np.testing.assert_allclose(np.asarray(xs_g), np.asarray(xs_s),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(lf_g), np.asarray(lf_s),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# IrtSampler: prepare-once serving wrapper
# ---------------------------------------------------------------------------

def _random_positive_tt(rng, d=5, n=17, r=6):
    cores = []
    for k in range(d):
        r1 = 1 if k == 0 else r
        r2 = 1 if k == d - 1 else r
        cores.append(rng.standard_normal((r1, n, r2)) / np.sqrt(r) + 0.4)
    return TT([jnp.asarray(c) for c in cores])


def test_irt_sampler_matches_oneshot(rng):
    """IrtSampler('sqr'/'rt'/'lin') is bitwise tt_irt_sqr/tt_rt_sqr/
    tt_irt_lin (same prep + forward kernels), and repeated calls reuse
    the cached prep (no per-call backward marginalization — the
    prepare/serve split of DirtSampler for a single TT)."""
    from tt_irt_tpu import IrtSampler

    f = _random_positive_tt(rng)
    grids = [np.linspace(-2.0, 2.0, 17)] * 5
    q = jnp.asarray(rng.uniform(size=(256, 5)))

    for mode, fn in (("sqr", tt_irt_sqr), ("lin", tt_irt_lin)):
        s = IrtSampler(grids, f, mode=mode)
        x0, lf0 = fn(grids, f, q)
        x1, lf1 = s(q)
        assert np.array_equal(np.asarray(x0), np.asarray(x1)), mode
        assert np.array_equal(np.asarray(lf0), np.asarray(lf1)), mode
        x2, _ = s(q)  # second call: cached prep, same result
        assert np.array_equal(np.asarray(x1), np.asarray(x2)), mode

    sx = IrtSampler(grids, f, mode="sqr", precision="hi")
    x, _ = sx(q)
    srt = IrtSampler(grids, f, mode="rt", precision="hi")
    q2, _ = srt(x)
    assert float(jnp.max(jnp.abs(q2 - q))) < 1e-5


def test_irt_sampler_fallback_nonuniform(rng):
    """Grids of unequal sizes disable the padded-scan path; IrtSampler
    must fall back to the general per-call path with identical
    results."""
    from tt_irt_tpu import IrtSampler

    d = 3
    sizes = [17, 9, 13]
    cores = []
    for k in range(d):
        r1 = 1 if k == 0 else 4
        r2 = 1 if k == d - 1 else 4
        cores.append(jnp.asarray(
            rng.standard_normal((r1, sizes[k], r2)) / 2.0 + 0.4))
    f = TT(cores)
    grids = [np.linspace(-1.0, 1.0, s) for s in sizes]
    q = jnp.asarray(rng.uniform(size=(128, d)))
    s = IrtSampler(grids, f, mode="sqr")
    assert s._prep is None
    x0, lf0 = tt_irt_sqr(grids, f, q)
    x1, lf1 = s(q)
    assert np.array_equal(np.asarray(x0), np.asarray(x1))
    assert np.array_equal(np.asarray(lf0), np.asarray(lf1))
