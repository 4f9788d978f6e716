"""Statistical observability primitives.

Reference: matlab/samplers/essinv.m, hellinger.m and the UWerr/puwr IACT
convention wrapped by matlab/utils/statsiact.m (IACT = 2 * tau_int).
All estimators are max-shifted in log space for overflow safety, exactly
as the reference (essinv.m:13, hellinger.m:13).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["essinv", "hellinger", "iact", "tt_marginals"]


@jax.jit
def essinv(lfex, lfapp):
    """N/ESS = 1 + chi^2 divergence estimate from log density pairs."""
    df = jnp.asarray(lfex) - jnp.asarray(lfapp)
    df = df - jnp.max(df)
    w = jnp.exp(df)
    return df.shape[0] * jnp.sum(w * w) / jnp.sum(w) ** 2


@jax.jit
def hellinger(lfex, lfapp):
    """Sample Hellinger distance: 2H^2 = E_app[ sqrt(Fex/Zex/Fapp) - 1 ]^2,
    with the internal normalization of hellinger.m:12-16."""
    df = jnp.asarray(lfex) - jnp.asarray(lfapp)
    df = df - jnp.max(df)
    lzex = jnp.log(jnp.mean(jnp.exp(df)))
    h2 = jnp.mean((jnp.exp(0.5 * (df - lzex)) - 1.0) ** 2)
    return jnp.sqrt(h2 / 2.0)


def iact(x, s: float = 1.5, return_error: bool = False):
    """Integrated autocorrelation time per chain column, UWerr convention
    (returns 2*tau_int, statsiact.m:3-6).

    Gamma method with Wolff's automatic windowing (Wolff, Comput. Phys.
    Commun. 156 (2004) 143, as in the UWerr.m the reference downloads):
    autocovariances via FFT; for each window W the decay proxy is
    tau(W) = S / log((2 tau_int + 1) / (2 tau_int - 1)) and the window
    is the first W where g(W) = exp(-W/tau) - tau/sqrt(W N) < 0;
    tau_int is then read at that window.

    Accepts (N,) or (N, k); returns scalar or (k,) numpy array.  With
    ``return_error=True`` also returns Wolff's statistical error of the
    estimate, d(2 tau_int) = 2 tau_int * 2 sqrt((W + 0.5 - tau_int)/N).
    """
    x = np.asarray(x, dtype=np.float64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, k = x.shape
    out = np.empty(k)
    err = np.empty(k)
    for j in range(k):
        v = x[:, j] - x[:, j].mean()
        nfft = int(2 ** np.ceil(np.log2(2 * n)))
        f = np.fft.rfft(v, nfft)
        acov = np.fft.irfft(f * np.conj(f), nfft)[:n].real
        acov /= np.arange(n, 0, -1)  # unbiased normalization
        if acov[0] <= 0:
            out[j] = 1.0
            err[j] = 0.0
            continue
        rho = acov / acov[0]
        tau_int = 0.5
        wmax = min(n // 2, 10000)
        wopt = wmax
        for w in range(1, wmax):
            tau_int += rho[w]
            if tau_int <= 0.5:
                # noise-dominated chain: tau ~ eps (Wolff's guard)
                tau_w = 1e-8
            else:
                tau_w = s / np.log((2.0 * tau_int + 1.0)
                                   / (2.0 * tau_int - 1.0))
            g = np.exp(-w / tau_w) - tau_w / np.sqrt(w * n)
            if g < 0:
                wopt = w
                break
        tau_int = max(tau_int, 0.5)
        out[j] = 2.0 * tau_int
        err[j] = out[j] * 2.0 * np.sqrt(
            max(wopt + 0.5 - tau_int, 0.0) / n)
    if return_error:
        return (out[0], err[0]) if squeeze else (out, err)
    return out[0] if squeeze else out


def tt_marginals(tt, pair=(0, 1)):
    """Structured (non-plotting) equivalent of the reference's per-level
    marginal diagnostics (tt_dirt_approx.m:202-252): the 1D per-dim
    contractions m1[k](j) = sum over all other mode indices of the TT,
    and the 2D contraction over the ``pair`` dims.

    For a DIRT level TT holding sqrt(density ratio) on a grid these are
    the reference's "1D marginal sqrt(densities)" curves and the 2D
    x_i x_j marginal surface (tt_ones dot products, :205-220).

    Returns (m1, m2): m1 a list of d (n_k,) arrays, m2 an
    (n_i, n_j) array.
    """
    cores = [np.asarray(c) for c in tt.cores]
    d = len(cores)
    # transfer row/column chains of mode-summed cores
    tmats = [c.sum(axis=1) for c in cores]               # (r1, r2) each
    left = [np.ones((1, cores[0].shape[0]))]
    for k in range(d - 1):
        left.append(left[-1] @ tmats[k])                 # (1, r_{k+1})
    right = [None] * (d + 1)
    right[d] = np.ones((cores[-1].shape[2], 1))
    for k in range(d - 1, -1, -1):
        right[k] = tmats[k] @ right[k + 1]               # (r_k, 1)
    m1 = [np.einsum("a,anb,b->n", left[k][0], cores[k],
                    right[k + 1][:, 0]) for k in range(d)]
    i, j = pair
    if i > j:
        i, j = j, i
    mid = np.eye(cores[i].shape[2])
    for k in range(i + 1, j):
        mid = mid @ tmats[k]
    m2 = np.einsum("a,anb,bc,cmd,d->nm", left[i][0], cores[i], mid,
                   cores[j], right[j + 1][:, 0])
    return m1, m2
