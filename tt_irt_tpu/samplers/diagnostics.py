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

__all__ = ["essinv", "hellinger", "iact"]


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


def iact(x, s: float = 1.5) -> np.ndarray:
    """Integrated autocorrelation time per chain column, UWerr convention
    (returns 2*tau_int, statsiact.m:3-6).

    Gamma-method with Wolff's automatic windowing: autocovariances via FFT,
    window W chosen where g(W) = exp(-W/tau) - tau/sqrt(W*N) changes sign.
    Accepts (N,) or (N, k); returns scalar or (k,) numpy array.
    """
    x = np.asarray(x, dtype=np.float64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, k = x.shape
    out = np.empty(k)
    for j in range(k):
        v = x[:, j] - x[:, j].mean()
        nfft = int(2 ** np.ceil(np.log2(2 * n)))
        f = np.fft.rfft(v, nfft)
        acov = np.fft.irfft(f * np.conj(f), nfft)[:n].real
        acov /= np.arange(n, 0, -1)  # unbiased normalization
        if acov[0] <= 0:
            out[j] = 1.0
            continue
        rho = acov / acov[0]
        tau = 0.5
        wmax = min(n // 2, 10000)
        wopt = wmax
        for w in range(1, wmax):
            tau += rho[w]
            tau_eff = max(tau, 1e-10)
            # Wolff's optimal-window criterion
            g = np.exp(-(w + 1) / (s * 2 * tau_eff)) - \
                2 * tau_eff / np.sqrt((w + 1) * n)
            if g < 0:
                wopt = w
                break
        out[j] = 2.0 * max(tau, 0.5)
        _ = wopt
    return out[0] if squeeze else out
