"""Quasi-Monte Carlo point sets.

The reference ships a rank-1 lattice with a downloaded Kuo generating
vector (matlab/samplers/qmcnodes.m + utils/check_qmc.m).  We internalize
QMC instead of depending on a data download:

* default backend: scrambled Sobol digital nets (Joe-Kuo direction
  numbers via scipy.stats.qmc) — equal-or-better equidistribution than
  the reference's lattice for the d <= 40 regime of this library;
* 'lattice' backend: randomly-shifted rank-1 Korobov lattice for exact
  structural parity with qmcnodes.m (z_j = a^j mod N).
"""

from __future__ import annotations

import numpy as np

__all__ = ["qmcnodes"]

# Korobov multiplier: a classic good choice for N=2^20-scale lattices
# (period-maximal odd multiplier; used as the parity fallback only).
_KOROBOV_A = 17797


def qmcnodes(d: int, log2n: int, seed=0, method: str = "sobol") -> np.ndarray:
    """2^log2n randomized-QMC nodes in [0,1)^d, returned as (N, d).

    (The reference returns d x N; we use the sample-major layout used
    everywhere else in this framework.)
    """
    n = 1 << int(log2n)
    rng = np.random.default_rng(seed)
    if method == "sobol":
        from scipy.stats import qmc

        eng = qmc.Sobol(d, scramble=True, seed=rng)
        return eng.random(n)
    if method == "lattice":
        z = np.empty(d, dtype=np.int64)
        z[0] = 1
        for j in range(1, d):
            z[j] = (z[j - 1] * _KOROBOV_A) % n
        k = np.arange(n, dtype=np.float64)[:, None]
        y = k * (z[None, :].astype(np.float64) / n)
        shift = rng.random((1, d))
        return (y + shift) % 1.0
    raise ValueError(f"unknown QMC method {method!r}")
