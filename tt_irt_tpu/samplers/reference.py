"""Reference measures: uniform and truncated-normal seeds and CDF maps.

Reference: matlab/samplers/randref.m and the erf maps used inside
tt_dirt_sample.m:36,54,60.  The reference encodes the truncated-normal
support as a string "Normal S"; we keep that convention for API parity but
also accept a plain float sigma.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["reference_sigma", "randref", "tnormal_to_uniform",
           "uniform_to_tnormal", "tnormal_logdensity_shift"]


def reference_sigma(reference) -> float | None:
    """None for uniform; sigma (support half-width) for 'normal S'.

    Accepts 'uni[form]', 'normal', 'n4', 'normal 3', a float, ...
    (string parsing mirrors randref.m:22-34: digits and dot are extracted,
    default sigma 4)."""
    if reference is None:
        return None
    if isinstance(reference, (int, float)):
        return float(reference)
    s = str(reference).strip().lower()
    if s.startswith("u"):
        return None
    digits = "".join(ch for ch in s if ch.isdigit() or ch == ".")
    try:
        return float(digits) if digits else 4.0
    except ValueError:
        return 4.0


def _cdf_factor(sigma: float) -> float:
    """0.5 / erf(sigma/sqrt(2)): scales erf to the truncated-normal CDF."""
    return 0.5 / math.erf(sigma / math.sqrt(2.0))


def uniform_to_tnormal(u, sigma: float):
    """Map [0,1] points to the truncated normal on (-sigma, sigma]."""
    cdf_ifactor = 1.0 / _cdf_factor(sigma)
    return jax.scipy.special.erfinv((u - 0.5) * cdf_ifactor) * math.sqrt(2.0)


def tnormal_to_uniform(z, sigma: float):
    """Truncated-normal points -> [0,1] via the scaled erf CDF."""
    return jax.scipy.special.erf(z / math.sqrt(2.0)) * _cdf_factor(sigma) + 0.5


def tnormal_logdensity_shift(z, sigma: float):
    """log of the truncated-normal reference density at z, with the exact
    normalization the reference uses (tt_dirt_sample.m:54):
    log N_t(z) = -|z|^2/2 + (d/2) log(2 c^2 / pi), c = 0.5/erf(sigma/sqrt 2).
    Returns the per-sample log-density (shape (M,))."""
    c = _cdf_factor(sigma)
    d = z.shape[-1]
    return -0.5 * jnp.sum(z * z, axis=-1) + 0.5 * d * math.log(
        2.0 * c * c / math.pi)


def randref(reference, key_or_points, shape=None):
    """Sample (or transform) seed points for the given reference.

    * ``randref(ref, key, (m, d))`` draws pseudo-random reference points.
    * ``randref(ref, points)`` transforms given [0,1] points (e.g. a QMC
      lattice) to the reference measure.
    """
    sigma = reference_sigma(reference)
    if shape is not None:
        u = jax.random.uniform(key_or_points, shape, dtype=jnp.float64)
    else:
        u = jnp.asarray(key_or_points)
    if sigma is None:
        return u
    return uniform_to_tnormal(u, sigma)
