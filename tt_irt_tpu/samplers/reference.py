"""Reference measures: uniform and truncated-normal seeds and CDF maps.

Reference: matlab/samplers/randref.m and the erf maps used inside
tt_dirt_sample.m:36,54,60.  The reference encodes the truncated-normal
support as a string "Normal S"; we keep that convention for API parity but
also accept a plain float sigma.
"""

from __future__ import annotations

import math
from functools import lru_cache as _functools_lru_cache

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


import os as _os

import numpy as _np

# TTIRT_TNORMAL: 'erf' (native/emulated f64 erf) or 'poly' (the
# double-single Chebyshev evaluation below).  Default: poly on TPU —
# the emulated-f64 erf costs ~105 ms per (2^20, 40) map on v5e
# (~2.5 ns/elem, measured round 4: 1.47 s of a 10.6 s deep serve);
# the ds Clenshaw evaluates the same map to ~1e-14 absolute with ~3x
# fewer VPU flops.  CPU keeps the native f64 erf (fast and exact).
_TNORMAL_ENV = _os.environ.get("TTIRT_TNORMAL", "")


def _use_poly_map() -> bool:
    if _TNORMAL_ENV:
        return _TNORMAL_ENV == "poly"
    return jax.default_backend() == "tpu"


@_functools_lru_cache(maxsize=8)
def _tnormal_cheb_coeffs(sigma: float):
    """Chebyshev coefficients (as hi/lo f32 pairs) of
    Q(s) = erf(sqrt(s/2)) / sqrt(s/2) over s in [0, sigma^2], so that
    erf(z/sqrt 2) = (z/sqrt 2) * Q(z^2) exactly on [-sigma, sigma].
    Q is smooth and even-free in s; ~24 terms reach ~1e-15 relative.
    Coefficients are computed in f64 (scipy erf) once per sigma."""
    from scipy.special import erf as _erf

    deg = 40
    k = _np.arange(deg + 1)
    # Chebyshev-Gauss-Lobatto nodes on [0, sigma^2]
    xc = _np.cos(_np.pi * k / deg)                       # [-1, 1]
    s = 0.5 * (xc + 1.0) * (sigma * sigma)
    t = _np.sqrt(_np.maximum(s, 0.0) / 2.0)
    with _np.errstate(invalid="ignore", divide="ignore"):
        q = _np.where(t > 0.0, _erf(t) / _np.where(t > 0, t, 1.0),
                      2.0 / _np.sqrt(_np.pi))
    # type-I DCT interpolation -> Chebyshev series coefficients
    coef = _np.polynomial.chebyshev.chebfit(xc, q, deg)
    # truncate where the geometric decay hits the f64 fit-noise floor
    # (trailing coefficients plateau at ~1e-16 of the max); dropping
    # <=1e-15-scale terms injects less than the ~1e-14 target
    mag = _np.abs(coef)
    keep = int(_np.max(_np.nonzero(mag > 1e-15 * mag.max())[0])) + 1
    coef = coef[:keep]
    hi = coef.astype(_np.float32)
    lo = (coef - hi.astype(_np.float64)).astype(_np.float32)
    return tuple(float(v) for v in hi), tuple(float(v) for v in lo)


def _tnormal_to_uniform_poly(z, sigma: float):
    """g(z) = c * erf(z/sqrt 2) + 0.5 evaluated as a double-single
    Chebyshev series in s = z^2 (see _tnormal_cheb_coeffs): ~1e-14
    absolute agreement with the f64 erf map (pinned by
    tests/test_dirt.py::test_tnormal_poly_map_parity) at ~3x fewer
    VPU flops than the TPU-emulated f64 erf."""
    from ..ops.doublesingle import (ds_add, ds_from_f64, ds_mul,
                                    ds_to_f64)

    hi, lo = _tnormal_cheb_coeffs(float(sigma))
    zh, zl = ds_from_f64(z)
    sh, sl = ds_mul(zh, zl, zh, zl)                      # s = z^2
    # w = 2 s / sigma^2 - 1 in ds (scale is exact-ish: one ds op)
    inv = 2.0 / (sigma * sigma)
    invh = _np.float32(inv)
    invl = _np.float32(inv - float(invh))
    wh, wl = ds_mul(sh, sl, jnp.float32(invh), jnp.float32(invl))
    wh, wl = ds_add(wh, wl, jnp.float32(-1.0), jnp.float32(0.0))
    w2h, w2l = 2.0 * wh, 2.0 * wl
    b1h = b1l = b2h = b2l = jnp.zeros_like(wh)
    for k in range(len(hi) - 1, 0, -1):
        th, tl = ds_mul(w2h, w2l, b1h, b1l)
        th, tl = ds_add(th, tl, -b2h, -b2l)
        b0h, b0l = ds_add(th, tl, jnp.float32(hi[k]),
                          jnp.float32(lo[k]))
        b2h, b2l = b1h, b1l
        b1h, b1l = b0h, b0l
    th, tl = ds_mul(wh, wl, b1h, b1l)
    th, tl = ds_add(th, tl, -b2h, -b2l)
    qh, ql = ds_add(th, tl, jnp.float32(hi[0]), jnp.float32(lo[0]))
    # u = c/sqrt(2) * z * Q(z^2) + 0.5
    a = _cdf_factor(sigma) / math.sqrt(2.0)
    ah = _np.float32(a)
    al = _np.float32(a - float(ah))
    uh, ul = ds_mul(zh, zl, qh, ql)
    uh, ul = ds_mul(uh, ul, jnp.float32(ah), jnp.float32(al))
    uh, ul = ds_add(uh, ul, jnp.float32(0.5), jnp.float32(0.0))
    return ds_to_f64(uh, ul).astype(z.dtype)


# jit per sigma: the ds Clenshaw is ~90 elementwise ops — dispatched
# eagerly through the axon tunnel they cost more than the emulated erf
# they replace (measured: the whole serve DOUBLED); one fused program
# per map is the point.
_poly_map_jit = jax.jit(_tnormal_to_uniform_poly, static_argnums=1)


def tnormal_to_uniform(z, sigma: float):
    """Truncated-normal points -> [0,1] via the scaled erf CDF."""
    if _use_poly_map() and jnp.asarray(z).dtype == jnp.float64:
        return _poly_map_jit(z, float(sigma))
    return jax.scipy.special.erf(z / math.sqrt(2.0)) * _cdf_factor(sigma) + 0.5


def tnormal_logdensity_shift(z, sigma: float, reduced: bool = False):
    """log of the truncated-normal reference density at z, with the exact
    normalization the reference uses (tt_dirt_sample.m:54):
    log N_t(z) = -|z|^2/2 + (d/2) log(2 c^2 / pi), c = 0.5/erf(sigma/sqrt 2).
    Returns the per-sample log-density (shape (M,)).

    ``reduced=True`` computes the square-sum in f32 (|z| <= sigma, d
    terms: abs error ~1e-5 on an O(d sigma^2/2) value) — used by the
    reduced-precision serve loops where the per-level f64-emulated
    square-sum was measured at ~35 ms/level on v5e (round 4); the f64
    path stays bit-identical for precision='f64'."""
    c = _cdf_factor(sigma)
    d = z.shape[-1]
    const = 0.5 * d * math.log(2.0 * c * c / math.pi)
    if reduced:
        s32 = jnp.sum(jnp.square(z.astype(jnp.float32)), axis=-1)
        return (-0.5 * s32).astype(z.dtype) + const
    return -0.5 * jnp.sum(z * z, axis=-1) + const


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
