"""Double-single (compensated f32) arithmetic for TPU.

TPU f64 is emulated (~100x slower bulk compute and only the f32 exponent
range), while the MXU natively consumes f32 at `Precision.HIGHEST`
(3-pass bf16, ~1.7e-7 relative).  A double-single number carries a value
as an unevaluated sum hi + lo of two f32s (~2^-48 relative), letting the
samplers run the accuracy-critical carries at near-f64 precision while
keeping every big contraction on the MXU.

Classical error-free transformations (Knuth TwoSum, Dekker split /
TwoProd) — branch-free, elementwise, VPU-friendly.  All functions
broadcast over arbitrary array shapes.

This replaces nothing in the reference (which runs CPU f64 throughout);
it exists to meet the reference's 1e-6 sample-parity bar at TPU speed
(tt_irt_sqr.m:156-169 quadratic CDF inversion is the sensitive part).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "two_sum", "fast_two_sum", "two_prod", "ds_add", "ds_mul",
    "ds_sub", "ds_div", "ds_sqrt",
    "ds_from_f64", "ds_to_f64", "ds_sum_pairwise", "ds_scale_exact",
    "ds_cumsum", "ds_log32",
]

# Dekker splitting constant for f32 (24-bit significand): 2^12 + 1
_SPLIT32 = 4097.0


def two_sum(a, b):
    """Error-free sum: s + e == a + b exactly (Knuth, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (Dekker)."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    c = a * jnp.asarray(_SPLIT32, a.dtype)
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: p + e == a * b exactly (Dekker splitting;
    no FMA dependence)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def ds_add(xh, xl, yh, yl):
    """Double-single addition (x + y), ~2^-48 relative."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def ds_mul(xh, xl, yh, yl):
    """Double-single multiplication (x * y), ~2^-48 relative."""
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e)


def ds_sub(xh, xl, yh, yl):
    """Double-single subtraction (x - y)."""
    return ds_add(xh, xl, -yh, -yl)


def ds_div(xh, xl, yh, yl):
    """Double-single division (x / y), ~2^-47 relative: f32 quotient
    plus one Newton correction computed with an error-free residual
    (q1 = q0 + (x - q0*y)/y).  y must be nonzero."""
    q0 = xh / yh
    # residual r = x - q0*y in ds: q0*yh via two_prod is exact
    p, e = two_prod(q0, yh)
    rh, rl = ds_add(xh, xl, -p, -e)
    rl = rl - q0 * yl
    return fast_two_sum(q0, (rh + rl) / yh)


def ds_sqrt(xh, xl):
    """Double-single square root (x >= 0), ~2^-47 relative: f32 sqrt
    plus one Newton correction s1 = s0 + (x - s0^2)/(2 s0).  Zero-safe
    (returns 0 for x == 0)."""
    s0 = jnp.sqrt(xh)
    p, e = two_prod(s0, s0)
    rh, rl = ds_add(xh, xl, -p, -e)
    den = jnp.where(s0 > 0.0, 2.0 * s0, 1.0)
    corr = jnp.where(s0 > 0.0, (rh + rl) / den, 0.0)
    return fast_two_sum(s0, corr)


def ds_from_f64(x):
    """Split an f64 array into an (hi, lo) f32 pair."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def ds_to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def ds_sum_pairwise(h, l, axis: int):
    """Sum a double-single array along ``axis`` by pairwise (tree)
    reduction in ds arithmetic — O(log n) depth, fully vectorized."""
    h = jnp.moveaxis(h, axis, -1)
    l = jnp.moveaxis(l, axis, -1)
    n = h.shape[-1]
    while n > 1:
        if n % 2:
            pad = [(0, 0)] * (h.ndim - 1) + [(0, 1)]
            h = jnp.pad(h, pad)
            l = jnp.pad(l, pad)
            n += 1
        h0, h1 = h[..., 0::2], h[..., 1::2]
        l0, l1 = l[..., 0::2], l[..., 1::2]
        h, l = ds_add(h0, l0, h1, l1)
        n //= 2
    return h[..., 0], l[..., 0]


def ds_cumsum(x, axis: int = -1):
    """Cumulative sum of an f32 array carried as a double-single pair
    (~2^-48 relative for positive inputs) via a compensated associative
    scan — the f32-native replacement for an emulated-f64 cumsum."""
    import jax

    def comb(a, b):
        return ds_add(a[0], a[1], b[0], b[1])

    return jax.lax.associative_scan(comb, (x, jnp.zeros_like(x)),
                                    axis=axis)


def ds_scale_exact(h, l, denom):
    """Divide by a power-of-two scale derived from ``denom`` (> 0):
    exact in both components, so renormalization injects no error."""
    s = jnp.exp2(jnp.floor(jnp.log2(denom)))
    return h / s, l / s


# ln 2 as an f32 double-single constant (hi + lo == ln2 to ~2^-48).
_LN2_HI = float(np.float32(np.log(2.0)))
_LN2_LO = float(np.float32(np.log(2.0) - np.float64(np.float32(np.log(2.0)))))

# atanh-series coefficients 1/(2k+1), k = 0..9, each as an (hi, lo)
# f32 pair so the Horner recurrence keeps full ds precision.  With the
# argument reduced to m in [sqrt(1/2), sqrt(2)), s = (m-1)/(m+1) obeys
# |s| <= 0.1716, s^2 <= 0.02944, so the truncated tail is
# s^20/21 ~ 2.4e-16 relative — below the ds floor.
_ATANH_COEF = [
    (float(np.float32(c)), float(np.float32(c - np.float64(np.float32(c)))))
    for c in (1.0 / (2 * k + 1) for k in range(10))
]


def ds_log32(x):
    """Natural log of a positive f32 array as a double-single pair —
    accurate to ~1e-14 relative with NO f64 (and no approximate f32
    transcendental) ops, so it lowers to pure VPU f32 work on TPU.

    Motivation: XLA:TPU lowers f32 ``log`` to a polynomial with ~1.5e-5
    absolute error at O(1) magnitudes (measured: the r04 on-chip suite
    failures, BENCH_NOTES "the on-chip suite caught a real serve
    regression"), while emulated-f64 ``log`` is correct but costs a
    long emulated chain.  This routine gets f64-class accuracy from
    f32 hardware ops only:

      x = m * 2^e  (exact exponent/mantissa split, jnp.frexp)
      m centered into [sqrt(1/2), sqrt(2)); s = (m-1)/(m+1) in ds
      (m-1 exact by Sterbenz, m+1 exact by TwoSum, ds division)
      log m = 2 atanh(s) = 2s (1 + s^2/3 + ... + s^18/19)  [ds Horner]
      log x = e*ln2 + log m                                 [ds]

    Non-positive / non-finite inputs follow ``log`` semantics
    (0 -> -inf, negative -> nan, inf -> inf).  Zero-or-subnormal inputs
    return -inf: XLA backends flush subnormals in arithmetic AND in
    comparisons (DAZ) and ``jnp.frexp`` mis-splits them, so the only
    deterministic cross-backend semantics is the FTZ one; detection is
    via an exact bitcast of the exponent field."""
    from jax import lax

    x = jnp.asarray(x, jnp.float32)
    bits = lax.bitcast_convert_type(x, jnp.int32)
    ftz = ((bits >> 23) & 0xFF) == 0       # +-0 and subnormals
    m, e = jnp.frexp(x)
    e = e.astype(jnp.float32)
    small = m < jnp.float32(0.7071067811865476)
    m = jnp.where(small, m * 2.0, m)
    e = jnp.where(small, e - 1.0, e)
    zero = jnp.zeros_like(m)
    # s = (m - 1) / (m + 1) in ds; m - 1 is exact for m in [0.5, 2)
    dh, dl = two_sum(m, jnp.ones_like(m))
    sh, sl = ds_div(m - 1.0, zero, dh, dl)
    zh, zl = ds_mul(sh, sl, sh, sl)            # s^2
    ph = jnp.full_like(m, _ATANH_COEF[-1][0])
    pl = jnp.full_like(m, _ATANH_COEF[-1][1])
    for ch, cl in _ATANH_COEF[-2::-1]:
        ph, pl = ds_mul(ph, pl, zh, zl)
        ph, pl = ds_add(ph, pl, jnp.full_like(m, ch), jnp.full_like(m, cl))
    lmh, lml = ds_mul(2.0 * sh, 2.0 * sl, ph, pl)   # 2s * poly (2s exact)
    eh, el = ds_mul(e, zero, jnp.full_like(m, _LN2_HI),
                    jnp.full_like(m, _LN2_LO))
    h, l = ds_add(eh, el, lmh, lml)
    # log semantics at the edges.  Zero is detected via the frexp
    # mantissa, NOT `x == 0`: comparisons are DAZ on XLA backends, so a
    # subnormal x would compare equal to zero while frexp still splits
    # it exactly.
    neg_inf = jnp.float32(-np.inf)
    h = jnp.where(m < 0.0, jnp.float32(np.nan), h)  # sign rides on m
    h = jnp.where(ftz, neg_inf, h)                  # zero / subnormal
    h = jnp.where(jnp.isinf(x) & (x > 0), jnp.float32(np.inf), h)
    l = jnp.where(jnp.isfinite(h), l, zero)
    return h, l
