"""Headline benchmark: IRT inversion throughput at the BASELINE.json
north-star configuration — 2^20 samples, d=40, n=17 grid, TT ranks ~13
(the Lorenz-40 scale, BASELINE.md "driver north-star").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the north-star target rate of
2^20 samples / 1 s (the reference C kernel takes tens of seconds for
this workload on CPU; the in-repo target is the <1 s TPU figure).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tt_irt_tpu.utils import set_platform  # noqa: E402
set_platform()  # honor JAX_PLATFORMS=cpu even with eager TPU plugins

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tt_irt_tpu as ti  # noqa: E402


def build_tt(d: int, n: int, rank: int, seed: int = 0) -> ti.TT:
    """Deterministic positive sqrt-density TT at the stress shape: smooth
    rank-`rank` cores (random Fourier features of the grid, softplus'd so
    the implied density is strictly positive and well-conditioned)."""
    rng = np.random.default_rng(seed)
    x = np.linspace(-1.0, 1.0, n)
    cores = []
    for k in range(d):
        r1 = 1 if k == 0 else rank
        r2 = 1 if k == d - 1 else rank
        w = rng.standard_normal((r1, 3, r2)) / np.sqrt(3 * max(r1, 1))
        feats = np.stack([np.ones_like(x), np.sin(np.pi * x),
                          np.cos(np.pi * x)], axis=0)
        core = np.einsum("afb,fn->anb", w, feats)
        core = np.log1p(np.exp(core))  # softplus: positive, smooth
        cores.append(jnp.asarray(core))
    return ti.TT(cores)


def main():
    d, n, rank = 40, 17, 13
    log2m = int(os.environ.get("BENCH_LOG2M", 20))
    precision = os.environ.get("BENCH_PRECISION", "f32")
    m = 1 << log2m
    tt = build_tt(d, n, rank)
    grids = [jnp.asarray(np.linspace(-2.0, 2.0, n)) for _ in range(d)]
    q = jax.random.uniform(jax.random.PRNGKey(1), (m, d),
                           dtype=jnp.float64)

    def run():
        xq, lf = ti.tt_irt_sqr(grids, tt, q, precision=precision)
        # Force a host read: on remote TPU backends block_until_ready
        # can return before execution completes, so timing must
        # materialize a value derived from the full result.
        return float(jnp.sum(xq)) + float(jnp.sum(lf))

    run()  # warm-up / compile

    reps = int(os.environ.get("BENCH_REPS", 3))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    rate = m / best
    target = (1 << 20) / 1.0  # north star: 2^20 samples in 1 s

    # Accuracy clause of the north star (BASELINE.md): samples must match
    # the f64 reference to 1e-6 scale.  Compare against the independent
    # pure-numpy f64 oracle at 2^18 seeds; a parity failure zeroes
    # vs_baseline so a numerics regression cannot ship behind a
    # good-looking throughput line.
    parity_tol = float(os.environ.get("BENCH_PARITY_TOL", 2e-6))
    mp = min(m, 1 << 18)
    xq, _ = ti.tt_irt_sqr(grids, tt, q[:mp], precision=precision)
    xq = np.asarray(xq)
    from tt_irt_tpu.utils.reference_numpy import irt_sqr_numpy
    xo, _ = irt_sqr_numpy(grids, [np.asarray(c) for c in tt.cores],
                          np.asarray(q[:mp], np.float64))
    max_dev = float(np.max(np.abs(xq - xo)))
    parity_ok = max_dev < parity_tol

    from tt_irt_tpu.samplers.irt_scan import resolved_serve_modes
    rec = {
        "metric": (f"tt_irt_sqr samples/sec (d={d}, n={n}, r={rank}, "
                   f"M=2^{log2m}, {precision} precision)"),
        "value": rate,
        "unit": "samples/sec",
        "vs_baseline": (rate / target) if parity_ok else 0.0,
        "max_sample_dev_vs_f64": max_dev,
        "parity_tol": parity_tol,
        "parity_ok": parity_ok,
        # The resolved serve-numerics matrix: without it the serve
        # figures are not comparable across rounds when an env default
        # flips (VERDICT r04 weak #4).
        "serve_modes": resolved_serve_modes(),
    }

    # Production deep-serve of the SHIPPED Lorenz d=40 checkpoint (14
    # composed SIRT levels, n=33, rank 23) next to the synthetic
    # headline, so the two numbers cannot drift apart unnoticed
    # (VERDICT r02 weak #7).  Depth-aware precision policy ('hi' at
    # d=40).  Failure-tolerant: the headline line must survive a
    # missing checkpoint or an out-of-memory serve.
    if os.environ.get("BENCH_DEEP", "1") not in ("0", "false", "off"):
        try:
            rec.update(_deep_serve_bench())
        except Exception as e:  # noqa: BLE001 — report, don't die
            rec["deep_serve_error"] = f"{type(e).__name__}: {e}"

    # The other two tracked metrics of BASELINE.json ("amen_cross sweep
    # time; ESS/sec for TT-MH") next to the IRT rate, so the driver
    # record carries the full headline triple.
    if os.environ.get("BENCH_AUX", "1") not in ("0", "false", "off"):
        rec.update(_aux_metrics())

    print(json.dumps(rec))


def _aux_main():
    """Child-process entry for the two CPU-baseline tracked metrics."""
    rec = {}
    try:
        rec.update(_cross_bench())
    except Exception as e:  # noqa: BLE001 — report, don't die
        rec["cross_error"] = f"{type(e).__name__}: {e}"
    try:
        rec.update(_ttmh_bench())
    except Exception as e:  # noqa: BLE001 — report, don't die
        rec["ttmh_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(rec))


def _aux_metrics():
    """Run the cross-sweep and TT-MH metrics in a fresh subprocess
    pinned to the CPU backend.  Both reference figures are CPU figures
    (amen_cross_s.m:74-82 author workstation; the MATLAB TT-MH driver),
    the cross build is host-logic/QR bound rather than MXU bound, and a
    separate process keeps this one's TPU client free for the headline
    IRT + deep-serve timings (the axon backend allows one client at a
    time and ignores in-process platform changes)."""
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--aux-only"],
            env=env, capture_output=True, text=True, timeout=1800)
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001 — report, don't die
        return {"aux_error": f"{type(e).__name__}: {e}"}


def _deep_serve_bench():
    """Serve 2^18 reference seeds through the shipped lz40n33 DIRT
    checkpoint (prepare-once DirtSampler path) and report samples/s."""
    from tt_irt_tpu.utils.checkpoint import load_dirt
    ck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "examples", "data", "lz40n33_ck")
    dirt = load_dirt(ck)
    d = dirt.d
    # 2^20 is the headline config: per-level fixed costs (dispatch,
    # transposes, f64 epilogue setup) amortize over 4 blocks — measured
    # 94.8k samples/s at 2^20 vs ~77k/s at 2^18 (BENCH_NOTES round 3)
    log2m = int(os.environ.get("BENCH_DEEP_LOG2M", 20))
    m = 1 << log2m
    precision = os.environ.get("BENCH_DEEP_PRECISION") or \
        ti.serve_precision(dirt)
    q = ti.randref("n3", jax.random.PRNGKey(7), (m, d))

    sampler = ti.DirtSampler(dirt, precision=precision)

    def run():
        z, lf = sampler(q)
        return float(jnp.sum(z)) + float(jnp.sum(lf))

    run()  # warm-up / compile
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPS", 3))):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    rec = {
        "deep_serve_samples_per_sec": m / best,
        "deep_serve_config": (f"lz40n33 checkpoint, {dirt.nlevels + 1} "
                              f"levels, M=2^{log2m}, {precision}"),
    }

    # Quality gate: raw-sample N/ESS against the exact Lorenz posterior
    # (the problem files ship with the checkpoint).  Calibration at
    # THESE seeds (PRNGKey(7), first 2^18): full-f64 serving measures
    # N/ESS 1.713 at 2^14 with 'hi' and 'gs' within 1e-3 of it — i.e.
    # ~1.8 at this seed set is the checkpoint's INTRINSIC quality, not
    # serve numerics (round-4 measurement; the r03 "1.57" figure used
    # a different seed draw).  The band below catches a serve-path
    # numerics regression (which inflates N/ESS well past the f64
    # baseline) while tolerating estimator noise (VERDICT r03 #6).
    # Band: intrinsic checkpoint quality at these seeds is ~1.80 (f64
    # calibration, seed spread 1.71-1.80); 1.95 clears seed noise but
    # bites on the smallest regression actually observed (dirt_round
    # took N/ESS 1.57->1.82 in r03 — a 2.2 band waved that class
    # through; VERDICT r04 weak #3).
    ness_tol = float(os.environ.get("BENCH_DEEP_NESS_TOL", 1.95))
    try:
        from tt_irt_tpu.models import lorenz as lz
        base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "examples", "data", "lz40n33")
        data = np.load(base + "_data.npy")
        x0base = np.load(base + "_x0base.npy")
        prob = lz.LorenzProblem(d=d, n=33, a=10.0, x0true=x0base,
                                data=data)
        lp = prob.log_posterior_fn()
        mq = min(m, 1 << 18)
        z, lfapp = sampler(q[:mq])
        lfex = lp(z)
        ness = float(ti.essinv(lfex, lfapp))
        rec["deep_serve_ness"] = ness
        rec["deep_serve_ness_tol"] = ness_tol
        rec["deep_serve_ness_ok"] = ness < ness_tol
        if ness >= ness_tol:
            rec["deep_serve_samples_per_sec"] = 0.0
    except Exception as e:  # noqa: BLE001 — report, don't die
        rec["deep_serve_ness_error"] = f"{type(e).__name__}: {e}"
    return rec


def _cross_bench():
    """amen_cross_s sweep time at the reference's OWN headline
    configuration (amen_cross_s.m:74-82): d=50, mode size 192,
    f(i) = sqrt(1/sum(i^2)) over 1-based indices, tol 1e-4.  Reference
    figures from that header (author CPU): amen_cross_s 3.38 s at
    rel err 1.7e-4 (plain amen_cross: 4.59 s at 7.0e-4).  The error
    reported here is the max relative deviation at 2^12 random test
    indices against the exact function — stricter than the header's
    aggregate figure."""
    tol = float(os.environ.get("BENCH_CROSS_TOL", "1e-4"))
    stop_sweep = int(os.environ.get("BENCH_CROSS_STOPSWEEP", "1"))
    d, n = 50, 192

    def fun(ind):
        s = jnp.sum((jnp.asarray(ind, jnp.float64) + 1.0) ** 2, axis=1)
        return jnp.sqrt(1.0 / s)

    def build():
        t0 = time.perf_counter()
        # stop_sweep=1: one confirmation sweep after convergence.  The
        # round-5 attribution (benchmarks/attrib_cross.py) showed the
        # exit-sweep interpolant carries ~4x the error of a confirmed
        # one (stale opposite-side interfaces); the confirmation pass
        # lands the error at the reference's own 1.7e-4 figure while
        # staying under its 3.38 s wall time.
        res = ti.amen_cross_s([n] * d, fun, tol, kickrank=4, seed=0,
                              stop_sweep=stop_sweep)
        jax.block_until_ready(res.tt.cores[-1])
        return res, time.perf_counter() - t0

    # Cold includes one jit compile per distinct block shape (ranks
    # grow sweep over sweep); the warm rebuild traces the identical
    # shape sequence from cache and is the apples-to-apples number
    # against the interpreted MATLAB run.
    res, cold = build()
    _, warm = build()

    from tt_irt_tpu.ops.tt import tt_eval_indices
    rng = np.random.default_rng(5)
    idx = jnp.asarray(rng.integers(0, n, size=(1 << 16, d)))
    approx = np.asarray(tt_eval_indices(res.tt, idx))
    exact = np.asarray(fun(idx))
    rel = np.abs(approx - exact) / np.abs(exact)
    # The MATLAB header's error column is a global norm-type figure;
    # report a Monte-Carlo estimate of the relative Frobenius error
    # (what norm(y-yex)/norm(yex) measures) next to the stricter
    # pointwise stats so both conventions are on record.
    fro = float(np.sqrt(np.mean((approx - exact) ** 2)
                        / np.mean(exact ** 2)))
    ref_time = 3.38
    return {
        "cross_sweep_time_s": warm,
        "cross_cold_time_s": cold,
        "cross_err_rel_rms": float(np.sqrt(np.mean(rel ** 2))),
        "cross_err_rel_max": float(np.max(rel)),
        "cross_err_fro_mc": fro,
        "cross_ref_err": 1.7048e-4,
        "cross_evals": int(res.evalcnt[0]),
        "cross_rank_max": int(max(res.tt.ranks)),
        "cross_ref_time_s": ref_time,
        "cross_speedup_vs_ref": ref_time / warm,
        "cross_config": (f"d=50, n=192, sqrt(1/sum(i^2)), tol={tol}, "
                         f"stop_sweep={stop_sweep} "
                         "(amen_cross_s.m:74-82)"),
    }


def _ttmh_bench():
    """ESS/sec for TT-MH on the shock-absorber configuration (the third
    BASELINE.json tracked metric; reference driver
    test_shock_absorber_tt.m:121-142 with parse_shock_inputs.m
    defaults d=6, n=17, delta=0.05, N=2^14).  Pipeline: amen_cross_s
    on the posterior density (v1) -> tt_irt_lin proposal -> exact-
    density MH prune (mcmc_prune).  ESS = M / IACT with IACT in the
    UWerr 2*tau_int convention averaged over coordinates
    (statsiact.m:3-6); the rate divides by the best sampling wall time
    (IRT inversion + exact density + MH — the reference's
    time_invcdf/time_eval split, tt_irt_debias.m:22,49).  Cross build
    time is reported separately (the reference also reports the two
    phases apart)."""
    from tt_irt_tpu.models import shock_absorber as sa

    cfg = sa.ShockConfig(d=6, n=17, x=sa.paper_covariates())
    lpifun = cfg.log_posterior_fn()
    grids = cfg.grids()
    gmat = jnp.stack([jnp.asarray(g) for g in grids], axis=1)

    def cross_fun(ind):
        theta = jnp.take_along_axis(gmat, jnp.asarray(ind), axis=0)
        return jnp.exp(lpifun(theta))

    log2m = int(os.environ.get("BENCH_TTMH_LOG2M", 14))
    m = 1 << log2m
    t0 = time.perf_counter()
    res = ti.amen_cross_s([cfg.n] * (cfg.d + 2), cross_fun, 0.0,
                          tol_exit=0.05, y0=8, kickrank=2, seed=0)
    jax.block_until_ready(res.tt.cores[-1])
    t_build = time.perf_counter() - t0

    k1, k2 = jax.random.split(jax.random.PRNGKey(100))
    z = jax.random.uniform(k1, (m, cfg.d + 2), dtype=jnp.float64)

    def sample_once():
        y, lfapp = ti.tt_irt_lin(grids, res.tt, z)
        lfex = lpifun(y)
        mh = ti.mcmc_prune(y, lfex, lfapp, key=k2)
        jax.block_until_ready(mh.y)
        return mh

    mh = sample_once()  # warm-up / compile
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPS", 3))):
        t0 = time.perf_counter()
        mh = sample_once()
        best = min(best, time.perf_counter() - t0)
    tau = float(np.mean(ti.iact(np.asarray(mh.y))))
    ess = m / max(tau, 1.0)
    return {
        "ttmh_ess_per_sec": ess / best,
        "ttmh_sample_time_s": best,
        "ttmh_iact": tau,
        "ttmh_rejection_rate": float(mh.num_rejects) / m,
        "ttmh_cross_build_s": t_build,
        "ttmh_config": (f"shock absorber d=6, n=17, M=2^{log2m} "
                        "(test_shock_absorber_tt.m defaults)"),
    }


if __name__ == "__main__":
    if "--aux-only" in sys.argv:
        _aux_main()
    else:
        main()
