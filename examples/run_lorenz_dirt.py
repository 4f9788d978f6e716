"""Lorenz initial-state identification via DIRT (reference test_lorenz.m).

d up to 40 (the stress benchmark): prior-tempered DIRT over
beta = 10^(-4:1/2:0), truncated-normal 'n3' reference, IS-weighted
posterior statistics and trace of the posterior covariance.

At large d the likelihood concentrates sharply around beta ~ 1e-2 and
the half-decade ratio spans ~e^50; --fine-ladder switches to
quarter-decade steps there, which pass the DIRT quality gate first-try
where half-decade steps need many recompute retries.  --checkpoint
saves the transport after every accepted level so a long build can be
resumed (load_dirt + irtstruct=) or served mid-ladder.

Usage: python examples/run_lorenz_dirt.py [--d 10] [--nsamples 10000]
       python examples/run_lorenz_dirt.py --d 20 --nswp 2 --kickrank 2 \
           --fine-ladder --checkpoint /tmp/lz20_ck
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tt_irt_tpu.utils import set_platform
set_platform()  # honor JAX_PLATFORMS even with eager TPU plugins
import jax
import jax.numpy as jnp
import numpy as np

import tt_irt_tpu as ti
from tt_irt_tpu.models import lorenz as lz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--n", type=int, default=17)
    ap.add_argument("--a", type=float, default=10.0)
    ap.add_argument("--r0", type=int, default=15)
    ap.add_argument("--nsamples", type=int, default=10_000)
    ap.add_argument("--precision", default=None)
    ap.add_argument("--build-precision", default=None,
                    help="IRT precision for construction-time pushes "
                         "(DirtOptions.precision); 'hi' runs the build "
                         "on TPU at near-f64 accuracy")
    ap.add_argument("--nswp", default="1",
                    help="sweeps per level; scalar or comma-separated "
                         "per-level vector (last value repeats)")
    ap.add_argument("--kickrank", default="0",
                    help="rank enrichment; scalar or per-level vector")
    ap.add_argument("--irtdenom", default="0",
                    help="per-level 0/1 vector: ratio against the "
                         "realized IRT density instead of the previous "
                         "tempered density (tt_dirt_approx.m:466-473) — "
                         "corrects accumulated prefix error at deep "
                         "levels")
    ap.add_argument("--fine-ladder", action="store_true",
                    help="quarter-decade beta steps above 1e-2")
    ap.add_argument("--beta-extra", default=None,
                    help="comma-separated extra beta values inserted "
                         "into the ladder (e.g. 0.75 to halve the last "
                         "quarter-decade step at d=40)")
    ap.add_argument("--checkpoint", default=None,
                    help="save the DIRT after every accepted level")
    ap.add_argument("--resume", default=None,
                    help="load a DIRT checkpoint prefix and append the "
                         "remaining ladder levels (tt_dirt_approx.m:154-173 "
                         "semantics)")
    ap.add_argument("--save-problem", default=None,
                    help="prefix for {_data,_x0true,_x0base}.npy so "
                         "serve_lorenz_checkpoint.py can reload the "
                         "synthetic problem")
    args = ap.parse_args()

    prob = lz.LorenzProblem(d=args.d, n=args.n, a=args.a)
    if args.save_problem:
        np.save(args.save_problem + "_data.npy", prob.data)
        np.save(args.save_problem + "_x0true.npy", prob.x0true)
        np.save(args.save_problem + "_x0base.npy", prob.x0base)
    if args.fine_ladder:
        beta = np.concatenate([10.0 ** np.arange(-4, -2, 0.5),
                               10.0 ** np.arange(-2, 0.25, 0.25)])
    else:
        beta = 10.0 ** np.arange(-4, 0.5, 0.5)
    if args.beta_extra:
        extra = [float(v) for v in args.beta_extra.split(",")]
        beta = np.unique(np.concatenate([beta, extra]))

    irtstruct = None
    if args.resume:
        from tt_irt_tpu.utils.checkpoint import load_dirt

        irtstruct = load_dirt(args.resume)
        print(f"resuming from {args.resume}: {irtstruct.nlevels} levels "
              f"built (beta <= {float(np.asarray(irtstruct.beta)[-1]):g})")
        # the synthesized problem is deterministic in (d, n, a, seed); if
        # the build saved its problem instance, verify we regenerated it
        base = args.resume.replace("_ck", "")
        if os.path.exists(base + "_data.npy"):
            assert np.allclose(np.load(base + "_data.npy"), prob.data), \
                "resumed problem data does not match the checkpoint's"

    def per_level(s, cast=int):
        vals = [cast(v) for v in str(s).split(",")]
        return vals[0] if len(vals) == 1 else vals

    t0 = time.perf_counter()
    dirt = ti.tt_dirt_approx(
        prob.grids(), prob.tempered_logratio_fn(), beta,
        nswp=per_level(args.nswp), kickrank=per_level(args.kickrank),
        irtdenom=per_level(args.irtdenom, cast=lambda v: bool(int(v))),
        y0=args.r0, boundary=True, stoptol=0.1,
        checkpoint_path=args.checkpoint, reference="n3",
        testsamples=1000, seed=0, verb=1, irtstruct=irtstruct,
        precision=args.build_precision)
    t_build = time.perf_counter() - t0

    key = jax.random.PRNGKey(1)
    q = ti.randref("n3", key, (args.nsamples, args.d))
    t0 = time.perf_counter()
    z, lfapp, lfex = ti.tt_dirt_sample(dirt, q, prob.log_posterior_fn(),
                                       precision=args.precision)
    z.block_until_ready()
    t_sample = time.perf_counter() - t0

    tau_ess = float(ti.essinv(lfex, lfapp))
    mh = ti.mcmc_prune(z, lfex, lfapp, key=jax.random.PRNGKey(2))
    tau_iact = float(np.mean(ti.iact(np.asarray(mh.y))))

    # IS-weighted posterior statistics (test_lorenz.m:133-135)
    w = jnp.exp(lfex - lfapp)
    w = w / jnp.sum(w)
    post_mean = np.asarray(w @ z)
    post_var = np.asarray(w @ (z - post_mean[None, :]) ** 2)

    print(f"Lorenz-{args.d} DIRT completed:")
    print(f"  build time: {t_build:.2f}s  sampling: {t_sample:.3f}s")
    print(f"  IACT: {tau_iact:.3f}   N/ESS: {tau_ess:.3f}")
    print(f"  Trace(Cov): {post_var.sum():.4g}")
    print(f"  truth:     {np.asarray(prob.x0true)[:8]}")
    print(f"  post mean: {post_mean[:8]}")
    err = np.abs(post_mean - np.asarray(prob.x0true))
    print(f"  max |mean - truth|: {err.max():.4f}")


if __name__ == "__main__":
    main()
