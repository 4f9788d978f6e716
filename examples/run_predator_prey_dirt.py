"""Predator-prey DIRT calibration (reference test_predator_prey_dirt.m).

Builds a DIRT over the tempering ladder for the 8-parameter
Lotka-Volterra-Holling model, samples, debiases with MH and reports
rejection rate / IACT / N/ESS / posterior moments and the
Forstner-Moonen distance between per-run covariances.

Usage: python examples/run_predator_prey_dirt.py [--runs 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tt_irt_tpu.utils import set_platform
set_platform()  # honor JAX_PLATFORMS even with eager TPU plugins
import jax
import numpy as np

import tt_irt_tpu as ti
from tt_irt_tpu.models import predator_prey as pp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--nsamples", type=int, default=10_000)
    ap.add_argument("--n", type=int, default=18)
    ap.add_argument("--r0", type=int, default=13)
    args = ap.parse_args()

    prob = pp.PredatorPreyProblem(n=args.n)
    beta = 10.0 ** np.arange(-4, 0.5, 0.5)

    taus, tau_ess, rejs, means, covs, evals = [], [], [], [], [], []
    t_approx, t_sample = [], []
    for irun in range(args.runs):
        t0 = time.perf_counter()
        dirt = ti.tt_dirt_approx(
            prob.grids(), prob.tempered_logratio_fn(), beta,
            nswp=1, kickrank=0, y0=args.r0, boundary=True, stoptol=0.1,
            reference="n4", testsamples=100, seed=irun, verb=0)
        t_approx.append(time.perf_counter() - t0)
        evals.append(int(np.sum(np.atleast_1d(dirt.evalcnt))))

        key = jax.random.PRNGKey(200 + irun)
        k1, k2 = jax.random.split(key)
        q = ti.randref("n4", k1, (args.nsamples, prob.d))
        t0 = time.perf_counter()
        z, lfapp, lfex = ti.tt_dirt_sample(dirt, q,
                                           prob.log_posterior_fn())
        z.block_until_ready()
        t_sample.append(time.perf_counter() - t0)

        tau_ess.append(float(ti.essinv(lfex, lfapp)))
        mh = ti.mcmc_prune(z, lfex, lfapp, key=k2)
        rejs.append(float(mh.num_rejects) / args.nsamples)
        y = np.asarray(mh.y)
        taus.append(float(np.mean(ti.iact(y))))
        means.append(y.mean(axis=0))
        covs.append(np.cov(y.T))

    covs = np.asarray(covs)
    cov_mean = covs.mean(axis=0)
    fdist = []
    for c in covs:
        w = np.linalg.eigvals(np.linalg.solve(cov_mean, c))
        fdist.append(float(np.sum(np.log(np.real(w)) ** 2)))

    print("Predator-prey DIRT completed:")
    print(f"  %rejected: {np.mean(rejs) * 100:.2f} +- "
          f"{np.std(rejs) * 100:.2f}")
    print(f"  IACT: {np.mean(taus):.3f} +- {np.std(taus):.3f}")
    print(f"  N/ESS: {np.mean(tau_ess):.3f} +- {np.std(tau_ess):.3f}")
    print(f"  evals/level: {np.mean(evals) / len(beta):.0f}")
    print(f"  DIRT time: {np.mean(t_approx):.2f}s   "
          f"sampling time: {np.mean(t_sample):.3f}s")
    print(f"  FM distance: {np.mean(fdist):.3g} +- {np.std(fdist):.3g}")
    print(f"  posterior mean (normalized): "
          f"{np.asarray(means).mean(axis=0)}")


if __name__ == "__main__":
    main()
