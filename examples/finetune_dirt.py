"""Gradient fine-tuning of a rank-capped DIRT (KL descent).

Demonstrates a capability the reference toolbox cannot offer: because
the whole IRT transform is differentiable in JAX, a cross-built DIRT
can be trained like a normalizing flow.  The demo builds a deliberately
rank-capped stack (the regime where serve-latency budgets cap ranks
below what cross interpolation needs), then closes most of the
remaining N/ESS gap with Adam at the SAME rank.

Problems:
  gauss — strongly-correlated banded Gaussian (analytic sanity case);
  shock — the reference's shock-absorber posterior (censored Weibull x
          Normal-Gamma, test_shock_absorber_tt.m): measured
          N/ESS 28.9 -> 2.0 at rank 3 with 300 forward-KL steps (~8 s
          CPU).

Run:  python examples/finetune_dirt.py [--problem shock] [--steps 300]
"""
import argparse
import time

import jax.numpy as jnp
import numpy as np

from tt_irt_tpu import (
    dirt_finetune, essinv, hellinger, tt_dirt_approx, tt_dirt_sample,
)


def make_gauss(args):
    def lp(x):
        return -0.5 * (jnp.sum(x * x, axis=1) + 2.0 * args.corr
                       * jnp.sum(x[:, :-1] * x[:, 1:], axis=1))

    grids = [np.linspace(-6, 6, args.n) for _ in range(args.d)]
    return lp, grids


def make_shock(args):
    from tt_irt_tpu.models.shock_absorber import (
        ShockConfig, paper_covariates,
    )

    cfg = ShockConfig(d=6, n=args.n, x=paper_covariates())
    return cfg.log_posterior_fn(), cfg.grids()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", choices=["gauss", "shock"],
                    default="gauss")
    ap.add_argument("--d", type=int, default=6,
                    help="dimension (gauss only; shock is 8)")
    ap.add_argument("--corr", type=float, default=0.55,
                    help="banded correlation; must stay below the "
                         "positive-definiteness bound ~1/(2 cos(pi/(d+1)))")
    ap.add_argument("--n", type=int, default=13)
    ap.add_argument("--rank", type=int, default=2)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--nsamples", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--objective", choices=["reverse", "forward"],
                    default="forward",
                    help="forward (IS-weighted MLE, mass-covering) is "
                         "the measured winner for N/ESS")
    ap.add_argument("--log2n-eval", type=int, default=14)
    args = ap.parse_args()

    if args.problem == "shock":
        if args.rank == 2:
            args.rank = 3
        lp, grids = make_shock(args)
    else:
        lp, grids = make_gauss(args)
    d = len(grids)

    def logratio(x, b0, b1):
        return (b1 - b0) * lp(x)

    t0 = time.time()
    dirt = tt_dirt_approx(grids, logratio, [1.0], stoptol=0.5, nswp=1,
                          kickrank=0, y0=args.rank, rmax=args.rank,
                          testsamples=0, verb=0, seed=5)
    t_build = time.time() - t0
    print(f"cross build: {t_build:.2f}s  ranks={dirt.f0.ranks}")

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4,
                                size=(2 ** args.log2n_eval, d)))
    z, lfapp = tt_dirt_sample(dirt, q)
    lfex = lp(z)
    print(f"before: N/ESS={float(essinv(lfex, lfapp)):.3f}  "
          f"Hellinger={float(hellinger(lfex, lfapp)):.4f}")

    t0 = time.time()
    tuned, losses = dirt_finetune(dirt, lp, steps=args.steps,
                                  nsamples=args.nsamples, lr=args.lr,
                                  seed=1, verb=1,
                                  objective=args.objective)
    t_ft = time.time() - t0

    z, lfapp = tt_dirt_sample(tuned, q)
    lfex = lp(z)
    print(f"after {args.steps} Adam steps ({t_ft:.1f}s, "
          f"{args.objective}): "
          f"N/ESS={float(essinv(lfex, lfapp)):.3f}  "
          f"Hellinger={float(hellinger(lfex, lfapp)):.4f}")
    print(f"loss: {losses[0]:+.4f} -> {losses[-10:].mean():+.4f}")


if __name__ == "__main__":
    main()
