"""dirt_round x ragged-serve curve on the shipped lz40n33 checkpoint
(VERDICT r04 #7: the rank-bucketed serving dirt_round needed landed in
round 4 — this records whether rounding now actually buys serve time,
and the real rank/quality/throughput curve).

For each eps: round the stack, serve 2^log2m reference seeds through a
fresh DirtSampler ('hi' depth policy), report best-of-reps serve time
and N/ESS against the exact Lorenz posterior at 2^18 seeds.

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python -u \
        benchmarks/bench_dirt_round.py --eps 0,3e-3,1e-2
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps", default="0,3e-3,1e-2")
    ap.add_argument("--log2m", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)

    import tt_irt_tpu as ti
    from tt_irt_tpu.models import lorenz as lz
    from tt_irt_tpu.samplers.irt_scan import resolved_serve_modes
    from tt_irt_tpu.utils.checkpoint import load_dirt

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirt = load_dirt(os.path.join(root, "examples", "data", "lz40n33_ck"))
    d = dirt.d
    base = os.path.join(root, "examples", "data", "lz40n33")
    prob = lz.LorenzProblem(
        d=d, n=33, a=10.0,
        x0true=np.load(base + "_x0base.npy"),
        data=np.load(base + "_data.npy"))
    lp = prob.log_posterior_fn()

    m = 1 << args.log2m
    q = ti.randref("n3", jax.random.PRNGKey(7), (m, d))
    mq = min(m, 1 << 18)

    print(json.dumps({"serve_modes": resolved_serve_modes()}))
    for eps_s in args.eps.split(","):
        eps = float(eps_s)
        dd = ti.dirt_round(dirt, eps) if eps > 0 else dirt
        rmaxes = [int(max(t.ranks)) for t in [dd.f0] + list(dd.fs)]
        precision = ti.serve_precision(dd)
        sampler = ti.DirtSampler(dd, precision=precision)

        def run():
            z, lf = sampler(q)
            return float(jnp.sum(z)) + float(jnp.sum(lf))

        run()   # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)

        z, lfapp = sampler(q[:mq])
        lfex = lp(z)
        ness = float(ti.essinv(lfex, lfapp))
        print(json.dumps({
            "eps": eps,
            "level_rank_max": rmaxes,
            "precision": precision,
            "serve_s": round(best, 4),
            "samples_per_s": round(m / best, 1),
            "ness": round(ness, 4),
            "log2m": args.log2m,
        }))


if __name__ == "__main__":
    main()
