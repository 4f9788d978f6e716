"""Stage-sum attribution of the d=50 header cross benchmark.

Runs the reference's OWN headline configuration (amen_cross_s.m:74-82:
d=50, n=192, f(i)=sqrt(1/sum(i^2)), tol=1e-4; author-CPU figure 3.38 s
at rel err 1.7e-4) through ``amen_cross_s(profile=...)`` and prints the
disjoint per-stage wall times with the stage-sum==total discipline of
benchmarks/attrib_serveb.py: every stage is a distinct code region of
the sweep, so ``sum(stages) + untimed glue == wall``.

Stages (see constructors/amen_cross.py):
  eval_fun  - user-function probe batches (pad + dispatch + transfer)
  eval_merge- index-merge / interface evaluation feeding the batches
  dx        - convergence check + core fold
  truncate  - localcross/QR block truncation
  enrich    - AMEn candidate (einsum project + residual truncation)
  qrmaxvol  - enrichment QR + maxvol pivoting + interpolation solve
  push      - non-orth factor push into the next core
  index     - nested index-set update
  zupdate   - residual (Z) sweep state update
  reverse   - state reversal between sweeps

Usage:
    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python -u \
        benchmarks/attrib_cross.py [--tol 1e-4] [--reps 2] [--no-jit]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--d", type=int, default=50)
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-jit", action="store_true",
                    help="disable the jit_fun auto-wrap (the round-4 "
                         "eager dispatch path, for A/B)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)

    import tt_irt_tpu as ti
    from tt_irt_tpu.ops.tt import tt_eval_indices

    d, n, tol = args.d, args.n, args.tol

    def fun(ind):
        s = jnp.sum((jnp.asarray(ind, jnp.float64) + 1.0) ** 2, axis=1)
        return jnp.sqrt(1.0 / s)

    jit_fun = False if args.no_jit else "auto"

    best = None
    for rep in range(args.reps + 1):
        prof: dict = {}
        t0 = time.perf_counter()
        res = ti.amen_cross_s([n] * d, fun, tol, kickrank=4, seed=0,
                              jit_fun=jit_fun, profile=prof)
        jax.block_until_ready(res.tt.cores[-1])
        wall = time.perf_counter() - t0
        tag = "cold" if rep == 0 else f"warm{rep}"
        ssum = sum(prof.values())
        print(f"[{tag}] wall {wall:.3f} s   stage-sum {ssum:.3f} s "
              f"({100 * ssum / wall:.1f}% attributed)")
        for k in sorted(prof, key=prof.get, reverse=True):
            print(f"    {k:<10} {prof[k]:8.3f} s  {100 * prof[k] / wall:5.1f}%")
        if rep > 0 and (best is None or wall < best[0]):
            best = (wall, prof)

    rng = np.random.default_rng(5)
    idx = jnp.asarray(rng.integers(0, n, size=(4096, d)))
    approx = tt_eval_indices(res.tt, idx)
    exact = fun(idx)
    rel = jnp.abs(approx - exact) / jnp.abs(exact)
    rec = {
        "wall_s": best[0],
        "stages": {k: round(v, 4) for k, v in best[1].items()},
        "attributed_frac": round(sum(best[1].values()) / best[0], 4),
        "err_rel_rms": float(jnp.sqrt(jnp.mean(rel ** 2))),
        "err_rel_max": float(jnp.max(rel)),
        "rank_max": int(max(res.tt.ranks)),
        "evals": int(res.evalcnt[0]),
        "jit_fun": jit_fun,
        "ref_time_s": 3.38,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
