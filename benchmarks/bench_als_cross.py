"""ALS-Cross performance record (VERDICT r04 #5).

Times the diffusion forward-surrogate build — the reference's own
ALS-Cross workload (test_diffusion_tt.m: affine-KLE coefficient cross +
`als_cross_parametric` with the deterministic FEM callback) — and
reports the profiling split the reference itself prints
(als_cross_parametric.m:43-45: time_extern solve/project seconds +
funevals).

Usage:
    # CPU:
    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python -u \
        benchmarks/bench_als_cross.py --meshlevel 1
    # real chip (batched parametric blocks on the TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python -u \
        benchmarks/bench_als_cross.py --meshlevel 1
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlevel", type=int, default=1)
    ap.add_argument("--rmax", type=int, default=8)
    ap.add_argument("--nswp", type=int, default=1)
    ap.add_argument("--kickrank", type=int, default=0)
    ap.add_argument("--ny", type=float, default=8.0)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)

    import tt_irt_tpu as ti
    from tt_irt_tpu import TT, tt_sum_many
    from tt_irt_tpu.models import diffusion as df

    tol = 7.6742e-03 * 4.0 ** (-args.meshlevel - 1)   # htolfun
    prob = df.DiffusionProblem(meshlevel=args.meshlevel,
                               tol_kle=tol * 3)
    ell = prob.kle_dim
    ni = np.round(args.ny + (2 - args.ny)
                  * (np.log(prob.lam) / np.log(prob.lam[-1]))).astype(int)
    ni = np.maximum(ni, 2)
    ygrids = [df.lgwt(n, -np.sqrt(3), np.sqrt(3))[0] for n in ni]

    terms = []
    for i in range(ell):
        cores = [jnp.asarray(
            (prob.phil[:, i] * np.sqrt(prob.sigma))[None, :, None])]
        for j in range(ell):
            cores.append(jnp.asarray(ygrids[j])[None, :, None] if j == i
                         else jnp.ones((1, len(ygrids[j]), 1)))
        terms.append(TT(cores))
    log_a = tt_sum_many(terms, eps=1e-12)

    best = None
    for rep in range(args.reps):
        t0 = time.perf_counter()
        af = ti.amen_cross_s([log_a],
                             lambda v: np.exp(np.asarray(v)[:, 0]),
                             min(tol, 1e-4) * 0.1, y0=args.rmax,
                             nswp=3, kickrank=2)
        t_coeff = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = ti.als_cross_parametric(
            af.tt, prob.assem_solve_fun(), tol, pua=prob.pua(),
            random_init=args.rmax, nswp=args.nswp,
            kickrank=args.kickrank)
        jax.block_until_ready(res.u.cores[-1])
        t_als = time.perf_counter() - t0
        rec = {
            "backend": jax.default_backend(),
            "meshlevel": args.meshlevel,
            "spatial_n": prob.n,
            "kle_dim": ell,
            "tol": tol,
            "coeff_cross_s": round(t_coeff, 4),
            "als_cross_s": round(t_als, 4),
            "time_solve_s": round(res.time_extern[0], 4),
            "time_project_s": round(res.time_extern[1], 4),
            "funevals": res.funevals,
            "ranks": [int(r) for r in res.u.ranks],
            "rep": rep,
        }
        print(json.dumps(rec))
        if best is None or t_als < best["als_cross_s"]:
            best = rec

    # quality: surrogate vs direct FEM solve at random parameters
    rng = np.random.default_rng(3)
    idx = np.stack([rng.integers(0, len(g), 64) for g in ygrids], axis=1)
    yv = np.stack([np.asarray(g)[idx[:, j]]
                   for j, g in enumerate(ygrids)], axis=1)
    u0 = np.asarray(res.u.cores[0][0])          # (nxy, r1)
    errs = []
    for k in range(8):
        cn = np.exp(np.sqrt(prob.sigma) * (prob.phil @ yv[k]))
        ud = np.asarray(prob.solve_one(jnp.asarray(cn)))
        # evaluate the TT at the k-th parametric index
        cores = [np.asarray(c) for c in res.u.cores]
        vec = np.ones((1,))
        for j in range(len(cores) - 1, 0, -1):
            vec = cores[j][:, idx[k, j - 1], :] @ vec
        us = u0 @ vec
        errs.append(float(np.linalg.norm(us - ud)
                          / np.linalg.norm(ud)))
    best["surrogate_rel_err_max"] = float(np.max(errs))
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
