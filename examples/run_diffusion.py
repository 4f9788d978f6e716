"""Inverse diffusion benchmark (reference test_diffusion_tt.m):
KLE-parametrized lognormal coefficient, ALS-Cross forward surrogate,
TT posterior cross and TT-MH/TT-qIW debiasing with flux/probability QoI.

Usage: python examples/run_diffusion.py [--meshlevel 0] [--correction mcmc]
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
from tt_irt_tpu.models import diffusion as df
from tt_irt_tpu.ops.interp import lagrange_matrix
from tt_irt_tpu.ops.tt import TT, tt_eval_indices, tt_reverse, tt_sum_many


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlevel", type=int, default=0)
    ap.add_argument("--ny", type=int, default=7)
    ap.add_argument("--npi", type=int, default=32)
    ap.add_argument("--rmax", type=int, default=128)
    ap.add_argument("--log2n", type=int, default=14)
    ap.add_argument("--delta", type=float, default=0.1)
    ap.add_argument("--correction", choices=["mcmc", "iw"], default="mcmc")
    ap.add_argument("--y0", type=float, default=1.5)
    ap.add_argument("--ndev", type=int, default=0,
                    help="shard posterior-cross probe batches over this "
                         "many devices (0 = no mesh)")
    args = ap.parse_args()

    tol = 7.6742e-03 * 4.0 ** (-args.meshlevel - 1)  # htolfun (:57)
    prob = df.DiffusionProblem(meshlevel=args.meshlevel, tol_kle=tol * 3)
    ell = prob.kle_dim
    print(f"meshlevel={args.meshlevel} n={prob.n} KLE dim={ell}")

    # anisotropic Gauss grids (reference :66-74)
    ni = np.round(args.ny + (2 - args.ny)
                  * (np.log(prob.lam) / np.log(prob.lam[-1]))).astype(int)
    ni = np.maximum(ni, 2)
    ygrids = [df.lgwt(n, -np.sqrt(3), np.sqrt(3))[0] for n in ni]

    # affine log-coefficient TT
    terms = []
    for i in range(ell):
        cores = [jnp.asarray(
            (prob.phil[:, i] * np.sqrt(prob.sigma))[None, :, None])]
        for j in range(ell):
            cores.append(jnp.asarray(ygrids[j])[None, :, None] if j == i
                         else jnp.ones((1, len(ygrids[j]), 1)))
        terms.append(TT(cores))
    log_a = tt_sum_many(terms, eps=1e-12)

    t0 = time.perf_counter()
    af = ti.amen_cross_s([log_a], lambda v: np.exp(np.asarray(v)[:, 0]),
                         min(tol, 1e-4), y0=args.rmax, nswp=1, kickrank=0)
    res = ti.als_cross_parametric(
        af.tt, prob.assem_solve_fun(), tol, pua=prob.pua(),
        random_init=args.rmax, nswp=1, kickrank=0)
    t_forward = time.perf_counter() - t0
    u = res.u
    print(f"forward model: {t_forward:.2f}s, {res.funevals} PDE solves, "
          f"ranks {u.ranks}")

    # observables block TT over the parametric dims: one batched
    # contraction of the observation operator over the spatial basis
    # (the reference's per-column loop, test_diffusion_tt.m:119-125)
    u0 = np.asarray(u.cores[0][0])
    q_cols = np.asarray(prob.observe(jnp.asarray(u0.T))).T
    core1 = jnp.einsum("qa,anb->qnb", jnp.asarray(q_cols), u.cores[1])
    uav = TT([core1] + list(u.cores[2:]))
    uav_rev = tt_reverse(uav)

    # synthesize observations at y0 (cached .mat analog: deterministic)
    rng = np.random.default_rng(0)
    yv = np.full(ell, args.y0)
    cn = np.exp(np.sqrt(prob.sigma) * (prob.phil @ yv))
    q_obs = np.asarray(prob.observe(prob.solve_one(jnp.asarray(cn)))) + \
        rng.standard_normal(prob.m0 ** 2) * np.sqrt(prob.sigma_n)

    # interpolate observables from Gauss to uniform grids, then build the
    # posterior density TT by cross over indices
    ys = [np.linspace(-np.sqrt(3), np.sqrt(3), args.npi)
          for _ in range(ell)]
    lmats = [np.asarray(lagrange_matrix(g, u))
             for g, u in zip(ygrids, ys)]
    # re-interpolated observable TT (apply 1-D interpolation matrices)
    cores = list(uav.cores)
    new_cores = []
    for k, c in enumerate(cores):
        new_cores.append(jnp.einsum("pm,amb->apb",
                                    jnp.asarray(lmats[k]), c))
    uav_uni = TT(new_cores)
    uav_uni_rev = tt_reverse(uav_uni)

    q_obs_j = jnp.asarray(q_obs)

    def post_fun(ind):
        # jax-traceable so the probe batches can shard over a mesh
        vals = tt_eval_indices(uav_uni_rev, jnp.asarray(ind)[:, ::-1])
        mis = jnp.sum((vals - q_obs_j[None, :]) ** 2, axis=1)
        return jnp.exp(-mis / (2.0 * prob.sigma_n))

    mesh = None
    if args.ndev:
        from tt_irt_tpu.parallel.mesh import sample_mesh

        mesh = sample_mesh(args.ndev)
    t0 = time.perf_counter()
    pi = ti.amen_cross_s([args.npi] * ell, post_fun, 0.0,
                         tol_exit=args.delta, y0=args.rmax, kickrank=0,
                         nswp=1, seed=1, mesh=mesh)
    t_pi = time.perf_counter() - t0
    print(f"posterior cross: {t_pi:.2f}s, ranks {pi.tt.ranks}")

    lfn = prob.likelihood_fn(q_obs)

    def lffun(y):
        out = lfn(y)
        return out  # columns [logL, flux, indicator]

    m = 1 << args.log2n
    if args.correction == "mcmc":
        z = jax.random.uniform(jax.random.PRNGKey(5), (m, ell),
                               dtype=jnp.float64)
    else:
        z = jnp.asarray(ti.qmcnodes(ell, args.log2n, seed=5))
    t0 = time.perf_counter()
    y, lfapp = ti.tt_irt_lin(ys, pi.tt, z)
    y.block_until_ready()
    t_irt = time.perf_counter() - t0
    lfex = lffun(y)
    if args.correction == "mcmc":
        mh = ti.mcmc_prune(y, lfex, lfapp, key=jax.random.PRNGKey(6))
        qoi = np.asarray(mh.lfex[:, 1:3]).mean(axis=0)
        rej = float(mh.num_rejects) / m
        taui = ti.iact(np.asarray(mh.lfex[:, 1]))
        print(f"IRT: {t_irt:.3f}s  rejections: {rej * 100:.1f}%  "
              f"IACT(flux): {float(taui):.2f}")
    else:
        iw = ti.iw_prune(lfex, lfapp)
        qoi = np.asarray(iw.lfex[:, 1:3]).mean(axis=0)
        print(f"IRT: {t_irt:.3f}s  IW rel-std: {float(iw.isstd):.3f}")
    print(f"QoI [flux, P(flux>1.5)]: {qoi}")


if __name__ == "__main__":
    main()
