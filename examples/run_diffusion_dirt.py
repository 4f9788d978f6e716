"""Inverse diffusion via DIRT with Fourier interpolation (reference
test_diffusion_dirt.m): the posterior is bridged over a short tempering
ladder with a TT surrogate of the observables driving the ratio
evaluations (tt_sample_lagr surrogate, :146), reference 'n4', Fourier
basis at levels >= 1 (:150-152); final debias against the exact
likelihood.

Usage: python examples/run_diffusion_dirt.py [--log2n 12]

On a real chip, pass --build-on-cpu: the build phase (coefficient
cross + ALS-Cross FEM solves + DIRT construction) is host-driven f64
work that measured ~55x slower when dispatched through the device
tunnel (BENCH_NOTES round-5 ALS-Cross table); the flag pins it to the
host CPU backend while the serve + N/ESS phases run on the chip —
the same host-build / device-serve split the rest of the repo uses.
"""

import argparse
import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --build-on-cpu needs the cpu backend NEXT TO the TPU one; a preset
# JAX_PLATFORMS=<tpu-plugin> would otherwise exclude it (the first
# entry stays the default backend, so device placement is unchanged).
if "--build-on-cpu" in sys.argv:
    _plat = os.environ.get("JAX_PLATFORMS", "")
    if _plat and "cpu" not in _plat.split(","):
        os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

from tt_irt_tpu.utils import set_platform
set_platform()  # honor JAX_PLATFORMS even with eager TPU plugins
import jax
import jax.numpy as jnp
import numpy as np

import tt_irt_tpu as ti
from tt_irt_tpu.models import diffusion as df
from tt_irt_tpu.ops.interp import tt_sample_lagrange
from tt_irt_tpu.ops.tt import TT, tt_reverse, tt_sum_many


def build(args, prob, ell, tol):
    """Build phase: coefficient cross + ALS-Cross surrogate + DIRT."""
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
    af = ti.amen_cross_s([log_a], lambda v: np.exp(np.asarray(v)[:, 0]),
                         min(tol, 1e-4) * 0.1, y0=args.rpi, nswp=3,
                         kickrank=2)
    res = ti.als_cross_parametric(af.tt, prob.assem_solve_fun(), tol,
                                  pua=prob.pua(), random_init=args.rpi,
                                  nswp=2, kickrank=2)
    u = res.u
    u0 = np.asarray(u.cores[0][0])
    q_cols = np.stack([np.asarray(prob.observe(jnp.asarray(u0[:, j])))
                       for j in range(u0.shape[1])], axis=1)
    core1 = jnp.einsum("qa,anb->qnb", jnp.asarray(q_cols), u.cores[1])
    uav_rev = tt_reverse(TT([core1] + list(u.cores[2:])))

    rng = np.random.default_rng(0)
    yv = np.full(ell, args.y0)
    cn = np.exp(np.sqrt(prob.sigma) * (prob.phil @ yv))
    q_obs = np.asarray(prob.observe(prob.solve_one(jnp.asarray(cn)))) + \
        rng.standard_normal(prob.m0 ** 2) * np.sqrt(prob.sigma_n)
    q_obs_j = jnp.asarray(q_obs)
    rev_grids = list(reversed(ygrids))

    def surrogate_lp(theta, b0, b1):
        # observables via Lagrange interpolation of the TT surrogate
        # (the reference's lpfun with tt_sample_lagr,
        #  test_diffusion_dirt.m:146)
        vals = tt_sample_lagrange(uav_rev, rev_grids,
                                  jnp.asarray(theta)[:, ::-1])
        mis = jnp.sum((vals - q_obs_j[None, :]) ** 2, axis=1)
        return -(b1 - b0) * mis / (2.0 * prob.sigma_n)

    grids0 = [np.linspace(-np.sqrt(3), np.sqrt(3), args.npi)
              for _ in range(ell)]
    beta = 10.0 ** np.arange(-1, 0.5, 0.5)   # reference :43: 10^(-1:.5:0)
    t0 = time.perf_counter()
    dirt = ti.tt_dirt_approx(
        grids0, surrogate_lp, beta, nswp=1, kickrank=0, y0=args.rpi,
        boundary=True, stoptol=0.1, reference="n4",
        interpolation="fourier", nq=[16] * ell, testsamples=256, seed=0)
    t_build = time.perf_counter() - t0
    return dirt, q_obs, t_build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlevel", type=int, default=0)
    ap.add_argument("--ny", type=int, default=7)
    ap.add_argument("--npi", type=int, default=17)
    ap.add_argument("--rpi", type=int, default=8)
    ap.add_argument("--log2n", type=int, default=12)
    ap.add_argument("--log2ness", type=int, default=None,
                    help="exact-likelihood N/ESS sample count (2^k; "
                         "default min(log2n, 12) — the dense-FEM "
                         "likelihood at 2^16 is a ~2 GB/block device "
                         "workload and only the estimator benefits)")
    ap.add_argument("--y0", type=float, default=1.5)
    ap.add_argument("--build-on-cpu", action="store_true",
                    help="pin the build phase to the host CPU backend "
                         "(host-driven f64 FEM work; ~55x slower "
                         "through a device tunnel) and keep serve + "
                         "N/ESS on the default (TPU) backend")
    args = ap.parse_args()

    tol = 7.6742e-03 * 4.0 ** (-args.meshlevel - 1)
    prob = df.DiffusionProblem(meshlevel=args.meshlevel, tol_kle=tol * 3)
    ell = prob.kle_dim
    print(f"meshlevel={args.meshlevel} KLE dim={ell}")

    ctx = (jax.default_device(jax.devices("cpu")[0])
           if args.build_on_cpu else contextlib.nullcontext())
    with ctx:
        dirt, q_obs, t_build = build(args, prob, ell, tol)

    lfn = prob.likelihood_fn(q_obs)
    m = 1 << args.log2n
    q = ti.randref("n4", jax.random.PRNGKey(3), (m, ell))
    t0 = time.perf_counter()
    z, lfapp = ti.tt_dirt_sample(dirt, q)
    z.block_until_ready()
    t_sample = time.perf_counter() - t0

    # Prepare-once production serving (DirtSampler reuses the Fourier
    # precompute struct, tt_irt_fourier.m:106-137): report the steady
    # rate separately from the one-shot cold sample above.
    sampler = ti.DirtSampler(dirt)
    zs, lfs = sampler(q)
    float(jnp.sum(zs))            # materialize (remote-backend safe)
    t0 = time.perf_counter()
    zs, lfs = sampler(q)
    _sync = float(jnp.sum(zs)) + float(jnp.sum(lfs))
    t_steady = time.perf_counter() - t0
    print(f"prep-once steady serve: {t_steady:.3f}s "
          f"({m / t_steady:.3g} samples/s)")
    mness = 1 << (args.log2ness if args.log2ness is not None
                  else min(args.log2n, 12))
    out = lfn(z[:mness])
    lfex = out[:, 0]
    tau_ess = float(ti.essinv(lfex, lfapp[:mness]))
    mh = ti.mcmc_prune(z[:mness], out, lfapp[:mness],
                       key=jax.random.PRNGKey(4))
    rej = float(mh.num_rejects) / mness
    taui = float(ti.iact(np.asarray(mh.lfex[:, 1])))
    qoi = np.asarray(mh.lfex[:, 1:3]).mean(axis=0)
    print(f"DIRT build: {t_build:.1f}s  sampling: {t_sample:.2f}s")
    print(f"N/ESS: {tau_ess:.3f}  rejections: {rej * 100:.1f}%  "
          f"IACT(flux): {taui:.2f}")
    print(f"QoI [flux, P(flux>1.5)]: {qoi}")


if __name__ == "__main__":
    main()
