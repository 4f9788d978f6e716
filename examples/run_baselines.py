"""Comparison baselines: DRAM on the shock absorber, DRAM + SVN on the
predator-prey calibration, DRAM on the inverse diffusion posterior
(reference test_shock_absorber_dram.m, test_predator_prey_dram.m,
test_predator_prey_svn.m, test_diffusion_dram.m).

Usage: python examples/run_baselines.py [--problem shock|pp|diffusion]
       [--nsteps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tt_irt_tpu.utils import set_platform
set_platform()  # honor JAX_PLATFORMS even with eager TPU plugins
import jax
import jax.numpy as jnp
import numpy as np

import tt_irt_tpu as ti
from tt_irt_tpu.samplers.dram import dram
from tt_irt_tpu.samplers.svn import svn


def run_shock(nsteps):
    from tt_irt_tpu.models import shock_absorber as sa

    cfg = sa.ShockConfig(d=6, n=17, x=sa.paper_covariates())
    lp = cfg.log_posterior_fn()
    x0 = np.concatenate([cfg.beta_mean, [3.0]])
    x0 = np.tile(x0, (8, 1))
    res = dram(lp, jnp.asarray(x0), nsteps, key=jax.random.PRNGKey(0),
               bounds=(cfg.a, cfg.b), burnin=nsteps // 4)
    chain = np.asarray(res.chain).reshape(-1, cfg.d + 2)
    q, qn = sa.quantile_qoi(jnp.asarray(chain))
    taus = ti.iact(chain[:, :3])
    print(f"DRAM shock absorber: accept={float(res.accept_rate):.3f}  "
          f"IACT={np.mean(taus):.1f}")
    print(f"  Q = [{float(q):.1f} {float(qn):.1f}]")


def run_pp(nsteps):
    from tt_irt_tpu.models import predator_prey as pp

    prob = pp.PredatorPreyProblem(seed=2, steps_per_interval=32)
    lp = prob.log_posterior_fn()
    # DRAM in normalized coordinates
    x0 = np.ones((4, 8))
    res = dram(lp, jnp.asarray(x0), nsteps, key=jax.random.PRNGKey(0),
               bounds=(np.full(8, 0.6), np.full(8, 1.6)),
               cov0=np.eye(8) * 1e-3, burnin=nsteps // 4)
    chain = np.asarray(res.chain).reshape(-1, 8)
    print(f"DRAM predator-prey: accept={float(res.accept_rate):.3f}  "
          f"IACT={np.mean(ti.iact(chain)):.1f}")
    print(f"  posterior mean: {chain.mean(axis=0)}")

    # SVN with autodiff Hessians (replaces the sensitivity-ODE machinery)
    def nlp(x):
        return -lp(x[None, :])[0]

    rng = np.random.default_rng(0)
    parts = jnp.asarray(np.clip(1.0 + 0.1 * rng.standard_normal((64, 8)),
                                0.6, 1.6))
    out = svn(nlp, parts, steps=20, step_size=0.5, max_step=0.05,
              bounds=(np.full(8, 0.6), np.full(8, 1.6)))
    p = np.asarray(out.particles)
    print(f"SVN predator-prey: particle mean {p.mean(axis=0)}")


def run_diffusion(nsteps, meshlevel=0):
    """DRAM over the KLE parameters of the inverse diffusion problem
    (test_diffusion_dram.m): exact per-sample FEM likelihood, domain
    bounds +-sqrt(3), flux QoI means + IACT after burn-in."""
    from tt_irt_tpu.models import diffusion as df

    prob = df.DiffusionProblem(meshlevel=meshlevel, tol_kle=3e-2)
    ell = prob.kle_dim
    # synthetic observations at y0 = 1.5 (run_diffusion.py convention)
    rng = np.random.default_rng(0)
    yv = np.full(ell, 1.5)
    cn = np.exp(np.sqrt(prob.sigma) * (prob.phil @ yv))
    q_obs = np.asarray(prob.observe(prob.solve_one(jnp.asarray(cn)))) + \
        rng.standard_normal(prob.m0 ** 2) * np.sqrt(prob.sigma_n)
    lfn = prob.likelihood_fn(q_obs)

    def lp(y):
        return lfn(y)[:, 0]

    s3 = np.sqrt(3.0)
    x0 = np.zeros((4, ell))
    res = dram(lp, jnp.asarray(x0), nsteps, key=jax.random.PRNGKey(0),
               bounds=(np.full(ell, -s3), np.full(ell, s3)),
               cov0=np.eye(ell) * 1e-2, burnin=max(nsteps // 4, 1))
    chain = np.asarray(res.chain).reshape(-1, ell)
    qoi = np.asarray(lfn(jnp.asarray(chain)))
    taus_y = float(np.mean(ti.iact(chain)))
    tau_f = float(ti.iact(qoi[:, 1:2])[0])
    print(f"DRAM diffusion (L={ell}): accept={float(res.accept_rate):.3f}"
          f"  IACT(y)={taus_y:.1f}  IACT(flux)={tau_f:.1f}")
    print(f"  Q = [flux {qoi[:, 1].mean():.4f}  "
          f"P(F>1.5) {qoi[:, 2].mean():.4f}]")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", choices=["shock", "pp", "diffusion"],
                    default="shock")
    ap.add_argument("--nsteps", type=int, default=8000)
    ap.add_argument("--meshlevel", type=int, default=0)
    args = ap.parse_args()
    if args.problem == "shock":
        run_shock(args.nsteps)
    elif args.problem == "diffusion":
        run_diffusion(args.nsteps, args.meshlevel)
    else:
        run_pp(args.nsteps)


if __name__ == "__main__":
    main()
