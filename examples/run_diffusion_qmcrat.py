"""Plain QMC ratio estimator for the inverse diffusion problem
(reference test_diffusion_qmcrat.m): QoI = sum(pi * Q) / sum(pi) over a
randomized QMC point set on the prior — the no-transport baseline the
TT methods are compared against.

Usage: python examples/run_diffusion_qmcrat.py [--log2n 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tt_irt_tpu.utils import set_platform
set_platform()  # honor JAX_PLATFORMS even with eager TPU plugins
import jax.numpy as jnp
import numpy as np

import tt_irt_tpu as ti
from tt_irt_tpu.models import diffusion as df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlevel", type=int, default=0)
    ap.add_argument("--log2n", type=int, default=12)
    ap.add_argument("--shifts", type=int, default=4)
    ap.add_argument("--y0", type=float, default=1.5)
    args = ap.parse_args()

    tol = 7.6742e-03 * 4.0 ** (-args.meshlevel - 1)
    prob = df.DiffusionProblem(meshlevel=args.meshlevel, tol_kle=tol * 3)
    ell = prob.kle_dim

    # observations at the synthetic truth (same convention as
    # run_diffusion.py so results are comparable)
    rng = np.random.default_rng(0)
    yv = np.full(ell, args.y0)
    cn = np.exp(np.sqrt(prob.sigma) * (prob.phil @ yv))
    q_obs = np.asarray(prob.observe(prob.solve_one(jnp.asarray(cn)))) + \
        rng.standard_normal(prob.m0 ** 2) * np.sqrt(prob.sigma_n)

    lfn = prob.likelihood_fn(q_obs)
    qois = []
    t0 = time.perf_counter()
    for s in range(args.shifts):
        # prior samples: QMC points mapped through the truncated-prior
        # band [-sqrt(3), sqrt(3)] (uniformized KLE coordinates)
        u = ti.qmcnodes(ell, args.log2n, seed=s)
        y = (2.0 * u - 1.0) * np.sqrt(3.0)
        out = np.asarray(lfn(jnp.asarray(y)))   # [logL, flux, indicator]
        w = np.exp(out[:, 0] - out[:, 0].max())
        qoi = (w[:, None] * out[:, 1:3]).sum(0) / w.sum()
        qois.append(qoi)
    t_total = time.perf_counter() - t0
    qois = np.asarray(qois)
    print(f"QMC ratio estimator ({args.shifts} shifts x 2^{args.log2n} "
          f"nodes, {t_total:.1f}s):")
    print(f"  QoI [flux, P(flux>1.5)]: {qois.mean(0)} "
          f"+- {qois.std(0, ddof=1)}")


if __name__ == "__main__":
    main()
