"""Shock absorber benchmark: TT-MH and TT-qIW pipelines.

Equivalent of the reference driver test_shock_absorber_tt.m (and the
python/ttpy test_shock_absorber_tt.py): build the posterior in TT via
AMEn cross, sample with the linear-spline IRT, debias with MH and with
QMC importance weighting, report quantiles / IACT / rejection rates and
the cross-run TT error estimate.

Usage: python examples/run_shock_absorber.py [--runs 8] [--log2n 14]
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
from tt_irt_tpu.models import shock_absorber as sa
from tt_irt_tpu.ops.tt import tt_sum_many, tt_norm, tt_scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=6)
    ap.add_argument("--n", type=int, default=17)
    ap.add_argument("--delta", type=float, default=0.05)
    ap.add_argument("--log2n", type=int, default=14)
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--ndev", type=int, default=0,
                    help="shard cross probe batches over this many "
                         "devices (0 = no mesh)")
    args = ap.parse_args()

    cfg = sa.ShockConfig(d=args.d, n=args.n, x=sa.paper_covariates()
                         if args.d == 6 else None)
    lpifun = cfg.log_posterior_fn()
    grids = cfg.grids()
    mesh = None
    if args.ndev:
        from tt_irt_tpu.parallel.mesh import sample_mesh

        mesh = sample_mesh(args.ndev)
    gmat = jnp.stack([jnp.asarray(g) for g in grids], axis=1)  # (n, d+2)

    def cross_fun(ind):
        # jax-traceable so the probe batches can shard over a mesh
        theta = jnp.take_along_axis(gmat, jnp.asarray(ind), axis=0)
        return jnp.exp(lpifun(theta))

    m = 1 << args.log2n
    q_mh, q_iw, taus, rejs, evals, pis = [], [], [], [], [], []
    t_cross, t_irt = [], []
    for irun in range(args.runs):
        t0 = time.perf_counter()
        res = ti.amen_cross_s([args.n] * (cfg.d + 2), cross_fun, 0.0,
                              tol_exit=args.delta, y0=8, kickrank=2,
                              seed=irun, mesh=mesh)
        t_cross.append(time.perf_counter() - t0)
        evals.append(res.evalcnt[0])
        if irun < max(args.runs // 4, 2):
            pis.append(res.tt)

        key = jax.random.PRNGKey(100 + irun)
        k1, k2 = jax.random.split(key)
        z = jax.random.uniform(k1, (m, cfg.d + 2), dtype=jnp.float64)
        t0 = time.perf_counter()
        y, lfapp = ti.tt_irt_lin(grids, res.tt, z)
        y.block_until_ready()
        t_irt.append(time.perf_counter() - t0)
        lfex = lpifun(y)
        mh = ti.mcmc_prune(y, lfex, lfapp, key=k2)
        rejs.append(float(mh.num_rejects) / m)
        qm, qm_n = sa.quantile_qoi(mh.y)
        q_mh.append([float(qm), float(qm_n)])
        taus.append(float(np.mean(ti.iact(np.asarray(mh.y)))))

        zq = jnp.asarray(ti.qmcnodes(cfg.d + 2, args.log2n, seed=irun))
        yq, lfapp_q = ti.tt_irt_lin(grids, res.tt, zq)
        w = jnp.exp(lpifun(yq) - lfapp_q)
        qi, qi_n = sa.quantile_qoi(yq, is_weight=w)
        q_iw.append([float(qi), float(qi_n)])

    err_tt = float("nan")
    if len(pis) > 1:
        mean_pi = tt_sum_many(pis, [1.0 / len(pis)] * len(pis), eps=1e-6)
        nrm = float(tt_norm(mean_pi))
        devs = [float(tt_norm(p + tt_scale(mean_pi, -1.0))) / nrm
                for p in pis]
        err_tt = float(np.sqrt(np.sum(np.square(devs)) / (len(pis) - 1)))

    q_mh = np.asarray(q_mh)
    q_iw = np.asarray(q_iw)
    print("TT shock absorber completed. Average values:")
    print(f"  N_cross: {np.mean(evals):.0f}")
    print(f"  cross time: {np.mean(t_cross):.3f}s   "
          f"IRT time: {np.mean(t_irt):.3f}s")
    print(f"  rejection rate: {np.mean(rejs) * 100:.2f}%")
    print(f"  IACT: {np.mean(taus):.3f}")
    print(f"  TT error (cross-run): {err_tt:.3g}")
    print(f"  Q_mh: {q_mh.mean(0)} +- {q_mh.std(0, ddof=1)}")
    print(f"  Q_iw: {q_iw.mean(0)} +- {q_iw.std(0, ddof=1)}")


if __name__ == "__main__":
    main()
