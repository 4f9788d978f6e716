"""Serve a CPU-built Lorenz DIRT checkpoint on the TPU.

The intended production split (BENCH_NOTES.md "Lorenz showcase"):
build the transport once in f64 on CPU with per-level checkpointing
(run_lorenz_dirt.py --fine-ladder --checkpoint PATH), then load the
checkpoint here and push large sample batches through it on the TPU.

Serving precision ('auto' default, samplers/dirt.py serve_precision):
'f32' matches the CPU f64 reference to ~1e-6 *per level* at full
speed; that tail error compounds across the *dimension* chain and
becomes visible to the N/ESS estimator only at d=40 (measured on the
shipped d=10/20/40 checkpoints at 2^20 — f32 N/ESS 1.093 / 1.243 /
1.77 vs 'hi' 1.093 / 1.243 / 1.57; BENCH_NOTES "serve precision
policy"), where the serve-CDF 'hi' path is also no slower — so
d>=40 defaults to 'hi' (factor-form conditionals, f64 CDF bracket
scalars) and shallower problems to 'f32'.  Reduced precision is
statistically exact for debiasing regardless: the returned
log-density is the exact Jacobian of the realized transport; only
raw-sample quality differs.

Reference workflow: test_lorenz.m builds and samples in one process;
the split is the TPU-native redesign (construction is latency-bound
host work, serving is throughput-bound device work).

Usage:
  python examples/run_lorenz_dirt.py --d 20 --nswp 2 --kickrank 2 \
      --fine-ladder --checkpoint /tmp/lz20 --save-problem /tmp/lz20
  python examples/serve_lorenz_checkpoint.py --checkpoint /tmp/lz20 \
      --problem /tmp/lz20 --log2n 20
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
from tt_irt_tpu.models import lorenz as lz
from tt_irt_tpu.utils.checkpoint import load_dirt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="DIRT checkpoint path (without .npz)")
    ap.add_argument("--problem", required=True,
                    help="prefix of {_data,_x0true,_x0base}.npy files")
    ap.add_argument("--log2n", type=int, default=20)
    ap.add_argument("--n", type=int, default=17)
    ap.add_argument("--a", type=float, default=10.0)
    ap.add_argument("--precision", default="auto",
                    help="'f32'/'mixed'/'hi'/'f64' or 'auto' (depth-"
                         "aware: 'hi' for deep stacks, see "
                         "serve_precision)")
    ap.add_argument("--fused", default=None,
                    help="1/0: force the fused Pallas step kernels on "
                         "or off (default: on for TPU)")
    ap.add_argument("--reps", type=int, default=1,
                    help="timing repetitions (best-of)")
    ap.add_argument("--round-eps", type=float, default=None,
                    help="round every level TT to this relative "
                         "tolerance before serving (rank/quality "
                         "knob; measured on lz40n33 at 2^20 on v5e: "
                         "3e-3 shrinks 3 levels to rank 18-22 and "
                         "costs N/ESS 1.57->1.82 — only pays with "
                         "rank-bucketed serving (DirtSampler "
                         "ragged_step, the default); see dirt_round)")
    ap.add_argument("--skip-quality", action="store_true",
                    help="timing only: skip the exact-posterior "
                         "N/ESS evaluation")
    ap.add_argument("--profile", default=None,
                    help="directory for a jax.profiler trace of the "
                         "timed serve")
    args = ap.parse_args()
    if args.fused is not None:
        os.environ["TTIRT_FUSED_STEP"] = str(args.fused)

    dirt = load_dirt(args.checkpoint)
    if args.round_eps:
        dirt = ti.dirt_round(dirt, args.round_eps)
        print(f"rounded at eps={args.round_eps:g}: max ranks per level "
              f"{[max(t.ranks) for t in (dirt.f0, *dirt.fs)]}")
    data = np.load(args.problem + "_data.npy")
    x0true = np.load(args.problem + "_x0true.npy")
    x0base = np.load(args.problem + "_x0base.npy")
    d = len(x0true)
    prob = lz.LorenzProblem(d=d, n=args.n, a=args.a, x0true=x0base,
                            data=data)
    prob.x0true = x0true
    lp = prob.log_posterior_fn()

    precision = args.precision
    if precision == "auto":
        precision = ti.serve_precision(dirt)
        print(f"precision auto -> {precision} ({dirt.nlevels} levels)")

    m = 1 << args.log2n
    q = ti.randref("n3", jax.random.PRNGKey(1), (m, d))
    # Production serving split: prepare once per checkpoint (backward
    # marginalizations for every level), then push batches through the
    # cached forward programs (samplers/serve.py).
    t0 = time.perf_counter()
    sampler = ti.DirtSampler(dirt, precision=precision)
    z, lfapp = sampler(q)
    _ = float(jnp.sum(z))          # warm-up compile + forced sync
    t_prep = time.perf_counter() - t0
    t_samp = float("inf")
    import contextlib
    prof = jax.profiler.trace(args.profile) if args.profile \
        else contextlib.nullcontext()
    with prof:
        for _rep in range(args.reps):
            t0 = time.perf_counter()
            z, lfapp = sampler(q)
            _ = float(jnp.sum(z)) + float(jnp.sum(lfapp))
            t_samp = min(t_samp, time.perf_counter() - t0)
    print(f"DIRT sampling 2^{args.log2n} x d={d} through "
          f"{dirt.nlevels + 1} levels: {t_samp:.2f}s "
          f"({m / t_samp:.3g} samples/s; prepare+compile "
          f"{t_prep:.1f}s one-time)", flush=True)
    if args.skip_quality:
        return

    lfex = lp(z)
    tau_ess = float(ti.essinv(lfex, lfapp))
    mh = ti.mcmc_prune(z, lfex, lfapp, key=jax.random.PRNGKey(2))
    rej = float(mh.num_rejects) / m
    w = jnp.exp(lfex - lfapp)
    w = w / jnp.sum(w)
    post_mean = np.asarray(w @ z)
    post_var = np.asarray(w @ (z - post_mean[None, :]) ** 2)
    err = np.abs(post_mean - x0true)
    print(f"N/ESS={tau_ess:.3f}  rejections={rej * 100:.1f}%")
    print(f"Trace(Cov)={post_var.sum():.4g}")
    print(f"max |postmean - truth| = {err.max():.4f}")


if __name__ == "__main__":
    main()
