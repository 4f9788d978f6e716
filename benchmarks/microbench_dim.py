"""Per-dim serve-step microbenchmark: XLA 'serveb' path vs the merged
Pallas dim kernel (ops/pallas_dim.py) at the lz40n33 production shape.

One TPU client sweeps every config (env knobs are re-read per call;
`jax.clear_caches()` between configs forces a re-trace so the knob
actually takes effect inside the jitted forward).  Timing forces a
host read (the axon backend's block_until_ready can return early —
see .claude/skills/verify/SKILL.md).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -u \
        benchmarks/microbench_dim.py --configs xla,k1024,k2048:64,k4096:100

Config grammar: 'xla' = kernel off; 'kTILE[:VMEM_MB]' = merged dim
kernel with TTIRT_DIM_TILE=TILE and (optionally) TTIRT_DIM_VMEM_MB.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2 ** 18)
    ap.add_argument("--n", type=int, default=33)
    ap.add_argument("--r", type=int, default=23)
    ap.add_argument("--d", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--precision", default="hi")
    ap.add_argument("--configs",
                    default="xla,k1024,k2048:64,k4096:100")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tt_irt_tpu as ti

    rng = np.random.default_rng(0)
    d, n, r, m = args.d, args.n, args.r, args.m
    cores = []
    for k in range(d):
        r1 = 1 if k == 0 else r
        r2 = 1 if k == d - 1 else r
        # mildly varying positive-leaning cores: a realistic
        # sqrt-density surrogate (the sqr transform squares it anyway)
        cores.append(rng.standard_normal((r1, n, r2)) / np.sqrt(r) + 0.3)
    f = ti.TT([jnp.asarray(c) for c in cores])
    grids = [np.linspace(-3.0, 3.0, n)] * d
    q = rng.uniform(size=(m, d))

    ref = None
    for cfg in args.configs.split(","):
        cfg = cfg.strip()
        if cfg == "xla":
            os.environ["TTIRT_DIM_KERNEL"] = "0"
            os.environ.pop("TTIRT_DIM_VMEM_MB", None)
        else:
            spec = cfg[1:].split(":")
            os.environ["TTIRT_DIM_KERNEL"] = "1"
            os.environ["TTIRT_DIM_TILE"] = spec[0]
            if len(spec) > 1:
                os.environ["TTIRT_DIM_VMEM_MB"] = spec[1]
            else:
                os.environ.pop("TTIRT_DIM_VMEM_MB", None)
        jax.clear_caches()
        t0 = time.perf_counter()
        try:
            x, lf = ti.tt_irt_sqr(grids, f, q, block=m,
                                  precision=args.precision)
            _ = float(jnp.sum(x)) + float(jnp.sum(lf))
        except Exception as e:  # OOM etc: record and move on
            print(f"{cfg:>12}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")
            continue
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            x, lf = ti.tt_irt_sqr(grids, f, q, block=m,
                                  precision=args.precision)
            _ = float(jnp.sum(x)) + float(jnp.sum(lf))
            times.append(time.perf_counter() - t0)
        best = min(times)
        xn = np.asarray(x)
        if ref is None:
            ref = xn
            dev = 0.0
        else:
            dev = float(np.max(np.abs(xn - ref)))
        print(f"{cfg:>12}: best {best:.3f}s "
              f"({m / best / 1e3:.0f}k rows/s, "
              f"{best / d * 1e3:.2f} ms/dim)  compile {compile_s:.0f}s"
              f"  max|dx| vs first: {dev:.2e}")


if __name__ == "__main__":
    main()
