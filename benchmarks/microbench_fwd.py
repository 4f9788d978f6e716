"""Forward-only serve-step microbenchmark: the production (prepare-once
DirtSampler) path — XLA 'serveb' scan vs the merged Pallas dim kernel
(ops/pallas_dim.py) at the lz40n33 production shape.

microbench_dim.py times ``tt_irt_sqr`` end-to-end, which re-runs the
f64-emulated backward prep on every call (~2.5 s at this shape on v5e)
— fine for one-shot use but not what serving pays.  Here the prep runs
ONCE (untimed, exactly like ``DirtSampler``) and only ``fwd_blocked``
is timed, forcing a host read per rep.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -u \
        benchmarks/microbench_fwd.py --configs xla,k1024,k4096:100

Config grammar: 'xla' = kernel off; 'kTILE[:VMEM_MB]' = merged dim
kernel with TTIRT_DIM_TILE=TILE and (optionally) TTIRT_DIM_VMEM_MB;
'pTILE[:VMEM_MB]' = same with the placement-pack bf16 dots
(TTIRT_DIM_PACK=2); 'ortho' = the XLA orthonormal-core scan body
(TTIRT_HI_ORTHO=1); 'oTILE[:VMEM_MB]' = the fused post-vdot ortho
whole-dim kernel (ops/pallas_odim.py, TTIRT_ODIM_TILE=TILE).  The
backward prep is recomputed per config (ortho configs prepare a
different operand pytree).
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
    ap.add_argument("--block", type=int, default=None,
                    help="forward block size (default auto_block)")
    ap.add_argument("--configs", default="xla,k1024,k4096:100")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tt_irt_tpu as ti
    from tt_irt_tpu.samplers.irt import _canon_grid, auto_block
    from tt_irt_tpu.samplers.irt_scan import (_prep_jit, _use_fused,
                                              fwd_blocked, stack_padded)

    rng = np.random.default_rng(0)
    d, n, r, m = args.d, args.n, args.r, args.m
    cores = []
    for k in range(d):
        r1 = 1 if k == 0 else r
        r2 = 1 if k == d - 1 else r
        cores.append(rng.standard_normal((r1, n, r2)) / np.sqrt(r) + 0.3)
    f = ti.TT([jnp.asarray(c) for c in cores])
    grids = [np.linspace(-3.0, 3.0, n)] * d
    q = jnp.asarray(rng.uniform(size=(m, d)))
    block = args.block or auto_block(m)

    from tt_irt_tpu.samplers import irt_scan as isc

    stable = jax.default_backend() != "tpu"
    fused = _use_fused("sqr", args.precision)
    gs, fc = _canon_grid(grids, f)
    cs, xs = stack_padded(fc, gs)

    ref = None
    for cfg in args.configs.split(","):
        cfg = cfg.strip()
        for k in ("TTIRT_DIM_KERNEL", "TTIRT_DIM_VMEM_MB",
                  "TTIRT_ODIM_KERNEL", "TTIRT_ODIM_VMEM_MB"):
            os.environ.pop(k, None)
        os.environ.pop("TTIRT_HI_ORTHO", None)
        if cfg == "ortho":
            os.environ["TTIRT_HI_ORTHO"] = "1"
        elif cfg.startswith("o"):
            spec = cfg[1:].split(":")
            os.environ["TTIRT_ODIM_KERNEL"] = "1"
            os.environ["TTIRT_ODIM_TILE"] = spec[0]
            if len(spec) > 1:
                os.environ["TTIRT_ODIM_VMEM_MB"] = spec[1]
        elif cfg != "xla":
            spec = cfg[1:].split(":")
            os.environ["TTIRT_DIM_KERNEL"] = "1"
            os.environ["TTIRT_DIM_PACK"] = \
                "2" if cfg.startswith("p") else "0"
            os.environ["TTIRT_DIM_TILE"] = spec[0]
            if len(spec) > 1:
                os.environ["TTIRT_DIM_VMEM_MB"] = spec[1]
        jax.clear_caches()
        prep = _prep_jit("sqr", cs, xs, args.precision, stable,
                         fused=fused)
        prep = jax.tree_util.tree_map(
            lambda a: jax.device_put(a), prep)
        t0 = time.perf_counter()
        try:
            x, lf = fwd_blocked("sqr", args.precision, prep, q, block,
                                fused)
            _ = float(jnp.sum(x)) + float(jnp.sum(lf))
        except Exception as e:  # OOM / Mosaic failure: record, move on
            print(f"{cfg:>12}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            x, lf = fwd_blocked("sqr", args.precision, prep, q, block,
                                fused)
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
