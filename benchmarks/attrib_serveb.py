"""Stage attribution of the XLA 'serveb' per-dim step at the lz40n33
production shape (d=40, n=33, r=23, 2^18 rows, precision='hi').

Reconstructs irt_scan._step_factor_b with individual stages stubbable,
so the stage cost = full - stubbed (same scan/dispatch structure, all
shapes preserved).  Stubs keep the carry dependency chain intact so
XLA cannot dead-code the remaining stages.

Stages:
  vdot    - the packed conditional dot  v = pe9(phi) @ bmat
  segsum  - fk = sum over r of v*v
  cdf     - _cdf_rows32 (CDF rows, bracket, readouts, f32 solve)
  bdot    - the packed update dot  b = we9(w) @ cmat
  fold    - phi' = einsum(phi, b) + renorm
  pack    - TTIRT_HI_PACK=0 variant (unpacked HIGHEST big dots)

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -u \
        benchmarks/attrib_serveb.py --stubs none,cdf,segsum+cdf,bdot+fold
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--pack", type=int, default=9)
    ap.add_argument("--stubs",
                    default="none,cdf,segsum+cdf,bdot,vdot+segsum+cdf")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tt_irt_tpu.samplers import irt_scan as isc

    rng = np.random.default_rng(0)
    d, n, r, m = args.d, args.n, args.r, args.m
    packed = args.pack

    bmat32 = jnp.asarray(
        rng.standard_normal((d, r, n * r)).astype(np.float32)
        / np.sqrt(r))
    cmat32 = jnp.asarray(
        rng.standard_normal((d, n, r * r)).astype(np.float32)
        / np.sqrt(r))
    if packed:
        pk = isc._pack9_rhs if packed == 9 else isc._pack6_rhs
        bmat = jax.jit(jax.vmap(pk))(bmat32)
        cmat = jax.jit(jax.vmap(pk))(cmat32)
    else:
        bmat, cmat = bmat32, cmat32
    x64 = np.linspace(-3.0, 3.0, n)
    x32 = jnp.asarray(np.tile(x64.astype(np.float32), (d, 1)))
    xlo = jnp.asarray(np.tile((x64 - x64.astype(np.float32)
                               ).astype(np.float32), (d, 1)))
    h32 = jnp.asarray(np.tile(np.diff(x64, prepend=x64[0])
                              .astype(np.float32), (d, 1)))
    qp32 = jnp.asarray(rng.uniform(size=(d, m)).astype(np.float32))
    um32 = 1.0 - qp32

    def step(stubs, carry, inp):
        phi = carry
        bm, cm, xv, xl, hv, qk, uk = inp
        mb, rr = phi.shape
        plhs = isc._pack9_lhs if packed == 9 else isc._pack6_lhs

        if "vdot" in stubs:
            v = jnp.broadcast_to(phi[:, :1], (mb, n * rr)) \
                + jnp.sum(bm.astype(jnp.float32)) * 0.0
        elif packed:
            v = jnp.dot(plhs(phi), bm,
                        preferred_element_type=jnp.float32)
        else:
            v = jnp.matmul(phi, bm, precision=isc._HI)
        if "segsum" in stubs:
            fk = jnp.abs(v[:, :n]) + 1e-3
        else:
            vv = jnp.reshape(v, (mb, n, rr))
            fk = jnp.sum(vv * vv, axis=2)
        if "cdf" in stubs:
            # constant bracket, keeps the fk dependency
            out9 = jnp.zeros((mb, 9), jnp.float32
                             ).at[:, 2].set(fk[:, 0])
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            oh0 = jnp.broadcast_to((iota == 0).astype(jnp.float32),
                                   (mb, n))
            oh1 = jnp.broadcast_to((iota == 1).astype(jnp.float32),
                                   (mb, n))
            la = 0.5 + 0.0 * fk[:, 0]
            lb = 1.0 - la
        else:
            out9, oh0, oh1, la, lb = isc._cdf_rows32(
                "sqr", n, fk, xv, xl, hv, qk, uk)
        w = la[:, None] * oh0 + lb[:, None] * oh1
        if "bdot" in stubs:
            b = None
        elif packed:
            b = jnp.reshape(jnp.dot(plhs(w), cm,
                                    preferred_element_type=jnp.float32),
                            (mb, rr, rr))
        else:
            b = jnp.reshape(jnp.matmul(w, cm, precision=isc._HI),
                            (mb, rr, rr))
        if "fold" in stubs or b is None:
            phi = phi + w[:, :rr] * 1e-6      # keep carry dependency
        else:
            phi = jnp.einsum("mi,mij->mj", phi, b, precision=isc._HI)
        scale = jnp.maximum(
            jnp.max(jnp.abs(phi), axis=1, keepdims=True),
            jnp.asarray(1e-30, phi.dtype))
        return phi / scale, out9

    @functools.partial(jax.jit, static_argnums=0)
    def run(stubs):
        phi0 = jnp.zeros((m, r), jnp.float32).at[:, 0].set(1.0)
        phi, outs = jax.lax.scan(
            functools.partial(step, stubs), phi0,
            (bmat, cmat, x32, xlo, h32, qp32, um32))
        return jnp.sum(phi) + jnp.sum(outs)

    base = None
    for cfg in args.stubs.split(","):
        stubs = frozenset() if cfg == "none" else frozenset(
            cfg.split("+"))
        t0 = time.perf_counter()
        _ = float(run(stubs))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _ = float(run(stubs))
            times.append(time.perf_counter() - t0)
        best = min(times)
        if base is None:
            base = best
        print(f"{cfg:>24}: best {best:.3f}s ({best / d * 1e3:.2f} "
              f"ms/dim)  saved vs full: {base - best:+.3f}s  "
              f"compile {compile_s:.0f}s")


if __name__ == "__main__":
    main()
