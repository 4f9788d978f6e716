"""Pallas TPU kernel: the entire inverse-Rosenblatt transform fused in
VMEM.

The XLA scan path (samplers/irt_scan.py) streams O(M r^2) intermediates
through HBM on every one of the d dimensions.  But the whole working set
of the transform is tiny: the semi-marginal fields, cores and CDF
integration matrices for ALL dims are a few MB at the stress shape
(d=40, n=17, r=13), and the per-sample state is one r-vector.  So one
Pallas program keeps everything resident in VMEM: the grid tiles the
sample axis, each program sweeps all d dimensions for its tile, and HBM
traffic collapses to reading the seeds and writing the samples.

Per-dimension step (mirrors irt_scan._step, all dense):
  fk   = (phi (x) phi) @ P_k          -- MXU  (BM, r^2)x(r^2, n)
  C    = fk @ Scum_k                  -- MXU  (trapezoid cumsum as matmul)
  i0   = count(C < q C_total)         -- VPU
  invert the quadratic segment        -- VPU
  phi <- phi . (W @ core_k)           -- MXU + VPU rank loop

f32 compute; numerics match tt_irt_sqr(precision='f32') (see irt_scan
for the precision discussion).

RETIRED from the production path (2026-08-16, round 2).  Measured on
the v5e at the north-star shape (2^20 samples, d=40, n=17, r=13):
0.38-0.40M samples/s across block sizes 128-1024, vs 1.31M samples/s
for the XLA scan path at the same (now 1e-6-accurate) f32 numerics.
Why fusing cannot win here: the arithmetic itself is the bottleneck,
not HBM streaming — the whole transform is ~60 GFLOP at 2^20 and the
XLA path realizes only ~0.13 TFLOP/s, i.e. BOTH paths are bound by the
VPU-heavy CDF build/inversion and the small-matmul MXU underutilization
(169x17 contractions), which VMEM residency does not change; and on
TPU, Pallas grid steps execute sequentially per core, so the kernel's
40 per-dim small matmuls on one tile cannot be overlapped the way XLA
pipelines each dim over the full 2^18-row batch.  The kernel is kept
as a working Pallas reference implementation and test target
(tests/test_pallas.py); use tt_irt_sqr(precision='f32'|'hi') for
production serving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tt import TT

__all__ = ["pallas_irt_sqr", "build_pallas_data"]


def build_pallas_data(tt: TT, grids, dtype=jnp.float32):
    """Precompute the per-dim VMEM-resident fields (prepare pass in f64
    on host/device, then cast).

    Returns dict with:
      p2:    (d, r^2, n)  semi-marginal Gram fields, rank-square unfolded
      scum:  (d, n, n)    trapezoid-cumsum matrices (C = fk @ scum)
      coreu: (d, n, r^2)  cores unfolded for the prefix update
      x:     (d, n)       grids;  d/n/r: sizes
    """
    from ..samplers.irt import _canon_grid
    from ..samplers.irt_scan import _prepare_scan, stack_padded

    gs, tt = _canon_grid(grids, tt)
    cstack, xstack = stack_padded(tt, gs)
    pstack, hstack = _prepare_scan(cstack.astype(jnp.float64),
                                   xstack.astype(jnp.float64))
    d, r, n = cstack.shape[0], cstack.shape[1], cstack.shape[2]
    r2 = r * r
    p2 = np.asarray(pstack).reshape(d, r2, n)
    hs = np.asarray(hstack)
    scum = np.zeros((d, n, n))
    for k in range(d):
        h = hs[k]
        for j in range(1, n):
            scum[k, j - 1, j:] += 0.5 * h[j]
            scum[k, j, j:] += 0.5 * h[j]
    coreu = np.transpose(np.asarray(cstack), (0, 2, 1, 3)).reshape(d, n, r2)
    return {
        "p2": jnp.asarray(p2, dtype),
        "scum": jnp.asarray(scum, dtype),
        "coreu": jnp.asarray(coreu, dtype),
        "x": jnp.asarray(np.asarray(xstack), jnp.float32),
        "d": d, "n": n, "r": r,
    }


def _kernel(q_ref, p2_ref, scum_ref, coreu_ref, x_ref, out_ref, lf_ref,
            phi_ref, gbuf_ref, *, d, n, r):
    bm = q_ref.shape[0]
    r2 = r * r
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (bm, r), 1)
    phi_ref[:, :] = jnp.where(iota_r == 0, 1.0, 0.0)
    lf_ref[:, 0] = jnp.zeros((bm,), jnp.float32)
    out_ref[:, :] = jnp.zeros((bm, d), jnp.float32)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)

    def step(k, _):
        # dynamic lane indexing is not Mosaic-lowerable: read/write the
        # k-th seed/sample columns via one-hot masks instead
        ohk = (iota_d == k).astype(jnp.float32)            # (1, d)
        phi = phi_ref[:, :]
        # outer product columns (i*r + j) = phi_i * phi_j (static r loop)
        for i in range(r):
            gbuf_ref[:, i * r:(i + 1) * r] = phi[:, i:i + 1] * phi
        pk = p2_ref[k]                                     # (r2, n)
        # HIGHEST: on a real TPU run, DEFAULT would lower these to
        # single-pass bf16 (log-density error ~1e-2 vs the f32 class
        # this kernel is specified to match, tests/test_pallas.py)
        fk = jnp.dot(gbuf_ref[:, :], pk,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)   # (bm, n)
        cvals = jnp.dot(fk, scum_ref[k],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        total = cvals[:, n - 1]
        bad = (total <= 0.0)[:, None]
        xg = x_ref[k]                                      # (n,)
        cu = jnp.broadcast_to(xg[None, :] - xg[0], (bm, n))
        cvals = jnp.where(bad, cu, cvals)
        fk = jnp.where(bad, 1.0, fk)
        total = jnp.where(bad[:, 0], xg[n - 1] - xg[0], cvals[:, n - 1])
        qk = jnp.sum(q_ref[:, :] * ohk, axis=1)
        target = (qk * total)[:, None]
        below = cvals < target
        i0 = jnp.clip(jnp.sum(below.astype(jnp.int32), axis=1,
                              dtype=jnp.int32)
                      - jnp.int32(1), jnp.int32(0),
                      jnp.int32(n - 2))[:, None]
        oh0 = (iota_n == i0).astype(jnp.float32)
        oh1 = (iota_n == i0 + jnp.int32(1)).astype(jnp.float32)
        c1 = jnp.sum(cvals * oh0, axis=1) / total
        f1 = jnp.sum(fk * oh0, axis=1) / total
        f2 = jnp.sum(fk * oh1, axis=1) / total
        x1 = jnp.sum(xg[None, :] * oh0, axis=1)
        x2 = jnp.sum(xg[None, :] * oh1, axis=1)
        h3 = x2 - x1
        aq = 0.5 * (f2 - f1) / h3
        dq = f1 * f1 + 4.0 * aq * (qk - c1)
        safe_aq = jnp.where(aq == 0.0, 1.0, aq)
        x_quad = x1 + (-f1 + jnp.sqrt(jnp.abs(dq))) / (2.0 * safe_aq)
        safe_f1 = jnp.where(f1 == 0.0, 1.0, f1)
        x_lin = x1 + (qk - c1) / safe_f1
        xk = jnp.where(aq == 0.0,
                       jnp.where(f1 == 0.0, x1, x_lin), x_quad)
        xk = jnp.clip(xk, x1, x2)
        out_ref[:, :] = out_ref[:, :] + xk[:, None] * ohk
        la = (x2 - xk) / h3
        lb = (xk - x1) / h3
        lf_ref[:, 0] = lf_ref[:, 0] + jnp.log(
            jnp.maximum(f1 * la + f2 * lb, 1e-30))
        w = la[:, None] * oh0 + lb[:, None] * oh1
        bsel = jnp.dot(w, coreu_ref[k],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (bm, r2)
        acc = phi[:, 0:1] * bsel[:, 0:r]
        for i in range(1, r):
            acc = acc + phi[:, i:i + 1] * bsel[:, i * r:i * r + r]
        scale = jnp.maximum(jnp.max(jnp.abs(acc), axis=1,
                                    keepdims=True), 1e-30)
        phi_ref[:, :] = acc / scale
        return 0

    jax.lax.fori_loop(0, d, step, 0)


@functools.partial(jax.jit, static_argnames=("d", "n", "r", "block",
                                             "interpret"))
def _pallas_call(q, p2, scum, coreu, x, d, n, r, block, interpret):
    m = q.shape[0]
    r2 = r * r
    # Trace without x64: under jax_enable_x64 the grid/index arithmetic
    # is int64, which the Mosaic layout pass rejects (bitwidth <= 32).
    ctx = jax.enable_x64(False)
    ctx.__enter__()
    kern = functools.partial(_kernel, d=d, n=n, r=r)
    out, lf = pl.pallas_call(
        kern,
        grid=(m // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, r2, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n, r2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, d), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, r), jnp.float32),
            pltpu.VMEM((block, r2), jnp.float32),
        ],
        interpret=interpret,
    )(q, p2, scum, coreu, x)
    ctx.__exit__(None, None, None)
    return out, lf[:, 0]


def pallas_irt_sqr(grids, tt: TT, q, block: int = 512,
                   interpret: bool = False):
    """Fused single-kernel SIRT transform (f32).

    Returns (samples, log density) like tt_irt_sqr(precision='f32').
    """
    data = build_pallas_data(tt, grids)
    q = jnp.asarray(q, jnp.float32)
    m, dq = q.shape
    if dq != data["d"]:
        raise ValueError("full-dimension seeds required")
    mpad = ((m + block - 1) // block) * block
    if mpad != m:
        q = jnp.concatenate(
            [q, jnp.zeros((mpad - m, dq), jnp.float32)], axis=0)
    out, lf = _pallas_call(q, data["p2"], data["scum"], data["coreu"],
                           data["x"], data["d"], data["n"], data["r"],
                           block, interpret)
    return out[:m], lf[:m]
