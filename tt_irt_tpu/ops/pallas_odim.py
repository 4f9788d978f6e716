"""Orthonormal-core whole-dimension IRT step kernel (serve fast path).

The 'serveb' scan body costs ~16.5 ns/row on v5e at the Lorenz-40
production shape (n=33, r=23) — measured AT the HBM roofline of its
~3.6 GB/dim intermediate traffic (BENCH_NOTES round 3, stage
attribution).  Of that traffic, the conditional matrix v (Mb, n*r) and
the interpolated-core product b (Mb, r*r) are ~75%.  This kernel is
the "fused post-vdot stage" the orthonormal-core path was kept for
(irt_scan._step_factor_ob): on weighted-right-orthonormal cores the
prefix update is a 2-point readout of v, so

* the second big contraction (bdot: w pack + (Mb,n)x(n,r^2) dot +
  batched prefix einsum — 37% of the XLA scan) does not exist at all,
* ONE Pallas kernel per dimension computes vdot, the conditional
  square-sum, the two-sided trapezoid CDF, the count-based bracket,
  the one-hot readouts, the f32 weight solve and the 2-point prefix
  readout entirely in VMEM — only psi (Mb, r) and the nine bracket
  scalars (Mb, 9) touch HBM per dimension (~0.1 GB/dim vs 3.6).

Numerical contract (same class as the XLA serveb path, pinned by
tests/test_fused_step.py):

* the big dot runs 9-product K-packed bf16 when the operands arrive
  packed (irt_scan._pack9_rhs; lhs rebuilt in-VMEM by the placement
  matmuls of ops/pallas_dim — no lane-misaligned concat reaches
  Mosaic), else one Precision.HIGHEST f32 dot;
* every structure contraction (segment sum, replication, selection,
  trapezoid, cumsum) multiplies by an EXACT 0/1 or h-valued matrix:
  the value operand is bit-split into three bf16 parts summed in f32
  (exact; ops/pallas_dim._bf16_parts3_k), so each runs as a single
  MXU pass per part with no representation error beyond the f32
  accumulation the HIGHEST path has anyway;
* the f64 within-cell solve stays OUTSIDE the kernel, batched once
  for all dims (irt_scan._serve_solve) — Mosaic has no f64.

Reference hot loop being replaced: tt_irt_sqr.m:96-207 (per-dim
conditional + CDF inversion), with the QR-basis observation of
tt_irt_sqr.m:63-80 (sampling in an orthonormal basis) supplying the
well-conditioned carry.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dim import (_bf16_parts3_k, _invert_quadratic32, _place9,
                         _prefix_suffix)

__all__ = ["odim_step", "odim_kernel_enabled"]

_HI = jax.lax.Precision.HIGHEST


def odim_kernel_enabled() -> bool:
    """Opt-in via TTIRT_ODIM_KERNEL=1 (implies the orthonormal-core
    serve prep; A/B against the XLA serveb path before defaulting)."""
    return os.environ.get("TTIRT_ODIM_KERNEL", "0") not in (
        "0", "", "false", "off")


def _tile(m: int) -> int:
    t = int(os.environ.get("TTIRT_ODIM_TILE", 1024))
    while m % t:
        t //= 2
    return max(t, 1)


def _vmem_limit() -> int | None:
    mb = os.environ.get("TTIRT_ODIM_VMEM_MB")
    if not mb:
        return None
    return int(mb) * 1024 * 1024


@functools.lru_cache(maxsize=64)
def _seg_mats(n: int, r: int):
    """(n*r, n) segment-sum, (n, n*r) replication, (n*r, r) selection —
    the three 0/1 structure matrices of the readout algebra:
    fk = (v*v) @ seg;  wr = w @ rep;  psi' = (wr*v) @ sel."""
    seg = np.zeros((n * r, n), np.float32)
    rep = np.zeros((n, n * r), np.float32)
    sel = np.zeros((n * r, r), np.float32)
    for i in range(n):
        seg[i * r:(i + 1) * r, i] = 1.0
        rep[i, i * r:(i + 1) * r] = 1.0
        sel[i * r:(i + 1) * r, :] = np.eye(r, dtype=np.float32)
    return seg, rep, sel


def _dot3(x, m_ref):
    """Exact value @ 0/1-matrix as three single-pass bf16 dots: the
    three bf16 parts of x sum to x exactly in f32, and each part times
    an exactly-representable 0/1 entry is exact, so the only error is
    the f32 accumulation — the same floor a HIGHEST dot has, at half
    the MXU passes."""
    h, m, l = _bf16_parts3_k(x)
    mm = m_ref[:]
    return (jnp.dot(h, mm, preferred_element_type=jnp.float32)
            + jnp.dot(m, mm, preferred_element_type=jnp.float32)
            + jnp.dot(l, mm, preferred_element_type=jnp.float32))


def _odim_kernel(rt: bool, n: int, r: int, pack: int,
                 psi_ref, qp_ref, um_ref, q9_ref, d_ref, lu_ref,
                 h_ref, xg_ref, seg_ref, rep_ref, sel_ref, pb_ref,
                 psin_ref, out9_ref):
    t = psi_ref.shape[0]
    psi = psi_ref[:]                                        # (T, r) f32

    # ---- conditional: v = psi @ Q (the ONE big dot of this path) ----
    if pack == 2:
        h_, m_, l_ = _bf16_parts3_k(psi)
        k = psi.shape[-1]
        p = pb_ref[:]
        pe = (jnp.dot(h_, p[:k], preferred_element_type=jnp.float32)
              + jnp.dot(m_, p[k:2 * k],
                        preferred_element_type=jnp.float32)
              + jnp.dot(l_, p[2 * k:],
                        preferred_element_type=jnp.float32))
        v = jnp.dot(pe.astype(jnp.bfloat16), q9_ref[:],
                    preferred_element_type=jnp.float32)     # (T, n*r)
    else:
        v = jnp.dot(psi, q9_ref[:], precision=_HI,
                    preferred_element_type=jnp.float32)     # (T, n*r)
    fk = _dot3(v * v, seg_ref)                              # (T, n)
    # ---- two-sided trapezoid CDF (bitwise the _cdf_rows32 scheme) ----
    # d holds h-valued (not 0/1) entries -> f32 HIGHEST, not _dot3
    dc = jnp.dot(fk, d_ref[:], precision=_HI,
                 preferred_element_type=jnp.float32)        # (T, n-1)
    bad = jnp.sum(dc, axis=1, keepdims=True) <= 0.0
    hrow = h_ref[:]                                         # (1, n-1)
    dc = jnp.where(bad, jnp.broadcast_to(hrow, dc.shape), dc)
    fk = jnp.where(bad, jnp.ones_like(fk), fk)
    cklu = _dot3(dc, lu_ref)                                # (T, 2n-2)
    zero = jnp.zeros((t, 1), jnp.float32)
    ck = jnp.concatenate([zero, cklu[:, :n - 1]], axis=1)   # (T, n)
    cr = jnp.concatenate([cklu[:, n - 1:], zero], axis=1)   # (T, n)
    tot = ck[:, n - 1:n]                                    # (T, 1)
    qp = qp_ref[:]                                          # (T, 1)
    xg = xg_ref[:]                                          # (2, n)
    x32row = xg[0:1, :]
    # ---- bracket (count-based, f32 targets) ----
    if rt:
        below = (jnp.broadcast_to(x32row, (t, n)) < qp).astype(jnp.int32)
        i0 = jnp.clip(jnp.sum(below, axis=1, keepdims=True) - 1,
                      0, n - 2)
        right = jnp.zeros((t, 1), bool)
        qt = ut = jnp.zeros((t, 1), jnp.float32)
    else:
        right = qp > 0.5
        qt = qp * tot
        ut = um_ref[:] * tot
        i0l = jnp.sum((ck < qt).astype(jnp.int32), axis=1,
                      keepdims=True) - 1
        i0r = jnp.sum((cr > ut).astype(jnp.int32), axis=1,
                      keepdims=True) - 1
        i0 = jnp.clip(jnp.where(right, i0r, i0l), 0, n - 2)
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    oh0 = (iota == i0).astype(jnp.float32)
    oh1 = (iota == i0 + 1).astype(jnp.float32)

    def read(rows, oh):
        return jnp.sum(rows * oh, axis=1, keepdims=True)    # (T, 1)

    c1 = read(ck, oh0)
    cr2 = read(cr, oh1)
    f1 = read(fk, oh0)
    f2 = read(fk, oh1)
    x32b = jnp.broadcast_to(x32row, (t, n))
    xlob = jnp.broadcast_to(xg[1:2, :], (t, n))
    x1 = read(x32b, oh0)
    x2 = read(x32b, oh1)
    out9_ref[:] = jnp.concatenate(
        [c1, cr2, f1, f2, x1, read(xlob, oh0), x2, read(xlob, oh1),
         tot], axis=1)                                      # (T, 9)
    # ---- f32 weight solve + 2-point prefix readout of v ----
    if rt:
        xk = qp
    else:
        xl_ = _invert_quadratic32(f1, f2, c1, qt, x1, x2)
        xr_ = -_invert_quadratic32(f2, f1, cr2, ut, -x2, -x1)
        xk = jnp.where(right, xr_, xl_)
    la = jnp.clip((x2 - xk) / (x2 - x1), 0.0, 1.0)
    w = la * oh0 + (1.0 - la) * oh1                         # (T, n)
    wr = _dot3(w, rep_ref)                                  # (T, n*r)
    psin = _dot3(wr * v, sel_ref)                           # (T, r)
    scale = jnp.max(jnp.abs(psin), axis=1, keepdims=True)
    psin_ref[:] = psin / jnp.maximum(scale, 1e-30)


def odim_step(psi, qp32, um32, qmat, hrow, xg, mode="irt"):
    """One IRT dimension on orthonormal-core operands, fully fused:
    returns (psi_next (M, r) f32, out9 (M, 9) f32) for the batched
    f64 epilogue (samplers/irt_scan._serve_solve).

    qmat: the weighted-orthonormal factor matrix (r, n*r) f32, or its
    9-product K-pack (9r, n*r) bf16 (irt_scan._pack9_rhs) — the packed
    lhs is rebuilt in-VMEM by placement matmuls.  hrow (1, n-1) f32
    grid spacings, xg (2, n) f32 grid hi/lo rows."""
    m, r = psi.shape
    kr = qmat.shape[0]
    pack = 2 if qmat.dtype == jnp.bfloat16 else 0
    if pack and kr != 9 * r:
        raise ValueError("packed qmat must be the 9-product K-pack")
    nr = qmat.shape[1]
    n = nr // r
    t = _tile(m)
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_odim_kernel, mode == "rt", n, r, pack)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    row = lambda cols: pl.BlockSpec((t, cols), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    seg, rep, sel = _seg_mats(n, r)
    e0 = np.eye(n, n - 1, dtype=np.float32)
    e1 = np.eye(n, n - 1, k=-1, dtype=np.float32)
    dmat = 0.5 * (e0 + e1) * np.ones((1, n - 1), np.float32)
    dmat = jnp.asarray(dmat) * hrow                         # (n, n-1)
    pb = jnp.asarray(_place9(r) if pack == 2 else np.zeros((1, 1)),
                     jnp.bfloat16)
    sb16 = lambda a: jnp.asarray(a, jnp.bfloat16)
    with jax.enable_x64(False):
        psin, out9 = pl.pallas_call(
            kern,
            grid=(m // t,),
            in_specs=[
                row(r), row(1), row(1),
                const((kr, nr)),
                const((n, n - 1)), const((n - 1, 2 * (n - 1))),
                const((1, n - 1)), const((2, n)),
                const((nr, n)), const((n, nr)), const((nr, r)),
                const(tuple(pb.shape)),
            ],
            out_specs=[row(r), row(9)],
            out_shape=[
                jax.ShapeDtypeStruct((m, r), jnp.float32),
                jax.ShapeDtypeStruct((m, 9), jnp.float32),
            ],
            **({} if _vmem_limit() is None else dict(
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_vmem_limit()))),
            interpret=interpret,
        )(psi.astype(jnp.float32), qp32[:, None].astype(jnp.float32),
          um32[:, None].astype(jnp.float32), qmat,
          dmat, jnp.asarray(_prefix_suffix(n - 1)), hrow, xg,
          sb16(seg), sb16(rep), sb16(sel), pb)
    return psin, out9
