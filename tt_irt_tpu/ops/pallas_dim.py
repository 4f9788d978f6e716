"""Merged whole-dimension IRT step kernel (TPU serve fast path).

ONE Pallas kernel per dimension computes everything the 'serveb' scan
body (samplers/irt_scan._step_factor_b) does — factor conditional,
two-sided trapezoid CDF, count-based bracket, one-hot readout, f32
weight solve and the prefix update — with every (Mb, n*r)/(Mb, r^2)
intermediate resident in VMEM.  Only phi (Mb, r) and the nine bracket
scalars (Mb, 9) touch HBM per dimension; the XLA path round-trips
~3.3 GB/dim through HBM at the Lorenz-40 production shape (n=33,
r=23, Mb=2^18) and is HBM-roofline-bound there (measured 4.0 ms/dim;
BENCH_NOTES round-3 decomposition).

Lessons from the round-3 kernel probes baked in:

* Per-grid-step overhead is ~7 us (a pure copy kernel costs 1.8 ms at
  256 steps), so tiles want to be LARGE: TTIRT_DIM_TILE=4096 (64 steps
  at 2^18) with TTIRT_DIM_VMEM_MB raising the 16 MB scoped-VMEM
  default.  The shipped default is the conservative 1024-row tile
  with NO CompilerParams — the exact compile profile of the verified
  pallas_step kernels — pending a measured A/B of the larger tiles.
* Two separate kernels per dim pay the entry + step overhead twice
  and force phi + one-hot scalars through HBM between them: merge.
* The two big contractions use the SAME K-packed bf16 operands as the
  XLA hi-pack (ONE MXU pass at K=9r/9n instead of 6 HIGHEST passes);
  the bf16 split of the left operand is rebuilt in-kernel.  Inside
  Mosaic a plain cast-based split is safe — the XLA bf16-propagation
  pass that zeroes cast-based residuals (irt_scan._bf16_split_f32)
  does not run on hand-written kernel MLIR — but we keep the integer
  bit-split anyway so the numerics are bit-identical to the XLA path.
* Small contractions (segment sum, trapezoid, cumsums, prefix fold)
  stay Precision.HIGHEST f32: their K is tiny, passes are cheap, and
  0/1 structure matrices make them exact.

Reference hot loop being replaced: tt_irt_sqr.m:96-207 /
utils/tt_irt1_int64.c:88-181 (the per-dim conditional + CDF inversion).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dim_step", "dim_kernel_enabled"]

_HI = jax.lax.Precision.HIGHEST


def dim_kernel_enabled() -> bool:
    """Opt-in via TTIRT_DIM_KERNEL=1 (measured A/B pending default)."""
    return os.environ.get("TTIRT_DIM_KERNEL", "0") not in (
        "0", "", "false", "off")


def _kernel_pack() -> int:
    """In-kernel bf16 K-packing of the two big dots.  0 (default) =
    OFF: unpacked HIGHEST dots, which compile fast but run each big
    contraction as 6 MXU passes at K=r/n (<=26% K utilization).
    1 = the round-3 concat pack: bit-split + 9-way narrow concat —
    Mosaic compile is pathological (observed: single-kernel compile
    >9 min on v5e vs seconds unpacked); kept for reference.
    2 = placement pack: the packed (Mb, 9K) lhs is built by THREE
    constant 0/1 placement MATMULS on the exact bf16 split parts
    (sum in f32 is exact — disjoint slots; the f32->bf16 cast of
    bf16-valued sums is exact), so no lane-misaligned concat reaches
    Mosaic and both big dots run as ONE bf16 MXU pass at K=9r/9n."""
    v = os.environ.get("TTIRT_DIM_PACK", "0")
    if v in ("0", "", "false", "off"):
        return 0
    if v in ("2", "place", "placement"):
        return 2
    return 1


def _tile(m: int) -> int:
    t = int(os.environ.get("TTIRT_DIM_TILE", 1024))
    while m % t:
        t //= 2
    return max(t, 1)


def _vmem_limit() -> int | None:
    """Scoped-VMEM ceiling for the kernel.  None (default) = do not
    pass CompilerParams at all — the known-good pallas_step kernels
    compile without it, and it is one of the deltas suspected in the
    round-3 Mosaic compile stall; set TTIRT_DIM_VMEM_MB to raise the
    16 MB default and unlock tiles > 1024 rows."""
    mb = os.environ.get("TTIRT_DIM_VMEM_MB")
    if not mb:
        return None
    return int(mb) * 1024 * 1024


@functools.lru_cache(maxsize=64)
def _seg_sum(n: int, r: int):
    s = np.zeros((n * r, n), np.float32)
    for x in range(n):
        s[x * r:(x + 1) * r, x] = 1.0
    return s


@functools.lru_cache(maxsize=64)
def _repl3(r: int):
    """(3r, r*r) bf16: three stacked copies of the replication matrix
    E[i, i*r+j] = 1 — pairs with the exact 3-part bf16 split of phi so
    pe = phi @ E is exact (E is 0/1)."""
    e = np.zeros((r, r * r), np.float32)
    for i in range(r):
        e[i, i * r:(i + 1) * r] = 1.0
    # f32 numpy here; the caller casts to bf16 with jnp (plain numpy
    # builds lack np.bfloat16)
    return np.concatenate([e, e, e], axis=0)


@functools.lru_cache(maxsize=64)
def _select(r: int):
    s = np.zeros((r * r, r), np.float32)
    for i in range(r):
        s[i * r + np.arange(r), np.arange(r)] = 1.0
    return s


@functools.lru_cache(maxsize=64)
def _place9(k: int):
    """(3k, 9k) f32 0/1 placement matrices for the pack9 lhs layout
    [ah, ah, am, am, ah, al, am, al, al] (irt_scan._pack9_lhs): row
    block p (the h/m/l part) scatters the identity into its K-slots,
    so  pe9 = h @ P[:k] + m @ P[k:2k] + l @ P[2k:]  equals
    _pack9_lhs exactly (disjoint slots -> the f32 sum is exact, and
    every value is bf16-representable)."""
    slots = ((0, 1, 4), (2, 3, 6), (5, 7, 8))
    p = np.zeros((3 * k, 9 * k), np.float32)
    for part, ss in enumerate(slots):
        for s in ss:
            p[part * k:(part + 1) * k, s * k:(s + 1) * k] = np.eye(
                k, dtype=np.float32)
    return p


@functools.lru_cache(maxsize=64)
def _prefix_suffix(nm1: int):
    idx = np.arange(nm1)
    lmat = (idx[:, None] <= idx[None, :]).astype(np.float32)
    umat = (idx[:, None] >= idx[None, :]).astype(np.float32)
    return np.concatenate([lmat, umat], axis=1)


def _bf16_parts3_k(x):
    """In-kernel integer bit-split: f32 -> three bf16 parts summing to
    x exactly (same arithmetic as irt_scan._bf16_parts3)."""
    def split(v):
        vb = jax.lax.bitcast_convert_type(v, jnp.uint32)
        hb = ((vb + jnp.asarray(0x8000, jnp.uint32))
              & jnp.asarray(0xFFFF0000, jnp.uint32))
        h32 = jax.lax.bitcast_convert_type(hb, jnp.float32)
        return h32, v - h32

    h32, r1 = split(x)
    m32, r2 = split(r1)
    l32, _ = split(r2)
    return (h32.astype(jnp.bfloat16), m32.astype(jnp.bfloat16),
            l32.astype(jnp.bfloat16))


def _pack9_k(x):
    h, m, l = _bf16_parts3_k(x)
    return jnp.concatenate([h, h, m, m, h, l, m, l, l], axis=-1)


def _pack3_k(x):
    h, m, l = _bf16_parts3_k(x)
    return jnp.concatenate([h, m, l], axis=-1)


def _invert_quadratic32(f1, f2, c1, q, x1, x2):
    h3 = x2 - x1
    aq = 0.5 * (f2 - f1) / h3
    t = q - c1
    dq = f1 * f1 + 4.0 * aq * t
    den = f1 + jnp.sqrt(jnp.maximum(dq, 0.0))
    safe = jnp.where(den <= 0.0, 1.0, den)
    xk = jnp.where(den <= 0.0, x1, x1 + 2.0 * t / safe)
    return jnp.clip(xk, x1, x2)


def _dim_kernel(rt: bool, n: int, r: int, pack: int,
                phi_ref, qp_ref, um_ref, b9_ref, c9_ref, d_ref, lu_ref,
                h_ref, xg_ref, s_ref, e3_ref, s2_ref, pb_ref, pw_ref,
                phin_ref, out9_ref):
    t = phi_ref.shape[0]
    phi = phi_ref[:]                                        # (T, r) f32

    def place9(x, p_ref):
        # pack9 lhs via three 0/1 placement matmuls on the exact bf16
        # split parts: disjoint slots -> the f32 sum is exact and the
        # final cast back to bf16 is exact (values are bf16 parts).
        # No lane-misaligned concat reaches Mosaic (the concat pack's
        # compile pathology).
        h, m, l = _bf16_parts3_k(x)
        k = x.shape[-1]
        pe = (jnp.dot(h, p_ref[:k], preferred_element_type=jnp.float32)
              + jnp.dot(m, p_ref[k:2 * k],
                        preferred_element_type=jnp.float32)
              + jnp.dot(l, p_ref[2 * k:],
                        preferred_element_type=jnp.float32))
        return pe.astype(jnp.bfloat16)

    def bigdot(lhs, rhs_ref, p_ref):
        # rhs arrives 9-K-packed in pack modes; in unpacked mode b9/c9
        # hold the PLAIN f32 matrices and this is one HIGHEST dot --
        # see dim_step.
        if pack == 2:
            return jnp.dot(place9(lhs, p_ref), rhs_ref[:],
                           preferred_element_type=jnp.float32)
        if pack:
            return jnp.dot(_pack9_k(lhs), rhs_ref[:],
                           preferred_element_type=jnp.float32)
        return jnp.dot(lhs, rhs_ref[:], precision=_HI,
                       preferred_element_type=jnp.float32)

    # ---- conditional: v = phi @ B ----
    v = bigdot(phi, b9_ref, pb_ref)                         # (T, n*r)
    fk = jnp.dot(v * v, s_ref[:], precision=_HI,
                 preferred_element_type=jnp.float32)        # (T, n)
    # ---- two-sided trapezoid CDF ----
    dc = jnp.dot(fk, d_ref[:], precision=_HI,
                 preferred_element_type=jnp.float32)        # (T, n-1)
    bad = jnp.sum(dc, axis=1, keepdims=True) <= 0.0
    hrow = h_ref[:]                                         # (1, n-1)
    dc = jnp.where(bad, jnp.broadcast_to(hrow, dc.shape), dc)
    fk = jnp.where(bad, jnp.ones_like(fk), fk)
    cklu = jnp.dot(dc, lu_ref[:], precision=_HI,
                   preferred_element_type=jnp.float32)      # (T, 2n-2)
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
    # ---- f32 weight solve (la/lb for the prefix update only) ----
    if rt:
        xk = qp
    else:
        xl_ = _invert_quadratic32(f1, f2, c1, qt, x1, x2)
        xr_ = -_invert_quadratic32(f2, f1, cr2, ut, -x2, -x1)
        xk = jnp.where(right, xr_, xl_)
    la = jnp.clip((x2 - xk) / (x2 - x1), 0.0, 1.0)
    w = la * oh0 + (1.0 - la) * oh1                         # (T, n)
    # ---- prefix update: phi' = phi @ (w-interp core) ----
    b = bigdot(w, c9_ref, pw_ref)                           # (T, r*r)
    if pack == 2:
        # exact phi replication: 0/1 e3 on the exact bf16 parts,
        # summed in f32 (no concat)
        ph_, pm_, pl_ = _bf16_parts3_k(phi)
        e3 = e3_ref[:]
        pe = (jnp.dot(ph_, e3, preferred_element_type=jnp.float32)
              + jnp.dot(pm_, e3, preferred_element_type=jnp.float32)
              + jnp.dot(pl_, e3, preferred_element_type=jnp.float32))
    elif pack:
        pe = jnp.dot(_pack3_k(phi), e3_ref[:],
                     preferred_element_type=jnp.float32)    # (T, r*r)
    else:
        pe = jnp.dot(phi, e3_ref[:], precision=_HI,
                     preferred_element_type=jnp.float32)    # (T, r*r)
    phin = jnp.dot(pe * b, s2_ref[:], precision=_HI,
                   preferred_element_type=jnp.float32)      # (T, r)
    scale = jnp.max(jnp.abs(phin), axis=1, keepdims=True)
    phin_ref[:] = phin / jnp.maximum(scale, 1e-30)


def dim_step(phi, qp32, um32, bmat, cmat, dmat, hrow, xg, mode="irt"):
    """One IRT dimension, fully fused: returns (phi_next (M, r) f32,
    out9 (M, 9) f32) for the batched f64 epilogue
    (samplers/irt_scan._serve_solve).

    bmat/cmat: the factor matrix (r, n*r) and unfolded core (n, r*r).
    With TTIRT_DIM_PACK=1/2 they must arrive 9-K-packed bf16
    ((9r, n*r)/(9n, r*r), irt_scan._pack9_rhs) and the kernel rebuilds
    the packed lhs in-VMEM (mode 2 = placement matmuls, no concat —
    see _kernel_pack); default is plain f32 + HIGHEST dots."""
    m, r = phi.shape
    pack = _kernel_pack()
    nr = bmat.shape[1]
    n = nr // r
    t = _tile(m)
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_dim_kernel, mode == "rt", n, r, pack)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    row = lambda cols: pl.BlockSpec((t, cols), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    kw = 9 if pack else 1
    e3 = _repl3(r) if pack == 1 else _repl3(r)[:r]
    e3 = jnp.asarray(e3, jnp.bfloat16 if pack else jnp.float32)
    # placement matrices (pack mode 2; tiny dummies otherwise so the
    # kernel arity is static)
    pb = jnp.asarray(_place9(r) if pack == 2 else np.zeros((1, 1)),
                     jnp.bfloat16)
    pw = jnp.asarray(_place9(n) if pack == 2 else np.zeros((1, 1)),
                     jnp.bfloat16)
    with jax.enable_x64(False):
        phin, out9 = pl.pallas_call(
            kern,
            grid=(m // t,),
            in_specs=[
                row(r), row(1), row(1),
                const((kw * r, nr)), const((kw * n, r * r)),
                const((n, n - 1)), const((n - 1, 2 * (n - 1))),
                const((1, n - 1)), const((2, n)),
                const((nr, n)), const(tuple(e3.shape)),
                const((r * r, r)),
                const(tuple(pb.shape)), const(tuple(pw.shape)),
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
        )(phi.astype(jnp.float32), qp32[:, None].astype(jnp.float32),
          um32[:, None].astype(jnp.float32), bmat, cmat,
          dmat, jnp.asarray(_prefix_suffix(n - 1)), hrow, xg,
          jnp.asarray(_seg_sum(n, r)), e3,
          jnp.asarray(_select(r)), pb, pw)
    return phin, out9
