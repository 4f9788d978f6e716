"""Fused Pallas per-dim step kernels (ops/pallas_step.py).

On CPU the kernels run in Pallas interpret mode, so these tests verify
the exact same kernel code the TPU compiles (minus Mosaic layout).  The
fused path must reproduce the XLA scan path at the f32 working
precision — it computes the same quantities with the same MXU precision,
only without HBM round trips of the (Mb, n*r)/(Mb, r^2) intermediates.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tt_irt_tpu as ti
from tt_irt_tpu.ops.pallas_step import (
    condition_update, factor_conditional, gram_conditional,
)


def _mk_tt(d=8, n=17, r=7, seed=5):
    rng = np.random.default_rng(seed)
    x = np.linspace(-2, 2, n)
    cores = []
    for k in range(d):
        r1 = 1 if k == 0 else r
        r2 = 1 if k == d - 1 else r
        c = np.exp(-((x[None, :, None] - 0.3) ** 2)
                   / (2 * rng.uniform(0.1, 0.5, (r1, 1, r2)) ** 2)) \
            * rng.uniform(0.2, 1, (r1, 1, r2))
        cores.append(jnp.asarray(np.broadcast_to(c, (r1, n, r2)).copy()))
    return ti.TT(cores), [jnp.asarray(x)] * d


def test_kernels_match_numpy():
    rng = np.random.default_rng(0)
    m, r, n = 256, 23, 33
    phi = jnp.asarray(rng.standard_normal((m, r)), jnp.float32)
    bt = rng.standard_normal((n, r, r)).astype(np.float32)
    bmat = jnp.asarray(np.transpose(bt, (1, 0, 2)).reshape(r, n * r))
    fk = factor_conditional(phi, bmat)
    ref = np.einsum("mi,xij->mxj", np.asarray(phi), bt)
    ref = np.sum(ref ** 2, axis=2)
    assert np.max(np.abs(np.asarray(fk) - ref)) / np.max(ref) < 1e-6

    pt = rng.standard_normal((r, r, n)).astype(np.float32)
    fk2 = gram_conditional(phi, jnp.asarray(pt.reshape(r * r, n)))
    ref2 = np.einsum("mi,ijx,mj->mx", np.asarray(phi), pt,
                     np.asarray(phi))
    assert np.max(np.abs(np.asarray(fk2) - ref2)) / np.max(
        np.abs(ref2)) < 1e-5

    core = rng.standard_normal((r, n, r)).astype(np.float32)
    cmat = jnp.asarray(np.transpose(core, (1, 0, 2)).reshape(n, r * r))
    i0 = rng.integers(0, n - 1, size=m)
    la = rng.uniform(size=m).astype(np.float32)
    lb = (1.0 - la).astype(np.float32)
    out = condition_update(phi, jnp.asarray(i0), jnp.asarray(la),
                           jnp.asarray(lb), cmat)
    g = core[:, i0, :] * la[None, :, None] + \
        core[:, i0 + 1, :] * lb[None, :, None]
    refp = np.einsum("mi,imj->mj", np.asarray(phi), g)
    refp = refp / np.maximum(np.max(np.abs(refp), axis=1, keepdims=True),
                             1e-30)
    assert np.max(np.abs(np.asarray(out) - refp)) < 1e-5


@pytest.mark.parametrize("precision", ["hi", "mixed", "f32"])
def test_fused_transform_matches_xla_path(precision):
    tt, grids = _mk_tt()
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(size=(1024, 8)))
    os.environ["TTIRT_FUSED_STEP"] = "0"
    try:
        x0, l0 = ti.tt_irt_sqr(grids, tt, q, precision=precision)
        os.environ["TTIRT_FUSED_STEP"] = "1"
        x1, l1 = ti.tt_irt_sqr(grids, tt, q, precision=precision)
    finally:
        os.environ.pop("TTIRT_FUSED_STEP", None)
    assert float(jnp.max(jnp.abs(x1 - x0))) < 1e-6
    assert float(jnp.max(jnp.abs(l1 - l0))) < 1e-5


def test_fused_rt_roundtrip():
    tt, grids = _mk_tt()
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.uniform(size=(512, 8)))
    os.environ["TTIRT_FUSED_STEP"] = "1"
    try:
        x, _ = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        qb, _ = ti.tt_rt_sqr(grids, tt, x, precision="hi")
    finally:
        os.environ.pop("TTIRT_FUSED_STEP", None)
    assert float(jnp.max(jnp.abs(qb - q))) < 1e-5


def test_dim_kernel_matches_xla_serveb(monkeypatch):
    """The merged whole-dim kernel (ops/pallas_dim.py) reproduces the
    raw-factor XLA 'serveb' scan body: same f32 row math, same one-hot
    bracket reads, same batched f64 epilogue.  The ortho default is
    disabled here (the kernel keeps the raw-core operands), and caches
    are cleared around each toggle so both programs really trace (env
    flags are not part of the jit cache key — the earlier 'bitwise'
    form of this test compared a stale cached program against itself).
    Interpret-mode accumulation order differs from the compiled XLA
    matmuls at the f32 floor, so parity is tolerance-banded at the
    same ~1e-7 class the kernel shows vs f64 (BENCH_NOTES)."""
    from tt_irt_tpu.samplers import irt_scan as isc
    monkeypatch.setenv("TTIRT_HI_ORTHO", "0")
    tt, grids = _mk_tt(d=6, n=17, r=5, seed=11)
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.uniform(size=(512, 6)))
    try:
        os.environ["TTIRT_DIM_KERNEL"] = "0"
        jax.clear_caches()
        x0, l0 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        qr0, lr0 = ti.tt_rt_sqr(grids, tt, x0, precision="hi")
        os.environ["TTIRT_DIM_KERNEL"] = "1"
        jax.clear_caches()
        x1, l1 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        qr1, lr1 = ti.tt_rt_sqr(grids, tt, x1, precision="hi")
    finally:
        os.environ.pop("TTIRT_DIM_KERNEL", None)
        jax.clear_caches()
    assert float(jnp.max(jnp.abs(x1 - x0))) < 1e-6
    assert float(jnp.max(jnp.abs(l1 - l0))) < 1e-5
    # rt (forward Rosenblatt) through the kernel vs XLA
    assert float(jnp.max(jnp.abs(qr1 - qr0))) < 1e-6
    assert float(jnp.max(jnp.abs(lr1 - lr0))) < 1e-5
    assert float(jnp.max(jnp.abs(qr1 - q))) < 1e-5


def test_dim_kernel_packed_operands(monkeypatch):
    """With the 9-product hi-pack prep (TTIRT_HI_PACK=9) the kernel
    branch must unpack the exact bf16 parts back to the plain f32
    operands (h + m + l == original bitwise), so results again match
    the packed XLA path."""
    from tt_irt_tpu.samplers import irt_scan as isc
    monkeypatch.setenv("TTIRT_HI_ORTHO", "0")
    tt, grids = _mk_tt(d=6, n=17, r=5, seed=17)
    rng = np.random.default_rng(19)
    q = jnp.asarray(rng.uniform(size=(256, 6)))
    try:
        os.environ["TTIRT_HI_PACK"] = "9"
        monkeypatch.setattr(isc, "_HI_PACK_ENV", "9")
        os.environ["TTIRT_DIM_KERNEL"] = "0"
        jax.clear_caches()
        x0, l0 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        os.environ["TTIRT_DIM_KERNEL"] = "1"
        jax.clear_caches()
        x1, l1 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
    finally:
        os.environ.pop("TTIRT_DIM_KERNEL", None)
        os.environ.pop("TTIRT_HI_PACK", None)
        jax.clear_caches()
    # packed XLA body computes fk from bf16-product dots; the kernel
    # recomputes it from the reconstructed f32 operands at HIGHEST —
    # same quantity, different rounding path: tolerance-banded.
    assert float(jnp.max(jnp.abs(x1 - x0))) < 5e-6
    assert float(jnp.max(jnp.abs(l1 - l0))) < 5e-4


def test_odim_kernel_matches_ortho_and_factor_paths(monkeypatch):
    """The ortho whole-dim kernel (ops/pallas_odim.py) reproduces both
    the XLA orthonormal-core serveb scan (same basis, same row math —
    tight parity) and the raw-factor serveb path (different basis,
    same transform — f32-class parity), in irt and rt modes."""
    from tt_irt_tpu.samplers import irt_scan as isc
    tt, grids = _mk_tt(d=6, n=17, r=5, seed=23)
    rng = np.random.default_rng(29)
    q = jnp.asarray(rng.uniform(size=(512, 6)))
    try:
        # raw-factor serveb (the shipped default)
        monkeypatch.setenv("TTIRT_HI_ORTHO", "0")
        jax.clear_caches()
        x0, l0 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        # XLA ortho scan body
        monkeypatch.setenv("TTIRT_HI_ORTHO", "1")
        jax.clear_caches()
        x1, l1 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        # fused ortho whole-dim kernel (interpret mode on CPU)
        os.environ["TTIRT_ODIM_KERNEL"] = "1"
        jax.clear_caches()
        x2, l2 = ti.tt_irt_sqr(grids, tt, q, precision="hi")
        qr2, lr2 = ti.tt_rt_sqr(grids, tt, x2, precision="hi")
    finally:
        os.environ.pop("TTIRT_ODIM_KERNEL", None)
        jax.clear_caches()
    # kernel vs XLA ortho body: identical algebra, interpret-mode
    # accumulation order differs at the f32 floor
    assert float(jnp.max(jnp.abs(x2 - x1))) < 1e-6
    assert float(jnp.max(jnp.abs(l2 - l1))) < 1e-5
    # kernel vs the raw-factor default: different carry basis
    assert float(jnp.max(jnp.abs(x2 - x0))) < 1e-5
    assert float(jnp.max(jnp.abs(l2 - l0))) < 1e-4
    # rt roundtrip through the kernel
    assert float(jnp.max(jnp.abs(qr2 - q))) < 1e-5
