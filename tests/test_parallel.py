"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tt_irt_tpu import essinv, tt_from_dense, tt_irt_sqr
from tt_irt_tpu.parallel.mesh import (
    replicate, sample_mesh, shard_samples, sharded_call,
)


needs_multi = pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices")


def _density(grids):
    d = len(grids)
    prec = np.eye(d) + 0.3 * (np.eye(d, k=1) + np.eye(d, k=-1))
    mesh = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([m.ravel() for m in mesh], axis=1)
    e = np.einsum("mi,ij,mj->m", pts, prec, pts)
    return np.exp(-0.25 * e).reshape([len(g) for g in grids])


@needs_multi
def test_sharded_irt_matches_single_device(rng):
    grids = [np.linspace(-3, 3, 17) for _ in range(4)]
    t = tt_from_dense(jnp.asarray(_density(grids)), eps=1e-12)
    mesh = sample_mesh(8)
    m = 8 * 64
    q = jnp.asarray(rng.random((m, 4)))

    # single-device result
    x_ref, lf_ref = tt_irt_sqr(grids, t, q)

    # sharded: seeds split over the mesh, TT replicated
    q_sh = shard_samples(mesh, q)
    t_repl = replicate(mesh, t)
    x_sh, lf_sh = tt_irt_sqr(grids, t_repl, q_sh)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(lf_sh), np.asarray(lf_ref),
                               atol=1e-12)
    # the output keeps the sample axis sharded
    assert len(x_sh.sharding.device_set) == 8


@needs_multi
def test_sharded_diagnostics_reduce(rng):
    mesh = sample_mesh(8)
    m = 8 * 128
    lfex = jnp.asarray(rng.standard_normal(m))
    lfapp = lfex + 0.1 * jnp.asarray(rng.standard_normal(m))
    tau_ref = float(essinv(lfex, lfapp))
    tau_sh = float(sharded_call(mesh, essinv, lfex, lfapp,
                                sample_args=(0, 1)))
    np.testing.assert_allclose(tau_sh, tau_ref, rtol=1e-12)


@needs_multi
def test_dirt_sample_sharded(rng):
    # full DIRT push with the sample axis sharded
    from tt_irt_tpu import tt_dirt_approx, tt_dirt_sample

    def logratio(x, b0, b1):
        return -0.5 * (b1 - b0) * jnp.sum(x * x, axis=1)

    grids = [np.linspace(-4, 4, 13) for _ in range(3)]
    dirt = tt_dirt_approx(grids, logratio, [0.3, 1.0], stoptol=0.2,
                          nswp=2, kickrank=2, testsamples=128, seed=0)
    mesh = sample_mesh(8)
    q = jnp.asarray(rng.random((8 * 32, 3)))
    z_ref, lf_ref = tt_dirt_sample(dirt, q)
    q_sh = shard_samples(mesh, q)
    dirt_repl = replicate(mesh, dirt)
    z_sh, lf_sh = tt_dirt_sample(dirt_repl, q_sh)
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref),
                               atol=1e-12)


def test_checkpoint_roundtrip(rng, tmp_path):
    from tt_irt_tpu import tt_dirt_approx, tt_dirt_sample
    from tt_irt_tpu.utils.checkpoint import load_dirt, save_dirt

    def logratio(x, b0, b1):
        return -0.5 * (b1 - b0) * jnp.sum(x * x, axis=1)

    grids = [np.linspace(-4, 4, 9) for _ in range(2)]
    dirt = tt_dirt_approx(grids, logratio, [0.3, 1.0], stoptol=0.2,
                          nswp=2, kickrank=2, testsamples=64, seed=0)
    path = str(tmp_path / "dirt_ckpt")
    save_dirt(path, dirt)
    restored = load_dirt(path)
    # fprev (the next level's warm start) must survive the round trip:
    # without it a resumed build silently warm-starts from random
    # indices, changing the appended levels' quality.
    assert dirt.fprev is not None
    assert restored.fprev is not None
    for a, b in zip(dirt.fprev.cores, restored.fprev.cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    q = jnp.asarray(rng.random((64, 2)))
    z1, l1 = tt_dirt_sample(dirt, q)
    z2, l2 = tt_dirt_sample(restored, q)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-14)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-14)
    # resume: extend the ladder from the checkpoint
    from tt_irt_tpu import tt_dirt_approx as build

    extended = build(grids, logratio, [0.3, 1.0, 1.0001], stoptol=0.2,
                     nswp=2, kickrank=2, testsamples=64, seed=0,
                     irtstruct=restored)
    assert extended.nlevels == restored.nlevels + 1


def test_checkpoint_per_level(rng, tmp_path):
    # checkpoint_path saves after every accepted level
    import os

    from tt_irt_tpu import tt_dirt_approx
    from tt_irt_tpu.utils.checkpoint import load_dirt

    def logratio(x, b0, b1):
        return -0.5 * (b1 - b0) * jnp.sum(x * x, axis=1)

    grids = [np.linspace(-4, 4, 9) for _ in range(2)]
    path = str(tmp_path / "ckpt")
    dirt = tt_dirt_approx(grids, logratio, [0.3, 0.6, 1.0], stoptol=0.2,
                          nswp=2, kickrank=2, testsamples=64, seed=0,
                          checkpoint_path=path)
    assert os.path.exists(path + ".npz")
    restored = load_dirt(path)
    assert restored.nlevels == dirt.nlevels


@needs_multi
def test_sharded_construction_matches_single_device():
    """DIRT built with construction-time evaluation sharded over the
    8-device mesh must equal the single-device build exactly (VERDICT
    'data-parallel cross evaluation'; reference hot path
    amen_cross_s.m:704-760)."""
    from tt_irt_tpu import tt_dirt_approx, tt_dirt_sample

    d = 4
    grids = [np.linspace(-4, 4, 13) for _ in range(d)]
    beta = [0.1, 1.0]

    def logratio(x, b0, b1):
        quad = jnp.sum(x * x, axis=1) + \
            0.8 * jnp.sum(x[:, :-1] * x[:, 1:], axis=1)
        return -0.5 * (b1 - b0) * quad

    kw = dict(stoptol=0.1, nswp=2, kickrank=2, testsamples=128,
              verb=0, seed=9, reference="n3")
    d1 = tt_dirt_approx(grids, logratio, beta, **kw)
    d2 = tt_dirt_approx(grids, logratio, beta, mesh=sample_mesh(8), **kw)
    q = jax.random.uniform(jax.random.PRNGKey(3), (256, d),
                           dtype=jnp.float64)
    from tt_irt_tpu import randref
    qn = randref("n3", jax.random.PRNGKey(3), (256, d))
    z1, lf1 = tt_dirt_sample(d1, qn)
    z2, lf2 = tt_dirt_sample(d2, qn)
    assert float(jnp.max(jnp.abs(z1 - z2))) < 1e-10
    assert float(jnp.max(jnp.abs(lf1 - lf2))) < 1e-8


@needs_multi
def test_sharded_amen_cross_matches_single_device():
    """Standalone amen_cross_s with mesh= (VERDICT r02 #3): probe
    batches shard over the mesh; an 8-device build must equal a
    1-device build exactly (both jit via sharded_batch_fn, so pivot
    selection sees bitwise-identical values)."""
    from tt_irt_tpu import amen_cross_s, tt_full

    d, n = 4, 11
    grids = jnp.linspace(-2.0, 2.0, n)

    def fun(ind):
        x = grids[ind]
        s = jnp.sum(x, axis=1)
        return jnp.exp(-0.5 * s * s) + 0.2 * jnp.cos(s)

    kw = dict(tol_exit=1e-8, nswp=8, kickrank=3, seed=3)
    r1 = amen_cross_s([n] * d, fun, 1e-10, mesh=sample_mesh(1), **kw)
    r8 = amen_cross_s([n] * d, fun, 1e-10, mesh=sample_mesh(8), **kw)
    f1 = np.asarray(tt_full(r1.tt))
    f8 = np.asarray(tt_full(r8.tt))
    np.testing.assert_allclose(f8, f1, rtol=0, atol=1e-13)
    # and it actually approximates the target
    mesh_pts = np.meshgrid(*[np.linspace(-2, 2, n)] * d, indexing="ij")
    s = sum(mesh_pts)
    ref = np.exp(-0.5 * s * s) + 0.2 * np.cos(s)
    assert np.max(np.abs(f8 - ref)) < 1e-6


@needs_multi
def test_sharded_greedy_cross_matches_single_device():
    from tt_irt_tpu import tt_full
    from tt_irt_tpu.constructors.greedy_cross import greedy_cross

    d, n = 4, 9
    grids = jnp.linspace(-1.0, 1.0, n)

    def fun(ind):
        x = grids[ind]
        s = jnp.sum(x, axis=1)
        return jnp.exp(-0.5 * s * s) + 0.3 * jnp.sin(2 * s)

    kw = dict(nswp=25, tol_exit=1e-7, seed=1)
    r1 = greedy_cross([n] * d, fun, 1e-8, mesh=sample_mesh(1), **kw)
    r8 = greedy_cross([n] * d, fun, 1e-8, mesh=sample_mesh(8), **kw)
    np.testing.assert_allclose(np.asarray(tt_full(r8.tt)),
                               np.asarray(tt_full(r1.tt)),
                               rtol=0, atol=1e-13)


@needs_multi
@pytest.mark.slow
def test_sharded_deep_serve_real_checkpoint():
    """Multi-chip serve of the SHIPPED Lorenz d=40 checkpoint (14
    levels, n=33, r=23 — the production artifact, VERDICT r02 #6):
    sharded over the 8-device mesh must equal single-device exactly."""
    import os

    from tt_irt_tpu import randref, tt_dirt_sample
    from tt_irt_tpu.utils.checkpoint import load_dirt

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "data", "lz40n33_ck")
    if not os.path.exists(path + ".npz"):
        pytest.skip("lz40n33 checkpoint not shipped in this tree")
    dirt = load_dirt(path)
    assert dirt.nlevels >= 13 and dirt.d == 40
    mesh = sample_mesh(8)
    q = randref("n3", jax.random.PRNGKey(11), (8 * 32, 40))
    q_sh = shard_samples(mesh, jnp.asarray(q))

    # host-loop serve path on a truncated stack (per-level programs are
    # identical across levels, so 4 real levels pin the same code as 14
    # at ~3.5x less compile time — the full suite spent 12 of its 30
    # minutes compiling this one test's two 14-level programs)
    short = type(dirt)(dirt.f0, dirt.fs[:4], dirt.x0, dirt.x,
                       np.asarray(dirt.beta)[:5], dirt.lfshift,
                       dirt.reference, dirt.interpolation)
    z_ref, lf_ref = tt_dirt_sample(short, q)
    z_sh, lf_sh = tt_dirt_sample(replicate(mesh, short), q_sh)
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(lf_sh), np.asarray(lf_ref),
                               atol=1e-10)
    assert len(z_sh.sharding.device_set) == 8

    # the FULL 14-level stack through the fused scan-over-levels
    # program (one compile regardless of depth, samplers/dirt_scan.py)
    from tt_irt_tpu.samplers.dirt_scan import can_fuse, dirt_sample_fused
    assert can_fuse(dirt, dirt.d)
    zf_ref, lff_ref = dirt_sample_fused(dirt, q, "f64")
    zf_sh, lff_sh = dirt_sample_fused(replicate(mesh, dirt), q_sh, "f64")
    np.testing.assert_allclose(np.asarray(zf_sh), np.asarray(zf_ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(lff_sh), np.asarray(lff_ref),
                               atol=1e-10)
    assert len(zf_sh.sharding.device_set) == 8


@needs_multi
def test_finetune_mesh_matches_single_device():
    """dirt_finetune(mesh=...) computes the data-parallel gradient:
    identical loss trajectory and identical tuned cores vs the
    single-device run (sharding is annotation, the psum reduction is
    the only collective)."""
    from tt_irt_tpu import dirt_finetune, tt_dirt_approx

    def lp(x):
        return -0.5 * (jnp.sum(x * x, axis=1)
                       + 1.1 * jnp.sum(x[:, :-1] * x[:, 1:], axis=1))

    grids = [np.linspace(-6, 6, 9) for _ in range(3)]
    dirt = tt_dirt_approx(grids, lambda x, b0, b1: (b1 - b0) * lp(x),
                          [1.0], stoptol=0.5, nswp=1, kickrank=0, y0=2,
                          rmax=2, testsamples=0, verb=0, seed=5)
    mesh = sample_mesh(8)
    t_ref, l_ref = dirt_finetune(dirt, lp, steps=4, nsamples=64,
                                 lr=1e-3, seed=3)
    t_sh, l_sh = dirt_finetune(dirt, lp, steps=4, nsamples=64,
                               lr=1e-3, seed=3, mesh=mesh)
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-10)
    for a, b in zip(t_sh.f0.cores, t_ref.f0.cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-12)
