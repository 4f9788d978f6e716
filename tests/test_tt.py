"""Unit tests for the TT container and arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tt_irt_tpu import (
    TT, tt_add, tt_dot, tt_from_dense, tt_full, tt_meshgrid, tt_norm,
    tt_ones, tt_rand, tt_round, tt_scale, tkron,
)
from tt_irt_tpu.ops.tt import (
    tt_eval_indices, tt_hadamard, tt_mean_field, tt_orthogonalize,
    tt_sum_modes,
)


def dense_rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape))


def test_from_dense_roundtrip(rng):
    a = dense_rand(rng, (5, 6, 7, 4))
    t = tt_from_dense(a, eps=0.0)
    np.testing.assert_allclose(np.asarray(tt_full(t)), np.asarray(a),
                               atol=1e-10)


def test_round_compresses_low_rank(rng):
    # rank-2 tensor: f(i,j,k) = a_i b_j c_k + d_i e_j f_k
    v = [dense_rand(rng, (n,)) for n in (5, 6, 7)] + \
        [dense_rand(rng, (n,)) for n in (5, 6, 7)]
    a = jnp.einsum("i,j,k->ijk", v[0], v[1], v[2]) + \
        jnp.einsum("i,j,k->ijk", v[3], v[4], v[5])
    t = tt_from_dense(a, eps=0.0)
    t2 = tt_round(t, 1e-12)
    assert max(t2.ranks) <= 2
    np.testing.assert_allclose(np.asarray(tt_full(t2)), np.asarray(a),
                               atol=1e-9)


def test_add_dot_norm(rng):
    a = tt_rand((4, 5, 6), r=3, key=jax.random.PRNGKey(0))
    b = tt_rand((4, 5, 6), r=2, key=jax.random.PRNGKey(1))
    fa, fb = tt_full(a), tt_full(b)
    np.testing.assert_allclose(np.asarray(tt_full(tt_add(a, b))),
                               np.asarray(fa + fb), atol=1e-10)
    np.testing.assert_allclose(float(tt_dot(a, b)),
                               float(jnp.sum(fa * fb)), rtol=1e-10)
    np.testing.assert_allclose(float(tt_norm(a)),
                               float(jnp.linalg.norm(fa.ravel())), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(tt_full(tt_scale(a, -2.5))),
                               np.asarray(-2.5 * fa), atol=1e-10)


def test_hadamard(rng):
    a = tt_rand((4, 5), r=2, key=jax.random.PRNGKey(2))
    b = tt_rand((4, 5), r=3, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(tt_full(tt_hadamard(a, b))),
                               np.asarray(tt_full(a) * tt_full(b)),
                               atol=1e-10)


def test_orthogonalize_preserves_value(rng):
    a = tt_rand((4, 5, 6, 3), r=4, key=jax.random.PRNGKey(4))
    for left in (True, False):
        t = tt_orthogonalize(a, left=left)
        np.testing.assert_allclose(np.asarray(tt_full(t)),
                                   np.asarray(tt_full(a)), atol=1e-9)
    # left-orthogonal cores: unfoldings have orthonormal columns
    t = tt_orthogonalize(a, left=True)
    for c in t.cores[:-1]:
        m = np.reshape(np.asarray(c), (-1, c.shape[2]))
        np.testing.assert_allclose(m.T @ m, np.eye(c.shape[2]), atol=1e-10)


def test_meshgrid_and_eval(rng):
    grids = [jnp.linspace(0, 1, 5), jnp.linspace(-1, 2, 7),
             jnp.linspace(3, 4, 6)]
    xs = tt_meshgrid(grids)
    ind = jnp.asarray(rng.integers(0, 5, size=(10, 3)) % np.array([5, 7, 6]))
    for i, x in enumerate(xs):
        vals = tt_eval_indices(x, ind)
        np.testing.assert_allclose(np.asarray(vals),
                                   np.asarray(grids[i][ind[:, i]]), atol=1e-12)


def test_ones_tkron_sum_modes(rng):
    o = tt_ones((3, 4))
    assert np.asarray(tt_full(o)).sum() == 12
    a = tt_rand((3, 4), r=2, key=jax.random.PRNGKey(5))
    b = tt_rand((2, 5), r=2, key=jax.random.PRNGKey(6))
    k = tkron(a, b)
    fk = np.asarray(tt_full(k))
    ref = np.einsum("ij,kl->ijkl", np.asarray(tt_full(a)),
                    np.asarray(tt_full(b)))
    np.testing.assert_allclose(fk, ref, atol=1e-10)
    # contract all modes with ones == plain sum
    w = [jnp.ones((n,)) for n in k.n]
    np.testing.assert_allclose(float(tt_sum_modes(k, w)), ref.sum(),
                               rtol=1e-10)
    # 1-D marginal
    m = tt_mean_field(a, 0)
    np.testing.assert_allclose(np.asarray(m),
                               np.asarray(tt_full(a)).sum(axis=1), atol=1e-10)


def test_block_boundary_rank(rng):
    # block tensors keep a trailing boundary rank
    cores = [dense_rand(rng, (1, 4, 3)), dense_rand(rng, (3, 5, 2))]
    t = TT(cores)
    assert t.ranks == (1, 3, 2)
    full = tt_full(t)
    assert full.shape == (4, 5, 2)
    ind = jnp.asarray([[0, 1], [3, 4]])
    v = tt_eval_indices(t, ind)
    assert v.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(v[0]), np.asarray(full[0, 1]),
                               atol=1e-12)


def test_tt_is_pytree(rng):
    a = tt_rand((4, 4), r=2, key=jax.random.PRNGKey(7))

    @jax.jit
    def f(t):
        return tt_norm(t)

    np.testing.assert_allclose(float(f(a)), float(tt_norm(a)), rtol=1e-12)
    leaves = jax.tree_util.tree_leaves(a)
    assert len(leaves) == 2


def test_round_rmax_cap(rng):
    a = tt_rand((6, 6, 6), r=5, key=jax.random.PRNGKey(8))
    t = tt_round(a, 0.0, rmax=3)
    assert max(t.ranks) <= 3


def test_tracemult_parity_complex():
    """tracemult handles complex batches like the reference C kernel
    (tracemult.c:29-42 fakes complex via interleaved doubles; here the
    dtype flows through natively)."""
    if jax.default_backend() == "tpu":
        pytest.skip("C128 unsupported on the TPU backend")
    import numpy as np
    from tt_irt_tpu.ops.tracemult import tracemult, tracemult_gather

    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 3, 4)) + 1j * rng.standard_normal((5, 3, 4))
    b = rng.standard_normal((7, 4, 2)) + 1j * rng.standard_normal((7, 4, 2))
    j = rng.integers(0, 7, size=5)
    out = np.asarray(tracemult(a, b, j))
    ref = np.stack([a[i] @ b[j[i]] for i in range(5)])
    np.testing.assert_allclose(out, ref, rtol=1e-12)
    g = np.asarray(tracemult_gather(a[:, :, 0], j % 3))
    ref_g = a[np.arange(5), j % 3, 0]
    np.testing.assert_allclose(g, ref_g, rtol=1e-12)


def test_tt_permute_dense_oracle():
    from tt_irt_tpu.ops.tt import tt_permute

    a = tt_rand([5, 6, 7, 4, 3], r=4, key=jax.random.PRNGKey(11))
    dense = np.asarray(tt_full(a))
    for perm in ([1, 0, 2, 3, 4], [4, 3, 2, 1, 0], [2, 0, 4, 1, 3]):
        b = tt_permute(a, perm, eps=0.0)
        np.testing.assert_allclose(np.asarray(tt_full(b)),
                                   np.transpose(dense, perm),
                                   rtol=0, atol=1e-12 * np.abs(dense).max())
    # identity permutation is free
    assert tt_permute(a, [0, 1, 2, 3, 4]).ranks == a.ranks
    with pytest.raises(ValueError):
        tt_permute(a, [0, 1, 2, 3, 3])


def test_tt_permute_preserves_separable_rank():
    from tt_irt_tpu.ops.tt import tt_permute

    g = [np.linspace(-1, 1, 6)] * 4
    dense = np.exp(np.add.outer(np.add.outer(g[0], g[1]),
                                np.add.outer(g[2], g[3])))
    t = tt_from_dense(jnp.asarray(dense), eps=1e-12)
    assert max(tt_permute(t, [3, 1, 0, 2], eps=1e-12).ranks) == 1


def test_tt_partial_eval_dense_oracle():
    from tt_irt_tpu.ops.tt import tt_partial_eval

    grids = [np.linspace(-2, 2, n) for n in (5, 6, 7, 4)]
    a = tt_rand([5, 6, 7, 4], r=3, key=jax.random.PRNGKey(12))
    dense = np.asarray(tt_full(a))
    # substitution at grid points == dense slicing
    sub, sg = tt_partial_eval(a, grids, [1, 3], [grids[1][2], grids[3][1]])
    np.testing.assert_allclose(np.asarray(tt_full(sub)),
                               dense[:, 2, :, 1], atol=1e-13)
    assert [len(g) for g in sg] == [5, 7]
    # off-grid values == multilinear interpolation of the dense slices
    x = 0.5 * (grids[1][2] + grids[1][3])
    sub2, _ = tt_partial_eval(a, grids, [1], [x])
    np.testing.assert_allclose(np.asarray(tt_full(sub2)),
                               0.5 * (dense[:, 2] + dense[:, 3]), atol=1e-13)
    # trailing fixed dims fold from the right; all-fixed gives a scalar
    sub3, _ = tt_partial_eval(a, grids, [3], [grids[3][0]])
    np.testing.assert_allclose(np.asarray(tt_full(sub3)), dense[..., 0],
                               atol=1e-13)
    sub4, _ = tt_partial_eval(a, grids, [0, 1, 2, 3],
                              [g[0] for g in grids])
    np.testing.assert_allclose(float(np.asarray(tt_full(sub4)).ravel()[0]),
                               dense[0, 0, 0, 0], atol=1e-13)
