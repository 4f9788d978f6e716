"""Tensor-train container and arithmetic, as a JAX pytree.

The reference stacks these capabilities on the external TT-Toolbox
(``tt_tensor``, ``core2cell``, ``round``, ``dot``, ``tkron``,
``tt_meshgrid_vert``, ... — see /root/reference usage at e.g.
matlab/constructors/amen_cross_s.m:199 and tt_dirt_approx.m:142).  Here a TT
is a first-class pytree: a tuple of cores with shapes ``(r_{k-1}, n_k, r_k)``,
so it jits, vmaps and shards like any other JAX value.

Boundary ranks may exceed 1: block tensors (as produced by the block cross,
amen_cross_s.m:575-579) carry the block index in the right boundary rank.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TT",
    "tt_full",
    "tt_dot",
    "tt_norm",
    "tt_add",
    "tt_scale",
    "tt_hadamard",
    "tt_round",
    "tt_orthogonalize",
    "tt_from_dense",
    "tt_rand",
    "tt_ones",
    "tt_meshgrid",
    "tkron",
    "tt_sum_modes",
    "tt_mean_field",
    "tt_eval_indices",
]


@jax.tree_util.register_pytree_node_class
class TT:
    """Tensor train: tuple of cores ``(r_{k-1}, n_k, r_k)``.

    Purely functional — all operations return new TTs.  The cores are the
    pytree leaves, so a TT can be passed through jit/vmap/scan/shard_map
    and serialized with orbax as-is.
    """

    __slots__ = ("cores",)

    def __init__(self, cores: Sequence[jnp.ndarray]):
        self.cores = tuple(cores)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return self.cores, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)

    # -- shape accessors ---------------------------------------------------
    @property
    def d(self) -> int:
        return len(self.cores)

    @property
    def n(self) -> tuple:
        return tuple(c.shape[1] for c in self.cores)

    @property
    def ranks(self) -> tuple:
        return (self.cores[0].shape[0],) + tuple(c.shape[2] for c in self.cores)

    @property
    def dtype(self):
        return self.cores[0].dtype

    def __repr__(self):
        return f"TT(d={self.d}, n={self.n}, ranks={self.ranks})"

    # convenience operators
    def __add__(self, other):
        return tt_add(self, other)

    def __mul__(self, alpha):
        return tt_scale(self, alpha)

    __rmul__ = __mul__

    def __neg__(self):
        return tt_scale(self, -1.0)

    def __sub__(self, other):
        return tt_add(self, tt_scale(other, -1.0))


# ---------------------------------------------------------------------------
# Dense conversions
# ---------------------------------------------------------------------------

def tt_full(t: TT) -> jnp.ndarray:
    """Contract a TT to a dense array of shape ``n`` (boundary ranks kept
    as leading/trailing axes if > 1)."""
    r0 = t.cores[0].shape[0]
    out = jnp.reshape(t.cores[0], (r0 * t.cores[0].shape[1], -1))
    for c in t.cores[1:]:
        r1, n, r2 = c.shape
        out = out @ jnp.reshape(c, (r1, n * r2))
        out = jnp.reshape(out, (-1, r2))
    rd = t.cores[-1].shape[2]
    shape = t.n
    if r0 > 1:
        shape = (r0,) + shape
    if rd > 1:
        shape = shape + (rd,)
    return jnp.reshape(out, shape)


def tt_from_dense(a, eps: float = 0.0, rmax: int | None = None) -> TT:
    """TT-SVD of a dense array (sequential truncated SVDs).

    Decomposition runs on the host (LAPACK): this is a constructor-layer
    op on small data, and TPU f64 SVD/QR custom calls are pathologically
    slow to compile — the hot device path never factorizes."""
    a = np.asarray(a)
    n = a.shape
    d = len(n)
    nrm = np.linalg.norm(a.ravel())
    delta = eps / math.sqrt(max(d - 1, 1)) * nrm
    cores = []
    r_prev = 1
    rest = np.reshape(a, (r_prev * n[0], -1))
    for k in range(d - 1):
        u, s, vt = np.linalg.svd(rest, full_matrices=False)
        r = _chop_rank(s, delta, rmax)
        cores.append(jnp.asarray(np.reshape(u[:, :r], (r_prev, n[k], r))))
        rest = s[:r, None] * vt[:r, :]
        r_prev = r
        rest = np.reshape(rest, (r_prev * n[k + 1], -1))
    cores.append(jnp.asarray(np.reshape(rest, (r_prev, n[d - 1], 1))))
    return TT(cores)


def _chop_rank(s: jnp.ndarray, delta, rmax: int | None) -> int:
    """Smallest r with truncated tail energy <= delta (concretizes s)."""
    s = np.asarray(s)
    tails = np.sqrt(np.cumsum(s[::-1] ** 2))[::-1]  # tails[r] = ||s[r:]||
    keep = np.nonzero(tails > float(delta))[0]
    r = int(keep[-1]) + 1 if keep.size else 1
    r = max(r, 1)
    if rmax is not None:
        r = min(r, int(rmax))
    return r


# ---------------------------------------------------------------------------
# Algebra
# ---------------------------------------------------------------------------

def tt_dot(a: TT, b: TT) -> jnp.ndarray:
    """Inner product <a, b> (sum over the full tensor product grid).
    Sesquilinear for complex TTs (conjugate on ``a``), matching the
    MATLAB/TT-Toolbox ``dot`` the reference calls (amen_cross_s.m:503)."""
    ra, rb = a.cores[0].shape[0], b.cores[0].shape[0]
    if ra != rb:
        raise ValueError("left boundary ranks must match")
    g = jnp.eye(ra, dtype=a.dtype)
    for ca, cb in zip(a.cores, b.cores):
        # g: (ra_k, rb_k); contract over mode
        g = jnp.einsum("ab,aic,bid->cd", g, jnp.conj(ca), cb)
    return jnp.squeeze(g)


def tt_norm(a: TT) -> jnp.ndarray:
    return jnp.sqrt(jnp.abs(tt_dot(a, a)))


def tt_scale(a: TT, alpha) -> TT:
    cores = list(a.cores)
    cores[0] = cores[0] * alpha
    return TT(cores)


def tt_add(a: TT, b: TT) -> TT:
    """TT sum via block-diagonal core concatenation."""
    if a.n != b.n:
        raise ValueError(f"mode mismatch {a.n} vs {b.n}")
    d = a.d
    if d == 1:
        return TT([a.cores[0] + b.cores[0]])
    cores = []
    for k in range(d):
        ca, cb = a.cores[k], b.cores[k]
        ra1, n, ra2 = ca.shape
        rb1, _, rb2 = cb.shape
        if k == 0:
            if ra1 != rb1:
                raise ValueError("left boundary ranks must match")
            c = jnp.concatenate([ca, cb], axis=2)
        elif k == d - 1:
            if ra2 != rb2:
                raise ValueError("right boundary ranks must match")
            c = jnp.concatenate([ca, cb], axis=0)
        else:
            top = jnp.concatenate(
                [ca, jnp.zeros((ra1, n, rb2), dtype=ca.dtype)], axis=2)
            bot = jnp.concatenate(
                [jnp.zeros((rb1, n, ra2), dtype=ca.dtype), cb], axis=2)
            c = jnp.concatenate([top, bot], axis=0)
        cores.append(c)
    return TT(cores)


def tt_hadamard(a: TT, b: TT) -> TT:
    """Elementwise product: ranks multiply."""
    if a.n != b.n:
        raise ValueError("mode mismatch")
    cores = []
    for ca, cb in zip(a.cores, b.cores):
        c = jnp.einsum("aib,cid->acibd", ca, cb)
        r1 = ca.shape[0] * cb.shape[0]
        r2 = ca.shape[2] * cb.shape[2]
        cores.append(jnp.reshape(c, (r1, ca.shape[1], r2)))
    return TT(cores)


def tt_orthogonalize(a: TT, left: bool = True) -> TT:
    """QR-orthogonalize all cores except the last (left=True) or first.
    Host LAPACK (constructor-layer op; see tt_from_dense note)."""
    cores = [np.asarray(c) for c in a.cores]
    d = len(cores)
    if left:
        for k in range(d - 1):
            r1, n, r2 = cores[k].shape
            q, rmat = np.linalg.qr(np.reshape(cores[k], (r1 * n, r2)))
            rnew = q.shape[1]
            cores[k] = np.reshape(q, (r1, n, rnew))
            cores[k + 1] = np.einsum("ab,bic->aic", rmat, cores[k + 1])
    else:
        for k in range(d - 1, 0, -1):
            r1, n, r2 = cores[k].shape
            q, rmat = np.linalg.qr(np.reshape(cores[k], (r1, n * r2)).T)
            rnew = q.shape[1]
            cores[k] = np.reshape(q.T, (rnew, n, r2))
            cores[k - 1] = np.einsum("aib,cb->aic", cores[k - 1], rmat)
    return TT([jnp.asarray(c) for c in cores])


def tt_round(a: TT, eps: float = 0.0, rmax=None) -> TT:
    """TT rounding: right-orthogonalize, then left-to-right SVD truncation.

    ``rmax`` may be a scalar or a per-bond sequence (d+1 entries, interior
    entries used), mirroring the per-dimension rank vectors the reference
    passes as ``y0`` (tt_dirt_approx.m:117-122, round at :383).
    Host LAPACK (constructor-layer op; see tt_from_dense note).
    """
    d = a.d
    if d == 1:
        return TT(list(a.cores))
    a = tt_orthogonalize(a, left=False)
    cores = [np.asarray(c) for c in a.cores]
    nrm = np.linalg.norm(np.reshape(cores[0], (-1,)))
    delta = float(eps) / math.sqrt(max(d - 1, 1)) * float(nrm)
    if np.isscalar(rmax) or rmax is None:
        rmax_vec = [rmax] * (d + 1)
    else:
        rmax_vec = list(rmax)
        if len(rmax_vec) == d - 1:  # interior bonds only
            rmax_vec = [None] + rmax_vec + [None]
    for k in range(d - 1):
        r1, n, r2 = cores[k].shape
        mat = np.reshape(cores[k], (r1 * n, r2))
        u, s, vt = np.linalg.svd(mat, full_matrices=False)
        r = _chop_rank(s, delta, rmax_vec[k + 1])
        cores[k] = np.reshape(u[:, :r], (r1, n, r))
        sv = s[:r, None] * vt[:r, :]
        cores[k + 1] = np.einsum("ab,bic->aic", sv, cores[k + 1])
    # Norm equilibration: the sweep leaves cores 0..d-2 orthonormal and
    # the LAST core carrying the entire TT norm — 5e21 on the shipped
    # lz40n33 sqrt-ratio levels, whose square overflows f32 in the
    # reduced-precision samplers (every sample NaN).  Per-bond scaling
    # with a unit product is an exact TT identity; spread the log-norm
    # evenly so every core sits at a comparable scale.
    logn = np.array([np.log(max(float(np.linalg.norm(c.ravel())),
                                1e-300)) for c in cores])
    shift = logn.mean() - logn
    shift -= shift.mean()  # unit product, exact up to fp
    for k in range(d):
        cores[k] = cores[k] * math.exp(shift[k])
    return TT([jnp.asarray(c) for c in cores])


# ---------------------------------------------------------------------------
# Constructors
# ---------------------------------------------------------------------------

def tt_rand(n, d: int | None = None, r=2, key=None, dtype=None) -> TT:
    """Random TT with mode sizes ``n`` and (interior) rank ``r``."""
    if np.isscalar(n):
        n = [int(n)] * int(d)
    else:
        n = [int(x) for x in n]
    d = len(n)
    if np.isscalar(r):
        ranks = [1] + [int(r)] * (d - 1) + [1]
    else:
        ranks = [int(x) for x in r]
    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = dtype or jnp.float64
    keys = jax.random.split(key, d)
    cores = [
        jax.random.normal(keys[k], (ranks[k], n[k], ranks[k + 1]), dtype=dtype)
        for k in range(d)
    ]
    return TT(cores)


def tt_ones(n, d: int | None = None, dtype=None) -> TT:
    if np.isscalar(n):
        n = [int(n)] * int(d)
    else:
        n = [int(x) for x in n]
    dtype = dtype or jnp.float64
    return TT([jnp.ones((1, nk, 1), dtype=dtype) for nk in n])


def tt_meshgrid(grids: Sequence[jnp.ndarray]) -> list:
    """List of d rank-1 TTs: the i-th equals coordinate x_i on the product
    grid (reference: TT-Toolbox ``tt_meshgrid_vert`` used at
    tt_dirt_approx.m:142-145)."""
    d = len(grids)
    grids = [jnp.asarray(g).reshape(-1) for g in grids]
    out = []
    for i in range(d):
        cores = []
        for k in range(d):
            if k == i:
                cores.append(jnp.reshape(grids[k], (1, -1, 1)))
            else:
                cores.append(jnp.ones((1, grids[k].shape[0], 1),
                                      dtype=grids[i].dtype))
        out.append(TT(cores))
    return out


def tkron(a: TT, b: TT) -> TT:
    """Mode concatenation: result has a's dims followed by b's dims
    (TT-Toolbox ``tkron`` semantics, used at test_diffusion_tt.m:92-103)."""
    if a.cores[-1].shape[2] != 1 or b.cores[0].shape[0] != 1:
        raise ValueError("tkron requires unit inner boundary ranks")
    return TT(list(a.cores) + list(b.cores))


# ---------------------------------------------------------------------------
# Contractions
# ---------------------------------------------------------------------------

def tt_sum_modes(a: TT, weights: Sequence) -> TT | jnp.ndarray:
    """Contract per-mode weight vectors (entries of ``weights`` that are not
    None) out of the TT; keeps remaining modes as a smaller TT.

    Generalizes the reference's marginal diagnostics
    ``dot(tt_ones(...), F, i, j)`` (tt_dirt_approx.m:205-209).
    Returns a dense scalar/array when all modes are contracted.
    """
    if len(weights) != a.d:
        raise ValueError("need one weight (or None) per mode")
    cores = []
    carry = None  # (r_left_kept, r_cur) matrix pending absorption
    for k in range(a.d):
        c = a.cores[k]
        if carry is not None:
            c = jnp.einsum("ab,bic->aic", carry, c)
            carry = None
        w = weights[k]
        if w is None:
            cores.append(c)
        else:
            w = jnp.asarray(w).reshape(-1)
            carry = jnp.einsum("aic,i->ac", c, w)
    if carry is not None:
        if cores:
            last = cores.pop()
            cores.append(jnp.einsum("aib,bc->aic", last, carry))
        else:
            return jnp.squeeze(carry)
    return TT(cores)


def tt_mean_field(a: TT, dim: int) -> jnp.ndarray:
    """1-D marginal along ``dim`` by summing all other modes with ones."""
    weights = [jnp.ones((nk,), dtype=a.dtype) for nk in a.n]
    weights[dim] = None
    out = tt_sum_modes(a, weights)
    return jnp.squeeze(tt_full(out))


def tt_reverse(a: TT) -> TT:
    """Reverse the dimension order (cores reversed, rank axes swapped).
    Useful to move a left boundary (block) rank to the right where the
    batched evaluators expect it."""
    return TT([jnp.transpose(c, (2, 1, 0)) for c in reversed(a.cores)])


def tt_partial_eval(a: TT, grids, dims, values):
    """Substitute fixed values for a subset of coordinates (linear spline).

    Evaluates the cores of dimensions ``dims`` at ``values`` by linear
    interpolation on their grids — the same per-dimension interpolant
    the spline samplers realize, so for a sqrt-density TT the square of
    the result IS the exact (unnormalized) conditional of the sampler's
    realized density — and contracts the resulting matrices into the
    neighboring kept cores.  Rank-preserving and order-preserving (no
    tt_permute rank growth).

    Args:
      a: TT with d dims.  grids: d grid vectors.  dims: coordinates to
      fix.  values: one value per entry of dims (clipped to the grid).

    Returns:
      (sub_tt, sub_grids): TT over the remaining dims (in original
      relative order) and their grids.  All dims fixed -> sub_tt is a
      TT with a single size-1 mode carrying the scalar.
    """
    d = a.d
    dims = [int(k) for k in dims]
    if len(set(dims)) != len(dims) or not all(0 <= k < d for k in dims):
        raise ValueError(f"dims must be distinct in 0..{d-1}: {dims}")
    vals = {k: float(v) for k, v in zip(dims, np.asarray(values).ravel())}
    if len(vals) != len(dims):
        raise ValueError("one value per fixed dim required")
    fixed = set(dims)

    def sub_mat(k):
        g = np.asarray(grids[k]).ravel()
        x = min(max(vals[k], float(g[0])), float(g[-1]))
        i0 = int(np.clip(np.searchsorted(g, x, side="right") - 1,
                         0, len(g) - 2))
        w = (x - g[i0]) / (g[i0 + 1] - g[i0])
        c = np.asarray(a.cores[k])
        return (1.0 - w) * c[:, i0, :] + w * c[:, i0 + 1, :]

    out_cores, out_grids = [], []
    pending = None  # matrix to fold into the NEXT kept core
    for k in range(d):
        if k in fixed:
            m = sub_mat(k)
            pending = m if pending is None else pending @ m
        else:
            c = np.asarray(a.cores[k])
            if pending is not None:
                c = np.einsum("ab,bnc->anc", pending, c)
                pending = None
            out_cores.append(c)
            out_grids.append(grids[k])
    if pending is not None:
        if out_cores:
            out_cores[-1] = np.einsum("anb,bc->anc", out_cores[-1], pending)
        else:  # every dim fixed: scalar as a 1-mode TT
            out_cores = [pending.reshape(pending.shape[0], 1,
                                         pending.shape[1])]
            out_grids = [np.zeros(1)]
    return TT([jnp.asarray(c) for c in out_cores]), out_grids


def tt_permute(a: TT, perm, eps: float = 0.0, rmax: int | None = None) -> TT:
    """Reorder the TT dimensions: result(i_{perm[0]},...,i_{perm[d-1]}).

    Mode permutation is not free in TT format (unlike dense transpose):
    each adjacent transposition merges two cores into a supercore,
    swaps its mode axes and re-splits by truncated SVD, so non-adjacent
    moves change the bond ranks.  Sorting is bubble-style serpentine
    sweeps; before every left-to-right sweep the train is
    right-orthogonalized so each local SVD truncation equals its global
    error contribution.  Total error <= ``eps * |A|`` (per-swap budget
    eps/sqrt(#swaps)); ``rmax`` caps every intermediate bond.

    Enables conditioning the triangular transport on arbitrary
    coordinate subsets (samplers/conditional.py): permute the target's
    TT so the conditioned block leads, then run the prefix machinery.
    Host LAPACK (constructor-layer op; see tt_from_dense note).
    """
    d = a.d
    perm = [int(p) for p in perm]
    if sorted(perm) != list(range(d)):
        raise ValueError(f"perm must be a permutation of 0..{d-1}: {perm}")
    if perm == list(range(d)):
        return TT(list(a.cores))

    # want_pos[dim] = target position of original dim `dim`
    want_pos = [0] * d
    for i, p in enumerate(perm):
        want_pos[p] = i
    order = list(range(d))
    nswaps = sum(1 for i in range(d) for j in range(i + 1, d)
                 if want_pos[order[i]] > want_pos[order[j]])
    nrm = float(tt_norm(a))
    delta = float(eps) * nrm / math.sqrt(max(nswaps, 1))

    cur = a
    while True:
        # right-orthogonalize so the sweep's local SVDs are globally tight
        cur = tt_orthogonalize(cur, left=False)
        cores = [np.asarray(c) for c in cur.cores]
        swapped = False
        for k in range(d - 1):
            if want_pos[order[k]] <= want_pos[order[k + 1]]:
                if swapped or k == 0:
                    # keep positions < active site left-orthonormal
                    r1, n, r2 = cores[k].shape
                    q, rmat = np.linalg.qr(np.reshape(cores[k], (r1 * n, r2)))
                    cores[k] = np.reshape(q, (r1, n, q.shape[1]))
                    cores[k + 1] = np.einsum("ab,bic->aic", rmat,
                                             cores[k + 1])
                continue
            r1, n1, _ = cores[k].shape
            _, n2, r3 = cores[k + 1].shape
            sc = np.einsum("aib,bjc->ajic", cores[k], cores[k + 1])
            mat = np.reshape(sc, (r1 * n2, n1 * r3))
            u, s, vt = np.linalg.svd(mat, full_matrices=False)
            r = _chop_rank(s, delta, rmax)
            cores[k] = np.reshape(u[:, :r], (r1, n2, r))
            cores[k + 1] = np.reshape(s[:r, None] * vt[:r, :], (r, n1, r3))
            order[k], order[k + 1] = order[k + 1], order[k]
            swapped = True
        cur = TT([jnp.asarray(c) for c in cores])
        if not swapped:
            break
    return cur


def tt_sum_many(tts: Sequence[TT], weights=None, eps: float = 1e-10,
                rmax: int | None = None) -> TT:
    """Rounded weighted sum of several TTs (the reference relies on the
    external TT-Toolbox ``amen_sum`` for this, used for cross-run error
    estimates at test_shock_absorber_tt.m:150).  Tree reduction of
    block-diagonal adds with intermediate rounding keeps ranks bounded."""
    if weights is None:
        weights = [1.0] * len(tts)
    items = [tt_scale(t, w) for t, w in zip(tts, weights)]
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            nxt.append(tt_round(tt_add(items[i], items[i + 1]), eps, rmax))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0]


def tt_eval_indices(t: TT, ind: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the TT at M multi-indices (M x d int array) -> (M,) values
    (or (M, b) for block tensors with right boundary rank b).

    This is the batched "gather cores and chain-multiply" primitive that
    replaces per-sample loops (reference tt_sample_lagr.m:24-50 does this
    sample-by-sample)."""
    ind = jnp.asarray(ind)
    M = ind.shape[0]
    r0 = t.cores[0].shape[0]
    prefix = jnp.ones((M, r0), dtype=t.dtype)
    for k in range(t.d):
        gathered = jnp.take(t.cores[k], ind[:, k], axis=1)  # (r1, M, r2)
        prefix = jnp.einsum("ma,amb->mb", prefix, gathered)
    if prefix.shape[1] == 1:
        return prefix[:, 0]
    return prefix
