"""Data-parallel sample transport over a TPU device mesh.

The reference's only concurrency is single-node `parfor` over sample
blocks (SURVEY.md §2.6; tt_irt_fourier.m:144-158).  The TPU-native
equivalent: the sample axis M is the data-parallel axis — seeds are
sharded over a 1-D ICI mesh, every chip runs the identical IRT/DIRT
transform on its shard (TT cores are tiny and replicated), and scalar
diagnostics reduce with `psum`/`pmean` collectives.  Because the
transforms are embarrassingly parallel over samples, sharding is pure
annotation: `jax.jit` + `NamedSharding` insert no collectives in the hot
path at all.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["sample_mesh", "shard_samples", "sharded_call", "replicate",
           "sharded_batch_fn"]

SAMPLE_AXIS = "samples"


def sample_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first n) devices, axis name 'samples'."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SAMPLE_AXIS,))


def shard_samples(mesh: Mesh, x):
    """Place an (M, ...) array sharded along its leading (sample) axis."""
    spec = P(SAMPLE_AXIS, *([None] * (jnp.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. TT cores, a DIRT stack) on every device."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_call(mesh: Mesh, fn: Callable, *args, sample_args=(0,)):
    """Jit ``fn`` with the given positional args sharded along axis 0
    (those listed in ``sample_args``) and the rest replicated.

    Output shardings are left to the compiler: elementwise-over-samples
    outputs stay sharded, reductions gather automatically.
    """
    placed = []
    for i, a in enumerate(args):
        if i in sample_args:
            placed.append(shard_samples(mesh, a))
        else:
            placed.append(replicate(mesh, a))
    return jax.jit(fn)(*placed)


def sharded_batch_fn(mesh: Mesh, fn: Callable) -> Callable:
    """Wrap a jittable batch function ``fn((M, ...)) -> (M,) or (M, k)``
    so every call runs with its leading (sample) axis sharded over the
    mesh — the data-parallel *construction-time* evaluation of SURVEY
    §2.6: the M x d probe batches that the TT-cross feeds to the user
    density (amen_cross_s.m:704-760) and the DIRT ratio pushes
    (tt_dirt_approx.m:463-479) fan out across chips.

    The wrapper pads M up to a multiple of the mesh size (by repeating
    the first row — results for the pad lanes are discarded), so any
    batch size works.  Closure state (TT cores, the DIRT stack, data)
    is tiny and replicated by XLA.  Returns host numpy.
    """
    ndev = int(np.prod(mesh.devices.shape))
    jfn = jax.jit(fn)

    def wrapped(x):
        x = jnp.asarray(x)
        m = x.shape[0]
        mpad = -(-m // ndev) * ndev
        if mpad != m:
            pad = jnp.broadcast_to(x[:1], (mpad - m,) + x.shape[1:])
            x = jnp.concatenate([x, pad], axis=0)
        xs = shard_samples(mesh, x)
        out = jfn(xs)
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[:m], out)

    return wrapped
