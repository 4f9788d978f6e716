"""Multi-chip sharding of the sample axis over a TPU mesh."""

from .mesh import sample_mesh, shard_samples, sharded_call  # noqa: F401
