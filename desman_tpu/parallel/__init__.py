"""Multi-device execution: chain x position sharding over a TPU mesh."""

from .mesh import make_mesh, shard_counts, shard_keys
from .sharded import run_chains_sharded

__all__ = ["make_mesh", "shard_counts", "shard_keys", "run_chains_sharded"]
