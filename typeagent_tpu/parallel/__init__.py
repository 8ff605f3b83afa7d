"""Multi-chip scaling: device meshes + row-sharded distributed search.

The reference has no distributed runtime (SURVEY.md §2.11). Here the
fragment axis (embedding rows) shards across a `jax.sharding.Mesh`:
per-shard fused top-k, then a k-small all-gather merge over ICI, with a
second mesh axis for data-parallel query batches.
"""

from .mesh import create_mesh, default_mesh
from .sharded import ShardedVectorStore, make_sharded_topk

__all__ = ["create_mesh", "default_mesh", "ShardedVectorStore", "make_sharded_topk"]
