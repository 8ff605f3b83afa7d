"""Multi-chip scaling: device meshes + row-sharded distributed search.

The reference has no distributed runtime (SURVEY.md §2.11). Here the
fragment axis (embedding rows) shards across a `jax.sharding.Mesh`:
per-shard fused top-k, then a k-small all-gather merge over ICI, with a
second mesh axis for data-parallel query batches.
"""

from .mesh import create_mesh, default_mesh
from .sharded import ShardedVectorStore, make_sharded_topk


def __getattr__(name: str) -> object:
    # Lazy: conversation_corpus pulls in the knowpro stack.
    if name in ("ConversationCorpus", "CorpusMessageHit"):
        from . import conversation_corpus

        return getattr(conversation_corpus, name)
    if name in ("CorpusVectorStore", "CorpusHit"):
        from . import corpus

        return getattr(corpus, name)
    if name in (
        "save_sharded_store",
        "restore_sharded_store",
        "save_corpus",
        "restore_corpus",
        "save_vector_store",
        "restore_vector_store",
    ):
        from . import checkpoint

        return getattr(checkpoint, name)
    raise AttributeError(name)


__all__ = [
    "create_mesh",
    "default_mesh",
    "ShardedVectorStore",
    "make_sharded_topk",
    "ConversationCorpus",
    "CorpusMessageHit",
    "CorpusVectorStore",
    "CorpusHit",
    "save_sharded_store",
    "restore_sharded_store",
    "save_corpus",
    "restore_corpus",
    "save_vector_store",
    "restore_vector_store",
]
