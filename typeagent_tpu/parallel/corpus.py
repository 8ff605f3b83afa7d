"""Multi-conversation corpus store: many conversations, one sharded matrix.

BASELINE.json config #5: a store holding millions of fragments across many
conversations, sharded over a mesh. All conversations' chunk embeddings live
in ONE row-sharded device matrix; each conversation owns contiguous row
segments. Search can target one conversation, a set, or the whole corpus —
per-conversation filtering happens on device via segment masks, so a scoped
search costs the same fused kernel as a global one.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

import numpy as np


from .mesh import create_mesh

if TYPE_CHECKING:
    import jax
    from jax.sharding import Mesh
from .sharded import ShardedVectorStore

__all__ = ["CorpusVectorStore", "CorpusHit"]


@dataclass
class CorpusHit:
    conversation: str
    local_ordinal: int  # fragment ordinal within the conversation
    global_ordinal: int
    score: float


@dataclass
class _Segment:
    conversation: str
    start: int  # global row start
    count: int
    local_base: int  # conversation-local ordinal of the segment's first row


class CorpusVectorStore:
    """Append-only multi-tenant fragment store over a sharded device matrix."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh | None = None,
        dtype: jax.typing.DTypeLike | None = None,
        search_mode: str = "exact",
    ):
        import jax.numpy as jnp

        self.mesh = mesh or create_mesh()
        # search_mode="approx": global searches ride per-shard approx_max_k;
        # search_mode="ivf": global searches ride the per-shard IVF snapshot
        # once build_ivf() has run (exact until then). Conversation-scoped
        # searches stay exact either way (masked full scan).
        self._store = ShardedVectorStore(
            self.mesh, dim, dtype=dtype or jnp.float32, search_mode=search_mode
        )
        self._segments: list[_Segment] = []  # ordered by global start
        self._local_counts: dict[str, int] = {}

    def __len__(self) -> int:
        return len(self._store)

    @property
    def conversations(self) -> list[str]:
        return list(self._local_counts)

    def count_for(self, conversation: str) -> int:
        return self._local_counts.get(conversation, 0)

    def append(self, conversation: str, rows: np.ndarray) -> None:
        """Append fragment embeddings for a conversation.

        Rows are unit-normalized here (as the reference's
        VectorBase.add_embedding does) so the (cos+1)/2 score stays in [0, 1]
        regardless of the caller's embedding scale.
        """
        rows = np.asarray(rows, dtype=np.float32)
        if rows.ndim != 2 or rows.shape[0] == 0:
            return
        norms = np.linalg.norm(rows, axis=1, keepdims=True)
        rows = rows / np.where(norms > 0, norms, 1.0)
        self._append_segment(conversation, rows.shape[0], self._store.append, rows)

    def reserve(self, n_rows: int) -> None:
        """Pre-size the sharded buffer for a known corpus size."""
        self._store.reserve(n_rows)

    def build_ivf(self, **build_kwargs: Any) -> None:
        """Snapshot the corpus into per-shard IVF indexes (parallel/ivf.py).

        Global searches on a ``search_mode="ivf"`` corpus then ride the
        learned-bucket engine (rows appended later are found via an exact
        suffix scan until the next build); scoped searches stay exact.
        """
        self._store.build_ivf(**build_kwargs)

    def append_device(self, conversation: str, rows: "jax.Array | np.ndarray") -> None:
        """Bulk-adopt device-resident rows for a conversation (normalized on
        device; no host round trip — the 10M-fragment ingest path)."""
        import jax.numpy as jnp

        if rows.ndim != 2 or rows.shape[0] == 0:
            return
        norms = jnp.linalg.norm(rows.astype(jnp.float32), axis=1, keepdims=True)
        unit = rows / jnp.where(norms > 0, norms, 1.0)
        self._append_segment(
            conversation, rows.shape[0], self._store.append_device, unit
        )

    def _append_segment(self, conversation: str, n: int, store_append, rows):
        """Shared segment/local-count bookkeeping around a store append."""
        start = len(self._store)
        local_base = self._local_counts.get(conversation, 0)
        store_append(rows)
        self._segments.append(_Segment(conversation, start, n, local_base))
        self._local_counts[conversation] = local_base + n

    def _resolve(self, global_ordinal: int) -> tuple[str, int]:
        starts = [s.start for s in self._segments]
        idx = bisect.bisect_right(starts, global_ordinal) - 1
        segment = self._segments[idx]
        return (
            segment.conversation,
            segment.local_base + (global_ordinal - segment.start),
        )

    def _segment_intervals(self, wanted: set[str]) -> np.ndarray:
        """[S, 2] (start, stop) table of the wanted conversations' segments —
        O(segments) host work; the row mask derives from it on device
        (a host-built bool mask would be O(n_rows) build + transfer per
        query batch: ~10 MB at the documented 10M-fragment scale)."""
        spans: list[tuple[int, int]] = []
        for seg in self._segments:
            if seg.conversation in wanted:
                start, stop = seg.start, seg.start + seg.count
                if spans and spans[-1][1] == start:  # merge adjacent
                    spans[-1] = (spans[-1][0], stop)
                else:
                    spans.append((start, stop))
        return np.asarray(spans, dtype=np.int32).reshape(-1, 2)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        conversations: list[str] | None = None,
        min_score: float = 0.0,
    ) -> list[list[CorpusHit]]:
        """Batched corpus search, optionally scoped to conversations.

        Scoped search is EXACT: the target conversations' row segments become
        a device-side mask sharded with the matrix, so a scoped search runs
        the same fused SPMD scan as a global one — a small conversation's best
        matches are never shadowed by other conversations' winners.

        Queries are unit-normalized here, mirroring append(), so the
        (cos+1)/2 score stays meaningful for any embedding scale.
        """
        queries = np.asarray(queries, dtype=np.float32)
        norms = np.linalg.norm(queries, axis=1, keepdims=True)
        queries = queries / np.where(norms > 0, norms, 1.0)
        if conversations is None:
            raw = self._store.search(queries, k, min_score)
        else:
            intervals = self._segment_intervals(set(conversations))
            if intervals.size == 0:
                return [[] for _ in range(queries.shape[0])]
            raw = self._store.search_intervals(queries, intervals, k, min_score)
        results: list[list[CorpusHit]] = []
        for per_query in raw:
            hits: list[CorpusHit] = []
            for global_ordinal, score in per_query:
                conversation, local = self._resolve(global_ordinal)
                hits.append(CorpusHit(conversation, local, global_ordinal, score))
            results.append(hits)
        return results
