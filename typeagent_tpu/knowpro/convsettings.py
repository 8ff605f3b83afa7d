"""Conversation settings tree (parity: reference knowpro/convsettings.py).

All index settings share one embedding model (one shared cache / device
buffer pool). Defaults: related-terms min_score 0.85 / max 50 matches,
message-text min_score 0.70, extraction concurrency 4, auto-extract on.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from jax.sharding import Mesh

from ..models.embeddings import IEmbeddingModel
from ..models.retry import AsyncRetrier
from ..vectorstore import TextEmbeddingIndexSettings
from .interfaces import IKnowledgeExtractor, IStorageProvider

DEFAULT_RELATED_TERM_MIN_SCORE = 0.85
DEFAULT_MESSAGE_TEXT_MIN_SCORE = 0.7
DEFAULT_RELATED_TERM_MAX_MATCHES = 50
DEFAULT_EXTRACTION_CONCURRENCY = 4


@dataclass
class MessageTextIndexSettings:
    """Index 4 (message text <-> chunk embeddings) knobs."""

    embedding_index_settings: TextEmbeddingIndexSettings


@dataclass
class RelatedTermIndexSettings:
    """Index 5 (related-terms fuzzy expansion) knobs."""

    embedding_index_settings: TextEmbeddingIndexSettings


@dataclass
class SemanticRefIndexSettings:
    """LLM knowledge-extraction knobs for index 1."""

    concurrency: int
    auto_extract_knowledge: bool
    knowledge_extractor: IKnowledgeExtractor | None = None


class ConversationSettings:
    """Settings for conversation processing and indexing.

    The storage provider is lazy: constructing settings never touches disk;
    `get_storage_provider()` materializes an in-memory provider on first use
    unless one was injected.
    """

    def __init__(
        self,
        model: IEmbeddingModel | None = None,
        storage_provider: IStorageProvider | None = None,
        *,
        chat_retrier: AsyncRetrier | None = None,
        embed_retrier: AsyncRetrier | None = None,
        mesh: Mesh | None = None,
        embedding_dtype: str = "float32",
        search_mode: str = "exact",
    ):
        self.chat_retrier = chat_retrier
        self.embed_retrier = embed_retrier
        self._storage_provider = storage_provider
        # Optional jax.sharding.Mesh: the conversation's embedding-backed
        # indexes (message text + related-terms fuzzy + threads) ride a
        # row-sharded multi-chip store instead of a single-chip buffer.
        self.mesh = mesh

        if model is None:
            from ..models.adapters import create_embedding_model

            model = create_embedding_model(retrier=embed_retrier)
        self.embedding_model = model

        def emb(min_score: float, max_matches: int | None = None):
            # search_mode="approx": embedding lookups ride approx_max_k
            # (the big-corpus serving mode; recall ~= recall_target).
            return TextEmbeddingIndexSettings(
                model,
                min_score=min_score,
                max_matches=max_matches,
                dtype=embedding_dtype,
                mesh=mesh,
                search_mode=search_mode,
            )

        self.related_term_index_settings = RelatedTermIndexSettings(
            emb(DEFAULT_RELATED_TERM_MIN_SCORE, DEFAULT_RELATED_TERM_MAX_MATCHES)
        )
        self.thread_settings = emb(DEFAULT_RELATED_TERM_MIN_SCORE)
        self.message_text_index_settings = MessageTextIndexSettings(
            emb(DEFAULT_MESSAGE_TEXT_MIN_SCORE)
        )
        self.semantic_ref_index_settings = SemanticRefIndexSettings(
            concurrency=DEFAULT_EXTRACTION_CONCURRENCY,
            auto_extract_knowledge=True,
        )

    @property
    def storage_provider(self) -> IStorageProvider:
        provider = self._storage_provider
        if provider is None:
            raise RuntimeError(
                "Storage provider not initialized. Use await "
                "ConversationSettings.get_storage_provider() or provide "
                "storage_provider in the constructor."
            )
        return provider

    @storage_provider.setter
    def storage_provider(self, value: IStorageProvider) -> None:
        self._storage_provider = value

    async def get_storage_provider(self) -> IStorageProvider:
        if self._storage_provider is not None:
            return self._storage_provider
        from ..storage.memory import MemoryStorageProvider

        provider = MemoryStorageProvider(
            message_text_settings=self.message_text_index_settings,
            related_terms_settings=self.related_term_index_settings,
        )
        self._storage_provider = provider
        return provider
