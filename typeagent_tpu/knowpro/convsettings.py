"""Conversation settings tree (parity: reference knowpro/convsettings.py).

All index settings share one embedding model (one shared cache / device
buffer pool). Defaults: related-terms min_score 0.85 / max 50 matches,
message-text min_score 0.70, extraction concurrency 4, auto-extract on.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..models.embeddings import IEmbeddingModel
from ..models.retry import AsyncRetrier
from ..vectorstore import TextEmbeddingIndexSettings
from .interfaces import IKnowledgeExtractor, IStorageProvider

DEFAULT_RELATED_TERM_MIN_SCORE = 0.85
DEFAULT_MESSAGE_TEXT_MIN_SCORE = 0.7


@dataclass
class MessageTextIndexSettings:
    embedding_index_settings: TextEmbeddingIndexSettings


@dataclass
class RelatedTermIndexSettings:
    embedding_index_settings: TextEmbeddingIndexSettings


@dataclass
class SemanticRefIndexSettings:
    concurrency: int
    auto_extract_knowledge: bool
    knowledge_extractor: IKnowledgeExtractor | None = None


class ConversationSettings:
    """Settings for conversation processing and indexing."""

    def __init__(
        self,
        model: IEmbeddingModel | None = None,
        storage_provider: IStorageProvider | None = None,
        *,
        chat_retrier: AsyncRetrier | None = None,
        embed_retrier: AsyncRetrier | None = None,
    ):
        self.chat_retrier = chat_retrier
        self.embed_retrier = embed_retrier

        if model is None:
            from ..models.adapters import create_embedding_model

            model = create_embedding_model(retrier=embed_retrier)
        self.embedding_model = model
        min_score = DEFAULT_RELATED_TERM_MIN_SCORE
        self.related_term_index_settings = RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=min_score, max_matches=50)
        )
        self.thread_settings = TextEmbeddingIndexSettings(model, min_score=min_score)
        self.message_text_index_settings = MessageTextIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=DEFAULT_MESSAGE_TEXT_MIN_SCORE)
        )
        self.semantic_ref_index_settings = SemanticRefIndexSettings(
            concurrency=4,
            auto_extract_knowledge=True,
        )
        self._storage_provider: IStorageProvider | None = storage_provider

    @property
    def storage_provider(self) -> IStorageProvider:
        if self._storage_provider is None:
            raise RuntimeError(
                "Storage provider not initialized. Use await "
                "ConversationSettings.get_storage_provider() or provide "
                "storage_provider in the constructor."
            )
        return self._storage_provider

    @storage_provider.setter
    def storage_provider(self, value: IStorageProvider) -> None:
        self._storage_provider = value

    async def get_storage_provider(self) -> IStorageProvider:
        if self._storage_provider is None:
            from ..storage.memory import MemoryStorageProvider

            self._storage_provider = MemoryStorageProvider(
                message_text_settings=self.message_text_index_settings,
                related_terms_settings=self.related_term_index_settings,
            )
        return self._storage_provider
