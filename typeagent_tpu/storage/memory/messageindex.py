"""Message text index: chunk embeddings on device, max-merged per message.

(Parity: reference storage/memory/messageindex.py — chunk scores merge to a
message's best chunk; default thresholds come from settings.)
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import numpy as np

from ...knowpro.convsettings import MessageTextIndexSettings
from ...knowpro.interfaces import (
    IConversation,
    IMessage,
    IMessageTextIndex,
    IStorageProvider,
    ITermToSemanticRefIndex,
    MessageOrdinal,
    MessageTextIndexData,
    ScoredMessageOrdinal,
    TextLocation,
)
from ...knowpro.textlocindex import ScoredTextLocation, TextToTextLocationIndex


async def build_message_index[
    TMessage: IMessage,
    TTermToSemanticRefIndex: ITermToSemanticRefIndex,
](
    conversation: IConversation[TMessage, TTermToSemanticRefIndex],
    storage_provider: IStorageProvider[TMessage],
) -> None:
    csi = conversation.secondary_indexes
    if csi is None:
        return
    if csi.message_index is None:
        csi.message_index = storage_provider.message_text_index
    all_messages = await conversation.messages.get_slice(
        0, await conversation.messages.size()
    )
    await csi.message_index.add_messages(all_messages)


class IMessageTextEmbeddingIndex(IMessageTextIndex):
    async def generate_embedding(self, text: str) -> np.ndarray: ...

    def lookup_by_embedding(
        self,
        text_embedding: np.ndarray,
        max_matches: int | None = None,
        threshold_score: float | None = None,
        predicate: Callable[[MessageOrdinal], bool] | None = None,
    ) -> list[ScoredMessageOrdinal]: ...

    def lookup_in_subset_by_embedding(
        self,
        text_embedding: np.ndarray,
        ordinals_to_search: list[MessageOrdinal],
        max_matches: int | None = None,
        threshold_score: float | None = None,
    ) -> list[ScoredMessageOrdinal]: ...


class MessageTextIndex(IMessageTextEmbeddingIndex):
    def __init__(self, settings: MessageTextIndexSettings):
        self.settings = settings
        self.text_location_index = TextToTextLocationIndex(
            settings.embedding_index_settings
        )
        # Highest message ordinal already indexed (-1 when empty). Used by
        # add_messages to skip messages indexed earlier by collection extends
        # (same dedupe the SQLite backend does via MAX(msg_id),
        # reference sqlite/messageindex.py:128-153).
        self._max_message_ordinal = -1

    async def size(self) -> int:
        return await self.text_location_index.size()

    async def is_empty(self) -> bool:
        return await self.text_location_index.is_empty()

    async def indexed_message_count(self) -> int:
        """Number of MESSAGES indexed so far (size() counts chunks)."""
        return self._max_message_ordinal + 1

    async def add_messages[TMessage: IMessage](
        self, messages: Iterable[TMessage]
    ) -> None:
        message_list = list(messages)
        if not message_list:
            return
        # Skip the prefix that collection extends already indexed.
        start_ordinal = self._max_message_ordinal + 1
        if start_ordinal < len(message_list):
            await self.add_messages_starting_at(
                start_ordinal, message_list[start_ordinal:]
            )

    async def add_messages_starting_at[TMessage: IMessage](
        self,
        start_message_ordinal: int,
        messages: list[TMessage],
    ) -> None:
        chunk_texts: list[str] = []
        for message in messages:
            chunk_texts.extend(message.text_chunks)
        chunk_embeddings = await self.text_location_index.generate_embeddings(
            chunk_texts, cache=False
        )
        await self.add_messages_starting_at_with_embeddings(
            start_message_ordinal, messages, chunk_embeddings
        )

    async def add_messages_starting_at_with_embeddings[TMessage: IMessage](
        self,
        start_message_ordinal: int,
        messages: list[TMessage],
        chunk_embeddings: list[np.ndarray],
    ) -> None:
        text_locations = [
            TextLocation(start_message_ordinal + idx, chunk_ord)
            for idx, message in enumerate(messages)
            for chunk_ord in range(len(message.text_chunks))
        ]
        if len(text_locations) != len(chunk_embeddings):
            raise ValueError(
                "messages and chunk_embeddings produced different chunk counts: "
                f"{len(text_locations)} != {len(chunk_embeddings)}"
            )
        await self.text_location_index.add_text_locations_with_embeddings(
            text_locations, chunk_embeddings
        )
        if text_locations:
            self._max_message_ordinal = max(
                self._max_message_ordinal,
                max(loc.message_ordinal for loc in text_locations),
            )

    async def lookup_messages(
        self,
        message_text: str,
        max_matches: int | None = None,
        threshold_score: float | None = None,
    ) -> list[ScoredMessageOrdinal]:
        defaults = self.settings.embedding_index_settings
        scored = await self.text_location_index.lookup_text(
            message_text,
            max_matches or defaults.max_matches,
            threshold_score or defaults.min_score,
        )
        return self.to_scored_message_ordinals(scored)

    async def lookup_messages_in_subset(
        self,
        message_text: str,
        ordinals_to_search: list[MessageOrdinal],
        max_matches: int | None = None,
        threshold_score: float | None = None,
    ) -> list[ScoredMessageOrdinal]:
        scored = await self.text_location_index.lookup_text_in_subset(
            message_text, ordinals_to_search, max_matches, threshold_score
        )
        return self.to_scored_message_ordinals(scored)

    async def generate_embedding(self, text: str) -> np.ndarray:
        return await self.text_location_index.generate_embedding(text)

    def lookup_by_embedding(
        self,
        text_embedding: np.ndarray,
        max_matches: int | None = None,
        threshold_score: float | None = None,
        predicate: Callable[[MessageOrdinal], bool] | None = None,
    ) -> list[ScoredMessageOrdinal]:
        scored = self.text_location_index.lookup_by_embedding(
            text_embedding, max_matches, threshold_score, predicate
        )
        return self.to_scored_message_ordinals(scored)

    def lookup_in_subset_by_embedding(
        self,
        text_embedding: np.ndarray,
        ordinals_to_search: list[MessageOrdinal],
        max_matches: int | None = None,
        threshold_score: float | None = None,
    ) -> list[ScoredMessageOrdinal]:
        scored = self.text_location_index.lookup_in_subset_by_embedding(
            text_embedding, ordinals_to_search, max_matches, threshold_score
        )
        return self.to_scored_message_ordinals(scored)

    def to_scored_message_ordinals(
        self, scored_locations: list[ScoredTextLocation]
    ) -> list[ScoredMessageOrdinal]:
        # Max-merge chunk scores into message scores.
        best: dict[MessageOrdinal, float] = {}
        for sl in scored_locations:
            ordinal = sl.text_location.message_ordinal
            prior = best.get(ordinal)
            if prior is None or sl.score > prior:
                best[ordinal] = sl.score
        ranked = sorted(best.items(), key=lambda kv: kv[1], reverse=True)
        return [ScoredMessageOrdinal(o, s) for o, s in ranked]

    async def serialize(self) -> MessageTextIndexData:
        return MessageTextIndexData(indexData=self.text_location_index.serialize())

    async def deserialize(self, data: MessageTextIndexData) -> None:
        index_data = data.get("indexData")
        if index_data is None:
            return
        self.text_location_index.deserialize(index_data)
        self._max_message_ordinal = max(
            (
                loc.message_ordinal
                for loc in self.text_location_index._text_locations
            ),
            default=-1,
        )
