"""List-backed append-only collections (parity: storage/memory/collections.py).

Message appends auto-feed the message text index (so embeddings land on
device as messages arrive)."""

from __future__ import annotations

from typing import Iterable

import numpy as np

from ...knowpro.interfaces import (
    ICollection,
    IMessage,
    IMessageTextIndex,
    MessageOrdinal,
    SemanticRef,
    SemanticRefMetadata,
    SemanticRefOrdinal,
)


class MemoryCollection[T, TOrdinal: int](ICollection[T, TOrdinal]):
    """A generic in-memory (non-persistent) append-only collection."""

    def __init__(self, items: list[T] | None = None):
        self.items: list[T] = items or []

    async def size(self) -> int:
        return len(self.items)

    def __aiter__(self):
        return self._async_iterator()

    async def _async_iterator(self):
        for item in self.items:
            yield item

    async def get_item(self, arg: int) -> T:
        return self.items[arg]

    async def get_slice(self, start: int, stop: int) -> list[T]:
        return self.items[start:stop]

    async def get_multiple(self, arg: list[TOrdinal]) -> list[T]:
        size = len(self.items)
        if not all(0 <= i < size for i in arg):
            raise IndexError("One or more indices are out of bounds")
        return [self.items[ordinal] for ordinal in arg]

    @property
    def is_persistent(self) -> bool:
        return False

    async def append(self, item: T) -> None:
        self.items.append(item)

    async def extend(self, items: Iterable[T]) -> None:
        self.items.extend(items)


class MemorySemanticRefCollection(MemoryCollection[SemanticRef, SemanticRefOrdinal]):
    async def get_metadata_multiple(
        self, ordinals: list[SemanticRefOrdinal]
    ) -> list[SemanticRefMetadata]:
        return [
            SemanticRefMetadata(
                ordinal=o,
                range=self.items[o].range,
                knowledge_type=self.items[o].knowledge.knowledge_type,
            )
            for o in ordinals
        ]


class MemoryMessageCollection[TMessage: IMessage](
    MemoryCollection[TMessage, MessageOrdinal]
):
    def __init__(
        self,
        items: list[TMessage] | None = None,
        message_text_index: IMessageTextIndex[TMessage] | None = None,
    ):
        super().__init__(items)
        self.message_text_index = message_text_index

    async def append(self, item: TMessage) -> None:
        msg_id = len(self.items)
        self.items.append(item)
        if self.message_text_index is not None:
            await self.message_text_index.add_messages_starting_at(msg_id, [item])

    async def extend(
        self,
        items: Iterable[TMessage],
        chunk_embeddings: list[np.ndarray] | None = None,
        index_messages: bool = True,
    ) -> None:
        items_list = list(items)
        if not items_list:
            return
        start = len(self.items)
        self.items.extend(items_list)
        if index_messages and self.message_text_index is not None:
            if chunk_embeddings is not None:
                await self.message_text_index.add_messages_starting_at_with_embeddings(
                    start, items_list, chunk_embeddings
                )
            else:
                await self.message_text_index.add_messages_starting_at(
                    start, items_list
                )
