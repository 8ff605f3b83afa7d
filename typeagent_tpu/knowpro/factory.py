"""Factory for conversation objects (parity: reference knowpro/factory.py)."""

from __future__ import annotations

from ..storage.utils import create_storage_provider
from . import secindex
from .conversation_base import ConversationBase
from .convsettings import ConversationSettings
from .interfaces import ConversationMetadata, IMessage


async def create_conversation[TMessage: IMessage](
    dbname: str | None,
    message_type: type[TMessage],
    name: str = "",
    tags: list[str] | None = None,
    settings: ConversationSettings | None = None,
    extras: dict[str, str] | None = None,
) -> ConversationBase[TMessage]:
    """Create a fully initialized conversation (memory when dbname is None)."""
    if settings is None:
        settings = ConversationSettings()
        settings.semantic_ref_index_settings.auto_extract_knowledge = True

    metadata = ConversationMetadata(
        name_tag=name if name else None,
        tags=tags,
        extra=extras,
    )
    storage_provider = await create_storage_provider(
        message_text_settings=settings.message_text_index_settings,
        related_terms_settings=settings.related_term_index_settings,
        dbname=dbname,
        message_type=message_type,
        metadata=metadata,
    )
    settings.storage_provider = storage_provider

    conversation = ConversationBase(
        settings=settings,
        name=name,
        tags=tags if tags is not None else [],
    )
    conversation.storage_provider = storage_provider
    conversation.messages = storage_provider.messages
    conversation.semantic_refs = storage_provider.semantic_refs
    conversation.semantic_ref_index = storage_provider.semantic_ref_index
    conversation.secondary_indexes = secindex.ConversationSecondaryIndexes(
        storage_provider, settings.related_term_index_settings
    )
    return conversation
