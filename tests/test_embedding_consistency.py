"""Embedding-size/model consistency across database reopen.

Reference parity: /root/reference/tests/test_embedding_consistency.py —
same-size reopen works, empty DB accepts any size, cross-table size skew
raises at open, and adding mismatched-size embeddings to a populated DB
raises before corrupting the index.
"""

import sqlite3

import numpy as np
import pytest

from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.factory import create_conversation
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.storage.sqlite.provider import SqliteStorageProvider
from typeagent_tpu.storage.sqlite.schema import serialize_embedding


def settings_with_dim(dim: int) -> ConversationSettings:
    settings = ConversationSettings(model=create_test_embedding_model(dim))
    settings.semantic_ref_index_settings.auto_extract_knowledge = False
    return settings


def msg(text: str, speaker: str) -> ConversationMessage:
    return ConversationMessage(
        text_chunks=[text], metadata=ConversationMessageMeta(speaker=speaker)
    )


def reopen_provider(db_path: str, settings: ConversationSettings):
    return SqliteStorageProvider(
        db_path=db_path,
        message_type=ConversationMessage,
        message_text_index_settings=settings.message_text_index_settings,
        related_term_index_settings=settings.related_term_index_settings,
    )


async def test_same_embedding_size_reopens_cleanly(tmp_path):
    db_path = str(tmp_path / "same.db")
    conv = await create_conversation(
        db_path, ConversationMessage, settings=settings_with_dim(3)
    )
    await conv.add_messages_with_indexing([msg("Hello world", "Alice")])
    await conv.storage_provider.close()

    provider = reopen_provider(db_path, settings_with_dim(3))
    assert await provider.messages.size() == 1
    await provider.close()


async def test_empty_db_accepts_any_size(tmp_path):
    db_path = str(tmp_path / "empty.db")
    conv = await create_conversation(
        db_path, ConversationMessage, settings=settings_with_dim(3)
    )
    await conv.storage_provider.close()

    # Never ingested: a different embedding size opens without complaint.
    provider = reopen_provider(db_path, settings_with_dim(5))
    assert await provider.messages.size() == 0
    await provider.close()


async def test_cross_table_size_skew_raises_at_open(tmp_path):
    db_path = str(tmp_path / "skew.db")
    conv = await create_conversation(
        db_path, ConversationMessage, settings=settings_with_dim(3)
    )
    await conv.add_messages_with_indexing([msg("seed row", "Alice")])
    await conv.storage_provider.close()

    # Corrupt: hand-insert a related-terms embedding of a different size.
    db = sqlite3.connect(db_path)
    db.execute(
        "INSERT INTO RelatedTermsFuzzy (term, term_embedding) VALUES (?, ?)",
        ("hello", serialize_embedding(np.arange(5, dtype=np.float32))),
    )
    db.commit()
    db.close()

    with pytest.raises(ValueError, match="Embedding size mismatch"):
        reopen_provider(db_path, settings_with_dim(3))


async def test_cross_table_skew_on_unpopulated_db_raises_at_open(tmp_path):
    """The provider's LIMIT-1 cross-table check (message vs related sizes)."""
    db_path = str(tmp_path / "xtable.db")
    conv = await create_conversation(
        db_path, ConversationMessage, settings=settings_with_dim(3)
    )
    await conv.storage_provider.close()

    db = sqlite3.connect(db_path)  # FKs off on a raw connection
    db.execute(
        "INSERT INTO MessageTextIndex (msg_id, chunk_ordinal, embedding, "
        "index_position) VALUES (0, 0, ?, 0)",
        (serialize_embedding(np.arange(3, dtype=np.float32)),),
    )
    db.execute(
        "INSERT INTO RelatedTermsFuzzy (term, term_embedding) VALUES (?, ?)",
        ("hello", serialize_embedding(np.arange(5, dtype=np.float32))),
    )
    db.commit()
    db.close()

    with pytest.raises(ValueError, match="Embedding size mismatch"):
        reopen_provider(db_path, settings_with_dim(3))


async def test_adding_mismatched_size_raises_not_corrupts(tmp_path):
    db_path = str(tmp_path / "mismatch.db")
    conv = await create_conversation(
        db_path, ConversationMessage, settings=settings_with_dim(3)
    )
    await conv.add_messages_with_indexing([msg("Hello world", "Alice")])
    await conv.storage_provider.close()

    conv2 = await create_conversation(
        db_path, ConversationMessage, settings=settings_with_dim(5)
    )
    with pytest.raises(ValueError, match="Embedding size mismatch"):
        await conv2.add_messages_with_indexing([msg("Goodbye world", "Bob")])
    await conv2.storage_provider.close()

    # The failed add must not have persisted a half-indexed message.
    provider = reopen_provider(db_path, settings_with_dim(3))
    assert await provider.messages.size() == 1
    await provider.close()
