"""Conversation-metadata matrix over the sqlite (and memory) providers.

Reference parity: /root/reference/tests/test_conversation_metadata.py —
timestamp seeding and partial updates, db version, per-db isolation,
single-row-per-key invariant, unicode/long name tags, reopen persistence,
and updated_at advancing on add_messages.
"""

from datetime import datetime, timedelta, timezone

from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.factory import create_conversation
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.storage.sqlite.provider import SqliteStorageProvider
from typeagent_tpu.storage.sqlite.schema import CONVERSATION_SCHEMA_VERSION


def make_settings() -> ConversationSettings:
    settings = ConversationSettings(model=create_test_embedding_model(3))
    settings.semantic_ref_index_settings.auto_extract_knowledge = False
    return settings


def make_provider(db_path: str) -> SqliteStorageProvider:
    settings = make_settings()
    return SqliteStorageProvider(
        db_path=db_path,
        message_type=ConversationMessage,
        message_text_index_settings=settings.message_text_index_settings,
        related_term_index_settings=settings.related_term_index_settings,
    )


def msg(text: str) -> ConversationMessage:
    return ConversationMessage(
        text_chunks=[text], metadata=ConversationMessageMeta(speaker="Alice")
    )


T1 = datetime(2024, 1, 1, 10, 0, 0, tzinfo=timezone.utc)
T2 = datetime(2024, 6, 15, 12, 30, 0, tzinfo=timezone.utc)


# ---------------------------------------------------------------------------
# Seeding & partial updates
# ---------------------------------------------------------------------------


async def test_fresh_db_has_empty_metadata(tmp_path):
    p = make_provider(str(tmp_path / "fresh.db"))
    meta = await p.get_conversation_metadata()
    assert meta.name_tag is None and meta.created_at is None
    await p.close()


async def test_update_timestamps_seeds_standard_keys(tmp_path):
    p = make_provider(str(tmp_path / "seed.db"))
    await p.update_conversation_timestamps(created_at=T1, updated_at=T1)
    meta = await p.get_conversation_metadata()
    assert meta.name_tag == "conversation"  # default seeded
    assert meta.schema_version == CONVERSATION_SCHEMA_VERSION
    assert meta.embedding_model == "test"
    assert meta.created_at == T1 and meta.updated_at == T1
    await p.close()


async def test_update_timestamps_partial_created_at_only(tmp_path):
    p = make_provider(str(tmp_path / "partial.db"))
    await p.update_conversation_timestamps(created_at=T1, updated_at=T1)
    await p.update_conversation_timestamps(created_at=T2)
    meta = await p.get_conversation_metadata()
    assert meta.created_at == T2
    assert meta.updated_at == T1  # untouched
    await p.close()


async def test_update_timestamps_updated_at_only_preserves_created(tmp_path):
    p = make_provider(str(tmp_path / "upd.db"))
    await p.update_conversation_timestamps(created_at=T1, updated_at=T1)
    await p.update_conversation_timestamps(updated_at=T2)
    meta = await p.get_conversation_metadata()
    assert meta.created_at == T1
    assert meta.updated_at == T2
    await p.close()


async def test_update_timestamps_no_params_is_noop_when_populated(tmp_path):
    p = make_provider(str(tmp_path / "noop.db"))
    await p.update_conversation_timestamps(created_at=T1, updated_at=T1)
    await p.update_conversation_timestamps()
    meta = await p.get_conversation_metadata()
    assert meta.created_at == T1 and meta.updated_at == T1
    await p.close()


async def test_single_value_per_key_after_repeated_updates(tmp_path):
    """Repeated updates replace, never duplicate, metadata rows."""
    p = make_provider(str(tmp_path / "single.db"))
    for i in range(5):
        await p.update_conversation_timestamps(updated_at=T1 + timedelta(days=i))
    cursor = p.db.cursor()
    cursor.execute(
        "SELECT COUNT(*) FROM ConversationMetadata WHERE key = 'updated_at'"
    )
    assert cursor.fetchone()[0] == 1
    meta = await p.get_conversation_metadata()
    assert meta.updated_at == T1 + timedelta(days=4)
    await p.close()


# ---------------------------------------------------------------------------
# DB version / isolation / persistence
# ---------------------------------------------------------------------------


async def test_get_db_version(tmp_path):
    p = make_provider(str(tmp_path / "ver.db"))
    assert p.get_db_version() == CONVERSATION_SCHEMA_VERSION
    await p.close()


async def test_metadata_isolated_per_db(tmp_path):
    pa = make_provider(str(tmp_path / "a.db"))
    pb = make_provider(str(tmp_path / "b.db"))
    await pa.update_conversation_timestamps(created_at=T1, updated_at=T1)
    await pb.update_conversation_timestamps(created_at=T2, updated_at=T2)
    assert (await pa.get_conversation_metadata()).created_at == T1
    assert (await pb.get_conversation_metadata()).created_at == T2
    await pa.close()
    await pb.close()


async def test_metadata_persists_across_reopen(tmp_path):
    db_path = str(tmp_path / "persist.db")
    p = make_provider(db_path)
    await p.update_conversation_timestamps(created_at=T1, updated_at=T2)
    await p.set_conversation_metadata(project="tpu", name_tag="my conv")
    await p.close()

    p2 = make_provider(db_path)
    meta = await p2.get_conversation_metadata()
    assert meta.created_at == T1 and meta.updated_at == T2
    assert meta.name_tag == "my conv"
    assert meta.extra == {"project": "tpu"}
    await p2.close()


async def test_unicode_and_special_char_name_tag(tmp_path):
    db_path = str(tmp_path / "uni.db")
    p = make_provider(db_path)
    name = "Gespräch über Musik — 音楽の話 🎵 'quoted; DROP TABLE--'"
    await p.set_conversation_metadata(name_tag=name)
    await p.close()
    p2 = make_provider(db_path)
    assert (await p2.get_conversation_metadata()).name_tag == name
    await p2.close()


async def test_very_long_name_tag(tmp_path):
    p = make_provider(str(tmp_path / "long.db"))
    name = "x" * 10_000
    await p.set_conversation_metadata(name_tag=name)
    assert (await p.get_conversation_metadata()).name_tag == name
    await p.close()


async def test_tags_multi_value_round_trip(tmp_path):
    p = make_provider(str(tmp_path / "tags.db"))
    await p.set_conversation_metadata(tag=["alpha", "beta"])
    meta = await p.get_conversation_metadata()
    assert meta.tags == ["alpha", "beta"]
    # None deletes the key
    await p.set_conversation_metadata(tag=None)
    assert (await p.get_conversation_metadata()).tags is None
    await p.close()


# ---------------------------------------------------------------------------
# Integration: conversations stamp metadata
# ---------------------------------------------------------------------------


async def test_create_conversation_seeds_metadata(tmp_path):
    conv = await create_conversation(
        str(tmp_path / "conv.db"),
        ConversationMessage,
        name="my podcast",
        tags=["pod"],
        settings=make_settings(),
        extras={"source": "unit-test"},
    )
    await conv.add_messages_with_indexing([msg("hello")])
    meta = await conv.storage_provider.get_conversation_metadata()
    assert meta.name_tag == "my podcast"
    assert meta.tags == ["pod"]
    assert meta.extra == {"source": "unit-test"}
    assert meta.embedding_model == "test"
    assert meta.created_at is not None and meta.updated_at is not None
    await conv.storage_provider.close()


async def test_updated_at_advances_on_add_messages(tmp_path):
    conv = await create_conversation(
        str(tmp_path / "adv.db"), ConversationMessage, settings=make_settings()
    )
    await conv.add_messages_with_indexing([msg("first")])
    first = (await conv.storage_provider.get_conversation_metadata()).updated_at
    created = (await conv.storage_provider.get_conversation_metadata()).created_at
    await conv.add_messages_with_indexing([msg("second")])
    meta = await conv.storage_provider.get_conversation_metadata()
    assert meta.updated_at >= first  # advances (same-tick clock tolerated)
    assert meta.updated_at > created or meta.updated_at >= first
    assert meta.created_at == created  # creation time never rewritten
    await conv.storage_provider.close()


async def test_memory_provider_tracks_timestamps_in_ram(tmp_path):
    conv = await create_conversation(
        None, ConversationMessage, settings=make_settings()
    )
    await conv.add_messages_with_indexing([msg("hello")])
    meta = await conv.storage_provider.get_conversation_metadata()
    assert meta.updated_at is not None


async def test_embedding_model_mismatch_raises(tmp_path):
    """Opening a DB with a different embedding model than stored must fail
    loudly (silent dimension mismatch corrupts scoring)."""
    import pytest

    from typeagent_tpu.knowpro.convsettings import (
        MessageTextIndexSettings,
        RelatedTermIndexSettings,
    )
    from typeagent_tpu.models.adapters import create_embedding_model
    from typeagent_tpu.storage.sqlite.provider import SqliteStorageProvider
    from typeagent_tpu.knowpro.universal_message import ConversationMessage
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings

    db = str(tmp_path / "mm.db")

    class _RenamedModel:
        """Proxy that overrides model_name (FakeEmbedder's is read-only)."""

        def __init__(self, inner, name):
            self._inner = inner
            self.model_name = name

        def __getattr__(self, attr):
            return getattr(self._inner, attr)

    def settings_for(spec, name):
        base = TextEmbeddingIndexSettings(
            embedding_model=create_embedding_model(spec), min_score=0.0
        )
        base.embedding_model = _RenamedModel(base.embedding_model, name)
        return (
            MessageTextIndexSettings(base),
            RelatedTermIndexSettings(base),
        )

    mt, rt = settings_for("test:16", "model-alpha")
    provider = SqliteStorageProvider(
        db, ConversationMessage, None,
        message_text_index_settings=mt,
        related_term_index_settings=rt,
    )
    async with provider:
        pass  # seeds metadata (embedding_name = model-alpha)
    await provider.close()

    mt2, rt2 = settings_for("test:16", "model-beta")
    with pytest.raises(ValueError, match="does not match"):
        SqliteStorageProvider(
            db, ConversationMessage, None,
            message_text_index_settings=mt2,
            related_term_index_settings=rt2,
        )


async def test_empty_string_timestamp_values_survive_roundtrip(tmp_path):
    """Oddball metadata values (empty strings) must not crash readback."""
    from typeagent_tpu.knowpro.universal_message import ConversationMessage
    from typeagent_tpu.storage.sqlite.provider import SqliteStorageProvider

    db = str(tmp_path / "odd.db")
    provider = SqliteStorageProvider(db, ConversationMessage, None)
    async with provider:
        await provider.set_conversation_metadata(custom="", other="x")
    meta = await provider.get_conversation_metadata()
    assert meta.extra.get("custom") == ""
    assert meta.extra.get("other") == "x"
    await provider.close()


async def test_metadata_shared_access_two_handles(tmp_path):
    """Two providers on the same DB file observe each other's metadata
    writes (WAL mode)."""
    from typeagent_tpu.knowpro.universal_message import ConversationMessage
    from typeagent_tpu.storage.sqlite.provider import SqliteStorageProvider

    db = str(tmp_path / "shared.db")
    a = SqliteStorageProvider(db, ConversationMessage, None)
    async with a:
        await a.set_conversation_metadata(origin="writer-a")
    b = SqliteStorageProvider(db, ConversationMessage, None)
    meta = await b.get_conversation_metadata()
    assert meta.extra.get("origin") == "writer-a"
    await a.close()
    await b.close()
