"""Dual-backend parity: the same behavioral assertions run against memory and
SQLite providers (reference mechanism: tests/test_storage_providers_unified.py).
"""

import os
import tempfile
from datetime import datetime, timezone

import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.convsettings import (
    MessageTextIndexSettings,
    RelatedTermIndexSettings,
)
from typeagent_tpu.knowpro.interfaces import (
    DateRange,
    SemanticRef,
    Term,
    TextLocation,
    TextRange,
)
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.storage.memory import MemoryStorageProvider
from typeagent_tpu.storage.sqlite import SqliteStorageProvider
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings

DIM = 16


def _settings():
    model = create_test_embedding_model(DIM)
    return (
        MessageTextIndexSettings(TextEmbeddingIndexSettings(model, min_score=0.0)),
        RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0, max_matches=10)
        ),
    )


def make_provider(backend: str, db_path: str | None = None):
    msg_settings, rel_settings = _settings()
    if backend == "memory":
        return MemoryStorageProvider(msg_settings, rel_settings)
    return SqliteStorageProvider(
        db_path=db_path or ":memory:",
        message_type=ConversationMessage,
        message_text_index_settings=msg_settings,
        related_term_index_settings=rel_settings,
    )


@pytest.fixture(params=["memory", "sqlite"])
def backend(request):
    return request.param


def msg(text, speaker="Alice", ts=None, tags=()):
    return ConversationMessage(
        text_chunks=[text],
        metadata=ConversationMessageMeta(speaker, ["Bob"]),
        timestamp=ts,
        tags=list(tags),
    )


async def test_message_collection_roundtrip(backend):
    p = make_provider(backend)
    messages = [
        msg("hello there", ts="2024-01-01T10:00:00Z", tags=["greeting"]),
        msg("goodbye now", ts="2024-01-02T10:00:00Z"),
    ]
    async with p:
        await p.messages.extend(messages)
    assert await p.messages.size() == 2
    m0 = await p.messages.get_item(0)
    assert m0.text_chunks == ["hello there"]
    assert m0.metadata.speaker == "Alice"
    assert m0.metadata.recipients == ["Bob"]
    assert m0.timestamp == "2024-01-01T10:00:00Z"
    assert m0.tags == ["greeting"]
    assert [m.text_chunks[0] async for m in p.messages] == [
        "hello there",
        "goodbye now",
    ]
    both = await p.messages.get_multiple([1, 0])
    assert [m.text_chunks[0] for m in both] == ["goodbye now", "hello there"]
    sliced = await p.messages.get_slice(0, 1)
    assert len(sliced) == 1
    with pytest.raises(IndexError):
        await p.messages.get_multiple([5])


async def test_semref_collection_roundtrip(backend):
    p = make_provider(backend)
    entity = kplib.ConcreteEntity(
        "Bach", ["person"], facets=[kplib.Facet("era", "baroque")]
    )
    action = kplib.Action(
        verbs=["compose"], verb_tense="past", subject_entity_name="Bach"
    )
    refs = [
        SemanticRef(0, TextRange(TextLocation(0, 0)), entity),
        SemanticRef(1, TextRange(TextLocation(0, 0), TextLocation(2, 0)), action),
    ]
    async with p:
        await p.semantic_refs.extend(refs)
    assert await p.semantic_refs.size() == 2
    r0 = await p.semantic_refs.get_item(0)
    assert r0.knowledge.name == "Bach"
    assert r0.knowledge.facets[0].value == "baroque"
    r1 = await p.semantic_refs.get_item(1)
    assert r1.knowledge.verbs == ["compose"]
    assert r1.range.end.message_ordinal == 2
    meta = await p.semantic_refs.get_metadata_multiple([1, 0])
    assert meta[0].knowledge_type == "action"
    assert meta[1].knowledge_type == "entity"
    assert meta[0].range.end.message_ordinal == 2


async def _add_dummy_semrefs(p, n):
    refs = [
        SemanticRef(
            i, TextRange(TextLocation(0, 0)), kplib.ConcreteEntity(f"e{i}", ["x"])
        )
        for i in range(n)
    ]
    await p.semantic_refs.extend(refs)


async def test_semref_index_parity(backend):
    p = make_provider(backend)
    async with p:
        await _add_dummy_semrefs(p, 3)
        await p.semantic_ref_index.add_term("Bach", 0)
        await p.semantic_ref_index.add_terms_batch([("  Piano  Music ", 1), ("BACH", 2)])
    postings = await p.semantic_ref_index.lookup_term("bach")
    assert sorted(x.semantic_ref_ordinal for x in postings) == [0, 2]
    # sqlite normalizes whitespace; memory is lowercase-only — lookup with
    # the canonical form works on both
    postings = await p.semantic_ref_index.lookup_term("piano music")
    if backend == "sqlite":
        assert [x.semantic_ref_ordinal for x in postings] == [1]
    assert await p.semantic_ref_index.lookup_term("zzz") == []
    async with p:
        await p.semantic_ref_index.remove_term("bach", 0)
    postings = await p.semantic_ref_index.lookup_term("Bach")
    assert [x.semantic_ref_ordinal for x in postings] == [2]
    data = await p.semantic_ref_index.serialize()
    assert any(item["term"] == "bach" for item in data["items"])


async def test_property_index_parity(backend):
    p = make_provider(backend)
    async with p:
        await _add_dummy_semrefs(p, 2)
        await p.property_index.add_property("name", "Gatsby", 0)
        await p.property_index.add_properties_batch(
            [("type", "Book", 0), ("verb", "write publish", 1)]
        )
    refs = await p.property_index.lookup_property("name", "gatsby")
    assert refs and refs[0].semantic_ref_ordinal == 0
    refs = await p.property_index.lookup_property("TYPE", "book")
    assert refs and refs[0].semantic_ref_ordinal == 0
    assert await p.property_index.lookup_property("name", "nothere") is None
    assert await p.property_index.size() == 3
    async with p:
        await p.property_index.remove_all_for_semref(0)
    assert await p.property_index.lookup_property("name", "gatsby") is None


async def test_timestamp_index_parity(backend):
    p = make_provider(backend)
    messages = [msg(f"m{i}") for i in range(3)]
    async with p:
        await p.messages.extend(messages)
        await p.timestamp_index.add_timestamps(
            [
                (0, "2024-01-01T10:00:00Z"),
                (1, "2024-01-02T10:00:00Z"),
                (2, "2024-01-03T10:00:00Z"),
            ]
        )
    assert await p.timestamp_index.size() == 3
    hits = await p.timestamp_index.lookup_range(
        DateRange(
            datetime(2024, 1, 1, tzinfo=timezone.utc),
            datetime(2024, 1, 3, tzinfo=timezone.utc),
        )
    )
    assert [h.range.start.message_ordinal for h in hits] == [0, 1]
    # point query
    hits = await p.timestamp_index.lookup_range(
        DateRange(datetime(2024, 1, 2, 10, tzinfo=timezone.utc))
    )
    assert [h.range.start.message_ordinal for h in hits] == [1]


async def test_message_text_index_parity(backend):
    p = make_provider(backend)
    async with p:
        await p.messages.extend(
            [msg("the quick brown fox"), msg("lazy dogs sleep all day")]
        )
    assert await p.message_text_index.size() == 2
    hits = await p.message_text_index.lookup_messages("the quick brown fox", 1)
    assert hits[0].message_ordinal == 0
    assert hits[0].score == pytest.approx(1.0, abs=1e-5)
    subset = await p.message_text_index.lookup_messages_in_subset(
        "the quick brown fox", [1], 1, 0.0
    )
    assert subset and subset[0].message_ordinal == 1


async def test_related_terms_parity(backend):
    p = make_provider(backend)
    async with p:
        await p.related_terms_index.aliases.add_related_term(
            "car", [Term("automobile"), Term("vehicle")]
        )
        await p.related_terms_index.fuzzy_index.add_terms(["apple", "banana"])
    aliases = await p.related_terms_index.aliases.lookup_term("car")
    assert {t.text for t in aliases} == {"automobile", "vehicle"}
    assert await p.related_terms_index.aliases.lookup_term("zzz") is None
    hits = await p.related_terms_index.fuzzy_index.lookup_term(
        "apple", max_hits=1, min_score=0.0
    )
    assert hits[0].text == "apple"
    batch = await p.related_terms_index.fuzzy_index.lookup_terms(
        ["banana", "apple"], max_hits=1, min_score=0.0
    )
    assert batch[0][0].text == "banana" and batch[1][0].text == "apple"
    # SQLite dedupes re-added terms via its added-terms set (parity with the
    # reference: the memory impl appends duplicates).
    async with p:
        await p.related_terms_index.fuzzy_index.add_terms(["apple"])
    expected = 2 if backend == "sqlite" else 3
    assert await p.related_terms_index.fuzzy_index.size() == expected


async def test_source_ingestion_parity(backend):
    p = make_provider(backend)
    async with p:
        await p.mark_source_ingested("a")
        await p.mark_sources_ingested_batch(["b", "c"])
    assert await p.is_source_ingested("a")
    assert not await p.is_source_ingested("z")
    assert await p.are_sources_ingested(["a", "z", "c"]) == {"a", "c"}
    assert await p.get_source_status("b") == "ingested"


async def test_chunk_failures_parity(backend):
    p = make_provider(backend)
    async with p:
        await p.record_chunk_failure(1, 0, "ValueError", "boom")
        await p.record_chunk_failure(0, 2, "KeyError", "bam")
        await p.record_chunk_failure(1, 0, "TypeError", "re-recorded")  # idempotent
    failures = await p.get_chunk_failures()
    assert [(f.message_ordinal, f.chunk_ordinal) for f in failures] == [(0, 2), (1, 0)]
    assert failures[1].error_class == "TypeError"
    async with p:
        await p.clear_chunk_failure(0, 2)
    assert len(await p.get_chunk_failures()) == 1


# ---------------------------------------------------------------------------
# SQLite-specific behavior
# ---------------------------------------------------------------------------


async def test_sqlite_persistence_and_reopen(tmp_path):
    db_path = str(tmp_path / "conv.db")
    p = make_provider("sqlite", db_path)
    async with p:
        await p.messages.extend([msg("persisted message", ts="2024-01-01T00:00:00Z")])
        await _add_dummy_semrefs(p, 1)
        await p.semantic_ref_index.add_term("persist", 0)
        await p.related_terms_index.fuzzy_index.add_terms(["apple"])
    await p.close()

    p2 = make_provider("sqlite", db_path)
    assert await p2.messages.size() == 1
    assert (await p2.messages.get_item(0)).text_chunks == ["persisted message"]
    postings = await p2.semantic_ref_index.lookup_term("persist")
    assert [x.semantic_ref_ordinal for x in postings] == [0]
    # Embeddings reloaded into the device store
    assert await p2.message_text_index.size() == 1
    hits = await p2.message_text_index.lookup_messages("persisted message", 1)
    assert hits[0].message_ordinal == 0
    hits = await p2.related_terms_index.fuzzy_index.lookup_term(
        "apple", max_hits=1, min_score=0.0
    )
    assert hits[0].text == "apple"
    await p2.close()


async def test_sqlite_transaction_rollback(tmp_path):
    db_path = str(tmp_path / "rollback.db")
    p = make_provider("sqlite", db_path)
    async with p:
        await p.messages.extend([msg("committed")])
    with pytest.raises(RuntimeError, match="deliberate"):
        async with p:
            await p.messages.extend([msg("rolled back")])
            await p.mark_source_ingested("never")
            raise RuntimeError("deliberate")
    assert await p.messages.size() == 1
    assert not await p.is_source_ingested("never")
    await p.close()


async def test_sqlite_metadata_roundtrip(tmp_path):
    db_path = str(tmp_path / "meta.db")
    from typeagent_tpu.knowpro.interfaces import ConversationMetadata

    msg_settings, rel_settings = _settings()
    p = SqliteStorageProvider(
        db_path=db_path,
        message_type=ConversationMessage,
        message_text_index_settings=msg_settings,
        related_term_index_settings=rel_settings,
        metadata=ConversationMetadata(
            name_tag="myconv", tags=["a", "b"], extra={"custom": "x"}
        ),
    )
    async with p:
        await p.messages.extend([msg("hello")])
    meta = await p.get_conversation_metadata()
    assert meta.name_tag == "myconv"
    assert sorted(meta.tags) == ["a", "b"]
    assert meta.extra == {"custom": "x"}
    assert meta.embedding_model == "test"
    assert meta.schema_version == 1
    await p.close()


async def test_sqlite_embedding_model_mismatch_raises(tmp_path):
    db_path = str(tmp_path / "mismatch.db")
    p = make_provider("sqlite", db_path)
    async with p:
        await p.messages.extend([msg("hello")])
    await p.close()

    # Reopen claiming a different model name must fail.
    class OtherModel:
        model_name = "other-model"

        def add_embedding(self, *a): ...

    msg_settings = MessageTextIndexSettings(
        TextEmbeddingIndexSettings(OtherModel(), min_score=0.0)
    )
    rel_settings = RelatedTermIndexSettings(msg_settings.embedding_index_settings)
    with pytest.raises(ValueError, match="does not match"):
        SqliteStorageProvider(
            db_path=db_path,
            message_type=ConversationMessage,
            message_text_index_settings=msg_settings,
            related_term_index_settings=rel_settings,
        )


async def test_sqlite_nested_transaction_raises():
    p = make_provider("sqlite")
    async with p:
        with pytest.raises(RuntimeError, match="already in progress"):
            await p.__aenter__()


def test_sqlite_term_normalization_rules():
    """strip + NFC + whitespace collapse + lowercase (reference
    sqlite/semrefindex.py:172-182)."""
    from typeagent_tpu.storage.sqlite.indexes import prepare_term

    assert prepare_term("  Hello   World  ") == "hello world"
    assert prepare_term("Café") == "café"  # e + combining acute -> é (NFC)
    assert prepare_term("TAB\tand\nnewline") == "tab and newline"
    assert prepare_term("ÉCLAIR") == "éclair"


async def test_sqlite_index_lookup_uses_normalized_terms(tmp_path):
    """A term stored with odd casing/whitespace is findable via any variant."""
    from tests.test_persistence import WordExtractor, make_settings, msg
    from typeagent_tpu import create_conversation
    from typeagent_tpu.knowpro.universal_message import ConversationMessage

    db = str(tmp_path / "norm.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    # Terms FK-reference semrefs, so seed one via a real ingest first.
    await conv.add_messages_with_indexing([msg("seed message")])
    async with conv.storage_provider:
        await conv.semantic_ref_index.add_term("  Mixedé   Case  ", 0)
    for variant in ("mixedé case", "MIXEDÉ   CASE", " mixedé case "):
        postings = await conv.semantic_ref_index.lookup_term(variant)
        assert postings and postings[0].semantic_ref_ordinal == 0, variant
    await conv.storage_provider.close()


async def test_bulk_ordinal_fetch_beyond_bind_limit(backend, monkeypatch):
    """get_multiple/get_metadata_multiple must handle ordinal lists larger
    than SQLite's bind-variable limit (the device executor syncs whole
    conversations at once). Contiguous lists take a range scan; scattered
    sets chunk the IN-list."""
    from typeagent_tpu.storage.sqlite import collections as sqlite_collections

    monkeypatch.setattr(sqlite_collections, "_SQL_IN_CHUNK", 7)
    p = make_provider(backend)
    n = 40
    async with p:
        await _add_dummy_semrefs(p, n)
    # Contiguous (the executor-sync shape).
    meta = await p.semantic_refs.get_metadata_multiple(list(range(n)))
    assert [m.ordinal for m in meta] == list(range(n))
    # Scattered + out of order + duplicates.
    scattered = [3, 39, 0, 17, 3, 28, 11]
    refs = await p.semantic_refs.get_multiple(scattered)
    assert [r.knowledge.name for r in refs] == [f"e{i}" for i in scattered]
    meta2 = await p.semantic_refs.get_metadata_multiple(scattered)
    assert [m.ordinal for m in meta2] == scattered
