"""Memory storage provider: collections + six indexes end-to-end."""

from datetime import datetime, timezone

import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.convsettings import (
    MessageTextIndexSettings,
    RelatedTermIndexSettings,
)
from typeagent_tpu.knowpro.interfaces import (
    DateRange,
    ScoredSemanticRefOrdinal,
    SemanticRef,
    TextLocation,
    TextRange,
    Thread,
)
from typeagent_tpu.knowpro.propindex import (
    PropertyNames,
    add_to_property_index,
    build_property_index,
    is_known_property,
)
from typeagent_tpu.knowpro.semrefindex import (
    add_metadata_to_index_from_list,
    collect_action_terms,
    collect_entity_terms,
)
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.storage.memory import MemoryStorageProvider
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings


def make_provider(dim=16):
    model = create_test_embedding_model(dim)
    return MemoryStorageProvider(
        message_text_settings=MessageTextIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0)
        ),
        related_terms_settings=RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0, max_matches=10)
        ),
    )


def msg(text, speaker="Alice", recipients=("Bob",), timestamp=None):
    return ConversationMessage(
        text_chunks=[text],
        metadata=ConversationMessageMeta(
            speaker=speaker, recipients=list(recipients)
        ),
        timestamp=timestamp,
    )


async def test_message_collection_feeds_text_index():
    provider = make_provider()
    await provider.messages.extend([msg("hello world"), msg("goodbye world")])
    assert await provider.messages.size() == 2
    assert await provider.message_text_index.size() == 2
    hits = await provider.message_text_index.lookup_messages("hello world", 1)
    assert hits[0].message_ordinal == 0
    assert hits[0].score == pytest.approx(1.0, abs=1e-5)


async def test_semref_index_terms_and_postings():
    provider = make_provider()
    index = provider.semantic_ref_index
    await index.add_term("Bach", 0)
    await index.add_term("BACH", 1)
    await index.add_term("piano", 1)
    postings = await index.lookup_term("bach")
    assert [p.semantic_ref_ordinal for p in postings] == [0, 1]
    assert all(p.score == 1.0 for p in postings)
    assert await index.lookup_term("missing") == []
    await index.remove_term("Bach", 0)
    assert [p.semantic_ref_ordinal for p in await index.lookup_term("bach")] == [1]
    data = await index.serialize()
    index2 = type(index)()
    await index2.deserialize(data)
    assert await index2.get_terms() == await index.get_terms()


async def test_metadata_knowledge_population():
    provider = make_provider()
    messages = [msg("hi", "Alice", ["Bob"]), msg("yo", "Carol", [])]
    await provider.messages.extend(messages)
    await add_metadata_to_index_from_list(
        messages, provider.semantic_refs, provider.semantic_ref_index, 0
    )
    # Alice message: entities Alice, Bob + action say -> 3 refs;
    # Carol message: entity Carol + action say/speak -> 2 refs.
    assert await provider.semantic_refs.size() == 5
    postings = await provider.semantic_ref_index.lookup_term("alice")
    assert postings  # entity name + action subject
    meta = await provider.semantic_refs.get_metadata_multiple([0, 1, 2])
    assert all(m.range.start.message_ordinal == 0 for m in meta)


async def test_property_index_population_and_lookup():
    provider = make_provider()

    class Conv:
        pass

    conv = Conv()
    conv.semantic_refs = provider.semantic_refs
    conv.secondary_indexes = type(
        "S", (), {"property_to_semantic_ref_index": provider.property_index}
    )()

    entity = kplib.ConcreteEntity(
        name="Gatsby",
        type=["book", "novel"],
        facets=[kplib.Facet(name="author", value="Fitzgerald")],
    )
    action = kplib.Action(
        verbs=["write", "publish"],
        verb_tense="past",
        subject_entity_name="Fitzgerald",
        object_entity_name="Gatsby",
    )
    await provider.semantic_refs.extend(
        [
            SemanticRef(0, TextRange(TextLocation(0, 0)), entity),
            SemanticRef(1, TextRange(TextLocation(0, 0)), action),
        ]
    )
    await build_property_index(conv)

    refs = await provider.property_index.lookup_property("name", "gatsby")
    assert refs and refs[0].semantic_ref_ordinal == 0
    refs = await provider.property_index.lookup_property("type", "NOVEL")
    assert refs and refs[0].semantic_ref_ordinal == 0
    refs = await provider.property_index.lookup_property("facet.value", "fitzgerald")
    assert refs and refs[0].semantic_ref_ordinal == 0
    refs = await provider.property_index.lookup_property("verb", "write publish")
    assert refs and refs[0].semantic_ref_ordinal == 1
    refs = await provider.property_index.lookup_property("subject", "fitzgerald")
    assert refs and refs[0].semantic_ref_ordinal == 1
    assert await is_known_property(
        provider.property_index, PropertyNames.EntityName, "gatsby"
    )
    assert not await is_known_property(
        provider.property_index, PropertyNames.EntityName, "moby dick"
    )
    # Incremental add must not duplicate earlier ordinals.
    await provider.semantic_refs.append(
        SemanticRef(2, TextRange(TextLocation(1, 0)), kplib.ConcreteEntity("X", ["y"]))
    )
    await add_to_property_index(conv, 2)
    refs = await provider.property_index.lookup_property("name", "gatsby")
    assert len(refs) == 1


async def test_timestamp_index_range_semantics():
    provider = make_provider()
    index = provider.timestamp_index
    await index.add_timestamps(
        [(0, "2024-01-01T10:00:00"), (1, "2024-01-02T10:00:00"), (2, "2024-01-03T10:00:00")]
    )
    # Half-open [start, end)
    hits = await index.lookup_range(
        DateRange(datetime(2024, 1, 1), datetime(2024, 1, 3))
    )
    assert [h.range.start.message_ordinal for h in hits] == [0, 1]
    # Point query: exact timestamp only
    hits = await index.lookup_range(DateRange(datetime(2024, 1, 2, 10)))
    assert [h.range.start.message_ordinal for h in hits] == [1]
    hits = await index.lookup_range(DateRange(datetime(2030, 1, 1)))
    assert hits == []


async def test_related_terms_aliases_and_fuzzy():
    provider = make_provider()
    rti = provider.related_terms_index
    from typeagent_tpu.knowpro.interfaces import Term

    await rti.aliases.add_related_term("car", [Term("automobile"), Term("vehicle")])
    found = await rti.aliases.lookup_term("car")
    assert {t.text for t in found} == {"automobile", "vehicle"}

    fuzzy = rti.fuzzy_index
    await fuzzy.add_terms(["apple", "banana", "cherry"])
    assert await fuzzy.size() == 3
    hits = await fuzzy.lookup_term("apple", max_hits=1, min_score=0.0)
    assert hits[0].text == "apple"
    assert hits[0].weight == pytest.approx(1.0, abs=1e-5)
    batch = await fuzzy.lookup_terms(["banana", "cherry"], max_hits=1, min_score=0.0)
    assert batch[0][0].text == "banana"
    assert batch[1][0].text == "cherry"

    data = await rti.serialize()
    rti2 = type(rti)(provider._rel_terms.settings)
    await rti2.deserialize(data)
    assert (await rti2.aliases.lookup_term("car")) is not None
    hits = await rti2.fuzzy_index.lookup_term("cherry", max_hits=1, min_score=0.0)
    assert hits[0].text == "cherry"


async def test_conversation_threads():
    provider = make_provider()
    threads = provider.conversation_threads
    t1 = Thread("discussion about cats", [TextRange(TextLocation(0, 0))])
    t2 = Thread("cooking recipes", [TextRange(TextLocation(5, 0))])
    await threads.add_thread(t1)
    await threads.add_thread(t2)
    hits = await threads.lookup_thread("discussion about cats", 1, 0.0)
    assert hits[0].thread_ordinal == 0
    data = threads.serialize()
    threads2 = type(threads)(provider._threads.vector_base.settings)
    threads2.deserialize(data)
    assert len(threads2.threads) == 2
    hits = await threads2.lookup_thread("cooking recipes", 1, 0.0)
    assert hits[0].thread_ordinal == 1


async def test_source_ingestion_and_chunk_failures():
    provider = make_provider()
    assert not await provider.is_source_ingested("a")
    await provider.mark_source_ingested("a")
    await provider.mark_sources_ingested_batch(["b", "c"])
    assert await provider.are_sources_ingested(["a", "b", "z"]) == {"a", "b"}
    assert await provider.get_source_status("a") == "ingested"
    assert await provider.get_source_status("z") is None

    await provider.record_chunk_failure(1, 0, "ValueError", "boom")
    await provider.record_chunk_failure(0, 2, "KeyError", "bam")
    failures = await provider.get_chunk_failures()
    assert [(f.message_ordinal, f.chunk_ordinal) for f in failures] == [(0, 2), (1, 0)]
    await provider.clear_chunk_failure(0, 2)
    assert len(await provider.get_chunk_failures()) == 1


def test_term_collectors():
    entity = kplib.ConcreteEntity(
        "Bach", ["person", "composer"], facets=[kplib.Facet("era", "baroque")]
    )
    assert collect_entity_terms(entity) == [
        "Bach", "person", "composer", "era", "baroque",
    ]
    action = kplib.Action(
        verbs=["compose", "play"],
        verb_tense="past",
        subject_entity_name="Bach",
        object_entity_name="music",
    )
    assert collect_action_terms(action) == ["compose play", "Bach", "music"]


# ---------------------------------------------------------------------------
# secindex full rebuilds (parity role: reference tests/test_secindex.py)
# ---------------------------------------------------------------------------


async def test_build_secondary_indexes_full_rebuild():
    """build_secondary_indexes populates property/timestamp/related-terms/
    message indexes from raw messages + semrefs (the snapshot-restore path)."""
    from typeagent_tpu.knowpro import kplib
    from typeagent_tpu.knowpro.convsettings import ConversationSettings
    from typeagent_tpu.knowpro.secindex import (
        build_secondary_indexes,
        build_transient_secondary_indexes,
    )
    from typeagent_tpu.knowpro.semrefindex import (
        add_knowledge_batch_to_semantic_ref_index,
    )
    from typeagent_tpu.knowpro.universal_message import (
        ConversationMessage,
        ConversationMessageMeta,
    )
    from typeagent_tpu.knowpro.secindex import ConversationSecondaryIndexes
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from tests.test_query_pipeline import FakeConversation

    settings = ConversationSettings(model=create_test_embedding_model(16))
    provider = await settings.get_storage_provider()
    conv = FakeConversation(
        messages=provider.messages,
        semantic_refs=provider.semantic_refs,
        semantic_ref_index=provider.semantic_ref_index,
        secondary_indexes=ConversationSecondaryIndexes(provider),
    )
    await provider.messages.extend(
        [
            ConversationMessage(
                ["Bach composed fugues"],
                ConversationMessageMeta("Alice"),
                timestamp="2024-03-01T10:00:00Z",
            ),
            ConversationMessage(
                ["Gould played piano"],
                ConversationMessageMeta("Bob"),
                timestamp="2024-03-02T10:00:00Z",
            ),
        ]
    )
    await add_knowledge_batch_to_semantic_ref_index(
        conv,
        [
            (
                0,
                0,
                kplib.KnowledgeResponse(
                    entities=[kplib.ConcreteEntity("Bach", ["person"])],
                    actions=[],
                    inverse_actions=[],
                    topics=["fugues"],
                ),
            )
        ],
    )

    await build_secondary_indexes(conv, settings)
    sec = conv.secondary_indexes
    assert sec is not None
    # Property index: entity name + type postings materialized.
    hits = await sec.property_to_semantic_ref_index.lookup_property("name", "bach")
    assert hits
    # Timestamp index: range query spans the two messages.
    from datetime import datetime, timezone

    from typeagent_tpu.knowpro.interfaces import DateRange

    rng = await sec.timestamp_index.lookup_range(
        DateRange(
            datetime(2024, 3, 1, tzinfo=timezone.utc),
            datetime(2024, 3, 3, tzinfo=timezone.utc),
        )
    )
    assert len(rng) == 2
    # Message index: both messages' chunks embedded.
    assert await sec.message_index.size() == 2
    # Related-terms fuzzy: semref terms embedded for expansion.
    assert await sec.term_to_related_terms_index.fuzzy_index.size() > 0

    # Transient-only build also works standalone on a fresh provider.
    settings2 = ConversationSettings(model=create_test_embedding_model(16))
    provider2 = await settings2.get_storage_provider()
    conv2 = FakeConversation(
        messages=provider2.messages,
        semantic_refs=provider2.semantic_refs,
        semantic_ref_index=provider2.semantic_ref_index,
        secondary_indexes=None,  # _ensure_wired attaches them
    )
    await provider2.messages.extend(
        [
            ConversationMessage(
                ["solo message"],
                ConversationMessageMeta("Eve"),
                timestamp="2024-04-01T10:00:00Z",
            )
        ]
    )
    await build_transient_secondary_indexes(conv2, settings2)
    assert conv2.secondary_indexes is not None
    # Memory collections auto-feed the message index on extend, so it is
    # populated regardless of the transient-only build.
    assert await conv2.secondary_indexes.message_index.size() == 1
    assert await conv2.secondary_indexes.term_to_related_terms_index.fuzzy_index.size() == 0
