"""End-to-end persistence: SQLite conversations + JSON/binary snapshots."""

import numpy as np
import pytest

from typeagent_tpu import create_conversation
from typeagent_tpu.knowpro import kplib, serialization
from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.models.result import Success

DIM = 16


class WordExtractor:
    async def extract(self, text):
        words = text.split()
        return Success(
            kplib.KnowledgeResponse(
                entities=[kplib.ConcreteEntity(words[0], ["word"])],
                actions=[],
                inverse_actions=[],
                topics=words,
            )
        )


def make_settings():
    settings = ConversationSettings(model=create_test_embedding_model(DIM))
    settings.semantic_ref_index_settings.knowledge_extractor = WordExtractor()
    return settings


def msg(text, ts=None, source_id=None):
    return ConversationMessage(
        text_chunks=[text],
        metadata=ConversationMessageMeta("Alice", ["Bob"]),
        timestamp=ts,
        source_id=source_id,
    )


async def test_sqlite_conversation_end_to_end(tmp_path):
    db = str(tmp_path / "conv.db")
    conv = await create_conversation(
        db, ConversationMessage, "sqliteconv", settings=make_settings()
    )
    result = await conv.add_messages_with_indexing(
        [
            msg("zebra crossing ahead", ts="2024-05-01T10:00:00Z", source_id="m0"),
            msg("lions sleep tonight", ts="2024-05-02T10:00:00Z", source_id="m1"),
        ]
    )
    assert result.messages_added == 2
    found = await search_conversation(
        conv,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("zebra"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="zebra crossing",
    )
    assert found.message_matches
    assert found.message_matches[0].message_ordinal == 0
    await conv.storage_provider.close()

    # Reopen: everything persisted, incremental add keeps working.
    conv2 = await create_conversation(
        db, ConversationMessage, "sqliteconv", settings=make_settings()
    )
    assert await conv2.messages.size() == 2
    assert await conv2.storage_provider.is_source_ingested("m1")
    result = await conv2.add_messages_with_indexing(
        [msg("giraffes are tall", ts="2024-05-03T10:00:00Z", source_id="m2")]
    )
    assert result.messages_added == 1
    found = await search_conversation(
        conv2,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("giraffes"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="giraffes",
    )
    assert found.message_matches
    assert found.message_matches[0].message_ordinal == 2
    await conv2.storage_provider.close()


async def test_snapshot_file_roundtrip(tmp_path):
    """JSON + binary sidecar roundtrip preserves embeddings and indexes."""
    rng = np.random.default_rng(3)
    related = rng.standard_normal((4, DIM)).astype(np.float32)
    message = rng.standard_normal((2, DIM)).astype(np.float32)
    data = {
        "nameTag": "snapshot",
        "messages": [{"textChunks": ["hi"], "metadata": {"speaker": "A"}}],
        "tags": ["t1"],
        "semanticRefs": [],
        "semanticIndexData": {"items": [{"term": "hi", "semanticRefOrdinals": []}]},
        "relatedTermsIndexData": {
            "aliasData": {"relatedTerms": []},
            "textEmbeddingData": {
                "textItems": ["a", "b", "c", "d"],
                "embeddings": related.copy(),
            },
        },
        "messageIndexData": {
            "indexData": {
                "textLocations": [
                    {"messageOrdinal": 0, "chunkOrdinal": 0},
                    {"messageOrdinal": 0, "chunkOrdinal": 1},
                ],
                "embeddings": message.copy(),
            }
        },
    }
    base = str(tmp_path / "snap")
    serialization.write_conversation_data_to_file(data, base)

    loaded = serialization.read_conversation_data_from_file(base)
    assert loaded["nameTag"] == "snapshot"
    got_related = loaded["relatedTermsIndexData"]["textEmbeddingData"]["embeddings"]
    got_message = loaded["messageIndexData"]["indexData"]["embeddings"]
    np.testing.assert_allclose(got_related, related)
    np.testing.assert_allclose(got_message, message)
    assert loaded["semanticIndexData"]["items"][0]["term"] == "hi"


def test_deserialize_knowledge_types():
    entity = serialization.deserialize_knowledge(
        "entity", {"name": "Bach", "type": ["person"]}
    )
    assert isinstance(entity, kplib.ConcreteEntity)
    action = serialization.deserialize_knowledge(
        "action",
        {"verbs": ["say"], "verbTense": "past", "subjectEntityName": "Bach"},
    )
    assert isinstance(action, kplib.Action)
    assert action.subject_entity_name == "Bach"
    topic = serialization.deserialize_knowledge("topic", {"text": "music"})
    assert topic.text == "music"
