"""knowledge.py: batch extraction pool + entity/topic merging.

(Coverage role of the reference's tests/test_knowledge.py.)
"""

import asyncio

import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.knowledge import (
    extract_knowledge_from_text_batch,
    merge_concrete_entities,
    merge_topics,
)
from typeagent_tpu.models.result import Failure, Success


class Extractor:
    def __init__(self, fail_on=(), delay=0.0):
        self.fail_on = set(fail_on)
        self.delay = delay
        self.active = 0
        self.peak = 0

    async def extract(self, text):
        self.active += 1
        self.peak = max(self.peak, self.active)
        if self.delay:
            await asyncio.sleep(self.delay)
        self.active -= 1
        if text in self.fail_on:
            return Failure(f"failed on {text!r}")
        return Success(
            kplib.KnowledgeResponse(
                entities=[kplib.ConcreteEntity(text, ["chunk"])],
                actions=[],
                inverse_actions=[],
                topics=[text],
            )
        )


async def test_batch_preserves_order_and_isolates_failures():
    extractor = Extractor(fail_on={"b"})
    results = await extract_knowledge_from_text_batch(
        extractor, ["a", "b", "c", "d"], concurrency=2
    )
    assert [type(r).__name__ for r in results] == [
        "Success",
        "Failure",
        "Success",
        "Success",
    ]
    assert [r.value.entities[0].name for r in results if isinstance(r, Success)] == [
        "a",
        "c",
        "d",
    ]


async def test_batch_respects_concurrency():
    extractor = Extractor(delay=0.02)
    results = await extract_knowledge_from_text_batch(
        extractor, [f"t{i}" for i in range(9)], concurrency=3
    )
    assert len(results) == 9
    assert extractor.peak <= 3


async def test_batch_empty_input():
    assert await extract_knowledge_from_text_batch(Extractor(), []) == []


def entity(name, types, facets=None):
    return kplib.ConcreteEntity(name, types, facets=facets)


def test_merge_entities_by_normalized_name():
    merged = merge_concrete_entities(
        [
            entity("Bach", ["Person"], [kplib.Facet("Era", "Baroque")]),
            entity("BACH", ["composer"], [kplib.Facet("era", "late")]),
            entity("Gould", ["pianist"]),
        ]
    )
    assert [e.name for e in merged] == ["bach", "gould"]  # sorted, lowered
    bach = merged[0]
    assert bach.type == ["composer", "person"]
    assert bach.facets[0].name == "era"
    assert bach.facets[0].value == "baroque; late"
    assert merged[1].facets is None


def test_merge_entities_dedupes_facet_values():
    merged = merge_concrete_entities(
        [
            entity("x", ["t"], [kplib.Facet("k", "v")]),
            entity("x", ["t"], [kplib.Facet("k", "V")]),
        ]
    )
    assert merged[0].facets[0].value == "v"


def test_merge_entities_empty_and_custom_normalize():
    assert merge_concrete_entities([]) == []
    merged = merge_concrete_entities(
        [entity("Bach", ["A"]), entity("bach ", ["B"])],
        normalize=lambda s: s.strip().upper(),
    )
    assert [e.name for e in merged] == ["BACH"]
    assert merged[0].type == ["A", "B"]


def test_merge_topics_unique():
    out = merge_topics(["music", "art", "music"])
    assert sorted(out) == ["art", "music"]


# ---------------------------------------------------------------------------
# convutils: conversation time-range prompt section
# ---------------------------------------------------------------------------


async def test_time_range_prompt_section():
    from tests.test_query_pipeline import build_conversation
    from typeagent_tpu.knowpro.convutils import (
        get_time_range_for_conversation,
        get_time_range_prompt_section_for_conversation,
    )

    conv = await build_conversation()
    time_range = await get_time_range_for_conversation(conv)
    assert time_range.start.day == 1
    assert time_range.end.day == 2  # last message's own timestamp

    section = await get_time_range_prompt_section_for_conversation(conv)
    assert section["role"] == "system"
    assert "2024-03-01T10:00:00 to 2024-03-02T09:00:00" in section["content"]
    assert "CONVERSATION TIME RANGE" in section["content"]


async def test_time_range_none_for_empty_or_untimestamped():
    from typeagent_tpu.knowpro.convutils import (
        get_time_range_for_conversation,
        get_time_range_prompt_section_for_conversation,
    )
    from typeagent_tpu.knowpro.convsettings import (
        MessageTextIndexSettings,
        RelatedTermIndexSettings,
    )
    from typeagent_tpu.knowpro.secindex import ConversationSecondaryIndexes
    from typeagent_tpu.knowpro.universal_message import (
        ConversationMessage,
        ConversationMessageMeta,
    )
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.storage.memory import MemoryStorageProvider
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings
    from tests.test_query_pipeline import FakeConversation

    model = create_test_embedding_model(8)
    provider = MemoryStorageProvider(
        message_text_settings=MessageTextIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0)
        ),
        related_terms_settings=RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0)
        ),
    )
    conv = FakeConversation(
        messages=provider.messages,
        semantic_refs=provider.semantic_refs,
        semantic_ref_index=provider.semantic_ref_index,
        secondary_indexes=ConversationSecondaryIndexes(provider),
    )
    assert await get_time_range_for_conversation(conv) is None
    assert await get_time_range_prompt_section_for_conversation(conv) is None
    # Untimestamped first message -> None too.
    await provider.messages.extend(
        [ConversationMessage(["x"], ConversationMessageMeta("A"))]
    )
    assert await get_time_range_for_conversation(conv) is None


# ---------------------------------------------------------------------------
# Entity-merge matrix (reference parity: tests/test_knowledge.py merge cases)
# ---------------------------------------------------------------------------


def ent(name, types=("thing",), facets=None):
    return kplib.ConcreteEntity(
        name=name,
        type=list(types),
        facets=[kplib.Facet(n, v) for n, v in (facets or [])] or None,
    )


def test_merge_distinct_entities_stay_distinct():
    out = merge_concrete_entities([ent("apple"), ent("banana")])
    assert [e.name for e in out] == ["apple", "banana"]


def test_merge_same_name_different_case_unifies():
    out = merge_concrete_entities([ent("Apple", ["fruit"]), ent("APPLE", ["company"])])
    assert len(out) == 1
    assert out[0].name == "apple"
    assert out[0].type == ["company", "fruit"]  # union, sorted


def test_merge_types_deduplicated_and_sorted():
    out = merge_concrete_entities(
        [ent("x", ["Zebra", "alpha"]), ent("x", ["ALPHA", "beta"])]
    )
    assert out[0].type == ["alpha", "beta", "zebra"]


def test_merge_same_facet_combines_values_sorted():
    out = merge_concrete_entities(
        [
            ent("bach", facets=[("era", "baroque")]),
            ent("Bach", facets=[("era", "classical")]),
        ]
    )
    facets = out[0].facets
    assert len(facets) == 1
    assert facets[0].name == "era"
    assert facets[0].value == "baroque; classical"


def test_merge_facets_deduplicated():
    out = merge_concrete_entities(
        [
            ent("x", facets=[("color", "red"), ("color", "RED")]),
            ent("x", facets=[("Color", "red")]),
        ]
    )
    assert out[0].facets[0].value == "red"


def test_merge_entity_without_facets_with_facets():
    out = merge_concrete_entities([ent("x"), ent("x", facets=[("k", "v")])])
    assert len(out) == 1
    assert out[0].facets and out[0].facets[0].name == "k"


def test_merge_identity_normalize_keeps_cases_distinct():
    out = merge_concrete_entities(
        [ent("Apple"), ent("apple")], normalize=lambda s: s
    )
    assert [e.name for e in out] == ["Apple", "apple"]


def test_merge_custom_camelcase_normalize():
    # A normalizer that strips camel-case humps to lowercase merges variants.
    def decamel(s: str) -> str:
        return s.replace(" ", "").lower()

    out = merge_concrete_entities(
        [ent("New York", ["city"]), ent("NewYork", ["place"])], normalize=decamel
    )
    assert len(out) == 1
    assert out[0].name == "newyork"
    assert out[0].type == ["city", "place"]


def test_merge_single_entity_passthrough_shape():
    out = merge_concrete_entities([ent("Solo", ["a", "a", "b"], [("f", "V")])])
    assert len(out) == 1
    assert out[0].name == "solo"
    assert out[0].type == ["a", "b"]
    assert out[0].facets[0].value == "v"
