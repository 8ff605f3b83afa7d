"""SQLite index deep matrix: per-index edge behaviors on the DB backend.

Complements tests/test_storage_parity.py (memory/sqlite behavioral parity)
with SQLite-specific edges: term normalization at write AND read, dedupe on
re-add, removals, serialize/deserialize round trips, timestamp range
semantics (half-open, point queries, unordered adds), message-index dedupe
via the max-indexed watermark, and alias multi-add. Coverage role of the
reference's tests/test_sqlite_indexes.py (904 LoC).
"""

from datetime import timezone

import numpy as np
import pytest

from tests.test_storage_parity import make_provider
from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.interfaces import (
    DateRange,
    Datetime,
    ScoredSemanticRefOrdinal,
    SemanticRef,
    Term,
    TextLocation,
    TextRange,
)
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)


def sqlite_provider():
    return make_provider("sqlite")


async def add_refs(p, n):
    refs = [
        SemanticRef(
            i, TextRange(TextLocation(i, 0)), kplib.ConcreteEntity(f"e{i}", ["x"])
        )
        for i in range(n)
    ]
    async with p:
        await p.semantic_refs.extend(refs)


# ---------------------------------------------------------------------------
# SemanticRefIndex
# ---------------------------------------------------------------------------


async def test_semref_index_normalizes_at_write_and_read():
    p = sqlite_provider()
    await add_refs(p, 3)
    index = p.semantic_ref_index
    async with p:
        await index.add_term("  Café   Crema ", 0)
    # NFD query form + extra whitespace + different case still hits.
    hits = await index.lookup_term("Café  crema")
    assert [h.semantic_ref_ordinal for h in hits] == [0]
    terms = await index.get_terms()
    assert terms == ["café crema"]


async def test_semref_index_duplicate_postings_are_kept():
    """Re-adding the same (term, semref) stores a duplicate posting —
    reference parity (its INSERT OR IGNORE has no unique constraint to
    trigger, and duplicate postings double the VM's hit counts)."""
    p = sqlite_provider()
    await add_refs(p, 2)
    index = p.semantic_ref_index
    async with p:
        await index.add_term("bach", 0)
        await index.add_term("BACH", 0)  # same prepared term + semref
        await index.add_term("bach", 1)
    hits = await index.lookup_term("bach")
    assert sorted(h.semantic_ref_ordinal for h in hits) == [0, 0, 1]
    assert await index.size() == 1  # one distinct term


async def test_semref_index_remove_term_is_per_semref():
    p = sqlite_provider()
    await add_refs(p, 2)
    index = p.semantic_ref_index
    async with p:
        await index.add_term("bach", 0)
        await index.add_term("bach", 1)
        await index.remove_term("bach", 0)
    hits = await index.lookup_term("bach")
    assert [h.semantic_ref_ordinal for h in hits] == [1]


async def test_semref_index_serialize_roundtrip():
    p = sqlite_provider()
    await add_refs(p, 3)
    index = p.semantic_ref_index
    async with p:
        await index.add_terms_batch([("alpha", 0), ("beta", 1), ("alpha", 2)])
    data = await index.serialize()
    p2 = sqlite_provider()
    await add_refs(p2, 3)
    async with p2:
        await p2.semantic_ref_index.deserialize(data)
    hits = await p2.semantic_ref_index.lookup_term("alpha")
    assert sorted(h.semantic_ref_ordinal for h in hits) == [0, 2]


# ---------------------------------------------------------------------------
# PropertyIndex
# ---------------------------------------------------------------------------


async def test_property_index_removals():
    p = sqlite_provider()
    await add_refs(p, 3)
    index = p.property_index
    async with p:
        await index.add_property("name", "Bach", 0)
        await index.add_property("name", "Bach", 1)
        await index.add_property("type", "person", 1)
    await index.remove_property("name", 0)
    hits = await index.lookup_property("name", "Bach")
    assert [h.semantic_ref_ordinal for h in hits] == [1]
    await index.remove_all_for_semref(1)
    assert not await index.lookup_property("name", "Bach")
    assert not await index.lookup_property("type", "person")


async def test_property_index_case_insensitive_and_scored():
    p = sqlite_provider()
    await add_refs(p, 2)
    index = p.property_index
    async with p:
        await index.add_property(
            "name", "Glenn Gould", ScoredSemanticRefOrdinal(0, 0.75)
        )
    hits = await index.lookup_property("NAME", "glenn gould")
    assert hits and hits[0].score == pytest.approx(0.75)
    values = await index.get_values()
    assert "glenn gould" in values


async def test_property_index_all_postings_key_format():
    p = sqlite_provider()
    await add_refs(p, 1)
    index = p.property_index
    async with p:
        await index.add_property("type", "composer", 0)
    postings = await index.all_postings()
    assert postings == [("prop.type@@composer", 0, 1.0)]


# ---------------------------------------------------------------------------
# TimestampIndex (SQL range scan over Messages.start_timestamp)
# ---------------------------------------------------------------------------


def msg(text, ts):
    return ConversationMessage(
        [text], ConversationMessageMeta("A", ["B"]), timestamp=ts
    )


async def test_timestamp_index_half_open_range():
    p = sqlite_provider()
    async with p:
        await p.messages.extend(
            [
                msg("m0", "2024-01-01T00:00:00Z"),
                msg("m1", "2024-01-02T00:00:00Z"),
                msg("m2", "2024-01-03T00:00:00Z"),
            ]
        )
    index = p.timestamp_index
    # Half-open [start, end): the end instant is excluded.
    hits = await index.lookup_range(
        DateRange(start=Datetime(2024, 1, 1, tzinfo=timezone.utc), end=Datetime(2024, 1, 3, tzinfo=timezone.utc))
    )
    ordinals = [h.range.start.message_ordinal for h in hits]
    assert ordinals == [0, 1]
    # Point query (end=None) matches the exact timestamp only.
    point = await index.lookup_range(DateRange(start=Datetime(2024, 1, 2, tzinfo=timezone.utc)))
    assert [h.range.start.message_ordinal for h in point] == [1]
    # Empty range.
    nothing = await index.lookup_range(
        DateRange(start=Datetime(2030, 1, 1, tzinfo=timezone.utc), end=Datetime(2031, 1, 1, tzinfo=timezone.utc))
    )
    assert nothing == []


async def test_timestamp_index_skips_untimestamped_messages():
    p = sqlite_provider()
    async with p:
        await p.messages.extend(
            [
                msg("m0", None),
                msg("m1", "2024-06-05T12:00:00Z"),
            ]
        )
    hits = await p.timestamp_index.lookup_range(
        DateRange(start=Datetime(2024, 1, 1, tzinfo=timezone.utc), end=Datetime(2025, 1, 1, tzinfo=timezone.utc))
    )
    assert [h.range.start.message_ordinal for h in hits] == [1]


# ---------------------------------------------------------------------------
# MessageTextIndex (BLOBs -> device store)
# ---------------------------------------------------------------------------


async def test_message_index_dedupes_already_indexed():
    """add_messages after collection extends must not re-index chunks (the
    MAX(msg_id) watermark dedupe)."""
    p = sqlite_provider()
    async with p:
        await p.messages.extend([msg("hello world", None), msg("goodbye", None)])
    index = p.message_text_index
    before = await index.size()
    assert before == 2  # auto-fed by extend
    messages = [await p.messages.get_item(i) for i in range(2)]
    async with p:
        await index.add_messages(messages)
    assert await index.size() == before  # unchanged


async def test_message_index_lookup_and_subset_roundtrip():
    p = sqlite_provider()
    async with p:
        await p.messages.extend(
            [msg(f"document number {i}", None) for i in range(6)]
        )
    index = p.message_text_index
    scored = await index.lookup_messages("document number 3", 2, None)
    assert scored[0].message_ordinal == 3
    subset = await index.lookup_messages_in_subset(
        "document number 3", [0, 4, 5], 2, None
    )
    assert all(s.message_ordinal in (0, 4, 5) for s in subset)
    # serialize/deserialize round trip preserves lookups.
    data = await index.serialize()
    p2 = sqlite_provider()
    async with p2:
        await p2.messages.extend(
            [msg(f"document number {i}", None) for i in range(6)]
        )
        await p2.message_text_index.clear()
        await p2.message_text_index.deserialize(data)
    scored2 = await p2.message_text_index.lookup_messages("document number 3", 2, None)
    assert scored2[0].message_ordinal == 3


async def test_message_index_persists_across_reopen(tmp_path):
    db = str(tmp_path / "msgidx.db")
    p = make_provider("sqlite", db)
    async with p:
        await p.messages.extend([msg("persistent text", None)])
    await p.close()

    p2 = make_provider("sqlite", db)
    index = p2.message_text_index
    assert await index.size() == 1
    scored = await index.lookup_messages("persistent text", 1, None)
    assert scored[0].message_ordinal == 0
    await p2.close()


# ---------------------------------------------------------------------------
# RelatedTermsIndex (aliases + fuzzy)
# ---------------------------------------------------------------------------


async def test_aliases_multi_add_and_remove():
    p = sqlite_provider()
    aliases = p.related_terms_index.aliases
    async with p:
        await aliases.add_related_term("car", Term("auto"))
        await aliases.add_related_term("car", [Term("vehicle"), Term("auto")])
    related = await aliases.lookup_term("car")
    texts = sorted(t.text for t in related)
    assert texts == ["auto", "vehicle"]  # deduped
    async with p:
        await aliases.remove_term("car")
    assert await aliases.lookup_term("car") is None
    assert await aliases.is_empty()


async def test_aliases_serialize_roundtrip():
    p = sqlite_provider()
    aliases = p.related_terms_index.aliases
    async with p:
        await aliases.add_related_term("ship", [Term("boat"), Term("vessel")])
    data = await aliases.serialize()
    p2 = sqlite_provider()
    async with p2:
        await p2.related_terms_index.aliases.deserialize(data)
    related = await p2.related_terms_index.aliases.lookup_term("ship")
    assert sorted(t.text for t in related) == ["boat", "vessel"]


async def test_fuzzy_index_dedupes_added_terms():
    p = sqlite_provider()
    fuzzy = p.related_terms_index.fuzzy_index
    async with p:
        await fuzzy.add_terms(["alpha", "beta"])
        await fuzzy.add_terms(["alpha", "gamma"])  # alpha deduped
    assert await fuzzy.size() == 3
    assert sorted(await fuzzy.get_terms()) == ["alpha", "beta", "gamma"]
    # Self-lookup returns the exact term first.
    hits = await fuzzy.lookup_term("beta", max_hits=1, min_score=0.0)
    assert hits[0].text == "beta"


async def test_fuzzy_index_batched_lookup_matches_single():
    p = sqlite_provider()
    fuzzy = p.related_terms_index.fuzzy_index
    async with p:
        await fuzzy.add_terms([f"term {i}" for i in range(10)])
    batched = await fuzzy.lookup_terms(["term 3", "term 7"], 2, 0.0)
    for text, batch_hits in zip(["term 3", "term 7"], batched):
        single = await fuzzy.lookup_term(text, 2, 0.0)
        assert [h.text for h in batch_hits] == [h.text for h in single]


async def test_fuzzy_index_persists_across_reopen(tmp_path):
    db = str(tmp_path / "fuzzy.db")
    p = make_provider("sqlite", db)
    fuzzy = p.related_terms_index.fuzzy_index
    async with p:
        await fuzzy.add_terms(["persisted term"])
    await p.close()
    p2 = make_provider("sqlite", db)
    fuzzy2 = p2.related_terms_index.fuzzy_index
    assert await fuzzy2.size() == 1
    hits = await fuzzy2.lookup_term("persisted term", 1, 0.0)
    assert hits[0].text == "persisted term"
    await p2.close()


# ---------------------------------------------------------------------------
# Term normalization matrices (prepare_term: strip + NFC + collapse + lower)
# ---------------------------------------------------------------------------

WHITESPACE_VARIANTS = [
    "hello world",
    "  hello world  ",
    "hello\tworld",
    "hello\nworld",
    "hello   world",
    "hello \t world",
]


async def test_whitespace_variants_normalize_to_one_term():
    p = sqlite_provider()
    await add_refs(p, len(WHITESPACE_VARIANTS))
    index = p.semantic_ref_index
    for i, variant in enumerate(WHITESPACE_VARIANTS):
        await index.add_term(variant, i)
    for variant in WHITESPACE_VARIANTS:
        results = await index.lookup_term(variant)
        assert {r.semantic_ref_ordinal for r in results} == set(
            range(len(WHITESPACE_VARIANTS))
        )
    await p.close()


async def test_nfc_nfd_unicode_forms_are_one_term():
    p = sqlite_provider()
    await add_refs(p, 2)
    index = p.semantic_ref_index
    await index.add_term("café", 0)  # NFC: single é
    await index.add_term("café", 1)  # NFD: e + combining acute
    for form in ("café", "café"):
        results = await index.lookup_term(form)
        assert {r.semantic_ref_ordinal for r in results} == {0, 1}
    await p.close()


async def test_high_plane_unicode_round_trips():
    p = sqlite_provider()
    await add_refs(p, 3)
    index = p.semantic_ref_index
    terms = ["test\U0001F3E0house", "math\U0001D400\U0001D401", "old\U00013000"]
    for i, term in enumerate(terms):
        await index.add_term(term, i)
    for i, term in enumerate(terms):
        results = await index.lookup_term(term)
        assert [r.semantic_ref_ordinal for r in results] == [i]
    await p.close()


async def test_case_variants_normalize_including_unicode_case():
    p = sqlite_provider()
    await add_refs(p, 13)
    index = p.semantic_ref_index
    for i, variant in enumerate(["Hello", "HELLO", "hello", "HeLLo"]):
        await index.add_term(variant, i)
    for variant in ("hello", "HELLO"):
        results = await index.lookup_term(variant)
        assert {r.semantic_ref_ordinal for r in results} == {0, 1, 2, 3}
    for i, variant in enumerate(["Café", "CAFÉ", "café"]):
        await index.add_term(variant, 10 + i)
    results = await index.lookup_term("café")
    assert {r.semantic_ref_ordinal for r in results} == {10, 11, 12}
    await p.close()


# ---------------------------------------------------------------------------
# Removal / clear edge cases
# ---------------------------------------------------------------------------


async def test_term_index_remove_and_clear_cycle():
    p = sqlite_provider()
    await add_refs(p, 3)
    index = p.semantic_ref_index
    assert await index.size() == 0
    assert await index.lookup_term("") == []  # empty lookup: no rows, no error
    await index.add_term("gone", 1)
    assert await index.size() == 1
    await index.remove_term("gone", 1)
    assert await index.lookup_term("gone") == []
    assert await index.size() == 0
    await index.add_term("cleared", 2)
    await index.clear()
    assert await index.size() == 0
    await p.close()


async def test_property_index_remove_all_for_semref():
    p = sqlite_provider()
    await add_refs(p, 4)
    index = p.property_index
    assert await index.lookup_property("nonexistent", "value") is None
    await index.add_property("prop1", "val1", 2)
    await index.add_property("prop2", "val2", 2)
    await index.add_property("prop1", "val1", 3)  # other semref survives
    await index.remove_all_for_semref(2)
    assert await index.lookup_property("prop2", "val2") is None
    survivors = await index.lookup_property("prop1", "val1")
    assert [s.semantic_ref_ordinal for s in survivors] == [3]
    await p.close()


async def test_aliases_deserialize_edge_data():
    p = sqlite_provider()
    aliases = p.related_terms_index.aliases
    await aliases.deserialize(None)  # tolerated, no-op
    await aliases.deserialize({"relatedTerms": []})
    await aliases.deserialize(
        {
            "relatedTerms": [
                {"termText": "empty", "relatedTerms": []},
                {"termText": "orphan", "relatedTerms": [{"text": "related"}]},
            ]
        }
    )
    related = await aliases.lookup_term("orphan")
    assert related and related[0].text == "related"
    assert await aliases.lookup_term("empty") in (None, [])
    await p.close()


async def test_fuzzy_lookup_terms_plural_shape():
    p = sqlite_provider()
    fuzzy = p.related_terms_index.fuzzy_index
    await fuzzy.add_terms([])  # empty add: no rows
    assert await fuzzy.size() == 0
    results = await fuzzy.lookup_terms(["missing1", "missing2"], max_hits=5)
    assert len(results) == 2
    assert all(isinstance(r, list) for r in results)
    await p.close()


async def test_semref_index_empty_term_add_is_noop():
    # Reference pins: add_term("") returns "" and leaves the index empty.
    p = sqlite_provider()
    await add_refs(p, 1)
    idx = p.semantic_ref_index
    assert await idx.add_term("", 0) == ""
    assert await idx.size() == 0
    await p.close()


async def test_fuzzy_index_first_run_deserialize_then_lookup():
    """Fresh DB -> deserialize snapshot embeddings -> query works immediately.

    Regression role of the reference's fuzzy_index_first_run_scenario (its
    SQLite deserialize was once a no-op); hermetic here via the fake model.
    """
    from typeagent_tpu.models.adapters import create_test_embedding_model

    texts = ["chess", "magnus carlsen", "grandmaster", "artificial intelligence"]
    model = create_test_embedding_model(16)
    emb = np.asarray(await model.get_embeddings(texts), dtype=np.float32)

    p = sqlite_provider()
    fuzzy = p.related_terms_index.fuzzy_index
    await fuzzy.deserialize({"textItems": texts, "embeddings": emb})
    assert await fuzzy.size() == len(texts)

    # The fake embedder is deterministic: the same text must be its own
    # nearest neighbor at score ~1.0.
    hits = await fuzzy.lookup_term("grandmaster", max_hits=3, min_score=0.1)
    assert hits and hits[0].text == "grandmaster"
    assert hits[0].weight is not None and hits[0].weight > 0.99

    # Rows landed in SQLite too (not just the in-RAM mirror): a reopened
    # index over the same connection sees them.
    reload_count = (
        p.db.cursor().execute("SELECT COUNT(*) FROM RelatedTermsFuzzy").fetchone()[0]
    )
    assert reload_count == len(texts)
    await p.close()


async def test_fuzzy_index_deserialize_empty_data_clears():
    p = sqlite_provider()
    fuzzy = p.related_terms_index.fuzzy_index
    await fuzzy.add_terms(["stale"])
    assert await fuzzy.size() == 1
    await fuzzy.deserialize({"textItems": [], "embeddings": None})
    assert await fuzzy.size() == 0
    assert await fuzzy.lookup_term("stale", max_hits=3, min_score=0.0) == []
    await p.close()


async def test_related_terms_combined_serialize_shape():
    # Combined index serialize carries BOTH sections with the wire keys the
    # snapshot format uses (aliasData / textEmbeddingData).
    p = sqlite_provider()
    rel = p.related_terms_index
    await rel.aliases.deserialize(
        {"relatedTerms": [{"termText": "auto", "relatedTerms": [{"text": "car"}]}]}
    )
    await rel.fuzzy_index.add_terms(["vehicle"])
    data = await rel.serialize()
    assert {"auto"} == {e["termText"] for e in data["aliasData"]["relatedTerms"]}
    assert data["textEmbeddingData"]["textItems"] == ["vehicle"]
    emb = data["textEmbeddingData"]["embeddings"]
    assert emb is not None and len(emb) == 1
    await p.close()
