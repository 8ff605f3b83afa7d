"""Unit tests for the small knowpro helper modules.

(Parity roles: reference tests/test_convutils.py, test_messageutils.py,
test_textlocindex.py.)
"""

import pytest

from typeagent_tpu.knowpro.convutils import (
    get_time_range_for_conversation,
    get_time_range_prompt_section_for_conversation,
)
from typeagent_tpu.knowpro.interfaces import TextLocation
from typeagent_tpu.knowpro.messageutils import (
    get_all_message_chunk_locations,
    text_range_from_message_chunk,
)
from typeagent_tpu.knowpro.textlocindex import (
    ScoredTextLocation,
    TextToTextLocationIndex,
)
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings


def msg(*chunks, ts=None):
    return ConversationMessage(
        list(chunks), ConversationMessageMeta("A"), timestamp=ts
    )


class _Conv:
    def __init__(self, messages):
        from typeagent_tpu.storage.memory.collections import (
            MemoryMessageCollection,
        )

        self.messages = MemoryMessageCollection(messages)


# ---------------------------------------------------------------------------
# convutils
# ---------------------------------------------------------------------------


async def test_time_range_spans_first_to_last():
    conv = _Conv(
        [
            msg("a", ts="2024-01-01T10:00:00Z"),
            msg("b", ts="2024-01-02T11:00:00Z"),
            msg("c", ts="2024-01-03T12:00:00Z"),
        ]
    )
    tr = await get_time_range_for_conversation(conv)
    assert tr.start.isoformat().startswith("2024-01-01T10:00:00")
    assert tr.end.isoformat().startswith("2024-01-03T12:00:00")


async def test_time_range_none_for_empty_or_undated():
    assert await get_time_range_for_conversation(_Conv([])) is None
    assert await get_time_range_for_conversation(_Conv([msg("a")])) is None


async def test_time_range_open_end_when_last_undated():
    conv = _Conv([msg("a", ts="2024-01-01T10:00:00Z"), msg("b")])
    tr = await get_time_range_for_conversation(conv)
    assert tr is not None and tr.end is None
    section = await get_time_range_prompt_section_for_conversation(conv)
    assert section["role"] == "system"
    assert "now" in section["content"]


async def test_time_range_prompt_section_naive_iso():
    conv = _Conv(
        [msg("a", ts="2024-01-01T10:00:00Z"), msg("b", ts="2024-01-02T11:00:00Z")]
    )
    section = await get_time_range_prompt_section_for_conversation(conv)
    # Naive ISO (no +00:00 suffix), quoted, gated on explicit user request.
    assert '"2024-01-01T10:00:00 to 2024-01-02T11:00:00"' in section["content"]
    assert "ONLY IF" in section["content"]
    assert await get_time_range_prompt_section_for_conversation(_Conv([])) is None


# ---------------------------------------------------------------------------
# messageutils
# ---------------------------------------------------------------------------


def test_text_range_from_message_chunk_is_point_range():
    r = text_range_from_message_chunk(7, 2)
    assert r.start == TextLocation(7, 2) and r.end is None
    assert text_range_from_message_chunk(3).start.chunk_ordinal == 0


def test_get_all_message_chunk_locations_flattens_in_order():
    messages = [msg("a", "b"), msg("c"), msg(), msg("d", "e", "f")]
    locs = get_all_message_chunk_locations(messages, 10)
    assert locs == [
        TextLocation(10, 0),
        TextLocation(10, 1),
        TextLocation(11, 0),
        TextLocation(13, 0),
        TextLocation(13, 1),
        TextLocation(13, 2),
    ]
    assert get_all_message_chunk_locations([], 0) == []


# ---------------------------------------------------------------------------
# textlocindex
# ---------------------------------------------------------------------------


def make_index(dim=16):
    return TextToTextLocationIndex(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(dim), min_score=0.0
        )
    )


async def test_textlocindex_add_and_lookup():
    index = make_index()
    assert await index.is_empty()
    await index.add_text_location("the goldberg variations", TextLocation(0, 0))
    await index.add_text_locations(
        [("glenn gould piano", TextLocation(1, 0)), ("bach", TextLocation(1, 1))]
    )
    assert await index.size() == 3
    assert index.get(2) == TextLocation(1, 1)
    assert index.get(99) is None

    hits = await index.lookup_text("the goldberg variations", max_matches=1)
    assert isinstance(hits[0], ScoredTextLocation)
    assert hits[0].text_location == TextLocation(0, 0)
    assert hits[0].score == pytest.approx(1.0, abs=1e-5)


async def test_textlocindex_subset_lookup():
    index = make_index()
    texts = [f"text number {i}" for i in range(6)]
    await index.add_text_locations(
        [(t, TextLocation(i, 0)) for i, t in enumerate(texts)]
    )
    subset = [3, 4, 5]
    hits = await index.lookup_text_in_subset("text number 3", subset, max_matches=2)
    assert hits[0].text_location == TextLocation(3, 0)
    assert all(h.text_location.message_ordinal in subset for h in hits)


async def test_textlocindex_serialize_roundtrip_and_corruption():
    index = make_index()
    await index.add_text_locations(
        [("alpha", TextLocation(0, 0)), ("beta", TextLocation(1, 2))]
    )
    data = index.serialize()
    fresh = make_index()
    fresh.deserialize(data)
    assert await fresh.size() == 2
    assert fresh.get(1) == TextLocation(1, 2)
    hits = await fresh.lookup_text("alpha", max_matches=1)
    assert hits[0].text_location == TextLocation(0, 0)

    # Mismatched locations/embeddings must raise, not mis-align silently.
    bad = dict(data)
    bad["textLocations"] = data["textLocations"][:1]
    with pytest.raises(ValueError, match="corrupt"):
        make_index().deserialize(bad)
    with pytest.raises(ValueError, match="No embeddings"):
        make_index().deserialize(
            {"textLocations": [], "embeddings": None}
        )


# ---------------------------------------------------------------------------
# ConversationThreads (parity role: reference tests/test_convthreads.py)
# ---------------------------------------------------------------------------


def make_threads(dim=16):
    from typeagent_tpu.storage.memory.indexes import ConversationThreads

    return ConversationThreads(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(dim), min_score=0.0
        )
    )


def make_thread(desc, start=0, end=2):
    from typeagent_tpu.knowpro.interfaces import TextRange, Thread

    return Thread(desc, [TextRange(TextLocation(start), TextLocation(end))])


async def test_threads_add_and_lookup():
    threads = make_threads()
    await threads.add_thread(make_thread("the cats discussion"))
    await threads.add_thread(make_thread("dogs and other animals", 2, 5))
    assert len(threads.threads) == 2
    hits = await threads.lookup_thread("the cats discussion", 1, 0.0)
    assert hits[0].thread_ordinal == 0
    assert hits[0].score == pytest.approx(1.0, abs=1e-5)
    assert await threads.lookup_thread("anything", None, 0.0)


async def test_threads_lookup_empty_index():
    threads = make_threads()
    assert await threads.lookup_thread("whatever", 3, 0.0) == []


async def test_threads_clear_and_rebuild():
    threads = make_threads()
    await threads.add_thread(make_thread("alpha"))
    await threads.add_thread(make_thread("beta", 3, 4))
    threads.clear()
    assert threads.threads == [] and len(threads.vector_base) == 0
    # build_index rebuilds embeddings from the thread list.
    threads.threads = [make_thread("alpha"), make_thread("beta", 3, 4)]
    await threads.build_index()
    hits = await threads.lookup_thread("beta", 1, 0.0)
    assert hits[0].thread_ordinal == 1


async def test_threads_serialize_roundtrip():
    threads = make_threads()
    await threads.add_thread(make_thread("first topic", 0, 3))
    await threads.add_thread(make_thread("second topic", 3, 7))
    data = threads.serialize()
    assert len(data["threads"]) == 2
    assert data["threads"][0]["embedding"] is not None

    fresh = make_threads()
    fresh.deserialize(data)
    assert [t.description for t in fresh.threads] == ["first topic", "second topic"]
    assert fresh.threads[1].ranges[0].start.message_ordinal == 3
    hits = await fresh.lookup_thread("second topic", 1, 0.0)
    assert hits[0].thread_ordinal == 1


async def test_threads_deserialize_empty_and_missing_embeddings():
    fresh = make_threads()
    fresh.deserialize({"threads": None})
    assert fresh.threads == []
    # A thread serialized without its embedding deserializes; lookup skips it.
    data = {
        "threads": [
            {"thread": make_thread("no embedding").serialize(), "embedding": None}
        ]
    }
    fresh = make_threads()
    fresh.deserialize(data)
    assert len(fresh.threads) == 1
    assert len(fresh.vector_base) == 0
