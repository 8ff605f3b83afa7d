"""ConversationBase: batch + streaming ingestion and the query path."""

import asyncio
import json

import pytest

from typeagent_tpu import create_conversation
from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import FakeChatModel, create_test_embedding_model
from typeagent_tpu.models.result import Failure, Success

DIM = 24


class FakeExtractor:
    """Deterministic extractor: topic per chunk; fails on demand."""

    def __init__(self, fail_on: set[str] | None = None):
        self.fail_on = fail_on or set()
        self.calls: list[str] = []

    async def extract(self, message: str):
        self.calls.append(message)
        if message in self.fail_on:
            return Failure(f"extraction failed for {message!r}")
        words = message.split()
        return Success(
            kplib.KnowledgeResponse(
                entities=[kplib.ConcreteEntity(words[0] if words else "x", ["thing"])],
                actions=[],
                inverse_actions=[],
                topics=words,  # each word becomes a searchable topic
            )
        )


def make_settings(extractor=None, auto_extract=True):
    settings = ConversationSettings(model=create_test_embedding_model(DIM))
    settings.semantic_ref_index_settings.auto_extract_knowledge = auto_extract
    settings.semantic_ref_index_settings.knowledge_extractor = extractor
    return settings


def msg(text, speaker="Alice", ts=None, source_id=None):
    return ConversationMessage(
        text_chunks=[text],
        metadata=ConversationMessageMeta(speaker, ["Bob"]),
        timestamp=ts,
        source_id=source_id,
    )


async def test_add_messages_with_indexing_full_flow():
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, "test", settings=settings)
    result = await conv.add_messages_with_indexing(
        [
            msg("the quick brown fox", ts="2024-01-01T10:00:00Z", source_id="s1"),
            msg("jumps over the lazy dog", ts="2024-01-01T11:00:00Z", source_id="s2"),
        ]
    )
    assert result.messages_added == 2
    assert result.chunks_added == 2
    assert result.semrefs_added > 0
    # Sources marked in the same flow
    assert await conv.storage_provider.are_sources_ingested(["s1", "s2"]) == {
        "s1",
        "s2",
    }
    # All six indexes populated
    assert await conv.semantic_ref_index.size() > 0
    sec = conv.secondary_indexes
    assert await sec.property_to_semantic_ref_index.size() > 0
    assert await sec.timestamp_index.size() == 2
    assert await sec.message_index.size() == 2
    assert await sec.term_to_related_terms_index.fuzzy_index.size() > 0
    # Search end-to-end (no LLM): term -> knowledge -> messages
    found = await search_conversation(
        conv,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("fox"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="the quick brown fox",
    )
    assert found.message_matches
    assert found.message_matches[0].message_ordinal == 0


async def test_incremental_add_keeps_ordinals():
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    await conv.add_messages_with_indexing([msg("first message")])
    size1 = await conv.semantic_refs.size()
    await conv.add_messages_with_indexing([msg("second message")])
    assert await conv.messages.size() == 2
    assert await conv.semantic_refs.size() > size1
    # New semrefs anchor at message ordinal 1
    last = await conv.semantic_refs.get_item(await conv.semantic_refs.size() - 1)
    assert last.range.start.message_ordinal == 1


async def test_streaming_pipeline_commits_in_order():
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    committed = []

    async def stream():
        for i in range(10):
            yield msg(f"streaming message number {i}")

    result = await conv.add_messages_streaming(
        stream(), batch_size=3, on_batch_committed=lambda r: committed.append(r)
    )
    assert result.messages_added == 10
    assert result.chunks_added == 10
    assert await conv.messages.size() == 10
    assert len(committed) >= 3  # batches of ~3 chunks
    # Messages stored in input order
    for i in range(10):
        m = await conv.messages.get_item(i)
        assert m.text_chunks[0].endswith(str(i))


async def test_streaming_halts_on_failure():
    extractor = FakeExtractor(fail_on={"bad message"})
    settings = make_settings(extractor)
    conv = await create_conversation(None, ConversationMessage, settings=settings)

    async def stream():
        yield msg("good one")
        yield msg("bad message")
        yield msg("never committed")

    with pytest.raises(Exception):
        await conv.add_messages_streaming(stream(), batch_size=100)
    # Only the consecutive good prefix landed
    assert await conv.messages.size() == 1


async def test_streaming_skip_failed_messages():
    extractor = FakeExtractor(fail_on={"bad message"})
    settings = make_settings(extractor)
    conv = await create_conversation(None, ConversationMessage, settings=settings)

    async def stream():
        yield msg("good one")
        yield msg("bad message")
        yield msg("good two")

    result = await conv.add_messages_streaming(
        stream(), batch_size=100, skip_failed_messages=True
    )
    assert result.messages_added == 2
    assert result.messages_skipped == 1
    texts = [
        (await conv.messages.get_item(i)).text_chunks[0]
        for i in range(await conv.messages.size())
    ]
    assert texts == ["good one", "good two"]


async def test_streaming_zero_chunk_messages():
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)

    async def stream():
        yield ConversationMessage(
            text_chunks=[], metadata=ConversationMessageMeta("Alice")
        )
        yield msg("has content")

    result = await conv.add_messages_streaming(stream(), batch_size=10)
    assert await conv.messages.size() == 2
    assert (await conv.messages.get_item(0)).text_chunks == []


async def test_streaming_no_auto_extract():
    settings = make_settings(auto_extract=False)
    conv = await create_conversation(None, ConversationMessage, settings=settings)

    async def stream():
        yield msg("one")
        yield msg("two")

    result = await conv.add_messages_streaming(stream(), batch_size=10)
    assert result.messages_added == 2
    # metadata knowledge still extracted (speaker entities)
    assert await conv.semantic_refs.size() > 0


async def test_streaming_shutdown_event():
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    shutdown = asyncio.Event()
    produced = 0

    async def stream():
        nonlocal produced
        for i in range(100):
            if i == 5:
                shutdown.set()
            produced += 1
            yield msg(f"m{i}")

    result = await conv.add_messages_streaming(
        stream(), batch_size=10, shutdown_event=shutdown
    )
    assert result.messages_added < 100
    assert produced < 100


async def test_query_end_to_end_with_fake_llm():
    """Full 4-stage query() with canned LLM responses."""
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    await conv.add_messages_with_indexing(
        [msg("Bach wrote the Goldberg Variations", ts="2024-01-01T10:00:00Z")]
    )

    search_query_json = json.dumps(
        {
            "searchExpressions": [
                {
                    "rewrittenQuery": "What did Bach write?",
                    "filters": [{"searchTerms": ["Bach", "Goldberg Variations"]}],
                }
            ]
        }
    )
    answer_json = json.dumps(
        {"type": "Answered", "answer": "Bach wrote the Goldberg Variations."}
    )
    from typeagent_tpu.knowpro import answers, searchlang

    conv._query_translator = searchlang.create_search_query_translator(
        FakeChatModel([search_query_json])
    )
    conv._answer_translator = answers.create_answer_translator(
        FakeChatModel([answer_json])
    )
    answer = await conv.query("What did Bach write?")
    assert answer == "Bach wrote the Goldberg Variations."


async def test_streaming_skip_records_chunk_failures():
    """Skipped messages leave retry records in the ChunkFailures table."""
    extractor = FakeExtractor(fail_on={"bad message"})
    settings = make_settings(extractor)
    conv = await create_conversation(None, ConversationMessage, settings=settings)

    async def stream():
        yield msg("good one")
        yield msg("bad message", source_id="src-bad")
        yield msg("good two")

    result = await conv.add_messages_streaming(
        stream(), batch_size=100, skip_failed_messages=True
    )
    assert result.messages_skipped == 1
    failures = await conv.storage_provider.get_chunk_failures()
    assert len(failures) == 1
    assert failures[0].error_class == "RuntimeError"
    assert "src-bad" in failures[0].error_message


async def test_engine_emits_tracing_spans():
    """Ingest + query paths record spans into the metrics registry."""
    from typeagent_tpu.utils.metrics import METRICS

    before = {
        k: len(v) for k, v in METRICS.latencies.items() if k.startswith("span.")
    }
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    await conv.add_messages_with_indexing([msg("trace me")])

    async def stream():
        yield msg("streamed one")

    await conv.add_messages_streaming(stream(), batch_size=1)
    await search_conversation(
        conv,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("trace"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="trace",
    )
    def count(name):
        return len(METRICS.latencies.get(name, [])) - before.get(name, 0)

    assert count("span.ingest.batch") >= 1
    assert count("span.ingest.streaming") >= 1
    assert count("span.search.knowledge") >= 1


async def test_streaming_batch_size_counts_chunks_not_messages():
    """batch_size is a CHUNK budget: multi-chunk messages fill batches
    faster, and a message larger than the budget still commits whole."""
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    committed = []

    async def stream():
        # 3 chunks, 1 chunk, 5 chunks (exceeds batch budget of 4), 1 chunk.
        yield ConversationMessage(
            [f"alpha {i}" for i in range(3)], ConversationMessageMeta("A")
        )
        yield msg("beta")
        yield ConversationMessage(
            [f"gamma {i}" for i in range(5)], ConversationMessageMeta("A")
        )
        yield msg("delta")

    result = await conv.add_messages_streaming(
        stream(), batch_size=4, on_batch_committed=lambda r: committed.append(r)
    )
    assert result.messages_added == 4
    assert result.chunks_added == 10
    assert await conv.messages.size() == 4
    # The 5-chunk message was never split across commits.
    sizes = [r.messages_added for r in committed]
    assert sum(sizes) == 4
    big = await conv.messages.get_item(2)
    assert len(big.text_chunks) == 5


async def test_streaming_failure_across_batches_preserves_earlier_commits():
    """A failure in a later batch keeps everything committed before it."""
    extractor = FakeExtractor(fail_on={"bad message"})
    settings = make_settings(extractor)
    conv = await create_conversation(None, ConversationMessage, settings=settings)

    async def stream():
        for i in range(6):
            yield msg(f"early {i}")
        yield msg("bad message")
        yield msg("late")

    with pytest.raises(Exception):
        await conv.add_messages_streaming(stream(), batch_size=2)
    # The early batches landed; nothing at/after the failure did.
    size = await conv.messages.size()
    assert 1 <= size <= 6
    for i in range(size):
        assert (await conv.messages.get_item(i)).text_chunks[0] == f"early {i}"


async def test_streaming_multi_chunk_failure_fails_whole_message():
    """One bad chunk poisons its whole message; other messages unaffected
    under skip_failed_messages."""
    extractor = FakeExtractor(fail_on={"poison"})
    settings = make_settings(extractor)
    conv = await create_conversation(None, ConversationMessage, settings=settings)

    async def stream():
        yield msg("ok first")
        yield ConversationMessage(
            ["fine chunk", "poison", "also fine"], ConversationMessageMeta("A")
        )
        yield msg("ok last")

    result = await conv.add_messages_streaming(
        stream(), batch_size=100, skip_failed_messages=True
    )
    assert result.messages_added == 2
    assert result.messages_skipped == 1
    texts = [
        (await conv.messages.get_item(i)).text_chunks[0]
        for i in range(await conv.messages.size())
    ]
    assert texts == ["ok first", "ok last"]


async def test_streaming_empty_stream():
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)

    async def stream():
        return
        yield  # pragma: no cover

    result = await conv.add_messages_streaming(stream(), batch_size=10)
    assert result.messages_added == 0
    assert await conv.messages.size() == 0


async def test_streaming_on_batch_committed_fires_per_batch_with_counts():
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    batches = []

    async def stream():
        for i in range(7):
            yield msg(f"m{i}")

    await conv.add_messages_streaming(
        stream(), batch_size=3, on_batch_committed=lambda r: batches.append(r)
    )
    assert sum(b.messages_added for b in batches) == 7
    assert all(b.messages_added >= 1 for b in batches)
    assert len(batches) >= 3


async def test_streaming_batch_size_one_commits_each_message(tmp_path):
    """batch_size=1: every message lands in its own commit."""
    settings = make_settings(FakeExtractor())
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    committed = []

    async def stream():
        for text in ["one fish", "two fish", "red fish"]:
            yield msg(text)

    result = await conv.add_messages_streaming(
        stream(), batch_size=1, on_batch_committed=lambda r: committed.append(r)
    )
    assert result.messages_added == 3
    assert [r.messages_added for r in committed] == [1, 1, 1]
    assert await conv.messages.size() == 3


async def test_conversation_with_approx_search_mode():
    """ConversationSettings(search_mode='approx'): full ingest + query path
    with approx embedding lookups (exact on CPU's approx_max_k fallback)."""
    settings = ConversationSettings(
        model=create_test_embedding_model(DIM), search_mode="approx"
    )
    settings.semantic_ref_index_settings.auto_extract_knowledge = True
    settings.semantic_ref_index_settings.knowledge_extractor = FakeExtractor()
    conv = await create_conversation(None, ConversationMessage, settings=settings)
    await conv.add_messages_with_indexing(
        [msg("fugue counterpoint study"), msg("harpsichord tuning notes")]
    )
    found = await search_conversation(
        conv,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("fugue"))]),
        options=SearchOptions(exact_match=False),
        raw_search_query="fugue",
    )
    assert found.knowledge_matches
    index = conv.secondary_indexes.message_index
    hits = await index.lookup_messages("counterpoint", max_matches=1)
    assert hits and hits[0].message_ordinal == 0
