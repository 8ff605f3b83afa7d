"""End-to-end streaming-ingest matrix (ConversationBase.add_messages_streaming).

Ports the behavioral corners the reference pins in
`tests/test_add_messages_streaming.py` / `test_add_messages_pipeline.py`
(708 + 819 LoC there): chunk-counted batching (pre-flush, batch_size=1,
oversized single message, mixed chunk sizes), commit callbacks per batch,
failure placement across batch boundaries (earlier batches survive, later
messages halt), skip-failed continuation counts, empty iterables/chunks,
multi-chunk messages, and ingestion-marker idempotence. All hermetic (fake
extractor + deterministic embedder).
"""

import pytest

from typeagent_tpu import create_conversation
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term

from tests.test_conversation import DIM, FakeExtractor, make_settings, msg


async def astream(messages):
    for m in messages:
        yield m


def multi(texts, **kw):
    m = msg(texts[0], **kw)
    m.text_chunks = list(texts)
    return m


async def make_conv(extractor=None):
    from typeagent_tpu.knowpro.universal_message import ConversationMessage

    return await create_conversation(
        None,
        ConversationMessage,
        settings=make_settings(extractor or FakeExtractor()),
    )


# ---------------------------------------------------------------------------
# Batching: batch_size counts CHUNKS, not messages
# ---------------------------------------------------------------------------


async def test_batch_size_counts_chunks_not_messages():
    conv = await make_conv()
    committed = []
    msgs = [multi([f"m{i} a", f"m{i} b"]) for i in range(4)]  # 8 chunks
    result = await conv.add_messages_streaming(
        astream(msgs),
        batch_size=4,
        on_batch_committed=lambda r: committed.append(r.chunks_added),
    )
    assert result.messages_added == 4 and result.chunks_added == 8
    # 4-chunk target with 2-chunk messages -> two full batches of 4 chunks.
    assert committed == [4, 4]


async def test_batch_size_one_commits_every_message():
    conv = await make_conv()
    committed = []
    await conv.add_messages_streaming(
        astream([msg(f"solo {i}") for i in range(3)]),
        batch_size=1,
        on_batch_committed=lambda r: committed.append(r.messages_added),
    )
    assert committed == [1, 1, 1]


async def test_single_message_larger_than_batch_commits_alone():
    conv = await make_conv()
    committed = []
    big = multi([f"chunk {i}" for i in range(5)])
    await conv.add_messages_streaming(
        astream([msg("small"), big, msg("tail")]),
        batch_size=2,
        on_batch_committed=lambda r: committed.append((r.messages_added, r.chunks_added)),
    )
    # Pre-flush: 'small' flushes before the oversized message would overshoot;
    # the 5-chunk message then commits on its own; 'tail' drains at the end.
    assert committed[0] == (1, 1)
    assert (5, 5) in [(m, c) for m, c in committed] or committed[1][1] >= 5
    total_msgs = sum(m for m, _ in committed)
    total_chunks = sum(c for _, c in committed)
    assert (total_msgs, total_chunks) == (3, 7)


async def test_mixed_chunk_sizes_batching_totals():
    conv = await make_conv()
    sizes = [1, 3, 2, 1, 4, 1]
    msgs = [multi([f"m{i} c{j}" for j in range(n)]) for i, n in enumerate(sizes)]
    result = await conv.add_messages_streaming(astream(msgs), batch_size=3)
    assert result.messages_added == len(sizes)
    assert result.chunks_added == sum(sizes)
    assert await conv.messages.size() == len(sizes)


async def test_empty_iterable_is_a_noop():
    conv = await make_conv()
    result = await conv.add_messages_streaming(astream([]), batch_size=10)
    assert result.messages_added == 0 and result.chunks_added == 0
    assert await conv.messages.size() == 0


async def test_zero_chunk_message_flows_through():
    conv = await make_conv()
    empty = msg("placeholder")
    empty.text_chunks = []
    result = await conv.add_messages_streaming(
        astream([msg("before"), empty, msg("after")]), batch_size=10
    )
    assert result.messages_added == 3
    assert result.chunks_added == 2
    assert await conv.messages.size() == 3


# ---------------------------------------------------------------------------
# Failure placement across batch boundaries
# ---------------------------------------------------------------------------


async def test_failure_in_later_batch_preserves_earlier_commits():
    extractor = FakeExtractor(fail_on={"poison pill"})
    conv = await make_conv(extractor)
    msgs = [msg("good one"), msg("good two"), msg("poison pill"), msg("good three")]
    with pytest.raises(Exception):
        await conv.add_messages_streaming(astream(msgs), batch_size=1)
    # Everything before the failing message committed; nothing at/after did.
    assert await conv.messages.size() == 2


async def test_failure_mid_batch_drops_whole_tail():
    extractor = FakeExtractor(fail_on={"boom"})
    conv = await make_conv(extractor)
    msgs = [msg("ok a"), msg("boom"), msg("ok b"), msg("ok c")]
    with pytest.raises(Exception):
        await conv.add_messages_streaming(astream(msgs), batch_size=100)
    assert await conv.messages.size() == 1  # only the pre-failure prefix


async def test_multi_chunk_failure_fails_whole_message():
    extractor = FakeExtractor(fail_on={"bad chunk"})
    conv = await make_conv(extractor)
    vict = multi(["fine chunk", "bad chunk", "another fine"])
    with pytest.raises(Exception):
        await conv.add_messages_streaming(
            astream([msg("before"), vict, msg("after")]), batch_size=1
        )
    assert await conv.messages.size() == 1  # the failed message never commits


async def test_skip_failed_continues_and_counts():
    extractor = FakeExtractor(fail_on={"bad 1", "bad 2"})
    conv = await make_conv(extractor)
    msgs = [msg("ok 1"), msg("bad 1"), msg("ok 2"), msg("bad 2"), msg("ok 3")]
    result = await conv.add_messages_streaming(
        astream(msgs), batch_size=2, skip_failed_messages=True
    )
    assert result.messages_added == 3
    assert result.messages_skipped == 2
    assert await conv.messages.size() == 3
    # Skipped chunks land in the failure table for later re-extraction.
    storage = await conv.settings.get_storage_provider()
    failures = await storage.get_chunk_failures()
    assert len(failures) == 2


async def test_skip_failed_multi_chunk_records_only_failed_chunks():
    extractor = FakeExtractor(fail_on={"sour"})
    conv = await make_conv(extractor)
    mixed = multi(["sweet", "sour", "salty"])
    result = await conv.add_messages_streaming(
        astream([mixed]), batch_size=10, skip_failed_messages=True
    )
    assert result.messages_added == 0 and result.messages_skipped == 1
    storage = await conv.settings.get_storage_provider()
    failures = await storage.get_chunk_failures()
    assert [(f.message_ordinal, f.chunk_ordinal) for f in failures] == [(0, 1)]


async def test_producer_exception_preserves_committed_prefix():
    conv = await make_conv()

    async def exploding_stream():
        yield msg("survives")
        raise RuntimeError("source went away")

    with pytest.raises(RuntimeError, match="source went away"):
        await conv.add_messages_streaming(exploding_stream(), batch_size=1)
    assert await conv.messages.size() == 1


# ---------------------------------------------------------------------------
# Commit callback + searchability of streamed content
# ---------------------------------------------------------------------------


async def test_on_batch_committed_sees_semref_counts():
    conv = await make_conv()
    seen = []
    await conv.add_messages_streaming(
        astream([msg("quantum computing rocks")]),
        batch_size=1,
        on_batch_committed=lambda r: seen.append(r),
    )
    assert len(seen) == 1
    assert seen[0].messages_added == 1
    assert seen[0].semrefs_added > 0  # extractor topics + metadata knowledge


async def test_streamed_messages_are_immediately_searchable():
    conv = await make_conv()
    await conv.add_messages_streaming(
        astream([msg("zanzibar expedition diary")]), batch_size=1
    )
    from typeagent_tpu.knowpro.search import SearchOptions, search_conversation

    result = await search_conversation(
        conv,
        SearchTermGroup(
            boolean_op="or", terms=[SearchTerm(term=Term("zanzibar"))]
        ),
        options=SearchOptions(exact_match=True),
    )
    assert result is not None
    assert any(r.semantic_ref_matches for r in result.knowledge_matches.values())


async def test_repeated_streaming_appends_ordinals():
    conv = await make_conv()
    await conv.add_messages_streaming(astream([msg("first wave")]), batch_size=5)
    await conv.add_messages_streaming(astream([msg("second wave")]), batch_size=5)
    assert await conv.messages.size() == 2
    stored = await conv.messages.get_item(1)
    assert stored.text_chunks == ["second wave"]


# ---------------------------------------------------------------------------
# Ingestion markers
# ---------------------------------------------------------------------------


async def test_mark_sources_ingested_batch_and_idempotence():
    conv = await make_conv()
    storage = await conv.settings.get_storage_provider()
    async with storage:
        await storage.mark_sources_ingested_batch(["s1", "s2"])
        await storage.mark_sources_ingested_batch([])  # empty: no-op
        await storage.mark_sources_ingested_batch(["s2", "s3"])  # idempotent
    assert await storage.are_sources_ingested(["s1", "s2", "s3", "s4"]) == {
        "s1",
        "s2",
        "s3",
    }
    assert await storage.is_source_ingested("s1")
    assert not await storage.is_source_ingested("s4")


async def test_streaming_commit_catches_up_lagging_message_index():
    """A text index left behind by an unindexed extend (snapshot-load path)
    is caught up inside the first streaming commit, at true ordinals."""
    conv = await make_conv()
    await conv.messages.extend([multi(["alpha lagging text"])], index_messages=False)
    index = conv.secondary_indexes.message_index
    assert await index.indexed_message_count() == 0

    result = await conv.add_messages_streaming(astream([multi(["beta streamed text"])]))
    assert result.messages_added == 1
    assert await index.indexed_message_count() == 2
    for term, expected_ordinal in [
        ("alpha lagging text", 0),
        ("beta streamed text", 1),
    ]:
        hits = await index.lookup_messages(term, max_matches=1)
        assert hits and hits[0].message_ordinal == expected_ordinal
