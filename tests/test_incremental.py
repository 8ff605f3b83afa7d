"""Restartability: incremental indexing, source-id dedupe, DB reopen.

(Reference mechanism: tests/test_incremental_index.py,
test_podcast_incremental.py, test_source_id_ingestion.py.)
"""

import os
from datetime import datetime, timezone

import pytest

from tests.test_persistence import WordExtractor, make_settings, msg
from typeagent_tpu import create_conversation
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
from typeagent_tpu.knowpro.universal_message import ConversationMessage
from typeagent_tpu.podcasts.podcast_ingest import ingest_podcast

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")


async def test_reopen_add_more_and_reindex(tmp_path):
    """Reopen a DB, add more messages, verify ordinals + search continuity."""
    db = str(tmp_path / "incr.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    await conv.add_messages_with_indexing(
        [msg("alpha message one"), msg("beta message two")]
    )
    semrefs_before = await conv.semantic_refs.size()
    await conv.storage_provider.close()

    conv2 = await create_conversation(db, ConversationMessage, settings=make_settings())
    assert await conv2.messages.size() == 2
    assert await conv2.semantic_refs.size() == semrefs_before
    await conv2.add_messages_with_indexing([msg("gamma message three")])
    assert await conv2.messages.size() == 3
    # New semrefs continue the ordinal sequence with correct ranges.
    last = await conv2.semantic_refs.get_item(await conv2.semantic_refs.size() - 1)
    assert last.range.start.message_ordinal == 2
    # Both old and new content searchable after reopen.
    for term, expected_msg in [("alpha", 0), ("gamma", 2)]:
        found = await search_conversation(
            conv2,
            SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term(term))]),
            options=SearchOptions(exact_match=True),
            raw_search_query=term,
        )
        assert found.message_matches
        assert found.message_matches[0].message_ordinal == expected_msg
    await conv2.storage_provider.close()


async def test_source_id_dedupe_flow(tmp_path):
    """are_sources_ingested lets ingesters skip already-done sources."""
    db = str(tmp_path / "dedupe.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    batch = [msg("first", source_id="src-1"), msg("second", source_id="src-2")]
    await conv.add_messages_with_indexing(batch)

    incoming = [
        msg("first", source_id="src-1"),  # duplicate
        msg("third", source_id="src-3"),
    ]
    done = await conv.storage_provider.are_sources_ingested(
        [m.source_id for m in incoming]
    )
    fresh = [m for m in incoming if m.source_id not in done]
    assert [m.source_id for m in fresh] == ["src-3"]
    await conv.add_messages_with_indexing(fresh)
    assert await conv.messages.size() == 3
    await conv.storage_provider.close()


async def test_podcast_incremental_resume(tmp_path):
    """start_message resumes a partially ingested podcast."""
    db = str(tmp_path / "podcast.db")
    settings = make_settings()
    pod = await ingest_podcast(
        os.path.join(TESTDATA, "mini_podcast.txt"),
        settings,
        start_date=datetime(2024, 1, 1, tzinfo=timezone.utc),
        dbname=db,
        batch_size=2,
    )
    total = await pod.messages.size()
    assert total == 4
    await pod.storage_provider.close()

    # Resuming from the end is a no-op ingest.
    pod2 = await ingest_podcast(
        os.path.join(TESTDATA, "mini_podcast.txt"),
        make_settings(),
        start_date=datetime(2024, 1, 1, tzinfo=timezone.utc),
        dbname=db,
        start_message=total,
    )
    assert await pod2.messages.size() == total
    await pod2.storage_provider.close()

    # Refusing to restart from before the current watermark.
    with pytest.raises(RuntimeError, match="start_message"):
        await ingest_podcast(
            os.path.join(TESTDATA, "mini_podcast.txt"),
            make_settings(),
            dbname=db,
            start_message=0,
        )


async def test_chunk_failure_recording_for_retry(tmp_path):
    """Failed chunks land in the ChunkFailures table for later re-extraction."""
    db = str(tmp_path / "fail.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    await conv.storage_provider.record_chunk_failure(3, 1, "RuntimeError", "llm said no")
    async with conv.storage_provider:
        pass  # commit
    await conv.storage_provider.close()

    conv2 = await create_conversation(db, ConversationMessage, settings=make_settings())
    failures = await conv2.storage_provider.get_chunk_failures()
    assert len(failures) == 1
    assert failures[0].message_ordinal == 3 and failures[0].chunk_ordinal == 1
    await conv2.storage_provider.clear_chunk_failure(3, 1)
    assert await conv2.storage_provider.get_chunk_failures() == []
    await conv2.storage_provider.close()


async def test_reextract_failed_chunks(tmp_path):
    """Recorded failures on stored messages get re-extracted and cleared."""
    from typeagent_tpu.tools.reextract import reextract_failed_chunks
    from typeagent_tpu.models.result import Success
    from typeagent_tpu.knowpro import kplib

    db = str(tmp_path / "reextract.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    await conv.add_messages_with_indexing([msg("recoverable content here")])
    semrefs_before = await conv.semantic_refs.size()
    # Simulate a chunk whose LLM extraction failed at ingest time.
    async with conv.storage_provider:
        await conv.storage_provider.record_chunk_failure(
            0, 0, "RuntimeError", "llm flaked"
        )
    # Also one for a message that was never stored (skip path).
    async with conv.storage_provider:
        await conv.storage_provider.record_chunk_failure(
            99, 0, "RuntimeError", "[source_id=gone] skipped"
        )

    class RecoveringExtractor:
        async def extract(self, text):
            return Success(
                kplib.KnowledgeResponse(
                    entities=[kplib.ConcreteEntity("recovered", ["thing"])],
                    actions=[],
                    inverse_actions=[],
                    topics=["recovery"],
                )
            )

    succeeded, still_failed = await reextract_failed_chunks(
        conv, extractor=RecoveringExtractor()
    )
    assert succeeded == 1 and still_failed == 1
    assert await conv.semantic_refs.size() > semrefs_before
    remaining = await conv.storage_provider.get_chunk_failures()
    assert [(f.message_ordinal, f.chunk_ordinal) for f in remaining] == [(99, 0)]
    # Recovered knowledge is searchable.
    found = await search_conversation(
        conv,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("recovered"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="recovered",
    )
    assert found.knowledge_matches
    await conv.storage_provider.close()


async def test_no_source_id_messages_always_reingest(tmp_path):
    """Messages without a source_id are never deduped: replaying them
    appends again (only source-id tracking provides idempotency)."""
    db = str(tmp_path / "nosrc.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    await conv.add_messages_with_indexing([msg("hello"), msg("world")])
    await conv.add_messages_with_indexing([msg("hello"), msg("world")])
    assert await conv.messages.size() == 4
    assert await conv.storage_provider.are_sources_ingested(["hello"]) == set()
    await conv.storage_provider.close()


async def test_mark_sources_ingested_batch_empty_and_idempotent(tmp_path):
    db = str(tmp_path / "mark.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    provider = conv.storage_provider
    await provider.mark_sources_ingested_batch([])  # no-op, no error
    await provider.mark_sources_ingested_batch(["a", "b"])
    await provider.mark_sources_ingested_batch(["a", "b"])  # idempotent replace
    assert await provider.are_sources_ingested(["a", "b", "c"]) == {"a", "b"}
    cursor = provider.db.cursor()
    cursor.execute("SELECT COUNT(*) FROM IngestedSources")
    assert cursor.fetchone()[0] == 2
    await provider.close()


@pytest.mark.parametrize("backend", ["memory", "sqlite"])
async def test_message_index_catches_up_after_unindexed_extend(tmp_path, backend):
    """A lagging message-text index is rebased and caught up by the next
    indexed add.

    Snapshot loads (convfiles.py) and bulk loaders extend the message
    collection with ``index_messages=False``; the text index then lags the
    collection. The next ``add_messages_with_indexing`` must index the
    lagging prefix AND the new tail at their true global ordinals — passing
    the tail slice to ``add_messages`` (which skips by its own indexed
    count assuming the FULL list) used to index the new message at
    ordinal 0.
    """
    db = None if backend == "memory" else str(tmp_path / "lag.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    await conv.messages.extend(
        [msg("alpha lagging text"), msg("beta lagging text")],
        index_messages=False,
    )
    index = conv.secondary_indexes.message_index
    assert await index.indexed_message_count() == 0

    await conv.add_messages_with_indexing([msg("gamma fresh text")])

    assert await conv.messages.size() == 3
    assert await index.indexed_message_count() == 3
    for term, expected_ordinal in [
        ("alpha lagging text", 0),
        ("beta lagging text", 1),
        ("gamma fresh text", 2),
    ]:
        hits = await index.lookup_messages(term, max_matches=1)
        assert hits, term
        assert hits[0].message_ordinal == expected_ordinal
    await conv.storage_provider.close()


@pytest.mark.parametrize("backend", ["memory", "sqlite"])
async def test_message_index_noop_when_already_fed_by_extend(tmp_path, backend):
    """The ordinary path (extend auto-feeds the index) must not re-index:
    indexed_message_count equals the collection size and chunk-row count
    stays exactly one per single-chunk message."""
    db = None if backend == "memory" else str(tmp_path / "fed.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    await conv.add_messages_with_indexing([msg("one solo"), msg("two solo")])
    index = conv.secondary_indexes.message_index
    assert await index.indexed_message_count() == 2
    assert await index.size() == 2  # chunk rows: no duplicates
    await conv.storage_provider.close()


@pytest.mark.parametrize("backend", ["memory", "sqlite"])
async def test_zero_chunk_tail_message_keeps_ordinals_aligned(tmp_path, backend):
    """A zero-chunk tail message contributes no index rows, so the
    max-ordinal count under-reports and each later ingest re-runs a no-op
    catch-up — which must be idempotent and keep subsequent messages at
    their true ordinals."""
    db = None if backend == "memory" else str(tmp_path / "zc.db")
    conv = await create_conversation(db, ConversationMessage, settings=make_settings())
    empty = ConversationMessage(
        text_chunks=[], metadata=msg("x").metadata
    )
    await conv.add_messages_with_indexing([msg("first real text"), empty])
    await conv.add_messages_with_indexing([msg("second real text")])
    await conv.add_messages_with_indexing([msg("third real text")])
    index = conv.secondary_indexes.message_index
    assert await conv.messages.size() == 4
    assert await index.size() == 3  # chunk rows: one per non-empty message
    for term, expected_ordinal in [
        ("first real text", 0),
        ("second real text", 2),
        ("third real text", 3),
    ]:
        hits = await index.lookup_messages(term, max_matches=1)
        assert hits and hits[0].message_ordinal == expected_ordinal
    await conv.storage_provider.close()
