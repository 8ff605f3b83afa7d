"""Streaming pipeline stages tested in isolation.

(Reference mechanism: tests/test_add_messages_pipeline.py imports the stage
functions directly — producer, dispatcher, reassembler.)
"""

import asyncio

import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.add_messages import (
    ChunkOutcome,
    ChunkTask,
    NoOpKnowledgeExtractor,
    StopWatermark,
    FeedState,
    _fanout_stage,
    _feed_stage,
    _commit_stage,
    process_chunk,
)
from typeagent_tpu.knowpro.interfaces import TextLocation
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.models.result import Failure, Success


def msg(*chunks):
    return ConversationMessage(list(chunks), ConversationMessageMeta("A"))


def _chunk_result(message, msg_id, chunk_ord, chunk_count, error=None):
    return ChunkOutcome(
        chunk_id=TextLocation(msg_id, chunk_ord),
        chunk_count=chunk_count,
        message=message,
        error=error,
    )


async def _aiter(items):
    for item in items:
        yield item


# ---------------------------------------------------------------------------
# Producer
# ---------------------------------------------------------------------------


async def test_producer_enqueues_chunks_and_sentinel():
    task_queue = asyncio.Queue()
    outcome_queue = asyncio.Queue()
    stop = StopWatermark()
    state = FeedState(next_message_id=5)
    messages = [msg("a", "b"), msg("c")]
    await _feed_stage(_aiter(messages), task_queue, stop, state, outcome_queue, None)
    items = []
    while not task_queue.empty():
        items.append(task_queue.get_nowait())
    assert items[-1] is None
    work = items[:-1]
    assert [(w.chunk_id.message_ordinal, w.chunk_id.chunk_ordinal) for w in work] == [
        (5, 0), (5, 1), (6, 0),
    ]
    assert state.produced_messages == 2 and state.produced_chunks == 3


async def test_producer_zero_chunk_message_bypasses_dispatcher():
    task_queue = asyncio.Queue()
    outcome_queue = asyncio.Queue()
    state = FeedState(next_message_id=0)
    await _feed_stage(
        _aiter([ConversationMessage([], ConversationMessageMeta("A"))]),
        task_queue, StopWatermark(), state, outcome_queue, None,
    )
    result = outcome_queue.get_nowait()
    assert result.chunk_count == 0
    assert task_queue.get_nowait() is None  # only sentinel


async def test_producer_respects_stop_watermark():
    task_queue = asyncio.Queue()
    stop = StopWatermark(halt_before=1)
    state = FeedState(next_message_id=0)
    await _feed_stage(
        _aiter([msg("a"), msg("b"), msg("c")]),
        task_queue, stop, state, asyncio.Queue(), None,
    )
    work = []
    while not task_queue.empty():
        item = task_queue.get_nowait()
        if item is not None:
            work.append(item)
    assert [w.chunk_id.message_ordinal for w in work] == [0]


async def test_producer_iterator_exception_recorded():
    async def broken():
        yield msg("ok")
        raise RuntimeError("stream broke")

    task_queue = asyncio.Queue()
    state = FeedState(next_message_id=0)
    await _feed_stage(
        broken(), task_queue, StopWatermark(), state, asyncio.Queue(), None
    )
    assert isinstance(state.exception, RuntimeError)
    # Sentinel still sent so the dispatcher shuts down.
    items = []
    while not task_queue.empty():
        items.append(task_queue.get_nowait())
    assert items[-1] is None


# ---------------------------------------------------------------------------
# Chunk processing
# ---------------------------------------------------------------------------


async def test_process_chunk_success():
    model = create_test_embedding_model(8)
    result = await process_chunk(
        chunk_id=TextLocation(0, 0),
        chunk_text="some text",
        chunk_count=1,
        message=msg("some text"),
        knowledge_extractor=NoOpKnowledgeExtractor(),
        embedding_model=model,
    )
    assert result.error is None
    assert result.chunk_embedding is not None
    assert result.extracted_knowledge is not None
    assert result.related_terms == []  # no-op extractor yields no knowledge


async def test_process_chunk_extraction_failure_captured():
    class FailingExtractor:
        async def extract(self, text):
            return Failure("nope")

    result = await process_chunk(
        chunk_id=TextLocation(0, 0),
        chunk_text="text",
        chunk_count=1,
        message=msg("text"),
        knowledge_extractor=FailingExtractor(),
        embedding_model=create_test_embedding_model(8),
    )
    assert result.error is not None
    assert "nope" in str(result.error)


async def test_process_chunk_collects_related_terms():
    class Extractor:
        async def extract(self, text):
            return Success(
                kplib.KnowledgeResponse(
                    entities=[kplib.ConcreteEntity("Bach", ["person", "BACH"])],
                    actions=[],
                    inverse_actions=[],
                    topics=["Music", "music"],
                )
            )

    result = await process_chunk(
        chunk_id=TextLocation(0, 0),
        chunk_text="text",
        chunk_count=1,
        message=msg("text"),
        knowledge_extractor=Extractor(),
        embedding_model=create_test_embedding_model(8),
    )
    # lowercased, order-preserving dedupe
    assert result.related_terms == ["bach", "person", "music"]
    assert len(result.related_term_embeddings) == 3


# ---------------------------------------------------------------------------
# Reassembler
# ---------------------------------------------------------------------------


async def test_reassembler_waits_for_complete_messages():
    outcome_queue = asyncio.Queue()
    m0, m1 = msg("a", "b"), msg("c")
    # m1 completes before m0 — nothing commits until m0's chunks all arrive.
    await outcome_queue.put(_chunk_result(m1, 1, 0, 1))
    await outcome_queue.put(_chunk_result(m0, 0, 1, 2))
    await outcome_queue.put(_chunk_result(m0, 0, 0, 2))
    await outcome_queue.put(None)
    commits = []

    async def commit(messages, results):
        commits.append(([id(m) for m in messages], len(results)))

    state = await _commit_stage(
        outcome_queue, StopWatermark(), 0, 100, commit, False
    )
    assert len(commits) == 1
    assert commits[0] == ([id(m0), id(m1)], 3)
    assert state.messages_committed == 2 and state.chunks_committed == 3


async def test_reassembler_batch_pre_flush():
    outcome_queue = asyncio.Queue()
    messages = [msg("x") for _ in range(5)]
    for i, m in enumerate(messages):
        await outcome_queue.put(_chunk_result(m, i, 0, 1))
    await outcome_queue.put(None)
    commits = []

    async def commit(ms, results):
        commits.append(len(ms))

    state = await _commit_stage(
        outcome_queue, StopWatermark(), 0, 2, commit, False
    )
    assert sum(commits) == 5
    assert all(c <= 2 for c in commits)


async def test_reassembler_validation_errors():
    # Duplicate chunk
    outcome_queue = asyncio.Queue()
    m = msg("a", "b")
    await outcome_queue.put(_chunk_result(m, 0, 0, 2))
    await outcome_queue.put(_chunk_result(m, 0, 0, 2))
    await outcome_queue.put(None)

    async def commit(ms, results):
        pass

    with pytest.raises(RuntimeError, match="Duplicate chunk"):
        await _commit_stage(
            outcome_queue, StopWatermark(), 0, 10, commit, False
        )

    # Bad chunk ordinal
    outcome_queue = asyncio.Queue()
    await outcome_queue.put(_chunk_result(m, 0, 7, 2))
    await outcome_queue.put(None)
    with pytest.raises(RuntimeError, match="Invalid chunk ordinal"):
        await _commit_stage(
            outcome_queue, StopWatermark(), 0, 10, commit, False
        )


async def test_reassembler_halts_behind_failed_message():
    outcome_queue = asyncio.Queue()
    m0, m1 = msg("a"), msg("b")
    await outcome_queue.put(_chunk_result(m0, 0, 0, 1, error=RuntimeError("boom")))
    await outcome_queue.put(_chunk_result(m1, 1, 0, 1))
    await outcome_queue.put(None)
    commits = []

    async def commit(ms, results):
        commits.append(len(ms))

    stop = StopWatermark()
    state = await _commit_stage(outcome_queue, stop, 0, 10, commit, False)
    assert commits == []  # nothing after the failed message commits
    assert state.chunk_failures == 1
    assert stop.halt_before == 0
    assert state.buffered_messages == 2  # both held back


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------


class _FailOn:
    def __init__(self, bad: str):
        self.bad = bad

    async def extract(self, text):
        from typeagent_tpu.models.result import Failure, Success

        if text == self.bad:
            return Failure("bad chunk")
        return Success(
            kplib.KnowledgeResponse(
                entities=[], actions=[], inverse_actions=[], topics=[]
            )
        )


def _work(message, msg_id, chunk_ord, chunk_count, text):
    return ChunkTask(
        chunk_id=TextLocation(msg_id, chunk_ord),
        chunk_text=text,
        chunk_count=chunk_count,
        message=message,
    )


async def _run_dispatcher(items, stop, skip_failed=False, concurrency=2):
    task_queue = asyncio.Queue()
    outcome_queue = asyncio.Queue()
    for item in items:
        await task_queue.put(item)
    await task_queue.put(None)
    await _fanout_stage(
        task_queue,
        outcome_queue,
        stop,
        _FailOn("BAD"),
        create_test_embedding_model(8),
        concurrency,
        skip_failed,
    )
    results = []
    while not outcome_queue.empty():
        results.append(outcome_queue.get_nowait())
    assert results[-1] is None  # sentinel emitted after workers drain
    return results[:-1]


async def test_dispatcher_processes_and_emits_sentinel():
    m = msg("a", "b")
    results = await _run_dispatcher(
        [_work(m, 0, 0, 2, "a"), _work(m, 0, 1, 2, "b")], StopWatermark()
    )
    assert len(results) == 2
    assert all(r.error is None for r in results)


async def test_dispatcher_failure_lowers_stop_watermark():
    m0, m1 = msg("BAD"), msg("fine")
    stop = StopWatermark()
    results = await _run_dispatcher(
        [_work(m0, 3, 0, 1, "BAD"), _work(m1, 4, 0, 1, "fine")],
        stop,
        concurrency=1,
    )
    assert stop.halt_before == 3
    assert stop.exception is not None
    by_id = {r.chunk_id.message_ordinal: r for r in results}
    assert by_id[3].error is not None
    # The later chunk became a deterministic skip (>= watermark).
    assert by_id[4].error is not None
    assert "halt_before" in str(by_id[4].error)


async def test_dispatcher_skip_failed_keeps_processing():
    m0, m1 = msg("BAD"), msg("fine")
    stop = StopWatermark()
    results = await _run_dispatcher(
        [_work(m0, 0, 0, 1, "BAD"), _work(m1, 1, 0, 1, "fine")],
        stop,
        skip_failed=True,
        concurrency=1,
    )
    assert stop.exception is None  # watermark untouched
    by_id = {r.chunk_id.message_ordinal: r for r in results}
    assert by_id[0].error is not None
    assert by_id[1].error is None


# ---------------------------------------------------------------------------
# Reassembler: more edges
# ---------------------------------------------------------------------------


async def test_reassembler_commits_out_of_order_after_gap_fills():
    outcome_queue = asyncio.Queue()
    m0, m1, m2 = msg("a"), msg("b", "b2"), msg("c")
    # m2 and m1's tail arrive before m1's head; commits happen once the
    # consecutive prefix is complete.
    await outcome_queue.put(_chunk_result(m2, 2, 0, 1))
    await outcome_queue.put(_chunk_result(m1, 1, 1, 2))
    await outcome_queue.put(_chunk_result(m0, 0, 0, 1))
    await outcome_queue.put(_chunk_result(m1, 1, 0, 2))
    await outcome_queue.put(None)
    commits = []

    async def commit(ms, results):
        commits.append([id(m) for m in ms])

    state = await _commit_stage(
        outcome_queue, StopWatermark(), 0, 100, commit, False
    )
    assert state.messages_committed == 3
    flat = [m for batch in commits for m in batch]
    assert flat == [id(m0), id(m1), id(m2)]


async def test_reassembler_skip_failed_commits_later_messages():
    outcome_queue = asyncio.Queue()
    m0, m1, m2 = msg("a"), msg("b"), msg("c")
    await outcome_queue.put(_chunk_result(m0, 0, 0, 1))
    await outcome_queue.put(_chunk_result(m1, 1, 0, 1, error=RuntimeError("x")))
    await outcome_queue.put(_chunk_result(m2, 2, 0, 1))
    await outcome_queue.put(None)
    commits = []
    skipped = []

    async def commit(ms, results):
        commits.extend(id(m) for m in ms)

    async def on_skip(entry):
        skipped.append(entry.message_id)

    state = await _commit_stage(
        outcome_queue, StopWatermark(), 0, 100, commit, True, on_skip
    )
    assert commits == [id(m0), id(m2)]
    assert state.messages_skipped == 1
    assert skipped == [1]


async def test_reassembler_mismatched_chunk_count_raises():
    outcome_queue = asyncio.Queue()
    m = msg("a", "b")
    await outcome_queue.put(_chunk_result(m, 0, 0, 2))
    await outcome_queue.put(_chunk_result(m, 0, 1, 3))  # disagreeing count
    await outcome_queue.put(None)

    async def commit(ms, results):
        pass

    stop = StopWatermark()
    with pytest.raises(RuntimeError):
        await _commit_stage(outcome_queue, stop, 0, 10, commit, False)
    assert stop.halt_before == 0  # watermark lowered for the producer


# ---------------------------------------------------------------------------
# Edges matching the reference's deeper pipeline matrix
# (test_add_messages_pipeline.py there: embedding exceptions, mid-message
# stop-marker changes, stop-marker on validation errors)
# ---------------------------------------------------------------------------


class _BrokenEmbeddingModel:
    """Fails exactly one of the two embedding paths."""

    def __init__(self, break_chunk=False, break_related=False):
        self.break_chunk = break_chunk
        self.break_related = break_related
        self._real = create_test_embedding_model(8)

    async def get_embedding_nocache(self, text):
        if self.break_chunk:
            raise ConnectionError("chunk embedding down")
        return await self._real.get_embedding_nocache(text)

    async def get_embeddings(self, texts):
        if self.break_related:
            raise ConnectionError("related embedding down")
        return await self._real.get_embeddings(texts)


class _OneEntityExtractor:
    async def extract(self, text):
        return Success(
            kplib.KnowledgeResponse(
                entities=[kplib.ConcreteEntity("Bach", ["person"])],
                actions=[],
                inverse_actions=[],
                topics=[],
            )
        )


async def test_process_chunk_chunk_embedding_exception_becomes_error():
    result = await process_chunk(
        chunk_id=TextLocation(0, 0),
        chunk_text="text",
        chunk_count=1,
        message=msg("text"),
        knowledge_extractor=NoOpKnowledgeExtractor(),
        embedding_model=_BrokenEmbeddingModel(break_chunk=True),
    )
    assert isinstance(result.error, ConnectionError)
    assert "chunk embedding down" in str(result.error)


async def test_process_chunk_related_embedding_exception_becomes_error():
    result = await process_chunk(
        chunk_id=TextLocation(0, 0),
        chunk_text="text",
        chunk_count=1,
        message=msg("text"),
        knowledge_extractor=_OneEntityExtractor(),
        embedding_model=_BrokenEmbeddingModel(break_related=True),
    )
    assert isinstance(result.error, ConnectionError)
    assert "related embedding down" in str(result.error)


async def test_process_chunk_extractor_exception_becomes_error():
    class ExplodingExtractor:
        async def extract(self, text):
            raise ValueError("extractor crashed")

    result = await process_chunk(
        chunk_id=TextLocation(0, 0),
        chunk_text="text",
        chunk_count=1,
        message=msg("text"),
        knowledge_extractor=ExplodingExtractor(),
        embedding_model=create_test_embedding_model(8),
    )
    assert isinstance(result.error, ValueError)
    # A crashed chunk still identifies itself for failure bookkeeping.
    assert result.chunk_id == TextLocation(0, 0)
    assert result.extracted_knowledge is None


async def test_producer_breaks_inside_chunk_loop_when_stop_marker_drops():
    """A failure elsewhere can lower the watermark while the producer is
    mid-message: remaining chunks of that message must not be enqueued."""
    task_queue = asyncio.Queue(maxsize=1)  # forces the producer to yield
    stop = StopWatermark()
    state = FeedState(next_message_id=0)

    producer = asyncio.create_task(
        _feed_stage(
            _aiter([msg("a", "b", "c")]),
            task_queue,
            stop,
            state,
            asyncio.Queue(),
            None,
        )
    )
    first = await task_queue.get()  # chunk (0, 0); producer blocks on (0, 1)
    assert first.chunk_id.chunk_ordinal == 0
    stop.halt_before = 0  # failure watermark drops mid-message
    rest = []
    while True:
        item = await task_queue.get()
        if item is None:
            break
        rest.append(item)
    await producer
    # Exactly one more chunk may have been staged before the drop was seen.
    assert len(rest) <= 1
    assert state.produced_chunks <= 2


async def test_reassembler_duplicate_chunk_sets_stop_marker():
    outcome_queue = asyncio.Queue()
    m = msg("a", "b")
    await outcome_queue.put(_chunk_result(m, 3, 0, 2))
    await outcome_queue.put(_chunk_result(m, 3, 0, 2))
    await outcome_queue.put(None)

    async def commit(ms, results):
        pass

    stop = StopWatermark()
    with pytest.raises(RuntimeError, match="Duplicate chunk"):
        await _commit_stage(outcome_queue, stop, 0, 10, commit, False)
    assert stop.halt_before == 3


async def test_reassembler_invalid_ordinal_sets_stop_marker():
    outcome_queue = asyncio.Queue()
    m = msg("a", "b")
    await outcome_queue.put(_chunk_result(m, 7, 9, 2))
    await outcome_queue.put(None)

    async def commit(ms, results):
        pass

    stop = StopWatermark()
    with pytest.raises(RuntimeError, match="Invalid chunk ordinal"):
        await _commit_stage(outcome_queue, stop, 0, 10, commit, False)
    assert stop.halt_before == 7
