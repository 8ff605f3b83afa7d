"""Streaming pipeline stages tested in isolation.

(Reference mechanism: tests/test_add_messages_pipeline.py imports the stage
functions directly — producer, dispatcher, reassembler.)
"""

import asyncio

import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.add_messages import (
    ChunkProcessingResult,
    ChunkWorkItem,
    NoOpKnowledgeExtractor,
    PipelineStopState,
    ProducerState,
    _dispatcher_task,
    _producer_task,
    _reassembler_task,
    process_chunk_with_extraction_and_embeddings,
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
    return ChunkProcessingResult(
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
    chunk_queue = asyncio.Queue()
    result_queue = asyncio.Queue()
    stop = PipelineStopState()
    state = ProducerState(next_message_id=5)
    messages = [msg("a", "b"), msg("c")]
    await _producer_task(_aiter(messages), chunk_queue, stop, state, result_queue, None)
    items = []
    while not chunk_queue.empty():
        items.append(chunk_queue.get_nowait())
    assert items[-1] is None
    work = items[:-1]
    assert [(w.chunk_id.message_ordinal, w.chunk_id.chunk_ordinal) for w in work] == [
        (5, 0), (5, 1), (6, 0),
    ]
    assert state.produced_messages == 2 and state.produced_chunks == 3


async def test_producer_zero_chunk_message_bypasses_dispatcher():
    chunk_queue = asyncio.Queue()
    result_queue = asyncio.Queue()
    state = ProducerState(next_message_id=0)
    await _producer_task(
        _aiter([ConversationMessage([], ConversationMessageMeta("A"))]),
        chunk_queue, PipelineStopState(), state, result_queue, None,
    )
    result = result_queue.get_nowait()
    assert result.chunk_count == 0
    assert chunk_queue.get_nowait() is None  # only sentinel


async def test_producer_respects_stop_watermark():
    chunk_queue = asyncio.Queue()
    stop = PipelineStopState(stop_at_message_id=1)
    state = ProducerState(next_message_id=0)
    await _producer_task(
        _aiter([msg("a"), msg("b"), msg("c")]),
        chunk_queue, stop, state, asyncio.Queue(), None,
    )
    work = []
    while not chunk_queue.empty():
        item = chunk_queue.get_nowait()
        if item is not None:
            work.append(item)
    assert [w.chunk_id.message_ordinal for w in work] == [0]


async def test_producer_iterator_exception_recorded():
    async def broken():
        yield msg("ok")
        raise RuntimeError("stream broke")

    chunk_queue = asyncio.Queue()
    state = ProducerState(next_message_id=0)
    await _producer_task(
        broken(), chunk_queue, PipelineStopState(), state, asyncio.Queue(), None
    )
    assert isinstance(state.exception, RuntimeError)
    # Sentinel still sent so the dispatcher shuts down.
    items = []
    while not chunk_queue.empty():
        items.append(chunk_queue.get_nowait())
    assert items[-1] is None


# ---------------------------------------------------------------------------
# Chunk processing
# ---------------------------------------------------------------------------


async def test_process_chunk_success():
    model = create_test_embedding_model(8)
    result = await process_chunk_with_extraction_and_embeddings(
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

    result = await process_chunk_with_extraction_and_embeddings(
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

    result = await process_chunk_with_extraction_and_embeddings(
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
    result_queue = asyncio.Queue()
    m0, m1 = msg("a", "b"), msg("c")
    # m1 completes before m0 — nothing commits until m0's chunks all arrive.
    await result_queue.put(_chunk_result(m1, 1, 0, 1))
    await result_queue.put(_chunk_result(m0, 0, 1, 2))
    await result_queue.put(_chunk_result(m0, 0, 0, 2))
    await result_queue.put(None)
    commits = []

    async def commit(messages, results):
        commits.append(([id(m) for m in messages], len(results)))

    state = await _reassembler_task(
        result_queue, PipelineStopState(), 0, 100, commit, False
    )
    assert len(commits) == 1
    assert commits[0] == ([id(m0), id(m1)], 3)
    assert state.messages_committed == 2 and state.chunks_committed == 3


async def test_reassembler_batch_pre_flush():
    result_queue = asyncio.Queue()
    messages = [msg("x") for _ in range(5)]
    for i, m in enumerate(messages):
        await result_queue.put(_chunk_result(m, i, 0, 1))
    await result_queue.put(None)
    commits = []

    async def commit(ms, results):
        commits.append(len(ms))

    state = await _reassembler_task(
        result_queue, PipelineStopState(), 0, 2, commit, False
    )
    assert sum(commits) == 5
    assert all(c <= 2 for c in commits)


async def test_reassembler_validation_errors():
    # Duplicate chunk
    result_queue = asyncio.Queue()
    m = msg("a", "b")
    await result_queue.put(_chunk_result(m, 0, 0, 2))
    await result_queue.put(_chunk_result(m, 0, 0, 2))
    await result_queue.put(None)

    async def commit(ms, results):
        pass

    with pytest.raises(RuntimeError, match="Duplicate chunk"):
        await _reassembler_task(
            result_queue, PipelineStopState(), 0, 10, commit, False
        )

    # Bad chunk ordinal
    result_queue = asyncio.Queue()
    await result_queue.put(_chunk_result(m, 0, 7, 2))
    await result_queue.put(None)
    with pytest.raises(RuntimeError, match="Invalid chunk ordinal"):
        await _reassembler_task(
            result_queue, PipelineStopState(), 0, 10, commit, False
        )


async def test_reassembler_halts_behind_failed_message():
    result_queue = asyncio.Queue()
    m0, m1 = msg("a"), msg("b")
    await result_queue.put(_chunk_result(m0, 0, 0, 1, error=RuntimeError("boom")))
    await result_queue.put(_chunk_result(m1, 1, 0, 1))
    await result_queue.put(None)
    commits = []

    async def commit(ms, results):
        commits.append(len(ms))

    stop = PipelineStopState()
    state = await _reassembler_task(result_queue, stop, 0, 10, commit, False)
    assert commits == []  # nothing after the failed message commits
    assert state.chunk_failures == 1
    assert stop.stop_at_message_id == 0
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
    return ChunkWorkItem(
        chunk_id=TextLocation(msg_id, chunk_ord),
        chunk_text=text,
        chunk_count=chunk_count,
        message=message,
    )


async def _run_dispatcher(items, stop, skip_failed=False, concurrency=2):
    chunk_queue = asyncio.Queue()
    result_queue = asyncio.Queue()
    for item in items:
        await chunk_queue.put(item)
    await chunk_queue.put(None)
    await _dispatcher_task(
        chunk_queue,
        result_queue,
        stop,
        _FailOn("BAD"),
        create_test_embedding_model(8),
        concurrency,
        skip_failed,
    )
    results = []
    while not result_queue.empty():
        results.append(result_queue.get_nowait())
    assert results[-1] is None  # sentinel emitted after workers drain
    return results[:-1]


async def test_dispatcher_processes_and_emits_sentinel():
    m = msg("a", "b")
    results = await _run_dispatcher(
        [_work(m, 0, 0, 2, "a"), _work(m, 0, 1, 2, "b")], PipelineStopState()
    )
    assert len(results) == 2
    assert all(r.error is None for r in results)


async def test_dispatcher_failure_lowers_stop_watermark():
    m0, m1 = msg("BAD"), msg("fine")
    stop = PipelineStopState()
    results = await _run_dispatcher(
        [_work(m0, 3, 0, 1, "BAD"), _work(m1, 4, 0, 1, "fine")],
        stop,
        concurrency=1,
    )
    assert stop.stop_at_message_id == 3
    assert stop.exception is not None
    by_id = {r.chunk_id.message_ordinal: r for r in results}
    assert by_id[3].error is not None
    # The later chunk became a deterministic skip (>= watermark).
    assert by_id[4].error is not None
    assert "stop_at_message_id" in str(by_id[4].error)


async def test_dispatcher_skip_failed_keeps_processing():
    m0, m1 = msg("BAD"), msg("fine")
    stop = PipelineStopState()
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
    result_queue = asyncio.Queue()
    m0, m1, m2 = msg("a"), msg("b", "b2"), msg("c")
    # m2 and m1's tail arrive before m1's head; commits happen once the
    # consecutive prefix is complete.
    await result_queue.put(_chunk_result(m2, 2, 0, 1))
    await result_queue.put(_chunk_result(m1, 1, 1, 2))
    await result_queue.put(_chunk_result(m0, 0, 0, 1))
    await result_queue.put(_chunk_result(m1, 1, 0, 2))
    await result_queue.put(None)
    commits = []

    async def commit(ms, results):
        commits.append([id(m) for m in ms])

    state = await _reassembler_task(
        result_queue, PipelineStopState(), 0, 100, commit, False
    )
    assert state.messages_committed == 3
    flat = [m for batch in commits for m in batch]
    assert flat == [id(m0), id(m1), id(m2)]


async def test_reassembler_skip_failed_commits_later_messages():
    result_queue = asyncio.Queue()
    m0, m1, m2 = msg("a"), msg("b"), msg("c")
    await result_queue.put(_chunk_result(m0, 0, 0, 1))
    await result_queue.put(_chunk_result(m1, 1, 0, 1, error=RuntimeError("x")))
    await result_queue.put(_chunk_result(m2, 2, 0, 1))
    await result_queue.put(None)
    commits = []
    skipped = []

    async def commit(ms, results):
        commits.extend(id(m) for m in ms)

    async def on_skip(assembly):
        skipped.append(assembly.message_id)

    state = await _reassembler_task(
        result_queue, PipelineStopState(), 0, 100, commit, True, on_skip
    )
    assert commits == [id(m0), id(m2)]
    assert state.messages_skipped == 1
    assert skipped == [1]


async def test_reassembler_mismatched_chunk_count_raises():
    result_queue = asyncio.Queue()
    m = msg("a", "b")
    await result_queue.put(_chunk_result(m, 0, 0, 2))
    await result_queue.put(_chunk_result(m, 0, 1, 3))  # disagreeing count
    await result_queue.put(None)

    async def commit(ms, results):
        pass

    stop = PipelineStopState()
    with pytest.raises(RuntimeError):
        await _reassembler_task(result_queue, stop, 0, 10, commit, False)
    assert stop.stop_at_message_id == 0  # watermark lowered for the producer


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
    result = await process_chunk_with_extraction_and_embeddings(
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
    result = await process_chunk_with_extraction_and_embeddings(
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

    result = await process_chunk_with_extraction_and_embeddings(
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
    chunk_queue = asyncio.Queue(maxsize=1)  # forces the producer to yield
    stop = PipelineStopState()
    state = ProducerState(next_message_id=0)

    producer = asyncio.create_task(
        _producer_task(
            _aiter([msg("a", "b", "c")]),
            chunk_queue,
            stop,
            state,
            asyncio.Queue(),
            None,
        )
    )
    first = await chunk_queue.get()  # chunk (0, 0); producer blocks on (0, 1)
    assert first.chunk_id.chunk_ordinal == 0
    stop.stop_at_message_id = 0  # failure watermark drops mid-message
    rest = []
    while True:
        item = await chunk_queue.get()
        if item is None:
            break
        rest.append(item)
    await producer
    # Exactly one more chunk may have been staged before the drop was seen.
    assert len(rest) <= 1
    assert state.produced_chunks <= 2


async def test_reassembler_duplicate_chunk_sets_stop_marker():
    result_queue = asyncio.Queue()
    m = msg("a", "b")
    await result_queue.put(_chunk_result(m, 3, 0, 2))
    await result_queue.put(_chunk_result(m, 3, 0, 2))
    await result_queue.put(None)

    async def commit(ms, results):
        pass

    stop = PipelineStopState()
    with pytest.raises(RuntimeError, match="Duplicate chunk"):
        await _reassembler_task(result_queue, stop, 0, 10, commit, False)
    assert stop.stop_at_message_id == 3


async def test_reassembler_invalid_ordinal_sets_stop_marker():
    result_queue = asyncio.Queue()
    m = msg("a", "b")
    await result_queue.put(_chunk_result(m, 7, 9, 2))
    await result_queue.put(None)

    async def commit(ms, results):
        pass

    stop = PipelineStopState()
    with pytest.raises(RuntimeError, match="Invalid chunk ordinal"):
        await _reassembler_task(result_queue, stop, 0, 10, commit, False)
    assert stop.stop_at_message_id == 7
