"""Pipelined streaming ingestion: producer -> dispatcher -> reassembler.

(Parity: reference knowpro/add_messages.py. Invariants preserved:

  * Per-chunk work = LLM knowledge extraction + chunk embedding +
    related-term embeddings, run concurrently per chunk with workers bounded
    by a semaphore.
  * The reassembler commits only consecutive, complete, non-failed messages
    — message N incomplete/failed means N+1.. stay buffered. Target chunks
    per commit = ``batch_size``, with pre-flush when a message would
    overshoot.
  * Failure policy: halt-on-first-failure via a shared ``stop_at_message_id``
    watermark (partial work after the failure is dropped / rolled back with
    the storage transaction), or ``skip_failed_messages=True`` to skip and
    continue.
  * Graceful shutdown via ``shutdown_event``; zero-chunk messages flow
    straight to the reassembler as immediately-complete assemblies.)
"""

from __future__ import annotations

import asyncio
from collections.abc import AsyncIterable, Awaitable, Callable
from dataclasses import dataclass, field
from itertools import chain
from typing import TYPE_CHECKING

import numpy as np

from ..models.result import Failure, Success
from . import kplib
from .interfaces import (
    AddMessagesResult,
    IKnowledgeExtractor,
    IMessage,
    MessageOrdinal,
    TextLocation,
)
from .semrefindex import collect_action_terms, collect_entity_terms

__all__ = ["add_messages_streaming"]

if TYPE_CHECKING:
    from .conversation_base import ConversationBase

type ChunkOrdinal = int

_EMPTY_KNOWLEDGE = kplib.KnowledgeResponse(
    entities=[], actions=[], inverse_actions=[], topics=[]
)

# Sentinel watermark: effectively "no stop".
_NO_STOP = 10**100


class NoOpKnowledgeExtractor:
    """Used when auto_extract_knowledge is off: extraction yields nothing."""

    async def extract(self, message: str):
        return Success(_EMPTY_KNOWLEDGE)


@dataclass
class PipelineStopState:
    """Shared stop watermark: ordinals >= stop_at_message_id are out of scope.

    ``exception`` holds the error from the lowest-ordinal failing message so
    the orchestrator can re-raise after the pipeline drains.
    """

    stop_at_message_id: int = _NO_STOP
    exception: Exception | None = None


@dataclass
class ProducerState:
    next_message_id: MessageOrdinal
    produced_messages: int = 0
    produced_chunks: int = 0
    exception: Exception | None = None


@dataclass
class ChunkWorkItem[TMessage: IMessage]:
    chunk_id: TextLocation
    chunk_count: int
    chunk_text: str
    message: TMessage


@dataclass
class ChunkProcessingResult[TMessage: IMessage]:
    """One chunk's extraction + embedding outcome."""

    chunk_id: TextLocation
    chunk_count: int
    message: TMessage
    extracted_knowledge: kplib.KnowledgeResponse | None = None
    chunk_embedding: np.ndarray | None = None
    related_terms: list[str] | None = None
    related_term_embeddings: list[np.ndarray] | None = None
    error: Exception | None = None


def _collect_related_terms_for_fuzzy_index(
    knowledge: kplib.KnowledgeResponse,
) -> list[str]:
    """Lowercased, order-preserving dedupe of all knowledge-derived terms."""
    seen: set[str] = set()
    related_terms: list[str] = []

    def _add(term: str) -> None:
        canonical = term.strip().lower()
        if canonical and canonical not in seen:
            seen.add(canonical)
            related_terms.append(canonical)

    for entity in knowledge.entities:
        for term in collect_entity_terms(entity):
            _add(term)
    for action in chain(knowledge.actions, knowledge.inverse_actions):
        for term in collect_action_terms(action):
            _add(term)
    for topic in knowledge.topics:
        _add(topic)
    return related_terms


# "Public": imported by tests.
async def process_chunk_with_extraction_and_embeddings[TMessage: IMessage](
    chunk_id: TextLocation,
    chunk_text: str,
    chunk_count: int,
    message: TMessage,
    knowledge_extractor: IKnowledgeExtractor,
    embedding_model,
) -> ChunkProcessingResult[TMessage]:
    """Extraction + related-term embeddings and chunk embedding run
    concurrently; the first failure is captured on the result."""
    result = ChunkProcessingResult(
        chunk_id=chunk_id, chunk_count=chunk_count, message=message
    )
    sem = asyncio.Semaphore(1)  # serialize embedding requests per chunk

    async def _extract_and_embed_related() -> None:
        knowledge_result = await knowledge_extractor.extract(chunk_text)
        if isinstance(knowledge_result, Failure):
            raise RuntimeError(
                f"Knowledge extraction failed: {knowledge_result.message}"
            )
        result.extracted_knowledge = knowledge_result.value
        result.related_terms = _collect_related_terms_for_fuzzy_index(
            result.extracted_knowledge
        )
        if result.related_terms:
            async with sem:
                rel = await embedding_model.get_embeddings(result.related_terms)
            result.related_term_embeddings = list(rel)
        else:
            result.related_term_embeddings = []

    async def _embed_chunk() -> None:
        async with sem:
            result.chunk_embedding = await embedding_model.get_embedding_nocache(
                chunk_text
            )

    try:
        async with asyncio.TaskGroup() as tg:
            tg.create_task(_extract_and_embed_related())
            tg.create_task(_embed_chunk())
    except Exception as error:
        while isinstance(error, ExceptionGroup) and len(error.exceptions) == 1:
            error = error.exceptions[0]
        result.error = error

    return result


async def _producer_task[TMessage: IMessage](
    messages: AsyncIterable[TMessage],
    chunk_queue: asyncio.Queue,
    stop_state: PipelineStopState,
    producer_state: ProducerState,
    result_queue: asyncio.Queue,
    shutdown_event: asyncio.Event | None,
) -> None:
    """Enqueue chunk work items; always sends the dispatcher sentinel."""
    try:
        async for message in messages:
            message_id = producer_state.next_message_id
            if message_id >= stop_state.stop_at_message_id:
                break
            if shutdown_event is not None and shutdown_event.is_set():
                break

            chunk_count = len(message.text_chunks)
            if chunk_count == 0:
                # Nothing to process: emit a zero-chunk result directly.
                zero = ChunkProcessingResult[TMessage](
                    chunk_id=TextLocation(message_id, 0),
                    chunk_count=0,
                    message=message,
                )
                await result_queue.put(zero)
            else:
                for chunk_ordinal, chunk_text in enumerate(message.text_chunks):
                    if message_id >= stop_state.stop_at_message_id:
                        break
                    work = ChunkWorkItem[TMessage](
                        chunk_id=TextLocation(message_id, chunk_ordinal),
                        chunk_count=chunk_count,
                        chunk_text=chunk_text,
                        message=message,
                    )
                    await chunk_queue.put(work)
                    producer_state.produced_chunks += 1

            producer_state.produced_messages += 1
            producer_state.next_message_id += 1
    except Exception as exc:
        producer_state.exception = exc
    finally:
        await chunk_queue.put(None)


async def _dispatcher_task[TMessage: IMessage](
    chunk_queue: asyncio.Queue,
    result_queue: asyncio.Queue,
    stop_state: PipelineStopState,
    knowledge_extractor: IKnowledgeExtractor,
    embedding_model,
    concurrency: int,
    skip_failed_messages: bool,
) -> None:
    """Fan chunk work items out to at most ``concurrency`` worker tasks.

    Chunks at/past the stop watermark become error results so the reassembler
    accounts for them deterministically. When not skipping failures, the
    first failing chunk lowers the watermark to its message.
    """
    sem = asyncio.Semaphore(concurrency)

    async def _process_one(work_item: ChunkWorkItem[TMessage]) -> None:
        try:
            stop_at = stop_state.stop_at_message_id
            if work_item.chunk_id.message_ordinal >= stop_at:
                result: ChunkProcessingResult[TMessage] = ChunkProcessingResult(
                    chunk_id=work_item.chunk_id,
                    chunk_count=work_item.chunk_count,
                    message=work_item.message,
                    error=RuntimeError(
                        "Chunk skipped because stop_at_message_id is "
                        f"{stop_at} and message_id is "
                        f"{work_item.chunk_id.message_ordinal}"
                    ),
                )
            else:
                result = await process_chunk_with_extraction_and_embeddings(
                    chunk_id=work_item.chunk_id,
                    chunk_text=work_item.chunk_text,
                    chunk_count=work_item.chunk_count,
                    message=work_item.message,
                    knowledge_extractor=knowledge_extractor,
                    embedding_model=embedding_model,
                )
                if result.error is not None and not skip_failed_messages:
                    # Halt-on-first-failure: lower the watermark to this
                    # message so later chunks turn into deterministic skips.
                    failed_at = work_item.chunk_id.message_ordinal
                    if failed_at < stop_state.stop_at_message_id:
                        stop_state.stop_at_message_id = failed_at
                    if stop_state.exception is None:
                        stop_state.exception = result.error
        finally:
            sem.release()
        await result_queue.put(result)

    async with asyncio.TaskGroup() as tg:
        while True:
            item = await chunk_queue.get()
            if item is None:
                break
            await sem.acquire()
            tg.create_task(_process_one(item))

    await result_queue.put(None)


@dataclass
class MessageAssembly[TMessage: IMessage]:
    """Chunk accumulation for one message awaiting completeness."""

    message_id: MessageOrdinal
    chunk_count: int
    message: TMessage
    chunks: dict[ChunkOrdinal, ChunkProcessingResult[TMessage]] = field(
        default_factory=dict
    )
    has_error: bool = False

    def is_complete(self) -> bool:
        return len(self.chunks) == self.chunk_count


@dataclass
class ReassemblerResult:
    first_uncommitted_ordinal: MessageOrdinal
    messages_committed: int = 0
    chunks_committed: int = 0
    chunk_failures: int = 0
    messages_skipped: int = 0
    buffered_messages: int = 0


async def _reassembler_task[TMessage: IMessage](
    result_queue: asyncio.Queue,
    stop_state: PipelineStopState,
    first_uncommitted_ordinal: MessageOrdinal,
    target_commit_chunk_count: int,
    commit_batch: Callable[
        [list[TMessage], list[ChunkProcessingResult[TMessage]]], Awaitable[None]
    ],
    skip_failed_messages: bool,
    on_message_skipped: Callable[["MessageAssembly[TMessage]"], Awaitable[None]]
    | None = None,
) -> ReassemblerResult:
    """Commit order invariant: only consecutive complete non-failed messages
    commit. Validation errors (bad ordinals, duplicates, mismatched counts)
    lower the watermark and raise."""
    state = ReassemblerResult(first_uncommitted_ordinal=first_uncommitted_ordinal)
    assemblies: dict[MessageOrdinal, MessageAssembly[TMessage]] = {}

    staged_messages: list[TMessage] = []
    staged_results: list[ChunkProcessingResult[TMessage]] = []
    staged_chunks = 0

    async def _commit_if_needed(force: bool = False) -> None:
        nonlocal staged_chunks, staged_messages, staged_results
        if not staged_messages:
            return
        if not force and staged_chunks < target_commit_chunk_count:
            return
        pending_messages = staged_messages
        pending_results = staged_results
        msg_count = len(pending_messages)
        chunk_count = staged_chunks
        # Clear before awaiting so a post-commit exception can't double-commit
        # during the final drain.
        staged_messages = []
        staged_results = []
        staged_chunks = 0
        await commit_batch(pending_messages, pending_results)
        state.messages_committed += msg_count
        state.chunks_committed += chunk_count

    async def _drain_consecutive_complete(force: bool = False) -> None:
        nonlocal staged_chunks
        while True:
            assembly = assemblies.get(state.first_uncommitted_ordinal)
            if assembly is None or not assembly.is_complete():
                await _commit_if_needed(force)
                return
            if assembly.has_error:
                if skip_failed_messages:
                    error_msg = next(
                        (
                            str(c.error)
                            for c in assembly.chunks.values()
                            if c.error is not None
                        ),
                        "Unknown error",
                    )
                    print(
                        f"Skipping message {state.first_uncommitted_ordinal} "
                        f"due to chunk processing error: {error_msg}"
                    )
                    if on_message_skipped is not None:
                        await on_message_skipped(assembly)
                    del assemblies[state.first_uncommitted_ordinal]
                    state.first_uncommitted_ordinal += 1
                    state.messages_skipped += 1
                    continue
                await _commit_if_needed(force)
                return

            # Pre-flush so one message doesn't overshoot the chunk target.
            if (
                staged_messages
                and staged_chunks + assembly.chunk_count > target_commit_chunk_count
            ):
                await _commit_if_needed(force=True)

            ordered = [assembly.chunks[i] for i in sorted(assembly.chunks)]
            staged_messages.append(assembly.message)
            staged_results.extend(ordered)
            staged_chunks += len(ordered)

            del assemblies[state.first_uncommitted_ordinal]
            state.first_uncommitted_ordinal += 1
            await _commit_if_needed(force)

    try:
        while True:
            item = await result_queue.get()
            if item is None:
                break

            chunk_ordinal = item.chunk_id.chunk_ordinal
            message_id = item.chunk_id.message_ordinal

            validation_error: str | None = None
            assembly = assemblies.get(message_id)
            if item.chunk_count == 0:
                if assembly is None:
                    assembly = MessageAssembly[TMessage](
                        message_id=message_id, chunk_count=0, message=item.message
                    )
                    assemblies[message_id] = assembly
            elif chunk_ordinal < 0 or chunk_ordinal >= item.chunk_count:
                validation_error = (
                    f"Invalid chunk ordinal: message_id={message_id}, "
                    f"chunk_ordinal={chunk_ordinal}, chunk_count={item.chunk_count}"
                )
            elif assembly is None:
                assembly = MessageAssembly[TMessage](
                    message_id=message_id,
                    chunk_count=item.chunk_count,
                    message=item.message,
                )
                assemblies[message_id] = assembly
            elif assembly.chunk_count != item.chunk_count:
                validation_error = (
                    f"Mismatched chunk count for message: message_id={message_id}, "
                    f"expected={assembly.chunk_count}, got={item.chunk_count}"
                )
            elif chunk_ordinal in assembly.chunks:
                validation_error = (
                    f"Duplicate chunk: message_id={message_id}, "
                    f"chunk_ordinal={chunk_ordinal}, chunk_count={item.chunk_count}"
                )

            if validation_error is not None:
                stop_state.stop_at_message_id = min(
                    stop_state.stop_at_message_id, message_id
                )
                raise RuntimeError(validation_error)

            assert assembly is not None
            if item.chunk_count > 0:
                assembly.chunks[chunk_ordinal] = item

            if item.error is not None:
                assembly.has_error = True
                state.chunk_failures += 1
                if not skip_failed_messages:
                    stop_state.stop_at_message_id = min(
                        stop_state.stop_at_message_id, message_id
                    )

            await _drain_consecutive_complete()
    finally:
        # Commit whatever consecutive complete prefix exists before raising.
        await _drain_consecutive_complete(force=True)

    state.buffered_messages = len(assemblies)
    return state


async def add_messages_streaming[TMessage: IMessage](
    conv: "ConversationBase[TMessage]",
    messages: AsyncIterable[TMessage],
    *,
    batch_size: int = 100,
    on_batch_committed: Callable[[AddMessagesResult], None] | None = None,
    skip_failed_messages: bool = False,
    shutdown_event: asyncio.Event | None = None,
) -> AddMessagesResult:
    """Pipelined ingest preserving commit order; see module docstring."""
    from . import convknowledge

    settings = conv.settings
    sem_ref_settings = settings.semantic_ref_index_settings
    storage = await settings.get_storage_provider()
    if sem_ref_settings.auto_extract_knowledge:
        knowledge_extractor: IKnowledgeExtractor = (
            sem_ref_settings.knowledge_extractor or convknowledge.KnowledgeExtractor()
        )
    else:
        knowledge_extractor = NoOpKnowledgeExtractor()
    embedding_model = settings.embedding_model

    initial_message_id: MessageOrdinal = await conv.messages.size()
    total = AddMessagesResult()

    def _accumulate(result: AddMessagesResult) -> None:
        total.messages_added += result.messages_added
        total.semrefs_added += result.semrefs_added
        total.chunks_added += result.chunks_added
        if on_batch_committed:
            on_batch_committed(result)

    async def _commit_batch(
        messages_batch: list[TMessage],
        chunk_results: list[ChunkProcessingResult[TMessage]],
    ) -> None:
        result = await conv._commit_batch_from_chunk_results(
            storage, messages_batch, chunk_results
        )
        _accumulate(result)

    async def _record_skipped_failures(assembly) -> None:
        """Persist failed chunks to the ChunkFailures table so a re-extract
        tool can retry them (keyed by pipeline ordinal; the skipped message
        itself is not stored — its source id is embedded in the record)."""
        source_id = getattr(assembly.message, "source_id", None)
        prefix = f"[source_id={source_id}] " if source_id else ""
        try:
            async with storage:
                for chunk_ord, chunk in assembly.chunks.items():
                    if chunk.error is not None:
                        await storage.record_chunk_failure(
                            assembly.message_id,
                            chunk_ord,
                            type(chunk.error).__name__,
                            (prefix + str(chunk.error))[:500],
                        )
        except Exception:
            pass  # failure bookkeeping must never break the ingest

    chunk_queue: asyncio.Queue = asyncio.Queue(
        maxsize=sem_ref_settings.concurrency * 2
    )
    result_queue: asyncio.Queue = asyncio.Queue(
        maxsize=sem_ref_settings.concurrency * 2
    )
    stop_state = PipelineStopState()
    producer_state = ProducerState(next_message_id=initial_message_id)

    task_exceptions: list[Exception] = []
    reassembler_task: asyncio.Task[ReassemblerResult] | None = None
    try:
        async with asyncio.TaskGroup() as tg:
            tg.create_task(
                _producer_task(
                    messages,
                    chunk_queue,
                    stop_state,
                    producer_state,
                    result_queue,
                    shutdown_event=shutdown_event,
                )
            )
            tg.create_task(
                _dispatcher_task(
                    chunk_queue,
                    result_queue,
                    stop_state,
                    knowledge_extractor,
                    embedding_model,
                    concurrency=sem_ref_settings.concurrency,
                    skip_failed_messages=skip_failed_messages,
                )
            )
            reassembler_task = tg.create_task(
                _reassembler_task(
                    result_queue,
                    stop_state,
                    first_uncommitted_ordinal=initial_message_id,
                    target_commit_chunk_count=batch_size,
                    commit_batch=_commit_batch,
                    skip_failed_messages=skip_failed_messages,
                    on_message_skipped=_record_skipped_failures,
                )
            )
    except ExceptionGroup as eg:
        task_exceptions.extend(eg.exceptions)
    except Exception as exc:
        task_exceptions.append(exc)

    if producer_state.exception is not None:
        task_exceptions.append(producer_state.exception)
    if stop_state.exception is not None and not skip_failed_messages:
        task_exceptions.append(stop_state.exception)

    if task_exceptions:
        distinct: list[Exception] = []
        for exc in task_exceptions:
            if exc not in distinct:
                distinct.append(exc)
        if len(distinct) == 1:
            raise distinct[0]
        raise ExceptionGroup("add_messages_streaming failed", distinct)

    if skip_failed_messages and reassembler_task is not None:
        try:
            total.messages_skipped = reassembler_task.result().messages_skipped
        except Exception:
            pass

    return total
