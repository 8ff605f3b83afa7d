"""Cross-call engine dispatch coalescing (knowpro/engine_batcher.py).

N concurrent ``query()`` pipelines share fused ``execute_batch`` device
dispatches; results must be identical to un-coalesced execution and
dispatch failures must land on every waiter so the call sites' host-VM
fallback (knowpro/search.py) still applies per query.
"""

import asyncio

import pytest

from tests.test_query_pipeline import build_conversation
from typeagent_tpu.knowpro.engine_batcher import EngineBatcher
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.search import (
    SearchOptions,
    search_conversation_knowledge,
)


class FakeExecutor:
    """Records dispatch composition; returns per-query tagged results."""

    def __init__(self, fail: bool = False):
        self.calls: list[list[object]] = []
        self.fail = fail

    async def execute_batch(self, queries, context):
        self.calls.append(list(queries))
        await asyncio.sleep(0)
        if self.fail:
            raise ValueError("engine down")
        return [("result", q) for q in queries]


def make_batcher(fake: FakeExecutor, **kw) -> EngineBatcher:
    async def get_executor(conv):
        return fake, None

    return EngineBatcher(object(), get_executor, **kw)


async def test_concurrent_callers_coalesce_into_one_dispatch():
    fake = FakeExecutor()
    batcher = make_batcher(fake)
    results = await asyncio.gather(
        *[batcher.execute_batch([i]) for i in range(5)]
    )
    # Per-caller results arrive in order and tagged with their own query.
    assert results == [[("result", i)] for i in range(5)]
    # All five enqueued before the worker task first ran -> ONE dispatch.
    assert [len(c) for c in fake.calls] == [5]
    assert batcher.stats() == {"dispatches": 1, "served": 5, "peak_batch": 5}


async def test_multi_query_calls_keep_per_call_order():
    fake = FakeExecutor()
    batcher = make_batcher(fake)
    a, b = await asyncio.gather(
        batcher.execute_batch(["a1", "a2"]),
        batcher.execute_batch(["b1"]),
    )
    assert a == [("result", "a1"), ("result", "a2")]
    assert b == [("result", "b1")]


async def test_max_coalesce_splits_dispatches():
    fake = FakeExecutor()
    batcher = make_batcher(fake, max_coalesce=3)
    await asyncio.gather(*[batcher.execute_batch([i]) for i in range(7)])
    assert [len(c) for c in fake.calls] == [3, 3, 1]


async def test_dispatch_failure_reaches_every_waiter():
    fake = FakeExecutor(fail=True)
    batcher = make_batcher(fake)
    results = await asyncio.gather(
        *[batcher.execute_batch([i]) for i in range(3)],
        return_exceptions=True,
    )
    assert all(isinstance(r, RuntimeError) for r in results)
    assert all("engine down" in str(r) for r in results)


async def test_requests_during_inflight_dispatch_accumulate():
    """A second wave arriving while dispatch 1 is in flight rides
    dispatch 2 together — the natural-accumulation coalescing model."""
    fake = FakeExecutor()
    gate = asyncio.Event()
    real = fake.execute_batch

    async def gated(queries, context):
        out = await real(queries, context)
        if len(fake.calls) == 1:
            await gate.wait()
        return out

    fake.execute_batch = gated
    batcher = make_batcher(fake)
    first = asyncio.create_task(batcher.execute_batch(["first"]))
    await asyncio.sleep(0.01)  # worker now blocked inside dispatch 1
    wave = [
        asyncio.create_task(batcher.execute_batch([f"w{i}"])) for i in range(4)
    ]
    await asyncio.sleep(0.01)
    gate.set()
    await asyncio.gather(first, *wave)
    assert [len(c) for c in fake.calls] == [1, 4]


def test_worker_survives_event_loop_turnover():
    """Batchers cached on a conversation outlive asyncio.run loops; the
    next loop must get a fresh worker, not a dead task."""
    fake = FakeExecutor()
    batcher = make_batcher(fake)

    async def one():
        return await batcher.execute_batch(["x"])

    assert asyncio.run(one()) == [("result", "x")]
    assert asyncio.run(one()) == [("result", "x")]
    assert len(fake.calls) == 2


async def test_cancelled_caller_does_not_poison_the_group():
    fake = FakeExecutor()
    gate = asyncio.Event()
    real = fake.execute_batch

    async def gated(queries, context):
        await gate.wait()
        return await real(queries, context)

    fake.execute_batch = gated
    batcher = make_batcher(fake)
    doomed = asyncio.create_task(batcher.execute_batch(["doomed"]))
    kept = asyncio.create_task(batcher.execute_batch(["kept"]))
    await asyncio.sleep(0.01)
    doomed.cancel()
    gate.set()
    assert await kept == [("result", "kept")]
    with pytest.raises(asyncio.CancelledError):
        await doomed


# -- integration through the public search path --------------------------------


def _group():
    return SearchTermGroup(
        boolean_op="or",
        terms=[
            SearchTerm(Term("Bach", weight=10.0)),
            SearchTerm(Term("harpsichord", weight=2.0)),
        ],
    )


def _score_map(result):
    return {
        (ktype, m.semantic_ref_ordinal): m.score
        for ktype, r in (result or {}).items()
        for m in r.semantic_ref_matches
    }


async def test_coalesced_search_matches_uncoalesced(monkeypatch):
    conv = await build_conversation()
    options = SearchOptions(exact_match=True, use_device_executor=True)

    monkeypatch.setenv("TAT_ENGINE_COALESCE", "0")
    plain = await search_conversation_knowledge(conv, _group(), options=options)

    monkeypatch.setenv("TAT_ENGINE_COALESCE", "1")
    coalesced = await asyncio.gather(
        *[
            search_conversation_knowledge(conv, _group(), options=options)
            for _ in range(4)
        ]
    )
    assert _score_map(plain)
    for result in coalesced:
        assert _score_map(result) == pytest.approx(_score_map(plain))
    stats = conv._engine_batcher.stats()
    assert stats["served"] >= 4
    assert stats["dispatches"] < stats["served"]  # coalescing happened


async def test_device_dispatch_failure_falls_back_to_host(monkeypatch):
    conv = await build_conversation()
    options = SearchOptions(exact_match=True, use_device_executor=True)
    host = await search_conversation_knowledge(
        conv, _group(), options=SearchOptions(exact_match=True, use_device_executor=False)
    )

    from typeagent_tpu.knowpro.device_executor import DeviceQueryExecutor

    async def boom(self, queries, context):
        raise ValueError("engine down")

    monkeypatch.setenv("TAT_ENGINE_COALESCE", "1")
    monkeypatch.setattr(DeviceQueryExecutor, "execute_batch", boom)
    conv._engine_batcher = None  # drop any batcher cached by earlier tests
    result = await search_conversation_knowledge(conv, _group(), options=options)
    assert _score_map(result) == pytest.approx(_score_map(host))
