"""LookupBatcher: coalesced serving correctness + observability.

Pins: coalesced results == per-batch results (per-request min_score /
max_hits honored across a shared dispatch), ragged batch sizes pad/slice
correctly, concurrent callers actually share dispatches, close() drains.
"""

import asyncio

import numpy as np
import pytest

from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.serve import LookupBatcher
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore


@pytest.fixture
def store():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((600, 32)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    s = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(32), min_score=0.0
        )
    )
    s.add_embeddings(None, m)
    return s


def _queries(rng, b, d=32):
    q = rng.standard_normal((b, d)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_single_request_passthrough(store):
    rng = np.random.default_rng(5)
    q = _queries(rng, 4)

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=0.0)
        res = await batcher.lookup(q, max_hits=5, min_score=0.2)
        await batcher.close()
        return res, batcher

    res, batcher = asyncio.run(run())
    expected = store.fuzzy_lookup_embeddings_batch(q, max_hits=5, min_score=0.2)
    assert [[s.item for s in row] for row in res] == [
        [s.item for s in row] for row in expected
    ]
    assert batcher.dispatches == 1 and batcher.served == 1


def test_concurrent_requests_coalesce_and_match(store):
    rng = np.random.default_rng(6)
    batches = [_queries(rng, 4) for _ in range(8)]

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=5.0, max_coalesce=8)
        results = await asyncio.gather(
            *(batcher.lookup(q, max_hits=6, min_score=0.1) for q in batches)
        )
        await batcher.close()
        return results, batcher

    results, batcher = asyncio.run(run())
    assert batcher.served == 8
    assert batcher.dispatches < 8  # real coalescing happened
    for q, res in zip(batches, results):
        expected = store.fuzzy_lookup_embeddings_batch(q, max_hits=6, min_score=0.1)
        for a, b in zip(res, expected):
            assert [s.item for s in a] == [s.item for s in b]
            np.testing.assert_allclose(
                [s.score for s in a], [s.score for s in b], atol=1e-5
            )


def test_ragged_sizes_and_per_request_params(store):
    rng = np.random.default_rng(7)
    q_small = _queries(rng, 2)
    q_big = _queries(rng, 7)

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=5.0)
        r_small, r_big = await asyncio.gather(
            batcher.lookup(q_small, max_hits=3, min_score=0.5),
            batcher.lookup(q_big, max_hits=8, min_score=0.0),
        )
        await batcher.close()
        return r_small, r_big

    r_small, r_big = asyncio.run(run())
    exp_small = store.fuzzy_lookup_embeddings_batch(q_small, max_hits=3, min_score=0.5)
    exp_big = store.fuzzy_lookup_embeddings_batch(q_big, max_hits=8, min_score=0.0)
    assert len(r_small) == 2 and len(r_big) == 7
    for got, exp in ((r_small, exp_small), (r_big, exp_big)):
        for a, b in zip(got, exp):
            assert [s.item for s in a] == [s.item for s in b]


def test_mixed_dims_rejected(store):
    rng = np.random.default_rng(8)

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=5.0)
        with pytest.raises(ValueError, match="Mixed embedding dims"):
            await asyncio.gather(
                batcher.lookup(_queries(rng, 2, 32)),
                batcher.lookup(rng.standard_normal((2, 16)).astype(np.float32)),
            )
        await batcher.close()

    asyncio.run(run())


def test_closed_batcher_rejects(store):
    async def run():
        batcher = LookupBatcher(store)
        await batcher.close()
        with pytest.raises(RuntimeError, match="closed"):
            await batcher.lookup(np.zeros((1, 32), np.float32))

    asyncio.run(run())


def test_cancelled_caller_does_not_poison_group(store):
    """One co-batched caller cancelling (e.g. asyncio.timeout) must not
    raise InvalidStateError on its resolved future nor fail the others."""
    rng = np.random.default_rng(9)
    qa, qb = _queries(rng, 3), _queries(rng, 3)

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=30.0, max_coalesce=4)
        task_a = asyncio.ensure_future(batcher.lookup(qa, max_hits=5))
        task_b = asyncio.ensure_future(batcher.lookup(qb, max_hits=5))
        await asyncio.sleep(0)  # both enqueued into the lingering group
        task_a.cancel()
        res_b = await task_b
        with pytest.raises(asyncio.CancelledError):
            await task_a
        await batcher.close()
        return res_b

    res_b = asyncio.run(run())
    expected = store.fuzzy_lookup_embeddings_batch(qb, max_hits=5)
    assert [[s.item for s in row] for row in res_b] == [
        [s.item for s in row] for row in expected
    ]


def test_pipelined_dispatches_overlap(store, monkeypatch):
    """max_inflight=2 double-buffers: with coalescing off, concurrent
    requests must actually run ≥2 dispatches at once (overlapping the
    tunnel RTTs) and still return per-request-correct results."""
    import threading as _threading
    import time as _time

    live = 0
    peak = 0
    lock = _threading.Lock()
    real = store.fuzzy_lookup_embeddings_batch

    def slow(*args, **kwargs):
        nonlocal live, peak
        with lock:
            live += 1
            peak = max(peak, live)
        _time.sleep(0.15)  # simulate a tunnel RTT
        try:
            return real(*args, **kwargs)
        finally:
            with lock:
                live -= 1

    monkeypatch.setattr(store, "fuzzy_lookup_embeddings_batch", slow)
    rng = np.random.default_rng(12)
    batches = [_queries(rng, 3) for _ in range(4)]

    async def run():
        batcher = LookupBatcher(
            store, max_delay_ms=0.0, max_coalesce=1, max_inflight=2
        )
        results = await asyncio.gather(
            *(batcher.lookup(q, max_hits=5) for q in batches)
        )
        await batcher.close()
        return results, batcher

    results, batcher = asyncio.run(run())
    assert batcher.dispatches == 4 and batcher.served == 4
    assert peak >= 2, "dispatches never overlapped"
    assert batcher.peak_inflight >= 2
    for q, res in zip(batches, results):
        expected = real(q, max_hits=5)
        for a, b in zip(res, expected):
            assert [s.item for s in a] == [s.item for s in b]


def test_single_inflight_stays_sequential(store, monkeypatch):
    """max_inflight=1 preserves the strict one-dispatch-at-a-time order."""
    import threading as _threading
    import time as _time

    live = 0
    peak = 0
    lock = _threading.Lock()
    real = store.fuzzy_lookup_embeddings_batch

    def slow(*args, **kwargs):
        nonlocal live, peak
        with lock:
            live += 1
            peak = max(peak, live)
        _time.sleep(0.05)
        try:
            return real(*args, **kwargs)
        finally:
            with lock:
                live -= 1

    monkeypatch.setattr(store, "fuzzy_lookup_embeddings_batch", slow)
    rng = np.random.default_rng(13)
    batches = [_queries(rng, 2) for _ in range(3)]

    async def run():
        batcher = LookupBatcher(
            store, max_delay_ms=0.0, max_coalesce=1, max_inflight=1
        )
        await asyncio.gather(*(batcher.lookup(q) for q in batches))
        await batcher.close()
        return batcher

    batcher = asyncio.run(run())
    assert batcher.dispatches == 3
    assert peak == 1 and batcher.peak_inflight == 1


def test_event_loop_stays_responsive_during_dispatch(store, monkeypatch):
    """The device fetch runs off-loop: callers can enqueue (and timers can
    fire) while a dispatch is in flight."""
    import time as _time

    real = store.fuzzy_lookup_embeddings_batch

    def slow(*args, **kwargs):
        _time.sleep(0.25)  # simulate a tunnel RTT
        return real(*args, **kwargs)

    monkeypatch.setattr(store, "fuzzy_lookup_embeddings_batch", slow)
    rng = np.random.default_rng(11)
    q = _queries(rng, 2)

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=0.0)
        ticks = 0

        async def heartbeat():
            nonlocal ticks
            while True:
                await asyncio.sleep(0.01)
                ticks += 1

        hb = asyncio.ensure_future(heartbeat())
        await batcher.lookup(q, max_hits=3)
        hb.cancel()
        await batcher.close()
        return ticks

    ticks = asyncio.run(run())
    assert ticks >= 5  # loop advanced many times during the 250 ms dispatch


def test_unlimited_max_hits_rides_alone(store):
    """A "give me everything" request (max_hits = len(store)) must not
    coalesce: it would force k_max = count onto every top-10 neighbor in
    its group (full-store sort + count-wide fetch per request)."""
    rng = np.random.default_rng(21)
    small_qs = [_queries(rng, 4) for _ in range(4)]
    big_q = _queries(rng, 2)

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=5.0, max_coalesce=8)
        jobs = [batcher.lookup(q, max_hits=5, min_score=0.2) for q in small_qs]
        jobs.append(batcher.lookup(big_q, max_hits=len(store), min_score=0.0))
        outs = await asyncio.gather(*jobs)
        await batcher.close()
        return outs, batcher

    outs, batcher = asyncio.run(run())
    # The big request took its own dispatch.
    assert batcher.dispatches >= 2
    for q, got in zip(small_qs, outs[:4]):
        want = store.fuzzy_lookup_embeddings_batch(q, max_hits=5, min_score=0.2)
        assert [[s.item for s in r] for r in got] == [
            [s.item for s in r] for r in want
        ]
    want_big = store.fuzzy_lookup_embeddings_batch(
        big_q, max_hits=len(store), min_score=0.0
    )
    assert [len(r) for r in outs[4]] == [len(r) for r in want_big]
    assert [[s.item for s in r] for r in outs[4]] == [
        [s.item for s in r] for r in want_big
    ]


def test_inflight_semaphore_survives_worker_restart(store):
    """Dispatches release the semaphore instance they acquired; a worker
    restart must not mint a fresh semaphore (in-flight releases would
    over-credit it and break the max_inflight cap forever)."""
    rng = np.random.default_rng(22)
    q = _queries(rng, 2)

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=0.0)
        await batcher.lookup(q, max_hits=3)
        sem = batcher._inflight
        batcher._task.cancel()
        await asyncio.sleep(0)  # let the cancellation land
        await batcher.lookup(q, max_hits=3)  # restarts the worker
        same = batcher._inflight is sem
        await batcher.close()
        return same

    assert asyncio.run(run())


def test_idle_worker_exits_and_respawns(store):
    """An idle batcher's worker must exit after its idle polls (no per-store
    0.5 s wakeups forever on an idle server) and respawn on the next lookup."""
    rng = np.random.default_rng(23)
    q = _queries(rng, 2)

    async def run():
        batcher = LookupBatcher(store, max_delay_ms=0.0)
        got = await batcher.lookup(q, max_hits=3)
        assert len(got) == 2
        # Wait past _IDLE_EXIT_POLLS * 0.5 s: the worker should be gone.
        for _ in range(50):
            if batcher._task.done():
                break
            await asyncio.sleep(0.1)
        assert batcher._task.done()
        # And the next lookup still works (worker respawned).
        got = await batcher.lookup(q, max_hits=3)
        assert len(got) == 2
        await batcher.close()

    asyncio.run(run())


def test_store_rebind_closes_previous_loop_batcher(store):
    """Re-binding the store's batcher to a new event loop must close the
    previous loop's batcher instead of orphaning its worker.

    Two explicit event loops (not asyncio.run twice: orbax applies
    nest_asyncio, which patches asyncio.run to reuse ONE loop process-wide
    — under it a second asyncio.run correctly does NOT rebind)."""
    rng = np.random.default_rng(24)
    q = _queries(rng, 2)

    async def use_store():
        return await store.fuzzy_lookup_embeddings_batch_async(q, max_hits=3)

    loop1 = asyncio.new_event_loop()
    try:
        assert len(loop1.run_until_complete(use_store())) == 2
    finally:
        loop1.close()
    first = store._batcher
    assert first is not None
    loop2 = asyncio.new_event_loop()
    try:
        assert len(loop2.run_until_complete(use_store())) == 2
    finally:
        loop2.close()
    assert store._batcher is not first
    assert first._closed


def test_batcher_over_mesh_backed_store():
    """Coalesced serving through a mesh-sharded store: the batcher's shared
    dispatch rides ShardedVectorStore.search_dispatch and every co-batched
    caller gets results identical to a solo lookup."""
    from typeagent_tpu.parallel import create_mesh

    mesh = create_mesh(n_shard=4, n_dp=2)
    rng = np.random.default_rng(11)
    m = rng.standard_normal((600, 32)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    s = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(32),
            min_score=0.0,
            mesh=mesh,
        )
    )
    s.add_embeddings(None, m)

    qs = [_queries(np.random.default_rng(20 + i), 3) for i in range(5)]
    solo = [s.fuzzy_lookup_embeddings_batch(q, max_hits=7) for q in qs]

    async def run():
        batcher = LookupBatcher(s, max_delay_ms=5.0)
        out = await asyncio.gather(
            *(batcher.lookup(q, max_hits=7) for q in qs)
        )
        stats = batcher.stats()
        await batcher.close()
        return out, stats

    coalesced, stats = asyncio.run(run())
    for got_rows, want_rows in zip(coalesced, solo):
        for got, want in zip(got_rows, want_rows):
            assert [r.item for r in got] == [r.item for r in want]
            np.testing.assert_allclose(
                [r.score for r in got], [r.score for r in want], rtol=1e-6
            )
    assert stats["dispatches"] <= len(qs)  # at least some sharing happened
