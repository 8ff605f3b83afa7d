"""DeviceVectorStore vs a numpy oracle replicating the reference semantics.

The oracle mirrors `aitools/vectorbase.py:163-230` of the reference exactly:
score = clip((cos+1)/2, 0, 1), min_score filter, top-k by score descending.
"""

import numpy as np
import pytest

from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.vectorstore import (
    ScoredInt,
    TextEmbeddingIndexSettings,
    VectorStore,
    cosine_to_score,
    get_default_min_score,
)


def oracle_lookup(matrix, q, max_hits=10, min_score=0.0, predicate=None):
    """Numpy clone of the reference fuzzy_lookup_embedding semantics."""
    if matrix.shape[0] == 0:
        return []
    scores = np.clip((np.dot(matrix, q) + 1.0) / 2.0, 0.0, 1.0)
    cand = np.flatnonzero(scores >= min_score)
    if predicate is not None:
        cand = np.array([i for i in cand if predicate(int(i))], dtype=np.int64)
    if len(cand) == 0:
        return []
    order = cand[np.argsort(scores[cand], kind="stable")[::-1]]
    return [(int(i), float(scores[i])) for i in order[:max_hits]]


def random_normalized(rng, n, dim):
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def make_store(dim=32, **kw):
    settings = TextEmbeddingIndexSettings(
        embedding_model=create_test_embedding_model(dim), **kw
    )
    return VectorStore(settings)


def assert_matches_oracle(result, expected, *, tol=2e-5):
    """Compare (ordinal, score) lists, tolerating float noise and ties."""
    assert len(result) == len(expected), (result, expected)
    for got, (exp_i, exp_s) in zip(result, expected):
        assert abs(got.score - exp_s) < tol
    # Index sets must agree except where scores tie within tolerance.
    got_ids = {r.item for r in result}
    exp_ids = {i for i, _ in expected}
    if got_ids != exp_ids:
        score_of = dict((i, s) for i, s in expected)
        for i in got_ids ^ exp_ids:
            # Any disagreeing index must be involved in a near-tie.
            near = [s for j, s in expected if abs(s - min(r.score for r in result)) < tol]
            assert near, (result, expected)


@pytest.mark.parametrize("n", [1, 7, 100, 1500])
@pytest.mark.parametrize("dim", [3, 32, 384])
def test_lookup_matches_oracle(rng, n, dim):
    store = make_store(dim)
    matrix = random_normalized(rng, n, dim)
    store.add_embeddings(None, matrix)
    assert len(store) == n
    q = random_normalized(rng, 1, dim)[0]
    result = store.fuzzy_lookup_embedding(q, max_hits=10)
    expected = oracle_lookup(matrix, q, max_hits=10)
    assert_matches_oracle(result, expected)


def test_min_score_filter(rng):
    store = make_store(16)
    matrix = random_normalized(rng, 200, 16)
    store.add_embeddings(None, matrix)
    q = matrix[17]  # exact row: cos=1 -> score=1
    result = store.fuzzy_lookup_embedding(q, max_hits=50, min_score=0.9)
    expected = oracle_lookup(matrix, q, max_hits=50, min_score=0.9)
    assert result[0].item == 17
    assert result[0].score == pytest.approx(1.0, abs=1e-5)
    assert_matches_oracle(result, expected)


def test_empty_store_returns_empty():
    store = make_store(8)
    assert store.fuzzy_lookup_embedding(np.zeros(8, np.float32)) == []
    assert len(store) == 0
    assert bool(store)  # empty index must not be falsy


def test_incremental_append_many_batches(rng):
    """Append across growth boundaries; results must stay correct."""
    dim = 24
    store = make_store(dim)
    matrix = random_normalized(rng, 3000, dim)
    for start in range(0, 3000, 250):
        store.add_embeddings(None, matrix[start : start + 250])
        q = matrix[start]
        result = store.fuzzy_lookup_embedding(q, max_hits=5)
        expected = oracle_lookup(matrix[: start + 250], q, max_hits=5)
        assert result[0].item == start
        assert_matches_oracle(result, expected)
    assert len(store) == 3000


def test_single_row_adds(rng):
    store = make_store(8)
    rows = random_normalized(rng, 20, 8)
    for r in rows:
        store.add_embedding(None, r)
    assert len(store) == 20
    res = store.fuzzy_lookup_embedding(rows[13], max_hits=1)
    assert res[0].item == 13


def test_subset_lookup(rng):
    dim = 16
    store = make_store(dim)
    matrix = random_normalized(rng, 500, dim)
    store.add_embeddings(None, matrix)
    subset = [3, 77, 13, 200, 499, 42]
    q = matrix[77]
    result = store.fuzzy_lookup_embedding_in_subset(q, subset, max_hits=3)
    sub_matrix = matrix[subset]
    scores = np.clip((sub_matrix @ q + 1) / 2, 0, 1)
    order = np.argsort(scores)[::-1][:3]
    assert result[0].item == 77
    assert [r.item for r in result] == [subset[i] for i in order]


def test_subset_empty_and_missing():
    store = make_store(8)
    assert store.fuzzy_lookup_embedding_in_subset(np.zeros(8, np.float32), []) == []


def test_predicate_path(rng):
    dim = 16
    store = make_store(dim)
    matrix = random_normalized(rng, 300, dim)
    store.add_embeddings(None, matrix)
    q = matrix[5]
    pred = lambda i: i % 2 == 0
    result = store.fuzzy_lookup_embedding(q, max_hits=10, min_score=0.3, predicate=pred)
    expected = oracle_lookup(matrix, q, max_hits=10, min_score=0.3, predicate=pred)
    assert all(r.item % 2 == 0 for r in result)
    assert_matches_oracle(result, expected)


def test_batched_lookup_matches_single(rng):
    dim = 48
    store = make_store(dim)
    matrix = random_normalized(rng, 800, dim)
    store.add_embeddings(None, matrix)
    queries = random_normalized(rng, 17, dim)
    batch = store.fuzzy_lookup_embeddings_batch(queries, max_hits=7, min_score=0.4)
    assert len(batch) == 17
    for qi, q in enumerate(queries):
        single = store.fuzzy_lookup_embedding(q, max_hits=7, min_score=0.4)
        assert [r.item for r in batch[qi]] == [r.item for r in single]


def test_serialize_roundtrip(rng):
    dim = 12
    store = make_store(dim)
    matrix = random_normalized(rng, 50, dim)
    store.add_embeddings(None, matrix)
    data = store.serialize()
    assert data.shape == (50, dim)
    np.testing.assert_allclose(data, matrix, atol=1e-6)

    store2 = make_store(dim)
    store2.deserialize(data)
    assert len(store2) == 50
    r1 = store.fuzzy_lookup_embedding(matrix[9], max_hits=3)
    r2 = store2.fuzzy_lookup_embedding(matrix[9], max_hits=3)
    assert [x.item for x in r1] == [x.item for x in r2]


def test_get_embedding_at_and_bounds(rng):
    store = make_store(8)
    rows = random_normalized(rng, 5, 8)
    store.add_embeddings(None, rows)
    np.testing.assert_allclose(store.get_embedding_at(3), rows[3], atol=1e-6)
    with pytest.raises(IndexError):
        store.get_embedding_at(5)
    assert store.serialize_embedding_at(99) is None


def test_embedding_size_mismatch_raises(rng):
    store = make_store(8)
    store.add_embedding(None, np.ones(8, np.float32))
    with pytest.raises(ValueError):
        store.add_embedding(None, np.ones(16, np.float32))
    with pytest.raises(ValueError):
        store.add_embeddings(None, np.ones((2, 16), np.float32))


async def test_add_key_and_fuzzy_lookup():
    """End-to-end through the fake embedding model."""
    model = create_test_embedding_model(32)
    settings = TextEmbeddingIndexSettings(embedding_model=model, min_score=0.0)
    store = VectorStore(settings)
    await store.add_keys(["alpha", "beta", "gamma", "delta"])
    assert len(store) == 4
    hits = await store.fuzzy_lookup("beta", max_hits=1, min_score=0.0)
    assert hits[0].item == 1
    assert hits[0].score == pytest.approx(1.0, abs=1e-5)


def test_default_min_scores():
    assert get_default_min_score("text-embedding-3-large") == 0.74
    assert get_default_min_score("text-embedding-3-small") == 0.73
    assert get_default_min_score("text-embedding-ada-002") == 0.93
    assert get_default_min_score("unknown-model") == 0.85


def test_cosine_to_score_scale():
    cs = np.array([-1.0, 0.0, 1.0, 1.5])
    np.testing.assert_allclose(cosine_to_score(cs), [0.0, 0.5, 1.0, 1.0])


def test_settings_defaults():
    model = create_test_embedding_model()
    s = TextEmbeddingIndexSettings(embedding_model=model)
    assert s.min_score == 0.85  # "test" model -> fallback
    assert s.max_matches is None
    assert s.batch_size == 8
    s2 = TextEmbeddingIndexSettings(embedding_model=model, max_matches=0)
    assert s2.max_matches is None


def test_pick_tile_respects_vmem_budget():
    """Tile choice stays inside the ~16MB scoped-VMEM limit for any shape."""
    from typeagent_tpu.ops.topk import _TILE_N, _pick_tile

    cases = [
        (1024, 384, 64, 4, 10),
        (1_000_448, 384, 64, 4, 10),
        (1_000_448, 384, 64, 2, 10),
        (1_000_448, 384, 64, 1, 10),
        (1_000_448, 1536, 64, 4, 10),
        (1_000_448, 4096, 512, 4, 10),
        (1_000_448, 8192, 1024, 4, 16),
        (512, 128, 8, 4, 10),
        (300_032, 384, 16, 4, 16),
    ]
    for n_pad, d_pad, b_pad, itemsize, k in cases:
        t = _pick_tile(n_pad, d_pad, b_pad, itemsize, k)
        assert 32 <= t <= min(_TILE_N, n_pad)
        coeff = (40 + 2 * k) if b_pad >= 512 else (8 + (5 * k) // 4)
        usage = t * (2 * d_pad * itemsize + b_pad * coeff)
        assert usage <= 15 * 2**20 or t == 32, (n_pad, d_pad, b_pad, usage)
        # Tiles stay sublane-aligned for every dtype (int8 needs 32).
        assert t % 32 == 0


async def test_vectorstore_differential_fuzz():
    """Randomized op sequence vs a numpy oracle: appends of odd sizes,
    lookups, subset lookups, serialization round-trips, clear."""
    import numpy as np

    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(123)
    dim = 24
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(dim), min_score=0.0
        )
    )
    oracle = np.empty((0, dim), np.float32)

    def oracle_topk(q, k, subset=None):
        m = oracle[subset] if subset is not None else oracle
        if m.shape[0] == 0:
            return []
        s = np.clip((m @ q + 1) / 2, 0, 1)
        order = np.argsort(-s, kind="stable")[:k]
        return [(int(i), float(s[i])) for i in order]

    for step in range(40):
        op = rng.integers(0, 5)
        if op <= 1 or len(store) == 0:  # append odd-sized batch
            n = int(rng.integers(1, 97))
            rows = rng.standard_normal((n, dim)).astype(np.float32)
            rows /= np.linalg.norm(rows, axis=1, keepdims=True)
            store.add_embeddings(None, rows)
            oracle = np.concatenate([oracle, rows], axis=0)
        elif op == 2:  # full lookup
            q = rng.standard_normal(dim).astype(np.float32)
            q /= np.linalg.norm(q)
            got = store.fuzzy_lookup_embedding(q, max_hits=5)
            want = oracle_topk(q, 5)
            assert [g.item for g in got] == [w[0] for w in want], step
            for g, w in zip(got, want):
                assert g.score == pytest.approx(w[1], abs=1e-5)
        elif op == 3:  # subset lookup
            subset = sorted(
                rng.choice(len(store), size=min(7, len(store)), replace=False).tolist()
            )
            q = rng.standard_normal(dim).astype(np.float32)
            q /= np.linalg.norm(q)
            got = store.fuzzy_lookup_embedding_in_subset(q, subset, max_hits=3)
            want = oracle_topk(q, 3, subset=np.array(subset))
            assert [g.item for g in got] == [subset[w[0]] for w in want], step
        else:  # serialize -> fresh store -> deserialize
            data = store.serialize()
            assert data.shape[0] == len(store) == oracle.shape[0]
            np.testing.assert_allclose(data, oracle, atol=1e-6)
            store2 = VectorStore(
                TextEmbeddingIndexSettings(
                    embedding_model=create_test_embedding_model(dim), min_score=0.0
                )
            )
            store2.deserialize(data)
            assert len(store2) == len(store)
            store = store2
    assert len(store) == oracle.shape[0] > 0


def test_approx_search_mode(rng):
    """search_mode='approx' rides approx_max_k; on small stores (CPU path)
    results match the exact oracle."""
    dim = 32
    store = make_store(dim, search_mode="approx", recall_target=0.99)
    matrix = random_normalized(rng, 1200, dim)
    store.add_embeddings(None, matrix)
    q = matrix[321]
    result = store.fuzzy_lookup_embedding(q, max_hits=10)
    assert result[0].item == 321
    assert result[0].score == pytest.approx(1.0, abs=1e-5)
    expected = oracle_lookup(matrix, q, max_hits=10)
    got = {r.item for r in result}
    want = {i for i, _ in expected}
    # recall@10 against the exact scan (CPU approx_max_k is near-exact).
    assert len(got & want) >= 9
    # Scores of agreeing indices are exact (same raw dot + score map).
    score_of = dict(expected)
    for r in result:
        if r.item in score_of:
            assert r.score == pytest.approx(score_of[r.item], abs=2e-5)


def test_approx_mode_rejects_unknown():
    with pytest.raises(AssertionError):
        make_store(8, search_mode="fuzzy")


def test_concurrent_first_lookups_never_see_half_flushed_store(rng):
    """Regression: _flush clears _pending BEFORE the buffer write lands; an
    unlocked emptiness fast path let a concurrent serving thread (pipelined
    LookupBatcher) observe count==0 mid-flush and return EMPTY results.
    Every concurrent first lookup must see the whole store."""
    import concurrent.futures as cf

    matrix = random_normalized(rng, 500, 32)
    for _ in range(6):
        store = make_store(32)
        store.add_embeddings(None, matrix)  # pending, not yet flushed
        q = random_normalized(rng, 4, 32)

        with cf.ThreadPoolExecutor(4) as ex:
            outs = list(
                ex.map(
                    lambda _: store.fuzzy_lookup_embeddings_batch(q, max_hits=5),
                    range(4),
                )
            )
        for out in outs:
            assert all(len(row) == 5 for row in out), [len(r) for r in out]
            for a, b in zip(out, outs[0]):
                assert [s.item for s in a] == [s.item for s in b]


def test_lookup_k25_matches_oracle(rng):
    """k in (16, 32] rides the Pallas kernel on TPU (the message re-rank
    stage asks for 25); everywhere it must match the oracle exactly."""
    matrix = random_normalized(rng, 800, 64)
    store = make_store(64)
    store.add_embeddings(None, matrix)
    q = random_normalized(rng, 1, 64)[0]
    result = store.fuzzy_lookup_embedding(q, max_hits=25)
    expected = oracle_lookup(matrix, q, max_hits=25)
    assert [r.item for r in result] == [i for i, _ in expected]
    for r, (_, score) in zip(result, expected):
        assert abs(r.score - score) < 2e-5


def test_bf16_store_uploads_bf16_queries(rng):
    """bf16 stores round queries to bf16 ON HOST: the kernels cast queries
    to the store dtype before the matmul anyway, so pre-rounding halves the
    tunnel upload bytes with identical selection. f32 stores must keep f32
    queries (exact-parity semantics)."""
    import ml_dtypes

    matrix = random_normalized(rng, 64, 32)
    q = random_normalized(rng, 4, 32)

    bf16 = make_store(32, dtype="bfloat16")
    bf16.add_embeddings(None, matrix)
    bf16._flush()
    assert bf16._pad_queries(q).dtype == ml_dtypes.bfloat16

    f32 = make_store(32)
    f32.add_embeddings(None, matrix)
    f32._flush()
    assert f32._pad_queries(q).dtype == np.float32

    # Selection through the bf16-wire path still matches the oracle's sets.
    out = bf16.fuzzy_lookup_embeddings_batch(q, max_hits=5)
    for row, qv in zip(out, q):
        exp = {i for i, _ in oracle_lookup(matrix, qv, max_hits=5)}
        assert {s.item for s in row} == exp


def test_dispatch_view_blocks_concurrent_flush():
    """Appends DONATE the previous buffer (in-place device update), so a
    flush racing a lookup dispatch would hand the engine a deleted array.
    _dispatch_view must hold the flush lock for the dispatch: a concurrent
    flush waits until the view exits, then lands."""
    import threading

    rng = np.random.default_rng(41)
    d = 32
    m1 = rng.standard_normal((100, d)).astype(np.float32)
    m1 /= np.linalg.norm(m1, axis=1, keepdims=True)
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(d), min_score=0.0
        )
    )
    store.add_embeddings(None, m1)
    flushed = threading.Event()
    m2 = rng.standard_normal((500, d)).astype(np.float32)
    m2 /= np.linalg.norm(m2, axis=1, keepdims=True)

    def grower():
        store.add_embeddings(None, m2)  # pending only
        store._flush()  # must block while the view is held
        flushed.set()

    with store._dispatch_view() as (buf, scales, count):
        assert count == 100
        t = threading.Thread(target=grower)
        t.start()
        # The grower cannot flush (and donate buf away) while we dispatch.
        assert not flushed.wait(timeout=0.3)
        q = store._pad_queries(m2[:4])
        vals, idx, cert = store._topk_dispatch(q, 5, buf, scales, count)
    t.join(timeout=30)
    assert flushed.is_set()
    assert store._count == 600
    # The dispatch issued under the view scored exactly the old 100 rows.
    idx = np.asarray(idx)[:4]
    assert idx.max() < 100
    oracle = (m2[:4] @ m1.T).argmax(axis=1)
    assert list(idx[:, 0]) == list(oracle)


def test_concurrent_append_and_lookup_threads():
    """Hammer flushes against lookups on executor threads: no torn reads
    (phantom zero-row hits / hybrid shape mismatches), every result
    well-formed."""
    import concurrent.futures

    rng = np.random.default_rng(42)
    d = 32
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(d), min_score=0.0
        )
    )
    first = rng.standard_normal((64, d)).astype(np.float32)
    first /= np.linalg.norm(first, axis=1, keepdims=True)
    store.add_embeddings(None, first)
    q = first[:4]
    stop = False
    errors = []

    def appender():
        try:
            while not stop:
                rows = rng.standard_normal((32, d)).astype(np.float32)
                rows /= np.linalg.norm(rows, axis=1, keepdims=True)
                store.add_embeddings(None, rows)
                store._flush()
        except Exception as exc:  # pragma: no cover - the failure signal
            errors.append(exc)

    with concurrent.futures.ThreadPoolExecutor(max_workers=3) as pool:
        fut = pool.submit(appender)
        try:
            for _ in range(60):
                rows = store.fuzzy_lookup_embeddings_batch(q, max_hits=5)
                limit = len(store)
                for row in rows:
                    assert len(row) == 5
                    assert all(0 <= s.item < limit for s in row)
                # The self-match must always surface at rank 0.
                assert [row[0].item for row in rows] == [0, 1, 2, 3]
        finally:
            stop = True
            fut.result(timeout=30)
    assert not errors


def test_concurrent_append_flush_conserves_rows():
    """No ingested row may vanish when appends race flushes on another
    thread: a row appended between a flush's concatenate and its pending-
    list reset used to be destroyed before reaching the device buffer."""
    import concurrent.futures
    import sys

    rng = np.random.default_rng(7)
    d = 16
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(d), min_score=0.0
        )
    )
    n_batches, batch = 3000, 2
    all_rows = rng.standard_normal((n_batches, batch, d)).astype(np.float32)
    all_rows /= np.linalg.norm(all_rows, axis=2, keepdims=True)
    stop = False
    errors = []

    def flusher():
        try:
            while not stop:
                store._flush()
        except Exception as exc:  # pragma: no cover - the failure signal
            errors.append(exc)

    # The hazard window (between the flush's concatenate and its pending
    # reset) is sub-microsecond; the default 5 ms GIL switch interval
    # would practically never land an append inside it.
    prev_switch = sys.getswitchinterval()
    sys.setswitchinterval(1e-6)
    try:
        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(flusher)
            try:
                for i in range(n_batches):
                    store.add_embeddings(None, all_rows[i])
            finally:
                stop = True
                fut.result(timeout=60)
    finally:
        sys.setswitchinterval(prev_switch)
    assert not errors
    store._flush()
    assert store._count == n_batches * batch
    assert len(store) == n_batches * batch


def test_append_landing_mid_flush_commit_survives(monkeypatch):
    """Deterministic form of the append/flush race: an add_embeddings call
    landing while a flush commits its snapshot must survive to the device
    buffer. The losing implementation concatenated the SHARED pending list
    and then cleared it — wiping any row appended in between. Injection
    point: np.concatenate is the snapshot step of the flush, so an append
    fired right after it emulates the executor-thread interleaving."""
    rng = np.random.default_rng(3)
    d = 16
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(d), min_score=0.0
        )
    )

    racing_row = rng.standard_normal((1, d)).astype(np.float32)
    racing_row /= np.linalg.norm(racing_row)
    armed = [False]
    orig_concat = np.concatenate

    def racy_concatenate(arrays, *args, **kwargs):
        out = orig_concat(arrays, *args, **kwargs)
        if armed[0]:
            armed[0] = False
            store.add_embeddings(None, racing_row)
        return out

    first = rng.standard_normal((8, d)).astype(np.float32)
    first /= np.linalg.norm(first, axis=1, keepdims=True)
    store.add_embeddings(None, first)
    monkeypatch.setattr(np, "concatenate", racy_concatenate)
    armed[0] = True
    store._flush()
    monkeypatch.undo()
    assert len(store) == 9  # 8 committed + the racing row, none lost
    store._flush()
    assert store._count == 9


def test_warm_serving_precompiles_buckets():
    """warm_serving dispatches one lookup per query bucket up to max_batch
    so cold-shape compiles happen at startup, not under serving traffic."""
    rng = np.random.default_rng(5)
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(16), min_score=0.0
        )
    )
    assert store.warm_serving() == 0  # empty store: nothing to compile
    rows = rng.standard_normal((100, 16)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    store.add_embeddings(None, rows)
    assert store.warm_serving(max_batch=64) == 4  # buckets 8, 16, 32, 64
    # Warmed store still answers correctly.
    hits = store.fuzzy_lookup_embedding(rows[3], max_hits=1)
    assert hits[0].item == 3


async def test_subset_lookup_async_matches_sync(rng):
    """fuzzy_lookup_embedding_in_subset_async == sync route (same dispatch,
    off-loop fetch), incl. concurrent callers sharing the store."""
    import asyncio

    dim = 16
    store = make_store(dim)
    matrix = random_normalized(rng, 500, dim)
    store.add_embeddings(None, matrix)
    subsets = [
        [3, 77, 13, 200, 499, 42],
        list(range(0, 500, 7)),
        [499],
    ]
    queries = [matrix[77], matrix[0], matrix[499]]

    async def one(q, subset):
        return await store.fuzzy_lookup_embedding_in_subset_async(
            q, subset, max_hits=3
        )

    got = await asyncio.gather(
        *[one(q, s) for q, s in zip(queries, subsets)]
    )
    for q, subset, res in zip(queries, subsets, got):
        expected = store.fuzzy_lookup_embedding_in_subset(q, subset, max_hits=3)
        assert [(r.item, round(r.score, 6)) for r in res] == [
            (r.item, round(r.score, 6)) for r in expected
        ]
    assert (
        await store.fuzzy_lookup_embedding_in_subset_async(
            np.zeros(dim, np.float32), []
        )
        == []
    )
