"""Distributed search on a virtual 8-device CPU mesh.

Validates the multi-chip sharding path (per-shard top-k + all-gather merge)
without TPU hardware (SURVEY.md §4: mesh tests on CPU via
xla_force_host_platform_device_count). Mirrors tests/test_vectorstore.py
case-for-case: oracle parity, min_score, growth, pending-buffer batching,
subset/masked lookup, bf16/int8 modes, serialize round-trips.
"""

import jax
import numpy as np
import pytest

from typeagent_tpu.parallel import ShardedVectorStore, create_mesh


def normalized(rng, n, dim):
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def oracle_topk(matrix, q, k, min_score=0.0, subset=None):
    m = matrix[subset] if subset is not None else matrix
    if m.shape[0] == 0:
        return []
    s = np.clip((m @ q + 1) / 2, 0, 1)
    order = np.argsort(-s, kind="stable")[:k]
    out = [(int(i), float(s[i])) for i in order if s[i] >= min_score]
    if subset is not None:
        out = [(int(subset[i]), v) for i, v in out]
    return out


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(n_shard=8, n_dp=1)


def test_sharded_matches_oracle(mesh8, rng):
    dim = 64
    store = ShardedVectorStore(mesh8, dim)
    matrix = normalized(rng, 5000, dim)
    store.append(matrix[:3000])
    store.append(matrix[3000:])
    assert len(store) == 5000

    queries = normalized(rng, 9, dim)
    results = store.search(queries, k=10)
    for qi, q in enumerate(queries):
        scores = np.clip((matrix @ q + 1) / 2, 0, 1)
        expect = np.argsort(scores)[::-1][:10]
        got = [i for i, _ in results[qi]]
        assert set(got) == set(int(i) for i in expect)
        got_scores = [s for _, s in results[qi]]
        np.testing.assert_allclose(got_scores, np.sort(scores)[::-1][:10], atol=2e-5)


def test_sharded_with_dp_axis(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = create_mesh(n_shard=4, n_dp=2)
    dim = 32
    store = ShardedVectorStore(mesh, dim)
    matrix = normalized(rng, 1000, dim)
    store.append(matrix)
    queries = normalized(rng, 16, dim)
    results = store.search(queries, k=5)
    for qi, q in enumerate(queries):
        scores = np.clip((matrix @ q + 1) / 2, 0, 1)
        expect = set(int(i) for i in np.argsort(scores)[::-1][:5])
        assert set(i for i, _ in results[qi]) == expect


def test_sharded_growth_and_partial_fill(mesh8, rng):
    dim = 16
    store = ShardedVectorStore(mesh8, dim)
    matrix = normalized(rng, 37, dim)  # much smaller than capacity
    store.append(matrix)
    results = store.search(matrix[:2], k=50)
    # k capped by count; only live rows may appear
    for res in results:
        assert len(res) == 37
        assert all(0 <= i < 37 for i, _ in res)
    assert results[0][0][0] == 0
    assert results[1][0][0] == 1


def test_sharded_min_score_on_device(mesh8, rng):
    dim = 16
    store = ShardedVectorStore(mesh8, dim)
    matrix = normalized(rng, 400, dim)
    store.append(matrix)
    q = matrix[17]
    results = store.search(q[None, :], k=50, min_score=0.9)[0]
    expect = oracle_topk(matrix, q, 50, min_score=0.9)
    assert results[0][0] == 17
    assert results[0][1] == pytest.approx(1.0, abs=1e-5)
    assert [i for i, _ in results] == [i for i, _ in expect]
    np.testing.assert_allclose(
        [v for _, v in results], [v for _, v in expect], atol=2e-5
    )


def test_sharded_pending_batching_many_small_appends(mesh8, rng):
    """Per-row appends buffer on the host; one flush before the search."""
    dim = 8
    store = ShardedVectorStore(mesh8, dim)
    rows = normalized(rng, 20, dim)
    for r in rows:
        store.append(r[None, :])
    assert len(store) == 20
    assert store.count == 0  # nothing flushed yet
    res = store.search(rows[13:14], k=1)[0]
    assert res[0][0] == 13
    assert store.count == 20


def test_sharded_incremental_growth_boundaries(mesh8, rng):
    dim = 24
    store = ShardedVectorStore(mesh8, dim)
    matrix = normalized(rng, 3000, dim)
    for start in range(0, 3000, 500):
        store.append(matrix[start : start + 500])
        res = store.search(matrix[start : start + 1], k=5)[0]
        assert res[0][0] == start
        expect = oracle_topk(matrix[: start + 500], matrix[start], 5)
        assert set(i for i, _ in res) == set(i for i, _ in expect)
    assert len(store) == 3000


def test_sharded_subset_lookup_exact(mesh8, rng):
    dim = 16
    store = ShardedVectorStore(mesh8, dim)
    matrix = normalized(rng, 500, dim)
    store.append(matrix)
    subset = [3, 77, 13, 200, 499, 42]
    q = matrix[77]
    res = store.search_subset(q[None, :], subset, k=3)[0]
    expect = oracle_topk(matrix, q, 3, subset=np.asarray(subset))
    assert res[0][0] == 77
    assert [i for i, _ in res] == [i for i, _ in expect]


def test_sharded_subset_empty(mesh8):
    store = ShardedVectorStore(mesh8, 8)
    assert store.search_subset(np.zeros((1, 8), np.float32), [], k=3) == [[]]
    store.append(np.eye(8, dtype=np.float32))
    assert store.search_subset(np.zeros((1, 8), np.float32), [], k=3) == [[]]


def test_sharded_masked_small_subset_not_shadowed(mesh8, rng):
    """A tiny masked subset must return its own best rows even when the
    global winners all live outside the mask (the k*8-oversample failure)."""
    dim = 32
    store = ShardedVectorStore(mesh8, dim)
    q = normalized(rng, 1, dim)[0]
    # 2000 rows nearly identical to the query, then 5 distant rows.
    near = q[None, :] + 0.01 * rng.standard_normal((2000, dim)).astype(np.float32)
    near /= np.linalg.norm(near, axis=1, keepdims=True)
    far = -q[None, :] + 0.01 * rng.standard_normal((5, dim)).astype(np.float32)
    far /= np.linalg.norm(far, axis=1, keepdims=True)
    matrix = np.concatenate([near, far], axis=0)
    store.append(matrix)
    subset = [2000, 2001, 2002, 2003, 2004]
    res = store.search_subset(q[None, :], subset, k=5)[0]
    assert len(res) == 5
    assert set(i for i, _ in res) == set(subset)


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_sharded_low_precision_modes(mesh8, rng, dtype):
    dim = 64
    store = ShardedVectorStore(mesh8, dim, dtype=dtype)
    matrix = normalized(rng, 2000, dim)
    store.append(matrix)
    queries = matrix[[5, 700, 1999]]
    results = store.search(queries, k=10)
    for qi, row in zip([5, 700, 1999], results):
        # Self-match must survive quantization at the top.
        assert row[0][0] == qi
        assert row[0][1] > 0.99
        expect = set(i for i, _ in oracle_topk(matrix, matrix[qi], 10))
        got = set(i for i, _ in row)
        # recall@10 >= 0.8 under low-precision storage
        assert len(got & expect) >= 8
    # masked path under quantization
    sub = store.search_subset(queries[:1], [5, 80, 900], k=2)[0]
    assert sub[0][0] == 5


def test_sharded_serialize_roundtrip(mesh8, rng):
    dim = 16
    store = ShardedVectorStore(mesh8, dim)
    matrix = normalized(rng, 50, dim)
    store.append(matrix)
    data = store.serialize()
    assert data.shape == (50, dim)
    np.testing.assert_allclose(data, matrix, atol=1e-6)

    store2 = ShardedVectorStore(mesh8, dim)
    store2.deserialize(data)
    assert len(store2) == 50
    r1 = store.search(matrix[9:10], k=3)[0]
    r2 = store2.search(matrix[9:10], k=3)[0]
    assert [i for i, _ in r1] == [i for i, _ in r2]


def test_sharded_serialize_includes_pending(mesh8, rng):
    dim = 8
    store = ShardedVectorStore(mesh8, dim)
    rows = normalized(rng, 5, dim)
    store.append(rows[:3])
    store.search(rows[:1], k=1)  # flush the first batch
    store.append(rows[3:])  # stays pending
    data = store.serialize()
    np.testing.assert_allclose(data, rows, atol=1e-6)


def test_sharded_clear(mesh8, rng):
    store = ShardedVectorStore(mesh8, 8)
    store.append(normalized(rng, 10, 8))
    store.search(np.zeros((1, 8), np.float32), k=1)
    store.clear()
    assert len(store) == 0
    assert store.search(np.zeros((1, 8), np.float32), k=3) == [[]]


def test_sharded_empty_store(mesh8):
    store = ShardedVectorStore(mesh8, 8)
    assert store.search(np.zeros((2, 8), np.float32), k=5) == [[], []]
    assert store.serialize().shape == (0, 8)


def test_sharded_differential_fuzz(mesh8):
    """Randomized op sequence vs a numpy oracle (mirrors the single-chip
    fuzz): odd-size appends, searches, subset searches, serialize round-trip."""
    rng = np.random.default_rng(321)
    dim = 24
    store = ShardedVectorStore(mesh8, dim)
    oracle = np.empty((0, dim), np.float32)

    for step in range(30):
        op = rng.integers(0, 5)
        if op <= 1 or len(store) == 0:
            n = int(rng.integers(1, 97))
            rows = rng.standard_normal((n, dim)).astype(np.float32)
            rows /= np.linalg.norm(rows, axis=1, keepdims=True)
            store.append(rows)
            oracle = np.concatenate([oracle, rows], axis=0)
        elif op == 2:
            q = rng.standard_normal(dim).astype(np.float32)
            q /= np.linalg.norm(q)
            got = store.search(q[None, :], k=5)[0]
            want = oracle_topk(oracle, q, 5)
            assert [g[0] for g in got] == [w[0] for w in want], step
            for g, w in zip(got, want):
                assert g[1] == pytest.approx(w[1], abs=1e-5)
        elif op == 3:
            subset = sorted(
                rng.choice(
                    len(store), size=min(7, len(store)), replace=False
                ).tolist()
            )
            q = rng.standard_normal(dim).astype(np.float32)
            q /= np.linalg.norm(q)
            got = store.search_subset(q[None, :], subset, k=3)[0]
            want = oracle_topk(oracle, q, 3, subset=np.asarray(subset))
            assert [g[0] for g in got] == [w[0] for w in want], step
        else:
            data = store.serialize()
            assert data.shape[0] == len(store) == oracle.shape[0]
            np.testing.assert_allclose(data, oracle, atol=1e-6)
            store2 = ShardedVectorStore(mesh8, dim)
            store2.deserialize(data)
            assert len(store2) == len(store)
            store = store2
    assert len(store) == oracle.shape[0] > 0


# ---------------------------------------------------------------------------
# Approximate sharded search (per-shard approx_max_k + all_gather merge)
# ---------------------------------------------------------------------------

DIM16 = 16  # small dim for the approx tests


def test_sharded_approx_matches_exact_on_cpu_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    """CPU approx_max_k is (near-)exact, so the approx sharded program must
    reproduce the exact sharded results — this pins the offset/merge logic."""
    mesh = create_mesh(n_shard=4, n_dp=2)
    rng = np.random.default_rng(11)
    rows = rng.standard_normal((200, DIM16)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)

    exact = ShardedVectorStore(mesh, DIM16, dtype="bfloat16")
    approx = ShardedVectorStore(
        mesh, 16, dtype="bfloat16", search_mode="approx", recall_target=0.95
    )
    exact.append(rows)
    approx.append(rows)

    queries = rows[17:25]
    res_exact = exact.search(queries, k=5)
    res_approx = approx.search(queries, k=5)
    for e_hits, a_hits in zip(res_exact, res_approx):
        assert [h[0] for h in a_hits] == [h[0] for h in e_hits]
        for (ei, ev), (ai, av) in zip(e_hits, a_hits):
            assert av == pytest.approx(ev, abs=1e-3)


def test_sharded_approx_min_score_and_self_match():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = create_mesh(n_shard=4, n_dp=1)
    store = ShardedVectorStore(mesh, DIM16, search_mode="approx")
    rng = np.random.default_rng(12)
    rows = rng.standard_normal((96, DIM16)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    store.append(rows)
    hits = store.search(rows[40:41], k=3, min_score=0.99)
    assert hits[0][0][0] == 40
    assert all(score >= 0.99 for _, score in hits[0])


def test_sharded_approx_rejects_int8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = create_mesh(n_shard=4, n_dp=1)
    with pytest.raises(ValueError, match="float32/bfloat16"):
        ShardedVectorStore(mesh, DIM16, dtype="int8", search_mode="approx")


def test_vectorstore_mesh_approx_settings_route():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    """TextEmbeddingIndexSettings(mesh=..., search_mode='approx') builds an
    approx sharded store under the hood."""
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    mesh = create_mesh(n_shard=4, n_dp=1)
    settings = TextEmbeddingIndexSettings(
        embedding_model=create_test_embedding_model(16),
        min_score=0.0,
        mesh=mesh,
        search_mode="approx",
        recall_target=0.9,
    )
    store = VectorStore(settings)
    rng = np.random.default_rng(13)
    rows = rng.standard_normal((64, DIM16)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    store.add_embeddings(None, rows)
    hits = store.fuzzy_lookup_embedding(rows[7], max_hits=1)
    assert hits[0].item == 7
    inner = store._sharded_store()
    assert inner.search_mode == "approx" and inner.recall_target == 0.9


def test_reserve_keeps_capacity_divisible_by_shards(rng):
    """reserve() must round to the capacity quantum (n_shard * 8), not a
    bare 1024: on a 6-shard mesh 2048 % 6 != 0 and the shard-axis split
    (and per-shard block-ownership offsets) would break."""
    if len(jax.devices()) < 6:
        pytest.skip("needs 6 (virtual) devices")
    mesh = create_mesh(n_shard=6, n_dp=1)
    dim = 32
    store = ShardedVectorStore(mesh, dim)
    store.reserve(2000)
    cap = store.buf.shape[0]
    assert cap >= 2000
    assert cap % store._cap_quantum == 0
    matrix = normalized(rng, 2000, dim)
    store.append(matrix)
    got = store.search(matrix[:4], k=3)
    assert [row[0][0] for row in got] == [0, 1, 2, 3]


def test_bf16_scores_wire_identity(mesh8, rng):
    """The mesh score matrix (predicate path) must be identical whether
    queries arrive as f32 or host-pre-rounded bf16: the kernel scores in
    the STORE dtype, so the bf16 query wire cannot shift any candidate
    across a min_score threshold."""
    import ml_dtypes

    dim = 32
    store = ShardedVectorStore(mesh8, dim, dtype="bfloat16")
    matrix = normalized(rng, 300, dim)
    store.append(matrix)
    q = normalized(rng, 4, dim)

    s_f32 = np.asarray(store.scores(q))
    q_rounded = q.astype(ml_dtypes.bfloat16).astype(np.float32)
    s_bf16 = np.asarray(store.scores(q_rounded))
    np.testing.assert_array_equal(s_f32, s_bf16)

    # And the scores agree with the bf16-effective oracle.
    m_bf = matrix.astype(ml_dtypes.bfloat16).astype(np.float32)
    q_bf = q.astype(ml_dtypes.bfloat16).astype(np.float32)
    oracle = np.clip((q_bf @ m_bf.T + 1.0) * 0.5, 0.0, 1.0)
    np.testing.assert_allclose(s_f32[:4, :300], oracle, atol=2e-3)
