"""Multi-batch single-dispatch program (ops/topk.topk_many) across every
engine mode, plus sharded interval-search edge cases.

Pins: each mode's stacked output equals the per-batch program's output;
certificates stack; interval tables handle overlap, shard straddling,
beyond-Pallas-size tables, and reserve() pre-sizing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from typeagent_tpu.ops import topk


@pytest.fixture
def rng():
    return np.random.default_rng(9)


def _normed(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


def _pad(m, n_pad, d_pad):
    out = np.zeros((n_pad, d_pad), np.float32)
    out[: m.shape[0], : m.shape[1]] = m
    return out


@pytest.fixture
def setup(rng):
    d, count = 48, 2000
    m = _normed(rng, count, d)
    emb = jnp.asarray(_pad(m, 2048, 128))
    qs = jnp.asarray(
        np.stack([_pad(_normed(rng, 8, d), 8, 128) for _ in range(3)])
    )
    return emb, qs, jnp.asarray(count, jnp.int32)


def test_topk_many_exact1_matches_per_batch(setup):
    emb, qs, count = setup
    vals, idx = topk.topk_many(
        emb, None, qs, count, k=5, mode="exact1", use_pallas=False
    )
    for r in range(3):
        v1, i1 = topk.topk_program(emb, qs[r], count, 5, use_pallas=False)
        np.testing.assert_allclose(np.asarray(vals[r]), np.asarray(v1), atol=1e-6)
        assert (np.asarray(idx[r]) == np.asarray(i1)).all()


def test_topk_many_exact2_stacks_certificates(setup):
    emb, qs, count = setup
    vals, idx, cert = topk.topk_many(
        emb, None, qs, count, k=5, mode="exact2", use_pallas=False
    )
    assert np.asarray(cert).shape == (3, 8)
    assert np.asarray(cert).all()
    v1, i1, _ = topk.topk_program_exact2(emb, qs[1], count, 5, use_pallas=False)
    assert (np.asarray(idx[1]) == np.asarray(i1)).all()


def test_topk_many_hybrid_mode(setup):
    emb, qs, count = setup
    shadow = emb.astype(jnp.bfloat16)
    vals, idx, cert = topk.topk_many(
        emb, shadow, qs, count, k=5, mode="exact2h", use_pallas=False
    )
    assert np.asarray(cert).all()
    v1, i1 = topk.topk_program(emb, qs[2], count, 5, use_pallas=False)
    assert (np.asarray(idx[2]) == np.asarray(i1)).all()


def test_topk_many_quantized_mode(setup, rng):
    emb, qs, count = setup
    q_rows, scales = topk.quantize_rows(np.asarray(emb))
    vals, idx = topk.topk_many(
        jnp.asarray(q_rows),
        jnp.asarray(scales),
        qs,
        count,
        k=5,
        mode="quantized",
        use_pallas=False,
    )
    v1, i1 = topk.topk_program_quantized(
        jnp.asarray(q_rows), jnp.asarray(scales), qs[0], count, 5,
        use_pallas=False,
    )
    assert (np.asarray(idx[0]) == np.asarray(i1)).all()


def test_topk_many_approx_mode(setup):
    emb, qs, count = setup
    vals, idx = topk.topk_many(
        emb, None, qs, count, k=5, mode="approx", use_pallas=False,
        recall_target=0.99,
    )
    # Approximate, but self-consistent with the single-batch approx program.
    v1, i1 = topk.cosine_topk_approx(emb, qs[0], count, 5, recall_target=0.99)
    assert (np.asarray(idx[0]) == np.asarray(i1)).all()


def test_topk_many_unknown_mode_raises(setup):
    emb, qs, count = setup
    with pytest.raises(ValueError, match="unknown mode"):
        topk.topk_many(
            emb, None, qs, count, k=5, mode="nope", use_pallas=False
        )


# ---------------------------------------------------------------------------
# Sharded interval search edges
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from typeagent_tpu.parallel import create_mesh

    return create_mesh(n_shard=4, n_dp=2)


def _sharded_store(mesh, rng, n=800, dim=32):
    from typeagent_tpu.parallel import ShardedVectorStore

    m = _normed(rng, n, dim)
    store = ShardedVectorStore(mesh, dim)
    store.append(m)
    return store, m


def _oracle_scoped(m, intervals, q, k):
    mask = np.zeros(m.shape[0], bool)
    for lo, hi in intervals:
        mask[lo:hi] = True
    scores = (m @ q + 1.0) / 2.0
    scores[~mask] = -1
    return set(np.argsort(-scores, kind="stable")[:k].tolist())


def test_intervals_overlapping_spans(mesh, rng):
    store, m = _sharded_store(mesh, rng)
    iv = [(100, 400), (300, 500)]  # overlap is fine (union semantics)
    q = m[250]
    res = store.search_intervals(m[250:251], np.asarray(iv), k=6)[0]
    got = {i for i, _ in res}
    assert got == _oracle_scoped(m, iv, q, 6)
    assert 250 in got


def test_intervals_straddle_shard_boundaries(mesh, rng):
    store, m = _sharded_store(mesh, rng)
    # Capacity 1024 over 4 shards -> shard boundaries at 256/512/768.
    iv = [(200, 300), (500, 800)]
    q = m[700]
    res = store.search_intervals(m[700:701], np.asarray(iv), k=8)[0]
    got = {i for i, _ in res}
    assert got == _oracle_scoped(m, iv, q, 8)


def test_intervals_beyond_pallas_table_size(mesh, rng):
    """More spans than the fused kernel supports: the XLA route must give
    identical results."""
    store, m = _sharded_store(mesh, rng)
    iv = [(i * 40, i * 40 + 15) for i in range(16)]  # 16 spans > 8
    q = m[45]
    res = store.search_intervals(m[45:46], np.asarray(iv), k=5)[0]
    got = {i for i, _ in res}
    assert got == _oracle_scoped(m, iv, q, 5)


def test_intervals_min_score_filter(mesh, rng):
    store, m = _sharded_store(mesh, rng)
    res = store.search_intervals(
        m[10:11], np.asarray([(0, 100)]), k=5, min_score=0.999
    )[0]
    assert [i for i, _ in res] == [10]  # only the self-match clears 0.999


def test_intervals_empty_store_and_empty_table(mesh, rng):
    from typeagent_tpu.parallel import ShardedVectorStore

    store = ShardedVectorStore(mesh, 32)
    assert store.search_intervals(np.zeros((2, 32), np.float32), np.zeros((0, 2)), 3) == [
        [],
        [],
    ]
    store2, m = _sharded_store(mesh, rng, n=50)
    assert store2.search_intervals(m[:1], np.zeros((0, 2)), 3) == [[]]


def test_reserve_presizes_and_append_fits(mesh, rng):
    from typeagent_tpu.parallel import ShardedVectorStore

    store = ShardedVectorStore(mesh, 16)
    store.reserve(5000)
    cap = store.buf.shape[0]
    assert cap >= 5000 and cap % 1024 == 0
    m = _normed(rng, 3000, 16)
    store.append(m)
    store.search(m[:1], k=1)  # flush
    assert store.buf.shape[0] == cap  # no regrow needed
    assert len(store) == 3000


def test_reserve_noop_when_smaller(mesh, rng):
    from typeagent_tpu.parallel import ShardedVectorStore

    store = ShardedVectorStore(mesh, 16)
    store.reserve(4096)
    cap = store.buf.shape[0]
    store.reserve(100)  # smaller: no shrink
    assert store.buf.shape[0] == cap


# ---------------------------------------------------------------------------
# intervals_to_rowmask + topk_program_masked (the >8-interval fused route)
# ---------------------------------------------------------------------------


def _oracle_union_mask(n, intervals):
    mask = np.zeros(n, bool)
    for lo, hi in intervals:
        mask[max(lo, 0) : max(hi, 0)] = True
    return mask


@pytest.mark.parametrize(
    "intervals",
    [
        [(0, 0)],  # padding only: selects nothing
        [(5, 10)],
        [(0, 100)],
        [(10, 20), (15, 40)],  # overlapping
        [(50, 60), (5, 12)],  # unsorted
        [(0, 10), (0, 0), (90, 100), (0, 0)],  # real + padding interleaved
        [(3, 4), (3, 4), (3, 4)],  # duplicates
        [(0, 30), (10, 20)],  # nested
    ],
)
def test_intervals_to_rowmask_matches_union_oracle(intervals):
    n = 128
    iv = jnp.asarray(np.asarray(intervals, np.int32))
    got = np.asarray(topk.intervals_to_rowmask(n, iv))[0] > 0
    np.testing.assert_array_equal(got, _oracle_union_mask(n, intervals))


def test_topk_program_masked_matches_oracle(rng):
    n, d, k = 500, 32, 7
    m = _normed(rng, n, d)
    q = m[123:124]
    mask = np.zeros(n, bool)
    mask[50:200] = True
    mask[400:450] = True
    vals, idx = topk.topk_program_masked(
        jnp.asarray(m), jnp.asarray(q), jnp.asarray(n, jnp.int32),
        jnp.asarray(mask), k,
    )
    scores = (m @ q[0] + 1.0) / 2.0
    scores[~mask] = -1.0
    want = np.argsort(-scores, kind="stable")[:k]
    got = np.asarray(idx)[0]
    assert set(got.tolist()) == set(want.tolist())
    assert 123 in got and np.asarray(vals)[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_topk_program_masked_all_masked_out(rng):
    n, d = 200, 16
    m = _normed(rng, n, d)
    vals, idx = topk.topk_program_masked(
        jnp.asarray(m), jnp.asarray(m[:2]), jnp.asarray(n, jnp.int32),
        jnp.zeros(n, jnp.int32), 5,
    )
    assert (np.asarray(idx) == -1).all()


# ---------------------------------------------------------------------------
# Quantized (int8) scoped search: masked/interval routes must ride the fused
# kernel path with the same union semantics as the float routes (the old
# einsum fallback materialized [b, n] scores — OOM at 30M rows).
# ---------------------------------------------------------------------------


def _sharded_store_q(mesh, rng, n=800, dim=32):
    from typeagent_tpu.parallel import ShardedVectorStore

    m = _normed(rng, n, dim)
    store = ShardedVectorStore(mesh, dim, dtype="int8")
    store.append(m)
    return store, m


def _oracle_scoped_q(store, intervals, q, k):
    # Oracle over the store's own dequantized rows (quantization error is
    # part of the contract; route parity is what we pin).
    rows = store.get_rows(0, len(store))
    mask = np.zeros(rows.shape[0], bool)
    for lo, hi in intervals:
        mask[lo:hi] = True
    scores = (rows @ q + 1.0) / 2.0
    scores[~mask] = -1
    return set(np.argsort(-scores, kind="stable")[:k].tolist())


def test_intervals_quantized_matches_dequantized_oracle(mesh, rng):
    store, m = _sharded_store_q(mesh, rng)
    iv = [(100, 400), (300, 500)]
    res = store.search_intervals(m[250:251], np.asarray(iv), k=6)[0]
    got = {i for i, _ in res}
    assert got == _oracle_scoped_q(store, iv, m[250], 6)
    assert 250 in got


def test_intervals_quantized_straddles_shards(mesh, rng):
    store, m = _sharded_store_q(mesh, rng)
    iv = [(200, 300), (500, 800)]
    res = store.search_intervals(m[700:701], np.asarray(iv), k=8)[0]
    assert {i for i, _ in res} == _oracle_scoped_q(store, iv, m[700], 8)


def test_intervals_quantized_beyond_pallas_table_size(mesh, rng):
    store, m = _sharded_store_q(mesh, rng)
    iv = [(i * 40, i * 40 + 15) for i in range(16)]
    res = store.search_intervals(m[45:46], np.asarray(iv), k=5)[0]
    assert {i for i, _ in res} == _oracle_scoped_q(store, iv, m[45], 5)


def test_search_masked_quantized_matches_oracle(mesh, rng):
    store, m = _sharded_store_q(mesh, rng)
    mask = np.zeros(store.buf.shape[0], bool)
    picked = rng.choice(800, size=137, replace=False)
    mask[picked] = True
    res = store.search_masked(m[int(picked[0]) : int(picked[0]) + 1], mask, k=7)[0]
    got = {i for i, _ in res}
    rows = store.get_rows(0, len(store))
    scores = (rows @ m[int(picked[0])] + 1.0) / 2.0
    oracle_mask = np.zeros(rows.shape[0], bool)
    oracle_mask[picked] = True
    scores[~oracle_mask] = -1
    assert got == set(np.argsort(-scores, kind="stable")[:7].tolist())
    assert int(picked[0]) in got
