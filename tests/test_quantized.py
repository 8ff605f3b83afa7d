"""int8-quantized vector store vs f32 oracle."""

import numpy as np
import pytest

from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.ops.topk import quantize_rows
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore


def normalized(rng, n, dim):
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def make_store(dim, dtype):
    return VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(dim),
            min_score=0.0,
            dtype=dtype,
        )
    )


def test_quantize_rows_roundtrip(rng):
    rows = normalized(rng, 50, 128)
    q, scales = quantize_rows(rows)
    assert q.dtype == np.int8 and scales.shape == (50,)
    restored = q.astype(np.float32) * scales[:, None]
    np.testing.assert_allclose(restored, rows, atol=1e-2)
    # zero rows get scale 1.0 (no division blowup)
    qz, sz = quantize_rows(np.zeros((2, 8), np.float32))
    assert (qz == 0).all() and (sz == 1.0).all()


def test_int8_store_recall_vs_f32(rng):
    dim = 96
    matrix = normalized(rng, 2000, dim)
    f32 = make_store(dim, "float32")
    i8 = make_store(dim, "int8")
    f32.add_embeddings(None, matrix)
    i8.add_embeddings(None, matrix)

    queries = normalized(rng, 16, dim)
    exact = f32.fuzzy_lookup_embeddings_batch(queries, max_hits=10)
    quant = i8.fuzzy_lookup_embeddings_batch(queries, max_hits=10)
    recalls = []
    for e_row, q_row in zip(exact, quant):
        e_ids = {r.item for r in e_row}
        q_ids = {r.item for r in q_row}
        recalls.append(len(e_ids & q_ids) / 10)
    assert np.mean(recalls) >= 0.9  # int8 keeps ranking quality
    # Scores agree to quantization tolerance.
    for e_row, q_row in zip(exact, quant):
        assert q_row[0].score == pytest.approx(e_row[0].score, abs=5e-3)


def test_int8_self_match_and_growth(rng):
    dim = 32
    store = make_store(dim, "int8")
    matrix = normalized(rng, 3000, dim)
    for start in range(0, 3000, 700):  # spans capacity growth
        store.add_embeddings(None, matrix[start : start + 700])
    hit = store.fuzzy_lookup_embedding(matrix[1234], max_hits=1)[0]
    assert hit.item == 1234
    assert hit.score == pytest.approx(1.0, abs=5e-3)


def test_int8_subset_and_predicate(rng):
    dim = 32
    store = make_store(dim, "int8")
    matrix = normalized(rng, 300, dim)
    store.add_embeddings(None, matrix)
    sub = store.fuzzy_lookup_embedding_in_subset(matrix[7], [3, 7, 11], max_hits=2)
    assert sub[0].item == 7
    pred = store.fuzzy_lookup_embedding(
        matrix[8], max_hits=5, min_score=0.3, predicate=lambda i: i % 2 == 0
    )
    assert all(r.item % 2 == 0 for r in pred)
    assert pred[0].item == 8


def test_int8_serialize_dequantizes(rng):
    dim = 16
    store = make_store(dim, "int8")
    matrix = normalized(rng, 20, dim)
    store.add_embeddings(None, matrix)
    data = store.serialize()
    assert data.dtype == np.float32
    np.testing.assert_allclose(data, matrix, atol=1e-2)
    np.testing.assert_allclose(store.get_embedding_at(5), matrix[5], atol=1e-2)


# ---------------------------------------------------------------------------
# Bucketed approx kernel (TPU fusion; CPU exercises the approx fallback)
# ---------------------------------------------------------------------------


def test_bucket_topk_matches_exact_on_cpu(rng):
    import jax.numpy as jnp

    from typeagent_tpu.ops import topk as T

    n, d, b, k = 4096, 128, 16, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    emb_dev = jnp.asarray(emb)
    count = jnp.asarray(n, dtype=jnp.int32)

    ev, ei = T.cosine_topk(emb_dev, jnp.asarray(q), count.reshape(1), k)
    bv, bi = T.cosine_topk_bucket(emb_dev, jnp.asarray(q), count, k)
    recall = np.mean(
        [
            len(set(a.tolist()) & set(c.tolist())) / k
            for a, c in zip(np.asarray(ei), np.asarray(bi))
        ]
    )
    assert recall >= 0.9
    # Scores are in the public [0, 1] space.
    assert float(jnp.max(bv)) <= 1.0 and float(jnp.min(bv[bv > -1])) >= 0.0


def test_bucket_topk_respects_count_watermark(rng):
    import jax.numpy as jnp

    from typeagent_tpu.ops import topk as T

    n, d, k = 1024, 64, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    # Make a padded-region row the global best for query 0: it must be masked.
    count = 512
    emb[700] = emb_probe = emb[3]
    q = emb[3:4].copy()
    _, idx = T.cosine_topk_bucket(
        jnp.asarray(emb), jnp.asarray(q), jnp.asarray(count, jnp.int32), k
    )
    idx = np.asarray(idx)[0]
    assert 3 in idx.tolist()
    assert all(i < count for i in idx if i >= 0)


def test_pick_tile_bucket_power_of_two():
    from typeagent_tpu.ops.topk import _BUCKET_ROWS, _K_LANES, _pick_tile_bucket

    for d_pad, b_pad, itemsize in [(384, 256, 2), (384, 256, 4), (1536, 64, 2)]:
        tile = _pick_tile_bucket(1_000_000, d_pad, b_pad, itemsize)
        # Power of two >= 512 so buckets-per-tile divides the 128-lane block.
        assert tile & (tile - 1) == 0 and tile >= 512
        g = tile // _BUCKET_ROWS
        assert _K_LANES % g == 0
