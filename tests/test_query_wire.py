"""int8 query-wire mode: quarter-byte query upload for bf16 stores.

The serve path on remote-attached devices is transfer-bound; queries ride
the wire as int8 + per-query scale and dequantize to bf16 on device. Wire
quantization shifts scores ~1e-3, so the mode is opt-in
(``TextEmbeddingIndexSettings(query_wire="int8")``) and exact modes keep
their float wire by default.
"""

import numpy as np
import pytest

from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.vectorstore import (
    TextEmbeddingIndexSettings,
    VectorStore,
    _quantize_queries_host,
)


def _normal(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def make_store(dim, **kw):
    return VectorStore(
        TextEmbeddingIndexSettings(
            create_test_embedding_model(dim), min_score=0.0, **kw
        )
    )


def test_int8_wire_requires_bf16_store():
    with pytest.raises(ValueError):
        TextEmbeddingIndexSettings(
            create_test_embedding_model(8), dtype="float32", query_wire="int8"
        )
    with pytest.raises(ValueError):
        TextEmbeddingIndexSettings(
            create_test_embedding_model(8), dtype="int8", query_wire="int8"
        )


def test_quantize_queries_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    q = _normal(rng, 32, 64)
    qi, sc = _quantize_queries_host(q)
    assert qi.dtype == np.int8 and sc.dtype == np.float32
    back = qi.astype(np.float32) * sc[:, None]
    assert np.abs(back - q).max() <= (sc.max() / 2) + 1e-7


def test_int8_wire_selection_close_to_float_wire():
    rng = np.random.default_rng(1)
    dim = 64
    mat = _normal(rng, 2000, dim)
    queries = _normal(rng, 32, dim)
    queries[:8] = mat[:8]  # self-match queries

    ref = make_store(dim, dtype="bfloat16")
    ref.add_embeddings(None, mat)
    wire8 = make_store(dim, dtype="bfloat16", query_wire="int8")
    wire8.add_embeddings(None, mat)

    out_ref = ref.fuzzy_lookup_embeddings_batch(queries, max_hits=10)
    out_8 = wire8.fuzzy_lookup_embeddings_batch(queries, max_hits=10)
    for i in range(8):  # exact self-matches survive wire quantization
        assert out_8[i][0].item == i
    overlaps = [
        len({s.item for s in a} & {s.item for s in b}) / 10
        for a, b in zip(out_8, out_ref)
    ]
    assert np.mean(overlaps) >= 0.95, np.mean(overlaps)
    for a, b in zip(out_8, out_ref):  # scores shift only at wire precision
        for sa, sb in zip(a[:3], b[:3]):
            assert abs(sa.score - sb.score) < 2e-2


def test_int8_wire_many_matches_batch_route():
    rng = np.random.default_rng(2)
    dim = 32
    mat = _normal(rng, 500, dim)
    store = make_store(dim, dtype="bfloat16", query_wire="int8")
    store.add_embeddings(None, mat)
    qs = np.stack([_normal(rng, 16, dim) for _ in range(3)])
    many = store.fuzzy_lookup_embeddings_many(qs, max_hits=5)
    for r in range(3):
        batch = store.fuzzy_lookup_embeddings_batch(qs[r], max_hits=5)
        assert [[s.item for s in row] for row in many[r]] == [
            [s.item for s in row] for row in batch
        ]


def test_int8_wire_subset_and_predicate_paths():
    rng = np.random.default_rng(3)
    dim = 32
    mat = _normal(rng, 300, dim)
    store = make_store(dim, dtype="bfloat16", query_wire="int8")
    store.add_embeddings(None, mat)
    sub = store.fuzzy_lookup_embedding_in_subset(mat[7], [5, 6, 7, 8], max_hits=2)
    assert sub[0].item == 7
    pred = store.fuzzy_lookup_embeddings_batch(
        mat[:1], max_hits=5, predicate=lambda i: i % 2 == 0
    )
    assert all(s.item % 2 == 0 for s in pred[0])


def test_int8_wire_through_lookup_batcher():
    import asyncio

    from typeagent_tpu.serve import LookupBatcher

    rng = np.random.default_rng(4)
    dim = 32
    mat = _normal(rng, 400, dim)
    store = make_store(dim, dtype="bfloat16", query_wire="int8")
    store.add_embeddings(None, mat)

    async def run():
        b = LookupBatcher(store, max_delay_ms=1.0, max_coalesce=4, max_inflight=2)
        outs = await asyncio.gather(
            *(b.lookup(mat[i * 8 : i * 8 + 8], max_hits=3) for i in range(6))
        )
        await b.close()
        return outs

    outs = asyncio.run(run())
    for gi, rows in enumerate(outs):
        for r, row in enumerate(rows):
            assert row[0].item == gi * 8 + r  # self-match survives the wire


def test_int8_wire_coalesced_group_identical_to_solo():
    """Coalesced int8-wire dispatches must quantize from the f32 queries:
    stacking the group in bf16 first would shift the int8 codes (and
    near-tie ranks) vs a solo dispatch of the same query."""
    import asyncio

    from typeagent_tpu.serve import LookupBatcher

    rng = np.random.default_rng(9)
    dim = 32
    mat = _normal(rng, 400, dim)
    store = make_store(dim, dtype="bfloat16", query_wire="int8")
    store.add_embeddings(None, mat)
    batches = [_normal(rng, 8, dim) for _ in range(5)]

    async def run():
        b = LookupBatcher(store, max_delay_ms=5.0, max_coalesce=8)
        outs = await asyncio.gather(
            *(b.lookup(q, max_hits=4) for q in batches)
        )
        await b.close()
        return outs, b

    outs, batcher = asyncio.run(run())
    assert batcher.dispatches < len(batches)  # they did coalesce
    for q, got in zip(batches, outs):
        solo = store.fuzzy_lookup_embeddings_batch(q, max_hits=4)
        assert [[(s.item, s.score) for s in r] for r in got] == [
            [(s.item, s.score) for s in r] for r in solo
        ]
