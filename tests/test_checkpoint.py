"""Orbax sharding-aware checkpoints: save from one mesh topology, restore
into another, lookups identical. Runs on the virtual 8-device CPU mesh.
"""

import jax
import numpy as np
import pytest

from typeagent_tpu.parallel import create_mesh
from typeagent_tpu.parallel.checkpoint import (
    restore_corpus,
    restore_sharded_store,
    save_corpus,
    save_sharded_store,
)
from typeagent_tpu.parallel.corpus import CorpusVectorStore
from typeagent_tpu.parallel.sharded import ShardedVectorStore

DIM = 16

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def rows(n, seed=0):
    r = np.random.default_rng(seed).standard_normal((n, DIM)).astype(np.float32)
    return r / np.linalg.norm(r, axis=1, keepdims=True)


def top1_ordinals(store, queries):
    return [hits[0][0] for hits in store.search(queries, k=1)]


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_save_restore_same_topology(tmp_path, dtype):
    mesh = create_mesh(n_shard=4, n_dp=2)
    store = ShardedVectorStore(mesh, DIM, dtype=dtype)
    data = rows(200, seed=1)
    store.append(data)

    save_sharded_store(store, tmp_path / "ckpt")
    restored = restore_sharded_store(mesh, tmp_path / "ckpt")

    assert restored.count == store.count
    assert restored._dtype == store._dtype
    queries = rows(8, seed=2)
    assert top1_ordinals(restored, queries) == top1_ordinals(store, queries)
    # Device state restored bit-for-bit (no dequantize/requantize round trip).
    np.testing.assert_array_equal(
        np.asarray(restored.buf), np.asarray(store.buf)
    )


def test_restore_into_different_topology(tmp_path):
    mesh8 = create_mesh(n_shard=4, n_dp=2)
    store = ShardedVectorStore(mesh8, DIM, dtype="bfloat16")
    data = rows(300, seed=3)
    store.append(data)
    expected = top1_ordinals(store, rows(8, seed=4))

    save_sharded_store(store, tmp_path / "ckpt")

    # Resume on a narrower mesh: 4 shards, no dp.
    mesh4 = create_mesh(n_shard=4, n_dp=1)
    restored = restore_sharded_store(mesh4, tmp_path / "ckpt")
    assert restored.count == 300
    assert top1_ordinals(restored, rows(8, seed=4)) == expected

    # And on a single-device mesh (chip-count change).
    mesh1 = create_mesh(n_shard=1, n_dp=1)
    restored1 = restore_sharded_store(mesh1, tmp_path / "ckpt")
    assert top1_ordinals(restored1, rows(8, seed=4)) == expected


def test_restore_appendable_after_load(tmp_path):
    mesh = create_mesh(n_shard=4, n_dp=2)
    store = ShardedVectorStore(mesh, DIM)
    store.append(rows(50, seed=5))
    save_sharded_store(store, tmp_path / "ckpt")

    restored = restore_sharded_store(mesh, tmp_path / "ckpt")
    more = rows(30, seed=6)
    restored.append(more)
    assert len(restored) == 80
    # The appended rows are live and searchable.
    hits = restored.search(more[:2], k=1)
    assert [h[0][0] for h in hits] == [50, 51]


def test_save_overwrites_previous_checkpoint(tmp_path):
    mesh = create_mesh(n_shard=4, n_dp=2)
    store = ShardedVectorStore(mesh, DIM)
    store.append(rows(40, seed=7))
    save_sharded_store(store, tmp_path / "ckpt")
    store.append(rows(24, seed=8))
    save_sharded_store(store, tmp_path / "ckpt")  # overwrite in place
    restored = restore_sharded_store(mesh, tmp_path / "ckpt")
    assert restored.count == 64


def test_corpus_checkpoint_round_trip(tmp_path):
    mesh8 = create_mesh(n_shard=4, n_dp=2)
    corpus = CorpusVectorStore(DIM, mesh=mesh8, dtype="bfloat16")
    a, b = rows(120, seed=9), rows(80, seed=10)
    corpus.append("alpha", a)
    corpus.append("beta", b)
    corpus.append("alpha", rows(10, seed=11))

    save_corpus(corpus, tmp_path / "corpus")

    mesh4 = create_mesh(n_shard=4, n_dp=1)  # different topology
    restored = restore_corpus(mesh4, tmp_path / "corpus")
    assert len(restored) == 210
    assert restored.count_for("alpha") == 130
    assert restored.count_for("beta") == 80

    # Scoped search stays exact after restore: beta's best match is found
    # even though alpha rows dominate the matrix.
    query = b[7:8]
    scoped = restored.search(query, k=1, conversations=["beta"])[0]
    assert scoped[0].conversation == "beta"
    assert scoped[0].local_ordinal == 7
    globally = restored.search(query, k=1)[0]
    assert globally[0].conversation == "beta"


def test_restore_fallback_when_capacity_does_not_tile(tmp_path):
    """A 3-shard mesh's capacity quantum (24) doesn't divide the saved 1024
    capacity: restore takes the host re-append fallback and stays correct."""
    mesh4 = create_mesh(n_shard=4, n_dp=1)
    store = ShardedVectorStore(mesh4, DIM, dtype="float32")
    store.append(rows(100, seed=20))
    expected = top1_ordinals(store, rows(6, seed=21))
    save_sharded_store(store, tmp_path / "ckpt")

    mesh3 = create_mesh(n_shard=3, n_dp=1)
    restored = restore_sharded_store(mesh3, tmp_path / "ckpt")
    assert restored.count + restored._pending_rows == 100 or len(restored) == 100
    assert top1_ordinals(restored, rows(6, seed=21)) == expected


def test_restore_fallback_quantized(tmp_path):
    mesh4 = create_mesh(n_shard=4, n_dp=1)
    store = ShardedVectorStore(mesh4, DIM, dtype="int8")
    store.append(rows(80, seed=22))
    expected = top1_ordinals(store, rows(6, seed=23))
    save_sharded_store(store, tmp_path / "ckpt")

    mesh3 = create_mesh(n_shard=3, n_dp=1)
    restored = restore_sharded_store(mesh3, tmp_path / "ckpt")
    assert len(restored) == 80
    # Re-quantization on the fallback path is per-row symmetric: top-1
    # self-matches survive it.
    assert top1_ordinals(restored, rows(6, seed=23)) == expected


def test_nonblocking_save(tmp_path):
    """block=False: metadata lands only at wait(); restore sees full state."""
    import os

    mesh = create_mesh(n_shard=4, n_dp=1)
    store = ShardedVectorStore(mesh, DIM)
    store.append(rows(64, seed=30))
    pending = save_sharded_store(store, tmp_path / "async_ckpt", block=False)
    pending.wait()
    pending.wait()  # idempotent
    assert os.path.exists(tmp_path / "async_ckpt" / "store_meta.json")
    restored = restore_sharded_store(mesh, tmp_path / "async_ckpt")
    assert restored.count == 64


def test_corpus_checkpoint_preserves_search_mode(tmp_path):
    mesh = create_mesh(n_shard=4, n_dp=1)
    corpus = CorpusVectorStore(DIM, mesh=mesh, search_mode="approx")
    corpus.append("a", rows(40, seed=31))
    save_corpus(corpus, tmp_path / "c")
    restored = restore_corpus(mesh, tmp_path / "c")
    assert restored._store.search_mode == "approx"
    assert restored.search(rows(2, seed=31), k=1)[0][0].local_ordinal == 0


# ---------------------------------------------------------------------------
# Single-chip VectorStore checkpoints
# ---------------------------------------------------------------------------


def make_vector_store(dtype="float32", mesh=None):
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    settings = TextEmbeddingIndexSettings(
        embedding_model=create_test_embedding_model(DIM),
        min_score=0.0,
        dtype=dtype,
        mesh=mesh,
    )
    return VectorStore(settings)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_vector_store_checkpoint_round_trip(tmp_path, dtype):
    from typeagent_tpu.parallel.checkpoint import (
        restore_vector_store,
        save_vector_store,
    )

    store = make_vector_store(dtype)
    data = rows(120, seed=40)
    store.add_embeddings(None, data)
    save_vector_store(store, tmp_path / "vs")

    restored = restore_vector_store(store.settings, tmp_path / "vs")
    assert len(restored) == 120
    hit = restored.fuzzy_lookup_embedding(data[33], max_hits=1)[0]
    assert hit.item == 33
    np.testing.assert_array_equal(np.asarray(restored._buf), np.asarray(store._buf))


def test_vector_store_checkpoint_empty(tmp_path):
    from typeagent_tpu.parallel.checkpoint import (
        restore_vector_store,
        save_vector_store,
    )

    store = make_vector_store()
    pending = save_vector_store(store, tmp_path / "empty")
    pending.wait()
    restored = restore_vector_store(store.settings, tmp_path / "empty")
    assert len(restored) == 0


def test_vector_store_checkpoint_mesh_backed(tmp_path):
    from typeagent_tpu.parallel.checkpoint import (
        restore_vector_store,
        save_vector_store,
    )

    mesh = create_mesh(n_shard=4, n_dp=1)
    store = make_vector_store("bfloat16", mesh=mesh)
    data = rows(90, seed=41)
    store.add_embeddings(None, data)
    save_vector_store(store, tmp_path / "mvs")

    restored = restore_vector_store(store.settings, tmp_path / "mvs")
    assert len(restored) == 90
    hit = restored.fuzzy_lookup_embedding(data[11], max_hits=1)[0]
    assert hit.item == 11


def test_restore_missing_paths_raise_clean_errors(tmp_path):
    import json

    mesh = create_mesh(n_shard=4, n_dp=1)
    with pytest.raises(FileNotFoundError, match="store_meta"):
        restore_sharded_store(mesh, tmp_path / "never_saved")
    # Metadata without state: orbax names the missing checkpoint dir.
    broken = tmp_path / "broken"
    broken.mkdir()
    (broken / "store_meta.json").write_text(
        json.dumps(
            {"dim": 8, "dim_pad": 128, "dtype": "float32", "count": 5, "capacity": 128}
        )
    )
    with pytest.raises(FileNotFoundError, match="not found"):
        restore_sharded_store(mesh, broken)
