"""Sharded per-shard IVF (parallel/ivf.py) on the virtual 8-device mesh.

Round-4 verdict item 3: the IVF engine must compose with the mesh —
per-shard build (no cross-shard traffic), SPMD query with all-gather
winner + certificate merge, verified against the numpy oracle.
"""

import jax
import numpy as np
import pytest

from typeagent_tpu.parallel import ShardedVectorStore, create_mesh

DIM = 64
K = 10


def _clustered(rng, n, dim, clusters, sigma=0.35, bg=0.02):
    centers = rng.standard_normal((clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, clusters, size=n)
    rows = centers[labels] + sigma * rng.standard_normal((n, dim)).astype(
        np.float32
    ) / np.sqrt(dim)
    iso = rng.standard_normal((n, dim)).astype(np.float32)
    take = rng.random(n) < bg
    rows = np.where(take[:, None], iso, rows)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows.astype(np.float32), centers


def _oracle_topk(rows, queries, k):
    scores = np.clip((queries @ rows.T + 1.0) * 0.5, 0.0, 1.0)
    order = np.argsort(-scores, kind="stable", axis=1)[:, :k]
    return order, scores


def _check_vs_oracle(results, certs, rows, queries, k, *, tol=5e-3):
    """Certified queries must match the oracle exactly (up to eps ties);
    every query's hits must score correctly."""
    want, scores = _oracle_topk(rows, queries, k)
    n_cert = 0
    recall_sum = 0.0
    for qi, (got, cert) in enumerate(zip(results, certs)):
        got_ids = [g for g, _ in got]
        for g, v in got:
            assert abs(scores[qi, g] - v) < tol, (qi, g, scores[qi, g], v)
        kth = scores[qi, want[qi, -1]]
        recall_sum += len(set(got_ids) & set(want[qi].tolist())) / k
        if cert:
            n_cert += 1
            # Exactness up to ties: any disagreeing hit must tie the k-th.
            for g in set(got_ids) ^ set(want[qi].tolist()):
                assert abs(scores[qi, g] - kth) < 1e-4, (
                    qi, g, scores[qi, g], kth,
                )
    return n_cert, recall_sum / len(results)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(n_shard=4, n_dp=2, devices=jax.devices("cpu")[:8])


def test_sharded_ivf_vs_oracle(mesh):
    rng = np.random.default_rng(3)
    # Rows distribute randomly across shards, so each shard sees ALL topics
    # in its ~4096-row slice: the per-shard cluster budget (slice /
    # rows_per_cluster = 32) must comfortably exceed the topic count or
    # merged-topic buckets balloon the radii and kill the certificate (the
    # same clusters>topics rule as the single-chip builds, docs/spec/ivf.md).
    n, clusters = 16384, 12
    rows, centers = _clustered(rng, n, DIM, clusters)
    store = ShardedVectorStore(mesh, DIM, dtype="float32", ivf_b=12)
    store.append(rows)
    store.build_ivf(rows_per_cluster=128, outlier_frac=0.05)

    # Topic queries (corpus-like: what users ask about).
    labels = rng.integers(0, clusters, size=24)
    q = centers[labels] + 0.35 * rng.standard_normal((24, DIM)).astype(
        np.float32
    ) / np.sqrt(DIM)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    results, certs = store.search_ivf(q, K)
    n_cert, recall = _check_vs_oracle(results, certs, rows, q, K)
    # Clustered data with a generous per-shard budget: the overwhelming
    # majority certifies, and recall stays near-exact.
    assert n_cert >= len(q) * 0.7, (n_cert, len(q))
    assert recall >= 0.98, recall


def test_sharded_ivf_self_match_and_min_score(mesh):
    rng = np.random.default_rng(4)
    rows, _ = _clustered(rng, 8192, DIM, 32)
    store = ShardedVectorStore(mesh, DIM, dtype="bfloat16", search_mode="ivf")
    store.append(rows)
    store.build_ivf(rows_per_cluster=256, outlier_frac=0.05)
    q = rows[:16]
    # search() routes through the IVF program in search_mode="ivf".
    results = store.search(q, 5)
    for qi, got in enumerate(results):
        assert got and got[0][0] == qi, (qi, got[:2])
        assert got[0][1] > 0.99
    # min_score filters on device (post-merge).
    filtered = store.search(q, 5, min_score=0.999)
    for got in filtered:
        assert all(v >= 0.999 for _, v in got)


def test_sharded_ivf_appended_suffix_exact(mesh):
    # Rows appended after the snapshot ride an exact interval scan and must
    # surface immediately — certificates stay sound (suffix is exact).
    rng = np.random.default_rng(5)
    rows, _ = _clustered(rng, 8192, DIM, 32)
    store = ShardedVectorStore(mesh, DIM, dtype="float32")
    store.append(rows)
    store.build_ivf(rows_per_cluster=256, outlier_frac=0.05)

    fresh = rng.standard_normal((64, DIM)).astype(np.float32)
    fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
    store.append(fresh)
    results, certs = store.search_ivf(fresh[:8], K)
    for qi, got in enumerate(results):
        assert got[0][0] == 8192 + qi, (qi, got[:2])  # exact self-match
    all_rows = np.concatenate([rows, fresh])
    _check_vs_oracle(results, certs, all_rows, fresh[:8], K)


def test_sharded_ivf_empty_tail_shards(mesh):
    # Fewer live rows than shards' capacity: trailing shards hold nothing;
    # their dead indexes must neither contribute hits nor veto certs.
    rng = np.random.default_rng(6)
    rows, _ = _clustered(rng, 1024, DIM, 8)
    store = ShardedVectorStore(mesh, DIM, dtype="float32")
    store.append(rows)
    # Force capacity far beyond the live rows so tail shards are empty.
    store.reserve(16384)
    assert store.count == 0 or True
    store.build_ivf(rows_per_cluster=128, outlier_frac=0.05)
    q = rows[:8]
    results, certs = store.search_ivf(q, 5)
    for qi, got in enumerate(results):
        assert got and got[0][0] == qi
        assert all(g < 1024 for g, _ in got)
    n_cert, recall = _check_vs_oracle(results, certs, rows, q, 5)
    assert recall >= 0.95, recall


def test_corpus_ivf_global_search(mesh):
    # CorpusVectorStore in search_mode="ivf": global searches ride the
    # per-shard IVF snapshot; conversation-scoped searches stay exact.
    from typeagent_tpu.parallel.corpus import CorpusVectorStore

    rng = np.random.default_rng(8)
    rows_a, _ = _clustered(rng, 4096, DIM, 8)
    rows_b, _ = _clustered(rng, 4096, DIM, 8)
    corpus = CorpusVectorStore(DIM, mesh=mesh, search_mode="ivf")
    corpus.append("podcast", rows_a)
    corpus.append("mailbox", rows_b)
    corpus.build_ivf(rows_per_cluster=128, outlier_frac=0.05)

    hits = corpus.search(rows_b[:8], k=5)
    for qi, got in enumerate(hits):
        assert got[0].conversation == "mailbox"
        assert got[0].local_ordinal == qi and got[0].global_ordinal == 4096 + qi
    scoped = corpus.search(rows_b[:4], k=5, conversations=["podcast"])
    for got in scoped:
        assert got and all(h.conversation == "podcast" for h in got)


def test_sharded_ivf_guards(mesh):
    store = ShardedVectorStore(mesh, DIM, dtype="float32")
    store.build_ivf()  # empty store: no-op (single-chip semantics)
    assert store._ivf is None
    assert store.search_ivf(np.zeros((2, DIM), np.float32), 3) == (
        [[], []],
        [True, True],
    )
    rng = np.random.default_rng(7)
    rows, _ = _clustered(rng, 1024, DIM, 8)
    store.append(rows)
    with pytest.raises(RuntimeError, match="before build_ivf"):
        store.search_ivf(rows[:2], 3)
    q_store = ShardedVectorStore(mesh, DIM, dtype="int8")
    q_store.append(rows)
    with pytest.raises(ValueError, match="float32/bfloat16"):
        q_store.build_ivf()
