"""Two-phase exact search (bucket-select + rescore, ops/topk.py exact2).

Pins: exact2 == the one-phase exact oracle on random data, on adversarial
same-bucket clusters, across watermarks and store dtypes; certificates hold;
the VectorStore "exact2" search mode routes through it and falls back to the
one-phase kernel when a certificate fails.

(Reference semantics being preserved: ``aitools/vectorbase.py:163-201`` —
score map, threshold, descending top-k.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from typeagent_tpu.ops import topk


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _normed(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


def _pad(m, n_pad, d_pad):
    out = np.zeros((n_pad, d_pad), np.float32)
    out[: m.shape[0], : m.shape[1]] = m
    return out


def _assert_topk_equivalent(vals_a, idx_a, vals_b, idx_b, tol=1e-5):
    """Top-k sets must agree up to score ties within ``tol`` (different
    engines sum in different orders; near-equal neighbors may swap on TPU
    where exact1 runs on the MXU and the rescore on the VPU)."""
    np.testing.assert_allclose(vals_a, vals_b, atol=tol)
    for ra, rb, va in zip(idx_a, idx_b, vals_a):
        only_a = set(ra.tolist()) - set(rb.tolist())
        if not only_a:
            continue
        kth = va[va > -0.5].min() if (va > -0.5).any() else -1.0
        # any disagreement must sit at the tie boundary
        for pos, i in enumerate(ra):
            if int(i) in only_a:
                assert abs(float(va[pos]) - float(kth)) <= tol, (i, va[pos], kth)


def _run_both(emb, queries, count, k, slack=2):
    vals_e, idx_e = topk.cosine_topk(emb, queries, count, k)
    vals_2, idx_2, cert = topk.cosine_topk_exact2(
        emb, queries, count, k, slack=slack
    )
    return (
        np.asarray(vals_e),
        np.asarray(idx_e),
        np.asarray(vals_2),
        np.asarray(idx_2),
        np.asarray(cert),
    )


@pytest.mark.parametrize("n,count", [(2048, 2048), (4096, 3000), (1024, 130)])
@pytest.mark.parametrize("k", [1, 10])
def test_exact2_matches_oracle_random(rng, n, count, k):
    d = 64
    m = _normed(rng, count, d)
    emb = jnp.asarray(_pad(m, n, 128))
    q = jnp.asarray(_pad(_normed(rng, 16, d), 16, 128))
    vals_e, idx_e, vals_2, idx_2, cert = _run_both(emb, q, count, k)
    assert cert.all()
    np.testing.assert_allclose(vals_2, vals_e, atol=1e-6)
    # Index sets must match row-wise (order can differ only under exact
    # score ties, which random data does not produce).
    assert (idx_2 == idx_e).all()


def test_exact2_adversarial_same_bucket_cluster(rng):
    """All true top-k rows packed into ONE 128-row bucket (the case a
    maxima-only bucket search would miss k-1 of)."""
    d = 64
    count, k = 2048, 10
    m = _normed(rng, count, d)
    target = _normed(rng, 1, d)[0]
    # Rows 256..287 (inside bucket 2) become near-copies of the query.
    for j in range(32):
        v = target + 0.01 * rng.standard_normal(d).astype(np.float32)
        m[256 + j] = v / np.linalg.norm(v)
    emb = jnp.asarray(_pad(m, 2048, 128))
    q = jnp.asarray(_pad(target.reshape(1, -1), 8, 128))
    vals_e, idx_e, vals_2, idx_2, cert = _run_both(emb, q, count, k)
    assert cert.all()
    assert set(idx_2[0].tolist()) == set(idx_e[0].tolist())
    assert all(256 <= i < 288 for i in idx_2[0])


def test_exact2_tied_scores_across_buckets(rng):
    """More exactly-tied rows than k, spread over many buckets: the returned
    set is some k of the tied rows with identical scores in both engines."""
    d = 64
    count, k = 2048, 10
    m = _normed(rng, count, d)
    target = _normed(rng, 1, d)[0]
    dupes = list(range(0, 2048, 128))  # one per bucket, 16 ties
    for i in dupes:
        m[i] = target
    emb = jnp.asarray(_pad(m, 2048, 128))
    q = jnp.asarray(_pad(target.reshape(1, -1), 8, 128))
    vals_e, idx_e, vals_2, idx_2, cert = _run_both(emb, q, count, k, slack=8)
    assert cert.all()
    np.testing.assert_allclose(vals_2, vals_e, atol=1e-6)
    assert set(idx_2[0].tolist()) <= set(dupes)


def test_exact2_small_store_fewer_buckets_than_B(rng):
    d = 32
    count, k = 100, 10  # single bucketful
    m = _normed(rng, count, d)
    emb = jnp.asarray(_pad(m, 1024, 128))
    q = jnp.asarray(_pad(_normed(rng, 4, d), 8, 128))
    vals_e, idx_e, vals_2, idx_2, cert = _run_both(emb, q, count, k)
    assert cert.all()
    _assert_topk_equivalent(vals_2, idx_2, vals_e, idx_e)


def test_exact2_bf16_matches_bf16_oracle(rng):
    d = 64
    count, k = 4096, 10
    m = _normed(rng, count, d)
    emb = jnp.asarray(_pad(m, 4096, 128)).astype(jnp.bfloat16)
    q = jnp.asarray(_pad(_normed(rng, 8, d), 8, 128))
    vals_e, idx_e, vals_2, idx_2, cert = _run_both(emb, q, count, k)
    assert cert.all()
    _assert_topk_equivalent(vals_2, idx_2, vals_e, idx_e, tol=1e-2)


def test_exact2_hybrid_matches_f32_oracle(rng):
    d = 64
    count, k = 4096, 10
    m = _normed(rng, count, d)
    emb = jnp.asarray(_pad(m, 4096, 128))
    shadow = emb.astype(jnp.bfloat16)
    q = jnp.asarray(_pad(_normed(rng, 8, d), 8, 128))
    vals_e, idx_e = topk.cosine_topk(emb, q, count, k)
    vals_h, idx_h, cert = topk.cosine_topk_exact2_hybrid(emb, shadow, q, count, k)
    assert np.asarray(cert).all()
    assert (np.asarray(idx_h) == np.asarray(idx_e)).all()
    np.testing.assert_allclose(np.asarray(vals_h), np.asarray(vals_e), atol=1e-6)


def test_exact2_hybrid_adversarial_cluster(rng):
    d = 64
    count, k = 4096, 10
    m = _normed(rng, count, d)
    target = _normed(rng, 1, d)[0]
    for j in range(24):
        v = target + 0.01 * rng.standard_normal(d).astype(np.float32)
        m[512 + j] = v / np.linalg.norm(v)
    emb = jnp.asarray(_pad(m, 4096, 128))
    q = jnp.asarray(_pad(target.reshape(1, -1), 8, 128))
    vals_e, idx_e = topk.cosine_topk(emb, q, count, k)
    vals_h, idx_h, cert = topk.cosine_topk_exact2_hybrid(
        emb, emb.astype(jnp.bfloat16), q, count, k
    )
    assert np.asarray(cert).all()
    assert set(np.asarray(idx_h)[0].tolist()) == set(np.asarray(idx_e)[0].tolist())


def test_vectorstore_f32_exact2_uses_hybrid_and_matches(rng):
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    d = 48
    m = _normed(rng, 3000, d)
    q = _normed(rng, 5, d)
    res = {}
    for mode in ("exact1", "exact2"):
        s = VectorStore(
            TextEmbeddingIndexSettings(
                embedding_model=create_test_embedding_model(d),
                min_score=0.0,
                search_mode=mode,
                dtype="float32",
            )
        )
        s.add_embeddings(None, m)
        res[mode] = s.fuzzy_lookup_embeddings_batch(q, max_hits=10)
        if mode == "exact2":
            assert s._shadow_cache is not None  # hybrid shadow was built
            # appending must invalidate the shadow cache key
            old_key = s._shadow_cache[0]
            s.add_embeddings(None, _normed(rng, 10, d))
            s.fuzzy_lookup_embeddings_batch(q, max_hits=3)
            assert s._shadow_cache[0] != old_key
    for r1, r2 in zip(res["exact1"], res["exact2"]):
        assert [x.item for x in r1] == [x.item for x in r2]
        np.testing.assert_allclose(
            [x.score for x in r1], [x.score for x in r2], atol=1e-6
        )


def test_vectorstore_exact2_mode_matches_exact(rng):
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    d = 48
    m = _normed(rng, 3000, d)
    queries = _normed(rng, 7, d)
    stores = {}
    for mode in ("exact1", "exact2"):
        s = VectorStore(
            TextEmbeddingIndexSettings(
                embedding_model=create_test_embedding_model(d),
                min_score=0.0,
                search_mode=mode,
            )
        )
        s.add_embeddings(None, m)
        stores[mode] = s.fuzzy_lookup_embeddings_batch(queries, max_hits=10)
    for r1, r2 in zip(stores["exact1"], stores["exact2"]):
        assert [s.item for s in r1] == [s.item for s in r2]
        np.testing.assert_allclose(
            [s.score for s in r1], [s.score for s in r2], atol=1e-6
        )


def test_vectorstore_exact2_cert_fallback(rng, monkeypatch):
    """A failed certificate must transparently re-run the one-phase kernel."""
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu import vectorstore as vs_mod
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    d = 48
    m = _normed(rng, 2000, d)
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(d),
            min_score=0.0,
            search_mode="exact2",
            dtype="bfloat16",  # pin the non-hybrid exact2 route
        )
    )
    store.add_embeddings(None, m)
    q = _normed(rng, 3, d)
    expected = store.fuzzy_lookup_embeddings_batch(q, max_hits=5)

    real = topk.cosine_topk_exact2
    calls = {"n": 0}

    def broken_cert(*args, **kwargs):
        calls["n"] += 1
        vals, idx, _ = real(*args, **kwargs)
        return jnp.zeros_like(vals), jnp.full_like(idx, -1), jnp.zeros((vals.shape[0],), bool)

    monkeypatch.setattr(vs_mod.topk, "cosine_topk_exact2", broken_cert)
    got = store.fuzzy_lookup_embeddings_batch(q, max_hits=5)
    assert calls["n"] == 1
    for r1, r2 in zip(expected, got):
        assert [s.item for s in r1] == [s.item for s in r2]


def test_exact2_auto_routing_threshold():
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu import vectorstore as vs_mod
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(8), min_score=0.0
        )
    )
    store._count = vs_mod.EXACT2_MIN_ROWS - 1
    assert not store._use_exact2(10)
    store._count = vs_mod.EXACT2_MIN_ROWS
    assert store._use_exact2(10)
    assert not store._use_exact2(50)  # beyond the fused-kernel k ceiling
    store.settings.search_mode = "exact1"
    assert not store._use_exact2(10)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_load_device_rows_matches_host_ingest(rng, dtype):
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    d = 48
    m = _normed(rng, 500, d)
    extra = _normed(rng, 300, d)
    q = _normed(rng, 4, d)

    def settings():
        return TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(d),
            min_score=0.0,
            dtype=dtype,
        )

    host = VectorStore(settings())
    host.add_embeddings(None, m)
    host.add_embeddings(None, extra)

    dev = VectorStore(settings())
    dev.load_device_rows(jnp.asarray(m))
    assert len(dev) == 500
    dev.load_device_rows(jnp.asarray(extra))  # growth path
    assert len(dev) == 800

    r_host = host.fuzzy_lookup_embeddings_batch(q, max_hits=10)
    r_dev = dev.fuzzy_lookup_embeddings_batch(q, max_hits=10)
    for a, b in zip(r_host, r_dev):
        assert [s.item for s in a] == [s.item for s in b]
        np.testing.assert_allclose(
            [s.score for s in a], [s.score for s in b], atol=1e-5
        )


def test_load_device_rows_size_mismatch():
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(8), min_score=0.0
        )
    )
    store.load_device_rows(jnp.ones((2, 8)) / np.sqrt(8.0))
    with pytest.raises(ValueError, match="size mismatch"):
        store.load_device_rows(jnp.ones((2, 16)) / 4.0)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_lookup_many_matches_per_batch(rng, dtype):
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    d = 48
    m = _normed(rng, 800, d)
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(d),
            min_score=0.0,
            dtype=dtype,
        )
    )
    store.add_embeddings(None, m)
    batches = np.stack([_normed(rng, 6, d) for _ in range(4)])  # [4, 6, d]
    many = store.fuzzy_lookup_embeddings_many(batches, max_hits=5, min_score=0.3)
    assert len(many) == 4 and all(len(rows) == 6 for rows in many)
    for i in range(4):
        single = store.fuzzy_lookup_embeddings_batch(
            batches[i], max_hits=5, min_score=0.3
        )
        for a, b in zip(many[i], single):
            assert [s.item for s in a] == [s.item for s in b]
            np.testing.assert_allclose(
                [s.score for s in a], [s.score for s in b], atol=1e-5
            )


def test_lookup_many_empty_and_shape_checks(rng):
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    d = 16
    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(d), min_score=0.0
        )
    )
    assert store.fuzzy_lookup_embeddings_many(np.zeros((2, 3, d))) == [
        [[], [], []],
        [[], [], []],
    ]
    store.add_embeddings(None, _normed(rng, 10, d))
    with pytest.raises(ValueError, match=r"\[R, b, d\]"):
        store.fuzzy_lookup_embeddings_many(np.zeros((3, d)))


def test_exact2_program_traceable_in_scan(rng):
    """topk_program_exact2 must be usable inside jit/lax.map bodies."""
    import jax

    d = 64
    count, k = 2048, 5
    m = _normed(rng, count, d)
    emb = jnp.asarray(_pad(m, 2048, 128))
    qs = jnp.asarray(
        np.stack([_pad(_normed(rng, 8, d), 8, 128) for _ in range(3)])
    )
    count_arr = jnp.asarray(count, dtype=jnp.int32)

    @jax.jit
    def scan(emb, qs):
        return jax.lax.map(
            lambda q: topk.topk_program_exact2(emb, q, count_arr, k), qs
        )

    vals, idx, cert = scan(emb, qs)
    assert np.asarray(cert).all()
    vals_e, idx_e = topk.cosine_topk(emb, qs[1], count, k)
    assert (np.asarray(idx[1]) == np.asarray(idx_e)).all()


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_topk_program_intervals_matches_masked_oracle(rng, dtype):
    """Interval-scoped exact top-k == mask-then-top-k oracle (XLA route on
    CPU; the Pallas route shares semantics and is covered by the corpus
    tests on TPU)."""
    import jax

    d, count, k = 64, 3000, 7
    m = _normed(rng, count, d)
    emb = jnp.asarray(_pad(m, 3072, 128))
    if dtype == "bfloat16":
        emb = emb.astype(jnp.bfloat16)
    q = jnp.asarray(_pad(_normed(rng, 6, d), 8, 128))
    intervals = jnp.asarray([[100, 400], [1500, 1600], [0, 0]], dtype=jnp.int32)
    vals, idx = topk.topk_program_intervals(
        emb, q, jnp.asarray(count, jnp.int32), intervals, k
    )
    idx = np.asarray(idx)
    vals = np.asarray(vals)
    in_scope = np.zeros(count, bool)
    in_scope[100:400] = True
    in_scope[1500:1600] = True
    scores = np.clip(
        (np.asarray(q) @ np.asarray(emb.astype(jnp.float32)).T + 1) / 2, 0, 1
    )
    for r in range(6):
        row = scores[r, :count].copy()
        row[~in_scope] = -1
        best = set(np.argsort(-row, kind="stable")[:k].tolist())
        got = set(int(i) for i in idx[r] if i >= 0)
        assert got == best, r
        assert all(in_scope[i] for i in got)


def test_topk_program_intervals_empty_table(rng):
    d, count = 32, 500
    emb = jnp.asarray(_pad(_normed(rng, count, d), 1024, 128))
    q = jnp.asarray(_pad(_normed(rng, 2, d), 8, 128))
    intervals = jnp.zeros((4, 2), dtype=jnp.int32)  # all-empty spans
    vals, idx = topk.topk_program_intervals(
        emb, q, jnp.asarray(count, jnp.int32), intervals, 5
    )
    assert (np.asarray(idx) == -1).all() or (np.asarray(vals) < 0).all()


def test_sharded_append_device_matches_host_append(rng):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from typeagent_tpu.parallel import ShardedVectorStore, create_mesh

    mesh = create_mesh(n_shard=4, n_dp=2)
    dim = 48
    m = _normed(rng, 600, dim)
    host_store = ShardedVectorStore(mesh, dim)
    host_store.append(m)
    dev_store = ShardedVectorStore(mesh, dim)
    dev_store.append_device(jnp.asarray(m[:400]))
    dev_store.append_device(jnp.asarray(m[400:]))  # growth path
    assert len(dev_store) == 600
    q = m[37:39]
    a = host_store.search(q, k=5)
    b = dev_store.search(q, k=5)
    assert [[i for i, _ in row] for row in a] == [[i for i, _ in row] for row in b]


def test_corpus_append_device_scoped(rng):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from typeagent_tpu.parallel import create_mesh
    from typeagent_tpu.parallel.corpus import CorpusVectorStore

    mesh = create_mesh(n_shard=4, n_dp=2)
    dim = 32
    corpus = CorpusVectorStore(dim, mesh=mesh)
    a = _normed(rng, 300, dim)
    b = _normed(rng, 200, dim)
    corpus.append_device("left", jnp.asarray(a * 3.0))  # device normalization
    corpus.append_device("right", jnp.asarray(b))
    hits = corpus.search(a[42:43], k=3, conversations=["left"])[0]
    assert hits[0].conversation == "left" and hits[0].local_ordinal == 42
    assert hits[0].score == pytest.approx(1.0, abs=1e-4)


def test_exact2_hybrid_i8_matches_f32_oracle(rng):
    d = 64
    count, k = 4096, 10
    m = _normed(rng, count, d)
    emb = jnp.asarray(_pad(m, 4096, 128))
    q_rows, scales = topk.quantize_rows(np.asarray(emb))
    q = jnp.asarray(_pad(_normed(rng, 8, d), 8, 128))
    vals_e, idx_e = topk.cosine_topk(emb, q, count, k)
    vals_h, idx_h, cert = topk.cosine_topk_exact2_hybrid_i8(
        emb, jnp.asarray(q_rows), jnp.asarray(scales), q, count, k
    )
    assert np.asarray(cert).all()
    assert (np.asarray(idx_h) == np.asarray(idx_e)).all()
    np.testing.assert_allclose(np.asarray(vals_h), np.asarray(vals_e), atol=1e-6)


def test_dispatch_collect_exact2_route(rng, monkeypatch):
    """dispatch_lookup must stay async under exact2 (cert checked at
    collect time), and results must match the synchronous batch path —
    including the cert-miss fallback."""
    from typeagent_tpu import vectorstore as vs_mod
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    d = 48
    m = _normed(rng, 3000, d)
    q = _normed(rng, 5, d)
    for dtype in ("float32", "bfloat16"):
        store = VectorStore(
            TextEmbeddingIndexSettings(
                embedding_model=create_test_embedding_model(d),
                min_score=0.0,
                dtype=dtype,
            )
        )
        store.add_embeddings(None, m)
        store._flush()  # _use_exact2 reads the committed row count
        monkeypatch.setattr(vs_mod, "EXACT2_MIN_ROWS", 100)  # force exact2
        assert store._use_exact2(10)
        handle = store.dispatch_lookup(q, max_hits=8)
        assert len(handle) == 7  # cert deferred to collect
        got = store.collect_lookup(handle, min_score=0.2)
        expected = store.fuzzy_lookup_embeddings_batch(q, max_hits=8, min_score=0.2)
        for a, b in zip(got, expected):
            assert [s.item for s in a] == [s.item for s in b]

        # Cert-miss at collect: transparent one-phase redo.
        vals, idx, b_, cert, qp, k, snap = store.dispatch_lookup(q, max_hits=8)
        bad = (vals, idx, b_, jnp.zeros_like(cert), qp, k, snap)
        redo = store.collect_lookup(bad, min_score=0.2)
        for a, b in zip(redo, expected):
            assert [s.item for s in a] == [s.item for s in b]
