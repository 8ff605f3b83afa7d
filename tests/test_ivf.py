"""IVF engine (ops/ivf.py): recall, certificate soundness, edge cases.

CPU (XLA fallback rescore path); the Pallas path is shape-identical and
exercised by tools/tpu_ivf_probe.py on the real chip.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from typeagent_tpu.ops.ivf import IVFState, ivf_build, ivf_topk

K = 10


def _mk_clustered(rng, n, d, nclust, sigma, bg_frac=0.0):
    centers = rng.standard_normal((nclust, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    emb = centers[rng.integers(0, nclust, n)] + sigma * rng.standard_normal(
        (n, d)
    ).astype(np.float32) / np.sqrt(d)
    if bg_frac:
        bg = rng.random(n) < bg_frac
        emb[bg] = rng.standard_normal((int(bg.sum()), d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb, centers


def _pad(emb, n_pad):
    buf = np.zeros((n_pad, emb.shape[1]), np.float32)
    buf[: len(emb)] = emb
    return jnp.asarray(buf)


def _oracle(q, emb, k=K):
    true = q @ emb.T
    return true, np.argsort(-true, axis=1)[:, :k]


def _check_invariants(idx, n, k=K):
    assert (idx >= 0).all() and (idx < n).all()
    for row in idx:
        assert len(set(row.tolist())) == k  # no duplicates, no padding


def test_ivf_recall_clustered_with_background():
    rng = np.random.default_rng(0)
    n = 4000
    emb, _ = _mk_clustered(rng, n, 64, 25, 0.25, bg_frac=0.08)
    state = ivf_build(_pad(emb, 4096), n, train_rows=2048, iters=6,
                      outlier_frac=0.12, rows_per_cluster=128)
    q = emb[rng.choice(n, 32, replace=False)] + 0.1 * rng.standard_normal(
        (32, 64)
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    true, oracle = _oracle(q, emb)
    vals, idx, cert = map(np.asarray, ivf_topk(state, q, K, B=8))
    _check_invariants(idx, n)
    rec = np.mean(
        [len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(idx, oracle)]
    )
    assert rec >= 0.97, rec
    # Scores are in the public (cos+1)/2 space and descending.
    assert (np.diff(vals, axis=1) <= 1e-6).all()
    expected_best = np.clip((true.max(axis=1) + 1) / 2, 0, 1)
    np.testing.assert_allclose(vals[:, 0], expected_best, atol=2e-3)


def test_ivf_certificate_sound_and_achievable():
    """Tight well-separated clusters: the certificate should mostly HOLD —
    and every certified result must equal the exact oracle."""
    rng = np.random.default_rng(1)
    n, d, nclust = 4000, 64, 24
    emb, centers = _mk_clustered(rng, n, d, nclust, 0.05)
    state = ivf_build(_pad(emb, 4096), n, train_rows=2048, iters=6,
                      outlier_frac=0.05, rows_per_cluster=128)
    q = centers[rng.integers(0, nclust, 24)] + 0.02 * rng.standard_normal(
        (24, d)
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    _true, oracle = _oracle(q, emb)
    vals, idx, cert = map(np.asarray, ivf_topk(state, q, K, B=8))
    _check_invariants(idx, n)
    assert cert.mean() >= 0.8, cert.mean()
    for i in np.nonzero(cert)[0]:
        assert set(idx[i].tolist()) == set(oracle[i].tolist())


def test_ivf_certificate_never_lies():
    """Across data regimes (incl. hostile isotropic), certified results
    must be exactly the oracle's top-k (up to eps ties)."""
    rng = np.random.default_rng(2)
    for sigma, bg in ((0.05, 0.0), (0.35, 0.1), (1.0, 1.0)):
        emb, _ = _mk_clustered(rng, 3000, 48, 20, sigma, bg_frac=bg)
        state = ivf_build(_pad(emb, 3072), 3000, train_rows=1536, iters=4,
                          rows_per_cluster=128)
        q = emb[rng.choice(3000, 16, replace=False)]
        true, oracle = _oracle(q, emb)
        vals, idx, cert = map(np.asarray, ivf_topk(state, q, K, B=6))
        kth_true = np.sort(true, axis=1)[:, -K]
        for i in np.nonzero(cert)[0]:
            got = set(idx[i].tolist())
            want = set(oracle[i].tolist())
            if got != want:
                # eps-tie latitude: every divergent pick must score within
                # eps of the true k-th.
                diff_scores = true[i, sorted(got - want)]
                assert (diff_scores >= kth_true[i] - 1e-4).all()


def test_ivf_small_store_scans_everything():
    """B >= n_buckets: selection degenerates to a full scan, results exact."""
    rng = np.random.default_rng(3)
    emb, _ = _mk_clustered(rng, 900, 32, 5, 0.3)
    state = ivf_build(_pad(emb, 1024), 900, train_rows=512, iters=3,
                      outlier_frac=0.0)
    q = emb[:8]
    _true, oracle = _oracle(q, emb)
    vals, idx, cert = map(np.asarray, ivf_topk(state, q, K, B=64))
    _check_invariants(idx, 900)
    for i in range(8):
        assert set(idx[i].tolist()) == set(oracle[i].tolist())
    assert cert.all()  # nothing excluded -> unconditionally certified
    assert idx[:, 0].tolist() == list(range(8))  # self-match


def test_ivf_no_outliers_mode():
    rng = np.random.default_rng(4)
    emb, _ = _mk_clustered(rng, 2000, 32, 12, 0.2)
    state = ivf_build(_pad(emb, 2048), 2000, train_rows=1024, iters=4,
                      outlier_frac=0.0, rows_per_cluster=128)
    assert int(state.count_out) == 0
    q = emb[:4]
    _true, oracle = _oracle(q, emb)
    _vals, idx, _cert = map(np.asarray, ivf_topk(state, q, K, B=8))
    rec = np.mean(
        [len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(idx, oracle)]
    )
    assert rec >= 0.9


def test_ivf_single_query_convenience():
    rng = np.random.default_rng(5)
    emb, _ = _mk_clustered(rng, 1500, 32, 10, 0.2)
    state = ivf_build(_pad(emb, 2048), 1500, train_rows=1024, iters=3)
    vals, idx, cert = ivf_topk(state, emb[7], K, B=8)
    assert vals.shape == (K,) and idx.shape == (K,)
    assert int(idx[0]) == 7


def test_ivf_build_validates_inputs():
    rng = np.random.default_rng(6)
    emb = rng.standard_normal((512, 32)).astype(np.float32)
    with pytest.raises(ValueError):
        ivf_build(jnp.asarray(emb[:100]), 100)  # padding not a 128-multiple
    with pytest.raises(ValueError):
        ivf_build(jnp.asarray(emb), 0)
    with pytest.raises(ValueError):
        ivf_build(jnp.asarray(emb), 1000)


def test_ivf_state_roundtrips_as_arrays():
    """IVFState is a flat NamedTuple of arrays — serializable by leaf."""
    rng = np.random.default_rng(7)
    emb, _ = _mk_clustered(rng, 1000, 32, 8, 0.2)
    state = ivf_build(_pad(emb, 1024), 1000, train_rows=512, iters=3)
    leaves = [np.asarray(x) for x in state]
    state2 = IVFState(*(jnp.asarray(x) for x in leaves))
    q = emb[:4]
    v1, i1, c1 = map(np.asarray, ivf_topk(state, q, K, B=8))
    v2, i2, c2 = map(np.asarray, ivf_topk(state2, q, K, B=8))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2)


async def _noop():  # keep pytest-asyncio collection happy for sync tests
    return None


def test_vectorstore_ivf_mode_with_appends():
    """search_mode='ivf': exact2 fallback before build_ivf(), snapshot
    search after, and rows appended post-snapshot are found via the exact
    interval-scan merge."""
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(21)
    d = 32
    centers = rng.standard_normal((12, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    emb = centers[rng.integers(0, 12, 3000)] + 0.2 * rng.standard_normal(
        (3000, d)
    ).astype(np.float32) / np.sqrt(d)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    q = emb[5]
    pre = store.fuzzy_lookup_embedding(q, max_hits=5)
    assert pre[0].item == 5  # exact2 fallback until a snapshot exists

    store.build_ivf(rows_per_cluster=128, train_rows=2048, iters=4)
    post = store.fuzzy_lookup_embedding(q, max_hits=5)
    assert post[0].item == 5
    assert {s.item for s in pre} == {s.item for s in post}

    new = emb[5] + 0.01 * rng.standard_normal(d).astype(np.float32)
    new /= np.linalg.norm(new)
    store.add_embeddings(None, new[None])
    appended = store.fuzzy_lookup_embedding(q, max_hits=3)
    assert 3000 in [s.item for s in appended]

    # Batch route agrees with the single route.
    hits = store.fuzzy_lookup_embeddings_batch(emb[:4], max_hits=3)
    assert [h[0].item for h in hits] == [0, 1, 2, 3]


def test_vectorstore_ivf_certified_rerun_is_exact():
    """ivf_certified=True: certificate misses rerun through the one-phase
    exact kernel, so results always equal the exact oracle."""
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(22)
    d = 32
    # Hostile data for IVF: isotropic — certs will miss, reruns must save it.
    emb = rng.standard_normal((2500, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    settings.ivf_certified = True
    settings.ivf_b = 4
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=1024, iters=3)
    q = emb[rng.choice(2500, 8, replace=False)]
    true = q @ emb.T
    oracle = np.argsort(-true, axis=1)[:, :5]
    hits = store.fuzzy_lookup_embeddings_batch(q, max_hits=5)
    for row, want in zip(hits, oracle):
        assert {s.item for s in row} == set(want.tolist())


def test_gather_rows_chunked_matches_single_shot():
    """The O(chunk)-extra-HBM reorder gather must be value-identical to the
    single-shot gather, including -1 padding and ragged final chunks."""
    import jax.numpy as jnp

    from typeagent_tpu.ops.ivf import _gather_rows, _gather_rows_chunked

    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.standard_normal((1024, 16)).astype(np.float32))
    perm = rng.permutation(1024).astype(np.int32)
    perm[::7] = -1  # dead padding rows
    perm_d = jnp.asarray(perm)
    want = np.asarray(_gather_rows(emb, perm_d))
    got = np.asarray(_gather_rows_chunked(emb, perm_d, chunk_rows=100))
    np.testing.assert_array_equal(got, want)


def test_reserve_exact_capacity_bulk_ingest():
    """reserve() pre-sizes to the 1024 quantum (no pow2 doubling waste) and
    chunked loads never reallocate; past the reservation, doubling resumes."""
    import jax.numpy as jnp

    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(3)
    store = VectorStore(
        TextEmbeddingIndexSettings(
            create_test_embedding_model(32), min_score=0.0, dtype="bfloat16"
        )
    )
    n = 5000
    store.reserve(n)
    rows = rng.standard_normal((n, 32)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    for s0 in range(0, n, 2048):
        store.load_device_rows(jnp.asarray(rows[s0 : s0 + 2048]))
    assert store._buf.shape[0] == 5120  # round_up(5000, 1024), not 8192
    hits = store.fuzzy_lookup_embeddings_batch(rows[:4], max_hits=1)
    assert [h[0].item for h in hits] == [0, 1, 2, 3]
    # Beyond the reservation the doubling policy resumes.
    store.load_device_rows(jnp.asarray(rows[:1024]))
    assert store._buf.shape[0] == 10240


def test_vectorstore_ivf_background_rebuild_and_pin():
    """build_ivf_background: queries serve the old snapshot during the
    build (appends copy instead of donating — the pinned buffer must stay
    alive), and the swap advances _ivf_count atomically."""
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(31)
    d = 32
    centers = rng.standard_normal((10, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def mk(n):
        e = centers[rng.integers(0, 10, n)] + 0.2 * rng.standard_normal(
            (n, d)
        ).astype(np.float32) / np.sqrt(d)
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    emb = mk(2500)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=1024, iters=3)
    assert store._ivf_count == 2500

    # Pin the buffer the way the rebuild thread does, append THROUGH the
    # pin, and verify the pinned handle is still readable (no donation).
    with store._pinned_view() as (buf, count):
        assert count == 2500
        extra = mk(600)
        store.add_embeddings(None, extra)
        q = emb[7]
        hit = store.fuzzy_lookup_embedding(q, max_hits=3)
        assert hit[0].item == 7  # query sees appended state mid-pin
        _ = np.asarray(buf[:4])  # pinned capture still alive
    assert store._buf_pins == 0

    t = store.build_ivf_background(rows_per_cluster=128, train_rows=1024, iters=3)
    assert t is not None
    t.join(timeout=120)
    assert not t.is_alive()
    assert store._ivf_count == 3100

    # Post-swap results match a fresh exact oracle over all 3100 rows.
    allemb = np.concatenate([emb, extra])
    q = allemb[2700]
    true = allemb @ q
    want = int(np.argmax(true))
    got = store.fuzzy_lookup_embedding(q, max_hits=1)
    assert got[0].item == want


def test_vectorstore_ivf_auto_rebuild_policy():
    """ivf_auto_rebuild: a query observing the appended fraction past
    ivf_rebuild_frac spawns ONE background rebuild; the snapshot advances
    without any manual build_ivf call."""
    import time

    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(33)
    d = 32
    centers = rng.standard_normal((8, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def mk(n):
        e = centers[rng.integers(0, 8, n)] + 0.2 * rng.standard_normal(
            (n, d)
        ).astype(np.float32) / np.sqrt(d)
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    emb = mk(2000)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    settings.ivf_auto_rebuild = True
    settings.ivf_rebuild_frac = 0.2
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=1024, iters=3)

    # Below threshold: no rebuild spawned.
    store.add_embeddings(None, mk(100))
    store.fuzzy_lookup_embedding(emb[0], max_hits=3)
    t = store._ivf_rebuild_thread
    assert t is None or not t.is_alive() and store._ivf_count == 2000

    # Past threshold (600 > 0.2 * 2000): the next query spawns the rebuild.
    store.add_embeddings(None, mk(500))
    store.fuzzy_lookup_embedding(emb[0], max_hits=3)
    t = store._ivf_rebuild_thread
    assert t is not None
    t.join(timeout=120)
    deadline = time.time() + 5
    while store._ivf_count != 2600 and time.time() < deadline:
        time.sleep(0.01)
    assert store._ivf_count == 2600
    # Results stay exact-equal to the oracle at this scale.
    got = store.fuzzy_lookup_embedding(emb[123], max_hits=1)
    assert got[0].item == 123


def test_ivf_topk_program_runs_jitted_not_eager():
    """ivf_topk_program must dispatch ONE compiled program per call.

    Regression: it called the raw impl, so every standalone caller
    (VectorStore's ivf route) executed the whole program op-by-op — ~1.7 s
    per batch through a remote-attached device vs ~30 ms jitted. The jit
    cache growing after a fresh-shape call proves the compiled path.
    """
    import jax.numpy as jnp

    from typeagent_tpu.ops.ivf import _ivf_topk_jit, ivf_build, ivf_topk_program

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((1536, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    state = ivf_build(
        jnp.asarray(emb), 1536, rows_per_cluster=128, train_rows=512, iters=2
    )
    q = jnp.asarray(emb[:3])
    before = _ivf_topk_jit._cache_size()
    vals, idx, cert = ivf_topk_program(*state, q, 5, B=4, use_pallas=False)
    assert _ivf_topk_jit._cache_size() == before + 1
    ivf_topk_program(*state, q, 5, B=4, use_pallas=False)
    assert _ivf_topk_jit._cache_size() == before + 1  # cached, no retrace
    assert np.asarray(vals).shape == (3, 5)


def test_vectorstore_ivf_append_route_is_one_fused_dispatch():
    """The appended-suffix route goes through _ivf_suffix_merged (one jitted
    program: snapshot + interval scan + merge), not eager per-op merging."""
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import (
        TextEmbeddingIndexSettings,
        VectorStore,
        _ivf_suffix_merged,
    )

    rng = np.random.default_rng(6)
    emb = rng.standard_normal((1536, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(32), min_score=0.0, search_mode="ivf"
    )
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=512, iters=2)
    extra = rng.standard_normal((200, 32)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    store.add_embeddings(None, extra)

    before = _ivf_suffix_merged._cache_size()
    got = store.fuzzy_lookup_embeddings_batch(np.asarray(emb[:4]), max_hits=3)
    assert _ivf_suffix_merged._cache_size() == before + 1
    # Appended rows are found through the fused merge, exactly.
    hit = store.fuzzy_lookup_embedding(extra[10], max_hits=1)
    assert hit[0].item == 1536 + 10
    assert len(got) == 4 and all(len(r) == 3 for r in got)


def _spy(store, name, log):
    """Wrap a store method, recording the padded query-row count per call."""
    orig = getattr(store, name)

    def wrapper(q, *args, **kwargs):
        log.append(int(q.shape[0]))
        return orig(q, *args, **kwargs)

    setattr(store, name, wrapper)


def _force_misses(store, n: int):
    """Wrap ``_resolve_cert_misses`` so the first ``n`` real rows of every
    certified dispatch read as certificate MISSES (small fixtures certify
    everything naturally — B covers most buckets — so miss-path tests force
    the corpus property they exercise). The resolver then runs for real:
    forced rows come back from the escalation/exact rescan, so results stay
    oracle-exact."""
    orig = store._resolve_cert_misses

    def forcing(vals, idx, cert_h, q, k, count, b):
        cert_h = np.array(cert_h)
        cert_h[: min(n, b)] = False
        return orig(vals, idx, cert_h, q, k, count, b)

    store._resolve_cert_misses = forcing


def test_ivf_certified_padded_batch_never_full_reruns():
    """Zero-padded query rows can never certify under the IVF bound; the
    miss check must slice to the REAL batch. On well-clustered data with
    an odd batch size (13 -> padded to 16), certified mode must answer
    straight from the IVF pass — no escalation, no exact rerun."""
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(7)
    d, nclust = 64, 24
    emb, centers = _mk_clustered(rng, 4000, d, nclust, 0.05)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    settings.ivf_certified = True
    settings.ivf_b = 8
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=2048, iters=6,
                    outlier_frac=0.05)
    exact_calls, esc_calls = [], []
    _spy(store, "_rerun_exact1", exact_calls)
    _spy(store, "_rerun_ivf", esc_calls)

    q = centers[rng.integers(0, nclust, 13)] + 0.02 * rng.standard_normal(
        (13, d)
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    hits = store.fuzzy_lookup_embeddings_batch(q, max_hits=5)
    true = q @ emb.T
    oracle = np.argsort(-true, axis=1)[:, :5]
    for row, want in zip(hits, oracle):
        assert {s.item for s in row} == set(want.tolist())
    assert exact_calls == [], exact_calls
    assert esc_calls == [], esc_calls


def test_ivf_certified_escalates_only_the_missed_queries(monkeypatch):
    """Mixed batch (clustered queries certify; isotropic queries miss):
    cert misses escalate per query — the rerun batches must cover only
    the missed subset, never the whole batch — and every row of the
    final result must equal the exact oracle."""
    from typeagent_tpu import vectorstore as vs_mod
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    # Escalation only pays past ~2M rows (below that the subset rescan is
    # one hop cheaper); shrink the gate so this small fixture exercises it.
    monkeypatch.setattr(vs_mod, "_ESCALATE_MIN_ROWS", 0)

    rng = np.random.default_rng(8)
    d, nclust = 64, 16
    emb, _centers = _mk_clustered(rng, 4000, d, nclust, 0.02)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    settings.ivf_certified = True
    settings.ivf_b = 8
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=2048, iters=6,
                    outlier_frac=0.05)
    exact_calls, esc_calls = [], []
    _spy(store, "_rerun_exact1", exact_calls)
    _spy(store, "_rerun_ivf", esc_calls)

    # 24 in-store queries (mostly certify at B=8) + 8 isotropic (miss,
    # escalate to B=32; the stubborn ones land in the exact1 subset).
    qc = emb[rng.choice(4000, 24, replace=False)]
    qi = rng.standard_normal((8, d)).astype(np.float32)
    q = np.concatenate([qc, qi])
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    hits = store.fuzzy_lookup_embeddings_batch(q, max_hits=5)
    true = q @ emb.T
    oracle_scores = np.sort(true, axis=1)[:, ::-1][:, :5]
    for row, want in zip(hits, oracle_scores):
        got = np.array([s.score for s in row])
        np.testing.assert_allclose(got, np.clip((want + 1) / 2, 0, 1),
                                   atol=1e-5)
    # Escalation/rerun batches are padded to the MISS bucket, which must
    # be strictly smaller than the full 32-query batch.
    for calls in (exact_calls, esc_calls):
        for padded in calls:
            assert padded < 32, (exact_calls, esc_calls)
    assert esc_calls, "expected at least one escalated IVF rerun"


def test_ivf_certified_async_collect_resolves_per_query():
    """dispatch_lookup/collect_lookup (the async serving route) resolves
    certificate misses per query too, with oracle-exact results."""
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(9)
    d = 48
    emb, centers = _mk_clustered(rng, 3000, d, 20, 0.05)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    settings.ivf_certified = True
    settings.ivf_b = 4
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=1024, iters=4)
    exact_calls = []
    _spy(store, "_rerun_exact1", exact_calls)

    qi = rng.standard_normal((3, d)).astype(np.float32)
    q = np.concatenate([emb[rng.choice(3000, 10, replace=False)], qi])
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    handle = store.dispatch_lookup(q, max_hits=5)
    hits = store.collect_lookup(handle)
    true = q @ emb.T
    oracle = np.argsort(-true, axis=1)[:, :5]
    for row, want in zip(hits, oracle):
        assert {s.item for s in row} == set(want.tolist())
    # 13 queries pad to 16; the rerun must cover only the missed subset.
    for padded in exact_calls:
        assert padded < 16, exact_calls


def test_ivf_rides_the_coalesced_many_route(monkeypatch):
    """fuzzy_lookup_embeddings_many (the LookupBatcher's dispatch) must use
    the IVF engine for IVF stores — not fall back to a full scan — in both
    plain and certified modes, with oracle-exact certified results."""
    from typeagent_tpu import vectorstore as vs_mod
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.ops import topk as topk_mod
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(12)
    d = 64
    emb, _ = _mk_clustered(rng, 4000, d, 16, 0.02)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    settings.ivf_b = 8
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=2048, iters=6,
                    outlier_frac=0.05)

    def boom(*a, **k):
        raise AssertionError("topk_many full-scan used for an IVF store")

    monkeypatch.setattr(topk_mod, "topk_many", boom)

    qs = emb[rng.choice(4000, 3 * 7, replace=False)].reshape(3, 7, d)
    got = store.fuzzy_lookup_embeddings_many(qs, max_hits=5)
    assert len(got) == 3 and all(len(r) == 7 for r in got)
    # Plain mode: high-recall IVF results (self-queries must find self).
    for r, qrow in zip(got, qs):
        for hits, qv in zip(r, qrow):
            assert hits[0].score > 0.999

    # Certified mode: every row must equal the exact oracle.
    settings.ivf_certified = True
    got = store.fuzzy_lookup_embeddings_many(qs, max_hits=5)
    true = qs.reshape(-1, d) @ emb.T
    oracle = np.argsort(-true, axis=1)[:, :5].reshape(3, 7, 5)
    for i in range(3):
        for j in range(7):
            assert {s.item for s in got[i][j]} == set(oracle[i, j].tolist())

    # Appended rows surface through the fused suffix merge on this route.
    settings.ivf_certified = False
    new = emb[100] + 0.001 * rng.standard_normal(d).astype(np.float32)
    new /= np.linalg.norm(new)
    store.add_embeddings(None, new[None])
    got = store.fuzzy_lookup_embeddings_many(emb[100][None, None, :], max_hits=3)
    assert 4000 in [s.item for s in got[0][0]]


def test_ivf_escalation_ema_learns_to_skip_unyielding_escalation(monkeypatch):
    """Adaptive escalation (vectorstore._esc_ema): when the bigger-B pass
    resolves (almost) none of the misses — cert rate saturates in B, a
    corpus property — the store learns to skip it, so steady-state misses
    pay only the exact subset rescan. Results stay oracle-exact both with
    and without the pass."""
    from typeagent_tpu import vectorstore as vs_mod
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    monkeypatch.setattr(vs_mod, "_ESCALATE_MIN_ROWS", 0)

    rng = np.random.default_rng(21)
    d = 64
    emb, _ = _mk_clustered(rng, 4000, d, 16, 0.02)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    settings.ivf_certified = True
    settings.ivf_b = 8
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=2048, iters=6,
                    outlier_frac=0.05)
    _force_misses(store, 4)

    # Force zero escalation yield: the pass runs but certifies nothing
    # (as at 10M/B=12->24, where only 12% of misses resolved).
    esc_calls = []
    orig_rerun = store._rerun_ivf

    def unyielding(q, k, count, B):
        esc_calls.append(int(q.shape[0]))
        out = orig_rerun(q, k, count, B)
        if out is None:
            return None
        v, i, c = out
        return v, i, np.zeros_like(c)

    store._rerun_ivf = unyielding

    q = emb[rng.choice(4000, 16, replace=False)].copy()
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    def check(batch):
        hits = store.fuzzy_lookup_embeddings_batch(batch, max_hits=5)
        true = batch @ emb.T
        oracle = np.argsort(-true, axis=1)[:, :5]
        for row, want in zip(hits, oracle):
            assert {s.item for s in row} == set(want.tolist())

    check(q)  # first dispatch: escalation tried once (EMA is None)
    assert len(esc_calls) == 1
    assert store._esc_ema == 0.0
    check(q)  # steady state: the learned-skip gate holds
    assert len(esc_calls) == 1, "EMA should have disabled escalation"

    # A rebuild swaps in new buckets -> the yield is re-learned.
    store.build_ivf(rows_per_cluster=128, train_rows=2048, iters=6,
                    outlier_frac=0.05)
    assert store._esc_ema is None
    check(q)
    assert len(esc_calls) == 2, "new snapshot should retry escalation"


def test_ivf_escalation_ema_keeps_yielding_escalation(monkeypatch):
    """When escalation resolves the misses (small fixture: 4xB covers every
    bucket, so everything certifies), the EMA stays high and later batches
    keep escalating instead of paying the exact rescan."""
    from typeagent_tpu import vectorstore as vs_mod
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    monkeypatch.setattr(vs_mod, "_ESCALATE_MIN_ROWS", 0)

    rng = np.random.default_rng(22)
    d = 64
    emb, _ = _mk_clustered(rng, 4000, d, 16, 0.02)
    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(d), min_score=0.0, search_mode="ivf"
    )
    settings.ivf_certified = True
    settings.ivf_b = 8
    store = VectorStore(settings)
    store.add_embeddings(None, emb)
    store.build_ivf(rows_per_cluster=128, train_rows=2048, iters=6,
                    outlier_frac=0.05)
    _force_misses(store, 4)
    esc_calls, exact_calls = [], []
    _spy(store, "_rerun_ivf", esc_calls)
    _spy(store, "_rerun_exact1", exact_calls)

    q = emb[rng.choice(4000, 16, replace=False)].copy()
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    for _ in range(2):
        hits = store.fuzzy_lookup_embeddings_batch(q, max_hits=5)
        true = q @ emb.T
        oracle = np.argsort(-true, axis=1)[:, :5]
        for row, want in zip(hits, oracle):
            assert {s.item for s in row} == set(want.tolist())
    assert len(esc_calls) == 2, (esc_calls, exact_calls)
    assert store._esc_ema is not None and store._esc_ema >= 0.5
