"""Multi-conversation corpus store on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from typeagent_tpu.parallel import create_mesh
from typeagent_tpu.parallel.corpus import CorpusVectorStore


def normalized(rng, n, dim):
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(n_shard=4, n_dp=2)


def test_corpus_multi_conversation_search(mesh, rng):
    dim = 32
    corpus = CorpusVectorStore(dim, mesh=mesh)
    conv_a = normalized(rng, 300, dim)
    conv_b = normalized(rng, 200, dim)
    corpus.append("podcast-a", conv_a[:150])
    corpus.append("mailbox-b", conv_b)
    corpus.append("podcast-a", conv_a[150:])  # interleaved second segment
    assert len(corpus) == 500
    assert corpus.count_for("podcast-a") == 300
    assert corpus.count_for("mailbox-b") == 200
    assert set(corpus.conversations) == {"podcast-a", "mailbox-b"}

    # Global search finds the exact fragment with conversation attribution.
    hits = corpus.search(conv_a[200:201], k=3)[0]
    assert hits[0].conversation == "podcast-a"
    assert hits[0].local_ordinal == 200
    assert hits[0].score == pytest.approx(1.0, abs=1e-4)

    hits = corpus.search(conv_b[10:11], k=3)[0]
    assert hits[0].conversation == "mailbox-b"
    assert hits[0].local_ordinal == 10


def test_corpus_scoped_search(mesh, rng):
    dim = 16
    corpus = CorpusVectorStore(dim, mesh=mesh)
    shared = normalized(rng, 100, dim)
    corpus.append("a", shared)
    corpus.append("b", shared)  # identical rows in both conversations
    hits = corpus.search(shared[5:6], k=2, conversations=["b"])[0]
    assert all(h.conversation == "b" for h in hits)
    assert hits[0].local_ordinal == 5

    # Scoping to a conversation whose rows score lower still returns depth.
    other = normalized(rng, 50, dim)
    corpus.append("c", other)
    hits = corpus.search(shared[5:6], k=3, conversations=["c"])[0]
    assert all(h.conversation == "c" for h in hits)


def test_corpus_batched_queries(mesh, rng):
    dim = 16
    corpus = CorpusVectorStore(dim, mesh=mesh)
    rows = normalized(rng, 64, dim)
    corpus.append("only", rows)
    results = corpus.search(rows[:8], k=1)
    assert [r[0].local_ordinal for r in results] == list(range(8))


async def test_corpus_normalizes_rows_on_append():
    """Unnormalized embeddings must not clip every score to 1.0."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices (TAT_TEST_TPU single-chip mode)")
    corpus = CorpusVectorStore(dim=16, mesh=create_mesh(n_shard=2, n_dp=1))
    rng = np.random.default_rng(3)
    rows = rng.standard_normal((20, 16)).astype(np.float32) * 10.0  # big norms
    corpus.append("c", rows)
    q = rows[5:6] / np.linalg.norm(rows[5])
    hits = corpus.search(q, k=3)[0]
    assert hits[0].local_ordinal == 5
    assert hits[0].score == pytest.approx(1.0, abs=1e-3)
    # Non-identical rows score strictly below 1 once rows are normalized.
    assert hits[1].score < 0.999


async def test_corpus_normalizes_queries_too():
    """Unnormalized QUERY embeddings must not saturate scores either."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    corpus = CorpusVectorStore(dim=16, mesh=create_mesh(n_shard=2, n_dp=1))
    rng = np.random.default_rng(11)
    rows = rng.standard_normal((30, 16)).astype(np.float32)
    corpus.append("c", rows)
    raw_query = rows[4:5] * 25.0  # huge norm
    hits = corpus.search(raw_query, k=2)[0]
    assert hits[0].local_ordinal == 4
    assert hits[0].score == pytest.approx(1.0, abs=1e-3)
    assert hits[1].score < 0.999


def test_corpus_scoped_search_exact_for_buried_conversation(mesh, rng):
    """A small conversation buried under a dominant corpus must return its
    own top-k under scoping — the device segment mask guarantees exactness
    (no global-top-k oversampling that could miss the small tenant)."""
    dim = 32
    corpus = CorpusVectorStore(dim, mesh=mesh)
    q = normalized(rng, 1, dim)
    # "big" dominates every global winner slot for q...
    near = q + 0.01 * rng.standard_normal((3000, dim)).astype(np.float32)
    near /= np.linalg.norm(near, axis=1, keepdims=True)
    corpus.append("big", near)
    # ...while "tiny" holds only anti-correlated rows.
    far = -q + 0.01 * rng.standard_normal((6, dim)).astype(np.float32)
    far /= np.linalg.norm(far, axis=1, keepdims=True)
    corpus.append("tiny", far)

    scoped = corpus.search(q, k=5, conversations=["tiny"])[0]
    assert len(scoped) == 5
    assert all(h.conversation == "tiny" for h in scoped)
    # Exact parity with a host oracle over the tiny segment only.
    scores = np.clip((far @ q[0] + 1) / 2, 0, 1)
    expect = list(np.argsort(-scores, kind="stable")[:5])
    assert [h.local_ordinal for h in scoped] == [int(i) for i in expect]

    # Scoping to an unknown conversation returns empty, not garbage.
    assert corpus.search(q, k=5, conversations=["nope"]) == [[]]


def test_corpus_approx_global_search():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    """search_mode='approx' corpus: global searches ride the approx program,
    scoped searches stay exact — results match the exact corpus on CPU."""
    import numpy as np

    from typeagent_tpu.parallel import create_mesh
    from typeagent_tpu.parallel.corpus import CorpusVectorStore

    mesh = create_mesh(n_shard=4, n_dp=1)
    rng = np.random.default_rng(21)
    a = rng.standard_normal((60, 16)).astype(np.float32)
    b = rng.standard_normal((40, 16)).astype(np.float32)

    exact = CorpusVectorStore(16, mesh=mesh)
    approx = CorpusVectorStore(16, mesh=mesh, search_mode="approx")
    for corpus in (exact, approx):
        corpus.append("a", a)
        corpus.append("b", b)

    q = a[10:12]
    got_e = exact.search(q, k=3)
    got_a = approx.search(q, k=3)
    for he, ha in zip(got_e, got_a):
        assert [(h.conversation, h.local_ordinal) for h in ha] == [
            (h.conversation, h.local_ordinal) for h in he
        ]
    scoped = approx.search(q, k=3, conversations=["b"])[0]
    assert all(h.conversation == "b" for h in scoped)


def test_scoped_search_uses_device_intervals_not_host_mask(mesh, rng, monkeypatch):
    """Scoped corpus search must do O(segments) host work: the interval
    route, never a full-length host bool mask (search_masked)."""
    from typeagent_tpu.parallel.sharded import ShardedVectorStore

    dim = 16
    corpus = CorpusVectorStore(dim, mesh=mesh)
    a, b, c = (normalized(rng, n, dim) for n in (120, 90, 60))
    corpus.append("a", a)
    corpus.append("b", b)
    corpus.append("a", c)  # second segment for "a" (non-adjacent)

    def forbidden(*args, **kwargs):
        raise AssertionError("scoped search built a full-length host mask")

    monkeypatch.setattr(ShardedVectorStore, "search_masked", forbidden)
    intervals = corpus._segment_intervals({"a"})
    assert intervals.shape == (2, 2)  # O(segments), not O(rows)
    assert intervals.tolist() == [[0, 120], [210, 270]]

    q = a[7:8]
    hits = corpus.search(q, k=3, conversations=["a"])[0]
    assert hits[0].conversation == "a"
    assert hits[0].local_ordinal == 7
    assert all(h.conversation == "a" for h in hits)


def test_scoped_intervals_match_bruteforce(mesh, rng):
    dim = 24
    corpus = CorpusVectorStore(dim, mesh=mesh)
    mats = {}
    for name, n in (("x", 70), ("y", 150), ("z", 40)):
        mats[name] = normalized(rng, n, dim)
        corpus.append(name, mats[name])
    queries = normalized(rng, 5, dim)
    for wanted in (["y"], ["x", "z"]):
        res = corpus.search(queries, k=4, conversations=wanted)
        ref_rows = np.concatenate([mats[w] for w in wanted])
        names = sum(([w] * len(mats[w]) for w in wanted), [])
        locals_ = sum(([i for i in range(len(mats[w]))] for w in wanted), [])
        for qi in range(queries.shape[0]):
            scores = (ref_rows @ queries[qi] + 1.0) / 2.0
            best = np.argsort(-scores, kind="stable")[:4]
            got = [(h.conversation, h.local_ordinal) for h in res[qi]]
            exp = [(names[j], locals_[j]) for j in best]
            assert set(got) == set(exp), (wanted, qi)


def test_segment_intervals_merges_adjacent(mesh, rng):
    dim = 8
    corpus = CorpusVectorStore(dim, mesh=mesh)
    corpus.append("a", normalized(rng, 50, dim))
    corpus.append("a", normalized(rng, 30, dim))  # adjacent -> merged
    corpus.append("b", normalized(rng, 20, dim))
    assert corpus._segment_intervals({"a"}).tolist() == [[0, 80]]
    assert corpus._segment_intervals({"a", "b"}).tolist() == [[0, 100]]
