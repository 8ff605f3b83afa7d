"""Device postings engine vs the host MatchAccumulator oracle."""

import math

import numpy as np
import pytest

from typeagent_tpu.knowpro.collections import MatchAccumulator
from typeagent_tpu.native import PyInterner, create_interner, native_available
from typeagent_tpu.ops.postings import DevicePostingsIndex


def oracle_accumulate(postings, query_terms, scope=None):
    """Host MatchAccumulator replicating the device program's contract."""
    acc = MatchAccumulator()
    for text, weight, is_exact in query_terms:
        for term, semref, score in postings:
            if term != text.lower():
                continue
            if scope is not None and not scope[semref]:
                continue
            acc.add(semref, score * weight, is_exact)
    # add_term_matches_if_new: related contributions to exact-matched semrefs
    # are dropped (device contract).
    results = {}
    for match in acc:
        if match.hit_count > 0:
            related = 0.0  # exact match present -> related dropped
            total = match.score
        else:
            total = (
                math.log(match.related_hit_count + 1)
                * match.related_score
                / match.related_hit_count
                if match.related_hit_count > 1
                else match.related_score
            )
        results[match.value] = total
    return results


def test_interner_native_and_python_agree():
    impls = [PyInterner()]
    if native_available():
        impls.append(create_interner())
    csrs = []
    for interner in impls:
        for term, semref in [("Apple", 0), ("banana", 1), ("APPLE", 2), ("cherry", 0)]:
            tid = interner.intern(term)
            interner.add_posting(tid, semref, 1.0)
        assert interner.lookup("apple") == 0
        assert interner.lookup("zzz") == -1
        assert len(interner) == 3
        csrs.append(interner.build_csr())
    if len(csrs) == 2:
        for a, b in zip(csrs[0], csrs[1]):
            np.testing.assert_array_equal(a, b)


def test_device_accumulation_matches_oracle():
    postings = [
        ("bach", 0, 1.0),
        ("bach", 3, 1.0),
        ("composer", 0, 1.0),
        ("composer", 1, 1.0),
        ("piano", 2, 1.0),
        ("piano", 3, 0.5),
        ("music", 0, 1.0),
        ("music", 1, 1.0),
        ("music", 2, 1.0),
    ]
    index = DevicePostingsIndex()
    for term, semref, score in postings:
        index.add_term(term, semref, score)

    query = [("bach", 10.0, True), ("composer", 8.0, False), ("music", 2.0, False)]
    total, exact_hits, related_hits = index.lookup_terms(query)
    expected = oracle_accumulate(postings, query)
    for semref, score in expected.items():
        # rel=2e-4: TPU f32 transcendentals (the log-smoothing) differ from
        # numpy's double-precision log by up to ~6e-5 relative.
        assert total[semref] == pytest.approx(score, rel=2e-4), semref
    # semref 0: exact bach 10 (related dropped); semref 1: related only
    assert exact_hits[0] == 1 and related_hits[0] == 0
    assert exact_hits[1] == 0 and related_hits[1] == 2
    assert total[1] == pytest.approx(math.log(3) * (8.0 + 2.0) / 2, rel=2e-4)


def test_device_accumulation_scope_mask():
    index = DevicePostingsIndex()
    for semref in range(6):
        index.add_term("common", semref, 1.0)
    scope = np.array([True, False, True, False, True, False])
    total, exact_hits, _ = index.lookup_terms([("common", 1.0, True)], scope)
    np.testing.assert_array_equal(exact_hits > 0, scope)
    assert total[1] == 0.0 and total[2] == 1.0


def test_device_accumulation_missing_term_and_padding():
    index = DevicePostingsIndex()
    index.add_term("only", 0, 1.0)
    total, exact_hits, related_hits = index.lookup_terms(
        [("only", 2.0, True), ("missing", 5.0, True)]
    )
    assert total[0] == pytest.approx(2.0)
    assert exact_hits.sum() == 1


def test_device_accumulation_large_random():
    rng = np.random.default_rng(0)
    n_terms, n_semrefs, n_postings = 200, 500, 5000
    terms = [f"term{i}" for i in range(n_terms)]
    postings = [
        (
            terms[rng.integers(n_terms)],
            int(rng.integers(n_semrefs)),
            float(rng.uniform(0.5, 1.0)),
        )
        for _ in range(n_postings)
    ]
    index = DevicePostingsIndex()
    for term, semref, score in postings:
        index.add_term(term, semref, score)
    query = [(terms[i], float(i % 3 + 1), i % 2 == 0) for i in range(0, 40, 2)]
    total, exact_hits, related_hits = index.lookup_terms(query)
    expected = oracle_accumulate(postings, query)
    got_nonzero = {i for i in range(n_semrefs) if abs(total[i]) > 1e-9}
    assert got_nonzero == set(expected)
    for semref, score in expected.items():
        assert total[semref] == pytest.approx(score, rel=1e-4), semref


def _random_ops_setup(rng, n_terms=120, n_semrefs=2000, n_postings=20000):
    from typeagent_tpu.ops import postings as P

    terms = [f"term{i}" for i in range(n_terms)]
    raw = [
        (
            terms[rng.integers(n_terms)],
            int(rng.integers(n_semrefs)),
            float(rng.uniform(0.5, 1.0)),
        )
        for _ in range(n_postings)
    ]
    index = DevicePostingsIndex()
    for term, semref, score in raw:
        index.add_term(term, semref, score)
    index.build()
    ktype = rng.integers(0, 4, size=n_semrefs).astype(np.int8)
    ops = []
    for i in range(24):
        tid = index._interner.lookup(terms[rng.integers(n_terms)])
        ops.append(
            (
                tid,
                float(rng.uniform(0.5, 10.0)),
                int(rng.integers(4)),  # seg
                int(rng.integers(2)),  # kind: exact/related
                i,  # position
                -1,  # ktype gate
                0,  # scope id
            )
        )
    return index, ops, ktype


def test_lookup_ops_compact_path_matches_dense(monkeypatch):
    """The device-side sparse compaction (large conversations) returns the
    same dense arrays as the direct transfer."""
    from typeagent_tpu.ops import postings as P

    rng = np.random.default_rng(7)
    index, ops, ktype = _random_ops_setup(rng)

    # semref_cap (~2000) > the gate forces the compact path.
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 256)
    monkeypatch.setattr(P, "_COMPACT_CAP", 256)
    compact = index.lookup_ops(ops, 4, ktype)
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 10**9)  # force dense
    dense = index.lookup_ops(ops, 4, ktype)
    for a, b in zip(compact, dense):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_lookup_ops_compact_overflow_falls_back(monkeypatch):
    """A segment matching more semrefs than the cap falls back to the dense
    transfer losslessly."""
    from typeagent_tpu.ops import postings as P

    rng = np.random.default_rng(8)
    # One hot term with a huge posting list -> one segment overflows cap=64.
    index = DevicePostingsIndex()
    for semref in range(1000):
        index.add_term("hot", semref, 0.9)
    index.add_term("cold", 3, 0.7)
    index.build()
    ktype = np.zeros(1000, np.int8)
    tid_hot = index._interner.lookup("hot")
    tid_cold = index._interner.lookup("cold")
    ops = [
        (tid_hot, 1.0, 0, 0, 0, -1, 0),
        (tid_cold, 2.0, 1, 0, 1, -1, 0),
    ]
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 64)
    monkeypatch.setattr(P, "_COMPACT_CAP", 64)
    escore, ehits, _, _, op_hit = index.lookup_ops(ops, 2, ktype)
    # Segment 0 has all 1000 matches despite cap=64 (dense fallback).
    assert (ehits[0] > 0).sum() == 1000
    assert escore[1, 3] == pytest.approx(1.4, rel=1e-5)
    assert list(op_hit) == [True, True]


def test_coo_sparse_matches_dense_randomized(monkeypatch):
    """The sort+scan COO kernel (lookup_ops_sparse) must reproduce the
    dense scatter kernel exactly across random ops: exact/related mix,
    first-adder masking, boost membership, ktype gates, scope rows."""
    from typeagent_tpu.ops import postings as P

    rng = np.random.default_rng(11)
    index, ops, ktype = _random_ops_setup(rng)
    n_semrefs = len(ktype)
    # Add property-like boost ops and gated/scoped ops.
    tid0 = ops[0][0]
    ops.append((tid0, 1.0, 1, P.OP_BOOST, 0, -1, 0))
    ops.append((ops[3][0], 2.0, 2, P.OP_EXACT, 30, 2, 0))  # ktype-gated
    scope = np.zeros(n_semrefs, dtype=bool)
    scope[: n_semrefs // 2] = True
    ops.append((ops[5][0], 1.5, 3, P.OP_RELATED, 31, -1, 1))  # scoped
    scopes = [None, scope]

    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 128)  # force the sparse gate open
    sparse = index.lookup_ops_sparse(ops, 4, ktype, scopes, boost_factor=10.0)
    assert sparse is not None
    cols, packed, counts, op_hit_s = sparse

    dense = index.lookup_ops(ops, 4, ktype, scopes, boost_factor=10.0)
    es, eh, rs, rh, op_hit_d = dense
    np.testing.assert_array_equal(op_hit_s, op_hit_d)
    for s in range(4):
        c = counts[s]
        active_cols = cols[s, :c]
        assert (np.diff(active_cols) > 0).all()  # ascending, unique
        dense_active = np.flatnonzero((eh[s] > 0) | (rh[s] > 0))
        np.testing.assert_array_equal(active_cols, dense_active)
        for a, block in enumerate((es, eh, rs, rh)):
            np.testing.assert_allclose(
                packed[a, s, :c], block[s, active_cols], rtol=1e-5, atol=1e-6
            )


def test_coo_sparse_overflow_grows_buckets(monkeypatch):
    """More active runs than the initial COO bucket: the retry loop must
    grow the bucket and return complete results."""
    from typeagent_tpu.ops import postings as P

    index = DevicePostingsIndex()
    for semref in range(300):
        index.add_term("hot", semref, 0.9)
    index.build()
    ktype = np.zeros(300, np.int8)
    tid = index._interner.lookup("hot")
    ops = [(tid, 1.0, 0, P.OP_EXACT, 0, -1, 0)]

    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 32)
    monkeypatch.setattr(P, "_COO_BUCKETS", (64, 512))
    index._coo_hint = 64  # start below the 300 active runs -> retry path
    sparse = index.lookup_ops_sparse(ops, 1, ktype)
    assert sparse is not None
    cols, packed, counts, _ = sparse
    assert counts[0] == 300
    np.testing.assert_array_equal(cols[0, :300], np.arange(300))


def test_coo_sparse_runs_past_last_bucket_fall_back(monkeypatch):
    """Active runs beyond the LARGEST COO bucket must fall back to dense
    (None) — even when the first call is the one that overflows — and must
    never inflate the retry hint past the bucket cap (an inflated hint
    would size every later fetch and compile fresh kernel variants)."""
    from typeagent_tpu.ops import postings as P

    index = DevicePostingsIndex()
    for semref in range(300):
        index.add_term("hot", semref, 0.9)
    index.build()
    ktype = np.zeros(300, np.int8)
    tid = index._interner.lookup("hot")
    ops = [(tid, 1.0, 0, P.OP_EXACT, 0, -1, 0)]

    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 32)
    monkeypatch.setattr(P, "_COO_BUCKETS", (8, 32))
    index._coo_hint = 8  # 300 runs overflow even the largest bucket (32)
    assert index.lookup_ops_sparse(ops, 1, ktype) is None
    assert index._coo_hint <= P._COO_BUCKETS[-1]
    # The full entry point still answers (dense fallback), losslessly.
    escore, ehits, _, _, op_hit = index.lookup_ops(ops, 1, ktype)
    assert (ehits[0] > 0).sum() == 300
    assert list(op_hit) == [True]


def test_coo_sparse_key_packing_overflow_falls_back(monkeypatch):
    """n_seg * (semref_cap + 1) >= 2^30 cannot ride the int32 COO key:
    lookup_ops_sparse must return None instead of silently dropping the
    high segments' runs."""
    from typeagent_tpu.ops import postings as P

    index = DevicePostingsIndex()
    for semref in range(100):
        index.add_term("hot", semref, 0.9)
    index.build()
    ktype = np.zeros(100, np.int8)
    tid = index._interner.lookup("hot")
    ops = [(tid, 1.0, 0, P.OP_EXACT, 0, -1, 0)]
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 32)
    n_seg_over = 2**30 // (index._semref_cap + 1) + 1
    assert index.lookup_ops_sparse(ops, n_seg_over, ktype) is None


def test_coo_sparse_wide_leaf_positions_fall_back(monkeypatch):
    """Op positions past the _POS_P clamp would collide in the secondary
    sort key and break first-adder tie-breaking: such leaves must take the
    dense path."""
    from typeagent_tpu.ops import postings as P

    index = DevicePostingsIndex()
    for semref in range(100):
        index.add_term("hot", semref, 0.9)
    index.build()
    ktype = np.zeros(100, np.int8)
    tid = index._interner.lookup("hot")
    ops = [(tid, 1.0, 0, P.OP_RELATED, P._POS_P - 1, -1, 0)]
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 32)
    assert index.lookup_ops_sparse(ops, 1, ktype) is None
    # At the clamp boundary itself the sparse route is still exact.
    ops_ok = [(tid, 1.0, 0, P.OP_RELATED, P._POS_P - 2, -1, 0)]
    sparse = index.lookup_ops_sparse(ops_ok, 1, ktype)
    assert sparse is not None
    cols, packed, counts, _ = sparse
    assert counts[0] == 100


def test_mid_size_conversation_routes_sparse_by_default():
    """No monkeypatching: a conversation whose semref_cap sits between
    _SPARSE_MIN_CAP and the compact cap must take the sparse COO route
    under the DEFAULT constants (measured on a tunnel-attached v5e: the
    dense [4, n_seg, cap] f32 download dominates from ~2k semrefs up —
    dense 21.0 ms/query vs sparse 6.0 at 10k semrefs)."""
    from typeagent_tpu.ops import postings as P

    rng = np.random.default_rng(13)
    index, ops, ktype = _random_ops_setup(
        rng, n_terms=80, n_semrefs=3000, n_postings=6000
    )
    assert P._SPARSE_MIN_CAP < index._semref_cap <= 2 * P._COMPACT_CAP
    sparse = index.lookup_ops_sparse(ops, 4, ktype)
    assert sparse is not None
    cols, packed, counts, op_hit_s = sparse
    es, eh, rs, rh, op_hit_d = index.lookup_ops(ops, 4, ktype)
    np.testing.assert_array_equal(op_hit_s, op_hit_d)
    for s in range(4):
        c = counts[s]
        dense_active = np.flatnonzero((eh[s] > 0) | (rh[s] > 0))
        np.testing.assert_array_equal(cols[s, :c], dense_active)
        np.testing.assert_allclose(
            packed[0, s, :c], es[s, dense_active], rtol=1e-5, atol=1e-6
        )


def test_compact_route_preserves_active_semref_zero(monkeypatch):
    """Regression: the compact host re-expansion used a full-width fancy
    assignment whose unused slots carried (order 0, value 0) — numpy's
    last-duplicate-wins then silently zeroed an ACTIVE semref 0."""
    from typeagent_tpu.ops import postings as P

    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 16)
    monkeypatch.setattr(P, "_COMPACT_CAP", 8)
    monkeypatch.setattr(P, "_COMPACT_FETCH_BUCKETS", (4, 8))

    index = DevicePostingsIndex()
    index.add_term("alpha", 0)  # semref 0 is active
    index.add_term("alpha", 1)
    index.add_term("far", 5000)  # semref_cap >> the gate -> compact route
    index.build()
    assert index._semref_cap > P._SPARSE_MIN_CAP

    tid = index.lookup("alpha")
    ktype = np.zeros(index._n_semrefs, np.int32)
    ops = [(tid, 1.0, 0, P.OP_EXACT, 0, -1, 0)]
    es, eh, rs, rh, _ = index.lookup_ops(ops, 1, ktype)
    assert es[0, 0] == 1.0 and eh[0, 0] == 1.0
    assert es[0, 1] == 1.0
    assert es[0, 2:].sum() == 0.0


def test_lookup_ops_compact_refetch_bucket_above_cap(monkeypatch):
    """A refetch whose bucket rounds ABOVE the packed block width must
    clamp to cap: JAX slicing past cap silently truncates while the host
    `valid` mask keeps the bucket width, crashing the scatter with a
    boolean-index shape mismatch (semref_cap values between the fetch
    buckets, e.g. 3072, hit this in production sizes)."""
    from typeagent_tpu.ops import postings as P

    rng = np.random.default_rng(11)
    index, ops, ktype = _random_ops_setup(rng)
    # cap=8; hint starts at 4; a segment matching 5-8 semrefs buckets to
    # 16 > cap on refetch.
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 256)
    monkeypatch.setattr(P, "_COMPACT_CAP", 8)
    monkeypatch.setattr(P, "_COMPACT_FETCH_BUCKETS", (4, 16))
    # Make one op hit ~6 semrefs in its segment: craft a hot term.
    hot = DevicePostingsIndex()
    for semref in range(6):
        hot.add_term("hot", semref, 0.9)
    hot.add_term("cold", 30, 0.7)
    # Pad the id space so semref_cap clears the sparse gate.
    hot.add_term("pad", 1999, 0.5)
    hot.build()
    kt = np.zeros(2000, np.int8)
    tid = hot._interner.lookup("hot")
    got = hot.lookup_ops([(tid, 1.0, 0, 0, 0, -1, 0)], 1, kt)
    assert hot._fetch_hint <= min(P._COMPACT_CAP, hot._semref_cap)
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 10**9)  # force dense
    dense = hot.lookup_ops([(tid, 1.0, 0, 0, 0, -1, 0)], 1, kt)
    for a, b in zip(got, dense):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_coo_sparse_dp_matches_single(monkeypatch):
    """lookup_ops_sparse_dp over a (dp, shard) mesh must reproduce the
    single-call COO results exactly: segments split across dp ranks,
    postings replicated, global segment numbering reassembled."""
    from typeagent_tpu.ops import postings as P
    from typeagent_tpu.parallel import create_mesh

    rng = np.random.default_rng(13)
    index, ops, ktype = _random_ops_setup(rng)
    tid0 = ops[0][0]
    ops.append((tid0, 1.0, 1, P.OP_BOOST, 0, -1, 0))
    scope = np.zeros(len(ktype), dtype=bool)
    scope[: len(ktype) // 2] = True
    ops.append((ops[5][0], 1.5, 3, P.OP_RELATED, 31, -1, 1))
    scopes = [None, scope]

    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 128)
    single = index.lookup_ops_sparse(ops, 4, ktype, scopes, boost_factor=10.0)
    assert single is not None

    mesh = create_mesh(n_shard=2, n_dp=4)
    dp = index.lookup_ops_sparse_dp(
        ops, 4, ktype, scopes, boost_factor=10.0, mesh=mesh
    )
    assert dp is not None
    cols_s, packed_s, counts_s, oh_s = single
    cols_d, packed_d, counts_d, oh_d = dp
    np.testing.assert_array_equal(counts_d, counts_s)
    np.testing.assert_array_equal(oh_d, oh_s)
    for s in range(4):
        c = counts_s[s]
        np.testing.assert_array_equal(cols_d[s, :c], cols_s[s, :c])
        np.testing.assert_allclose(
            packed_d[:, s, :c], packed_s[:, s, :c], rtol=1e-5, atol=1e-6
        )


def test_coo_sparse_dp_single_rank_delegates(monkeypatch):
    """A dp=1 mesh (or None) just routes to lookup_ops_sparse."""
    from typeagent_tpu.ops import postings as P
    from typeagent_tpu.parallel import create_mesh

    rng = np.random.default_rng(14)
    index, ops, ktype = _random_ops_setup(rng)
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 128)
    single = index.lookup_ops_sparse(ops, 4, ktype)
    mesh = create_mesh(n_shard=8, n_dp=1)
    dp = index.lookup_ops_sparse_dp(ops, 4, ktype, mesh=mesh)
    for a, b in zip(dp, single):
        np.testing.assert_allclose(a, b, rtol=1e-6)
