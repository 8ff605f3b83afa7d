"""Native result materialization (native/results.cpp) vs the Python fallback.

The serve path's host-side record building measured ~9 ms/batch-256 in pure
Python — more than the device compute — so it moved to a CPython extension.
These tests pin builder/fallback equivalence and dataclass compatibility.
"""

import numpy as np
import pytest

from typeagent_tpu.native import load_results_module
from typeagent_tpu import vectorstore as vs


@pytest.fixture(scope="module")
def native_mod():
    mod = load_results_module()
    if mod is None:
        pytest.skip("no compiler/headers for the native results module")
    return mod


def _python_build(vals, idx, b, min_score):
    results = []
    for r in range(b):
        keep = (vals[r] >= min_score) & (idx[r] >= 0)
        results.append(
            [(int(i), float(v)) for v, i in zip(vals[r][keep], idx[r][keep])]
        )
    return results


def test_build_matches_python_fallback(native_mod):
    rng = np.random.default_rng(0)
    for b, k, min_score in [(1, 1, 0.0), (7, 10, 0.3), (64, 32, 0.9), (3, 5, 1.1)]:
        vals = rng.random((b, k)).astype(np.float32)
        idx = rng.integers(-1, 1000, (b, k)).astype(np.int32)
        got = native_mod.build(vals, idx, b, k, float(min_score))
        want = _python_build(vals, idx, b, min_score)
        assert len(got) == len(want)
        for grow, wrow in zip(got, want):
            assert [(s.item, s.score) for s in grow] == wrow


def test_build_rejects_wrong_buffers(native_mod):
    vals = np.zeros((2, 3), dtype=np.float64)  # wrong itemsize... (8 bytes)
    idx = np.zeros((2, 3), dtype=np.int32)
    with pytest.raises(ValueError):
        native_mod.build(vals, idx, 2, 3, 0.0)
    with pytest.raises(ValueError):  # too few elements
        native_mod.build(
            np.zeros((1, 2), np.float32), np.zeros((1, 2), np.int32), 2, 3, 0.0
        )


def test_scoredint_type_parity(native_mod):
    s = native_mod.ScoredInt(4, 0.25)
    assert s.item == 4 and s.score == 0.25
    assert s == native_mod.ScoredInt(4, 0.25)
    assert s != native_mod.ScoredInt(4, 0.5)
    assert s == native_mod.ScoredInt(item=4, score=0.25)
    assert "item=4" in repr(s) and "0.25" in repr(s)
    with pytest.raises(TypeError):  # the dataclass twin is unhashable too
        hash(s)


def test_materialize_rows_python_fallback_equivalent(native_mod, monkeypatch):
    rng = np.random.default_rng(1)
    vals = rng.random((16, 10)).astype(np.float32)
    idx = rng.integers(-1, 500, (16, 10)).astype(np.int32)
    native_rows = vs._materialize_rows(vals, idx, 16, 0.4)
    monkeypatch.setattr(vs, "_NATIVE_RESULTS_CACHE", [None])
    python_rows = vs._materialize_rows(vals, idx, 16, 0.4)
    assert [[(s.item, s.score) for s in row] for row in native_rows] == [
        [(s.item, s.score) for s in row] for row in python_rows
    ]


def test_store_lookup_returns_native_records(native_mod, rng_store=None):
    from typeagent_tpu.models.adapters import create_test_embedding_model

    rng = np.random.default_rng(2)
    mat = rng.standard_normal((128, 16)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    store = vs.VectorStore(
        vs.TextEmbeddingIndexSettings(
            create_test_embedding_model(16), min_score=0.0
        )
    )
    store.add_embeddings(None, mat)
    out = store.fuzzy_lookup_embeddings_batch(mat[:4], max_hits=3)
    assert out[0][0].item == 0
    assert all(isinstance(s, native_mod.ScoredInt) for row in out for s in row)


def test_build_pairs_matches_python(native_mod):
    rng = np.random.default_rng(3)
    vals = rng.random((8, 6)).astype(np.float32)
    idx = rng.integers(-1, 100, (8, 6)).astype(np.int32)
    got = native_mod.build_pairs(vals, idx, 8, 6, -1e30)
    want = []
    for r in range(8):
        keep = idx[r] >= 0
        want.append(
            [(int(i), float(v)) for v, i in zip(vals[r][keep], idx[r][keep])]
        )
    assert got == want
