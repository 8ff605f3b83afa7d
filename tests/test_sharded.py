"""Distributed search on a virtual 8-device CPU mesh.

Validates the multi-chip sharding path (per-shard top-k + all-gather merge)
without TPU hardware (SURVEY.md §4: mesh tests on CPU via
xla_force_host_platform_device_count).
"""

import jax
import numpy as np
import pytest

from typeagent_tpu.parallel import ShardedVectorStore, create_mesh


def normalized(rng, n, dim):
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(n_shard=8, n_dp=1)


def test_sharded_matches_oracle(mesh8, rng):
    dim = 64
    store = ShardedVectorStore(mesh8, dim)
    matrix = normalized(rng, 5000, dim)
    store.append(matrix[:3000])
    store.append(matrix[3000:])
    assert len(store) == 5000

    queries = normalized(rng, 9, dim)
    results = store.search(queries, k=10)
    for qi, q in enumerate(queries):
        scores = np.clip((matrix @ q + 1) / 2, 0, 1)
        expect = np.argsort(scores)[::-1][:10]
        got = [i for i, _ in results[qi]]
        assert set(got) == set(int(i) for i in expect)
        got_scores = [s for _, s in results[qi]]
        np.testing.assert_allclose(got_scores, np.sort(scores)[::-1][:10], atol=2e-5)


def test_sharded_with_dp_axis(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = create_mesh(n_shard=4, n_dp=2)
    dim = 32
    store = ShardedVectorStore(mesh, dim)
    matrix = normalized(rng, 1000, dim)
    store.append(matrix)
    queries = normalized(rng, 16, dim)
    results = store.search(queries, k=5)
    for qi, q in enumerate(queries):
        scores = np.clip((matrix @ q + 1) / 2, 0, 1)
        expect = set(int(i) for i in np.argsort(scores)[::-1][:5])
        assert set(i for i, _ in results[qi]) == expect


def test_sharded_growth_and_partial_fill(mesh8, rng):
    dim = 16
    store = ShardedVectorStore(mesh8, dim)
    matrix = normalized(rng, 37, dim)  # much smaller than capacity
    store.append(matrix)
    results = store.search(matrix[:2], k=50)
    # k capped by count; only live rows may appear
    for res in results:
        assert len(res) == 37
        assert all(0 <= i < 37 for i, _ in res)
    assert results[0][0][0] == 0
    assert results[1][0][0] == 1
