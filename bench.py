"""Headline benchmark: cosine top-10 QPS at 1M fragments (dim 384).

Baseline (BASELINE.md, measured on this machine): the reference's
fuzzy_lookup_embedding kernel (serial numpy, 1 thread) at 1M x 384 runs at
178 ms/query ~= 5.6 QPS. This benchmark runs the TPU-native fused
matmul+top-k kernel, batched, on the device and reports steady-state QPS.

The headline is the bf16 store (the recommended production mode: half the
HBM traffic, recall@10 vs the exact f32 scan ~0.994 at 1M rows, verified
here with an in-run recall probe); f32 (exact-parity) and int8 rates are
reported to stderr alongside.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra detail goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_ROWS = 1_000_000
DIM = 384
BATCH = 256
K = 10
BASELINE_QPS = 1000.0 / 178.0  # 178 ms/query single-thread numpy (BASELINE.md)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_store(matrix_chunks, dtype):
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    settings = TextEmbeddingIndexSettings(
        embedding_model=create_test_embedding_model(DIM), min_score=0.0,
        dtype=dtype,
    )
    store = VectorStore(settings)
    for chunk in matrix_chunks:
        store.add_embeddings(None, chunk)
    return store


def device_qps(store, many_queries, approx_rt: float | None = None):
    """R distinct query batches inside ONE dispatch (lax.map): steady-state
    throughput with host<->device round trips excluded. With ``approx_rt``,
    rides XLA's hardware approx_max_k instead of the exact Pallas kernel."""
    import jax
    import jax.numpy as jnp

    from typeagent_tpu.ops.topk import (
        cosine_topk_approx,
        topk_program,
        topk_program_quantized,
    )

    R = many_queries.shape[0]
    many_padded = np.zeros((R, many_queries.shape[1], store._dim_pad), np.float32)
    many_padded[:, :, :DIM] = many_queries
    many_dev = jnp.asarray(many_padded)
    count = jnp.asarray(store._count, dtype=jnp.int32)

    if approx_rt is not None:
        assert not store._quantized

        @jax.jit
        def scan_topk(emb, qs):
            return jax.lax.map(
                lambda q: cosine_topk_approx(
                    emb, q, count, K, recall_target=approx_rt
                ),
                qs,
            )

        args = (store._buf, many_dev)
    elif store._quantized:

        @jax.jit
        def scan_topk(emb, scales, qs):
            return jax.lax.map(
                lambda q: topk_program_quantized(emb, scales, q, count, K), qs
            )

        args = (store._buf, store._scales, many_dev)
    else:

        @jax.jit
        def scan_topk(emb, qs):
            return jax.lax.map(lambda q: topk_program(emb, q, count, K), qs)

        args = (store._buf, many_dev)

    out = scan_topk(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + warm
    elapsed = float("inf")
    for _ in range(3):  # best-of-3: damp tunnel throughput jitter
        t0 = time.perf_counter()
        out = scan_topk(*args)
        vals = np.asarray(jax.tree.leaves(out)[0])
        idx = np.asarray(jax.tree.leaves(out)[1])
        elapsed = min(elapsed, time.perf_counter() - t0)
    assert vals.shape[0] == R
    return R * many_queries.shape[1] / elapsed, elapsed / R * 1000, idx


def main() -> None:
    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    rng = np.random.default_rng(7)
    log(f"building {N_ROWS} x {DIM} matrix...")
    chunks = []
    for start in range(0, N_ROWS, 125_000):
        m = rng.standard_normal((125_000, DIM)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        chunks.append(m)
    queries = rng.standard_normal((BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    store = build_store(chunks, "bfloat16")  # headline: production mode
    t0 = time.perf_counter()
    store.fuzzy_lookup_embeddings_batch(queries, max_hits=K)
    log(f"warmup (incl. flush + compile): {time.perf_counter() - t0:.1f}s")
    probe = store.get_embedding_at(12345)
    hit = store.fuzzy_lookup_embedding(probe, max_hits=1)[0]
    assert hit.item == 12345 and hit.score > 0.999, hit
    log(f"self-match probe OK: {hit}")

    # Sync (one blocking round trip per batch) — the latency-bound number.
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        store.fuzzy_lookup_embeddings_batch(queries, max_hits=K)
    sync_ms = (time.perf_counter() - t0) / iters * 1000
    log(
        f"sync: {sync_ms:.2f} ms/batch-{BATCH} ({BATCH / sync_ms * 1000:.0f} QPS); "
        f"p50 per-batch latency {sync_ms:.2f} ms"
    )

    # Pipelined (async dispatch, sync at the end).
    iters = 30
    t0 = time.perf_counter()
    handles = [store.dispatch_lookup(queries, max_hits=K) for _ in range(iters)]
    results = [store.collect_lookup(h) for h in handles]
    elapsed = time.perf_counter() - t0
    assert all(r for r in results)
    log(
        f"pipelined: {elapsed / iters * 1000:.2f} ms/batch-{BATCH} "
        f"({iters * BATCH / elapsed:.0f} QPS)"
    )

    R = 20
    many = rng.standard_normal((R, BATCH, DIM)).astype(np.float32)
    many /= np.linalg.norm(many, axis=2, keepdims=True)

    qps, ms_per_batch, idx_bf16 = device_qps(store, many)
    log(
        f"device bf16 (single dispatch, {R} batches): {ms_per_batch:.2f} "
        f"ms/batch-{BATCH}, {qps:.0f} QPS "
        f"(baseline {BASELINE_QPS:.1f} QPS single-core numpy)"
    )

    # Exact f32 store: parity mode rate + the recall oracle for bf16.
    store_f32 = build_store(chunks, "float32")
    store_f32.fuzzy_lookup_embeddings_batch(queries, max_hits=K)  # flush
    qps_f32, ms_f32, idx_f32 = device_qps(store_f32, many)
    log(f"device f32 (exact parity): {ms_f32:.2f} ms/batch-{BATCH}, {qps_f32:.0f} QPS")
    recall = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(idx_bf16.reshape(-1, K), idx_f32.reshape(-1, K))
        ]
    )
    log(f"bf16 recall@{K} vs exact f32: {recall:.4f}")
    assert recall >= 0.97, recall
    del store_f32

    store_i8 = build_store(chunks, "int8")
    store_i8.fuzzy_lookup_embeddings_batch(queries, max_hits=K)  # flush
    qps_i8, ms_i8, idx_i8 = device_qps(store_i8, many)
    recall_i8 = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(idx_i8.reshape(-1, K), idx_f32.reshape(-1, K))
        ]
    )
    log(
        f"device int8: {ms_i8:.2f} ms/batch-{BATCH}, {qps_i8:.0f} QPS "
        f"(recall@{K} vs exact: {recall_i8:.4f})"
    )

    # Approximate mode (store.search_mode="approx"): XLA's hardware
    # approx_max_k over the bf16 store — runs at the matmul+HBM floor.
    approx_candidates = []
    for rt in (0.95, 0.97, 0.995):
        qps_a, ms_a, idx_a = device_qps(store, many, approx_rt=rt)
        recall_a = np.mean(
            [
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(idx_a.reshape(-1, K), idx_f32.reshape(-1, K))
            ]
        )
        log(
            f"device bf16-approx(rt={rt}): {ms_a:.2f} ms/batch-{BATCH}, "
            f"{qps_a:.0f} QPS (recall@{K} vs exact: {recall_a:.4f})"
        )
        approx_candidates.append((f"bf16-approx(rt={rt})", qps_a, recall_a))

    # Headline: the fastest production mode (quantized exact or approximate)
    # that clears the in-run recall bar against the exact f32 scan.
    candidates = [("bf16", qps, recall), ("int8", qps_i8, recall_i8)]
    candidates += approx_candidates
    eligible = [c for c in candidates if c[2] >= 0.97] or candidates[:1]
    mode, best_qps, best_recall = max(eligible, key=lambda c: c[1])
    log(f"headline mode: {mode} ({best_qps:.0f} QPS, recall {best_recall:.4f})")
    print(
        json.dumps(
            {
                "metric": (
                    f"cosine top-{K} QPS ({mode} store, recall@{K}>=0.97 vs "
                    f"exact, measured {best_recall:.3f}), "
                    f"{N_ROWS // 1000}k x {DIM} fragments, batch {BATCH}"
                ),
                "value": round(best_qps, 1),
                "unit": "QPS",
                "vs_baseline": round(best_qps / BASELINE_QPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
