"""Headline benchmark: cosine top-10 QPS at 1M fragments (dim 384).

Baseline (BASELINE.md, measured on this machine): the reference's
fuzzy_lookup_embedding kernel (serial numpy, 1 thread) at 1M x 384 runs at
178 ms/query ~= 5.6 QPS. This benchmark runs the TPU-native fused
matmul+top-k kernel, batched, on the device and reports steady-state QPS.

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


def main() -> None:
    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    rng = np.random.default_rng(7)
    log(f"building {N_ROWS} x {DIM} store...")
    settings = TextEmbeddingIndexSettings(
        embedding_model=create_test_embedding_model(DIM), min_score=0.0
    )
    store = VectorStore(settings)
    chunk = 125_000
    for start in range(0, N_ROWS, chunk):
        m = rng.standard_normal((chunk, DIM)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        store.add_embeddings(None, m)
    queries = rng.standard_normal((BATCH, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # Warmup (compile) + one correctness probe: a row queried against itself
    # must come back first with score ~1.0.
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
    log(f"sync: {sync_ms:.2f} ms/batch-{BATCH} ({BATCH / sync_ms * 1000:.0f} QPS)")

    # Pipelined (async dispatch, sync at the end).
    iters = 30
    t0 = time.perf_counter()
    handles = [store.dispatch_lookup(queries, max_hits=K) for _ in range(iters)]
    results = [store.collect_lookup(h) for h in handles]
    elapsed = time.perf_counter() - t0
    assert all(r for r in results)
    pipelined_qps = iters * BATCH / elapsed
    log(
        f"pipelined: {elapsed / iters * 1000:.2f} ms/batch-{BATCH} "
        f"({pipelined_qps:.0f} QPS)"
    )

    # Device throughput: R distinct query batches inside ONE dispatch
    # (lax.map), so host<->device round-trip latency is excluded. This is the
    # steady-state number a batched serving pipeline sees.
    import jax
    import jax.numpy as jnp

    from typeagent_tpu.ops.topk import topk_program

    R = 20
    many = rng.standard_normal((R, BATCH, DIM)).astype(np.float32)
    many /= np.linalg.norm(many, axis=2, keepdims=True)
    many_padded = np.zeros((R, many.shape[1], store._dim_pad), dtype=np.float32)
    many_padded[:, :, :DIM] = many
    many_dev = jnp.asarray(many_padded)
    count = jnp.asarray(store._count, dtype=jnp.int32)

    @jax.jit
    def scan_topk(emb, qs):
        return jax.lax.map(lambda q: topk_program(emb, q, count, K), qs)

    out = scan_topk(store._buf, many_dev)
    jax.tree.leaves(out)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    out = scan_topk(store._buf, many_dev)
    vals = np.asarray(jax.tree.leaves(out)[0])
    elapsed = time.perf_counter() - t0
    assert vals.shape[0] == R
    qps = R * BATCH / elapsed
    ms_per_batch = elapsed / R * 1000
    log(
        f"device (single dispatch, {R} batches): {ms_per_batch:.2f} ms/batch-{BATCH}, "
        f"{qps:.0f} QPS (baseline {BASELINE_QPS:.1f} QPS single-core numpy)"
    )

    print(
        json.dumps(
            {
                "metric": f"cosine top-{K} QPS, {N_ROWS // 1000}k x {DIM} fragments, batch {BATCH}",
                "value": round(qps, 1),
                "unit": "QPS",
                "vs_baseline": round(qps / BASELINE_QPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
