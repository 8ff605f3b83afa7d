"""IVF append lifecycle on the real chip: QPS degradation vs appended rows.

Rows appended after an IVF snapshot ride an exact interval scan merged in
score space (`vectorstore.py:_topk_ivf`) — correct but O(appended) per
query. This probe measures that degradation curve on a 1M x 384 bf16
clustered store (1000 topics, 2% background), then lets the auto-rebuild
policy (`ivf_auto_rebuild` / `ivf_rebuild_frac`) fold the suffix into a
fresh snapshot off-thread and measures the recovered rate.

Methodology notes (NOTES.md round-4): block_until_ready does not truly
synchronize on the axon backend, so every timed region ends in a fetch;
R batches per timing so the tunnel round trip amortizes.

Run: python tools/tpu_ivf_append_probe.py [--rows 1e6] [--batch 256]
"""

import argparse
import functools
import os
import sys
import time

import jax

# The axon sitecustomize pins JAX_PLATFORMS=axon; plain env vars do not
# switch backends. Honor the package's TAT_JAX_PLATFORM for CPU smokes.
if os.environ.get("TAT_JAX_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TAT_JAX_PLATFORM"])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.ops import topk as T
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

D, K, R = 384, 10, 32
TOPICS = 1000
BG_FRAC = 0.02
SIGMA = 0.35


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_gen(key):
    centers = jax.random.normal(key, (TOPICS, D), dtype=jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    @functools.partial(jax.jit, static_argnums=1)
    def gen(k, n):
        kt, kn, kb, kc = jax.random.split(k, 4)
        topic = jax.random.randint(kt, (n,), 0, TOPICS)
        rows = centers[topic] + SIGMA * jax.random.normal(
            kn, (n, D), dtype=jnp.float32
        ) / jnp.sqrt(D)
        bg = jax.random.normal(kb, (n, D), dtype=jnp.float32)
        is_bg = jax.random.uniform(kc, (n, 1)) < BG_FRAC
        rows = jnp.where(is_bg, bg, rows)
        return rows / jnp.linalg.norm(rows, axis=1, keepdims=True)

    return gen


def measure(store: VectorStore, queries: np.ndarray) -> tuple[float, float]:
    """(ms per batch, recall@10 vs the exact scan of the same store)."""
    # warm + recall reference
    got = store.fuzzy_lookup_embeddings_batch(queries, max_hits=K)
    with store._dispatch_view() as (buf, _scales, count):
        ev, ei = T.cosine_topk(
            buf, jnp.asarray(queries, dtype=jnp.float32), count, K
        )
    oracle = np.asarray(ei)
    hits = sum(
        len({r.item for r in row} & set(oracle[i][oracle[i] >= 0]))
        for i, row in enumerate(got)
    )
    recall = hits / max(1, sum((oracle >= 0).sum(axis=1)))
    t0 = time.perf_counter()
    for _ in range(R):
        store.fuzzy_lookup_embeddings_batch(queries, max_hits=K)
    ms = (time.perf_counter() - t0) / R * 1000
    return ms, recall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1e6)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    n = int(args.rows) // 1024 * 1024

    log(f"backend: {jax.default_backend()}, rows={n}")
    gen = make_gen(jax.random.PRNGKey(7))

    settings = TextEmbeddingIndexSettings(
        create_test_embedding_model(D),
        min_score=0.0,
        dtype="bfloat16",
        search_mode="ivf",
    )
    store = VectorStore(settings)
    store._set_embedding_size(D)
    store.reserve(int(n * 1.3) + 1024)
    t0 = time.perf_counter()
    chunk = 131072
    key = jax.random.PRNGKey(11)
    for start in range(0, n, chunk):
        key, sub = jax.random.split(key)
        store.load_device_rows(gen(sub, min(chunk, n - start)))
    store._flush()
    log(f"device ingest: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    store.build_ivf()
    log(f"ivf build: {time.perf_counter() - t0:.1f}s "
        f"(snapshot covers {store._ivf_count} rows)")

    key, qk = jax.random.split(key)
    queries = np.asarray(gen(qk, args.batch), dtype=np.float32)

    print(f"{'appended':>9} {'ms/batch':>9} {'QPS':>8} {'recall@10':>9}")
    results = []
    fractions = [0.0, 0.02, 0.05, 0.10, 0.20]
    for prev, frac in zip(fractions, fractions[1:] + [None]):
        ms, recall = measure(store, queries)
        qps = args.batch / ms * 1000
        appended = store._count - store._ivf_count
        print(f"{appended / n:>8.0%} {ms:>9.2f} {qps:>8.0f} {recall:>9.4f}",
              flush=True)
        results.append((appended / n, ms, qps, recall))
        if frac is None:
            break
        key, sub = jax.random.split(key)
        store.load_device_rows(gen(sub, int(n * (frac - prev))))
        store._flush()

    # Auto-rebuild: enable the policy, run one query past the threshold,
    # wait for the background swap, measure the recovered rate.
    settings.ivf_auto_rebuild = True
    settings.ivf_rebuild_frac = 0.10  # 20% appended is already past it
    store.fuzzy_lookup_embeddings_batch(queries[:8], max_hits=K)
    t = store._ivf_rebuild_thread
    assert t is not None, "auto-rebuild did not trigger"
    t0 = time.perf_counter()
    t.join(timeout=600)
    assert not t.is_alive(), "rebuild did not finish in 600s"
    log(f"auto-rebuild (background): {time.perf_counter() - t0:.1f}s, "
        f"snapshot now covers {store._ivf_count} rows")
    ms, recall = measure(store, queries)
    print(f"{'rebuilt':>9} {ms:>9.2f} {args.batch / ms * 1000:>8.0f} "
          f"{recall:>9.4f}", flush=True)


if __name__ == "__main__":
    main()
