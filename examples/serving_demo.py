"""Serving demo: coalesced lookups with LookupBatcher (offline, CPU mesh).

Simulates N concurrent clients hammering one VectorStore. The batcher
coalesces their requests into shared device dispatches — on a real TPU
behind a network hop this is the difference between paying one round trip
per request and one per BATCH of requests (measured 5x throughput on the
v5e tunnel at 1M rows).

Run: python examples/serving_demo.py
"""

import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if not os.environ.get("TAT_DEMO_REAL_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.serve import LookupBatcher
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

DIM = 64
N_ROWS = 50_000
CLIENTS = 24
REQUESTS_PER_CLIENT = 4


async def main() -> None:
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((N_ROWS, DIM)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)

    store = VectorStore(
        TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(DIM),
            min_score=0.0,
            dtype="bfloat16",
        )
    )
    store.add_embeddings(None, rows)
    store.fuzzy_lookup_embeddings_batch(rows[:1], max_hits=1)  # warm compile

    batcher = LookupBatcher(store, max_delay_ms=2.0, max_coalesce=16)

    async def client(cid: int):
        hits = []
        for r in range(REQUESTS_PER_CLIENT):
            want = (cid * 977 + r * 131) % N_ROWS
            q = rows[want : want + 1]
            res = await batcher.lookup(q, max_hits=3)
            assert res[0][0].item == want, (cid, r, res[0][0])
            hits.append(res[0][0])
            await asyncio.sleep(0)  # interleave clients
        return hits

    t0 = time.perf_counter()
    results = await asyncio.gather(*(client(c) for c in range(CLIENTS)))
    elapsed = time.perf_counter() - t0
    await batcher.close()

    total = CLIENTS * REQUESTS_PER_CLIENT
    print(
        f"{total} requests from {CLIENTS} clients in {elapsed * 1000:.0f} ms "
        f"over {batcher.dispatches} device dispatches "
        f"(coalescing {total / batcher.dispatches:.1f} requests/dispatch)"
    )
    assert batcher.dispatches < total, "no coalescing happened"
    print("every client got its exact self-match back — serving demo OK")


if __name__ == "__main__":
    asyncio.run(main())
