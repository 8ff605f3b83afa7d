"""Serve-path A/B on the real chip: f32 vs bf16 query upload, interleaved.

Builds a 1M x 384 bf16 store ON DEVICE, then times the serving ladder
(sync / coalesced-many / batcher stream) with the query upload dtype
flipped between interleaved segments — cross-session comparison is useless
on this tunnel (±40%), so both variants run in ONE process, alternating.

Usage: python tools/tpu_serve_ab.py [--rows 1000000] [--pairs 4]
"""

import sys

sys.path.insert(0, "/root/repo")

import argparse
import asyncio
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--r", type=int, default=20)
    ap.add_argument("--pairs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import typeagent_tpu  # noqa: F401  (compile cache, platform pin)
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.serve import LookupBatcher
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    dim, batch, r_n = 384, args.batch, args.r

    @jax.jit
    def gen(key):
        ke, kq = jax.random.split(key)
        emb = jax.random.normal(ke, (args.rows, dim), dtype=jnp.float32)
        emb /= jnp.linalg.norm(emb, axis=1, keepdims=True)
        qs = jax.random.normal(kq, (r_n, batch, dim), dtype=jnp.float32)
        qs /= jnp.linalg.norm(qs, axis=2, keepdims=True)
        return emb, qs

    t0 = time.perf_counter()
    rows, qs_dev = gen(jax.random.PRNGKey(11))
    rows.block_until_ready()
    print(f"data gen: {time.perf_counter() - t0:.1f}s", flush=True)

    store = VectorStore(
        TextEmbeddingIndexSettings(
            create_test_embedding_model(dim), min_score=0.0, dtype="bfloat16"
        )
    )
    store.load_device_rows(rows)
    many_host = np.asarray(qs_dev)
    q_one = many_host[0]

    f32 = np.dtype(np.float32)

    def set_upload(dtype_fn):
        store.settings.query_wire = "auto"
        store._query_upload_dtype = dtype_fn

    def set_int8_wire():
        store._query_upload_dtype = native_upload
        store.settings.query_wire = "int8"

    native_upload = type(store)._query_upload_dtype.__get__(store)

    def timed(fn, warm=1, iters=3):
        for _ in range(warm):
            fn()
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def sync_once():
        store.fuzzy_lookup_embeddings_batch(q_one, max_hits=10)

    def many_once():
        store.fuzzy_lookup_embeddings_many(many_host, max_hits=10)

    n_stream = 3 * r_n

    def stream_once():
        async def run():
            b = LookupBatcher(
                store, max_delay_ms=0.0, max_coalesce=8, max_inflight=3
            )
            sem = asyncio.Semaphore(24)

            async def one(i):
                async with sem:
                    return await b.lookup(many_host[i % r_n], max_hits=10)

            await asyncio.gather(*(one(i) for i in range(n_stream)))
            await b.close()

        asyncio.run(run())

    # Warm compiles for every wire variant before timing.
    for setter in (
        lambda: set_upload(native_upload),
        lambda: set_upload(lambda: f32),
        set_int8_wire,
    ):
        setter()
        sync_once()
        many_once()
        stream_once()

    acc = {}
    for pair in range(args.pairs):
        for label, setter in (
            ("bf16-wire", lambda: set_upload(native_upload)),
            ("f32-wire", lambda: set_upload(lambda: f32)),
            ("int8-wire", set_int8_wire),
        ):
            setter()
            s = timed(sync_once, warm=0, iters=2)
            m = timed(many_once, warm=0, iters=1)
            st = timed(stream_once, warm=0, iters=1)
            acc.setdefault(label, []).append((s, m, st))
            print(
                f"[{pair}] {label}: sync {s * 1000:.1f} ms/b "
                f"({batch / s:.0f} QPS) | many-x{r_n} "
                f"{m / r_n * 1000:.2f} ms/b ({r_n * batch / m:.0f} QPS) | "
                f"stream-x{n_stream} {st / n_stream * 1000:.2f} ms/b "
                f"({n_stream * batch / st:.0f} QPS)",
                flush=True,
            )

    print("\n== medians over pairs ==")
    for label, rows_ in acc.items():
        s = np.median([x[0] for x in rows_])
        m = np.median([x[1] for x in rows_])
        st = np.median([x[2] for x in rows_])
        print(
            f"{label}: sync {batch / s:.0f} QPS | many {r_n * batch / m:.0f} "
            f"QPS | stream {n_stream * batch / st:.0f} QPS"
        )


if __name__ == "__main__":
    main()
