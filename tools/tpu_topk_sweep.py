"""TPU sweep for the fused top-k kernel (run on real hardware).

Methodology (see NOTES.md): buffers are device-created (no host upload),
timing uses many distinct query batches in ONE dispatch via lax.map inside
jit, so the per-call tunnel RTT and host-literal uploads don't pollute the
numbers. First compile in a fresh process is slow (remote compile service
cold start); subsequent compiles take seconds.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from typeagent_tpu.ops import topk

N, D, K = 1_000_448, 384, 10
REPS = 16  # distinct batches per dispatch


def log(*args):
    print(*args, flush=True)


def make_buffers(dtype):
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (N, D), dtype=jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    if dtype == "int8":
        scales = jnp.max(jnp.abs(emb), axis=1) / 127.0
        q = jnp.clip(jnp.round(emb / scales[:, None]), -127, 127).astype(jnp.int8)
        return q, scales
    return emb.astype(dtype), None


def bench(dtype, b, k=K):
    emb, scales = make_buffers(dtype)
    qkey = jax.random.PRNGKey(1)
    queries = jax.random.normal(qkey, (REPS, b, D), dtype=jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=2, keepdims=True)
    count = jnp.asarray([N], jnp.int32)

    if dtype == "int8":

        @jax.jit
        def run(e, s, qs):
            return jax.lax.map(
                lambda q: topk._topk_pallas_q_impl(
                    e, s, q.astype(jnp.bfloat16), count, k=k
                ),
                qs,
            )

        args = (emb, scales, queries)
    else:

        @jax.jit
        def run(e, qs):
            return jax.lax.map(
                lambda q: topk._topk_pallas_impl(e, q, count, k=k), qs
            )

        args = (emb, queries)

    out = run(*args)
    jax.block_until_ready(out)
    # Correctness probe vs the XLA oracle on the first batch.
    vals, idx = (np.asarray(x[0]) for x in out)
    if dtype == "int8":
        ov, oi = topk._topk_xla_q_impl(emb, scales, queries[0], jnp.int32(N), k=k)
    else:
        ov, oi = topk._topk_xla_impl(emb, queries[0], jnp.int32(N), k=k)
    ov, oi = np.asarray(ov), np.asarray(oi)
    if not (set(map(tuple, idx[:4, :].tolist())) == set(map(tuple, oi[:4, :].tolist()))):
        mism = (idx != oi).mean()
        log(f"  probe: idx mismatch rate {mism:.4f}")
    np.testing.assert_allclose(np.sort(vals, axis=1), np.sort(ov, axis=1), atol=2e-2)
    log("  probe OK (scores match oracle)")
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    qps = b / dt
    log(
        f"dtype={dtype:8s} b={b:4d} k={k:3d}: {dt*1e3:7.2f} ms/batch "
        f"{qps:9.0f} QPS"
    )
    return dt, qps


def main():
    import os

    log("devices:", jax.devices())
    # A/B the merge tier within ONE process (tunnel throughput varies ±40%
    # between processes; only interleaved comparisons are meaningful).
    for tier in ("extract", "chain", "extract", "chain"):
        os.environ["TAT_TOPK_MERGE"] = tier
        log(f"--- merge tier: {tier}")
        bench("bfloat16", 256)
        bench("bfloat16", 64)
    os.environ["TAT_TOPK_MERGE"] = "chain"
    for dtype in ("int8", "float32"):
        bench(dtype, 256)
    bench("bfloat16", 256, k=1)
    bench("bfloat16", 256, k=16)


if __name__ == "__main__":
    main()
