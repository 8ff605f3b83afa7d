"""Probe: bucketed-argmax approx kernel vs approx_max_k vs exact Pallas.

1M x 384 bf16, batch 256, k=10, R=20 batches per dispatch (lax.map), best
of 3 timings. Writes progress to stderr (flushed) for background runs.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N, D, B, K, R = 1_000_000, 384, 256, 10, 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from typeagent_tpu.ops import topk as T

    log("backend:", jax.default_backend())
    rng = np.random.default_rng(11)
    emb = rng.standard_normal((N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_dev = jnp.asarray(emb, dtype=jnp.bfloat16)
    count = jnp.asarray(N, dtype=jnp.int32)
    many = rng.standard_normal((R, B, D)).astype(np.float32)
    many /= np.linalg.norm(many, axis=2, keepdims=True)
    many_dev = jnp.asarray(many)
    log("data on device")

    def bench(name, fn):
        @jax.jit
        def prog(e, qs):
            return jax.lax.map(lambda q: fn(e, q), qs)

        t0 = time.perf_counter()
        out = prog(emb_dev, many_dev)
        idx = np.asarray(jax.tree.leaves(out)[1])
        log(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = prog(emb_dev, many_dev)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        ms = best / R * 1000
        log(f"{name}: {ms:.2f} ms/batch-{B}  ({B / ms * 1000:.0f} QPS)")
        return idx.reshape(-1, K)

    idx_exact = bench("exact-bf16", lambda e, q: T.topk_program(e, q, count, K))
    idx_approx = bench(
        "approx(rt=0.97)",
        lambda e, q: T.cosine_topk_approx(e, q, count, K, recall_target=0.97),
    )
    idx_bucket = bench("bucket", lambda e, q: T.cosine_topk_bucket(e, q, count, K))

    for name, idx in (("approx", idx_approx), ("bucket", idx_bucket)):
        recall = np.mean(
            [
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(idx, idx_exact)
            ]
        )
        log(f"{name} recall@{K} vs exact-bf16: {recall:.4f}")


if __name__ == "__main__":
    main()
