"""Probe: scoped corpus search at 10M fragments on one v5e.

10M x 384 bf16 (7.7 GB HBM) across 3 conversations; rows generated ON
DEVICE (append_device — no 15 GB host detour). Measures global and
interval-scoped QPS through CorpusVectorStore (device-side interval masks;
host work is O(segments)).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIM, B, K = 384, 64, 10
SEGS = [("podcast", 4_500_000), ("mailbox", 3_500_000), ("podcast", 2_000_000)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from typeagent_tpu.parallel import create_mesh
    from typeagent_tpu.parallel.corpus import CorpusVectorStore

    log("backend:", jax.default_backend())
    mesh = create_mesh(n_shard=1, n_dp=1, devices=jax.devices()[:1])
    corpus = CorpusVectorStore(DIM, mesh=mesh, dtype=jnp.bfloat16)

    t0 = time.perf_counter()
    corpus.reserve(sum(n for _, n in SEGS))  # avoid doubling overshoot (HBM)
    key = jax.random.PRNGKey(3)
    for i, (name, n) in enumerate(SEGS):
        # Generate in 500k chunks to bound peak f32 memory during gen.
        done = 0
        while done < n:
            step = min(500_000, n - done)
            key, sub = jax.random.split(key)
            rows = jax.random.normal(sub, (step, DIM), dtype=jnp.float32)
            corpus.append_device(name, rows)
            done += step
    jax.block_until_ready(corpus._store.buf)
    log(f"on-device build of {len(corpus._store)} rows: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    def bench(label, fn):
        t0 = time.perf_counter()
        out = fn()
        log(f"{label}: first (compile+run) {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        log(f"{label}: {best / 1 * 1000:.1f} ms/batch-{B} ({B / best:.0f} QPS)")
        return out

    res_g = bench("global exact", lambda: corpus.search(q, k=K))
    res_s = bench(
        "scoped exact (podcast: 2 intervals, 6.5M rows)",
        lambda: corpus.search(q, k=K, conversations=["podcast"]),
    )
    assert all(h.conversation == "podcast" for row in res_s for h in row)
    iv = corpus._segment_intervals({"podcast"})
    log(f"scoped host work: intervals table {iv.tolist()} ({iv.nbytes} bytes)")

    # Self-match probe through the scoped path.
    probe_row = np.asarray(
        corpus._store.get_row(5_000_123), dtype=np.float32
    ).reshape(1, -1)
    hit = corpus.search(probe_row, k=1, conversations=["mailbox"])[0][0]
    log(f"scoped self-match: global_ordinal={hit.global_ordinal} "
        f"({hit.conversation}/{hit.local_ordinal}) score={hit.score:.4f}")
    assert hit.global_ordinal == 5_000_123


if __name__ == "__main__":
    main()
