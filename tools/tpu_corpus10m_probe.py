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
# Fragmented layout: 24 interleaved segments -> scoping to one name is 8
# intervals (SMEM interval kernel), two names 16 (row-masked kernel).
FRAG_SEGS = [
    (name, 416_000)
    for _ in range(8)
    for name in ("podcast", "mailbox", "wiki")
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from typeagent_tpu.parallel import create_mesh
    from typeagent_tpu.parallel.corpus import CorpusVectorStore

    segs = FRAG_SEGS if "--fragmented" in sys.argv else SEGS
    dtype = jnp.int8 if "--int8" in sys.argv else jnp.bfloat16
    if "--rows" in sys.argv:
        # Scale the segment layout to a total row count (e.g. --rows
        # 30000000 with --int8: 11.5 GB in HBM on one chip).
        total = int(sys.argv[sys.argv.index("--rows") + 1])
        f = total / sum(n for _, n in segs)
        segs = [(name, int(n * f)) for name, n in segs]
    log("backend:", jax.default_backend())
    log(f"layout: {len(segs)} segments, {sum(n for _, n in segs)} rows, "
        f"dtype {jnp.dtype(dtype).name}")
    mesh = create_mesh(n_shard=1, n_dp=1, devices=jax.devices()[:1])
    corpus = CorpusVectorStore(DIM, mesh=mesh, dtype=dtype)

    t0 = time.perf_counter()
    corpus.reserve(sum(n for _, n in segs))  # avoid doubling overshoot (HBM)
    key = jax.random.PRNGKey(3)
    for i, (name, n) in enumerate(segs):
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
    # int8 stores always scope via the row-masked quantized kernel; float
    # stores use the SMEM interval kernel up to its table cap.
    k1 = "row-masked-q kernel" if dtype == jnp.int8 else "SMEM kernel"
    if "--fragmented" in sys.argv:
        iv1 = corpus._segment_intervals({"podcast"})
        res_s = bench(
            f"scoped exact (podcast: {len(iv1)} intervals, {k1})",
            lambda: corpus.search(q, k=K, conversations=["podcast"]),
        )
        assert all(h.conversation == "podcast" for row in res_s for h in row)
        # podcast+wiki segments are never adjacent (a mailbox segment sits
        # between them), so the merged table keeps all 16 intervals —
        # past the SMEM kernel's cap, onto the row-masked kernel.
        iv2 = corpus._segment_intervals({"podcast", "wiki"})
        res_2 = bench(
            f"scoped exact (2 names: {len(iv2)} intervals, row-masked kernel)",
            lambda: corpus.search(q, k=K, conversations=["podcast", "wiki"]),
        )
        assert all(
            h.conversation in ("podcast", "wiki") for row in res_2 for h in row
        )
        log(f"scoped host work: intervals tables {iv1.nbytes}/{iv2.nbytes} bytes")
    else:
        res_s = bench(
            "scoped exact (podcast: 2 intervals, 6.5M rows)",
            lambda: corpus.search(q, k=K, conversations=["podcast"]),
        )
        assert all(h.conversation == "podcast" for row in res_s for h in row)
        iv = corpus._segment_intervals({"podcast"})
        log(f"scoped host work: intervals table {iv.tolist()} ({iv.nbytes} bytes)")

    # Self-match probe through the scoped path (scope = the probe row's
    # own conversation, whichever segment layout is active).
    probe_ordinal = sum(n for _, n in segs) // 2 + 123
    offset, owner = 0, None
    for name, n in segs:
        if offset <= probe_ordinal < offset + n:
            owner = name
            break
        offset += n
    probe_row = np.asarray(
        corpus._store.get_row(probe_ordinal), dtype=np.float32
    ).reshape(1, -1)
    hit = corpus.search(probe_row, k=1, conversations=[owner])[0][0]
    log(f"scoped self-match: global_ordinal={hit.global_ordinal} "
        f"({hit.conversation}/{hit.local_ordinal}) score={hit.score:.4f}")
    assert hit.global_ordinal == probe_ordinal and hit.conversation == owner


if __name__ == "__main__":
    main()
