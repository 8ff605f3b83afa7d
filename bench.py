"""Headline benchmark: cosine top-10 QPS at 1M fragments (dim 384).

Baseline (BASELINE.md, measured on this machine): the reference's
fuzzy_lookup_embedding kernel (serial numpy, 1 thread) at 1M x 384 runs at
178 ms/query ~= 5.6 QPS. This benchmark builds the store ON DEVICE (the 1.5 GB
matrix never crosses the host<->device tunnel) and reports steady-state QPS
for every search engine the store ships:

  * exact1        — one-phase fused Pallas matmul+top-k (strict parity mode)
  * exact2        — two-phase: bucket-select at the matmul floor + certified
                    exact rescore (the default engine at this scale)
  * exact2h (f32) — bf16-shadow selection + exact f32 rescore: recall 1.0
                    against the f32 oracle (the exact-parity number)
  * bucket-approx — fused per-bucket argmax (recall ~0.999)
  * approx        — XLA hardware approx_max_k (recall ~recall_target)
  * int8          — quantized store, fused kernel

Headline: the fastest mode with in-run recall@10 >= 0.99 against the exact
f32 oracle; the exact-parity (recall 1.0) QPS is stated alongside in the
metric. Warmup is itemized (data-gen / trace+lower / compile / first-run)
because the remote compile service behind the tunnel intermittently stalls
for minutes — the itemization shows where the time went.

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
R = 20  # query batches per device-resident dispatch
BASELINE_QPS = 1000.0 / 178.0  # 178 ms/query single-thread numpy (BASELINE.md)
RECALL_BAR = 0.99


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.ops import topk as T
    from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings, VectorStore

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    log(f"imports+backend init: {time.perf_counter() - t_start:.1f}s")

    # -- on-device data generation (no host detour) -------------------------
    t0 = time.perf_counter()

    @jax.jit
    def gen_data(key):
        ke, kq, km = jax.random.split(key, 3)
        emb = jax.random.normal(ke, (N_ROWS, DIM), dtype=jnp.float32)
        emb /= jnp.linalg.norm(emb, axis=1, keepdims=True)
        qs = jax.random.normal(kq, (R, BATCH, DIM), dtype=jnp.float32)
        qs /= jnp.linalg.norm(qs, axis=2, keepdims=True)
        return emb, qs

    rows_f32, many = gen_data(jax.random.PRNGKey(7))
    rows_f32.block_until_ready()
    log(f"on-device data gen: {time.perf_counter() - t0:.1f}s")

    def build_store(dtype):
        settings = TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(DIM),
            min_score=0.0,
            dtype=dtype,
        )
        store = VectorStore(settings)
        store.load_device_rows(rows_f32)
        return store

    t0 = time.perf_counter()
    stores = {d: build_store(d) for d in ("bfloat16", "float32", "int8")}
    jax.block_until_ready(stores["int8"]._buf)
    log(f"store builds (cast/quantize, on device): {time.perf_counter() - t0:.1f}s")

    # First Pallas lower/compile does a one-time backend RPC round; the
    # tunnel intermittently stalls for minutes and the stall lands on
    # whichever device call runs first (BENCH_r03 lost 503 s to one).
    # Mitigation: warm the remote compile path in a SUBPROCESS with a hard
    # timeout + retries — a fresh process opens a fresh tunnel stream,
    # which is what unwedges a stalled one, and its compile lands in the
    # persistent cache so the parent's own probe is a cache hit.
    import subprocess

    probe_src = (
        "import jax, jax.numpy as jnp; import sys; sys.path.insert(0, '.');"
        "from typeagent_tpu.ops import topk as T;"
        f"e = jnp.zeros((256, {DIM}), dtype=jnp.bfloat16);"
        f"q = jnp.zeros((8, {DIM}), dtype=jnp.float32);"
        "c = jnp.asarray(256, dtype=jnp.int32);"
        "jax.jit(lambda e, q: T.topk_program(e, q, c, 5)).lower(e, q).compile();"
        "print('probe ok')"
    )
    t0 = time.perf_counter()
    for attempt in range(3):
        try:
            subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=120,
                check=True,
                capture_output=True,
            )
            break
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            log(f"backend probe attempt {attempt + 1} failed ({type(e).__name__}); retrying")
    t_sub = time.perf_counter() - t0
    t0 = time.perf_counter()
    tiny_e = jnp.zeros((256, DIM), dtype=jnp.bfloat16)
    tiny_q = jnp.zeros((8, DIM), dtype=jnp.float32)
    tiny_c = jnp.asarray(256, dtype=jnp.int32)
    jax.jit(lambda e, q: T.topk_program(e, q, tiny_c, 5)).lower(
        tiny_e, tiny_q
    ).compile()
    log(
        f"backend probe: subprocess warm {t_sub:.1f}s (bounded, retried), "
        f"in-process {time.perf_counter() - t0:.1f}s"
    )

    count = jnp.asarray(N_ROWS, dtype=jnp.int32)
    bf16 = stores["bfloat16"]._buf
    f32 = stores["float32"]._buf
    i8, i8_scales = stores["int8"]._buf, stores["int8"]._scales

    # -- engine programs (R batches per dispatch; steady-state throughput).
    # Buffers are ARGUMENTS, never closures: a captured device array embeds
    # as an HLO constant and the 1.5 GB matrix overflows the remote compile
    # service's request limit.
    def make_prog(fn, *bufs):
        @jax.jit
        def prog(qs, *arrs):
            return jax.lax.map(lambda q: fn(q, *arrs), qs)

        return prog, bufs

    progs = {
        "exact1-bf16": make_prog(
            lambda q, e: T.topk_program(e, q, count, K), bf16
        ),
        "exact2-bf16": make_prog(
            lambda q, e: T.topk_program_exact2(e, q, count, K, slack=6), bf16
        ),
        "bucket-approx-bf16": make_prog(
            lambda q, e: T.cosine_topk_bucket(e, q, count, K), bf16
        ),
        "approx-rt995-bf16": make_prog(
            lambda q, e: T.cosine_topk_approx(e, q, count, K, recall_target=0.995),
            bf16,
        ),
        "exact1-f32": make_prog(
            lambda q, e: T.topk_program(e, q, count, K), f32
        ),
        "exact2h-f32": make_prog(
            lambda q, e, s: T.topk_program_exact2_hybrid(e, s, q, count, K),
            f32,
            bf16,
        ),
        "int8": make_prog(
            lambda q, e, s: T.topk_program_quantized(e, s, q, count, K),
            i8,
            i8_scales,
        ),
    }

    # -- warmup (itemized): lower/compile/first-run per engine --------------
    for name, (prog, bufs) in progs.items():
        t0 = time.perf_counter()
        lowered = prog.lower(many, *bufs)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(many, *bufs)
        np.asarray(jax.tree.leaves(out)[0])
        t_first = time.perf_counter() - t0
        progs[name] = (compiled, bufs)
        log(
            f"warmup {name}: lower {t_lower:.1f}s, compile {t_compile:.1f}s "
            f"(persistent-cache {'hit' if t_compile < 15 else 'MISS'}), "
            f"first run {t_first:.1f}s"
        )
    log(f"total warmup+build: {time.perf_counter() - t_start:.1f}s")

    # -- timed runs, interleaved (tunnel throughput varies within a session) --
    timings = {name: float("inf") for name in progs}
    outputs = {}
    for _ in range(3):
        for name, (compiled, bufs) in progs.items():
            t0 = time.perf_counter()
            out = compiled(many, *bufs)
            np.asarray(jax.tree.leaves(out)[0])
            timings[name] = min(timings[name], time.perf_counter() - t0)
            outputs[name] = out

    oracle_idx = np.asarray(jax.tree.leaves(outputs["exact1-f32"])[1]).reshape(-1, K)

    def recall_vs_oracle(name):
        idx = np.asarray(jax.tree.leaves(outputs[name])[1]).reshape(-1, K)
        return float(
            np.mean(
                [
                    len(set(a.tolist()) & set(b.tolist())) / K
                    for a, b in zip(idx, oracle_idx)
                ]
            )
        )

    rates = {}
    for name, elapsed in timings.items():
        qps = R * BATCH / elapsed
        rec = recall_vs_oracle(name)
        leaves = jax.tree.leaves(outputs[name])
        cert = np.asarray(leaves[2]).all() if len(leaves) > 2 else None
        rates[name] = (qps, rec)
        cert_s = "" if cert is None else f", cert_all={bool(cert)}"
        log(
            f"{name}: {elapsed / R * 1000:.2f} ms/batch-{BATCH}, {qps:.0f} QPS, "
            f"recall@{K} vs f32 oracle: {rec:.4f}{cert_s}"
        )

    exact_parity_qps, exact_parity_recall = rates["exact2h-f32"]
    assert exact_parity_recall == 1.0, (
        "exact2h must reproduce the f32 oracle exactly",
        exact_parity_recall,
    )

    # -- headline (printed BEFORE the serving ladder: the tunnel stalls for
    # minutes at a time, and a stall inside the serving section must not
    # cost the recorded result) --------------------------------------------
    eligible = {n: (q, r) for n, (q, r) in rates.items() if r >= RECALL_BAR}
    mode, (best_qps, best_recall) = max(eligible.items(), key=lambda kv: kv[1][0])
    log(
        f"headline mode: {mode} ({best_qps:.0f} QPS, recall {best_recall:.4f}); "
        f"exact-parity (recall 1.0): exact2h-f32 {exact_parity_qps:.0f} QPS"
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"cosine top-{K} QPS ({mode}, recall@{K}>={RECALL_BAR} vs "
                    f"exact f32 oracle, measured {best_recall:.3f}; "
                    f"exact-parity recall-1.0 mode: {exact_parity_qps:.0f} QPS), "
                    f"{N_ROWS // 1000}k x {DIM} fragments, batch {BATCH}"
                ),
                "value": round(best_qps, 1),
                "unit": "QPS",
                "vs_baseline": round(best_qps / BASELINE_QPS, 1),
            }
        ),
        flush=True,
    )

    # -- serving-path measurements (host round trips through the tunnel) ----
    # Variance protocol (tunnel throughput swings ±40% between sessions and
    # drifts WITHIN one): every rung runs once per round, rounds interleave
    # all rungs A/B/C/D, and the recorded figure is the MEDIAN across
    # rounds with per-request p50/p99 latency from the metrics registry.
    import asyncio
    import statistics

    from typeagent_tpu.serve import LookupBatcher
    from typeagent_tpu.utils.metrics import MetricsRegistry

    store = stores["bfloat16"]
    queries_host = np.asarray(many[0])
    many_host = np.asarray(many)
    n_stream = 3 * R

    @jax.jit
    def rtt_probe(x):
        return x + 1

    np.asarray(rtt_probe(jnp.zeros((8, 8))))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(rtt_probe(jnp.zeros((8, 8))))
    rtt_ms = (time.perf_counter() - t0) / 5 * 1000
    log(f"tunnel round-trip (tiny dispatch + fetch): {rtt_ms:.1f} ms")

    reg = MetricsRegistry()

    def rung_sync():
        """One dispatch per batch, sequential (the no-concurrency floor)."""
        for _ in range(R):
            with reg.timer("sync"):
                store.fuzzy_lookup_embeddings_batch(queries_host, max_hits=K)
        return R * BATCH

    def rung_pipelined():
        """Independent requests, coalescing OFF, 2 dispatches in flight —
        upload/compute/download overlap only."""

        async def run():
            batcher = LookupBatcher(
                store, max_delay_ms=0.0, max_coalesce=1, max_inflight=2
            )

            async def one(i):
                with reg.timer("pipelined"):
                    return await batcher.lookup(many_host[i], max_hits=K)

            await asyncio.gather(*(one(i) for i in range(R)))
            await batcher.close()

        asyncio.run(run())
        return R * BATCH

    def rung_coalesced():
        """R waiting batches fused into ONE dispatch."""
        with reg.timer("coalesced"):
            res = store.fuzzy_lookup_embeddings_many(many_host, max_hits=K)
        assert len(res) == R and len(res[0]) == BATCH
        return R * BATCH

    def rung_stream():
        """Sustained independent-request stream, coalesce 8 × inflight 3 —
        what a loaded server sustains."""

        async def run():
            batcher = LookupBatcher(
                store, max_delay_ms=0.0, max_coalesce=8, max_inflight=3
            )
            sem = asyncio.Semaphore(24)

            async def one(i):
                async with sem:
                    with reg.timer("stream"):
                        return await batcher.lookup(many_host[i % R], max_hits=K)

            await asyncio.gather(*(one(i) for i in range(n_stream)))
            await batcher.close()

        asyncio.run(run())
        return n_stream * BATCH

    rungs = {
        "sync": rung_sync,
        "pipelined-x2": rung_pipelined,
        f"coalesced-x{R}": rung_coalesced,
        "stream-x60 (coalesce 8, inflight 3)": rung_stream,
    }
    for fn in rungs.values():  # warm (trace/compile outside the timed rounds)
        fn()
    reg.latencies.clear()

    rounds = 5
    round_qps: dict[str, list[float]] = {name: [] for name in rungs}
    for _ in range(rounds):
        for name, fn in rungs.items():
            t0 = time.perf_counter()
            n_q = fn()
            round_qps[name].append(n_q / (time.perf_counter() - t0))

    timer_key = {
        "sync": "sync",
        "pipelined-x2": "pipelined",
        f"coalesced-x{R}": "coalesced",
        "stream-x60 (coalesce 8, inflight 3)": "stream",
    }
    sync_median = statistics.median(round_qps["sync"])
    serving = {}
    for name in rungs:
        qps_med = statistics.median(round_qps[name])
        s = reg.stats(timer_key[name])
        lat = (
            f"req p50 {s.p50_ms:.1f} ms, p99 {s.p99_ms:.1f} ms"
            if s
            else "n/a"
        )
        serving[name] = {
            "qps_median": round(qps_med),
            "qps_rounds": [round(x) for x in round_qps[name]],
            "p50_ms": round(s.p50_ms, 1) if s else None,
            "p99_ms": round(s.p99_ms, 1) if s else None,
        }
        log(
            f"served {name}: median {qps_med:.0f} QPS over {rounds} "
            f"interleaved rounds ({qps_med / sync_median:.1f}x sync; {lat}; "
            f"rounds: {[f'{x / 1000:.1f}k' for x in round_qps[name]]})"
        )
    log("serving summary json: " + json.dumps(serving))


if __name__ == "__main__":
    main()
