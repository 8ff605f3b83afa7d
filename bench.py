"""Headline benchmark: cosine top-10 QPS on one v5e chip.

Baseline (BASELINE.md, measured on this machine): the reference's
fuzzy_lookup_embedding kernel (serial numpy, 1 thread) at 1M x 384 runs at
178 ms/query ~= 5.6 QPS; at 10M it extrapolates to 0.56 QPS (the scan is
linear in rows). Stores build ON DEVICE (matrices never cross the
host<->device tunnel). Three sections:

**A. Isotropic 1M x 384** (the series-comparable section; random unit rows
are the information-theoretic worst case — no pruning can help, so this
measures the full-scan wall honestly):

  * exact1        — one-phase fused Pallas matmul+top-k (strict parity mode)
  * exact2        — two-phase: bucket-select at the matmul floor + certified
                    exact rescore (the default engine at this scale)
  * exact2h (f32) — bf16-shadow selection + exact f32 rescore: recall 1.0
                    against the f32 oracle (the exact-parity number)
  * bucket-approx — fused per-bucket argmax (recall ~0.999)
  * approx        — XLA hardware approx_max_k (recall ~recall_target)
  * int8          — quantized store, fused kernel

  Measured wall (NOTES.md round-4 roofline): at batch 256 every full-scan
  engine sits at the chip's compute/bandwidth balance point (~62-80
  TFLOP/s effective == ~310 GB/s), so ~90-105k QPS is the physical ceiling
  here for ANY dense method, at any batch size (probed to 2048).

**B. Clustered 10M x 384 bf16** (7.7 GB in HBM — the realistic regime:
text-embedding corpora are clustered; 10k topics + 2% isotropic
background): the device IVF engine (learned buckets + exact outlier tail +
per-query exactness certificate, ops/ivf.py) against the full-scan engines
on the SAME data, recall vs the certified exact scan of the store. This is
where pruning breaks the full-scan wall — the win scales with rows.
Also: device bulk-ingest rate at 10M and an append crossing a
capacity-doubling boundary (measured in section A's 1M store).

**C. Serving ladder** (host round trips through the tunnel): sync /
pipelined / coalesced / sustained-stream, interleaved-median QPS with
p50/p99 request latency.

Headline: the fastest mode with in-run recall@10 >= 0.99 against the
section's exact oracle, across sections A and B (the metric string names
the section, corpus and scale; vs_baseline uses that section's numpy
rate). The exact-parity (recall 1.0) QPS is stated alongside. Warmup is
itemized (data-gen / trace+lower / compile / first-run) because the remote
compile service behind the tunnel intermittently stalls for minutes — the
itemization shows where the time went.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra detail goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# TAT_BENCH_SCALE shrinks every section for CPU smoke validation of the
# benchmark's own code paths (CI uses ~0.01); the driver runs at 1.0.
_SCALE = float(os.environ.get("TAT_BENCH_SCALE", "1"))
N_ROWS = max(int(1_000_000 * _SCALE) // 1024 * 1024, 4096)
DIM = 384
BATCH = 256
K = 10
R = 20  # query batches per device-resident dispatch
BASELINE_QPS = 1000.0 / 178.0 / _SCALE  # 178 ms/query single-thread numpy
# at 1M rows (BASELINE.md); the scan is linear in rows.
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

    def build_store(dtype, rows="default"):
        settings = TextEmbeddingIndexSettings(
            embedding_model=create_test_embedding_model(DIM),
            min_score=0.0,
            dtype=dtype,
        )
        store = VectorStore(settings)
        if rows is not None:
            store.load_device_rows(rows_f32 if rows == "default" else rows)
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
    for attempt in range(3 if jax.default_backend() == "tpu" else 0):
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

    # -- append across a capacity-doubling boundary (the real ingest path:
    # reserve + in-place donated device update) on the 1M bf16 store --------
    store_a = stores["bfloat16"]
    grow = np.asarray(many[0], dtype=np.float32)  # 256 rows
    cap_before = store_a._buf.shape[0]
    t0 = time.perf_counter()
    n_boundary = 0
    # Appends stage in the host shadow until a flush; flushing each batch
    # measures the real device-append path (donated in-place update, and
    # the grow-copy when the watermark crosses capacity).
    while store_a._buf.shape[0] == cap_before:
        store_a.add_embeddings(None, grow)
        store_a._flush()
        n_boundary += len(grow)
    np.asarray(store_a._buf[:1])  # sync (block_until_ready is a no-op here)
    t_boundary = time.perf_counter() - t0
    log(
        f"append across capacity boundary ({cap_before} -> "
        f"{store_a._buf.shape[0]} rows): {n_boundary} rows in "
        f"{t_boundary:.2f}s ({n_boundary / t_boundary:.0f} rows/s incl. the "
        f"grow-copy)"
    )

    # ===== Section B: clustered 10M x 384 bf16 + device IVF =================
    # Free section A's big buffers first (the 10M section peaks ~15.4 GB of
    # the chip's 16 GB); the serving ladder rebuilds the 1M bf16 store.
    def free_store(s):
        for attr in ("_buf", "_scales", "_shadow"):
            a = getattr(s, attr, None)
            if a is not None and hasattr(a, "delete"):
                a.delete()

    for s in stores.values():
        free_store(s)
    stores.clear()
    outputs.clear()
    progs.clear()
    rows_f32.delete()

    SIGMA_C, BG_C = 0.35, 0.02
    b_results: dict[str, dict] = {}
    b_desc: dict[str, str] = {}
    ingest_rate = None

    def run_clustered(
        tag: str,
        n_rows: int,
        clusters: int,
        r_batches: int,
        outlier_frac: float,
        rows_per_cluster: int,
        seed: int,
        measure_ingest: bool,
        cleanup: list,
    ):
        """One clustered-corpus scale: gen -> (ingest) -> ivf build ->
        engines vs the exact scan. Results land in b_results; every device
        allocation is appended to ``cleanup`` (freed by the caller)."""
        nonlocal ingest_rate
        from typeagent_tpu.ops.ivf import ivf_build, ivf_topk_program

        n_pad_c = -(-n_rows // 1024) * 1024
        chunk = min(524_288, n_pad_c)
        n_chunks = -(-n_pad_c // chunk)

        @jax.jit
        def gen_c(key):
            kc, kr, kq = jax.random.split(key, 3)
            centers = jax.random.normal(kc, (clusters, DIM), dtype=jnp.float32)
            centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)

            def one_chunk(ck):
                k1, k2, k3 = jax.random.split(ck, 3)
                labels = jax.random.randint(k1, (chunk,), 0, clusters)
                e = centers[labels] + SIGMA_C * jax.random.normal(
                    k2, (chunk, DIM), dtype=jnp.float32
                ) / jnp.sqrt(DIM * 1.0)
                bg = jax.random.normal(k3, (chunk, DIM), dtype=jnp.float32)
                take = jax.random.uniform(jax.random.fold_in(k1, 7), (chunk,)) < BG_C
                e = jnp.where(take[:, None], bg, e)
                e /= jnp.linalg.norm(e, axis=1, keepdims=True)
                return e.astype(jnp.bfloat16)

            rows_c = jax.lax.map(
                one_chunk, jax.random.split(kr, n_chunks)
            ).reshape(n_chunks * chunk, DIM)[:n_rows]
            # Topic queries: corpus-like rows (what users ask about). The
            # isotropic-query adversarial case is in tools/tpu_ivf_probe.py.
            kl, kn = jax.random.split(kq)
            qlab = jax.random.randint(kl, (r_batches * BATCH,), 0, clusters)
            q_c = centers[qlab] + SIGMA_C * jax.random.normal(
                kn, (r_batches * BATCH, DIM), dtype=jnp.float32
            ) / jnp.sqrt(DIM * 1.0)
            q_c /= jnp.linalg.norm(q_c, axis=1, keepdims=True)
            return rows_c, q_c.reshape(r_batches, BATCH, DIM)

        # Everything allocated here frees in the caller's finally — a
        # failed section must not leave GBs resident for the sections
        # after it (the serving ladder OOMed on exactly that).
        t0 = time.perf_counter()
        emb_c, many_c = gen_c(jax.random.PRNGKey(seed))
        cleanup.extend([emb_c, many_c])
        np.asarray(emb_c[:1, :1])
        log(f"{tag} clustered gen (on device, {n_chunks} chunks): "
            f"{time.perf_counter() - t0:.1f}s")

        if measure_ingest:
            # Device bulk ingest through the real store path (reserve +
            # cast + donated in-place update), streamed in ~1M-row chunks:
            # a single 10M-row ingest program crashes the remote TPU
            # compiler, and chunked is the realistic streaming shape.
            store_c = build_store("bfloat16", rows=None)
            cleanup.append(store_c)  # buffer freed even on mid-ingest failure
            # 262k-row chunks: the slice + pad transients of each chunk sit
            # on top of corpus + store (15.4 GB) — 1M-row chunks OOMed.
            ing_chunk = 262_144
            t0 = time.perf_counter()
            store_c.reserve(n_rows)
            for s0 in range(0, n_rows, ing_chunk):
                store_c.load_device_rows(
                    jax.lax.slice(
                        emb_c, (s0, 0), (min(s0 + ing_chunk, n_rows), DIM)
                    )
                )
            np.asarray(store_c._buf[:1, :1])
            t_ing = time.perf_counter() - t0
            ingest_rate = n_rows / t_ing
            log(f"{tag} device bulk ingest ({ing_chunk}-row chunks): "
                f"{t_ing:.1f}s ({ingest_rate / 1e6:.1f}M rows/s)")
            emb_c.delete()
            emb_b = store_c._buf
        else:
            emb_b = emb_c
        count_c = jnp.asarray(n_rows, dtype=jnp.int32)
        t0 = time.perf_counter()
        ivf = ivf_build(
            emb_b, n_rows, outlier_frac=outlier_frac,
            rows_per_cluster=rows_per_cluster,
        )
        cleanup.extend(list(ivf))
        np.asarray(ivf.emb_r[:1, :1])
        log(f"ivf build at {tag}: {time.perf_counter() - t0:.1f}s "
            f"(nb={ivf.n_buckets}, outliers={int(ivf.count_out)})")

        progs_b = {
            # exact1 is the oracle: the one-phase fused scan, exact by
            # construction. (exact2's certificate legitimately reports
            # False on near-tie clustered data — it is a tie-scope
            # statement, not an inexactness — so it cannot gate an oracle.)
            f"{tag}-exact1-bf16": make_prog(
                lambda q, e: T.topk_program(e, q, count_c, K), emb_b
            ),
            f"{tag}-exact2-bf16": make_prog(
                lambda q, e: T.topk_program_exact2(e, q, count_c, K, slack=6),
                emb_b,
            ),
            f"{tag}-approx-rt995": make_prog(
                lambda q, e: T.cosine_topk_approx(
                    e, q, count_c, K, recall_target=0.995
                ),
                emb_b,
            ),
        }
        use_pallas_b = jax.default_backend() == "tpu"
        for B_ivf in (8, 12, 16):
            progs_b[f"{tag}-ivf-B{B_ivf}"] = make_prog(
                lambda q, *st, _B=B_ivf: ivf_topk_program(
                    *st, q, K, B=_B, use_pallas=use_pallas_b
                ),
                *ivf,
            )

        outputs_b, timings_b = {}, {}
        for name, (prog, bufs) in progs_b.items():
            t0 = time.perf_counter()
            compiled = prog.lower(many_c, *bufs).compile()
            t_c = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = compiled(many_c, *bufs)
            np.asarray(jax.tree.leaves(out)[0])
            log(f"warmup {name}: lower+compile {t_c:.1f}s "
                f"(persistent-cache {'hit' if t_c < 15 else 'MISS'}), "
                f"first run {time.perf_counter() - t0:.1f}s")
            progs_b[name] = (compiled, bufs)
            outputs_b[name] = out
            timings_b[name] = float("inf")
        for _ in range(3):
            for name, (compiled, bufs) in progs_b.items():
                t0 = time.perf_counter()
                out = compiled(many_c, *bufs)
                np.asarray(jax.tree.leaves(out)[0])
                timings_b[name] = min(
                    timings_b[name], time.perf_counter() - t0
                )
                outputs_b[name] = out

        # Oracle: the exact one-phase scan of the bf16 store (an f32 copy
        # does not fit next to the 10M buffer; at 1M the store IS bf16).
        oracle_leaves = jax.tree.leaves(outputs_b[f"{tag}-exact1-bf16"])
        oracle_c = np.asarray(oracle_leaves[1]).reshape(-1, K)
        desc = (
            f"clustered {tag} x {DIM} bf16 ({clusters} topics, "
            f"{int(BG_C * 100)}% background, topic queries; recall vs "
            f"exact scan)"
        )
        for name, el in timings_b.items():
            leaves = jax.tree.leaves(outputs_b[name])
            idx = np.asarray(leaves[1]).reshape(-1, K)
            rec = float(
                np.mean(
                    [
                        len(set(a.tolist()) & set(bb.tolist())) / K
                        for a, bb in zip(idx, oracle_c)
                    ]
                )
            )
            cert = (
                float(np.asarray(leaves[2]).mean()) if len(leaves) > 2 else None
            )
            qps = r_batches * BATCH / el
            b_results[name] = {
                "qps": qps,
                "recall": rec,
                "baseline": BASELINE_QPS * 1_000_000 * _SCALE / n_rows,
            }
            b_desc[name] = desc
            log(
                f"{name}: {el / r_batches * 1000:.2f} ms/batch-{BATCH}, "
                f"{qps:.0f} QPS, recall@{K} vs certified-exact oracle: "
                f"{rec:.4f}"
                + (f", cert_frac={cert:.3f}" if cert is not None else "")
            )

    scales_c = [
        ("1M", max(int(1_000_000 * _SCALE) // 1024 * 1024, 8192),
         max(int(1_000 * _SCALE), 8), 20, 0.03, 512, 13, False),
        ("10M", max(int(10_000_000 * _SCALE) // 1024 * 1024, 8192),
         # rows_per_cluster 512: clusters (19.5k) must OUTNUMBER topics
         # (10k) ~2x or merged-topic buckets balloon the radii (recall
         # 0.9914 at 512 vs 0.955 at 768 vs 0.87 at 1024, measured). The
         # build pair (16.33e9 B next to the 7.7 GB store) fits since the
         # donated-table and freed-assignment fixes.
         # r_batches 20 (was 8): the attach's per-dispatch overhead is a
         # measured ~25 ms (noop probe, NOTES round-4) — at R=8 that is
         # 3.2 ms/batch of tunnel tax vs 1.25 at section A's R=20; equal R
         # keeps the scales comparable.
         max(int(10_000 * _SCALE), 16), 20, 0.03, 512, 11, True),
    ]
    for tag, n_c, cl_c, r_c, of_c, rpc_c, seed_c, ing_c in scales_c:
        cleanup: list = []
        try:
            run_clustered(
                tag, n_c, cl_c, r_c, of_c, rpc_c, seed_c, ing_c, cleanup
            )
        except Exception as e:  # noqa: BLE001
            log(f"clustered {tag} section FAILED (headline falls back): "
                f"{type(e).__name__}: {e}")
        finally:
            for thing in cleanup:
                arrs = (
                    [thing]
                    if hasattr(thing, "delete")
                    else [getattr(thing, a, None) for a in ("_buf", "_scales")]
                )
                for arr in arrs:
                    try:
                        arr.delete()
                    except Exception:  # noqa: BLE001 — deleted/None is fine
                        pass

    # -- headline (printed BEFORE the serving ladder: the tunnel stalls for
    # minutes at a time, and a stall inside the serving section must not
    # cost the recorded result) --------------------------------------------
    eligible = {n: (q, r) for n, (q, r) in rates.items() if r >= RECALL_BAR}
    mode_a, (qps_a, rec_a) = max(eligible.items(), key=lambda kv: kv[1][0])
    log(
        f"section A headline: {mode_a} ({qps_a:.0f} QPS, recall {rec_a:.4f}); "
        f"exact-parity (recall 1.0): exact2h-f32 {exact_parity_qps:.0f} QPS"
    )
    candidates = [
        {
            "name": mode_a,
            "qps": qps_a,
            "recall": rec_a,
            "desc": (
                f"isotropic {N_ROWS // 1000}k x {DIM} (full-scan worst case)"
            ),
            "baseline": BASELINE_QPS,
        }
    ]
    for name, rr in b_results.items():
        if rr["recall"] >= RECALL_BAR:
            candidates.append(
                {
                    "name": name,
                    "qps": rr["qps"],
                    "recall": rr["recall"],
                    "desc": b_desc[name],
                    # numpy extrapolates linearly in rows (178 ms/query/M).
                    "baseline": rr["baseline"],
                }
            )
    best = max(candidates, key=lambda c: c["qps"])
    log(f"headline: {best['name']} {best['qps']:.0f} QPS on {best['desc']}")
    ingest_s = (
        f"; 10M device ingest {ingest_rate / 1e6:.1f}M rows/s" if ingest_rate
        else ""
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"cosine top-{K} QPS ({best['name']}, batch {BATCH}, "
                    f"{best['desc']}, recall@{K}>={RECALL_BAR} measured "
                    f"{best['recall']:.3f}; isotropic-1M best: {mode_a} "
                    f"{qps_a:.0f} QPS; exact-parity recall-1.0 mode: "
                    f"exact2h-f32 {exact_parity_qps:.0f} QPS{ingest_s})"
                ),
                "value": round(best["qps"], 1),
                "unit": "QPS",
                "vs_baseline": round(best["qps"] / best["baseline"], 1),
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

    # Section A's buffers were freed for the 10M section; rebuild the 1M
    # bf16 store (same PRNG key -> identical rows, on-device). Retry with
    # backoff: right after a section OOM the backend can transiently
    # refuse allocations while freed buffers drain.
    for attempt in range(4):
        try:
            rows_again, _ = gen_data(jax.random.PRNGKey(7))
            store = build_store("bfloat16", rows=rows_again)
            rows_again.delete()
            break
        except Exception as e:  # noqa: BLE001
            log(f"serving store rebuild attempt {attempt + 1} failed "
                f"({type(e).__name__}); retrying in 10s")
            try:
                rows_again.delete()
            except Exception:  # noqa: BLE001 — may not exist yet
                pass
            time.sleep(10)
    else:
        raise RuntimeError("serving store rebuild failed after retries")
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
