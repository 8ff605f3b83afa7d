"""IVF engine probe on the real chip: build + latency/recall/cert sweep.

Corpus: CLUSTERED bf16 rows (1000 topic clusters, sigma 0.35, 10% isotropic
background — the structure real text-embedding corpora have; isotropic
random is the provable worst case where no sublinear method reaches recall
0.99: NOTES.md round-4 records the simulation). Queries are topic queries
(cluster rows + noise); a separate background-derived batch reports the
adversarial case. Interleaves the full-scan engines on the SAME data for an
apples-to-apples ratio. R=64 query batches per dispatch so tunnel
round-trip amortization (~25-60 ms per dispatch) doesn't read as kernel
time. Above 2M rows the oracle is the exact scan of the bf16 store itself
(an f32 copy would not fit next to it).

Run: python tools/tpu_ivf_probe.py [--rows 1e6|1e7] [--bg 0.1]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from typeagent_tpu.ops import topk as T
from typeagent_tpu.ops.ivf import ivf_build, ivf_topk_program

D, BATCH, K, R = 384, 256, 10, 64


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1e6)
    ap.add_argument(
        "--clusters", type=int, default=0,
        help="0 = auto: max(1000, rows // 1000) — real corpora grow topics "
             "with size; a flat 1000 giant noise-clusters at 10M rows has "
             "no sub-cluster structure for ANY method to exploit",
    )
    ap.add_argument("--sigma", type=float, default=0.35)
    ap.add_argument("--bg", type=float, default=0.1)
    ap.add_argument("--outlier-frac", type=float, default=0.1)
    ap.add_argument(
        "--rows-per-cluster", type=int, default=0,
        help="0 = auto: 512, or 1024 above 2M rows (halves the cluster-"
             "alignment padding next to a near-HBM-capacity store)",
    )
    args = ap.parse_args()
    n = int(args.rows)
    if not args.clusters:
        args.clusters = max(1000, n // 1000)
    n_pad = -(-n // 1024) * 1024
    big = n > 2_000_000
    log("devices:", jax.devices(), "rows:", n, "bg:", args.bg)

    t0 = time.perf_counter()

    @jax.jit
    def gen(key):
        kc, ka, kq, kqn, kbq = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (args.clusters, D), dtype=jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)

        def rows_chunk(ck, m):
            k1, k2, k3 = jax.random.split(ck, 3)
            labels = jax.random.randint(k1, (m,), 0, args.clusters)
            e = centers[labels] + args.sigma * jax.random.normal(
                k2, (m, D), dtype=jnp.float32
            ) / jnp.sqrt(D * 1.0)
            if args.bg > 0:
                bg = jax.random.normal(k3, (m, D), dtype=jnp.float32)
                take = jax.random.uniform(jax.random.fold_in(k1, 7), (m,)) < args.bg
                e = jnp.where(take[:, None], bg, e)
            e /= jnp.linalg.norm(e, axis=1, keepdims=True)
            return e.astype(jnp.bfloat16)

        chunk = 524_288
        n_chunks = -(-n_pad // chunk)
        emb = jax.lax.map(
            lambda ck: rows_chunk(ck, chunk), jax.random.split(ka, n_chunks)
        ).reshape(n_chunks * chunk, D)[:n_pad]

        # Topic queries: cluster centers + within-cluster-scale noise.
        ci = jax.random.randint(kq, (R, BATCH), 0, args.clusters)
        qs = centers[ci] + 0.45 * jax.random.normal(
            kqn, (R, BATCH, D), dtype=jnp.float32
        ) / jnp.sqrt(D * 1.0)
        qs /= jnp.linalg.norm(qs, axis=2, keepdims=True)
        # Adversarial batch: isotropic (background-like) queries.
        qbg = jax.random.normal(kbq, (1, BATCH, D), dtype=jnp.float32)
        qbg /= jnp.linalg.norm(qbg, axis=2, keepdims=True)
        return emb, qs, qbg

    emb, many, many_bg = jax.block_until_ready(gen(jax.random.PRNGKey(11)))
    log(f"data gen: {time.perf_counter() - t0:.1f}s")
    emb_f32 = None if big else emb.astype(jnp.float32)

    count = jnp.asarray(n, jnp.int32)

    t0 = time.perf_counter()
    rpc = args.rows_per_cluster or (1024 if n > 2_000_000 else 512)
    state = ivf_build(
        emb, n, outlier_frac=args.outlier_frac, rows_per_cluster=rpc
    )
    jax.block_until_ready(state.emb_r)
    rad = np.asarray(state.radius)
    rad = rad[rad > -1e4]
    log(
        f"ivf build: {time.perf_counter() - t0:.1f}s  nb={state.n_buckets}  "
        f"in={int(state.count_in)} out={int(state.count_out)}  "
        f"radius p50={np.median(rad):.3f} p95={np.percentile(rad, 95):.3f}"
    )

    def make(fn):
        @jax.jit
        def prog(qs, *arrs):
            return jax.lax.map(lambda q: fn(q, *arrs), qs)
        return prog

    st = tuple(state)
    oracle_arrs = (emb,) if big else (emb_f32,)
    progs = {
        "fullscan-approx995": (
            make(lambda q, e: T.cosine_topk_approx(e, q, count, K, recall_target=0.995)),
            (emb,),
        ),
        "fullscan-exact2-bf16": (
            make(lambda q, e: T.topk_program_exact2(e, q, count, K)),
            (emb,),
        ),
        "oracle-exact1": (
            make(lambda q, e: T.topk_program(e, q, count, K)), oracle_arrs
        ),
    }
    for B in (8, 12, 16, 24):
        progs[f"ivf-B{B}"] = (
            make(lambda q, *s, B=B: ivf_topk_program(*s, q, K, B=B)), st
        )

    outs, times = {}, {}
    for name, (prog, arrs) in progs.items():
        t0 = time.perf_counter()
        out = prog(many, *arrs)
        np.asarray(jax.tree.leaves(out)[0])
        log(f"warmup {name}: {time.perf_counter() - t0:.1f}s")
        times[name] = float("inf")
        outs[name] = out
    for _ in range(3):
        for name, (prog, arrs) in progs.items():
            t0 = time.perf_counter()
            out = prog(many, *arrs)
            np.asarray(jax.tree.leaves(out)[0])
            times[name] = min(times[name], time.perf_counter() - t0)
            outs[name] = out

    oracle_leaves = jax.tree.leaves(outs["oracle-exact1"])
    oracle = np.asarray(oracle_leaves[1]).reshape(-1, K)
    oracle_vals = np.asarray(oracle_leaves[0]).reshape(-1, K)
    for name, dt in times.items():
        leaves = jax.tree.leaves(outs[name])
        idx = np.asarray(leaves[1]).reshape(-1, K)
        rec = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(idx, oracle)
        ])
        cert = ""
        if len(leaves) > 2:
            cert = f"  cert={np.asarray(leaves[2]).mean():.3f}"
        # Id-recall undercounts when bf16 scores TIE at the k-th boundary
        # and engines break ties differently; score-recall is the
        # tie-insensitive measure (kth score >= oracle kth - eps).
        vals = np.asarray(leaves[0]).reshape(-1, K)
        srec = float(np.mean(vals[:, K - 1] >= oracle_vals[:, K - 1] - 1e-5))
        log(f"{name:22s}: {dt / R * 1e3:7.2f} ms/batch-{BATCH}  "
            f"({R * BATCH / dt:8.0f} QPS)  recall@{K}={rec:.4f} "
            f"score-recall={srec:.4f}{cert}")

    # Adversarial isotropic queries: one batch, recall + cert only.
    prog_o, arrs_o = progs["oracle-exact1"]
    obg = np.asarray(jax.tree.leaves(prog_o(many_bg, *arrs_o))[1]).reshape(-1, K)
    for B in (16, 24):
        prog_i, arrs_i = progs[f"ivf-B{B}"]
        leaves = jax.tree.leaves(prog_i(many_bg, *arrs_i))
        ibg = np.asarray(leaves[1]).reshape(-1, K)
        rec = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(ibg, obg)
        ])
        log(f"bg-queries ivf-B{B}: recall@{K}={rec:.4f} "
            f"cert={np.asarray(leaves[2]).mean():.3f} "
            f"(isotropic queries — the honest worst case)")


if __name__ == "__main__":
    main()
