"""IVF engine probe on the real chip: build + latency/recall/cert sweep.

1M x 384 bf16 CLUSTERED corpus (1000 topic clusters, sigma 0.35, 10%
isotropic background — the structure real text-embedding corpora have;
isotropic random is the provable worst case where no sublinear method
reaches recall 0.99: tools-side sim in NOTES.md round-4). Interleaves the
full-scan approx engine on the SAME data for an apples-to-apples ratio.

Run: python tools/tpu_ivf_probe.py [--rows 1e6]
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

D, BATCH, K, R = 384, 256, 10, 16


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1e6)
    ap.add_argument("--clusters", type=int, default=1000)
    ap.add_argument("--sigma", type=float, default=0.35)
    args = ap.parse_args()
    n = int(args.rows)
    n_pad = -(-n // 1024) * 1024
    log("devices:", jax.devices(), "rows:", n, "pad:", n_pad)

    t0 = time.perf_counter()

    @jax.jit
    def gen(key):
        kc, ka, kn, kq, kqn, kbg = jax.random.split(key, 6)
        centers = jax.random.normal(kc, (args.clusters, D), dtype=jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        labels = jax.random.randint(ka, (n_pad,), 0, args.clusters)
        emb = centers[labels] + args.sigma * jax.random.normal(
            kn, (n_pad, D), dtype=jnp.float32
        ) / jnp.sqrt(D * 1.0)
        # 10% isotropic background rows
        bg = jax.random.normal(kbg, (n_pad, D), dtype=jnp.float32)
        take_bg = jax.random.uniform(jax.random.fold_in(ka, 1), (n_pad,)) < 0.1
        emb = jnp.where(take_bg[:, None], bg, emb)
        emb /= jnp.linalg.norm(emb, axis=1, keepdims=True)
        # queries near the data (realistic) in R batches
        qi = jax.random.randint(kq, (R, BATCH), 0, n)
        qs = emb[qi] + 0.45 * jax.random.normal(
            kqn, (R, BATCH, D), dtype=jnp.float32
        ) / jnp.sqrt(D * 1.0)
        qs /= jnp.linalg.norm(qs, axis=2, keepdims=True)
        return emb, qs

    emb_f32, many = jax.block_until_ready(gen(jax.random.PRNGKey(11)))
    emb = emb_f32.astype(jnp.bfloat16)
    log(f"data gen: {time.perf_counter() - t0:.1f}s")

    count = jnp.asarray(n, jnp.int32)

    t0 = time.perf_counter()
    state = ivf_build(emb, n)
    jax.block_until_ready(state.emb_r)
    log(f"ivf build: {time.perf_counter() - t0:.1f}s  nb={state.n_buckets}  "
        f"radius p50={float(jnp.median(state.radius)):.3f} "
        f"p95={float(jnp.percentile(state.radius, 95)):.3f}")

    def make(fn):
        @jax.jit
        def prog(qs, *arrs):
            return jax.lax.map(lambda q: fn(q, *arrs), qs)
        return prog

    st = (state.emb_r, state.perm, state.centroids, state.radius, state.count)
    progs = {
        "fullscan-approx995": (
            make(lambda q, e: T.cosine_topk_approx(e, q, count, K, recall_target=0.995)),
            (emb,),
        ),
        "exact1-f32(oracle)": (
            make(lambda q, e: T.topk_program(e, q, count, K)), (emb_f32,)
        ),
    }
    for B in (8, 12, 16, 24):
        progs[f"ivf-cert-B{B}"] = (
            make(lambda q, *s, B=B: ivf_topk_program(*s, q, K, B=B)), st
        )
        progs[f"ivf-B{B}"] = (
            make(lambda q, *s, B=B: ivf_topk_program(*s, q, K, B=B, use_radius=False)),
            st,
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

    oracle = np.asarray(jax.tree.leaves(outs["exact1-f32(oracle)"])[1]).reshape(-1, K)
    for name, dt in times.items():
        leaves = jax.tree.leaves(outs[name])
        idx = np.asarray(leaves[1]).reshape(-1, K)
        rec = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K for a, b in zip(idx, oracle)
        ])
        cert = ""
        if len(leaves) > 2:
            cert = f"  cert={np.asarray(leaves[2]).mean():.3f}"
        log(f"{name:22s}: {dt / R * 1e3:7.2f} ms/batch-{BATCH}  "
            f"({R * BATCH / dt:8.0f} QPS)  recall@{K}={rec:.4f}{cert}")


if __name__ == "__main__":
    main()
