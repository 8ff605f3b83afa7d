"""Phase breakdown of the IVF query path on the real chip.

Builds the bench's clustered corpus (default 10M x 384 bf16, 10k topics,
2% background) + IVF index, then times jitted sub-programs that cover
successively more of ivf_topk. Every phase lax.maps over R query batches
inside ONE dispatch — a single-batch dispatch is swamped by the ~30-60 ms
tunnel round trip (first probe draft measured 26 ms for a 1.3 ms phase).

  sel      — centroid matmul + bucket selection (phase 1)
  sel+res  — ... + Pallas rescore + inlier top-k (phases 1-2)
  tail     — outlier tail scan alone
  full     — the production ivf_topk_program
  sel-bf16 — phase 1 with centroids cast to bf16 (selection quality probe)

Differences between the rungs attribute the per-batch wall to phases, which
is what decides the next optimization (f32 selection matmul vs rescore DMA
vs tail scan). Usage: python tools/tpu_ivf_phase_probe.py [rows] [B]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from typeagent_tpu.ops import topk as T  # noqa: E402
from typeagent_tpu.ops.ivf import ivf_build, ivf_topk_program  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
B_SEL = int(sys.argv[2]) if len(sys.argv) > 2 else 12
DIM, BATCH, K, R = 384, 256, 10, 8
CLUSTERS = max(N // 1000, 16)
SIGMA, BG = 0.35, 0.02


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=4):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # block (axon ignores block_until_ready)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / R)
    log(f"{name}: {best * 1000:.2f} ms/batch-{BATCH}  ({BATCH / best:.0f} QPS)")
    return best, out


def main():
    log(f"backend: {jax.default_backend()}  N={N} B={B_SEL}")
    chunk = min(524_288, -(-N // 1024) * 1024)
    n_chunks = -(-N // chunk)

    @jax.jit
    def gen(key):
        kc, kr, kq = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (CLUSTERS, DIM), jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)

        def one(ck):
            k1, k2, k3 = jax.random.split(ck, 3)
            lab = jax.random.randint(k1, (chunk,), 0, CLUSTERS)
            e = centers[lab] + SIGMA * jax.random.normal(
                k2, (chunk, DIM), jnp.float32
            ) / jnp.sqrt(DIM * 1.0)
            bg = jax.random.normal(k3, (chunk, DIM), jnp.float32)
            take = jax.random.uniform(jax.random.fold_in(k1, 7), (chunk,)) < BG
            e = jnp.where(take[:, None], bg, e)
            return (e / jnp.linalg.norm(e, axis=1, keepdims=True)).astype(
                jnp.bfloat16
            )

        rows = jax.lax.map(one, jax.random.split(kr, n_chunks)).reshape(
            n_chunks * chunk, DIM
        )[: -(-N // 1024) * 1024]
        kl, kn = jax.random.split(kq)
        qlab = jax.random.randint(kl, (R * BATCH,), 0, CLUSTERS)
        q = centers[qlab] + SIGMA * jax.random.normal(
            kn, (R * BATCH, DIM), jnp.float32
        ) / jnp.sqrt(DIM * 1.0)
        q /= jnp.linalg.norm(q, axis=1, keepdims=True)
        return rows, q.reshape(R, BATCH, DIM)

    t0 = time.perf_counter()
    emb, qs = gen(jax.random.PRNGKey(11))
    np.asarray(emb[:1, :1])
    log(f"gen: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    ivf = ivf_build(emb, N, outlier_frac=0.03, rows_per_cluster=512)
    np.asarray(ivf.emb_r[:1, :1])
    log(f"build: {time.perf_counter() - t0:.1f}s nb={ivf.n_buckets} "
        f"out={int(ivf.count_out)}")
    emb.delete()

    nb = ivf.n_buckets
    cents_bf16 = ivf.centroids.astype(jnp.bfloat16)

    def _sel(q, cents, in_dtype):
        qc = jax.lax.dot_general(
            q.astype(in_dtype), cents,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.approx_max_k(qc, B_SEL, recall_target=0.99)

    @jax.jit
    def sel_f32(many, cents):
        return jax.lax.map(lambda q: _sel(q, cents, jnp.float32), many)

    @jax.jit
    def sel_bf16(many, cents):
        return jax.lax.map(lambda q: _sel(q, cents, jnp.bfloat16), many)

    @functools.partial(jax.jit, static_argnames=())
    def sel_rescore(many, cents, emb_r):
        def one(q):
            _, sel = _sel(q, cents, jnp.float32)
            sel = jnp.clip(sel, 0, nb - 1)
            raw = T._rescore_selected_pallas(emb_r, q, sel, B=B_SEL)
            return jax.lax.top_k(raw, K)

        return jax.lax.map(one, many)

    @jax.jit
    def tail_only(many, out_emb, count_out):
        return jax.lax.map(
            lambda q: T.topk_program(out_emb, q, count_out, K), many
        )

    @jax.jit
    def full(many, *st):
        return jax.lax.map(lambda q: ivf_topk_program(*st, q, K, B=B_SEL), many)

    t_sel, _ = timeit("sel(f32 cents + approx_max_k)", sel_f32, qs, ivf.centroids)
    t_selb, _ = timeit("sel(bf16 cents)", sel_bf16, qs, cents_bf16)
    t_sr, _ = timeit(
        "sel + pallas rescore + top_k", sel_rescore, qs, ivf.centroids, ivf.emb_r
    )
    t_tail, _ = timeit("outlier tail scan", tail_only, qs, ivf.out_emb, ivf.count_out)
    t_full, _ = timeit("full ivf_topk", full, qs, *ivf)
    log(
        f"attribution: sel {t_sel * 1e3:.2f} | rescore+merge "
        f"{(t_sr - t_sel) * 1e3:.2f} | tail {t_tail * 1e3:.2f} | "
        f"rest(full - selres - tail) {(t_full - t_sr - t_tail) * 1e3:.2f} ms"
    )
    log(f"bf16-selection saves {(t_sel - t_selb) * 1e3:.2f} ms/batch")

    # Selection-agreement check: bf16 vs f32 bucket choices.
    _, s32 = sel_f32(qs, ivf.centroids)
    _, s16 = sel_bf16(qs, cents_bf16)
    a = np.asarray(s32).reshape(-1, B_SEL)
    b = np.asarray(s16).reshape(-1, B_SEL)
    agree = np.mean(
        [len(set(x.tolist()) & set(y.tolist())) / B_SEL for x, y in zip(a, b)]
    )
    log(f"bf16/f32 selected-bucket agreement: {agree:.4f}")


if __name__ == "__main__":
    main()
