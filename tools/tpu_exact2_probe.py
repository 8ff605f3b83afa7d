"""Probe: two-phase exact2 vs one-phase exact kernel vs approx modes.

1M x 384, batch 256, k=10, R=20 batches per dispatch (lax.map), best of 3,
variants interleaved in ONE process (tunnel throughput varies ±40% between
sessions). Data is generated ON DEVICE (host->device of the 1.5 GB matrix
through the tunnel is minutes).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

N, D, B, K, R = 1_000_000, 384, 256, 10, 20
N_PAD = 978 * 1024  # multiple of 1024 >= N; rows past the watermark are junk


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from typeagent_tpu.ops import topk as T

    log("backend:", jax.default_backend())
    t0 = time.perf_counter()

    @jax.jit
    def gen_data(key):
        ke, kq = jax.random.split(key)
        emb = jax.random.normal(ke, (N_PAD, D), dtype=jnp.float32)
        emb /= jnp.linalg.norm(emb, axis=1, keepdims=True)
        qs = jax.random.normal(kq, (R, B, D), dtype=jnp.float32)
        qs /= jnp.linalg.norm(qs, axis=2, keepdims=True)
        return emb, qs

    emb_f32, many_dev = gen_data(jax.random.PRNGKey(7))
    emb_f32.block_until_ready()
    log(f"on-device data gen: {time.perf_counter() - t0:.1f}s")
    emb_bf16 = jnp.asarray(emb_f32, dtype=jnp.bfloat16)
    count = jnp.asarray(N, dtype=jnp.int32)

    results = {}

    def bench(name, emb, fn):
        @jax.jit
        def prog(e, qs):
            return jax.lax.map(lambda q: fn(e, q), qs)

        t0 = time.perf_counter()
        out = prog(emb, many_dev)
        leaves = jax.tree.leaves(out)
        idx = np.asarray(leaves[1])
        log(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = prog(emb, many_dev)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        ms = best / R * 1000
        log(f"{name}: {ms:.2f} ms/batch-{B} ({R * B / best:.0f} QPS)")
        cert = np.asarray(leaves[2]) if len(leaves) > 2 else None
        results[name] = (ms, idx, cert)

    variants = [
        ("exact1-bf16", emb_bf16, lambda e, q: T.topk_program(e, q, count, K)),
        (
            "exact2-bf16-s2",
            emb_bf16,
            lambda e, q: T.topk_program_exact2(e, q, count, K, slack=2),
        ),
        (
            "exact2-bf16-s6",
            emb_bf16,
            lambda e, q: T.topk_program_exact2(e, q, count, K, slack=6),
        ),
        (
            "bucket-approx-bf16",
            emb_bf16,
            lambda e, q: T.cosine_topk_bucket(e, q, count, K),
        ),
        (
            "approx-rt995-bf16",
            emb_bf16,
            lambda e, q: T.cosine_topk_approx(e, q, count, K, recall_target=0.995),
        ),
        ("exact1-f32", emb_f32, lambda e, q: T.topk_program(e, q, count, K)),
        (
            "exact2-f32-s2",
            emb_f32,
            lambda e, q: T.topk_program_exact2(e, q, count, K, slack=2),
        ),
        (
            "exact2h-f32",
            emb_f32,
            lambda e, q: T.topk_program_exact2_hybrid(e, emb_bf16, q, count, K),
        ),
    ]
    # Interleave: 2 passes so each variant sees similar tunnel conditions.
    for name, emb, fn in variants:
        bench(name, emb, fn)

    # Tile-size experiment: raise the bucket kernel's VMEM budget to fit a
    # 4096-row tile (fewer grid steps, bigger matmuls).
    orig = T._pick_tile_bucket
    T._pick_tile_bucket = lambda n, d, b, i: min(4096, orig(n, d, b, i) * 2)
    try:
        bench(
            "exact2-bf16-s6-t4096",
            emb_bf16,
            lambda e, q: T.topk_program_exact2(e, q, count, K, slack=6),
        )
    except Exception as exc:
        log("t4096 failed:", exc)
    finally:
        T._pick_tile_bucket = orig

    # Identity/cert checks vs the one-phase oracles.
    import numpy as np

    for pair in [
        ("exact2-bf16-s2", "exact1-bf16"),
        ("exact2-bf16-s6", "exact1-bf16"),
        ("exact2-f32-s2", "exact1-f32"),
        ("exact2h-f32", "exact1-f32"),
    ]:
        a, b = pair
        ia, ib = results[a][1], results[b][1]
        match = np.mean(
            [
                len(set(x.tolist()) & set(y.tolist())) / K
                for x, y in zip(ia.reshape(-1, K), ib.reshape(-1, K))
            ]
        )
        cert = results[a][2]
        log(f"{a} vs {b}: overlap@{K}={match:.5f} cert_all={cert.all()}")
    for name in ("bucket-approx-bf16", "approx-rt995-bf16"):
        ia, ib = results[name][1], results["exact1-bf16"][1]
        match = np.mean(
            [
                len(set(x.tolist()) & set(y.tolist())) / K
                for x, y in zip(ia.reshape(-1, K), ib.reshape(-1, K))
            ]
        )
        log(f"{name} vs exact1-bf16: recall@{K}={match:.5f}")


if __name__ == "__main__" and "--hybrid" not in sys.argv:
    main()


def probe_hybrid_variants():
    """Follow-up probe: hybrid slack sweep + int8 selection shadow."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from typeagent_tpu.ops import topk as T

    log("backend:", jax.default_backend())

    @jax.jit
    def gen_data(key):
        ke, kq = jax.random.split(key)
        emb = jax.random.normal(ke, (N_PAD, D), dtype=jnp.float32)
        emb /= jnp.linalg.norm(emb, axis=1, keepdims=True)
        qs = jax.random.normal(kq, (R, B, D), dtype=jnp.float32)
        qs /= jnp.linalg.norm(qs, axis=2, keepdims=True)
        return emb, qs

    emb_f32, many_dev = gen_data(jax.random.PRNGKey(7))
    emb_f32.block_until_ready()
    emb_bf16 = jnp.asarray(emb_f32, dtype=jnp.bfloat16)
    emb_i8, i8_scales = T.quantize_rows_device(emb_f32)
    count = jnp.asarray(N, dtype=jnp.int32)
    results = {}

    def bench(name, fn, *bufs):
        # Buffers as ARGUMENTS (a closure-captured device array embeds as
        # an HLO constant -> remote compile request overflows).
        @jax.jit
        def prog(qs, *arrs):
            return jax.lax.map(lambda q: fn(q, *arrs), qs)

        t0 = time.perf_counter()
        out = prog(many_dev, *bufs)
        leaves = jax.tree.leaves(out)
        np.asarray(leaves[0])
        log(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = prog(many_dev, *bufs)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        cert = jax.tree.leaves(out)
        cert_all = bool(np.asarray(cert[2]).all()) if len(cert) > 2 else None
        log(f"{name}: {best / R * 1000:.2f} ms/batch-{B} "
            f"({R * B / best:.0f} QPS) cert_all={cert_all}")
        results[name] = (np.asarray(cert[1]), cert_all)

    bench("exact1-f32", lambda q, e: T.topk_program(e, q, count, K), emb_f32)
    bench("hybrid-bf16-s14", lambda q, e, s: T.topk_program_exact2_hybrid(
        e, s, q, count, K), emb_f32, emb_bf16)
    bench("hybrid-bf16-s8", lambda q, e, s: T.topk_program_exact2_hybrid(
        e, s, q, count, K, slack=8), emb_f32, emb_bf16)
    bench("hybrid-i8-s22", lambda q, e, s, sc: T.topk_program_exact2_hybrid_i8(
        e, s, sc, q, count, K), emb_f32, emb_i8, i8_scales)
    bench("hybrid-i8-s14", lambda q, e, s, sc: T.topk_program_exact2_hybrid_i8(
        e, s, sc, q, count, K, slack=14), emb_f32, emb_i8, i8_scales)

    oracle = results["exact1-f32"][0].reshape(-1, K)
    for name, (idx, cert_all) in results.items():
        if name == "exact1-f32":
            continue
        match = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(idx.reshape(-1, K), oracle)
        ])
        log(f"{name}: recall@{K} vs f32 oracle = {match:.5f} cert_all={cert_all}")


if __name__ == "__main__" and "--hybrid" in sys.argv:
    probe_hybrid_variants()
    sys.exit(0)
