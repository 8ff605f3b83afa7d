"""Measure the int4 packed-nibble selection engine on the real chip.

Engines at 1M x 384 (R batches of 256 per dispatch, steady-state):
  * exact2-i4/bf16  — int4 bucket selection (192 MB scan) + bf16 rescore,
    over a slack sweep (selection net width vs recall)
  * phase-1 alone   — int4 bucket maxima kernel floor
  * approx-rt995    — the r03 headline engine (bf16, 768 MB)
  * exact2-bf16     — the certified bf16 two-phase engine

Probed earlier on this chip: XLA-native jnp.int4 dot operands crash
(RecursionError in jax 0.8.x), and single-batch dispatch timing is
tunnel-RTT-dominated (~27 ms) — hence manual nibbles and R-batch lax.map.

Run: cd /root/repo && python tools/tpu_int4_probe.py
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--r", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    n, d, b, R, k = args.n, args.dim, args.batch, args.r, args.k

    from typeagent_tpu.ops import topk as T
    from typeagent_tpu.ops import int4 as I4

    print(f"backend: {jax.default_backend()}  n={n} d={d} b={b} R={R}")

    @jax.jit
    def gen(key):
        ke, kq = jax.random.split(key)
        e = jax.random.normal(ke, (n, d), dtype=jnp.float32)
        e /= jnp.linalg.norm(e, axis=1, keepdims=True)
        q = jax.random.normal(kq, (R, b, d), dtype=jnp.float32)
        q /= jnp.linalg.norm(q, axis=2, keepdims=True)
        return e, q

    emb_f32, many = gen(jax.random.PRNGKey(3))
    emb = emb_f32.astype(jnp.bfloat16)
    packed, scales = I4.quantize_rows_int4_device(emb_f32)
    jax.block_until_ready(packed)
    count = jnp.asarray(n, dtype=jnp.int32)
    print(f"packed shadow: {packed.shape} int8 = {packed.nbytes/1e6:.0f} MB")

    def make(fn, *bufs):
        @jax.jit
        def prog(qs, *arrs):
            return jax.lax.map(lambda q: fn(q, *arrs), qs)

        return prog, bufs

    progs = {
        "approx-rt995-bf16": make(
            lambda q, e: T.cosine_topk_approx(e, q, count, k, recall_target=0.995),
            emb,
        ),
        "exact2-bf16": make(
            lambda q, e: T.topk_program_exact2(e, q, count, k, slack=6), emb
        ),
        "exact1-f32": make(
            lambda q, e: T.topk_program(e, q, count, k), emb_f32
        ),
    }
    for slack in (2, 6, 14):
        progs[f"exact2-i4 slack={slack}"] = make(
            lambda q, e, p, s, _sl=slack: I4.topk_program_exact2_i4(
                e, p, s, q, count, k, slack=_sl
            ),
            emb,
            packed,
            scales,
        )

    # Phase-1 floor: bucket maxima alone (reduce to top-1 so fetch is tiny).
    def p1_only(q, p, s):
        bv = I4._bucket_maxima_pallas_q4(
            p, s, I4.split_pad_queries(q, d), count.reshape(1)
        )
        return jnp.max(bv, axis=1)

    progs["i4-phase1-only"] = make(p1_only, packed, scales)

    outputs, timings = {}, {}
    for name, (prog, bufs) in progs.items():
        t0 = time.perf_counter()
        try:
            out = prog(many, *bufs)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        print(f"warmup {name}: {time.perf_counter() - t0:.1f}s")
        progs[name] = (prog, bufs)
        outputs[name] = out
        timings[name] = float("inf")

    for _ in range(3):
        for name in list(timings):
            prog, bufs = progs[name]
            t0 = time.perf_counter()
            out = prog(many, *bufs)
            jax.block_until_ready(out)
            timings[name] = min(timings[name], time.perf_counter() - t0)
            outputs[name] = out

    oracle = np.asarray(jax.tree.leaves(outputs["exact1-f32"])[1]).reshape(-1, k)

    for name, el in timings.items():
        leaves = jax.tree.leaves(outputs[name])
        rec = cert = None
        if len(leaves) > 1 and leaves[1].ndim >= 2:
            idx = np.asarray(leaves[1]).reshape(-1, k)
            rec = np.mean(
                [
                    len(set(a.tolist()) & set(bb.tolist())) / k
                    for a, bb in zip(idx, oracle)
                ]
            )
        if len(leaves) > 2:
            cert = bool(np.asarray(leaves[2]).all())
        print(
            f"{name}: {el / R * 1000:.2f} ms/batch-{b}, {R * b / el:.0f} QPS"
            + (f", recall@{k}={rec:.4f}" if rec is not None else "")
            + (f", cert_all={cert}" if cert is not None else "")
        )


if __name__ == "__main__":
    main()
