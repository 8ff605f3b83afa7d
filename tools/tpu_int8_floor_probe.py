"""Probe: does a native int8 x int8 -> int32 MXU matmul beat bf16 here?

The v5e datasheet rates int8 MXU at 2x bf16 FLOPs. The existing quantized
kernel (ops/topk.py _topk_kernel_q) upcasts the int8 rows to bf16 inside
the kernel, so it pays the bf16 rate plus the upcast — measured slower
than bf16 (5.05 vs 2.99 ms/batch-256 at 1M x 384). If the native
int8->int32 dot actually delivers ~2x through this tunnel-attached part,
a native-int8 phase-1 scan (queries quantized per-query symmetric) is the
round-4 headline engine: ~1.3-1.5 ms/batch-256 -> ~170-190k QPS.

Run on the real chip:  python tools/tpu_int8_floor_probe.py
Prints ms/batch for bf16, int8-upcast, int8-native, interleaved A/B/A/B
within one process so tunnel variance cancels.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

N, D, B = 1_000_448, 384, 256
REPS = 16
TILE = 4096


def log(*a):
    print(*a, flush=True)


def make_kernel(mode):
    def kernel(q_ref, e_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            out_ref[:] = jnp.full_like(out_ref, -(2.0**30))

        if mode == "bf16":
            scores = jax.lax.dot_general(
                q_ref[:], e_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif mode == "i8up":
            scores = jax.lax.dot_general(
                q_ref[:].astype(jnp.bfloat16), e_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:  # i8native
            acc = jax.lax.dot_general(
                q_ref[:], e_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scores = acc.astype(jnp.float32)
        best = jnp.max(scores, axis=1, keepdims=True)
        out_ref[:] = jnp.maximum(out_ref[:], best)

    return kernel


def build(mode, emb, queries):
    kernel = make_kernel(mode)

    @jax.jit
    def run(e, qs):
        return jax.lax.map(
            lambda q: pl.pallas_call(
                kernel,
                grid=(pl.cdiv(N, TILE),),
                in_specs=[
                    pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * B * N * D,
                    bytes_accessed=N * D * emb.dtype.itemsize + B * D * queries.dtype.itemsize,
                    transcendentals=0,
                ),
            )(q, e),
            qs,
        )

    return run, emb, queries


def main():
    log("devices:", jax.devices())
    t0 = time.perf_counter()

    @jax.jit
    def gen(key):
        ke, kq = jax.random.split(key)
        emb = jax.random.normal(ke, (N, D), dtype=jnp.float32)
        emb /= jnp.linalg.norm(emb, axis=1, keepdims=True)
        qs = jax.random.normal(kq, (REPS, B, D), dtype=jnp.float32)
        qs /= jnp.linalg.norm(qs, axis=-1, keepdims=True)
        sc = jnp.abs(emb).max(axis=1) / 127.0
        emb_i8 = jnp.clip(jnp.round(emb / sc[:, None]), -127, 127).astype(jnp.int8)
        qsc = jnp.abs(qs).max(axis=-1) / 127.0
        q_i8 = jnp.clip(jnp.round(qs / qsc[..., None]), -127, 127).astype(jnp.int8)
        return emb.astype(jnp.bfloat16), qs.astype(jnp.bfloat16), emb_i8, q_i8

    emb_bf, q_bf, emb_q, q_q = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    log(f"on-device data gen: {time.perf_counter() - t0:.1f}s")

    runs = {
        "bf16": build("bf16", emb_bf, q_bf),
        "i8up": build("i8up", emb_q, q_q),
        "i8native": build("i8native", emb_q, q_q),
    }
    # compile + warm
    for name, (fn, e, qs) in runs.items():
        try:
            np.asarray(fn(e, qs))
            log(f"{name}: compiled ok")
        except Exception as ex:  # noqa: BLE001
            log(f"{name}: COMPILE FAIL: {type(ex).__name__}: {str(ex)[:300]}")
            runs[name] = None

    # interleaved timing, 3 rounds
    times = {k: [] for k in runs}
    for _ in range(3):
        for name, r in runs.items():
            if r is None:
                continue
            fn, e, qs = r
            t0 = time.perf_counter()
            np.asarray(fn(e, qs))
            times[name].append((time.perf_counter() - t0) / REPS)
    for name, ts in times.items():
        if not ts:
            continue
        med = sorted(ts)[len(ts) // 2]
        gbs = N * D * (2 if name == "bf16" else 1) / med / 1e9
        tf = 2 * B * N * D / med / 1e12
        log(
            f"{name:9s}: {med*1e3:6.2f} ms/batch-{B}  ({B/med:9.0f} QPS-eq, "
            f"{gbs:5.0f} GB/s, {tf:5.1f} TFLOP/s)  runs={[f'{t*1e3:.2f}' for t in ts]}"
        )


if __name__ == "__main__":
    main()
