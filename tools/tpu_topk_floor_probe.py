"""Probe the Pallas pipeline floor: matmul + row-max only, no top-k fold.

If this runs at the HBM/MXU floor (~1-2 ms/batch at 1M x 384 bf16), the
top-k fold is the cost and worth optimizing further; if it's already at
~6 ms, the grid/DMA structure itself is the bottleneck.
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

N, D = 1_000_448, 384
REPS = 16


def log(*a):
    print(*a, flush=True)


def floor_kernel(q_ref, e_ref, out_ref, *, tile_n):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, -3.0)

    scores = jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype),
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    best = jnp.max(scores, axis=1, keepdims=True)  # [b, 1]
    out_ref[:] = jnp.maximum(out_ref[:], best)


def run_floor(emb, queries, tile_n):
    b = queries.shape[1]
    kernel = functools.partial(floor_kernel, tile_n=tile_n)

    @jax.jit
    def run(e, qs):
        return jax.lax.map(lambda q: pl.pallas_call(
            kernel,
            grid=(pl.cdiv(N, tile_n),),
            in_specs=[
                pl.BlockSpec((b, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * N * D,
                bytes_accessed=N * D * e.dtype.itemsize + b * D * 4,
                transcendentals=0,
            ),
        )(q, e), qs)

    np.asarray(run(emb, queries))  # compile + warm
    t0 = time.perf_counter()
    out = np.asarray(run(emb, queries))  # force full materialization
    dt = (time.perf_counter() - t0) / REPS
    assert out.shape[0] == REPS
    log(
        f"floor b={b:4d} tile={tile_n:5d} dtype={emb.dtype.name}: "
        f"{dt*1e3:7.2f} ms/batch  ({b/dt:9.0f} QPS-equivalent)"
    )


def main():
    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    emb32 = jax.random.normal(key, (N, D), dtype=jnp.float32)
    emb32 = emb32 / jnp.linalg.norm(emb32, axis=1, keepdims=True)
    emb = emb32.astype(jnp.bfloat16)
    del emb32
    for b in (64, 256):
        queries = jax.random.normal(jax.random.PRNGKey(1), (REPS, b, D), jnp.float32)
        queries = queries / jnp.linalg.norm(queries, axis=2, keepdims=True)
        for tile in (1024, 2048, 4096, 8192):
            try:
                run_floor(emb, queries, tile)
            except Exception as exc:
                log(f"floor b={b} tile={tile}: FAILED {str(exc)[:160]}")


if __name__ == "__main__":
    main()
