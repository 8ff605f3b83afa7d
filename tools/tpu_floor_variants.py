"""Floor-variant sweep: find what unlocks HBM bandwidth in the tile scan."""

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


def kernel(q_ref, e_ref, out_ref, *, tile_n):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, -3.0)

    scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    best = jnp.max(scores, axis=1, keepdims=True)
    out_ref[:] = jnp.maximum(out_ref[:], jnp.broadcast_to(best, out_ref.shape))


def run_variant(name, emb, queries, tile_n, *, cost=True, dimsem=None, out_lanes=128):
    b = queries.shape[1]
    kern = functools.partial(kernel, tile_n=tile_n)
    kwargs = {}
    if cost:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * b * N * D,
            bytes_accessed=N * D * emb.dtype.itemsize + b * D * 4,
            transcendentals=0,
        )
    if dimsem is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(dimsem,)
        )

    @jax.jit
    def run(e, qs):
        return jax.lax.map(
            lambda q: pl.pallas_call(
                kern,
                grid=(pl.cdiv(N, tile_n),),
                in_specs=[
                    pl.BlockSpec((b, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (b, out_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((b, out_lanes), jnp.float32),
                **kwargs,
            )(q, e),
            qs,
        )

    try:
        np.asarray(run(emb, queries))
        t0 = time.perf_counter()
        out = np.asarray(run(emb, queries))
        dt = (time.perf_counter() - t0) / REPS
        assert out.shape[0] == REPS
        log(f"{name:34s} b={b:4d} tile={tile_n:5d}: {dt*1e3:7.2f} ms/batch")
    except Exception as exc:
        log(f"{name:34s} b={b:4d} tile={tile_n:5d}: FAILED {str(exc)[:120]}")


def main():
    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    emb32 = jax.random.normal(key, (N, D), dtype=jnp.float32)
    emb32 = emb32 / jnp.linalg.norm(emb32, axis=1, keepdims=True)
    emb = emb32.astype(jnp.bfloat16)
    del emb32
    for b in (256,):
        q = jax.random.normal(jax.random.PRNGKey(1), (REPS, b, D), jnp.float32)
        q = (q / jnp.linalg.norm(q, axis=2, keepdims=True)).astype(jnp.bfloat16)
        for tile in (2048, 4096):
            run_variant("baseline(cost,out128)", emb, q, tile)
            run_variant("no-cost-estimate", emb, q, tile, cost=False)
            run_variant("dimsem-arbitrary", emb, q, tile, dimsem="arbitrary")
            run_variant(
                "no-cost+arbitrary", emb, q, tile, cost=False, dimsem="arbitrary"
            )
        # XLA for reference: full einsum + top_k (materializes [b, N]).
        @jax.jit
        def xla_run(e, qs):
            def one(qq):
                s = jnp.einsum("bd,nd->bn", qq, e, preferred_element_type=jnp.float32)
                return jax.lax.top_k(s, 10)
            return jax.lax.map(one, qs)

        np.asarray(xla_run(emb, q)[0])
        t0 = time.perf_counter()
        out = np.asarray(xla_run(emb, q)[0])
        dt = (time.perf_counter() - t0) / REPS
        log(f"{'XLA einsum+top_k(k=10)':34s} b={b:4d}            : {dt*1e3:7.2f} ms/batch")

        @jax.jit
        def xla_approx(e, qs):
            def one(qq):
                s = jnp.einsum("bd,nd->bn", qq, e, preferred_element_type=jnp.float32)
                return jax.lax.approx_max_k(s, 10)
            return jax.lax.map(one, qs)

        np.asarray(xla_approx(emb, q)[0])
        t0 = time.perf_counter()
        out = np.asarray(xla_approx(emb, q)[0])
        dt = (time.perf_counter() - t0) / REPS
        log(f"{'XLA einsum+approx_max_k(k=10)':34s} b={b:4d}            : {dt*1e3:7.2f} ms/batch")


if __name__ == "__main__":
    main()
