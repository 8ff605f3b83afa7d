"""Raise the Pallas scoped-VMEM limit and sweep bigger tiles.

Also probes a reduce-free kernel (pure DMA+matmul) to locate the floor.
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

from typeagent_tpu.ops import topk as topk_mod

N, D = 1_000_448, 384
REPS = 16


def log(*a):
    print(*a, flush=True)


def time_run(run, *args):
    np.asarray(jax.tree.leaves(run(*args))[0])
    t0 = time.perf_counter()
    out = np.asarray(jax.tree.leaves(run(*args))[0])
    return (time.perf_counter() - t0) / REPS


def floor_kernel(q_ref, e_ref, out_ref, *, reduce):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    scores = jax.lax.dot_general(
        q_ref[:], e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if reduce:
        best = jnp.max(scores, axis=1, keepdims=True)
        out_ref[:] = jnp.maximum(out_ref[:], jnp.broadcast_to(best, out_ref.shape))
    else:
        out_ref[:] = scores[:, :128]  # touch the data, no reduction


def run_floor(emb, queries, tile, vmem_mb, reduce):
    b = queries.shape[1]
    kern = functools.partial(floor_kernel, reduce=reduce)
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        )

    @jax.jit
    def run(e, qs):
        return jax.lax.map(
            lambda q: pl.pallas_call(
                kern,
                grid=(pl.cdiv(N, tile),),
                in_specs=[
                    pl.BlockSpec((b, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (b, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
                **params,
            )(q, e),
            qs,
        )

    try:
        dt = time_run(run, emb, queries)
        log(
            f"floor reduce={int(reduce)} vmem={vmem_mb or 16:3d}M tile={tile:5d} "
            f"b={b}: {dt*1e3:7.2f} ms/batch"
        )
    except Exception as exc:
        log(f"floor reduce={int(reduce)} vmem={vmem_mb}M tile={tile} b={b}: "
            f"FAILED {str(exc)[:130]}")


def run_full(emb, queries, tile, vmem_mb, k=10):
    b = queries.shape[1]
    count = jnp.asarray([N], jnp.int32)

    orig_pick = topk_mod._pick_tile
    orig_params = getattr(topk_mod, "_COMPILER_PARAMS", None)
    topk_mod._pick_tile = lambda *a, **kw: tile

    import importlib

    try:
        @jax.jit
        def run(e, qs):
            return jax.lax.map(
                lambda q: topk_mod._topk_pallas_impl(e, q, count, k=k), qs
            )

        dt = time_run(run, emb, queries)
        log(
            f"full k={k} vmem={vmem_mb or 16:3d}M tile={tile:5d} b={b}: "
            f"{dt*1e3:7.2f} ms/batch  {b/dt:9.0f} QPS"
        )
    except Exception as exc:
        log(f"full k={k} vmem={vmem_mb}M tile={tile} b={b}: FAILED {str(exc)[:130]}")
    finally:
        topk_mod._pick_tile = orig_pick


def main():
    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    emb32 = jax.random.normal(key, (N, D), dtype=jnp.float32)
    emb32 = emb32 / jnp.linalg.norm(emb32, axis=1, keepdims=True)
    emb = emb32.astype(jnp.bfloat16)
    del emb32
    b = 256
    q = jax.random.normal(jax.random.PRNGKey(1), (REPS, b, D), jnp.float32)
    q = (q / jnp.linalg.norm(q, axis=2, keepdims=True)).astype(jnp.bfloat16)

    # Floor: where does the time go?
    run_floor(emb, q, 2048, None, reduce=False)
    run_floor(emb, q, 2048, None, reduce=True)
    run_floor(emb, q, 8192, 96, reduce=False)
    run_floor(emb, q, 8192, 96, reduce=True)
    run_floor(emb, q, 16384, 96, reduce=True)
    run_floor(emb, q, 32768, 96, reduce=True)

    # Full kernel with raised VMEM limit + big tiles (set the module's
    # compiler params via monkeypatched pallas_call kwargs is intrusive;
    # instead rely on the default limit for tile 2048 and test whether the
    # kernel itself fits bigger tiles under the default).
    qf = jax.random.normal(jax.random.PRNGKey(1), (REPS, b, D), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=2, keepdims=True)
    run_full(emb, qf, 2048, None)
    run_full(emb, qf, 3072, None)
    run_full(emb, qf, 4096, None)


if __name__ == "__main__":
    main()
