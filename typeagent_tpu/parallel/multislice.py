"""Multi-slice (DCN) execution of the (dp, shard) search program.

Within one TPU slice the distributed top-k rides ICI (``parallel/sharded``).
Across slices, JAX's distributed runtime stitches every process's devices
into ONE global mesh: each process runs the same SPMD program, XLA routes
the ``all_gather`` of per-shard winners over DCN between slices and ICI
within them. No code change is needed in the search program itself — only
process bootstrap (``jax.distributed.initialize``) and global-array
construction differ from single-slice runs.

This module is the runnable proof: ``run_multislice_dryrun`` initializes the
distributed runtime, builds the global (dp, shard) mesh spanning all
processes, lays the fragment matrix across every process's devices, executes
``make_sharded_topk`` and verifies the result against a numpy oracle in
every process. The gated test runs it as N real OS processes on CPU devices
(the same simulation substrate the driver uses for multi-chip); on real
multi-slice TPU the identical entry point runs with the default backend —
only ``coordinator_address`` changes.

See docs/performance.md ("Multi-slice / DCN") for the deployment recipe.
"""

from __future__ import annotations

import os
import sys


def run_multislice_dryrun(
    coordinator: str,
    num_processes: int,
    process_id: int,
    devices_per_process: int = 4,
    platform: str = "cpu",
    n_rows: int = 512,
    dim: int = 64,
    n_queries: int = 16,
    k: int = 5,
) -> None:
    """One process's share of the multi-slice dry run; raises on mismatch."""
    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={devices_per_process}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["TAT_JAX_PLATFORM"] = "cpu"

    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import AXIS_DP, AXIS_SHARD, create_mesh
    from .sharded import make_sharded_topk

    devices = jax.devices()  # global: every process's devices
    assert len(devices) == num_processes * devices_per_process
    mesh = create_mesh(n_shard=len(devices) // 2, n_dp=2, devices=devices)

    # Deterministic data in every process; each supplies its local shards.
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((n_rows, dim)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    queries = rows[:n_queries]

    def make_global(array, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            array.shape, sharding, lambda index: array[index]
        )

    emb = make_global(rows, P(AXIS_SHARD, None))
    q = make_global(queries, P(AXIS_DP, None))
    count = make_global(np.asarray([n_rows], np.int32), P())
    min_score = make_global(np.asarray([0.0], np.float32), P())

    fn = make_sharded_topk(mesh, k)
    vals, idx = fn(emb, q, count, min_score)

    # Verify this process's addressable output shards against the oracle.
    scores = np.clip((rows @ queries.T + 1) / 2, 0, 1)  # [n_rows, n_queries]
    for shard in vals.addressable_shards:
        q_slice = shard.index[0]
        got_vals = np.asarray(shard.data)
        expect = np.sort(scores[:, q_slice], axis=0)[::-1][:k].T
        np.testing.assert_allclose(got_vals, expect, atol=2e-5)
    for shard in idx.addressable_shards:
        q_slice = shard.index[0]
        got_idx = np.asarray(shard.data)
        expect_sets = np.argsort(-scores[:, q_slice], axis=0)[:k].T
        for row_got, row_exp in zip(got_idx, expect_sets):
            assert set(row_got.tolist()) == set(row_exp.tolist()), (
                row_got,
                row_exp,
            )

    print(
        f"multislice dryrun OK: process {process_id}/{num_processes}, "
        f"mesh(dp=2, shard={len(devices) // 2}) spanning "
        f"{num_processes} processes",
        flush=True,
    )
    jax.distributed.shutdown()


def main() -> None:
    coordinator, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    devices_per_process = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    run_multislice_dryrun(coordinator, num, pid, devices_per_process)


if __name__ == "__main__":
    main()
