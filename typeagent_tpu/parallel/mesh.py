"""Mesh construction helpers.

Axes:
  * ``dp``    — data parallel over query batches.
  * ``shard`` — the fragment axis: embedding rows sharded across devices
                (the long-axis analogue of sequence/context parallelism for
                this workload; SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

AXIS_DP = "dp"
AXIS_SHARD = "shard"


def create_mesh(
    n_shard: int | None = None, n_dp: int = 1, devices: list | None = None
) -> Mesh:
    """Create a (dp, shard) mesh over the first ``n_dp * n_shard`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_shard is None:
        n_shard = len(devices) // n_dp
    n = n_dp * n_shard
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_dp, n_shard)
    return Mesh(grid, (AXIS_DP, AXIS_SHARD))


def default_mesh() -> Mesh:
    """All visible devices on the shard axis, dp=1."""
    return create_mesh()
