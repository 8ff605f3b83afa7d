"""Row-sharded distributed vector search.

The embedding matrix's fragment axis shards across the mesh's ``shard`` axis
(block layout: shard s owns global rows [s*local_n, (s+1)*local_n)). A search
is one SPMD program per query batch:

  1. per-shard fused cosine top-k (Pallas on TPU, XLA on CPU meshes) over the
     local rows — compute stays local, nothing but the k winners leave HBM;
  2. ``all_gather`` of the per-shard (score, global-ordinal) pairs over ICI
     (k is small, so this is a tiny collective);
  3. a final [b, S*k] -> top-k merge, sharded over the ``dp`` axis.

Queries ride the ``dp`` axis for data-parallel batching. This is the
TPU-native replacement for scaling the reference's serial numpy scan
(`aitools/vectorbase.py:163-201`), per SURVEY.md §7 / BASELINE.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.5 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..ops import append as append_ops
from ..ops.topk import topk_program
from .mesh import AXIS_DP, AXIS_SHARD

__all__ = ["make_sharded_topk", "ShardedVectorStore"]


@functools.lru_cache(maxsize=64)
def _sharded_topk_cached(mesh: Mesh, k: int):
    use_pallas = mesh.devices.flat[0].platform == "tpu"

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=(P(AXIS_SHARD, None), P(AXIS_DP, None), P()),
        out_specs=(P(AXIS_DP, None), P(AXIS_DP, None)),
        check_vma=False,  # outputs are replicated over 'shard' via all_gather
    )
    def _search(emb_local, q_local, count):
        local_n = emb_local.shape[0]
        shard = jax.lax.axis_index(AXIS_SHARD)
        offset = shard * local_n
        local_count = jnp.clip(count[0] - offset, 0, local_n)
        vals, idx = topk_program(emb_local, q_local, local_count, k, use_pallas)
        idx = jnp.where(vals >= 0.0, idx + offset, -1)
        # k-small merge over ICI: gather all shards' winners, re-top-k.
        all_vals = jax.lax.all_gather(vals, AXIS_SHARD, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, AXIS_SHARD, axis=1, tiled=True)
        merged_vals, pos = jax.lax.top_k(all_vals, k)
        merged_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        return merged_vals, merged_idx

    return jax.jit(_search)


def make_sharded_topk(mesh: Mesh, k: int):
    """Compiled distributed top-k: (emb, queries, count[1]) -> (vals, idx)."""
    return _sharded_topk_cached(mesh, k)


class ShardedVectorStore:
    """An appendable embedding matrix sharded over a mesh's ``shard`` axis.

    Single-conversation stores fit one chip (`vectorstore.VectorStore`); this
    class is the 1M+ fragment scale-out path (BASELINE.json config #5).
    """

    def __init__(self, mesh: Mesh, dim: int, dtype=jnp.float32):
        self.mesh = mesh
        self.dim = dim
        self.dim_pad = append_ops.round_up(dim, append_ops.LANES)
        self.n_shard = mesh.shape[AXIS_SHARD]
        self.n_dp = mesh.shape[AXIS_DP]
        self._dtype = dtype
        self._sharding = NamedSharding(mesh, P(AXIS_SHARD, None))
        self._rep = NamedSharding(mesh, P())
        # capacity is always a multiple of n_shard * 8 sublanes
        self._cap_quantum = self.n_shard * 8
        cap = max(append_ops.MIN_CAPACITY, self._cap_quantum)
        cap = append_ops.round_up(cap, self._cap_quantum)
        self.buf = jax.device_put(
            jnp.zeros((cap, self.dim_pad), dtype=dtype), self._sharding
        )
        self.count = 0

    def __len__(self) -> int:
        return self.count

    def _grow(self, needed: int) -> None:
        cap = self.buf.shape[0]
        while cap < needed:
            cap *= 2
        if cap == self.buf.shape[0]:
            return
        pad = functools.partial(jnp.pad, pad_width=((0, cap - self.buf.shape[0]), (0, 0)))
        self.buf = jax.jit(pad, out_shardings=self._sharding)(self.buf)

    def append(self, rows: np.ndarray) -> None:
        """Append rows (callers pass UNIT-NORMALIZED embeddings, as with the
        reference VectorBase; CorpusVectorStore normalizes for you)."""
        rows = np.asarray(rows, dtype=np.float32)
        assert rows.ndim == 2 and rows.shape[1] == self.dim
        n = rows.shape[0]
        if n == 0:
            return
        padded = np.zeros((n, self.dim_pad), dtype=np.float32)
        padded[:, : self.dim] = rows
        self._grow(self.count + n)
        upd = jax.jit(
            lambda b, r, c: jax.lax.dynamic_update_slice(b, r.astype(b.dtype), (c, 0)),
            out_shardings=self._sharding,
            donate_argnums=(0,),
        )
        self.buf = upd(self.buf, jnp.asarray(padded), jnp.int32(self.count))
        self.count += n

    def search(
        self,
        queries: np.ndarray,
        k: int,
        min_score: float = 0.0,
    ) -> list[list[tuple[int, float]]]:
        """Batched distributed lookup -> per-query (ordinal, score) lists."""
        if self.count == 0:
            return [[] for _ in range(queries.shape[0])]
        b = queries.shape[0]
        b_quantum = max(8, self.n_dp * 8)
        b_pad = append_ops.round_up(b, b_quantum)
        q = np.zeros((b_pad, self.dim_pad), dtype=np.float32)
        q[:b, : self.dim] = queries
        k_eff = min(k, self.count)
        fn = make_sharded_topk(self.mesh, k_eff)
        vals, idx = fn(
            self.buf,
            jax.device_put(q, NamedSharding(self.mesh, P(AXIS_DP, None))),
            jax.device_put(jnp.asarray([self.count], jnp.int32), self._rep),
        )
        vals = np.asarray(vals)[:b]
        idx = np.asarray(idx)[:b]
        out = []
        for r in range(b):
            keep = (vals[r] >= min_score) & (idx[r] >= 0)
            out.append([(int(i), float(v)) for v, i in zip(vals[r][keep], idx[r][keep])])
        return out
