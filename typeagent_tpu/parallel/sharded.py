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

All device programs are cached at module level keyed by (mesh, k, mode) so
repeated appends/searches hit the jit cache — a per-call ``jax.jit(lambda…)``
would retrace every time (seconds per append on a TPU mesh).
"""

from __future__ import annotations

import functools
import math
import threading
from typing import Any, Callable

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.5 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..ops import append as append_ops
from ..ops.topk import (
    _NEG,
    topk_program,
    topk_program_intervals,
    topk_program_intervals_quantized,
    topk_program_masked,
    topk_program_masked_quantized,
    topk_program_quantized,
)
from .mesh import AXIS_DP, AXIS_SHARD

__all__ = ["make_sharded_topk", "ShardedVectorStore"]


def _row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS_SHARD, None))


def _vec_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS_SHARD))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _query_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS_DP, None))


# ---------------------------------------------------------------------------
# Cached device programs (mesh-keyed; Mesh is hashable)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _append_rows_cached(mesh: Mesh):
    return jax.jit(
        lambda buf, rows, count: jax.lax.dynamic_update_slice(
            buf, rows.astype(buf.dtype), (count, 0)
        ),
        out_shardings=_row_sharding(mesh),
        donate_argnums=(0,),
    )


@functools.lru_cache(maxsize=64)
def _append_scales_cached(mesh: Mesh):
    return jax.jit(
        lambda scales, row_scales, count: jax.lax.dynamic_update_slice(
            scales, row_scales, (count,)
        ),
        out_shardings=_vec_sharding(mesh),
        donate_argnums=(0,),
    )


@functools.lru_cache(maxsize=64)
def _grow_rows_cached(mesh: Mesh):
    def _grow(buf, *, new_capacity: int):
        return jnp.pad(buf, ((0, new_capacity - buf.shape[0]), (0, 0)))

    return jax.jit(
        _grow, static_argnames=("new_capacity",), out_shardings=_row_sharding(mesh)
    )


@functools.lru_cache(maxsize=64)
def _grow_scales_cached(mesh: Mesh):
    def _grow(scales, *, new_capacity: int):
        return jnp.pad(
            scales, (0, new_capacity - scales.shape[0]), constant_values=1.0
        )

    return jax.jit(
        _grow, static_argnames=("new_capacity",), out_shardings=_vec_sharding(mesh)
    )


def _merge_shard_winners(vals, idx, k, min_score):
    """Gather per-shard winners over ICI and re-top-k; filter by min_score."""
    all_vals = jax.lax.all_gather(vals, AXIS_SHARD, axis=1, tiled=True)
    all_idx = jax.lax.all_gather(idx, AXIS_SHARD, axis=1, tiled=True)
    merged_vals, pos = jax.lax.top_k(all_vals, k)
    merged_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    keep = (merged_vals >= min_score[0]) & (merged_idx >= 0)
    return jnp.where(keep, merged_vals, _NEG), jnp.where(keep, merged_idx, -1)


@functools.lru_cache(maxsize=64)
def _sharded_topk_cached(mesh: Mesh, k: int, quantized: bool):
    use_pallas = mesh.devices.flat[0].platform == "tpu"
    emb_spec = (P(AXIS_SHARD, None), P(AXIS_SHARD)) if quantized else (P(AXIS_SHARD, None),)

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=emb_spec + (P(AXIS_DP, None), P(), P()),
        out_specs=(P(AXIS_DP, None), P(AXIS_DP, None)),
        check_vma=False,  # outputs are replicated over 'shard' via all_gather
    )
    def _search(*args):
        if quantized:
            emb_local, scales_local, q_local, count, min_score = args
        else:
            (emb_local, q_local, count, min_score) = args
        local_n = emb_local.shape[0]
        shard = jax.lax.axis_index(AXIS_SHARD)
        offset = shard * local_n
        local_count = jnp.clip(count[0] - offset, 0, local_n)
        if quantized:
            vals, idx = topk_program_quantized(
                emb_local, scales_local, q_local, local_count, k, use_pallas
            )
        else:
            vals, idx = topk_program(emb_local, q_local, local_count, k, use_pallas)
        idx = jnp.where(vals >= 0.0, idx + offset, -1)
        return _merge_shard_winners(vals, idx, k, min_score)

    return jax.jit(_search)


@functools.lru_cache(maxsize=64)
def _sharded_subset_topk_cached(mesh: Mesh, k: int, quantized: bool):
    """Masked full-scan top-k: exact scoped search via a row mask.

    The mask shards with the rows (P over ``shard``), so scoping costs the
    same SPMD program as a global search — no oversampling, no host filter.
    Both dtypes ride the masked fused kernel (the mask streams from HBM
    with the row tiles — no [b, local_n] score materialization; the
    quantized variant streams per-row scales alongside).
    """
    emb_spec = (P(AXIS_SHARD, None), P(AXIS_SHARD)) if quantized else (P(AXIS_SHARD, None),)
    use_pallas = mesh.devices.flat[0].platform == "tpu"

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=emb_spec + (P(AXIS_SHARD), P(AXIS_DP, None), P(), P()),
        out_specs=(P(AXIS_DP, None), P(AXIS_DP, None)),
        check_vma=False,
    )
    def _search(*args):
        if quantized:
            emb_local, scales_local, mask_local, q_local, count, min_score = args
        else:
            (emb_local, mask_local, q_local, count, min_score) = args
        local_n = emb_local.shape[0]
        shard = jax.lax.axis_index(AXIS_SHARD)
        offset = shard * local_n
        local_count = jnp.clip(count[0] - offset, 0, local_n)
        kk = min(k, local_n)
        if quantized:
            vals, idx = topk_program_masked_quantized(
                emb_local, scales_local, q_local, local_count, mask_local,
                kk, use_pallas,
            )
        else:
            vals, idx = topk_program_masked(
                emb_local, q_local, local_count, mask_local, kk, use_pallas
            )
        idx = jnp.where(vals >= 0.0, idx + offset, -1)
        return _merge_shard_winners(vals, idx, kk, min_score)

    return jax.jit(_search)


@functools.lru_cache(maxsize=64)
def _sharded_interval_topk_cached(mesh: Mesh, k: int, quantized: bool):
    """Interval-scoped full-scan top-k: the row mask is computed ON DEVICE
    from a tiny [s_pad, 2] (start, stop) segment table, so a scoped search
    uploads O(segments) bytes instead of a host-built O(n_rows) bool mask
    (at 10M rows that mask is ~10 MB built + transferred per query batch).
    Padding rows are (0, 0) — empty intervals select nothing."""
    emb_spec = (P(AXIS_SHARD, None), P(AXIS_SHARD)) if quantized else (P(AXIS_SHARD, None),)
    use_pallas = mesh.devices.flat[0].platform == "tpu"

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=emb_spec + (P(None, None), P(AXIS_DP, None), P(), P()),
        out_specs=(P(AXIS_DP, None), P(AXIS_DP, None)),
        check_vma=False,
    )
    def _search(*args):
        if quantized:
            emb_local, scales_local, intervals, q_local, count, min_score = args
        else:
            (emb_local, intervals, q_local, count, min_score) = args
        local_n = emb_local.shape[0]
        shard = jax.lax.axis_index(AXIS_SHARD)
        offset = shard * local_n
        local_count = jnp.clip(count[0] - offset, 0, local_n)
        kk = min(k, local_n)
        # Shift the global interval table into shard-local coordinates so
        # the fused kernel's row-id compares stay local.
        local_iv = jnp.clip(intervals - offset, 0, local_n)
        if not quantized:
            vals, idx = topk_program_intervals(
                emb_local, q_local, local_count, local_iv, kk, use_pallas
            )
            idx = jnp.where(vals >= 0.0, idx + offset, -1)
            return _merge_shard_winners(vals, idx, kk, min_score)
        # Quantized stores ride the masked fused kernel too (the einsum
        # route materialized [b, local_n] f32 scores — 7+ GB at 30M rows).
        vals, idx = topk_program_intervals_quantized(
            emb_local, scales_local, q_local, local_count, local_iv, kk,
            use_pallas,
        )
        idx = jnp.where(vals >= 0.0, idx + offset, -1)
        return _merge_shard_winners(vals, idx, kk, min_score)

    return jax.jit(_search)


_INTERVAL_BUCKETS = (8, 32, 128, 512)


def _bucket_size(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@functools.lru_cache(maxsize=64)
def _sharded_scores_cached(mesh: Mesh, quantized: bool):
    """Full masked score matrix [b, capacity] (host-predicate paths)."""
    emb_spec = (P(AXIS_SHARD, None), P(AXIS_SHARD)) if quantized else (P(AXIS_SHARD, None),)

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=emb_spec + (P(AXIS_DP, None), P()),
        out_specs=P(AXIS_DP, AXIS_SHARD),
        check_vma=False,
    )
    def _scores(*args):
        if quantized:
            emb_local, scales_local, q_local, count = args
        else:
            (emb_local, q_local, count) = args
        local_n = emb_local.shape[0]
        shard = jax.lax.axis_index(AXIS_SHARD)
        offset = shard * local_n
        local_count = jnp.clip(count[0] - offset, 0, local_n)
        # Queries score in the STORE dtype (as every top-k kernel does):
        # for bf16 stores this makes host-side bf16 query rounding exactly
        # idempotent, so the bf16 wire and an f32 wire select identically.
        # int8 stores keep full-precision queries (rows dequantize via
        # scales; the queries themselves are never quantized).
        q_eff = q_local if quantized else q_local.astype(emb_local.dtype)
        raw = jnp.einsum(
            "bd,nd->bn",
            q_eff.astype(jnp.float32),
            emb_local.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if quantized:
            raw = raw * scales_local[None, :]
        scores = jnp.clip((raw + 1.0) * 0.5, 0.0, 1.0)
        valid = jnp.arange(local_n, dtype=jnp.int32)[None, :] < local_count
        return jnp.where(valid, scores, _NEG)

    return jax.jit(_scores)


@functools.lru_cache(maxsize=64)
def _sharded_approx_topk_cached(mesh: Mesh, k: int, recall_target: float):
    """Approximate distributed top-k: per-shard XLA approx_max_k (runs at the
    matmul+HBM floor on TPU; exact fallback on CPU) + the same k-small
    all_gather merge as the exact path. float/bf16 stores only."""
    from ..ops.topk import cosine_topk_approx

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=(P(AXIS_SHARD, None), P(AXIS_DP, None), P(), P()),
        out_specs=(P(AXIS_DP, None), P(AXIS_DP, None)),
        check_vma=False,
    )
    def _search(emb_local, q_local, count, min_score):
        local_n = emb_local.shape[0]
        shard = jax.lax.axis_index(AXIS_SHARD)
        offset = shard * local_n
        local_count = jnp.clip(count[0] - offset, 0, local_n)
        vals, idx = cosine_topk_approx(
            emb_local, q_local, local_count, k, recall_target=recall_target
        )
        idx = jnp.where(vals >= 0.0, idx + offset, -1)
        return _merge_shard_winners(vals, idx, min(k, local_n), min_score)

    return jax.jit(_search)


def make_sharded_topk(
    mesh: Mesh, k: int, quantized: bool = False
) -> Callable[..., tuple[jax.Array, jax.Array]]:
    """Compiled distributed top-k: (emb[, scales], queries, count[1],
    min_score[1]) -> (vals, idx)."""
    return _sharded_topk_cached(mesh, k, quantized)


# ---------------------------------------------------------------------------
# The store
# ---------------------------------------------------------------------------


_DTYPE_NAMES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "int8": jnp.int8}


class ShardedVectorStore:
    """An appendable embedding matrix sharded over a mesh's ``shard`` axis.

    Single-conversation stores fit one chip (`vectorstore.VectorStore`); this
    class is the 1M+ fragment scale-out path (BASELINE.json config #5). It
    mirrors the single-chip store's feature set: pending-buffer batching,
    bf16/int8 storage modes, on-device min_score, exact subset search, and
    serialize/deserialize round-trips.
    """

    def __init__(
        self,
        mesh: Mesh,
        dim: int,
        dtype: jax.typing.DTypeLike = jnp.float32,
        search_mode: str = "exact",
        recall_target: float = 0.95,
        ivf_b: int = 16,
    ):
        if isinstance(dtype, str):
            dtype = _DTYPE_NAMES[dtype]
        assert search_mode in ("exact", "approx", "ivf"), search_mode
        if search_mode in ("approx", "ivf") and dtype == jnp.int8:
            raise ValueError(
                f"search_mode={search_mode!r} supports float32/bfloat16 "
                "stores only"
            )
        self.search_mode = search_mode
        self.recall_target = recall_target
        self.ivf_b = ivf_b  # buckets rescored per shard per query
        self._ivf = None  # parallel.ivf.ShardedIVF snapshot
        self.mesh = mesh
        self.dim = dim
        self.dim_pad = append_ops.round_up(dim, append_ops.LANES)
        self.n_shard = mesh.shape[AXIS_SHARD]
        self.n_dp = mesh.shape[AXIS_DP]
        self._dtype = dtype
        self._quantized = dtype == jnp.int8
        self._sharding = _row_sharding(mesh)
        self._rep = _replicated(mesh)
        # capacity is always a multiple of n_shard * 8 sublanes
        self._cap_quantum = self.n_shard * 8
        cap = max(append_ops.MIN_CAPACITY, self._cap_quantum)
        cap = append_ops.round_up(cap, self._cap_quantum)
        self.buf = jax.device_put(
            jnp.zeros((cap, self.dim_pad), dtype=dtype), self._sharding
        )
        self._scales = (
            jax.device_put(jnp.ones((cap,), jnp.float32), _vec_sharding(mesh))
            if self._quantized
            else None
        )
        self.count = 0  # rows committed to the device buffer
        self._pending: list[np.ndarray] = []  # host rows awaiting flush
        self._pending_rows = 0
        # Guards the pending list + counter only (never held across device
        # work): an append landing between a flush's concatenate and its
        # clear() would otherwise be destroyed unflushed. VectorStore's
        # mesh mode serializes flushes under its own flush lock; this lock
        # covers direct users appending concurrently with searches.
        self._pending_lock = threading.Lock()

    def __len__(self) -> int:
        return self.count + self._pending_rows

    # -- appends -------------------------------------------------------------

    def append(self, rows: np.ndarray) -> None:
        """Buffer rows for append (callers pass UNIT-NORMALIZED embeddings, as
        with the reference VectorBase; CorpusVectorStore normalizes for you).

        Rows flush to the device lazily before the next search, so per-row
        adds don't pay a device dispatch each.
        """
        rows = np.asarray(rows, dtype=np.float32)
        assert rows.ndim == 2 and rows.shape[1] == self.dim
        if rows.shape[0] == 0:
            return
        with self._pending_lock:
            self._pending.append(rows)
            self._pending_rows += rows.shape[0]

    def reserve(self, n_rows: int) -> None:
        """Pre-size the buffer for a known ingest (capacity doubling would
        otherwise overshoot by up to 2x — at 10M x 384 bf16 that is an extra
        ~5 GB of HBM)."""
        # Capacity must stay a multiple of _cap_quantum (n_shard * 8) or the
        # shard-axis split breaks on meshes whose shard count doesn't divide
        # 1024 (e.g. 6 devices); keep the 1024 floor for append-bucket reuse.
        quantum = math.lcm(1024, self._cap_quantum)
        needed = append_ops.round_up(max(n_rows, 1), quantum)
        if needed > self.buf.shape[0]:
            self.buf = _grow_rows_cached(self.mesh)(self.buf, new_capacity=needed)
            if self._quantized:
                self._scales = _grow_scales_cached(self.mesh)(
                    self._scales, new_capacity=needed
                )

    def append_device(self, rows: jax.Array) -> None:
        """Bulk-adopt device-resident rows (zero host round trip).

        The sharded twin of ``VectorStore.load_device_rows``: rows produced
        on device (an on-device encoder, a generator, a restore) reshard to
        the mesh's row sharding and write in place — no 15 GB host detour
        for a 10M-row ingest. Rows must be L2-normalized ``[n, dim]``.
        """
        n, size = rows.shape
        assert size == self.dim, (size, self.dim)
        if n == 0:
            return
        self._flush()
        # Pad at the SOURCE dtype: the append jit casts to the buffer dtype
        # and quantize_rows_device casts to f32 internally — an eager f32
        # copy would add a full-size HBM intermediate (~15 GB at 10M x 384).
        padded = jnp.pad(rows, ((0, 0), (0, self.dim_pad - size)))
        self._grow(self.count + n)
        count = jnp.int32(self.count)
        if self._quantized:
            from ..ops.topk import quantize_rows_device

            q_rows, row_scales = quantize_rows_device(padded)
            self.buf = _append_rows_cached(self.mesh)(self.buf, q_rows, count)
            self._scales = _append_scales_cached(self.mesh)(
                self._scales, row_scales, count
            )
        else:
            self.buf = _append_rows_cached(self.mesh)(self.buf, padded, count)
        self.count += n

    def _grow(self, needed: int) -> None:
        cap = self.buf.shape[0]
        while cap < needed:
            cap *= 2
        if cap == self.buf.shape[0]:
            return
        self.buf = _grow_rows_cached(self.mesh)(self.buf, new_capacity=cap)
        if self._quantized:
            self._scales = _grow_scales_cached(self.mesh)(
                self._scales, new_capacity=cap
            )

    def _flush(self) -> None:
        # Atomic hand-off: detach the pending list under its lock so no
        # concurrent append can land between concatenate and reset.
        with self._pending_lock:
            if not self._pending:
                return
            pending = self._pending
            self._pending = []
            self._pending_rows = 0
        rows = np.concatenate(pending, axis=0)
        n = rows.shape[0]
        # bf16 stores take bf16 rows on the wire (device append casts to
        # the buffer dtype either way); int8 quantizes from f32 below.
        row_dtype = (
            ml_dtypes.bfloat16
            if (not self._quantized and self._dtype == jnp.bfloat16)
            else np.float32
        )
        padded = np.zeros((n, self.dim_pad), dtype=row_dtype)
        padded[:, : self.dim] = rows
        self._grow(self.count + n)
        count = jnp.int32(self.count)
        if self._quantized:
            from ..ops.topk import quantize_rows

            q_rows, row_scales = quantize_rows(padded)
            self.buf = _append_rows_cached(self.mesh)(
                self.buf, jnp.asarray(q_rows), count
            )
            self._scales = _append_scales_cached(self.mesh)(
                self._scales, jnp.asarray(row_scales), count
            )
        else:
            self.buf = _append_rows_cached(self.mesh)(
                self.buf, jnp.asarray(padded), count
            )
        self.count += n

    # -- lookups ---------------------------------------------------------------

    def _pad_queries(self, queries: np.ndarray) -> np.ndarray:
        b = queries.shape[0]
        b_quantum = max(8, self.n_dp * 8)
        b_pad = append_ops.round_up(b, b_quantum)
        # bf16 stores take bf16 queries on the wire: the per-shard kernels
        # cast queries to the store dtype before the matmul either way, so
        # rounding on the host halves the upload bytes with identical
        # selection (see VectorStore._query_upload_dtype).
        dtype = (
            ml_dtypes.bfloat16 if self._dtype == jnp.bfloat16 else np.float32
        )
        q = np.zeros((b_pad, self.dim_pad), dtype=dtype)
        q[:b, : self.dim] = queries
        return q

    def _device_args(self, q: np.ndarray, min_score: float):
        args = [self.buf]
        if self._quantized:
            args.append(self._scales)
        return args, (
            jax.device_put(q, _query_sharding(self.mesh)),
            jax.device_put(jnp.asarray([self.count], jnp.int32), self._rep),
            jax.device_put(jnp.asarray([min_score], jnp.float32), self._rep),
        )

    @staticmethod
    def _collect(vals, idx, b) -> list[list[tuple[int, float]]]:
        # One concurrent fetch (sequential np.asarray calls pay a tunnel
        # round trip each on remote-attached devices).
        vals, idx = jax.device_get((vals, idx))
        vals = vals[:b]
        idx = idx[:b]
        from ..vectorstore import _native_results

        native = _native_results()
        if native is not None:
            # min_score was applied on device; filter only padding (-1).
            vals_c = np.ascontiguousarray(vals, dtype=np.float32)
            idx_c = np.ascontiguousarray(idx, dtype=np.int32)
            return native.build_pairs(vals_c, idx_c, b, vals_c.shape[1], -1e30)
        out = []
        for r in range(b):
            keep = idx[r] >= 0
            out.append(
                [(int(i), float(v)) for v, i in zip(vals[r][keep], idx[r][keep])]
            )
        return out

    def search_dispatch(
        self, queries: np.ndarray, k: int, min_score: float = 0.0
    ) -> tuple:
        """Dispatch a batched lookup WITHOUT materializing results (jax
        dispatch is async); pair with :meth:`collect_search` to pipeline
        many batches without a device round trip between them."""
        self._flush()
        if self.count == 0:
            return ("empty", queries.shape[0])
        b = queries.shape[0]
        q = self._pad_queries(queries)
        k_eff = min(k, self.count)
        if self.search_mode == "approx":
            fn = _sharded_approx_topk_cached(self.mesh, k_eff, self.recall_target)
        else:
            fn = _sharded_topk_cached(self.mesh, k_eff, self._quantized)
        pre, post = self._device_args(q, min_score)
        vals, idx = fn(*pre, *post)
        return (vals, idx, b)

    def collect_search(self, handle: tuple) -> list[list[tuple[int, float]]]:
        """Materialize a search_dispatch handle."""
        if handle[0] == "empty":
            return [[] for _ in range(handle[1])]
        vals, idx, b = handle
        return self._collect(vals, idx, b)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        min_score: float = 0.0,
    ) -> list[list[tuple[int, float]]]:
        """Batched distributed lookup -> per-query (ordinal, score) lists.

        ``search_mode="ivf"`` stores with a built snapshot route through the
        per-shard IVF program (exact full scan until :meth:`build_ivf`)."""
        if self.search_mode == "ivf" and self._ivf is not None:
            return self.search_ivf(queries, k, min_score)[0]
        return self.collect_search(self.search_dispatch(queries, k, min_score))

    # -- sharded IVF (per-shard learned buckets; parallel/ivf.py) -----------

    def build_ivf(self, **build_kwargs: Any) -> None:
        """Snapshot the live rows into per-shard IVF indexes.

        Build compute runs on each owning device (no cross-shard traffic);
        rows appended afterwards are found via an exact interval scan of
        the suffix until the next build_ivf(). No-op on an empty store.
        """
        from .ivf import build_sharded_ivf

        self._flush()
        if self.count == 0:
            return
        self._ivf = build_sharded_ivf(self, **build_kwargs)

    def search_ivf(
        self,
        queries: np.ndarray,
        k: int,
        min_score: float = 0.0,
    ) -> tuple[list[list[tuple[int, float]]], list[bool]]:
        """Distributed IVF lookup -> (per-query results, per-query certs).

        A True cert means the result is provably the exact top-k (up to eps
        ties): every shard certified its excluded buckets and all outlier
        tails + the post-snapshot suffix were scanned exactly.
        """
        from .ivf import sharded_ivf_search_dispatch

        self._flush()
        b = queries.shape[0]
        if self.count == 0:
            return [[] for _ in range(b)], [True] * b
        if self._ivf is None:
            raise RuntimeError("search_ivf before build_ivf")
        k_eff = min(k, self.count)
        vals, idx, cert = sharded_ivf_search_dispatch(
            self, self._ivf, self._pad_queries(queries), k_eff, min_score
        )
        certs = np.asarray(jax.device_get(cert))[:b].tolist()
        results = self._collect(vals, idx, b)
        # Rows appended after the snapshot: exact interval scan, merged in
        # score space (the suffix is exact, so certificates stay sound).
        if self.count > self._ivf.built_count:
            extra = self.search_intervals(
                queries,
                np.asarray([[self._ivf.built_count, self.count]]),
                k_eff,
                min_score,
            )
            for r in range(b):
                merged = results[r] + extra[r]
                merged.sort(key=lambda t: -t[1])
                results[r] = merged[:k_eff]
        return results, certs

    def search_subset(
        self,
        queries: np.ndarray,
        ordinals: list[int] | np.ndarray,
        k: int,
        min_score: float = 0.0,
    ) -> list[list[tuple[int, float]]]:
        """Exact top-k restricted to a set of global ordinals.

        The subset becomes a device-side row mask sharded with the matrix, so
        scoped search runs the same fused SPMD scan as a global one.
        """
        self._flush()
        ordinals = np.asarray(ordinals, dtype=np.int64)
        if self.count == 0 or ordinals.size == 0:
            return [[] for _ in range(queries.shape[0])]
        mask = np.zeros((self.buf.shape[0],), dtype=bool)
        mask[ordinals[ordinals < self.count]] = True
        return self.search_masked(queries, mask, k, min_score)

    def search_masked(
        self,
        queries: np.ndarray,
        mask: np.ndarray,
        k: int,
        min_score: float = 0.0,
    ) -> list[list[tuple[int, float]]]:
        """Exact top-k over rows where ``mask`` (bool, [>=count]) is True."""
        self._flush()
        b = queries.shape[0]
        if self.count == 0:
            return [[] for _ in range(b)]
        full = np.zeros((self.buf.shape[0],), dtype=bool)
        full[: min(mask.shape[0], full.shape[0])] = mask[: full.shape[0]]
        q = self._pad_queries(queries)
        k_eff = min(k, self.count)
        fn = _sharded_subset_topk_cached(self.mesh, k_eff, self._quantized)
        pre, post = self._device_args(q, min_score)
        mask_dev = jax.device_put(full, _vec_sharding(self.mesh))
        vals, idx = fn(*pre, mask_dev, *post)
        return self._collect(vals, idx, b)

    def search_intervals(
        self,
        queries: np.ndarray,
        intervals: np.ndarray,
        k: int,
        min_score: float = 0.0,
    ) -> list[list[tuple[int, float]]]:
        """Exact top-k over rows inside any [start, stop) interval.

        The scoped-corpus fast path: ``intervals`` is a small [S, 2] table
        (one row per owned segment), the mask derives from it ON DEVICE —
        host work and upload are O(S), not O(n_rows).
        """
        self._flush()
        b = queries.shape[0]
        if self.count == 0 or len(intervals) == 0:
            return [[] for _ in range(b)]
        intervals = np.asarray(intervals, dtype=np.int32).reshape(-1, 2)
        s_pad = _bucket_size(intervals.shape[0], _INTERVAL_BUCKETS)
        table = np.zeros((s_pad, 2), dtype=np.int32)
        table[: intervals.shape[0]] = intervals
        q = self._pad_queries(queries)
        k_eff = min(k, self.count)
        fn = _sharded_interval_topk_cached(self.mesh, k_eff, self._quantized)
        pre, post = self._device_args(q, min_score)
        table_dev = jax.device_put(jnp.asarray(table), self._rep)
        vals, idx = fn(*pre, table_dev, *post)
        return self._collect(vals, idx, b)

    def scores(self, queries: np.ndarray) -> np.ndarray:
        """Full masked score matrix [b, count] (host-predicate paths)."""
        self._flush()
        b = queries.shape[0]
        if self.count == 0:
            return np.empty((b, 0), dtype=np.float32)
        q = self._pad_queries(queries)
        fn = _sharded_scores_cached(self.mesh, self._quantized)
        args = [self.buf]
        if self._quantized:
            args.append(self._scales)
        out = fn(
            *args,
            jax.device_put(q, _query_sharding(self.mesh)),
            jax.device_put(jnp.asarray([self.count], jnp.int32), self._rep),
        )
        return np.asarray(out)[:b, : self.count]

    def get_row(self, pos: int) -> np.ndarray:
        """One live row as a host f32 vector (dequantized)."""
        return self.get_rows(pos, pos + 1)[0]

    def get_rows(self, start: int, stop: int) -> np.ndarray:
        """Live rows [start, stop) as host f32 — O(stop-start), not O(n)."""
        self._flush()
        stop = min(stop, self.count)
        if stop <= start:
            return np.empty((0, self.dim), dtype=np.float32)
        rows = self.buf[start:stop, : self.dim].astype(jnp.float32)
        if self._quantized:
            rows = rows * self._scales[start:stop, None]
        return np.asarray(rows)

    # -- persistence -----------------------------------------------------------

    def serialize(self) -> np.ndarray:
        """All live rows as a host array [len, dim] (dequantized)."""
        parts = []
        if self.count:
            rows = self.buf[: self.count, : self.dim].astype(jnp.float32)
            if self._quantized:
                rows = rows * self._scales[: self.count, None]
            parts.append(np.asarray(rows))
        parts.extend(self._pending)
        if not parts:
            return np.empty((0, self.dim), dtype=np.float32)
        return np.concatenate(parts, axis=0)

    def deserialize(self, data: np.ndarray | None) -> None:
        self.clear()
        if data is None:
            return
        data = np.asarray(data, dtype=np.float32)
        if data.ndim < 2 or data.shape[0] == 0:
            return
        assert data.shape[1] == self.dim, (data.shape, self.dim)
        self._pending.append(data)
        self._pending_rows += data.shape[0]

    def clear(self) -> None:
        cap = max(append_ops.MIN_CAPACITY, self._cap_quantum)
        cap = append_ops.round_up(cap, self._cap_quantum)
        self.buf = jax.device_put(
            jnp.zeros((cap, self.dim_pad), dtype=self._dtype), self._sharding
        )
        self._scales = (
            jax.device_put(jnp.ones((cap,), jnp.float32), _vec_sharding(self.mesh))
            if self._quantized
            else None
        )
        self.count = 0
        self._pending.clear()
        self._pending_rows = 0
        self._ivf = None  # derived index: rebuild after a clear/restore
