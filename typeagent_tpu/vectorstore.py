"""Device-resident vector store (the reference's ``VectorBase``, TPU-native).

API and score semantics mirror ``aitools/vectorbase.py`` in the reference:
``score = clip((cos+1)/2, 0, 1)`` (``:44-47``), min-score filter + descending
top-k (``:163-230``), per-model default min-score table (``:31-41``), lazy
embedding-size adoption (``:119-121,248-251``).

Architecture differences (the point of this build):

  * Embeddings live in HBM as a padded ``[capacity, dim_pad]`` buffer with a
    count watermark; appends are in-place ``dynamic_update_slice`` (no O(n)
    copy — the reference's ``np.concatenate`` append is quadratic over an
    ingest, ``vectorbase.py:128,145``).
  * Lookups are **batched**: one fused Pallas matmul+top-k per query *batch*
    (``ops/topk.py``) instead of one serial numpy scan per term.
  * Small appends buffer on the host and flush lazily before the next lookup,
    so per-row adds don't pay a device dispatch each.
"""

from __future__ import annotations

import asyncio
import contextlib
import functools
import threading
from collections.abc import Callable
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from .ops import append, topk

if TYPE_CHECKING:
    from jax.sharding import Mesh

    from .models.embeddings import IEmbeddingModel

DEFAULT_MIN_SCORE = 0.85

# Empirical per-model score cutoffs; parity with the reference's table
# (``aitools/vectorbase.py:31-35``), derived there from the Episode-53
# min_score sweep benchmark.
MODEL_DEFAULT_MIN_SCORES: dict[str, float] = {
    "text-embedding-3-large": 0.74,
    "text-embedding-3-small": 0.73,
    "text-embedding-ada-002": 0.93,
}

_QUERY_BUCKETS = (8, 16, 32, 64, 128, 256, 512)

# Certificate-miss resolution: row count above which a miss escalates
# through a bigger-B IVF pass before the exact subset rescan. Below this
# the full scan is cheap enough that the escalation's extra device round
# trip costs more than it saves (tests shrink it to exercise the path).
_ESCALATE_MIN_ROWS = 2_000_000
# Adaptive escalation floor: skip the bigger-B pass once the EMA of its
# resolved-miss fraction falls below this (resolving fewer than half the
# misses almost never empties an exact-rescan batch, so the pass is a
# pure extra round trip — measured 12% yield at 10M/B=12->24).
_ESCALATE_MIN_YIELD = 0.5
_SUBSET_MIN_BUCKET = 64
# Row count above which "exact" lookups auto-route to the two-phase exact2
# engine (bucket-select + certified rescore): below this the one-phase
# kernel's single dispatch wins; above it the phase-2 rescore cost is
# amortized by running phase 1 at the matmul floor.
EXACT2_MIN_ROWS = 131_072


def get_default_min_score(model_name: str) -> float:
    """Repository default score cutoff for a known embedding model name."""
    return MODEL_DEFAULT_MIN_SCORES.get(model_name, DEFAULT_MIN_SCORE)


def cosine_to_score(cosine_similarity: np.ndarray) -> np.ndarray:
    """Map cosine similarity from -1..1 to the public 0..1 score scale."""
    return np.clip((cosine_similarity + 1.0) / 2.0, 0.0, 1.0)


@dataclass
class ScoredInt:
    """An integer ordinal paired with its similarity score."""

    item: int
    score: float


# Result materialization is a measured serve-path bottleneck: a batch-256
# top-10 lookup builds 2,560 records and the Python dataclass loop costs
# ~9 ms — more than the device compute at 1M x 384. The native builder
# (native/results.cpp, a CPython extension) does it in one C pass; its
# ScoredInt type is attribute- and equality-compatible with the dataclass
# above (duck-typed richcompare), so the two interoperate freely and the
# dataclass stays the public/fallback type. Loaded — and built, on a fresh
# checkout — LAZILY on the first materialization: importing this module
# must never spawn a compiler subprocess. Opt out: TAT_NATIVE=0.
from . import native as _native_mod

_NATIVE_RESULTS_CACHE: list = []  # [module_or_None] once resolved


def _native_results():
    if not _NATIVE_RESULTS_CACHE:
        _NATIVE_RESULTS_CACHE.append(_native_mod.load_results_module())
    return _NATIVE_RESULTS_CACHE[0]


def _materialize_rows(vals, idx, b: int, min_score: float):
    """[b, k] fetched device buffers -> list[list[ScoredInt]] (order kept;
    entries with score < min_score or ordinal < 0 dropped)."""
    native = _native_results()
    if native is not None:
        vals_c = np.ascontiguousarray(vals[:b], dtype=np.float32)
        idx_c = np.ascontiguousarray(idx[:b], dtype=np.int32)
        return native.build(vals_c, idx_c, b, vals_c.shape[1], float(min_score))
    results = []
    for r in range(b):
        keep = (vals[r] >= min_score) & (idx[r] >= 0)
        results.append(
            [ScoredInt(int(i), float(v)) for v, i in zip(vals[r][keep], idx[r][keep])]
        )
    return results


class TextEmbeddingIndexSettings:
    """Runtime settings for embedding-backed fuzzy lookup.

    Mirrors the reference settings object (``vectorbase.py:58-79``), plus
    ``dtype`` to opt the device buffer into bf16 storage for bandwidth-bound
    workloads (f32 is the parity default).
    """

    def __init__(
        self,
        embedding_model: IEmbeddingModel | None = None,
        min_score: float | None = None,
        max_matches: int | None = None,
        batch_size: int | None = None,
        dtype: str = "float32",
        mesh: Mesh | None = None,
        search_mode: str = "exact",
        recall_target: float = 0.95,
        query_wire: str = "auto",
    ):
        if embedding_model is None:
            from .models.adapters import create_embedding_model

            embedding_model = create_embedding_model()
        self.embedding_model = embedding_model
        model_name = getattr(self.embedding_model, "model_name", "")
        default_min_score = get_default_min_score(model_name)
        self.min_score = min_score if min_score is not None else default_min_score
        self.max_matches = max_matches if max_matches and max_matches >= 1 else None
        self.batch_size = batch_size if batch_size and batch_size >= 1 else 8
        self.dtype = dtype
        # Optional jax.sharding.Mesh: the store's embedding matrix shards
        # over the mesh's fragment axis (multi-chip conversations).
        self.mesh = mesh
        # "exact" (default): fused exact top-k; large stores auto-route to
        # the two-phase exact2 engine (bucket-select at the matmul floor +
        # certified rescore — same results, ~1.5-2x faster at >=128k rows).
        # "exact1"/"exact2" force the one-/two-phase engine; "approx" rides
        # XLA's hardware approx_max_k at ~recall_target recall (the
        # lossy-but-fastest serving mode).
        # "ivf": learned-bucket IVF + exact outlier tail (ops/ivf.py) —
        # sublinear scans on clustered corpora; requires an explicit
        # VectorStore.build_ivf() snapshot (falls back to the exact2 route
        # until one exists; rows appended after the build are merged via an
        # exact interval scan).
        assert search_mode in (
            "exact", "exact1", "exact2", "approx", "ivf"
        ), search_mode
        if search_mode == "ivf" and dtype == "int8":
            raise ValueError(
                "search_mode='ivf' supports float32/bfloat16 stores only"
            )
        if search_mode == "approx" and dtype == "int8":
            raise ValueError(
                "search_mode='approx' supports float32/bfloat16 stores only "
                "(the int8 path has its own fused kernel)"
            )
        # Mesh-sharded approx: per-shard approx_max_k + all_gather merge
        # (scoped/subset lookups on sharded stores stay exact).
        self.search_mode = search_mode
        self.recall_target = recall_target
        # IVF knobs: buckets rescored per query (recall lever), the exiled
        # outlier fraction at build, and whether an uncertified result
        # triggers an unconditionally-exact one-phase rerun (strict mode:
        # exact results always, sublinear speed only where the data allows).
        self.ivf_b = 16
        self.ivf_outlier_frac = 0.1
        self.ivf_certified = False
        # Append lifecycle: rows appended after build_ivf() ride an exact
        # interval scan whose cost grows linearly with appended volume.
        # With ivf_auto_rebuild on, a query that observes the appended
        # fraction past ivf_rebuild_frac spawns a background rebuild that
        # swaps in a fresh snapshot (queries keep serving the old one +
        # interval scan meanwhile; appends during the rebuild copy instead
        # of donating so the build's pinned buffer stays alive).
        self.ivf_rebuild_frac = 0.25
        self.ivf_auto_rebuild = False
        # Query upload ("wire") format. "auto": bf16 stores take bf16
        # queries (selection-identical — the kernels cast queries to the
        # store dtype anyway), f32/int8 stores take f32. "int8": queries
        # quantize per-query on the host and dequantize to bf16 on device —
        # a quarter of the upload bytes for transfer-bound serving, at a
        # small wire-quantization cost (scores shift ~1e-3; recall@10
        # >= 0.99 vs the bf16 wire on random data). bf16 stores only.
        assert query_wire in ("auto", "int8"), query_wire
        if query_wire == "int8" and dtype != "bfloat16":
            raise ValueError("query_wire='int8' requires dtype='bfloat16'")
        self.query_wire = query_wire


def _ivf_suffix_merged_body(
    emb_r: jax.Array,
    perm: jax.Array,
    centroids: jax.Array,
    radius: jax.Array,
    bucket_fill: jax.Array,
    count_in: jax.Array,
    out_emb: jax.Array,
    out_perm: jax.Array,
    count_out: jax.Array,
    buf: jax.Array,
    q: jax.Array,
    count: jax.Array,
    ivf_count: jax.Array,
    *,
    k: int,
    B: int,
    use_pallas: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    from .ops.ivf import _ivf_topk_impl

    vals, idx, cert = _ivf_topk_impl(
        emb_r, perm, centroids, radius, bucket_fill, count_in, out_emb,
        out_perm, count_out, q, k=k, B=B, use_pallas=use_pallas,
    )
    intervals = jnp.stack([ivf_count, count]).astype(jnp.int32).reshape(1, 2)
    v2, i2 = topk.topk_program_intervals(buf, q, count, intervals, k, use_pallas)
    sv = jnp.concatenate([vals, v2], axis=1)
    si = jnp.concatenate([idx, i2], axis=1)
    mv, pos = jax.lax.top_k(sv, k)
    mi = jnp.take_along_axis(si, pos, axis=1)
    return mv, mi, cert


@functools.partial(jax.jit, static_argnames=("k", "B", "use_pallas"))
def _ivf_suffix_merged(
    emb_r: jax.Array,
    perm: jax.Array,
    centroids: jax.Array,
    radius: jax.Array,
    bucket_fill: jax.Array,
    count_in: jax.Array,
    out_emb: jax.Array,
    out_perm: jax.Array,
    count_out: jax.Array,
    buf: jax.Array,
    q: jax.Array,
    count: jax.Array,
    ivf_count: jax.Array,
    *,
    k: int,
    B: int,
    use_pallas: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """IVF snapshot search + exact interval scan of the appended suffix
    ``[ivf_count, count)`` + score-space merge, fused into ONE device
    program. ``count``/``ivf_count`` are dynamic (appends don't recompile);
    only buffer growth does."""
    return _ivf_suffix_merged_body(
        emb_r, perm, centroids, radius, bucket_fill, count_in, out_emb,
        out_perm, count_out, buf, q, count, ivf_count,
        k=k, B=B, use_pallas=use_pallas,
    )


@functools.partial(jax.jit, static_argnames=("k", "B", "use_pallas"))
def _ivf_topk_many(
    emb_r: jax.Array,
    perm: jax.Array,
    centroids: jax.Array,
    radius: jax.Array,
    bucket_fill: jax.Array,
    count_in: jax.Array,
    out_emb: jax.Array,
    out_perm: jax.Array,
    count_out: jax.Array,
    qs: jax.Array,  # [R, b_pad, d_pad]
    *,
    k: int,
    B: int,
    use_pallas: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """R coalesced query batches through the IVF snapshot in ONE dispatch
    (the serving twin of ``ops.topk.topk_many``)."""
    from .ops.ivf import _ivf_topk_impl

    return jax.lax.map(
        lambda q: _ivf_topk_impl(
            emb_r, perm, centroids, radius, bucket_fill, count_in, out_emb,
            out_perm, count_out, q, k=k, B=B, use_pallas=use_pallas,
        ),
        qs,
    )


@functools.partial(jax.jit, static_argnames=("k", "B", "use_pallas"))
def _ivf_suffix_merged_many(
    emb_r: jax.Array,
    perm: jax.Array,
    centroids: jax.Array,
    radius: jax.Array,
    bucket_fill: jax.Array,
    count_in: jax.Array,
    out_emb: jax.Array,
    out_perm: jax.Array,
    count_out: jax.Array,
    buf: jax.Array,
    qs: jax.Array,  # [R, b_pad, d_pad]
    count: jax.Array,
    ivf_count: jax.Array,
    *,
    k: int,
    B: int,
    use_pallas: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """R coalesced batches of snapshot search + appended-suffix scan."""
    return jax.lax.map(
        lambda q: _ivf_suffix_merged_body(
            emb_r, perm, centroids, radius, bucket_fill, count_in, out_emb,
            out_perm, count_out, buf, q, count, ivf_count,
            k=k, B=B, use_pallas=use_pallas,
        ),
        qs,
    )


@jax.jit
def _dequant_queries(qi: jax.Array, scales: jax.Array) -> jax.Array:
    """int8-wire queries -> bf16 on device (scales broadcast per query)."""
    sc = scales.astype(jnp.bfloat16)
    if qi.ndim == 3:
        return qi.astype(jnp.bfloat16) * sc[:, :, None]
    return qi.astype(jnp.bfloat16) * sc[:, None]


def _quantize_queries_host(
    q: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-query symmetric int8 quantization (the query twin of
    ``ops.topk.quantize_rows``); q: [..., d] f32 -> (int8 [..., d],
    scales [...] f32)."""
    amax = np.abs(q).max(axis=-1)
    scales = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    qi = np.clip(np.round(q / scales[..., None]), -127, 127).astype(np.int8)
    return qi, scales


def _int8_wire_upload(
    queries: np.ndarray, b_pad: int, dim_pad: int, size: int
) -> jax.Array:
    """Upload queries as int8 + per-query scales (a quarter of the f32
    bytes) and dequantize to bf16 on device. Zero-padded slots carry scale
    0, so they dequantize to the same zero rows the float wire pads with."""
    q = np.asarray(queries, dtype=np.float32)
    b = q.shape[0]
    qi = np.zeros((b_pad, dim_pad), dtype=np.int8)
    sc = np.zeros((b_pad,), dtype=np.float32)
    qi[:b, :size], sc[:b] = _quantize_queries_host(q)
    return _dequant_queries(jnp.asarray(qi), jnp.asarray(sc))


def _int8_wire_upload_many(
    qb: np.ndarray, b_pad: int, dim_pad: int, size: int
) -> jax.Array:
    """[R, b, d] twin of :func:`_int8_wire_upload`."""
    q = np.asarray(qb, dtype=np.float32)
    r_n, b = q.shape[0], q.shape[1]
    qi = np.zeros((r_n, b_pad, dim_pad), dtype=np.int8)
    sc = np.zeros((r_n, b_pad), dtype=np.float32)
    qi[:, :b, :size], sc[:, :b] = _quantize_queries_host(q)
    return _dequant_queries(jnp.asarray(qi), jnp.asarray(sc))


def _bucket(n: int, buckets=_QUERY_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return append.round_up(n, buckets[-1])


class VectorStore:
    """Append-only store of L2-normalized embeddings with fused device top-k."""

    settings: TextEmbeddingIndexSettings

    def __init__(self, settings: TextEmbeddingIndexSettings | None = None):
        self.settings = settings or TextEmbeddingIndexSettings()
        self._model = self.settings.embedding_model
        self._quantized = self.settings.dtype == "int8"
        if self._quantized:
            self._dtype = jnp.int8
        elif self.settings.dtype == "bfloat16":
            self._dtype = jnp.bfloat16
        else:
            self._dtype = jnp.float32
        self._scales: jax.Array | None = None  # per-row scales (int8 mode)
        self._ivf = None  # ops.ivf.IVFState snapshot (search_mode="ivf")
        self._ivf_count = 0  # rows covered by the snapshot
        # Adaptive certificate-miss escalation: EMA of the fraction of
        # misses the bigger-B IVF pass resolved. Cert rate saturates in B
        # (a corpus property — queries near cluster boundaries never
        # certify at any affordable B), so when escalation stops paying we
        # learn to skip it: measured at 10M/B=12->24 it resolved only 12%
        # of misses while costing an extra device round trip. None = not
        # yet tried (optimistic: try once and learn).
        self._esc_ema: float | None = None
        # bf16 selection shadow: one (key, shadow) tuple — atomic swap
        self._shadow_cache: tuple | None = None
        self._embedding_size = 0
        self._dim_pad = 0
        self._buf: jax.Array | None = None
        self._count = 0  # rows committed to the device buffer
        self._reserve_hint = 0  # known final size (see reserve())
        self._pending: list[np.ndarray] = []  # host rows awaiting flush
        self._pending_rows = 0
        # Lookups from concurrent serving threads (LookupBatcher with
        # max_inflight > 1) all call _flush; the flush body must run once.
        self._flush_lock = threading.Lock()
        # Guards ONLY the pending list + row counter. Appends (event-loop
        # thread) run concurrently with flushes (executor threads); without
        # a shared lock, a row appended between the flush's concatenate and
        # its clear() would be destroyed unflushed. This lock is never held
        # across device work, so appends never stall behind a dispatch.
        self._pending_lock = threading.Lock()
        # Per-event-loop LookupBatcher for the async lookup route (created
        # lazily; rebound if the store outlives the loop, as in test suites
        # running many asyncio.run() calls).
        self._batcher = None
        self._batcher_loop = None
        # Background-IVF-rebuild pin: while > 0 a rebuild thread is reading
        # the captured buffer, so flushes append/grow WITHOUT donation (the
        # in-place update would delete the array under the build). Guarded
        # by _flush_lock.
        self._buf_pins = 0
        self._ivf_rebuild_thread: threading.Thread | None = None
        # Mesh mode: the device state is a row-sharded store instead of a
        # single-chip buffer (created lazily once the embedding size is
        # known); host-side pending/scoring semantics stay identical.
        self._mesh = getattr(self.settings, "mesh", None)
        self._sharded = None

    # -- embedding model passthrough (parity: vectorbase.py:94-106) --------

    async def get_embedding(self, key: str, cache: bool = True) -> np.ndarray:
        if cache:
            return await self._model.get_embedding(key)
        return await self._model.get_embedding_nocache(key)

    async def get_embeddings(self, keys: list[str], cache: bool = True) -> np.ndarray:
        if cache:
            return await self._model.get_embeddings(keys)
        return await self._model.get_embeddings_nocache(keys)

    # -- size / shape -------------------------------------------------------

    def __len__(self) -> int:
        return self._count + self._pending_rows

    def __bool__(self) -> bool:  # an empty index must not be falsy
        return True

    @property
    def embedding_size(self) -> int:
        return self._embedding_size

    def _set_embedding_size(self, size: int) -> None:
        assert size > 0
        self._embedding_size = size
        self._dim_pad = append.round_up(size, append.LANES)

    # -- appends ------------------------------------------------------------

    def add_embedding(
        self, key: str | None, embedding: np.ndarray | list[float]
    ) -> None:
        row = np.asarray(embedding, dtype=np.float32)
        if self._embedding_size == 0:
            self._set_embedding_size(row.shape[-1])
        if row.shape[-1] != self._embedding_size:
            raise ValueError(
                f"Embedding size mismatch: expected {self._embedding_size}, "
                f"got {row.shape[-1]}"
            )
        with self._pending_lock:
            self._pending.append(row.reshape(1, -1))
            self._pending_rows += 1
        if key is not None:
            self._model.add_embedding(key, row)

    def add_embeddings(self, keys: list[str] | None, embeddings: np.ndarray) -> None:
        embeddings = np.asarray(embeddings, dtype=np.float32)
        if embeddings.ndim != 2:
            raise ValueError(f"Expected 2D embeddings array, got {embeddings.ndim}D")
        if self._embedding_size == 0:
            self._set_embedding_size(embeddings.shape[1])
        if embeddings.shape[1] != self._embedding_size:
            raise ValueError(
                f"Embedding size mismatch: expected {self._embedding_size}, "
                f"got {embeddings.shape[1]}"
            )
        if embeddings.shape[0]:
            with self._pending_lock:
                self._pending.append(embeddings)
                self._pending_rows += embeddings.shape[0]
        if keys is not None:
            for key, emb in zip(keys, embeddings):
                self._model.add_embedding(key, emb)

    async def add_key(self, key: str, cache: bool = True) -> None:
        emb = await self.get_embedding(key, cache=cache)
        self.add_embedding(key if cache else None, emb)

    async def add_keys(self, keys: list[str], cache: bool = True) -> np.ndarray | None:
        if not keys:
            return None
        embeddings = await self.get_embeddings(keys, cache=cache)
        self.add_embeddings(keys if cache else None, embeddings)
        return embeddings

    def _initial_capacity(self, n: int) -> int:
        """First-buffer capacity: pow2 headroom by default; a reserve()
        hint switches to exact 1024-quantum sizing (near HBM capacity a
        pow2 jump wastes up to 2x — 12.9 GB where 7.7 suffices at 10M)."""
        if self._reserve_hint >= n:
            return append.round_up(
                max(self._reserve_hint, append.MIN_CAPACITY), 1024
            )
        return max(append.MIN_CAPACITY, 1 << (n - 1).bit_length())

    def reserve(self, n_rows: int) -> None:
        """Declare the store's expected final row count before bulk ingest.

        Sizes the device buffer to ``round_up(n_rows, 1024)`` instead of
        pow2 doubling — for near-HBM-capacity corpora where the doubling
        headroom does not fit. Appends beyond the reservation fall back to
        the doubling policy.
        """
        with self._flush_lock:
            self._reserve_hint = max(self._reserve_hint, int(n_rows))
            if (
                self._buf is not None
                and self._buf.shape[0] < self._reserve_hint
            ):
                self._buf = append.grow_buffer(
                    self._buf,
                    self._reserve_hint,
                    exact_capacity=self._reserve_hint,
                    donate=not self._buf_pins,
                )
                if self._quantized:
                    pad_n = self._buf.shape[0] - self._scales.shape[0]
                    self._scales = jnp.pad(
                        self._scales, (0, pad_n), constant_values=1.0
                    )

    def load_device_rows(self, rows: jax.Array) -> None:
        """Bulk-adopt embedding rows already resident on the device.

        The zero-host-round-trip ingest path: when embeddings are produced on
        the TPU (an on-device encoder, a generator, a checkpoint restore),
        this pads/casts/quantizes and writes them into the store buffer
        entirely on device — no 1.5 GB/1M-row host detour. Rows must be
        L2-normalized ``[n, embedding_size]`` f32/bf16.
        """
        if self._mesh is not None:
            raise ValueError("load_device_rows: use the sharded append path")
        n, size = rows.shape
        if self._embedding_size == 0:
            self._set_embedding_size(size)
        if size != self._embedding_size:
            raise ValueError(
                f"Embedding size mismatch: expected {self._embedding_size}, "
                f"got {size}"
            )
        if n == 0:
            self._flush()
            return
        # Under the flush lock end to end: growing/appending donates the
        # previous buffer, so a concurrent serving dispatch must never
        # observe the half-updated state.
        with self._flush_lock:
            self._flush_locked()
            # Pad at the SOURCE dtype: the append jit casts to the buffer
            # dtype and quantize_rows_device casts to f32 internally, so an
            # eager f32 materialization here would only add a full-size HBM
            # intermediate (~15 GB for a 10M x 384 bf16 ingest).
            padded = jnp.pad(rows, ((0, 0), (0, self._dim_pad - size)))
            if self._buf is None:
                cap = self._initial_capacity(n)
                self._buf = append.make_buffer(cap, self._dim_pad, self._dtype)
                if self._quantized:
                    self._scales = jnp.ones((cap,), dtype=jnp.float32)
            elif self._count + n > self._buf.shape[0]:
                self._buf = append.grow_buffer(
                    self._buf, self._count + n,
                    exact_capacity=self._reserve_hint or None,
                    donate=not self._buf_pins,
                )
                if self._quantized:
                    pad_n = self._buf.shape[0] - self._scales.shape[0]
                    self._scales = jnp.pad(
                        self._scales, (0, pad_n), constant_values=1.0
                    )
            if self._quantized:
                q_rows, row_scales = topk.quantize_rows_device(padded)
                self._buf = append.append_rows(
                self._buf, q_rows, self._count, donate=not self._buf_pins
            )
                self._scales = jax.lax.dynamic_update_slice(
                    self._scales, row_scales, (self._count,)
                )
            else:
                self._buf = append.append_rows(
                self._buf, padded, self._count, donate=not self._buf_pins
            )
            self._count += n

    def _sharded_store(self):
        if self._sharded is None:
            from .parallel.sharded import ShardedVectorStore

            self._sharded = ShardedVectorStore(
                self._mesh,
                self._embedding_size,
                dtype=self.settings.dtype,
                search_mode=self.settings.search_mode,
                recall_target=self.settings.recall_target,
            )
        return self._sharded

    def _flush(self) -> None:
        # No pre-lock fast path: the flush body clears _pending BEFORE the
        # buffer write lands, so an unlocked emptiness check would let a
        # concurrent serving thread read a half-flushed store (count still
        # 0) and return empty results. Uncontended acquire is ~100 ns —
        # noise next to any device call.
        with self._flush_lock:
            self._flush_locked()

    @contextlib.contextmanager
    def _dispatch_view(self):
        """Flush, then hold the flush lock while the caller DISPATCHES
        device programs against the yielded ``(buf, scales, count)``.

        Serving runs lookups on multiple executor threads while ingest
        flushes concurrently. Two hazards force this discipline: (a) a
        flush grows/swaps the buffer and bumps the count, so reading live
        attributes piecemeal could pair the OLD buffer with the NEW count
        (zero-padded rows scoring 0.5 surface as phantom hits) or read the
        buffer twice across a swap (shape mismatch in the hybrid engine);
        (b) appends DONATE the previous buffer (in-place device update), so
        a capture that outlives a concurrent flush points at a deleted
        array. Holding the lock for just the (async, sub-ms) JAX dispatch
        closes both while flushes and the long result fetches still
        overlap — fetch device results OUTSIDE the ``with`` block.
        """
        with self._flush_lock:
            self._flush_locked()
            yield self._buf, self._scales, self._count

    def _rerun_exact1(self, q: jax.Array, k: int, count: int):
        """Certificate-miss rerun against the CURRENT buffer, windowed to
        the row count the original dispatch saw (append-only rows make that
        exactly the original store state; the original capture's buffer may
        have been donated away by a flush since)."""
        with self._flush_lock:
            out = self._topk_exact1(q, k, self._buf, self._scales, count)
        return jax.device_get(out)

    def _resolve_cert_misses(
        self,
        vals: np.ndarray,
        idx: np.ndarray,
        cert_h: np.ndarray,
        q: jax.Array,
        k: int,
        count: int,
        b: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-query certificate-miss resolution.

        The check is sliced to the ``b`` REAL queries: zero-padded query
        rows can never certify under the IVF bound (any excluded bucket's
        bound ``q.c + r = r > 0`` beats their all-zero k-th score), so an
        all-rows check would rerun every padded batch unconditionally.

        Real misses escalate PER QUERY instead of rerunning the whole
        batch: one bigger-B IVF pass (4x B, capped at every bucket) over
        just the missed queries, then the unconditional one-phase exact
        kernel for any still-uncertified stragglers. Rerun cost scales
        with the miss fraction (e.g. ~7% of queries at 10M rows / B=12)
        instead of with the batch size — the old whole-batch exact rerun
        fired on essentially every batch-256 certified dispatch. Rows
        whose certificate held are returned untouched; every replaced row
        is exact (escalated rows are kept only when their own certificate
        holds; the rest are rescanned exactly).
        """
        miss = np.flatnonzero(~np.asarray(cert_h)[:b])
        if miss.size == 0:
            return vals, idx
        vals = np.array(vals)
        idx = np.array(idx)
        q_host = np.asarray(q)
        state = self._ivf
        # The B-escalation hop pays only when (a) the full scan is
        # expensive — below ~2M rows the one-phase subset rescan alone
        # costs less than the extra device round trip (measured on the
        # real chip: each resolution stage is RTT-bound, ~30 ms through
        # the tunnel, while a 200k-row scan is ~1 ms) — and (b) misses are
        # the exception: when most of the batch failed to certify the
        # data isn't giving certificates at this scale (cert rate is a
        # corpus property), so the middle pass mostly fails too and the
        # subset rescan reads the store once either way.
        if (
            count >= _ESCALATE_MIN_ROWS
            and 2 * miss.size <= b
            and self.settings.search_mode == "ivf"
            and state is not None
            and (self._esc_ema is None or self._esc_ema >= _ESCALATE_MIN_YIELD)
        ):
            b0 = min(self.settings.ivf_b, state.n_buckets)
            b_esc = min(4 * max(b0, 1), state.n_buckets)
            if topk._use_pallas() and topk._platform_of(self._buf) == "tpu":
                # Past the Pallas rescore window the XLA fallback gather
                # materializes B*128 rows per query and can OOM next to a
                # large store — cap escalation to what the kernel takes.
                b_esc = min(
                    b_esc,
                    topk.max_rescore_b(
                        state.emb_r.shape[1], state.emb_r.dtype.itemsize
                    ),
                )
            if b_esc > b0:
                out = self._rerun_ivf(
                    self._pad_query_rows(q_host[miss]), k, count, b_esc
                )
                if out is not None:
                    v2, i2, c2 = out
                    m = miss.size
                    vals[miss] = v2[:m]
                    idx[miss] = i2[:m]
                    miss = miss[~c2[:m]]
                    # Learn whether escalation pays on THIS corpus: EMA of
                    # the resolved fraction. Resolving a miss only saves
                    # work when it empties exact-rescan batches, so a low
                    # yield means the extra round trip is pure cost.
                    resolved = 1.0 - miss.size / m
                    self._esc_ema = (
                        resolved
                        if self._esc_ema is None
                        else 0.7 * self._esc_ema + 0.3 * resolved
                    )
                    if miss.size == 0:
                        return vals, idx
        v3, i3 = self._rerun_exact1(
            self._pad_query_rows(q_host[miss]), k, count
        )
        vals[miss] = v3[: miss.size]
        idx[miss] = i3[: miss.size]
        return vals, idx

    def _pad_query_rows(self, sub: np.ndarray) -> jax.Array:
        """Re-pad a host slice of an already dim-padded, upload-dtype query
        array back to the next batch bucket (zero rows, exactly like
        :meth:`_pad_queries` pads)."""
        m = sub.shape[0]
        m_pad = _bucket(m)
        if m_pad != m:
            out = np.zeros((m_pad, sub.shape[1]), dtype=sub.dtype)
            out[:m] = sub
            sub = out
        return jnp.asarray(sub)

    def _rerun_ivf(
        self, q: jax.Array, k: int, count: int, B: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Escalated-B IVF rerun for certificate misses, against the same
        snapshot + appended-suffix interval the original dispatch saw.
        Returns host ``(vals, idx, cert)``, or None when escalation can't
        apply (no snapshot, or a background rebuild swapped a NEWER
        snapshot in mid-flight — its buckets could surface rows past
        ``count``; the windowed exact1 path handles those instead)."""
        from .ops.ivf import ivf_topk_program

        with self._flush_lock:
            state = self._ivf
            if state is None or count < self._ivf_count:
                return None
            use_pallas = (
                topk._use_pallas() and topk._platform_of(self._buf) == "tpu"
            )
            if count == self._ivf_count:
                out = ivf_topk_program(
                    *state, q, k, B=B, use_pallas=use_pallas
                )
            else:
                out = _ivf_suffix_merged(
                    *state,
                    self._buf,
                    q,
                    jnp.asarray(count, jnp.int32),
                    jnp.asarray(self._ivf_count, jnp.int32),
                    k=k,
                    B=min(B, state.n_buckets),
                    use_pallas=use_pallas,
                )
        return jax.device_get(out)

    def _take_pending(self) -> np.ndarray | None:
        """Atomically detach the pending rows for a flush.

        The hand-off must happen under _pending_lock: an event-loop append
        landing between an unlocked concatenate and clear() would be wiped
        without ever reaching the device buffer.
        """
        with self._pending_lock:
            if not self._pending:
                return None  # nothing new (or another serving thread flushed)
            pending = self._pending
            self._pending = []
            self._pending_rows = 0
        return np.concatenate(pending, axis=0)

    def _flush_locked(self) -> None:
        rows = self._take_pending()
        if rows is None:
            return
        if self._mesh is not None:
            store = self._sharded_store()
            store.append(rows)
            self._count = len(store)
            return
        n = rows.shape[0]
        # bf16 stores take bf16 rows on the wire: the device append casts
        # to the buffer dtype anyway, so host-side rounding halves the
        # ingest upload bytes bit-identically. int8 quantization needs the
        # f32 rows (it happens on host below), f32 stores keep f32.
        row_dtype = np.float32 if self._quantized else self._query_upload_dtype()
        padded = np.zeros((n, self._dim_pad), dtype=row_dtype)
        padded[:, : self._embedding_size] = rows
        if self._buf is None:
            cap = self._initial_capacity(n)
            self._buf = append.make_buffer(cap, self._dim_pad, self._dtype)
            if self._quantized:
                self._scales = jnp.ones((cap,), dtype=jnp.float32)
        elif self._count + n > self._buf.shape[0]:
            self._buf = append.grow_buffer(
                self._buf, self._count + n,
                exact_capacity=self._reserve_hint or None,
                donate=not self._buf_pins,
            )
            if self._quantized:
                new_cap = self._buf.shape[0]
                pad_n = new_cap - self._scales.shape[0]
                self._scales = jnp.pad(
                    self._scales, (0, pad_n), constant_values=1.0
                )
        if self._quantized:
            q_rows, row_scales = topk.quantize_rows(padded)
            self._buf = append.append_rows(
                self._buf, q_rows, self._count, donate=not self._buf_pins
            )
            self._scales = jax.lax.dynamic_update_slice(
                self._scales, jnp.asarray(row_scales), (self._count,)
            )
        else:
            self._buf = append.append_rows(
                self._buf, padded, self._count, donate=not self._buf_pins
            )
        self._count += n

    # -- lookups ------------------------------------------------------------

    def _pad_queries(self, queries: np.ndarray) -> jax.Array:
        b = queries.shape[0]
        b_pad = _bucket(b)
        if self.settings.query_wire == "int8":
            return _int8_wire_upload(
                queries, b_pad, self._dim_pad, self._embedding_size
            )
        out = np.zeros((b_pad, self._dim_pad), dtype=self._query_upload_dtype())
        out[:b, : self._embedding_size] = queries
        return jnp.asarray(out)

    def _query_upload_dtype(self) -> np.dtype:
        """Host dtype for query upload.

        Every device kernel casts queries to the store dtype before the
        matmul (``q.astype(emb.dtype)``), so for bf16 stores the f32->bf16
        rounding happens either way — doing it on the HOST halves the query
        upload bytes through the tunnel with bit-identical selection. f32
        and int8 stores keep f32 queries (exact-parity semantics; the int8
        kernels score in bf16/f32 against dequantized rows).
        """
        if self._dtype == jnp.bfloat16:
            return np.dtype(ml_dtypes.bfloat16)
        return np.dtype(np.float32)

    def warm_serving(self, max_batch: int = 256, k: int = 10) -> int:
        """Pre-compile the lookup program for every query-batch bucket up
        to ``max_batch`` against the CURRENT buffer shape.

        :meth:`_dispatch_view` holds the flush lock across the JAX
        dispatch; a cold shape (first lookup at a new batch bucket, or the
        first after a buffer growth) pays XLA compilation INSIDE that lock
        — on remote-attached TPUs that is seconds-to-minutes during which
        every concurrent serving thread and ingest flush stalls. Servers
        should call this at startup and after bulk ingests so the compiles
        happen before traffic. Returns the number of lookups dispatched.
        """
        self._flush()
        if len(self) == 0:
            return 0
        dispatched = 0
        for bucket in _QUERY_BUCKETS:
            if bucket > _bucket(max_batch):
                break
            queries = np.zeros((bucket, self._embedding_size), np.float32)
            self.fuzzy_lookup_embeddings_batch(queries, max_hits=k)
            dispatched += 1
        return dispatched

    def fuzzy_lookup_embedding(
        self,
        embedding: np.ndarray,
        max_hits: int | None = None,
        min_score: float | None = None,
        predicate: Callable[[int], bool] | None = None,
    ) -> list[ScoredInt]:
        """Single-query lookup (parity: ``vectorbase.py:163-201``)."""
        return self.fuzzy_lookup_embeddings_batch(
            np.asarray(embedding, dtype=np.float32).reshape(1, -1),
            max_hits=max_hits,
            min_score=min_score,
            predicate=predicate,
        )[0]

    def fuzzy_lookup_embeddings_batch(
        self,
        queries: np.ndarray,
        max_hits: int | None = None,
        min_score: float | None = None,
        predicate: Callable[[int], bool] | None = None,
    ) -> list[list[ScoredInt]]:
        """Batched multi-query lookup — one fused kernel for all queries.

        The reference loops per term (``reltermsindex.py:320-332``); batching
        is the first structural win of the device design.
        """
        if max_hits is None:
            max_hits = 10
        if min_score is None:
            min_score = 0.0
        b = queries.shape[0]
        with self._dispatch_view() as (buf, scales, count):
            if count == 0 or b == 0:
                return [[] for _ in range(b)]

            if predicate is not None:
                # Host-callback path: pull the full masked score matrix and
                # apply the predicate to candidates above the threshold
                # (parity: vectorbase.py:191-201).
                if self._mesh is not None:
                    scores_dev = self._sharded_store().scores(
                        np.asarray(queries, dtype=np.float32)
                    )
                else:
                    scores_dev = self._all_scores(
                        self._pad_queries(queries), buf, scales, count
                    )
            elif self._mesh is not None:
                # Materialize straight from the gathered device buffers (the
                # tuple detour through ShardedVectorStore.search would
                # rebuild every record a second time).
                handle = self._sharded_store().search_dispatch(
                    np.asarray(queries, dtype=np.float32),
                    k=min(max_hits, count),
                    min_score=min_score,
                )
            else:
                q = self._pad_queries(queries)
                k = min(max_hits, count)
                vals, idx, cert = self._topk_dispatch(q, k, buf, scales, count)
        # Fetches below run OUTSIDE the flush lock (a device round trip
        # must not block concurrent ingest).
        if predicate is not None:
            scores = np.asarray(scores_dev)[:b]
            results = []
            for row in scores:
                cand = np.flatnonzero(row >= min_score)
                scored = [
                    ScoredInt(int(i), float(row[i])) for i in cand if predicate(int(i))
                ]
                scored.sort(key=lambda s: s.score, reverse=True)
                results.append(scored[:max_hits])
            return results
        if self._mesh is not None:
            return self._collect_sharded_scored(handle, min_score)
        # ONE concurrent fetch for every output (device_get overlaps the
        # per-array copies): fetching cert, vals, idx sequentially costs a
        # tunnel round trip EACH on remote-attached devices.
        if cert is None:
            vals, idx = jax.device_get((vals, idx))
        else:
            vals, idx, cert_h = jax.device_get((vals, idx, cert))
            vals, idx = self._resolve_cert_misses(
                vals, idx, cert_h, q, k, count, b
            )
        return _materialize_rows(vals, idx, b, min_score)

    def _collect_sharded_scored(
        self, handle, min_score: float
    ) -> list[list[ScoredInt]]:
        """Materialize a ShardedVectorStore dispatch handle into ScoredInt
        rows straight from the gathered device buffers (min_score was
        applied on device; padding carries ordinal -1)."""
        if handle[0] == "empty":
            return [[] for _ in range(handle[1])]
        vals, idx, b = handle
        vals, idx = jax.device_get((vals, idx))
        return _materialize_rows(vals, idx, b, min_score)

    def _all_scores(
        self, q: jax.Array, buf=None, scales=None, count=None
    ) -> jax.Array:
        if buf is None:
            buf, scales, count = self._buf, self._scales, self._count
        if self._quantized:
            return topk.cosine_scores_quantized(buf, scales, q, count)
        return topk.cosine_scores(buf, q, count)

    def _topk_dispatch(
        self, q: jax.Array, k: int, buf: jax.Array, scales, count: int
    ) -> tuple[jax.Array, jax.Array, jax.Array | None]:
        """Dispatch the engine program WITHOUT blocking.

        ``(buf, scales, count)`` come from one :meth:`_dispatch_view`
        capture (call this inside the ``with`` block) so concurrent flushes
        can't tear the view or donate the buffer away mid-dispatch. Returns
        ``(vals, idx, cert)`` device arrays; ``cert`` is None for engines
        with no exactness certificate. Callers fetch all outputs in one
        concurrent ``jax.device_get`` (each separate fetch costs a full
        round trip on remote-attached devices) and re-run via
        :meth:`_rerun_exact1` on a certificate miss.
        """
        if self._quantized:
            vals, idx = topk.cosine_topk_quantized(buf, scales, q, count, k)
            return vals, idx, None
        if self.settings.search_mode == "approx":
            vals, idx = topk.cosine_topk_approx(
                buf, q, count, k, recall_target=self.settings.recall_target
            )
            return vals, idx, None
        if self.settings.search_mode == "ivf" and self._ivf is not None:
            return self._topk_ivf(q, k, buf, count)
        if self._use_exact2(k, count):
            if self._dtype == jnp.float32:
                # Hybrid: bf16-shadow bucket selection (half the HBM read,
                # one MXU pass) + exact f32 VPU rescore — ~2.4x the
                # one-phase f32 kernel with identical results.
                return topk.cosine_topk_exact2_hybrid(
                    buf, self._shadow(buf, count), q, count, k
                )
            return topk.cosine_topk_exact2(buf, q, count, k)
        vals, idx = topk.cosine_topk(buf, q, count, k)
        return vals, idx, None

    def _topk_ivf(self, q: jax.Array, k: int, buf: jax.Array, count: int):
        """IVF dispatch: snapshot search + exact interval scan of any rows
        appended after the snapshot, merged in score space. The certificate
        stays sound across the merge (the suffix is scanned exactly and the
        final k-th score only grows). Returned to callers only in
        ``ivf_certified`` mode, where a cert miss triggers the
        unconditionally-exact one-phase rerun.

        Both routes are ONE jitted dispatch: the no-append route through
        the jitted ivf program, the appended route through
        ``_ivf_suffix_merged`` (snapshot + interval scan + merge fused) —
        eager per-op execution here costs hundreds of tunnel round trips
        per batch (measured 1.7 s vs 30 ms at 131k rows)."""
        from .ops.ivf import ivf_topk_program

        state = self._ivf
        use_pallas = topk._use_pallas() and topk._platform_of(buf) == "tpu"
        if count <= self._ivf_count:
            vals, idx, cert = ivf_topk_program(
                *state, q, k, B=self.settings.ivf_b, use_pallas=use_pallas
            )
        else:
            vals, idx, cert = _ivf_suffix_merged(
                *state,
                buf,
                q,
                jnp.asarray(count, jnp.int32),
                jnp.asarray(self._ivf_count, jnp.int32),
                k=k,
                B=min(self.settings.ivf_b, state.n_buckets),
                use_pallas=use_pallas,
            )
            self._maybe_auto_rebuild_locked(count)
        return vals, idx, (cert if self.settings.ivf_certified else None)

    def _maybe_auto_rebuild_locked(self, count: int) -> None:
        """Query-driven rebuild trigger (caller holds ``_flush_lock``).

        When the appended fraction crosses ``ivf_rebuild_frac``, spawn ONE
        background rebuild; queries keep serving the old snapshot + the
        (growing) exact interval scan until the swap. Lock discipline: the
        caller already holds ``_flush_lock`` so we must not re-acquire it —
        the spawned thread takes it itself inside :meth:`_pinned_view`.
        """
        settings = self.settings
        if not settings.ivf_auto_rebuild:
            return
        appended = count - self._ivf_count
        if appended <= settings.ivf_rebuild_frac * max(self._ivf_count, 1):
            return
        t = self._ivf_rebuild_thread
        if t is not None and t.is_alive():
            return
        t = threading.Thread(
            target=self._rebuild_and_swap, daemon=True, name="tat-ivf-rebuild"
        )
        self._ivf_rebuild_thread = t
        t.start()

    def build_ivf(self, **kwargs: Any) -> None:
        """Snapshot the current rows into an IVF index (ops/ivf.py).

        One-time device cost (~60 s at 1M x 384 through the tunnel; the
        k-means assignment matmul dominates). Rows appended later are
        still found — they ride an exact interval scan until the next
        build_ivf(). No-op on an empty store.
        """
        from .ops.ivf import ivf_build

        self._flush()
        with self._dispatch_view() as (buf, _scales, count):
            if not count:
                return
            kwargs.setdefault(
                "outlier_frac", self.settings.ivf_outlier_frac
            )
            self._ivf = ivf_build(buf, count, **kwargs)
            self._ivf_count = count
            self._esc_ema = None  # new buckets: re-learn escalation yield

    @contextlib.contextmanager
    def _pinned_view(self):
        """Capture ``(buf, count)`` and PIN the buffer: until exit, flushes
        append/grow without donation so the captured array stays alive for
        a long off-lock read (the background IVF rebuild). The lock is held
        only for the capture/unpin bookkeeping, never across the build."""
        with self._flush_lock:
            self._flush_locked()
            self._buf_pins += 1
            buf, count = self._buf, self._count
        try:
            yield buf, count
        finally:
            with self._flush_lock:
                self._buf_pins -= 1

    def build_ivf_background(self, **kwargs: Any) -> threading.Thread | None:
        """Rebuild the IVF snapshot off-thread and swap it in when done.

        Queries keep serving the current snapshot + exact interval scan
        during the build; the swap is atomic under the flush lock. Returns
        the rebuild thread (already-running one if a rebuild is in flight),
        or None on an empty store. ``join()`` it to wait for the swap.
        """
        with self._flush_lock:
            self._flush_locked()
            if not self._count:
                return None
            t = self._ivf_rebuild_thread
            if t is not None and t.is_alive():
                return t
            t = threading.Thread(
                target=self._rebuild_and_swap,
                kwargs=kwargs,
                daemon=True,
                name="tat-ivf-rebuild",
            )
            self._ivf_rebuild_thread = t
        t.start()
        return t

    def _rebuild_and_swap(self, **kwargs) -> None:
        from .ops.ivf import ivf_build

        kwargs.setdefault("outlier_frac", self.settings.ivf_outlier_frac)
        with self._pinned_view() as (buf, count):
            if not count:
                return
            state = ivf_build(buf, count, **kwargs)
        with self._flush_lock:
            # Append-only store: rows [0, count) are bit-identical to what
            # the build read, so the swap is sound; rows appended since
            # keep riding the interval scan past the new _ivf_count.
            if count >= self._ivf_count:
                self._ivf = state
                self._ivf_count = count
                self._esc_ema = None  # new buckets: re-learn escalation yield

    def _topk_exact1(self, q: jax.Array, k: int, buf, scales, count: int):
        """One-phase unconditional-exact rerun (certificate-miss path)."""
        if self._quantized:
            return topk.cosine_topk_quantized(buf, scales, q, count, k)
        return topk.cosine_topk(buf, q, count, k)

    def _shadow(self, buf=None, count=None) -> jax.Array:
        """Cached bf16 cast of the f32 buffer (the exact2 selection shadow);
        rebuilt on device after appends (one ~free cast per ingest batch).
        The cache is a single tuple attribute so concurrent serving threads
        can never observe a key paired with another buffer's shadow."""
        if buf is None:
            buf, count = self._buf, self._count
        key = (id(buf), count)
        cached = self._shadow_cache
        if cached is not None and cached[0] == key:
            return cached[1]
        shadow = buf.astype(jnp.bfloat16)
        self._shadow_cache = (key, shadow)
        return shadow

    def _use_exact2(self, k: int, count: int | None = None) -> bool:
        mode = self.settings.search_mode
        if mode == "exact2":
            return True
        if count is None:
            count = self._count
        return (
            mode == "exact"
            and count >= EXACT2_MIN_ROWS
            and k <= topk._PALLAS_MAX_K
        )

    async def fuzzy_lookup_embeddings_batch_async(
        self,
        queries: np.ndarray,
        max_hits: int | None = None,
        min_score: float | None = None,
    ) -> list[list[ScoredInt]]:
        """Async batched lookup through the store's per-loop LookupBatcher.

        The sync lookup blocks the event loop for a full device round trip
        (~30 ms on tunnel-attached chips), serializing concurrent server
        requests on the data plane. This route (a) runs the device fetch on
        an executor thread so the loop stays live, (b) coalesces lookups
        from concurrent tasks into shared dispatches, and (c) keeps two
        dispatches in flight (double-buffering). Results are identical to
        :meth:`fuzzy_lookup_embeddings_batch`.
        """
        from .serve import LookupBatcher  # local import: serve imports us

        loop = asyncio.get_running_loop()
        if (
            self._batcher is None
            or self._batcher_loop is not loop
            or self._batcher._closed
        ):
            old, old_loop = self._batcher, self._batcher_loop
            if old is not None and not old._closed and old_loop is not None:
                # Don't orphan the previous loop's batcher: its worker would
                # keep waking (or die with a "Task was destroyed" warning)
                # and queued futures would never resolve.
                if old_loop.is_closed():
                    old.close_nowait()
                else:
                    try:
                        old_loop.call_soon_threadsafe(old.close_nowait)
                    except RuntimeError:
                        old.close_nowait()  # loop shut down mid-check
            self._batcher = LookupBatcher(
                self, max_delay_ms=0.2, max_coalesce=16, max_inflight=2
            )
            self._batcher_loop = loop
        return await self._batcher.lookup(
            np.asarray(queries, dtype=np.float32),
            max_hits=10 if max_hits is None else max_hits,
            min_score=0.0 if min_score is None else float(min_score),
        )

    def fuzzy_lookup_embeddings_many(
        self,
        query_batches: np.ndarray,
        max_hits: int | None = None,
        min_score: float | None = None,
    ) -> list[list[list[ScoredInt]]]:
        """R query batches through ONE device dispatch (the coalesced serving
        path): a loaded server pays one tunnel round trip for R batches
        instead of R. ``query_batches``: [R, b, embedding_size].
        """
        if max_hits is None:
            max_hits = 10
        if min_score is None:
            min_score = 0.0
        qb = np.asarray(query_batches)
        if qb.dtype not in (np.float32, self._query_upload_dtype()):
            qb = qb.astype(np.float32)
        if qb.ndim != 3:
            raise ValueError(f"Expected [R, b, d] query batches, got {qb.shape}")
        r_n, b = qb.shape[0], qb.shape[1]
        if self._mesh is not None:
            self._flush()
            if self._count == 0 or r_n == 0 or b == 0:
                return [[[] for _ in range(b)] for _ in range(r_n)]
            # Sharded stores pipeline per-batch dispatches instead (the mesh
            # program already amortizes across shards).
            handles = [
                self.dispatch_lookup(qb[i], max_hits=max_hits) for i in range(r_n)
            ]
            return [self.collect_lookup(h, min_score=min_score) for h in handles]
        with self._dispatch_view() as (buf, scales, count):
            if count == 0 or r_n == 0 or b == 0:
                return [[[] for _ in range(b)] for _ in range(r_n)]
            b_pad = _bucket(b)
            if self.settings.query_wire == "int8":
                q_dev = _int8_wire_upload_many(
                    qb, b_pad, self._dim_pad, self._embedding_size
                )
            else:
                padded = np.zeros(
                    (r_n, b_pad, self._dim_pad), dtype=self._query_upload_dtype()
                )
                padded[:, :b, : self._embedding_size] = qb
                q_dev = jnp.asarray(padded)
            k = min(max_hits, count)
            state = self._ivf
            ivf_route = (
                not self._quantized
                and self.settings.search_mode == "ivf"
                and state is not None
            )
            if ivf_route:
                # Coalesced serving rides the IVF engine too — without
                # this, an IVF store served through the LookupBatcher
                # full-scans on every coalesced dispatch.
                use_pallas = (
                    topk._use_pallas() and topk._platform_of(buf) == "tpu"
                )
                b_ivf = min(self.settings.ivf_b, state.n_buckets)
                if count <= self._ivf_count:
                    out = _ivf_topk_many(
                        *state, q_dev, k=k, B=b_ivf, use_pallas=use_pallas
                    )
                else:
                    out = _ivf_suffix_merged_many(
                        *state,
                        buf,
                        q_dev,
                        jnp.asarray(count, dtype=jnp.int32),
                        jnp.asarray(self._ivf_count, dtype=jnp.int32),
                        k=k,
                        B=b_ivf,
                        use_pallas=use_pallas,
                    )
                    self._maybe_auto_rebuild_locked(count)
                check_certs = self.settings.ivf_certified
            else:
                mode, aux = self._engine_mode(k, buf, scales, count)
                use_pallas = (
                    topk._platform_of(buf) == "tpu" and k <= topk._PALLAS_MAX_K
                )
                out = topk.topk_many(
                    buf,
                    aux,
                    q_dev,
                    jnp.asarray(count, dtype=jnp.int32),
                    k=k,
                    mode=mode,
                    use_pallas=use_pallas,
                    recall_target=self.settings.recall_target,
                )
                check_certs = True  # exact2 certs always gate exactness
        # One concurrent fetch for every output (separate np.asarray calls
        # cost a tunnel round trip each on remote-attached devices); runs
        # OUTSIDE the flush lock so ingest isn't blocked for a round trip.
        leaves = jax.device_get(jax.tree.leaves(out))
        vals, idx = leaves[0], leaves[1]
        if len(leaves) > 2 and check_certs:
            # Per-query certificate resolution over the flattened R x b_pad
            # population: padding slots are pre-certified (they carry no
            # real query), so only genuine misses rerun — as a subset.
            cert = np.array(leaves[2])
            cert[:, b:] = True
            flat = cert.size
            v, i = self._resolve_cert_misses(
                vals.reshape(flat, k),
                idx.reshape(flat, k),
                cert.reshape(flat),
                q_dev.reshape(flat, q_dev.shape[-1]),
                k,
                count,
                flat,
            )
            vals = v.reshape(vals.shape)
            idx = i.reshape(idx.shape)
        vals = vals[:, :b]
        idx = idx[:, :b]
        return [
            _materialize_rows(vals[i], idx[i], b, min_score)
            for i in range(r_n)
        ]

    def _engine_mode(
        self, k: int, buf=None, scales=None, count=None
    ) -> tuple[str, jax.Array | None]:
        """Resolve the engine mode + auxiliary operand for program builders."""
        if buf is None:
            buf, scales, count = self._buf, self._scales, self._count
        if self._quantized:
            return "quantized", scales
        if self.settings.search_mode == "approx":
            return "approx", None
        if self._use_exact2(k, count):
            if self._dtype == jnp.float32:
                return "exact2h", self._shadow(buf, count)
            return "exact2", None
        return "exact1", None

    def dispatch_lookup(
        self,
        queries: np.ndarray,
        max_hits: int = 10,
    ) -> tuple | None:
        """Asynchronously dispatch a batched lookup; returns device handles.

        Pair with :meth:`collect_lookup`. Lets callers pipeline many query
        batches without a device round-trip between them (JAX dispatch is
        async; only result materialization blocks).
        """
        with self._dispatch_view() as (buf, scales, count):
            if count == 0 or queries.shape[0] == 0:
                return None
            if self._mesh is not None:
                # Async dispatch on the mesh too: results materialize in
                # collect_lookup.
                handle = self._sharded_store().search_dispatch(
                    np.asarray(queries, dtype=np.float32),
                    k=min(max_hits, count),
                )
                return ("sharded", handle)
            q = self._pad_queries(queries)
            k = min(max_hits, count)
            # The exact2 certificate must NOT be checked here — np.asarray
            # on it would block, defeating the async dispatch. Defer to
            # collect_lookup. The dispatch-time row count rides the handle
            # so a cert-miss rerun scores the same store state.
            vals, idx, cert = self._topk_dispatch(q, k, buf, scales, count)
            if cert is not None:
                return (vals, idx, queries.shape[0], cert, q, k, count)
            return (vals, idx, queries.shape[0])

    def collect_lookup(
        self,
        handle: tuple | None,
        min_score: float = 0.0,
    ) -> list[list[ScoredInt]]:
        """Materialize a dispatch_lookup handle into scored results."""
        if handle is None:
            return []
        if isinstance(handle[0], str):  # ("sharded", dispatch handle)
            return self._collect_sharded_scored(handle[1], min_score)
        if len(handle) == 7:  # exact2 dispatch: certificate checked here
            vals, idx, b, cert, q, k, count = handle
            # One concurrent fetch for cert+vals+idx (separate fetches cost
            # a tunnel round trip each).
            vals, idx, cert_h = jax.device_get((vals, idx, cert))
            vals, idx = self._resolve_cert_misses(
                vals, idx, cert_h, q, k, count, b
            )
        else:
            vals, idx, b = handle
            vals, idx = jax.device_get((vals, idx))
        return _materialize_rows(vals, idx, b, min_score)

    def _subset_dispatch(
        self,
        embedding: np.ndarray,
        ordinals_of_subset: list[int],
        max_hits: int,
        min_score: float,
    ) -> tuple[object, object] | list[ScoredInt]:
        """Dispatch a subset top-k; returns (vals, idx) device handles.

        Returns a finished result list directly for the trivial (empty) and
        mesh cases — the sharded ``search_subset`` fetches internally.
        Dispatch is async on the device (sub-ms on the host side); callers
        fetch with :meth:`_subset_collect` or an off-loop thread.
        """
        with self._dispatch_view() as (buf, scales, count):
            if not ordinals_of_subset or count == 0:
                return []
            if self._mesh is not None:
                q = np.asarray(embedding, dtype=np.float32).reshape(1, -1)
                raw = self._sharded_store().search_subset(
                    q,
                    ordinals_of_subset,
                    k=min(max_hits, len(ordinals_of_subset)),
                    min_score=min_score,
                )[0]
                return [ScoredInt(i, v) for i, v in raw]
            s = len(ordinals_of_subset)
            s_pad = _bucket(
                s, (_SUBSET_MIN_BUCKET, 128, 256, 512, 1024, 2048, 4096)
            )
            ords = np.full((s_pad,), 0, dtype=np.int32)
            ords[:s] = np.asarray(ordinals_of_subset, dtype=np.int32)
            valid = np.zeros((s_pad,), dtype=bool)
            valid[:s] = True
            q = self._pad_queries(
                np.asarray(embedding, dtype=np.float32).reshape(1, -1)
            )
            # k from the PADDED size, not the raw one: k is a static jit
            # argument, so k = min(max_hits, s) would compile a fresh
            # kernel for every distinct sub-max_hits subset size (minutes
            # each through a remote-compile attach). Padding rows carry
            # valid=False -> score _NEG, filtered by the min_score keep
            # below, so the extra slots never surface.
            k = min(max_hits, s_pad)
            if self._quantized:
                return topk.subset_cosine_topk_quantized(
                    buf, scales, q, jnp.asarray(ords), jnp.asarray(valid), k
                )
            return topk.subset_cosine_topk(
                buf, q, jnp.asarray(ords), jnp.asarray(valid), k
            )

    @staticmethod
    def _subset_collect(
        vals: np.ndarray, idx: np.ndarray, min_score: float
    ) -> list[ScoredInt]:
        vals = vals[0]
        idx = idx[0]
        # vals >= 0.0 drops the padded slots (k may exceed the live subset
        # size; padding scores are the _NEG sentinel, real scores clip >= 0).
        keep = (vals >= min_score) & (vals >= 0.0)
        return [ScoredInt(int(i), float(v)) for v, i in zip(vals[keep], idx[keep])]

    def fuzzy_lookup_embedding_in_subset(
        self,
        embedding: np.ndarray,
        ordinals_of_subset: list[int],
        max_hits: int | None = None,
        min_score: float | None = None,
    ) -> list[ScoredInt]:
        """Top-k within an ordinal subset (parity: ``vectorbase.py:203-230``)."""
        if max_hits is None:
            max_hits = 10
        if min_score is None:
            min_score = 0.0
        out = self._subset_dispatch(
            embedding, ordinals_of_subset, max_hits, min_score
        )
        if isinstance(out, list):
            return out
        vals, idx = jax.device_get(out)
        return self._subset_collect(vals, idx, min_score)

    async def fuzzy_lookup_embedding_in_subset_async(
        self,
        embedding: np.ndarray,
        ordinals_of_subset: list[int],
        max_hits: int | None = None,
        min_score: float | None = None,
    ) -> list[ScoredInt]:
        """Async subset top-k: dispatch inline (sub-ms), fetch off-loop.

        The sync route blocks the event loop for a full device round trip
        (~30 ms on tunnel-attached chips); this keeps the loop live so N
        concurrent ``query()`` pipelines overlap their re-rank fetches —
        dispatches pipeline on the device, fetches overlap on executor
        threads. Results are identical to
        :meth:`fuzzy_lookup_embedding_in_subset`.
        """
        if max_hits is None:
            max_hits = 10
        if min_score is None:
            min_score = 0.0
        if self._mesh is not None:
            # Sharded search_subset fetches internally: run the whole call
            # off-loop so the mesh round trip doesn't block other tasks.
            return await asyncio.to_thread(
                self.fuzzy_lookup_embedding_in_subset,
                embedding,
                ordinals_of_subset,
                max_hits,
                min_score,
            )
        out = self._subset_dispatch(
            embedding, ordinals_of_subset, max_hits, min_score
        )
        if isinstance(out, list):
            return out
        vals, idx = await asyncio.to_thread(jax.device_get, out)
        return self._subset_collect(vals, idx, min_score)

    async def fuzzy_lookup(
        self,
        key: str,
        max_hits: int | None = None,
        min_score: float | None = None,
        predicate: Callable[[int], bool] | None = None,
    ) -> list[ScoredInt]:
        if max_hits is None:
            max_hits = self.settings.max_matches
        if min_score is None:
            min_score = self.settings.min_score
        embedding = await self.get_embedding(key)
        if max_hits is None:
            # "No limit": every row above min_score, best-first
            # (parity with settings.max_matches = None).
            max_hits = len(self)
        if predicate is None and len(self) > 0:
            # Async route: keeps the event loop live during the device
            # round trip and coalesces with concurrent lookups.
            rows = await self.fuzzy_lookup_embeddings_batch_async(
                np.asarray(embedding, dtype=np.float32).reshape(1, -1),
                max_hits=max_hits,
                min_score=min_score,
            )
            return rows[0]
        return self.fuzzy_lookup_embedding(
            embedding, max_hits=max_hits, min_score=min_score, predicate=predicate
        )

    # -- raw access / persistence -------------------------------------------

    def clear(self) -> None:
        self._buf = None
        self._scales = None
        self._shadow_cache = None
        self._sharded = None
        self._count = 0
        self._pending.clear()
        self._pending_rows = 0

    def _host_matrix(self) -> np.ndarray:
        """All live rows as a host array [len, embedding_size]."""
        if self._mesh is not None:
            parts = [self._sharded.serialize()] if self._sharded else []
            parts.extend(self._pending)
            if not parts:
                return np.empty((0, self._embedding_size), dtype=np.float32)
            return np.concatenate(parts, axis=0)
        parts = []
        if self._count and self._buf is not None:
            rows = self._buf[: self._count, : self._embedding_size].astype(jnp.float32)
            if self._quantized:
                rows = rows * self._scales[: self._count, None]
            parts.append(np.asarray(rows))
        parts.extend(self._pending)
        if not parts:
            return np.empty((0, self._embedding_size), dtype=np.float32)
        return np.concatenate(parts, axis=0)

    def host_rows(self, start: int, stop: int) -> np.ndarray:
        """Live rows [start, stop) as host f32 — O(stop-start), not O(n)
        like serialize(); the incremental-sync path for mirrors (e.g.
        ConversationCorpus.refresh)."""
        self._flush()
        stop = min(stop, len(self))
        if stop <= start:
            return np.empty((0, self._embedding_size), dtype=np.float32)
        if self._mesh is not None:
            return self._sharded_store().get_rows(start, stop)
        rows = self._buf[start:stop, : self._embedding_size].astype(jnp.float32)
        if self._quantized:
            rows = rows * self._scales[start:stop, None]
        return np.asarray(rows)

    def get_embedding_at(self, pos: int) -> np.ndarray:
        n = len(self)
        if 0 <= pos < n:
            if self._mesh is not None:
                if pos < self._count:
                    return self._sharded_store().get_row(pos)
                off = pos - self._count
                for chunk in self._pending:
                    if off < chunk.shape[0]:
                        return chunk[off]
                    off -= chunk.shape[0]
            if pos < self._count:
                row = self._buf[pos, : self._embedding_size].astype(jnp.float32)
                if self._quantized:
                    row = row * self._scales[pos]
                return np.asarray(row)
            off = pos - self._count
            for chunk in self._pending:
                if off < chunk.shape[0]:
                    return chunk[off]
                off -= chunk.shape[0]
        raise IndexError(f"Index {pos} out of bounds for embedding index of size {n}")

    def serialize_embedding_at(self, pos: int) -> np.ndarray | None:
        return self.get_embedding_at(pos) if 0 <= pos < len(self) else None

    def serialize(self) -> np.ndarray:
        return self._host_matrix()

    def deserialize(self, data: np.ndarray | None) -> None:
        self.clear()
        if data is None:
            return
        data = np.asarray(data, dtype=np.float32)
        if data.ndim < 2 or data.shape[0] == 0:
            return
        if self._embedding_size == 0:
            self._set_embedding_size(data.shape[1])
        assert data.shape[1] == self._embedding_size, (
            data.shape,
            self._embedding_size,
        )
        self._pending.append(data)
        self._pending_rows += data.shape[0]


# Alias matching the reference class name for drop-in familiarity.
VectorBase = VectorStore
