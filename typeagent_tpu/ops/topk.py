"""Fused cosine-similarity top-k kernels.

Replaces the reference hot kernel — a serial numpy scan:
``scores = np.dot(vectors, q); np.argpartition(scores, -k)``
(reference: ``aitools/vectorbase.py:163-230``) — with a batched, tiled TPU
program that:

  * computes ``score = clip((Q @ E^T + 1) / 2, 0, 1)`` on the MXU,
  * masks rows past the ``count`` watermark (the store is a padded
    capacity buffer, see ``ops/append.py``),
  * maintains a running top-k per query across row tiles in VMEM, so the
    ``[b, n]`` score matrix is never materialized in HBM.

Two implementations with identical semantics:

  * ``_topk_pallas`` — Pallas TPU kernel (used when the default backend is
    TPU). Row tiles stream HBM->VMEM; the running top-k lives in the output
    block, which Pallas keeps resident in VMEM across grid steps.
  * ``_topk_xla``  — plain XLA (einsum + ``lax.top_k``); used on CPU test
    meshes and as the correctness oracle.

Score/order semantics match the reference exactly: score map
(``vectorbase.py:44-47``), min-score filtering and descending sort happen on
the host in :mod:`typeagent_tpu.vectorstore`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Public result shapes: every selection program returns (scores [b, k],
# row indices [b, k]) with unfilled slots pinned to (-1, -1); the exact2
# family adds a per-query bool exactness certificate.
TopK = tuple[jax.Array, jax.Array]
CertifiedTopK = tuple[jax.Array, jax.Array, jax.Array]

__all__ = [
    "cosine_topk",
    "cosine_topk_exact2",
    "cosine_scores",
    "subset_cosine_topk",
]

# Max rows per Pallas grid step. Larger tiles amortize the per-tile top-k
# merge (concat + k argmax passes over the running candidates): measured on
# v5e at 1M x 384 b=64 k=10, tile 4096 beats 1024 by ~26% (bf16 3.1 vs 4.1
# ms/batch; f32 4.3 vs 5.4). The ceiling is the ~16 MB scoped-VMEM limit:
# tile 8192 bf16 OOMs at 16.47 MB, so _pick_tile sizes tiles from a VMEM
# budget (2 emb tiles double-buffered + score/candidate/mask blocks).
_TILE_N = 4096
# Lane width of the output blocks (min f32 tile is (8, 128)).
_K_LANES = 128
# Largest k routed to the Pallas kernel. The extraction loop is unrolled k
# times and Mosaic's buffer liveness grows superlinearly with it — k=50
# overflows the ~16 MB scoped VMEM at any useful tile size; k=32 compiles
# and matches the XLA route bit-exactly (measured 1M x 384 bf16 b=64:
# Pallas 5.2 ms vs XLA-materialized top_k 9.8 ms at k=25 — the message
# re-rank stage's k). Bigger k (only the related-terms expansion asks for
# ~50) takes the XLA top_k path, which materializes scores but is unbounded.
_PALLAS_MAX_K = 32
_NEG = -1.0  # below any real score in [0, 1]; plain float (kernels must not
# capture jnp constants)
_RAW_NEG = -3.0  # below any real cosine in [-1, 1] (raw-space running buffer)


def _pick_tile(n_pad: int, d_pad: int, b_pad: int, itemsize: int, k: int) -> int:
    """Row-tile size: as large as the VMEM budget allows, capped at _TILE_N.

    Per tile row the kernel holds: the embedding tile double-buffered
    (2 * d_pad * itemsize) plus score/candidate/mask blocks whose compiler
    liveness grows with the k unrolled extraction passes — measured ~(8 +
    1.25*k) * b_pad bytes/row on v5e (scoped-VMEM OOM reports at k=10 and
    k=50 pin the constants; the hard limit is ~16 MB).
    """
    budget = 15 * 1024 * 1024
    # Liveness per (tile row x query): ~20 bytes at k=10 for b <= 256
    # (validated by sweeps at tiles 2048/4096); large batches keep more
    # [b, tile] intermediates live across the merge branches (Mosaic OOM
    # reports at b=1024 measure ~38 bytes), so they budget conservatively.
    if b_pad >= 512:
        per_row = 2 * d_pad * itemsize + b_pad * (40 + 2 * k)
    else:
        per_row = 2 * d_pad * itemsize + b_pad * (8 + (5 * k) // 4)
    t = budget // per_row
    if t >= 512:
        t = (t // 512) * 512  # big tiles: keep row counts MXU-friendly
    else:
        t = (t // 32) * 32  # huge-dim fallback: 32 divides every dtype's
        # min sublane tile (f32 8, bf16 16, int8 32)
    return max(32, min(_TILE_N, t, n_pad))


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _platform_of(arr) -> str:
    """Platform the array actually lives on (not the process default)."""
    try:
        return next(iter(arr.devices())).platform
    except Exception:
        return jax.default_backend()


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _topk_kernel(count_ref, q_ref, e_ref, vals_ref, idx_ref, *, k: int, tile_n: int):
    """One grid step: score a row tile and fold it into the running top-k.

    The running buffer holds RAW dot products (cosines), not the public
    (cos+1)/2 score: the map is monotone, so top-k order is identical, and
    deferring it to the final [b, k] block removes two elementwise passes
    from every tile. ``_RAW_NEG`` marks unfilled/invalid slots (real cosines
    live in [-1, 1]).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _RAW_NEG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    count = count_ref[0]
    b = q_ref.shape[0]

    # MXU: [b, d] @ [d, tile_n] -> [b, tile_n] in f32. HIGHEST precision keeps
    # f32 score parity with the numpy reference (default TPU precision splits
    # f32 into bf16 passes, ~1e-4 drift); the kernel is HBM-bandwidth-bound so
    # the extra MXU passes are free. bf16 stores compute in native bf16
    # (half the HBM traffic; scores good to ~1e-2, ranking-safe).
    scores = jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype),
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST on bf16 operands is rejected by Mosaic (and meaningless:
        # bf16 x bf16 -> f32 is already exact on the MXU).
        precision=(
            jax.lax.Precision.HIGHEST
            if e_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )

    _mask_and_fold(scores, count, vals_ref, idx_ref, k=k, tile_n=tile_n)


def _mask_and_fold(scores, count, vals_ref, idx_ref, *, k: int, tile_n: int):
    """Watermark masking + tiered merge.

    (An interior/boundary branch specialization that skips the mask on full
    tiles was measured SLOWER at b=256 — the duplicated fold body bloats
    Mosaic's code and VMEM liveness — so every tile masks.)
    """
    step = pl.program_id(0)
    tile_base = step * tile_n
    b = scores.shape[0]
    row_ids = tile_base + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    masked = jnp.where(row_ids < count, scores, _RAW_NEG)
    _fold_tile_into_topk(masked, tile_base, vals_ref, idx_ref, k=k)


def _extract_topk(cand_vals, cand_idx, m: int):
    """m iterative argmax passes over the candidate buffer on the VPU.

    m is small and static, so this lowers to pure reductions + selects — no
    on-device sort required. Ties go to the lowest column, so candidates must
    be ordered running-buffer-first for stable merge semantics.
    """
    b, width = cand_vals.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
    out_vals = []
    out_idx = []
    for _ in range(m):
        best = jnp.max(cand_vals, axis=1, keepdims=True)  # [b, 1]
        pos = jnp.argmax(cand_vals, axis=1, keepdims=True)  # [b, 1]
        taken = col == pos
        out_vals.append(best)
        out_idx.append(jnp.sum(jnp.where(taken, cand_idx, 0), axis=1, keepdims=True))
        # Knockout below _RAW_NEG so taken slots are never re-picked before
        # invalid (-3) candidates — re-picks would duplicate indices.
        cand_vals = jnp.where(taken, jnp.float32(-4.0), cand_vals)
    return out_vals, out_idx


def _write_topk(vals_ref, idx_ref, out_vals, out_idx, k: int):
    b = vals_ref.shape[0]
    pad = vals_ref.shape[1] - k
    vals_ref[:] = jnp.concatenate(
        out_vals + [jnp.full((b, pad), _RAW_NEG, jnp.float32)], axis=1
    )
    idx_ref[:] = jnp.concatenate(
        out_idx + [jnp.full((b, pad), -1, jnp.int32)], axis=1
    )


# Max candidates the fast merge path handles per tile. After the first few
# tiles, a tile rarely holds more than 2 scores beating the running kth best,
# so the k-pass full-width merge is usually unnecessary.
_FAST_M = 2


def _merge_tier() -> str:
    """Merge strategy for 1 < n_above <= _FAST_M (A/B knob, read at trace
    time): "chain" = two sequential sorted-inserts; "extract" = top-2
    extraction + splice + 128-lane re-extraction."""
    import os

    return os.environ.get("TAT_TOPK_MERGE", "chain")


def _sorted_insert_top1(scores, tile_base, vals_ref, idx_ref, k: int):
    """Sort-insert each row's tile maximum into the running block.

    Rows whose maximum doesn't beat their kth-best get rank k and the write
    lands in the pad lanes (a no-op) — no predication needed. Returns the
    argmax column so callers can knock it out and chain another insert.
    """
    best = jnp.max(scores, axis=1, keepdims=True)  # [b, 1]
    pos = jnp.argmax(scores, axis=1, keepdims=True).astype(jnp.int32)
    best_idx = pos + tile_base  # column -> global row id (affine)
    lane = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)
    vals = vals_ref[:]
    idx = idx_ref[:]
    # Rank among the k live lanes (full-width masked reduce; ties keep the
    # running entry ahead).
    rank = jnp.sum(
        jnp.where((lane < k) & (vals >= best), 1, 0), axis=1, keepdims=True
    )
    shifted_vals = pltpu.roll(vals, 1, 1)
    shifted_idx = pltpu.roll(idx, 1, 1)
    vals_ref[:] = jnp.where(
        lane < rank, vals, jnp.where(lane == rank, best, shifted_vals)
    )
    idx_ref[:] = jnp.where(
        lane < rank, idx, jnp.where(lane == rank, best_idx, shifted_idx)
    )
    return pos


def _fold_tile_into_topk(scores, tile_base, vals_ref, idx_ref, *, k: int):
    """Fold one tile's scores into the running top-k (vals_ref/idx_ref).

    Threshold fast path: count this tile's scores above the running kth best
    (theta). If every row has <= _FAST_M such candidates, extract just the
    tile's top-_FAST_M (2 full-width passes instead of k), splice them into
    the running 128-lane block, and re-extract top-k over 128 lanes — ~4x
    less VPU work. The scalar branch condition makes this real control flow
    on the TPU scalar core, not predication.
    """
    b = scores.shape[0]
    tile_n = scores.shape[1]
    fast_ok = k + _FAST_M <= vals_ref.shape[1]

    def make_row_ids():
        return tile_base + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)

    def full_merge():
        cand_vals = jnp.concatenate([vals_ref[:, :k], scores], axis=1)
        cand_idx = jnp.concatenate([idx_ref[:, :k], make_row_ids()], axis=1)
        out_vals, out_idx = _extract_topk(cand_vals, cand_idx, k)
        _write_topk(vals_ref, idx_ref, out_vals, out_idx, k)

    if not fast_ok:
        full_merge()
        return

    # Tiered merge. INVARIANT: lanes [0, k) of the running block are sorted
    # descending (init, sorted extraction, and sorted insertion all keep it).
    #   n_above == 0: tile beats nothing (the common case once the running
    #     top-k warms up) — no work beyond the count.
    #   n_above == 1: every row has at most one candidate — the tile row-max
    #     sort-inserts into the running block with a handful of [b, lanes]
    #     ops (no k-pass re-extraction).
    #   1 < n_above <= _FAST_M: extract the tile's top-m, splice into the
    #     pad lanes, re-extract k over the 128-lane block.
    #   else: full-width k-pass merge (first tiles / adversarial data).
    theta = vals_ref[:, k - 1 : k]  # running kth best per row, [b, 1]
    n_above = jnp.max(jnp.sum((scores > theta).astype(jnp.int32), axis=1))

    @pl.when(n_above == 1)
    def _insert_one():
        _sorted_insert_top1(scores, tile_base, vals_ref, idx_ref, k)

    if _merge_tier() == "chain":

        @pl.when((n_above > 1) & (n_above <= _FAST_M))
        def _chain():
            # Two sequential sorted-inserts: take each row's best, knock it
            # out, take the next. Rows with fewer candidates self-neutralize
            # (the below-theta insert lands in the pad lanes). Exact for
            # n_above <= 2 per row; cheaper than extraction + k-pass
            # re-extraction.
            col = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
            pos1 = _sorted_insert_top1(scores, tile_base, vals_ref, idx_ref, k)
            remaining = jnp.where(col == pos1, jnp.float32(-4.0), scores)
            _sorted_insert_top1(remaining, tile_base, vals_ref, idx_ref, k)

    else:

        @pl.when((n_above > 1) & (n_above <= _FAST_M))
        def _fast():
            top_vals, top_idx = _extract_topk(scores, make_row_ids(), _FAST_M)
            # Splice the tile's top-m into the pad lanes k..k+m-1 of the
            # running block (running lanes stay first so ties keep
            # preferring them).
            lane = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)
            cand_vals = vals_ref[:]
            cand_idx = idx_ref[:]
            for j in range(_FAST_M):
                cand_vals = jnp.where(lane == k + j, top_vals[j], cand_vals)
                cand_idx = jnp.where(lane == k + j, top_idx[j], cand_idx)
            out_vals, out_idx = _extract_topk(cand_vals, cand_idx, k)
            _write_topk(vals_ref, idx_ref, out_vals, out_idx, k)

    @pl.when(n_above > _FAST_M)
    def _full():
        full_merge()


def _topk_pallas_impl(emb: jax.Array, queries: jax.Array, count: jax.Array, *, k: int):
    n_pad, d_pad = emb.shape
    b_pad = queries.shape[0]
    tile_n = _pick_tile(n_pad, d_pad, b_pad, emb.dtype.itemsize, k)
    grid = (pl.cdiv(n_pad, tile_n),)

    kernel = functools.partial(_topk_kernel, k=k, tile_n=tile_n)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count, shape (1,)
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad * emb.dtype.itemsize
            + b_pad * d_pad * 4
            + 2 * b_pad * _K_LANES * 4,
            transcendentals=0,
        ),
    )(count, queries, emb)
    return _raw_to_score(vals[:, :k], idx[:, :k])


def _raw_to_score(raw_vals, idx):
    """Map the kernel's raw-cosine output block to the public score space:
    clip((cos+1)/2) for real entries, (-1, -1) for unfilled/invalid slots."""
    valid = raw_vals > -2.0  # real cosines live in [-1, 1]
    vals = jnp.where(valid, jnp.clip((raw_vals + 1.0) * 0.5, 0.0, 1.0), _NEG)
    return vals, jnp.where(valid, idx, -1)


_topk_pallas = jax.jit(_topk_pallas_impl, static_argnames=("k",))


# ---------------------------------------------------------------------------
# Interval-scoped exact variant: rows outside a small [s_pad, 2] (start,
# stop) table are masked inside the fused kernel — scoped search over huge
# stores without materializing [b, n] scores (the einsum+top_k route needs
# ~10 GB at 10M rows, b=256). The table lives in SMEM; s_pad is small and
# static, so the mask is s_pad unrolled compares per tile.
# ---------------------------------------------------------------------------

_PALLAS_MAX_INTERVALS = 8


def _topk_kernel_iv(
    count_ref, iv_ref, q_ref, e_ref, vals_ref, idx_ref, *, k: int, tile_n: int,
    s_pad: int,
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _RAW_NEG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    count = count_ref[0]
    scores = jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype),
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if e_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    b = scores.shape[0]
    tile_base = step * tile_n
    row_ids = tile_base + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    in_scope = jnp.zeros((b, tile_n), dtype=bool)
    for j in range(s_pad):  # static unroll over the interval table
        in_scope = in_scope | (
            (row_ids >= iv_ref[j, 0]) & (row_ids < iv_ref[j, 1])
        )
    masked = jnp.where((row_ids < count) & in_scope, scores, _RAW_NEG)
    _fold_tile_into_topk(masked, tile_base, vals_ref, idx_ref, k=k)


def _topk_pallas_iv_impl(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    intervals: jax.Array,  # [s_pad, 2] i32; padding rows are (0, 0)
    *,
    k: int,
):
    n_pad, d_pad = emb.shape
    b_pad = queries.shape[0]
    s_pad = intervals.shape[0]
    tile_n = _pick_tile(n_pad, d_pad, b_pad, emb.dtype.itemsize, k)
    grid = (pl.cdiv(n_pad, tile_n),)
    kernel = functools.partial(
        _topk_kernel_iv, k=k, tile_n=tile_n, s_pad=s_pad
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # intervals [s_pad, 2]
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad * emb.dtype.itemsize
            + b_pad * d_pad * 4
            + 2 * b_pad * _K_LANES * 4,
            transcendentals=0,
        ),
    )(count, intervals, queries, emb)
    return _raw_to_score(vals[:, :k], idx[:, :k])


def intervals_to_rowmask(n: int, intervals: jax.Array) -> jax.Array:
    """[1, n] i32 membership mask of the UNION of half-open row intervals.

    O(n log s) via sort + cummax + searchsorted — no [n, s] intermediate:
    row r is in the union iff r < max(stop | start <= r). Correct for
    unsorted and overlapping tables; (0, 0) padding rows select nothing.
    """
    starts = intervals[:, 0]
    order = jnp.argsort(starts)
    sorted_starts = starts[order]
    cum_stops = jax.lax.cummax(intervals[:, 1][order])
    rows = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.searchsorted(sorted_starts, rows, side="right") - 1
    stop_at = cum_stops[jnp.clip(pos, 0, sorted_starts.shape[0] - 1)]
    return ((pos >= 0) & (rows < stop_at)).astype(jnp.int32)[None, :]


def _topk_xla_iv_impl(emb, queries, count, intervals, *, k: int):
    raw = jnp.einsum(
        "bd,nd->bn",
        queries.astype(emb.dtype),
        emb,
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if emb.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    n = emb.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    in_scope = intervals_to_rowmask(n, intervals)[0] > 0
    ok = in_scope & (rows < count)
    scores = jnp.clip((raw + 1.0) * 0.5, 0.0, 1.0)
    return jax.lax.top_k(jnp.where(ok[None, :], scores, _NEG), k)


# ---------------------------------------------------------------------------
# Row-masked exact variant: an arbitrary [1, n_pad] i32 mask streams from
# HBM alongside the embedding tiles (one i32 per row ~ 0.5% extra HBM
# traffic on a bf16 store) — scoped/subset search over huge stores without
# materializing [b, n] scores and without the interval kernel's static
# table-size cap.
# ---------------------------------------------------------------------------


def _topk_kernel_m(
    count_ref, q_ref, e_ref, m_ref, vals_ref, idx_ref, *, k: int, tile_n: int
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _RAW_NEG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    count = count_ref[0]
    scores = jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype),
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if e_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    b = scores.shape[0]
    tile_base = step * tile_n
    row_ids = tile_base + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    ok = (row_ids < count) & (m_ref[:] > 0)  # [1, tile_n] broadcasts over b
    masked = jnp.where(ok, scores, _RAW_NEG)
    _fold_tile_into_topk(masked, tile_base, vals_ref, idx_ref, k=k)


def _topk_pallas_m_impl(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    rowmask: jax.Array,  # [1, n_pad] i32
    *,
    k: int,
):
    n_pad, d_pad = emb.shape
    b_pad = queries.shape[0]
    tile_n = _pick_tile(n_pad, d_pad, b_pad, emb.dtype.itemsize, k)
    grid = (pl.cdiv(n_pad, tile_n),)
    kernel = functools.partial(_topk_kernel_m, k=k, tile_n=tile_n)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count (1,)
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad * emb.dtype.itemsize
            + n_pad * 4
            + b_pad * d_pad * 4
            + 2 * b_pad * _K_LANES * 4,
            transcendentals=0,
        ),
    )(count, queries, emb, rowmask)
    return _raw_to_score(vals[:, :k], idx[:, :k])


def topk_program_masked(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    rowmask: jax.Array,
    k: int,
    use_pallas: bool | None = None,
) -> TopK:
    """Traceable row-masked exact top-k (usable inside shard_map).

    ``rowmask``: [n_pad] or [1, n_pad], nonzero = searchable. Unlike the
    interval variant there is no table-size cap — any scope that can be
    expressed as a row mask rides the fused scan.
    """
    k = min(k, emb.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    mask2d = rowmask.reshape(1, -1).astype(jnp.int32)
    if use_pallas and k <= _PALLAS_MAX_K:
        return _topk_pallas_m_impl(emb, queries, count.reshape(1), mask2d, k=k)
    raw = jnp.einsum(
        "bd,nd->bn",
        queries.astype(emb.dtype),
        emb,
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if emb.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    rows = jnp.arange(emb.shape[0], dtype=jnp.int32)
    ok = (mask2d[0] > 0) & (rows < count.reshape(()))
    scores = jnp.clip((raw + 1.0) * 0.5, 0.0, 1.0)
    vals, pos = jax.lax.top_k(jnp.where(ok[None, :], scores, _NEG), k)
    # Same invalid-slot convention as the Pallas route: idx -1.
    return vals, jnp.where(vals >= 0.0, pos, -1)


def topk_program_intervals(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    intervals: jax.Array,
    k: int,
    use_pallas: bool | None = None,
) -> TopK:
    """Traceable interval-scoped exact top-k (usable inside shard_map).

    ``intervals``: [s_pad, 2] i32 half-open (start, stop) global row spans
    (padding rows (0, 0)). Small tables (s_pad <= ``_PALLAS_MAX_INTERVALS``)
    mask inside the fused kernel from SMEM; larger tables expand to a
    [1, n] row mask on device (O(n log s), no [n, s] intermediate) and ride
    the masked fused kernel — still no [b, n] score materialization. Only
    non-Pallas backends (CPU test meshes) take the XLA top_k route.
    """
    k = min(k, emb.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas and k <= _PALLAS_MAX_K:
        if intervals.shape[0] <= _PALLAS_MAX_INTERVALS:
            return _topk_pallas_iv_impl(
                emb, queries, count.reshape(1), intervals, k=k
            )
        rowmask = intervals_to_rowmask(emb.shape[0], intervals)
        return _topk_pallas_m_impl(
            emb, queries, count.reshape(1), rowmask, k=k
        )
    return _topk_xla_iv_impl(emb, queries, count.reshape(()), intervals, k=k)


# ---------------------------------------------------------------------------
# Quantized (int8) variant: rows stored as int8 with per-row scales. The
# matmul runs on the raw int8 values (upcast on the MXU) and the per-row
# scale is applied to the [b, tile] score block afterwards — exact for
# per-row symmetric quantization, no tile dequantization pass.
# ---------------------------------------------------------------------------


def _topk_kernel_q(
    count_ref, q_ref, e_ref, s_ref, vals_ref, idx_ref, *, k: int, tile_n: int
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _RAW_NEG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    count = count_ref[0]
    b = q_ref.shape[0]

    raw = jax.lax.dot_general(
        q_ref[:],
        e_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Row scales: [1, tile_n] broadcast over queries. The buffer stays in
    # raw (dequantized cosine) space; the (cos+1)/2 map is deferred to the
    # final [b, k] block (_raw_to_score).
    scores = raw * s_ref[:].reshape(1, tile_n)

    _mask_and_fold(scores, count, vals_ref, idx_ref, k=k, tile_n=tile_n)


def _topk_pallas_q_impl(
    emb_q: jax.Array,  # [n_pad, d_pad] int8
    scales: jax.Array,  # [n_pad] f32
    queries: jax.Array,  # [b_pad, d_pad] bf16
    count: jax.Array,
    *,
    k: int,
):
    n_pad, d_pad = emb_q.shape
    b_pad = queries.shape[0]
    # int8 rows; the tiled f32 scales add only ~8 bytes/row, inside the
    # _pick_tile budget's slack.
    tile_n = _pick_tile(n_pad, d_pad, b_pad, emb_q.dtype.itemsize, k)
    # The 1-D scales operand carries (1024,) tiling: its block must be a
    # multiple of 1024 (or the full shape). Buffer capacities are multiples
    # of 1024 (ops/append.py), so rounding the tile down suffices.
    if tile_n < n_pad:
        tile_n = (tile_n // 1024) * 1024
        if tile_n == 0:
            # VMEM budget can't fit 1024 rows (enormous dim): XLA fallback.
            return _topk_xla_q_impl(emb_q, scales, queries, count[0], k=k)
    grid = (pl.cdiv(n_pad, tile_n),)
    kernel = functools.partial(_topk_kernel_q, k=k, tile_n=tile_n)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad + n_pad * 4 + b_pad * d_pad * 2,
            transcendentals=0,
        ),
    )(count, queries, emb_q, scales)
    return _raw_to_score(vals[:, :k], idx[:, :k])


_topk_pallas_q = jax.jit(_topk_pallas_q_impl, static_argnames=("k",))


def _topk_xla_q_impl(emb_q, scales, queries, count, *, k: int):
    raw = jnp.einsum(
        "bd,nd->bn",
        queries.astype(jnp.float32),
        emb_q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.clip((raw * scales[None, :] + 1.0) * 0.5, 0.0, 1.0)
    n = emb_q.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < count
    return jax.lax.top_k(jnp.where(valid, scores, _NEG), k)


_topk_xla_q = jax.jit(_topk_xla_q_impl, static_argnames=("k",))


def _topk_kernel_mq(
    count_ref, q_ref, e_ref, s_ref, m_ref, vals_ref, idx_ref, *, k: int, tile_n: int
):
    """Row-masked quantized scan: int8 rows + per-row scales + a [1, n]
    mask all stream from HBM with the row tiles — no [b, n] score
    materialization (the einsum fallback allocates 7+ GB at 30M rows)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _RAW_NEG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    count = count_ref[0]
    raw = jax.lax.dot_general(
        q_ref[:],
        e_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = raw * s_ref[:].reshape(1, tile_n)
    b = scores.shape[0]
    tile_base = step * tile_n
    row_ids = tile_base + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    ok = (row_ids < count) & (m_ref[:] > 0)  # [1, tile_n] broadcasts over b
    masked = jnp.where(ok, scores, _RAW_NEG)
    _fold_tile_into_topk(masked, tile_base, vals_ref, idx_ref, k=k)


def _topk_pallas_mq_impl(
    emb_q: jax.Array,  # [n_pad, d_pad] int8
    scales: jax.Array,  # [n_pad] f32
    queries: jax.Array,  # [b_pad, d_pad] bf16
    count: jax.Array,
    rowmask: jax.Array,  # [1, n_pad] i32
    *,
    k: int,
):
    n_pad, d_pad = emb_q.shape
    b_pad = queries.shape[0]
    tile_n = _pick_tile(n_pad, d_pad, b_pad, emb_q.dtype.itemsize, k)
    # 1-D scales operand carries (1024,) tiling (see _topk_pallas_q_impl).
    if tile_n < n_pad:
        tile_n = (tile_n // 1024) * 1024
        if tile_n == 0:
            return _topk_xla_mq_impl(
                emb_q, scales, queries, count[0], rowmask, k=k
            )
    grid = (pl.cdiv(n_pad, tile_n),)
    kernel = functools.partial(_topk_kernel_mq, k=k, tile_n=tile_n)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _K_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, _K_LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad
            + n_pad * 8
            + b_pad * d_pad * 2
            + 2 * b_pad * _K_LANES * 4,
            transcendentals=0,
        ),
    )(count, queries, emb_q, scales, rowmask)
    return _raw_to_score(vals[:, :k], idx[:, :k])


def _topk_xla_mq_impl(emb_q, scales, queries, count, rowmask, *, k: int):
    raw = jnp.einsum(
        "bd,nd->bn",
        queries.astype(jnp.float32),
        emb_q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.clip((raw * scales[None, :] + 1.0) * 0.5, 0.0, 1.0)
    n = emb_q.shape[0]
    ok = (rowmask.reshape(-1) > 0) & (
        jnp.arange(n, dtype=jnp.int32) < count
    )
    vals, pos = jax.lax.top_k(jnp.where(ok[None, :], scores, _NEG), k)
    return vals, jnp.where(vals >= 0.0, pos, -1)


def topk_program_masked_quantized(
    emb_q: jax.Array,
    scales: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    rowmask: jax.Array,
    k: int,
    use_pallas: bool | None = None,
) -> TopK:
    """Traceable row-masked quantized top-k (usable inside shard_map).

    The quantized twin of :func:`topk_program_masked`: scoped search over
    int8 stores rides the fused scan instead of materializing [b, n]
    scores (which OOMs HBM at 30M rows).
    """
    k = min(k, emb_q.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    mask2d = rowmask.reshape(1, -1).astype(jnp.int32)
    if use_pallas and k <= _PALLAS_MAX_K:
        return _topk_pallas_mq_impl(
            emb_q,
            scales,
            queries.astype(jnp.bfloat16),
            count.reshape(1),
            mask2d,
            k=k,
        )
    return _topk_xla_mq_impl(
        emb_q, scales, queries, count.reshape(()), mask2d, k=k
    )


def topk_program_intervals_quantized(
    emb_q: jax.Array,
    scales: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    intervals: jax.Array,
    k: int,
    use_pallas: bool | None = None,
) -> TopK:
    """Traceable interval-scoped quantized top-k: the [s, 2] table expands
    to a [1, n] row mask on device (O(n log s)) and rides the masked fused
    quantized kernel — host work and upload stay O(segments)."""
    rowmask = intervals_to_rowmask(emb_q.shape[0], intervals)
    return topk_program_masked_quantized(
        emb_q, scales, queries, count, rowmask, k, use_pallas
    )


def quantize_rows(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization: returns (q [n,d] i8, scales [n])."""
    rows = np.asarray(rows, dtype=np.float32)
    scales = np.abs(rows).max(axis=1) / 127.0
    scales = np.where(scales > 0, scales, 1.0).astype(np.float32)
    q = np.clip(np.round(rows / scales[:, None]), -127, 127).astype(np.int8)
    return q, scales


@jax.jit
def quantize_rows_device(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """On-device twin of :func:`quantize_rows` (bulk device-resident ingest)."""
    rows = rows.astype(jnp.float32)
    scales = jnp.abs(rows).max(axis=1) / 127.0
    scales = jnp.where(scales > 0, scales, 1.0)
    q = jnp.clip(jnp.round(rows / scales[:, None]), -127, 127).astype(jnp.int8)
    return q, scales


@jax.jit
def cosine_scores_quantized(
    emb_q: jax.Array, scales: jax.Array, queries: jax.Array, count: jax.Array | int
) -> jax.Array:
    """Full masked score matrix for the int8 store (predicate paths)."""
    raw = jnp.einsum(
        "bd,nd->bn",
        queries.astype(jnp.float32),
        emb_q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.clip((raw * scales[None, :] + 1.0) * 0.5, 0.0, 1.0)
    n = emb_q.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < count
    return jnp.where(valid, scores, _NEG)


@functools.partial(jax.jit, static_argnames=("k",))
def _subset_topk_q_jit(emb_q, scales, queries, ordinals, valid, *, k: int):
    safe = jnp.clip(ordinals, 0, emb_q.shape[0] - 1)
    rows = jnp.take(emb_q, safe, axis=0).astype(jnp.float32)
    row_scales = jnp.take(scales, safe)
    raw = jnp.einsum(
        "bd,sd->bs", queries, rows, preferred_element_type=jnp.float32
    )
    scores = jnp.clip((raw * row_scales[None, :] + 1.0) * 0.5, 0.0, 1.0)
    scores = jnp.where(valid[None, :], scores, _NEG)
    vals, pos = jax.lax.top_k(scores, k)
    idx = jnp.take(ordinals, pos)
    return vals, idx


def subset_cosine_topk_quantized(
    emb_q: jax.Array,
    scales: jax.Array,
    queries: jax.Array,
    ordinals: jax.Array,
    valid: jax.Array,
    k: int,
) -> TopK:
    k = min(k, ordinals.shape[0])
    return _subset_topk_q_jit(emb_q, scales, queries, ordinals, valid, k=k)


def cosine_topk_quantized(
    emb_q: jax.Array,
    scales: jax.Array,
    queries: jax.Array,
    count: jax.Array | int,
    k: int,
) -> TopK:
    """Batched top-k over an int8-quantized store (queries bf16/f32)."""
    k = min(k, emb_q.shape[0])
    count_arr = jnp.asarray([count], dtype=jnp.int32) if np.isscalar(count) else count
    if _platform_of(emb_q) == "tpu" and k <= _PALLAS_MAX_K:
        return _topk_pallas_q(
            emb_q, scales, queries.astype(jnp.bfloat16), count_arr, k=k
        )
    return _topk_xla_q(emb_q, scales, queries, count_arr[0], k=k)


# ---------------------------------------------------------------------------
# Approximate path: XLA's hardware-accelerated approx_max_k (TPU PartialReduce)
# over the raw score matrix. Measured at the matmul+HBM floor on v5e (the
# exact kernel's merge costs ~20-30% on top), with recall@k ~= recall_target.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def _topk_approx_impl(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    *,
    k: int,
    recall_target: float,
):
    raw = jnp.einsum(
        "bd,nd->bn",
        queries.astype(emb.dtype),
        emb,
        preferred_element_type=jnp.float32,
        # f32 stores keep score parity with the exact paths (default TPU
        # precision splits f32 into bf16 passes, ~1e-3 drift).
        precision=(
            jax.lax.Precision.HIGHEST
            if emb.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    n = emb.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < count
    raw = jnp.where(valid, raw, _RAW_NEG)
    vals, idx = jax.lax.approx_max_k(raw, k, recall_target=recall_target)
    return _raw_to_score(vals, idx.astype(jnp.int32))


def cosine_topk_approx(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array | int,
    k: int,
    recall_target: float = 0.95,
) -> TopK:
    """Approximate batched top-k (recall ~= recall_target vs the exact scan)."""
    k = min(k, emb.shape[0])
    count_arr = jnp.asarray(count, dtype=jnp.int32).reshape(())
    return _topk_approx_impl(
        emb, queries, count_arr, k=k, recall_target=recall_target
    )


# ---------------------------------------------------------------------------
# Bucketed approximate kernel: fused matmul + per-bucket argmax in VMEM.
#
# approx_max_k consumes a materialized [b, n] score tensor: at 1M x 384
# b=256 that is ~1 GB written to and re-read from HBM per batch — 3-4x the
# embedding-read traffic the matmul itself needs. This kernel instead keeps
# each [b, tile] score block in VMEM and reduces it to per-bucket (128
# contiguous rows) maxima + argmax, so HBM sees only the embedding read
# plus a tiny [b, n/128] maxima table; an exact top-k over the maxima
# finishes on XLA. A true top-k row is missed only when two of the true
# top-k land in the SAME 128-row bucket (~0.6%/query for k=10 at 1M random
# rows -> recall@10 ~0.999; adjacent near-duplicate rows raise collisions
# but those are near-ties, so the kept one scores ~the lost one).
# ---------------------------------------------------------------------------

_BUCKET_ROWS = 128  # rows per bucket = one lane group of the score block


def _pick_tile_bucket(n_pad: int, d_pad: int, b_pad: int, itemsize: int) -> int:
    """Power-of-two row tile (so 128 % buckets-per-tile == 0) from the VMEM
    budget: emb tile double-buffered + one [b, tile] f32 score block."""
    budget = 14 * 1024 * 1024
    per_row = 2 * d_pad * itemsize + b_pad * 8
    tile = 512
    while tile * 2 <= min(_TILE_N, n_pad) and (tile * 2) * per_row <= budget:
        tile *= 2
    return tile


def _topk_bucket_kernel(count_ref, q_ref, e_ref, vals_ref, *idx_refs, tile_n: int):
    """Bucket-maxima grid step. ``idx_refs`` is ``(idx_ref,)`` when the caller
    needs argmax row ids, or empty (the exact2 selection phase rescores whole
    buckets, so maxima alone suffice — skipping argmax drops two VPU passes
    and half the output traffic)."""
    idx_ref = idx_refs[0] if idx_refs else None
    step = pl.program_id(0)
    g = tile_n // _BUCKET_ROWS  # buckets per tile
    subs = _K_LANES // g  # grid steps sharing one [b, 128] output block
    sub = step % subs

    @pl.when(sub == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _RAW_NEG)
        if idx_ref is not None:
            idx_ref[:] = jnp.full_like(idx_ref, -1)

    count = count_ref[0]
    scores = jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype),
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if e_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    b = scores.shape[0]
    tile_base = step * tile_n
    row_ids = tile_base + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    masked = jnp.where(row_ids < count, scores, _RAW_NEG)
    # [b, tile] -> [b, g, 128]: groups of 128 consecutive lanes, so the
    # reduction runs over full lane registers (layout-friendly on the VPU).
    grouped = masked.reshape(b, g, _BUCKET_ROWS)
    bucket_max = jnp.max(grouped, axis=2)
    if idx_ref is not None:
        bucket_pos = jnp.argmax(grouped, axis=2).astype(jnp.int32)
        bucket_col = jax.lax.broadcasted_iota(jnp.int32, (b, g), 1)
        bucket_idx = tile_base + bucket_col * _BUCKET_ROWS + bucket_pos
    if g == _K_LANES:
        vals_ref[:] = bucket_max
        if idx_ref is not None:
            idx_ref[:] = bucket_idx
    else:
        # Mosaic rejects sub-128-lane dynamic stores ("index in dimension 1
        # is a multiple of 128"), so rotate the g bucket lanes into place
        # and blend a full [b, 128] block instead.
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, _K_LANES), 1)
        in_slot = (lane >= sub * g) & (lane < (sub + 1) * g)
        pad_v = jnp.full((b, _K_LANES - g), _RAW_NEG, jnp.float32)
        wide_v = pltpu.roll(jnp.concatenate([bucket_max, pad_v], axis=1), sub * g, 1)
        vals_ref[:] = jnp.where(in_slot, wide_v, vals_ref[:])
        if idx_ref is not None:
            pad_i = jnp.full((b, _K_LANES - g), -1, jnp.int32)
            wide_i = pltpu.roll(
                jnp.concatenate([bucket_idx, pad_i], axis=1), sub * g, 1
            )
            idx_ref[:] = jnp.where(in_slot, wide_i, idx_ref[:])


def _bucket_maxima_pallas(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    with_idx: bool = True,
):
    """Per-bucket (128 consecutive rows) raw-cosine maxima (+ argmax row ids).

    Returns ``(vals [b, blocks*128] f32, idx [b, blocks*128] i32 | None)``
    where table position ``p`` is bucket ``p`` (rows ``[p*128, (p+1)*128)``);
    positions past the last real bucket hold ``(_RAW_NEG, -1)``. With
    ``with_idx=False`` the argmax passes and the idx output are skipped
    (the exact2 selection phase only needs the maxima).
    """
    n_pad, d_pad = emb.shape
    b_pad = queries.shape[0]
    tile_n = _pick_tile_bucket(n_pad, d_pad, b_pad, emb.dtype.itemsize)
    g = tile_n // _BUCKET_ROWS
    subs = _K_LANES // g
    steps = pl.cdiv(n_pad, tile_n)
    blocks = -(-steps // subs)

    kernel = functools.partial(_topk_bucket_kernel, tile_n=tile_n)
    out_spec = pl.BlockSpec(
        (b_pad, _K_LANES),
        lambda i, _subs=subs: (0, i // _subs),
        memory_space=pltpu.VMEM,
    )
    n_out = 2 if with_idx else 1
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count, shape (1,)
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, blocks * _K_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, blocks * _K_LANES), jnp.int32),
        ][:n_out],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad * emb.dtype.itemsize
            + b_pad * d_pad * 4
            + n_out * b_pad * blocks * _K_LANES * 4,
            transcendentals=0,
        ),
    )(count, queries, emb)
    if with_idx:
        return out[0], out[1]
    return out[0], None


def _topk_bucket_pallas_impl(
    emb: jax.Array, queries: jax.Array, count: jax.Array, *, k: int
):
    vals, idx = _bucket_maxima_pallas(emb, queries, count)
    # Exact top-k over the bucket maxima (tiny: [b, n/128]).
    top_vals, pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    return _raw_to_score(top_vals, top_idx)


_topk_bucket_pallas = jax.jit(_topk_bucket_pallas_impl, static_argnames=("k",))


def _bucket_maxima_kernel_q(
    count_ref, q_ref, e_ref, s_ref, vals_ref, *, tile_n: int
):
    """Quantized bucket maxima: int8 rows x bf16 queries, per-row scales
    applied to the [b, tile] block (exact for per-row symmetric
    quantization). Maxima-only (the exact2 selection phase)."""
    step = pl.program_id(0)
    g = tile_n // _BUCKET_ROWS
    subs = _K_LANES // g
    sub = step % subs

    @pl.when(sub == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _RAW_NEG)

    count = count_ref[0]
    raw = jax.lax.dot_general(
        q_ref[:],
        e_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = raw * s_ref[:].reshape(1, tile_n)
    b = scores.shape[0]
    tile_base = step * tile_n
    row_ids = tile_base + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    masked = jnp.where(row_ids < count, scores, _RAW_NEG)
    grouped = masked.reshape(b, g, _BUCKET_ROWS)
    bucket_max = jnp.max(grouped, axis=2)
    if g == _K_LANES:
        vals_ref[:] = bucket_max
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, _K_LANES), 1)
        in_slot = (lane >= sub * g) & (lane < (sub + 1) * g)
        pad_v = jnp.full((b, _K_LANES - g), _RAW_NEG, jnp.float32)
        wide_v = pltpu.roll(jnp.concatenate([bucket_max, pad_v], axis=1), sub * g, 1)
        vals_ref[:] = jnp.where(in_slot, wide_v, vals_ref[:])


def _bucket_maxima_pallas_q(
    emb_q: jax.Array, scales: jax.Array, queries: jax.Array, count: jax.Array
):
    """Per-bucket maxima over an int8 store (selection shadow for exact2).

    Returns None when no 1024-aligned tile fits the VMEM budget (huge dim /
    batch) — the caller falls back to its XLA einsum branch."""
    n_pad, d_pad = emb_q.shape
    b_pad = queries.shape[0]
    tile_n = _pick_tile_bucket(n_pad, d_pad, b_pad, emb_q.dtype.itemsize)
    # The 1-D scales operand carries (1024,) tiling (see _topk_pallas_q_impl).
    if tile_n < n_pad:
        tile_n = max((tile_n // 1024) * 1024, 1024)
        # Alignment may have rounded a 512-row pick UP to 1024: re-check
        # the budget rather than overflow scoped VMEM.
        per_row = 2 * d_pad * emb_q.dtype.itemsize + b_pad * 8
        if tile_n * per_row > 14 * 1024 * 1024:
            return None
    g = tile_n // _BUCKET_ROWS
    subs = max(_K_LANES // g, 1)
    steps = pl.cdiv(n_pad, tile_n)
    blocks = -(-steps // subs)
    kernel = functools.partial(_bucket_maxima_kernel_q, tile_n=tile_n)
    out_spec = pl.BlockSpec(
        (b_pad, _K_LANES),
        lambda i, _subs=subs: (0, i // _subs),
        memory_space=pltpu.VMEM,
    )
    vals = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((b_pad, blocks * _K_LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad + n_pad * 4 + b_pad * d_pad * 2,
            transcendentals=0,
        ),
    )(count, queries, emb_q, scales)[0]
    return vals


def _bucket_maxima_xla(emb: jax.Array, queries: jax.Array, count: jax.Array):
    """XLA bucket maxima (CPU meshes / oracle): materializes [b, n] scores."""
    raw = jnp.einsum(
        "bd,nd->bn",
        queries.astype(emb.dtype),
        emb,
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if emb.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    n_pad = emb.shape[0]
    b = queries.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n_pad), 1)
    raw = jnp.where(row_ids < count, raw, _RAW_NEG)
    nb = n_pad // _BUCKET_ROWS
    grouped = raw.reshape(b, nb, _BUCKET_ROWS)
    vals = jnp.max(grouped, axis=2)
    pos = jnp.argmax(grouped, axis=2).astype(jnp.int32)
    idx = jnp.arange(nb, dtype=jnp.int32)[None, :] * _BUCKET_ROWS + pos
    return vals, jnp.where(vals > -2.0, idx, -1)


# ---------------------------------------------------------------------------
# Two-phase exact search ("exact2"): bucket maxima at the matmul+HBM floor,
# then an exact rescore of the top-(k+slack) buckets per query.
#
# Exactness argument: the top-k bucket maxima are the scores of k distinct
# rows, so the true k-th best row score theta >= M_k (the k-th largest bucket
# max). Every true top-k row scores >= theta, hence lives in a bucket whose
# max >= M_k — i.e. among the top-k buckets (ties aside). Rescoring those
# buckets' rows exactly therefore reproduces the exact top-k. ``slack`` extra
# buckets absorb float ties and any phase-1/phase-2 rounding skew, and each
# query carries a CERTIFICATE: ``B-th selected bucket max <= k-th rescored
# score`` implies no excluded bucket can contain a better row. With both
# phases computing identical scores the certificate holds unconditionally
# (the rescored top-k dominates the selected bucket maxima); callers treat a
# failed certificate (phase skew only) as "fall back to the one-phase kernel".
# ---------------------------------------------------------------------------


# Certificate slack for phase-1 vs phase-2 score skew: both phases compute
# the same dot products, but accumulation order differs (Pallas MXU pass vs
# XLA batched dot), so identical rows can differ by f32-accumulation noise
# (~1e-7 relative over d<=4096 terms). A certificate within _CERT_EPS means
# "exact up to eps-score ties" — any row the selection could have missed is
# within eps of the returned k-th score, the same arbitrary-tie-break
# latitude the reference's argpartition has.
_CERT_EPS = 1e-5


def _rescore_kernel(ids_ref, q_ref, *refs, B: int):
    """One grid step = one query: VPU-rescore its B selected buckets.

    The B embedding operands are the same HBM array with scalar-prefetch
    index maps, so each step DMAs exactly the selected buckets' rows into
    VMEM — no materialized [b, B*128, d] gather (the XLA gather path measured
    ~100 GB/s effective; this streams at DMA speed).
    """
    e_refs, out_ref = refs[:-1], refs[-1]
    i = pl.program_id(0)
    # Queries and the output live whole in VMEM (block index maps are
    # constant, so they stay resident across grid steps); row i is
    # dynamically indexed — per-step (1, lanes) blocks violate Mosaic's
    # 8-sublane block rule.
    q = q_ref[pl.ds(i, 1), :].astype(jnp.float32)  # [1, d]
    pieces = []
    for e_ref in e_refs:
        rows = e_ref[:].astype(jnp.float32)  # [128, d_pad]
        pieces.append(jnp.sum(rows * q, axis=1).reshape(1, _BUCKET_ROWS))
    out_ref[pl.ds(i, 1), :] = jnp.concatenate(pieces, axis=1)


def _rescore_selected_pallas(emb, queries, bucket_ids, *, B: int):
    """Raw rescore scores [b, B*128] for each query's selected buckets."""
    # Mosaic cannot dynamically index packed (16-bit) sublanes — the kernel
    # selects query row i with ``pl.ds(program_id, 1)``, which only lowers for
    # 32-bit operands ("index in dimension 0 is a multiple of 8" compile
    # error on a bf16 ref). bf16->f32 is exact, so upcasting the wire dtype
    # here is selection-identical; the kernel computes in f32 regardless.
    queries = queries.astype(jnp.float32)
    b, d_pad = queries.shape
    kernel = functools.partial(_rescore_kernel, B=B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((b, d_pad), lambda i, ids: (0, 0))]
        + [
            pl.BlockSpec(
                (_BUCKET_ROWS, d_pad),
                functools.partial(lambda j, i, ids: (ids[i, j], 0), j),
            )
            for j in range(B)
        ],
        out_specs=pl.BlockSpec((b, B * _BUCKET_ROWS), lambda i, ids: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, B * _BUCKET_ROWS), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * B * _BUCKET_ROWS * d_pad,
            bytes_accessed=b * B * _BUCKET_ROWS * d_pad * emb.dtype.itemsize,
            transcendentals=0,
        ),
    )(bucket_ids, queries, *([emb] * B))


# VMEM ceiling for the rescore kernel's B double-buffered bucket blocks, and
# a hard operand-count cap: a B=32-operand rescore faulted the v5e TPU
# worker at small shapes (nb == B == 32, d_pad=128); B <= 24 is validated.
_RESCORE_VMEM = 13 * 1024 * 1024
_RESCORE_MAX_B = 24


def _rescore_fits(d_pad: int, itemsize: int, B: int) -> bool:
    return (
        B <= _RESCORE_MAX_B
        and 2 * B * _BUCKET_ROWS * d_pad * itemsize <= _RESCORE_VMEM
    )


def max_rescore_b(d_pad: int, itemsize: int) -> int:
    """Largest bucket count the Pallas selected-rescore kernel can take.

    Past this the rescore falls back to the XLA gather path, which
    MATERIALIZES [b, B*128, d] candidate rows — ~1.2 GB at B=48, b=256,
    d=384 bf16 — and RESOURCE_EXHAUSTs next to a large resident store.
    Escalation policies must cap at this bound on TPU."""
    return max(
        1,
        min(_RESCORE_MAX_B, _RESCORE_VMEM // (2 * _BUCKET_ROWS * d_pad * itemsize)),
    )


def _exact2_phase2(emb, queries, count, bvals, bidx, *, k: int, B: int, use_pallas: bool):
    """Rescore the top-B buckets per query exactly; returns (vals, idx, cert)."""
    del bidx  # selection rescoring covers whole buckets; argmax ids unused
    return _exact2_phase2_rescore(
        emb, queries, count, bvals, k=k, B=B, use_pallas=use_pallas,
        eps=_CERT_EPS,
    )


def _topk_exact2_impl(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    *,
    k: int,
    slack: int,
    use_pallas: bool,
):
    nb = emb.shape[0] // _BUCKET_ROWS
    B = min(k + slack, nb)
    if use_pallas:
        bvals, bidx = _bucket_maxima_pallas(
            emb, queries, count.reshape(1), with_idx=False
        )
    else:
        bvals, bidx = _bucket_maxima_xla(emb, queries, count.reshape(()))
    return _exact2_phase2(
        emb, queries, count.reshape(()), bvals, bidx, k=k, B=B,
        use_pallas=use_pallas,
    )


_topk_exact2 = jax.jit(
    _topk_exact2_impl, static_argnames=("k", "slack", "use_pallas")
)


# Hybrid certificate slack: phase 1 scores come from the bf16 shadow, phase 2
# rescoring from the f32 buffer. |bf16_cos - f32_cos| <= ~2^-8 for normalized
# rows (input rounding), so a certificate within 5e-3 bounds what a selection
# miss could cost; the extra selection slack (default B = k + 14) makes the
# gap between the k-th rescored score and the B-th shadow max comfortably
# wider than that in practice.
_CERT_EPS_HYBRID = 5e-3
_HYBRID_SLACK = 14


def _exact2_phase2_rescore(emb, queries, count, bvals, *, k, B, use_pallas, eps):
    """Phase 2 against an arbitrary rescore buffer ``emb`` (f32 path of the
    hybrid mode, or same-dtype for the plain mode)."""
    b = queries.shape[0]
    nb = bvals.shape[1]
    top_bvals, bucket_ids = jax.lax.top_k(bvals, B)
    real_nb = emb.shape[0] // _BUCKET_ROWS
    safe_ids = jnp.clip(bucket_ids, 0, real_nb - 1)
    row_ids = (
        safe_ids[:, :, None] * _BUCKET_ROWS
        + jnp.arange(_BUCKET_ROWS, dtype=jnp.int32)[None, None, :]
    ).reshape(b, B * _BUCKET_ROWS)
    if use_pallas and _rescore_fits(emb.shape[1], emb.dtype.itemsize, B):
        raw = _rescore_selected_pallas(emb, queries, safe_ids, B=B)
    else:
        cand = jnp.take(emb, row_ids, axis=0)
        raw = jax.lax.dot_general(
            queries.astype(emb.dtype),
            cand,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if emb.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        )
    raw = jnp.where(row_ids < count, raw, _RAW_NEG)
    vals, pos = jax.lax.top_k(raw, k)
    idx = jnp.take_along_axis(row_ids, pos, axis=1)
    if B >= nb:
        cert = jnp.ones((b,), dtype=bool)
    else:
        cert = top_bvals[:, B - 1] <= vals[:, k - 1] + eps
    s_vals, s_idx = _raw_to_score(vals, idx)
    return s_vals, s_idx, cert


def _topk_exact2_hybrid_impl(
    emb: jax.Array,  # [n_pad, d_pad] f32 — the rescore (truth) buffer
    shadow: jax.Array,  # [n_pad, d_pad] bf16 — the selection buffer
    queries: jax.Array,
    count: jax.Array,
    *,
    k: int,
    slack: int,
    use_pallas: bool,
):
    nb = emb.shape[0] // _BUCKET_ROWS
    B = min(k + slack, nb)
    if use_pallas:
        bvals, _ = _bucket_maxima_pallas(
            shadow, queries, count.reshape(1), with_idx=False
        )
    else:
        bvals, _ = _bucket_maxima_xla(shadow, queries, count.reshape(()))
    return _exact2_phase2_rescore(
        emb, queries, count.reshape(()), bvals, k=k, B=B,
        use_pallas=use_pallas, eps=_CERT_EPS_HYBRID,
    )


_topk_exact2_hybrid = jax.jit(
    _topk_exact2_hybrid_impl, static_argnames=("k", "slack", "use_pallas")
)


# int8-selection certificate slack: |dequant_int8_cos - f32_cos| <= ~1e-2
# (7-bit mantissa per element, scale quantization). Selection needs more
# slack than the bf16 shadow; the cert still bounds any miss to an
# eps-score tie.
_CERT_EPS_HYBRID_I8 = 2e-2
_HYBRID_I8_SLACK = 14


def _topk_exact2_hybrid_i8_impl(
    emb: jax.Array,  # [n_pad, d_pad] f32 — rescore (truth) buffer
    shadow_q: jax.Array,  # [n_pad, d_pad] int8 selection shadow
    shadow_scales: jax.Array,  # [n_pad] f32
    queries: jax.Array,
    count: jax.Array,
    *,
    k: int,
    slack: int,
    use_pallas: bool,
):
    nb = emb.shape[0] // _BUCKET_ROWS
    B = min(k + slack, nb)
    # The quantized maxima kernel is validated at large-store shapes (the
    # int8 shadow only pays off there); small stores take the XLA branch —
    # a Mosaic fault was observed at n_pad=4096/b=8 on v5e.
    bvals = None
    if use_pallas and emb.shape[0] >= 64 * 1024:
        bvals = _bucket_maxima_pallas_q(
            shadow_q,
            shadow_scales,
            queries.astype(jnp.bfloat16),
            count.reshape(1),
        )
    if bvals is None:
        raw = jnp.einsum(
            "bd,nd->bn",
            queries.astype(jnp.float32),
            shadow_q.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * shadow_scales[None, :]
        n_pad = shadow_q.shape[0]
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (queries.shape[0], n_pad), 1
        )
        raw = jnp.where(row_ids < count.reshape(()), raw, _RAW_NEG)
        bvals = jnp.max(
            raw.reshape(queries.shape[0], n_pad // _BUCKET_ROWS, _BUCKET_ROWS),
            axis=2,
        )
    return _exact2_phase2_rescore(
        emb, queries, count.reshape(()), bvals, k=k, B=B,
        use_pallas=use_pallas, eps=_CERT_EPS_HYBRID_I8,
    )


_topk_exact2_hybrid_i8 = jax.jit(
    _topk_exact2_hybrid_i8_impl, static_argnames=("k", "slack", "use_pallas")
)


def topk_program_exact2_hybrid_i8(
    emb: jax.Array,
    shadow_q: jax.Array,
    shadow_scales: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    k: int,
    slack: int = _HYBRID_I8_SLACK,
    use_pallas: bool | None = None,
) -> CertifiedTopK:
    """Traceable int8-selection hybrid exact top-k: quarter-bandwidth bucket
    selection over an int8 shadow + exact f32 VPU rescore of the selected
    buckets. Wider slack + certificate absorb the quantization skew.
    Call INSIDE jit/lax.map (an eager scalar-prefetch rescore faulted the
    v5e worker); standalone callers use :func:`cosine_topk_exact2_hybrid_i8`.
    """
    k = min(k, emb.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    return _topk_exact2_hybrid_i8_impl(
        emb, shadow_q, shadow_scales, queries, count,
        k=k, slack=slack, use_pallas=use_pallas,
    )


def cosine_topk_exact2_hybrid_i8(
    emb: jax.Array,
    shadow_q: jax.Array,
    shadow_scales: jax.Array,
    queries: jax.Array,
    count: jax.Array | int,
    k: int,
    *,
    slack: int = _HYBRID_I8_SLACK,
) -> CertifiedTopK:
    """Batched (jitted) int8-selection hybrid exact top-k."""
    k = min(k, emb.shape[0])
    count_arr = jnp.asarray(count, dtype=jnp.int32).reshape(())
    use_pallas = _platform_of(emb) == "tpu"
    return _topk_exact2_hybrid_i8(
        emb, shadow_q, shadow_scales, queries, count_arr,
        k=k, slack=slack, use_pallas=use_pallas,
    )


def topk_program_exact2_hybrid(
    emb: jax.Array,
    shadow: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    k: int,
    slack: int = _HYBRID_SLACK,
    use_pallas: bool | None = None,
) -> CertifiedTopK:
    """Traceable hybrid exact top-k: bf16-shadow bucket selection (half the
    HBM read of an f32 scan, single MXU pass) + exact f32 rescore of the
    selected buckets on the VPU (full f32 multiply-accumulate — the same
    score the HIGHEST-precision f32 scan produces). ~2.4x the one-phase
    f32 kernel at 1M x 384 with recall 1.0 against the f32 oracle."""
    k = min(k, emb.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    return _topk_exact2_hybrid_impl(
        emb, shadow, queries, count, k=k, slack=slack, use_pallas=use_pallas
    )


def cosine_topk_exact2_hybrid(
    emb: jax.Array,
    shadow: jax.Array,
    queries: jax.Array,
    count: jax.Array | int,
    k: int,
    *,
    slack: int = _HYBRID_SLACK,
) -> CertifiedTopK:
    """Batched hybrid exact top-k (see :func:`topk_program_exact2_hybrid`)."""
    k = min(k, emb.shape[0])
    count_arr = jnp.asarray(count, dtype=jnp.int32).reshape(())
    use_pallas = _platform_of(emb) == "tpu"
    return _topk_exact2_hybrid(
        emb, shadow, queries, count_arr, k=k, slack=slack, use_pallas=use_pallas
    )


def topk_program_exact2(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    k: int,
    slack: int = 6,
    use_pallas: bool | None = None,
) -> CertifiedTopK:
    """Traceable two-phase exact top-k (usable inside jit/lax.map bodies).

    Returns ``(vals, idx, cert)`` — cert[b] True means the result is certified
    exact for that query (see the module note above; with identical phase
    scoring it is always True, and a False is a signal to re-run the query
    through :func:`topk_program`).
    """
    k = min(k, emb.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    return _topk_exact2_impl(
        emb, queries, count, k=k, slack=slack, use_pallas=use_pallas
    )


def cosine_topk_exact2(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array | int,
    k: int,
    *,
    slack: int = 6,
) -> CertifiedTopK:
    """Batched exact top-k via bucket-select + rescore (the large-store fast
    exact path: phase 1 runs at the fused matmul floor; phase 2 touches only
    ``(k+slack)*128`` rows per query)."""
    k = min(k, emb.shape[0])
    count_arr = jnp.asarray(count, dtype=jnp.int32).reshape(())
    use_pallas = _platform_of(emb) == "tpu"
    return _topk_exact2(
        emb, queries, count_arr, k=k, slack=slack, use_pallas=use_pallas
    )


def cosine_topk_bucket(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array | int,
    k: int,
) -> TopK:
    """Bucketed approximate top-k (recall@10 ~0.999 at 1M random rows).

    TPU-only fusion; other platforms fall back to ``cosine_topk_approx``.
    """
    k = min(k, emb.shape[0])
    count_arr = jnp.asarray(count, dtype=jnp.int32).reshape(())
    if _use_pallas() and _platform_of(emb) == "tpu":
        return _topk_bucket_pallas(emb, queries, count_arr.reshape(1), k=k)
    return _topk_approx_impl(emb, queries, count_arr, k=k, recall_target=0.97)


# ---------------------------------------------------------------------------
# Multi-batch single-dispatch program: R query batches through one jit call
# (lax.map). The coalesced serving path — a loaded server pays one tunnel
# round trip for R batches instead of R.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("k", "mode", "use_pallas", "recall_target", "slack"),
)
def topk_many(
    emb: jax.Array,
    aux: jax.Array | None,  # scales (int8) / bf16 shadow (hybrid) / None
    qs: jax.Array,  # [R, b_pad, d_pad]
    count: jax.Array,
    *,
    k: int,
    mode: str,
    use_pallas: bool,
    recall_target: float = 0.95,
    slack: int | None = None,
) -> TopK | CertifiedTopK:
    """R batched lookups in one dispatch; returns stacked engine outputs
    ([R, b, k] vals/idx, plus [R, b] certs for the exact2 modes)."""

    def one(q):
        if mode == "exact1":
            return topk_program(emb, q, count, k, use_pallas=use_pallas)
        if mode == "exact2":
            return topk_program_exact2(
                emb, q, count, k, slack=6 if slack is None else slack,
                use_pallas=use_pallas,
            )
        if mode == "exact2h":
            return topk_program_exact2_hybrid(
                emb, aux, q, count, k,
                slack=_HYBRID_SLACK if slack is None else slack,
                use_pallas=use_pallas,
            )
        if mode == "quantized":
            return topk_program_quantized(
                emb, aux, q, count, k, use_pallas=use_pallas
            )
        if mode == "approx":
            return _topk_approx_impl(
                emb, q, count.reshape(()), k=k, recall_target=recall_target
            )
        raise ValueError(f"unknown mode: {mode}")

    return jax.lax.map(one, qs)


# ---------------------------------------------------------------------------
# XLA path (CPU meshes / oracle)
# ---------------------------------------------------------------------------


def _topk_xla_impl(emb: jax.Array, queries: jax.Array, count: jax.Array, *, k: int):
    scores = _scores_xla(emb, queries, count)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


_topk_xla = jax.jit(_topk_xla_impl, static_argnames=("k",))


def topk_program(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    k: int,
    use_pallas: bool | None = None,
) -> TopK:
    """Traceable (unjitted) fused top-k — usable inside shard_map/jit bodies.

    ``count`` must be a scalar int32 array. Inside shard_map the operands are
    tracers with no device, so callers targeting a specific mesh must pass
    ``use_pallas`` explicitly (True only for TPU meshes).
    """
    k = min(k, emb.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas and k <= _PALLAS_MAX_K:
        return _topk_pallas_impl(emb, queries, count.reshape(1), k=k)
    return _topk_xla_impl(emb, queries, count, k=k)


def topk_program_quantized(
    emb_q: jax.Array,
    scales: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    k: int,
    use_pallas: bool | None = None,
) -> TopK:
    """Traceable (unjitted) quantized top-k — usable inside shard_map bodies.

    ``count`` must be a scalar int32 array; ``use_pallas`` as in
    :func:`topk_program` (True only for TPU meshes).
    """
    k = min(k, emb_q.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas and k <= _PALLAS_MAX_K:
        return _topk_pallas_q_impl(
            emb_q, scales, queries.astype(jnp.bfloat16), count.reshape(1), k=k
        )
    return _topk_xla_q_impl(emb_q, scales, queries, count, k=k)


def _scores_xla(emb: jax.Array, queries: jax.Array, count: jax.Array) -> jax.Array:
    scores = jnp.einsum(
        "bd,nd->bn",
        queries.astype(emb.dtype),
        emb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = jnp.clip((scores + 1.0) * 0.5, 0.0, 1.0)
    n = emb.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < count
    return jnp.where(valid, scores, _NEG)


@jax.jit
def _cosine_scores_jit(emb: jax.Array, queries: jax.Array, count: jax.Array):
    return _scores_xla(emb, queries, count)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def cosine_topk(
    emb: jax.Array,
    queries: jax.Array,
    count: jax.Array | int,
    k: int,
    *,
    force_xla: bool = False,
) -> TopK:
    """Batched fused top-k.

    Args:
      emb: ``[n_pad, d_pad]`` padded embedding buffer (rows >= count are junk).
      queries: ``[b_pad, d_pad]`` padded, L2-normalized query block.
      count: live-row watermark.
      k: number of results per query (static).

    Returns:
      ``(vals [b_pad, k] f32, idx [b_pad, k] i32)`` scores in [0, 1] descending
      per row; invalid slots have ``vals < 0`` and ``idx = -1`` (Pallas) or
      point at masked rows with ``vals < 0`` (XLA) — callers filter on
      ``vals >= 0``.
    """
    k = min(k, emb.shape[0])
    count_arr = jnp.asarray([count], dtype=jnp.int32) if np.isscalar(count) else count
    if _platform_of(emb) == "tpu" and not force_xla and k <= _PALLAS_MAX_K:
        return _topk_pallas(emb, queries, count_arr, k=k)
    return _topk_xla(emb, queries, count_arr[0], k=k)


def cosine_scores(emb: jax.Array, queries: jax.Array, count: jax.Array | int) -> jax.Array:
    """Full masked score matrix ``[b, n_pad]`` (for host-predicate paths)."""
    count_arr = jnp.asarray(count, dtype=jnp.int32)
    return _cosine_scores_jit(emb, queries, count_arr)


@functools.partial(jax.jit, static_argnames=("k",))
def _subset_topk_jit(emb, queries, ordinals, valid, *, k: int):
    rows = jnp.take(emb, jnp.clip(ordinals, 0, emb.shape[0] - 1), axis=0)
    scores = jnp.einsum(
        "bd,sd->bs",
        queries.astype(emb.dtype),
        rows,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = jnp.clip((scores + 1.0) * 0.5, 0.0, 1.0)
    scores = jnp.where(valid[None, :], scores, _NEG)
    vals, pos = jax.lax.top_k(scores, k)
    idx = jnp.take(ordinals, pos)
    return vals, idx


def subset_cosine_topk(
    emb: jax.Array,
    queries: jax.Array,
    ordinals: jax.Array,
    valid: jax.Array,
    k: int,
) -> TopK:
    """Top-k restricted to a padded ordinal subset.

    Replicates ``fuzzy_lookup_embedding_in_subset`` (``vectorbase.py:203-230``):
    gather the subset's rows on device, score, and take top-k within it.
    ``ordinals`` is padded to a bucket size; ``valid`` marks real entries.
    """
    k = min(k, ordinals.shape[0])
    return _subset_topk_jit(emb, queries, ordinals, valid, k=k)
