"""int4 selection shadow: packed-nibble bucket maxima + exact rescore.

Every full-scan engine in :mod:`typeagent_tpu.ops.topk` is HBM-bound at
large stores (1M x 384 bf16 = 768 MB/scan). A per-row-scaled int4 shadow
reads 256 MB — IF the scan reads packed nibbles. XLA cannot: a
``jnp.int4`` dot operand crashes this JAX version outright (RecursionError,
probed on v5e), and an ``astype`` to a wide dtype materializes the copy in
HBM. So the packing is manual and the scan is a Pallas kernel:

  * **Column-split packing**: byte ``packed[i, c]`` holds column ``c`` of
    row ``i`` (low nibble) and column ``c + d/2`` (high nibble). Packed
    rows are original rows, so the 128-row bucket structure — and the
    whole exact2 phase-2 — carry over unchanged. (Row-pair packing would
    be 192 MB with zero lane padding, but its bucket maxima need 64-lane
    grouped reductions, which crash this libtpu's Mosaic backend — the
    bisect lives in NOTES.md round-4. The lane pad costs 256 vs 192 MB.)
  * In-kernel unpack: sign-extended nibble extraction via int32 shifts
    (``(p << 28) >> 28`` / ``p >> 4`` — shift semantics are mod-2^32, so
    the wrap IS the sign extension; shifts directly on int8 vectors also
    crash Mosaic), then two half-width MXU dots against the query's
    split-padded halves.

The selection feeds the exact2 phase-2 machinery (`ops.topk`): the top-B
buckets per query are rescored exactly from the full-precision buffer, so
final scores are identical to the exact engines'. int4 selection error
(|deq - f32 cos| <= ~2.5e-2 for unit rows) is absorbed by the selection
slack. NOTE: the i4 certificate is HEURISTIC, not a proven bound — it
compares int4-approximate bucket maxima, and ``_CERT_EPS_I4`` covers the
*measured* p100 quantization error, so a true bucket max can in principle
still exceed the approximation. Treat a True cert as quality telemetry;
callers that need a sound exactness certificate use the bf16-shadow
hybrid (``topk_program_exact2_hybrid``) or the exact engines.

Semantics preserved from the reference scan: ``aitools/vectorbase.py:163-201``
(score map, count watermark, descending order) — via the shared phase-2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from typeagent_tpu.ops.topk import (
    _BUCKET_ROWS,
    _K_LANES,
    _RAW_NEG,
    _exact2_phase2_rescore,
    _platform_of,
    _use_pallas,
)

__all__ = [
    "quantize_rows_int4_device",
    "quantize_rows_int4",
    "split_pad_queries",
    "topk_program_exact2_i4",
    "cosine_topk_exact2_i4",
]

# int4-selection certificate slack: |deq_int4_cos - f32_cos|. Per element
# the code error is <= scale/2 with scale = max|row|/7; for unit rows at
# d=384 the dot error concentrates at ~scale/sqrt(12) ~ 1e-2 but the sound
# bound is the measured p100 over real corpora (~3e-2). The cert is a
# quality telemetry signal at this eps, not an exactness proof — callers
# wanting recall 1.0 use the bf16-shadow hybrid.
_CERT_EPS_I4 = 5e-2
_I4_SLACK = 14

# VMEM accounting per packed row tile: double-buffered packed bytes plus
# the i32/bf16 unpack temporaries Mosaic keeps live, plus [b, tile] blocks.
_Q4_BUDGET = 14 * 1024 * 1024


def _half_pad(d: int) -> int:
    half = (d + 1) // 2
    return -(-half // _K_LANES) * _K_LANES


@functools.partial(jax.jit, static_argnames=("dh",))
def _pack_codes(codes: jax.Array, dh: int) -> jax.Array:
    """[n, d] int8 codes -> [n, dh] packed bytes (lo = col c, hi = col
    c + d/2; hi columns past d and lane padding are zero)."""
    n, d = codes.shape
    half = (d + 1) // 2
    lo = jnp.zeros((n, dh), jnp.int8).at[:, :half].set(codes[:, :half])
    hi = jnp.zeros((n, dh), jnp.int8).at[:, : d - half].set(codes[:, half:])
    return jnp.bitwise_or(
        jnp.left_shift(hi, 4), jnp.bitwise_and(lo, jnp.int8(0xF))
    )


@jax.jit
def _int4_codes(rows: jax.Array):
    rows = rows.astype(jnp.float32)
    scales = jnp.abs(rows).max(axis=1) / 7.0
    scales = jnp.where(scales > 0, scales, 1.0)
    codes = jnp.clip(jnp.round(rows / scales[:, None]), -7, 7).astype(jnp.int8)
    return codes, scales


def quantize_rows_int4_device(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int4 quantization, column-split packed.

    rows: [n, d] -> (packed [n, half_pad(d)] int8, scales [n] f32).
    """
    codes, scales = _int4_codes(rows)
    return _pack_codes(codes, _half_pad(rows.shape[1])), scales


def quantize_rows_int4(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host twin of :func:`quantize_rows_int4_device`."""
    rows = np.asarray(rows, dtype=np.float32)
    n, d = rows.shape
    scales = np.abs(rows).max(axis=1) / 7.0
    scales = np.where(scales > 0, scales, 1.0).astype(np.float32)
    codes = np.clip(np.round(rows / scales[:, None]), -7, 7).astype(np.int8)
    half = (d + 1) // 2
    dh = _half_pad(d)
    lo = np.zeros((n, dh), np.int8)
    hi = np.zeros((n, dh), np.int8)
    lo[:, :half] = codes[:, :half]
    hi[:, : d - half] = codes[:, half:]
    return ((hi << 4) | (lo & 0xF)).astype(np.int8), scales


def split_pad_queries(queries: jax.Array, d: int) -> jax.Array:
    """[b, d] queries -> [b, 2*half_pad(d)] bf16 split halves, zero-padded
    so the kernel's two half-width dots line up with the nibble streams."""
    b = queries.shape[0]
    half = (d + 1) // 2
    dh = _half_pad(d)
    q = queries.astype(jnp.bfloat16)
    out = jnp.zeros((b, 2 * dh), jnp.bfloat16)
    out = out.at[:, :half].set(q[:, :half])
    out = out.at[:, dh : dh + (d - half)].set(q[:, half:])
    return out


def _unpack_nibbles_i32(p32):
    """Sign-extended (lo, hi) int32 codes from sign-extended packed bytes."""
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    return lo, hi


def _bucket_maxima_kernel_q4(
    count_ref, q_ref, e_ref, s_ref, vals_ref, *, tile_n: int, dh: int
):
    """int4 bucket maxima grid step over a [tile_n, dh] packed block.

    Mirrors ``ops.topk._bucket_maxima_kernel_q`` (output blending, masking,
    128-row buckets); only the score computation differs: unpack nibbles,
    two half-width MXU dots against the split query halves."""
    step = pl.program_id(0)
    g = tile_n // _BUCKET_ROWS
    subs = max(_K_LANES // g, 1)
    sub = step % subs

    @pl.when(sub == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, _RAW_NEG)

    count = count_ref[0]
    p32 = e_ref[:].astype(jnp.int32)
    lo, hi = _unpack_nibbles_i32(p32)
    raw = jax.lax.dot_general(
        q_ref[:, :dh],
        lo.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        q_ref[:, dh:],
        hi.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = raw * s_ref[:].reshape(1, tile_n)
    b = scores.shape[0]
    tile_base = step * tile_n
    row_ids = tile_base + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    masked = jnp.where(row_ids < count, scores, _RAW_NEG)
    bucket_max = jnp.max(masked.reshape(b, g, _BUCKET_ROWS), axis=2)
    if g == _K_LANES:
        vals_ref[:] = bucket_max
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, _K_LANES), 1)
        in_slot = (lane >= sub * g) & (lane < (sub + 1) * g)
        pad_v = jnp.full((b, _K_LANES - g), _RAW_NEG, jnp.float32)
        wide_v = pltpu.roll(jnp.concatenate([bucket_max, pad_v], axis=1), sub * g, 1)
        vals_ref[:] = jnp.where(in_slot, wide_v, vals_ref[:])


def _pick_tile_q4(n_pad: int, dh: int, b_pad: int) -> int:
    """Row tile: double-buffered packed bytes + unpack temporaries (i32 +
    bf16 per nibble stream) + [b, tile] score blocks.

    POWER OF TWO >= 1024, capped at 4096 (mirrors ``_pick_tile_bucket``):
    the kernel's sub-slot blending requires buckets-per-tile (tile/128) to
    divide ``_K_LANES`` — a non-dividing tile (e.g. 3072 -> g=24, subs=5,
    subs*g=120 != 128) shifts every bucket past lane 120 of each output
    block, and phase 2 rescores the WRONG buckets (round-4 advisor
    finding). 1024 is also the 1-D scales operand's tiling quantum."""
    per_row = 2 * dh + 12 * dh + b_pad * 10
    tile = 1024
    while tile * 2 <= 4096 and (tile * 2) * per_row <= _Q4_BUDGET:
        tile *= 2
    return tile


def _bucket_maxima_pallas_q4(packed, scales, queries_split, count, *, interpret=False):
    """Per-bucket maxima over the packed int4 shadow (selection phase).

    ``queries_split``: output of :func:`split_pad_queries`. Returns None
    when no aligned tile fits VMEM (caller falls back to XLA).
    ``interpret``: run the kernel in Pallas interpret mode (CPU parity
    tests — the tile/blending layout is exercised without a real chip)."""
    n_pad, dh = packed.shape
    b_pad = queries_split.shape[0]
    tile_n = _pick_tile_q4(n_pad, dh, b_pad)
    if tile_n > n_pad:
        tile_n = n_pad  # whole-array operand (capacities are 1024-aligned)
    per_row = 2 * dh + 12 * dh + b_pad * 10
    if tile_n * per_row > _Q4_BUDGET:
        return None
    g = tile_n // _BUCKET_ROWS
    subs = max(_K_LANES // g, 1)
    steps = pl.cdiv(n_pad, tile_n)
    if steps > 1 and subs * g != _K_LANES:
        # Sub-slot blending only lays buckets out contiguously when
        # buckets-per-tile divides the lane count; the whole-array clamp
        # above can produce a non-dividing tile (n_pad=3072 -> g=24), which
        # is safe ONLY single-step. Multi-step: XLA fallback.
        return None
    blocks = -(-steps // subs)
    kernel = functools.partial(_bucket_maxima_kernel_q4, tile_n=tile_n, dh=dh)
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
            pl.BlockSpec(
                (b_pad, 2 * dh), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile_n, dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((b_pad, blocks * _K_LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * (2 * dh),
            bytes_accessed=n_pad * dh + n_pad * 4 + b_pad * 2 * dh * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(count, queries_split, packed, scales)[0]
    # Bucket p covers rows [p*128, (p+1)*128) — the same table layout as
    # ops.topk's maxima, so phase 2 consumes it unchanged.
    return vals


def _bucket_maxima_xla_q4(packed, scales, queries, count, d: int):
    """XLA fallback (CPU meshes / oracle): unpack + einsum + grouped max."""
    p32 = packed.astype(jnp.int32)
    lo, hi = _unpack_nibbles_i32(p32)
    half = (d + 1) // 2
    dh = packed.shape[1]
    q = queries.astype(jnp.float32)
    q_lo = jnp.zeros((q.shape[0], dh), jnp.float32).at[:, :half].set(q[:, :half])
    q_hi = (
        jnp.zeros((q.shape[0], dh), jnp.float32)
        .at[:, : d - half]
        .set(q[:, half:])
    )
    raw = (
        jnp.einsum(
            "bd,nd->bn", q_lo, lo.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        + jnp.einsum(
            "bd,nd->bn", q_hi, hi.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    ) * scales[None, :]
    b, n_pad = raw.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n_pad), 1)
    raw = jnp.where(row_ids < count, raw, _RAW_NEG)
    g = n_pad // _BUCKET_ROWS
    return jnp.max(raw.reshape(b, g, _BUCKET_ROWS), axis=2)


def _topk_exact2_i4_impl(
    emb: jax.Array,  # [n_pad, d_pad] rescore (truth) buffer — bf16 or f32
    packed: jax.Array,  # [n_pad, half_pad(d)] int8 packed nibbles
    scales: jax.Array,  # [n_pad] f32 per-row scales
    queries: jax.Array,
    count: jax.Array,
    *,
    k: int,
    slack: int,
    use_pallas: bool,
):
    nb = emb.shape[0] // _BUCKET_ROWS
    B = min(k + slack, nb)
    d = emb.shape[1]
    bvals = None
    if use_pallas and emb.shape[0] >= 64 * 1024:
        # Small stores take XLA: the quantized Pallas maxima are validated
        # at large shapes only (mirrors the int8 shadow's gate).
        bvals = _bucket_maxima_pallas_q4(
            packed, scales, split_pad_queries(queries, d), count.reshape(1)
        )
    if bvals is None:
        bvals = _bucket_maxima_xla_q4(
            packed, scales, queries, count.reshape(()), d
        )
    return _exact2_phase2_rescore(
        emb, queries, count.reshape(()), bvals, k=k, B=B,
        use_pallas=use_pallas, eps=_CERT_EPS_I4,
    )


_topk_exact2_i4 = jax.jit(
    _topk_exact2_i4_impl, static_argnames=("k", "slack", "use_pallas")
)


def topk_program_exact2_i4(
    emb: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    queries: jax.Array,
    count: jax.Array,
    k: int,
    slack: int = _I4_SLACK,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Traceable int4-selection two-phase top-k: third-of-bf16 HBM bucket
    selection over the packed nibble shadow + exact rescore of the selected
    buckets from ``emb`` (the store's full-precision buffer). Returns
    ``(vals, idx, cert)`` with final scores identical to the exact engines.
    Call inside jit/lax.map; standalone callers use
    :func:`cosine_topk_exact2_i4`.
    """
    k = min(k, emb.shape[0])
    if use_pallas is None:
        use_pallas = _use_pallas()
    return _topk_exact2_i4_impl(
        emb, packed, scales, queries, count,
        k=k, slack=slack, use_pallas=use_pallas,
    )


def cosine_topk_exact2_i4(
    emb: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    queries: jax.Array,
    count: jax.Array | int,
    k: int,
    *,
    slack: int = _I4_SLACK,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched (jitted) int4-selection two-phase top-k."""
    k = min(k, emb.shape[0])
    count_arr = jnp.asarray(count, dtype=jnp.int32).reshape(())
    use_pallas = _platform_of(emb) == "tpu"
    return _topk_exact2_i4(
        emb, packed, scales, queries, count_arr,
        k=k, slack=slack, use_pallas=use_pallas,
    )
