"""Device IVF: learned 128-row buckets + exact outlier tail + certified rescore.

Every full-scan engine in ops/topk.py sits on this attach's measured
roofline (docs/performance.md): ~317 GB/s streaming, ~70 TFLOP/s effective
MXU — and a native int8 MXU probe (tools/tpu_int8_floor_probe.py) moved the
floor only ~10%. Reading fewer rows is the only remaining lever. On
*clustered* corpora (the structure real text-embedding data has — isotropic
random data is the information-theoretic worst case where NO sublinear
method reaches recall 0.99; NOTES.md round-4 records the simulation) a
coarse quantizer prunes almost everything.

Design — "exact2 with learned buckets plus an exact tail":

* Build (host-orchestrated, heavy ops on device): k-means (Lloyd on a
  training sample; chunked one-hot matmuls instead of data-dependent
  scatters) assigns every live row to one of ~n/128 clusters. The
  ``outlier_frac`` worst-fitting rows (lowest best-centroid score — e.g.
  topic-less background text) are EXILED to a separate tail buffer; the
  rest are reordered by cluster into semantically coherent 128-row
  buckets with per-bucket f32 centroid ``c`` and radius
  ``r = max ||x − c||``. Exiling the outliers is what keeps radii tight:
  without it every bucket catches a few background rows and r balloons
  from ~0.36 to ~1.2 (measured), killing both the bound's selectivity
  and the certificate.
* Query phase 1: ``bound = q·c + r`` per bucket — by Cauchy–Schwarz an
  upper bound on every row score in the bucket. FLOPs: b × nb × d, ~128×
  fewer than the full scan.
* Query phase 2: scalar-prefetch Pallas rescore of the top-B buckets
  (ops/topk.py machinery) — exact scores for ~B·128 rows per query.
* Exact tail: the outlier buffer (~outlier_frac of the store) is scanned
  EXACTLY by the fused one-phase kernel and merged. Queries near
  unclustered content get their neighbors from here.
* Certificate (sound for ANY data): ``max excluded-bucket bound ≤ k-th
  merged score + eps`` — no excluded bucket can hold a better row, and
  the tail was scanned exactly, so a certified result IS the exact top-k
  (up to eps ties). On clustered corpora it holds for most queries; on
  adversarial data it reports False rather than silently approximating.

Replaces (behaviorally): the reference's brute-force
`VectorBase.fuzzy_lookup_embedding` (reference aitools/vectorbase.py:163-201)
at large scale; full-scan engines remain for uncertified-exactness-required
workloads on unclustered data.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .append import round_up
from .topk import (
    _BUCKET_ROWS,
    _NEG,
    _raw_to_score,
    _rescore_fits,
    _rescore_selected_pallas,
    topk_program_exact2,
)

__all__ = ["IVFState", "ivf_build", "ivf_topk", "ivf_topk_program"]

# Phase-1 bound vs phase-2 rescore skew: centroids/radii are f32 reductions
# of the store rows upcast to f32 (exact for bf16/f32 stores); the rescore
# computes the same f32 dots. Only accumulation-order noise remains. The
# comparison happens in the public (cos+1)/2 score space (monotone map).
_CERT_EPS_IVF = 1e-5
_BOUND_DEAD = -3.0e4  # bound for buckets with no live rows

# Chunk sizes for the build matmuls (rows per step).
_TRAIN_CHUNK = 8192
_ASSIGN_CHUNK = 65536
# Cluster-axis window: XLA falls off a tiling cliff past ~16k output lanes
# (lloyd at 19.5k clusters measured ~30x slower than at 9.8k on v5e).
_CLUSTER_AXIS_CHUNK = 16384


class IVFState(NamedTuple):
    """Built IVF index over a snapshot of the store.

    ``emb_r`` holds the inlier rows REORDERED by cluster (padding zeroed at
    the tail); ``perm[i]`` is the original ordinal of reordered position i
    (-1 padding). ``out_emb``/``out_perm`` are the exiled outlier rows,
    scanned exactly at query time. ``bound = q·centroid + radius`` upper-
    bounds every inlier row score in its bucket.
    """

    emb_r: jax.Array  # [n_in_pad, d_pad] store dtype, cluster-ordered
    perm: jax.Array  # [n_in_pad] i32 original ordinals (-1 = padding)
    centroids: jax.Array  # [nb, d_pad] f32 bucket means
    radius: jax.Array  # [nb] f32 max residual norm (dead buckets: sentinel)
    bucket_fill: jax.Array  # [nb] i32 live rows per bucket (dead rows are
    # always the bucket TAIL: cluster regions pack from their start)
    count_in: jax.Array  # scalar i32 live inlier rows
    out_emb: jax.Array  # [m_pad, d_pad] store dtype outlier rows
    out_perm: jax.Array  # [m_pad] i32 original ordinals (-1 = padding)
    count_out: jax.Array  # scalar i32 live outlier rows

    @property
    def n_buckets(self) -> int:
        return self.centroids.shape[0]


def _chunked_assign(emb, centroids, chunk: int):
    """(argmax cluster, best score) per row in chunks — never materializes
    the [n, k] score matrix (31 GB at 1M × 7813) nor a full f32 copy of a
    bf16 store (15 GB at 10M × 384): casts happen per chunk inside the
    map body."""
    n = emb.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    padded = jnp.pad(emb, ((0, pad), (0, 0)))
    blocks = padded.reshape(n_chunks, chunk, -1)

    k = centroids.shape[0]

    def one(block):
        # bf16 operands: the f32 dot runs ~30x slower at 10M x 19.5k
        # centroids (74s -> 2.5s measured on v5e). Assignment is a
        # partitioning heuristic — soundness (radii, certificates) comes
        # from the exact f32 bucket summaries computed AFTER the reorder,
        # so bf16 score noise only shifts marginal cluster fits/exiles.
        # The cluster axis splits at _CLUSTER_AXIS_CHUNK: XLA falls off a
        # tiling cliff past ~16k output lanes (lloyd at 19.5k clusters
        # measured ~30x slower than at 9.8k).
        qb = block.astype(jnp.bfloat16)
        best_i = None
        best_v = None
        for c0 in range(0, k, _CLUSTER_AXIS_CHUNK):
            cc = jax.lax.slice(
                centroids, (c0, 0),
                (min(c0 + _CLUSTER_AXIS_CHUNK, k), centroids.shape[1]),
            ).astype(jnp.bfloat16)
            scores = jax.lax.dot_general(
                qb, cc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            v = jnp.max(scores, axis=1)
            i = jnp.argmax(scores, axis=1).astype(jnp.int32) + c0
            if best_v is None:
                best_i, best_v = i, v
            else:
                take = v > best_v
                best_i = jnp.where(take, i, best_i)
                best_v = jnp.where(take, v, best_v)
        return best_i, best_v

    a, s = jax.lax.map(one, blocks)
    return a.reshape(-1)[:n], s.reshape(-1)[:n]


def _chunked_cluster_sums(train, assign, k: int, chunk: int):
    """Per-cluster sums + counts via chunked one-hot matmuls (a
    data-dependent scatter-add lowers to a serial loop on TPU)."""
    n, d = train.shape
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    tr = jnp.pad(train, ((0, pad), (0, 0))).reshape(n_chunks, chunk, d)
    # Padding rows get cluster id k (one_hot drops them).
    asn = jnp.pad(assign, (0, pad), constant_values=k).reshape(n_chunks, chunk)

    def one(carry, xs):
        sums, counts = carry
        block, a = xs
        bb = block.astype(jnp.bfloat16)
        # bf16 one-hot: values 0/1 are exact; both reductions accumulate
        # f32. Halves the transient (at 10M rows the cluster count is ~78k
        # and a [chunk, k] f32 one-hot would be ~2.4 GB). The cluster axis
        # splits at _CLUSTER_AXIS_CHUNK (same tiling cliff as the
        # assignment dot); one_hot(a - c0) zeroes out-of-window labels, so
        # each window's dot only accumulates its own clusters.
        for c0 in range(0, k, _CLUSTER_AXIS_CHUNK):
            kk = min(_CLUSTER_AXIS_CHUNK, k - c0)
            oh = jax.nn.one_hot(a - c0, kk, dtype=jnp.bfloat16)  # [chunk, kk]
            part = jax.lax.dot_general(
                oh, bb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sums = jax.lax.dynamic_update_slice(
                sums,
                jax.lax.dynamic_slice(sums, (c0, 0), (kk, sums.shape[1]))
                + part,
                (c0, 0),
            )
            counts = jax.lax.dynamic_update_slice(
                counts,
                jax.lax.dynamic_slice(counts, (c0,), (kk,))
                + jnp.sum(oh, axis=0, dtype=jnp.float32),
                (c0,),
            )
        return (sums, counts), None

    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32))
    (sums, counts), _ = jax.lax.scan(one, init, (tr, asn))
    return sums, counts


@functools.partial(jax.jit, static_argnames=("train_rows", "iters", "nb"))
def _train_centroids(emb, count, key, *, train_rows: int, iters: int, nb: int):
    # Gather first, cast the (small) gathered blocks — casting the whole
    # store to f32 would materialize 15 GB at 10M x 384.
    idx = jax.random.randint(
        key, (train_rows,), 0, jnp.maximum(count, 1), jnp.int32
    )
    train = jnp.take(emb, idx, axis=0).astype(jnp.float32)
    init_idx = jax.random.randint(
        jax.random.fold_in(key, 1), (nb,), 0, jnp.maximum(count, 1), jnp.int32
    )
    centroids = jnp.take(emb, init_idx, axis=0).astype(jnp.float32)

    def lloyd(c, _):
        a, _s = _chunked_assign(train, c, _TRAIN_CHUNK)
        sums, counts = _chunked_cluster_sums(train, a, nb, _TRAIN_CHUNK)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        c2 = jnp.where(counts[:, None] > 0, means, c)  # keep empty clusters
        norm = jnp.linalg.norm(c2, axis=1, keepdims=True)
        return jnp.where(norm > 1e-9, c2 / norm, c2), None

    centroids, _ = jax.lax.scan(lloyd, centroids, None, length=iters)
    return centroids


@jax.jit
def _assign_all(emb, centroids):
    return _chunked_assign(emb, centroids, _ASSIGN_CHUNK)


@jax.jit
def _gather_rows(emb, perm):
    """Gather rows by (possibly -1-padded) permutation; padding rows zero."""
    valid = perm >= 0
    rows = jnp.take(emb, jnp.clip(perm, 0, emb.shape[0] - 1), axis=0)
    return jnp.where(valid[:, None], rows, jnp.zeros_like(rows))


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_chunk(dest, rows, start):
    """In-place (donated) row-range write — the append-path pattern."""
    return jax.lax.dynamic_update_slice(dest, rows, (start, 0))


def _gather_rows_chunked(emb, perm, chunk_rows: int = 131_072):
    """Reorder gather with O(chunk) extra HBM: gather each perm chunk, then
    scatter it into a donated destination buffer. Peak residency is
    store + destination + one chunk (~15.3 GB at 10M x 384 bf16) instead
    of 2x store for the single-shot gather — and none of the ~15 GB
    host round trip the via_host path pays through the tunnel (~30 MB/s
    fetch measured; via_host at 10M is minutes, this is seconds)."""
    n_out = perm.shape[0]
    dest = jnp.zeros((n_out, emb.shape[1]), emb.dtype)
    for start in range(0, n_out, chunk_rows):
        stop = min(start + chunk_rows, n_out)
        rows = _gather_rows(emb, jax.lax.slice(perm, (start,), (stop,)))
        dest = _scatter_chunk(dest, rows, jnp.asarray(start, jnp.int32))
    return dest


@jax.jit
def _bucket_summary_block(block, valid):
    """Per-bucket (centroid, radius, fill) for one [cb, 128, d] block."""
    rows = block.astype(jnp.float32)
    w = valid.astype(jnp.float32)
    counts_b = w.sum(axis=1)
    cent = (rows * w[:, :, None]).sum(axis=1) / jnp.maximum(counts_b, 1.0)[
        :, None
    ]
    resid = jnp.linalg.norm(rows - cent[:, None, :], axis=2)
    radius = jnp.max(jnp.where(valid, resid, -jnp.inf), axis=1)
    radius = jnp.where(counts_b > 0, radius, _BOUND_DEAD)
    return cent, radius, counts_b.astype(jnp.int32)


def _bucket_summaries(emb_r, perm, *, nb: int):
    """Per-bucket (centroid, radius, fill) in bucket chunks — a whole-array
    f32 cast would materialize a second full-size copy (9 GB at 6M x 384)
    and OOM next to the store. Chunking is a host loop of fixed-shape
    slices: the single-program pad + [steps, cb, 128, d] reshape of the
    whole store crashed the remote TPU compiler at the 10M shape (83k
    buckets), and slices keep the peak transient at one ~100 MB block."""
    d_pad = emb_r.shape[1]
    chunk_b = 512  # buckets/step: 512*128*d f32 = ~100 MB at d=384
    valid_full = perm >= 0
    # Preallocate + donated in-place writes: a final concatenate of the
    # per-block pieces spikes peak HBM by the full table size — enough to
    # RESOURCE_EXHAUST the 10M build, which already runs within ~2% of
    # usable HBM (store + reordered copy both resident).
    cent = jnp.zeros((nb, d_pad), jnp.float32)
    radius = jnp.full((nb,), _BOUND_DEAD, jnp.float32)
    fill = jnp.zeros((nb,), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _write1(dst, blk, b0):
        return jax.lax.dynamic_update_slice(dst, blk, (b0,))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _write2(dst, blk, b0):
        return jax.lax.dynamic_update_slice(dst, blk, (b0, 0))

    for b0 in range(0, nb, chunk_b):
        cb = min(chunk_b, nb - b0)
        r0 = b0 * _BUCKET_ROWS
        block = jax.lax.slice(
            emb_r, (r0, 0), (r0 + cb * _BUCKET_ROWS, d_pad)
        ).reshape(cb, _BUCKET_ROWS, d_pad)
        valid = jax.lax.slice(
            valid_full, (r0,), (r0 + cb * _BUCKET_ROWS,)
        ).reshape(cb, _BUCKET_ROWS)
        c, r, f = _bucket_summary_block(block, valid)
        start = jnp.asarray(b0, jnp.int32)
        cent = _write2(cent, c, start)
        radius = _write1(radius, r, start)
        fill = _write1(fill, f, start)
    return cent, radius, fill


# Keep build peak memory (store + reordered copy) under this fraction of a
# 16 GB HBM part for the single-shot gather (its take/where transients
# roughly double the output); between the two budgets the chunked
# scatter-into-donated-dest path runs; past _DEVICE_CHUNKED_BUDGET the
# reorder round-trips through host RAM (slow through a tunnel — last
# resort only).
_DEVICE_GATHER_BUDGET = 12 * 1024**3
# Measured on v5e (2026-08-19): a 7.68 + 8.65 GB pair plus a 131k-row
# gather chunk allocates and runs (usable HBM >= 16.4e9 bytes); the 10M
# probe's 16.33e9 pair is in-budget. 15.45/16 is the measured usable
# fraction; on parts with different HBM the budget scales from the
# device's reported limit (advisor round-4: the constant alone would
# RESOURCE_EXHAUST smaller parts instead of falling back via_host).
_DEVICE_CHUNKED_BUDGET = int(15.45 * 1024**3)


def _device_chunked_budget() -> int:
    try:
        import jax as _jax

        stats = _jax.local_devices()[0].memory_stats()
        limit = int(stats["bytes_limit"])  # type: ignore[index]
        return int(limit * (15.45 / 16.0))
    except Exception:  # noqa: BLE001 — CPU/interpret backends lack stats
        return _DEVICE_CHUNKED_BUDGET


def ivf_build(
    emb: jax.Array,
    count: jax.Array | int,
    *,
    key: int = 0,
    train_rows: int = 131072,
    iters: int = 8,
    outlier_frac: float = 0.1,
    rows_per_cluster: int = 512,
    via_host: bool | None = None,
) -> IVFState:
    """Build an IVF index over the live rows of a (padded) store buffer.

    Host-orchestrated: k-means training, assignment, gathers and bucket
    summaries run as device programs; the ordering/exile bookkeeping is
    plain numpy over two [count] vectors. One-time cost ~30-70 s at
    1M × 384 on one v5e (assignment matmul dominates).

    Every cluster's region is padded to a 128-row boundary so no bucket
    straddles two clusters — straddle buckets mix unrelated content and
    their radius balloons to ~sqrt(2), poisoning both selection and the
    certificate (measured). Cost: ≤64 dead rows per cluster, ~12% at the
    default 512-row cluster target (dead rows carry perm = -1 and are
    masked everywhere).

    ``via_host``: route the reorder gathers through host RAM instead of
    holding store + reordered copy on device simultaneously (auto when the
    pair would exceed ~12 GB — the 10M × 384 bf16 case).
    """
    import os
    import sys
    import time as _time

    _dbg = bool(os.environ.get("TAT_IVF_DEBUG"))
    _t0 = _time.perf_counter()

    def _phase(msg):
        nonlocal _t0
        if _dbg:
            print(
                f"[ivf_build] {msg}: {_time.perf_counter() - _t0:.1f}s",
                file=sys.stderr,
                flush=True,
            )
        _t0 = _time.perf_counter()

    n_pad, d_pad = emb.shape
    if n_pad % _BUCKET_ROWS:
        raise ValueError(f"store padding must be a multiple of {_BUCKET_ROWS}")
    count = int(count)
    if not 0 < count <= n_pad:
        raise ValueError(f"count {count} out of range for buffer {n_pad}")
    nb_clusters = max(n_pad // rows_per_cluster, 1)
    # Lloyd needs enough sample mass per cluster: 8/cluster (the 10M x
    # 19.5k-cluster floor before this bump) starves the fit — mixed
    # clusters, bucket radius p95 0.74 vs 0.37, recall saturating ~0.95.
    train_rows = min(max(train_rows, 16 * nb_clusters), n_pad, count)
    centroids = _train_centroids(
        emb,
        jnp.asarray(count, jnp.int32),
        jax.random.PRNGKey(key),
        train_rows=train_rows,
        iters=iters,
        nb=nb_clusters,
    )
    np.asarray(centroids[:1, :1])
    _phase(f"k-means train ({train_rows} rows, {nb_clusters} clusters)")
    assign, best_s = _assign_all(emb, centroids)
    np.asarray(assign[:8])
    _phase("assign compute")
    # Fetch ONCE, downcast on device first: separate full-width fetches of
    # the two 10M-row vectors measured ~80 s through the tunnel attach.
    # Labels fit int16 below 32k clusters; fit scores are used only to
    # ORDER the outlier exile, so f16 rounding just exchanges marginal
    # exiles.
    label_dtype = jnp.int16 if nb_clusters < 32768 else jnp.int32
    a, s = jax.device_get(
        (assign.astype(label_dtype), best_s.astype(jnp.float16))
    )
    a = a[:count].astype(np.int64)
    s = s[:count]
    # Free the device-side assignment vectors before the reorder gather —
    # the 10M bf16 case runs within ~2% of usable HBM.
    assign.delete()
    best_s.delete()
    _phase("assign fetch (downcast, single device_get)")

    m = int(count * outlier_frac)
    order_by_fit = np.argsort(s, kind="stable")  # worst fit first
    out_ids = np.sort(order_by_fit[:m]).astype(np.int32)
    in_mask = np.ones(count, dtype=bool)
    in_mask[out_ids] = False
    in_ids = np.nonzero(in_mask)[0].astype(np.int32)
    # Cluster-major order (stable: preserves insertion order in-cluster).
    in_ids = in_ids[np.argsort(a[in_ids], kind="stable")]
    a_sorted = a[in_ids]

    # 128-aligned cluster regions: cluster c's rows land at
    # [aligned_off[c], aligned_off[c] + size[c]); the rest of its region is
    # dead (-1) padding.
    sizes = np.bincount(a_sorted, minlength=nb_clusters).astype(np.int64)
    padded = ((sizes + _BUCKET_ROWS - 1) // _BUCKET_ROWS) * _BUCKET_ROWS
    aligned_off = np.concatenate([[0], np.cumsum(padded)[:-1]])
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pos_in_cluster = np.arange(len(in_ids), dtype=np.int64) - starts[a_sorted]
    dest = aligned_off[a_sorted] + pos_in_cluster

    n_in = len(in_ids)
    n_in_pad = round_up(max(int(padded.sum()), 1), 1024)
    m_pad = round_up(max(m, 1), 1024)
    perm = np.full(n_in_pad, -1, np.int32)
    perm[dest] = in_ids
    out_perm = np.full(m_pad, -1, np.int32)
    out_perm[:m] = out_ids

    _phase("host cluster bookkeeping")
    perm_d = jnp.asarray(perm)
    out_perm_d = jnp.asarray(out_perm)
    itemsize = jnp.zeros((), emb.dtype).itemsize
    pair_bytes = (n_pad + n_in_pad + m_pad) * d_pad * itemsize
    if via_host is None:
        # Chunked device gather handles the 10M bf16 case (store + reorder
        # both resident, ~14.9 GB); via_host only when even that can't fit.
        via_host = pair_bytes > _device_chunked_budget()
    if via_host:
        host = np.asarray(emb)
        _phase(f"via_host: store fetch ({emb.nbytes / 1e9:.1f} GB)")
        emb_r_host = np.where(
            (perm >= 0)[:, None], host[np.clip(perm, 0, n_pad - 1)], 0
        ).astype(host.dtype)
        out_host = np.where(
            (out_perm >= 0)[:, None],
            host[np.clip(out_perm, 0, n_pad - 1)],
            0,
        ).astype(host.dtype)
        del host
        _phase("via_host: host gather")
        emb_r = jnp.asarray(emb_r_host)
        del emb_r_host
        out_emb = jnp.asarray(out_host)
        del out_host
        jax.block_until_ready(emb_r)
        _phase(f"via_host: upload ({emb_r.nbytes / 1e9:.1f} GB)")
    else:
        if pair_bytes > _DEVICE_GATHER_BUDGET:
            # Single-shot gather transients would push peak past HBM;
            # chunked scatter-into-donated-dest keeps extra HBM O(chunk).
            emb_r = _gather_rows_chunked(emb, perm_d)
        else:
            emb_r = _gather_rows(emb, perm_d)
        out_emb = _gather_rows(emb, out_perm_d)
        jax.block_until_ready(emb_r)
        _phase("device gather")
    cent, radius, fill = _bucket_summaries(
        emb_r, perm_d, nb=n_in_pad // _BUCKET_ROWS
    )
    jax.block_until_ready(cent)
    _phase("bucket summaries")
    return IVFState(
        emb_r,
        perm_d,
        cent,
        radius,
        fill,
        jnp.asarray(n_in, jnp.int32),
        out_emb,
        out_perm_d,
        jnp.asarray(m, jnp.int32),
    )


def _ivf_topk_impl(
    emb_r, perm, centroids, radius, bucket_fill, count_in, out_emb, out_perm,
    count_out, queries, *, k: int, B: int, use_pallas: bool,
):
    b = queries.shape[0]
    qs = queries.astype(jnp.float32)
    qc = jax.lax.dot_general(
        qs, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [b, nb]
    dead = radius <= _BOUND_DEAD
    # Selection is by raw centroid score (maximizes recall — selecting by
    # the BOUND qc + r lets a handful of large-radius buckets hijack every
    # query's budget; measured recall 0.23 vs 0.96 at 1M). The bound is
    # used only for the certificate, computed over the excluded set.
    sel_key = jnp.where(dead[None, :], 2.0 * _BOUND_DEAD, qc)
    bounds = jnp.where(dead[None, :], 2.0 * _BOUND_DEAD, qc + radius[None, :])
    nb = centroids.shape[0]
    if B < nb:
        if nb > 4096:
            # Wide bucket tables: lax.top_k over [b, nb] costs ~15 ms at
            # nb≈49k; the hardware PartialReduce is ~free. An approx
            # selection can miss a true top-B bucket — recall impact is
            # bounded by the recall_target, and the ties/count guard below
            # DETECTS any miss (a skipped bucket then scores ≥ the weakest
            # selected, count > B) and refuses certification, so the
            # certificate stays sound.
            top_qc, sel = jax.lax.approx_max_k(
                sel_key, B, recall_target=0.99
            )
        else:
            top_qc, sel = jax.lax.top_k(sel_key, B)
        q_bth = top_qc[:, B - 1:B]  # [b, 1] weakest SELECTED bucket
        # Sound excluded-bound max: buckets STRICTLY below the weakest
        # selected score are certainly excluded. Boundary ties (or buckets
        # an approx selection skipped) are ambiguous — the count guard
        # refuses to certify those queries instead of under-counting an
        # excluded bucket's bound.
        excl_raw = jnp.max(
            jnp.where(sel_key < q_bth, bounds, 2.0 * _BOUND_DEAD), axis=1
        )
        ties_ok = jnp.sum(sel_key >= q_bth, axis=1) == B
    else:
        sel = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[None, :], (b, nb))
        excl_raw = jnp.full((b,), 2.0 * _BOUND_DEAD, jnp.float32)
        ties_ok = jnp.ones((b,), bool)
        B = nb

    sel = jnp.clip(sel, 0, nb - 1)
    row_ids = (
        sel[:, :, None] * _BUCKET_ROWS
        + jnp.arange(_BUCKET_ROWS, dtype=jnp.int32)[None, None, :]
    ).reshape(b, B * _BUCKET_ROWS)
    if use_pallas and _rescore_fits(emb_r.shape[1], emb_r.dtype.itemsize, B):
        raw = _rescore_selected_pallas(emb_r, queries, sel, B=B)
    else:
        cand = jnp.take(emb_r, row_ids, axis=0)
        raw = jax.lax.dot_general(
            queries.astype(emb_r.dtype),
            cand,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    # Dead rows (cluster-alignment padding) always sit at a bucket's TAIL,
    # so validity is a tiny [b, B] fill-count gather + lane compare — NOT a
    # [b, B*128] perm gather (TPU gathers are element-serial; that version
    # measured +0.27 ms per selected bucket).
    fill_sel = jnp.take(bucket_fill, sel, axis=0)  # [b, B]
    lane = jnp.arange(_BUCKET_ROWS, dtype=jnp.int32)[None, None, :]
    valid = (lane < fill_sel[:, :, None]).reshape(b, B * _BUCKET_ROWS)
    raw = jnp.where(valid, raw, -3.0)
    k_in = min(k, B * _BUCKET_ROWS)
    vals_r, pos = jax.lax.top_k(raw, k_in)
    idx_r = jnp.take_along_axis(row_ids, pos, axis=1)
    sv1, si1 = _raw_to_score(vals_r, idx_r)
    si1 = jnp.where(
        si1 >= 0, jnp.take(perm, jnp.clip(si1, 0, perm.shape[0] - 1)), -1
    )

    # Exact tail: scan of the exiled outlier rows, mapped + merged. Two-phase
    # (bucket maxima at the matmul floor + (k+slack)-bucket rescore) — the
    # one-phase running-merge kernel measured ~2.0 ms for the 300k-row tail
    # at 10M (only ~115 GB/s; per-tile merge overhead dominates small scans)
    # vs ~1.0 ms two-phase. The tail's bucket table is tiny (~2.3k lanes at
    # 10M) so exact2's lax.top_k selection is cheap, unlike at full-store nb.
    # Its certificate ANDs into ours: a tail tie-miss (eps-scale only — both
    # phases compute identical dots) refuses certification, never silently
    # degrades a certified result.
    k_out = min(k, out_emb.shape[0])
    sv2, si2, cert_tail = topk_program_exact2(
        out_emb, queries, count_out, k_out, use_pallas=use_pallas
    )
    si2 = jnp.where(
        si2 >= 0, jnp.take(out_perm, jnp.clip(si2, 0, out_perm.shape[0] - 1)), -1
    )

    sv = jnp.concatenate([sv1, sv2], axis=1)
    si = jnp.concatenate([si1, si2], axis=1)
    vals, pos = jax.lax.top_k(sv, k)
    idx = jnp.take_along_axis(si, pos, axis=1)

    # Certificate in the public score space (monotone map, clip is sound:
    # a bound below -1 can't beat anything; above +1 the cert just fails).
    excl_score = jnp.clip((excl_raw + 1.0) * 0.5, 0.0, 1.0)
    kth = jnp.where(vals[:, k - 1] > _NEG, vals[:, k - 1], -1.0)
    cert = cert_tail & ties_ok & (excl_score <= kth + _CERT_EPS_IVF * 0.5)
    return vals, idx, cert


_ivf_topk_jit = jax.jit(
    _ivf_topk_impl, static_argnames=("k", "B", "use_pallas")
)


def ivf_topk_program(
    emb_r: jax.Array,
    perm: jax.Array,
    centroids: jax.Array,
    radius: jax.Array,
    bucket_fill: jax.Array,
    count_in: jax.Array,
    out_emb: jax.Array,
    out_perm: jax.Array,
    count_out: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    B: int = 16,
    use_pallas: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Jit-composable IVF top-k (state unpacked so callers can lax.map it).

    Returns ``(scores [b,k], ordinals [b,k], cert [b])`` — scores in the
    public (cos+1)/2 space, ordinals ORIGINAL row ids, cert True where the
    result is provably the exact top-k (up to eps ties).
    """
    nb = centroids.shape[0]
    # _ivf_topk_jit, not the raw impl: standalone callers (VectorStore's
    # ivf route) would otherwise run the whole program EAGERLY — hundreds
    # of op-by-op dispatches, ~1.7 s/batch through the tunnel vs ~30 ms
    # jitted (measured; an outer jit hid this from the bench, which wraps
    # its calls in one). Inside an outer jit the inner jit just inlines.
    return _ivf_topk_jit(
        emb_r, perm, centroids, radius, bucket_fill, count_in, out_emb,
        out_perm, count_out, queries,
        k=k, B=min(B, nb), use_pallas=use_pallas,
    )


def ivf_topk(
    state: IVFState,
    queries: jax.Array | np.ndarray,
    k: int,
    *,
    B: int = 16,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k over a built IVF index (host entry point)."""
    from .topk import _use_pallas

    if use_pallas is None:
        use_pallas = _use_pallas() and state.emb_r.dtype != jnp.float64
    queries = jnp.asarray(queries)
    if queries.ndim == 1:
        vals, idx, cert = ivf_topk(
            state, queries[None, :], k, B=B, use_pallas=use_pallas
        )
        return vals[0], idx[0], cert[0]
    return _ivf_topk_jit(
        *state, queries, k=k, B=min(B, state.n_buckets),
        use_pallas=use_pallas,
    )
