"""Device IVF: learned 128-row buckets + certified selective rescore.

Every full-scan engine in ops/topk.py sits on this attach's measured
roofline (docs/performance.md): ~317 GB/s streaming, ~70 TFLOP/s effective
MXU — and a native int8 MXU probe (tools/tpu_int8_floor_probe.py) moved the
floor only ~10%. Reading fewer rows is the only remaining lever, and on
*clustered* corpora (what real text-embedding data looks like — isotropic
random data is the information-theoretic worst case where no sublinear
method can reach recall 0.99; see NOTES.md round-4) a coarse quantizer
prunes almost everything.

Design — "exact2 with learned buckets":

* Build: k-means (device Lloyd iterations on a training sample, chunked
  one-hot matmuls instead of data-dependent scatters) assigns every live
  row to one of ~n/128 clusters; rows are reordered by cluster so each
  128-row bucket is semantically coherent. Per bucket: a float32 centroid
  ``c`` and radius ``r = max ||x - c||``.
* Query phase 1: ``bound = q·c + r`` per bucket — by Cauchy-Schwarz an
  upper bound on any row score in the bucket. FLOPs: b × nb × d, ~128×
  fewer than the full scan; bytes: the [nb, d] centroid table (~6 MB at
  1M × 384) instead of the 768 MB store.
* Query phase 2: the exact2 machinery rescoring the top-B buckets
  (ops/topk.py `_exact2_phase2_rescore`: scalar-prefetch Pallas DMA of
  the selected buckets, exact top-k, certificate).
* Certificate: sound for ANY data — ``B-th selected bound ≤ k-th rescored
  score + eps`` implies every excluded bucket's bound (≤ the B-th selected
  bound) admits no better row. On clustered data it holds for most
  queries; on adversarial data it reports false rather than returning
  silently-approximate results. See docs/spec/exact2.md for the shared
  certificate semantics.

Replaces (behaviorally): the reference's brute-force
`VectorBase.fuzzy_lookup_embedding` (reference aitools/vectorbase.py:163-201)
at large scale; falls back to the full-scan engines when uncertified
exactness is required on unclustered data.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .topk import _BUCKET_ROWS, _exact2_phase2_rescore

__all__ = ["IVFState", "ivf_build", "ivf_topk", "ivf_topk_program"]

# Phase-1 bound vs phase-2 rescore skew: centroids/radii are f32 reductions
# of the store rows upcast to f32 (exact for bf16/f32 stores); the rescore
# computes the same f32 dots. Only accumulation-order noise remains.
_CERT_EPS_IVF = 1e-5
_BOUND_DEAD = -3.0e4  # bound for buckets with no live rows

# Training-sample and assignment chunk sizes (rows per chunked matmul step).
_TRAIN_CHUNK = 8192
_ASSIGN_CHUNK = 65536


class IVFState(NamedTuple):
    """Built IVF index over a snapshot of the store.

    ``emb_r`` holds the store rows REORDERED by cluster (live rows first,
    padding at the tail); ``perm[i]`` is the original row ordinal of
    reordered position i (-1 for padding). ``centroids``/``radius`` are
    per-128-row-bucket summaries; ``bound = q·centroid + radius`` upper-
    bounds every row score in the bucket.
    """

    emb_r: jax.Array  # [n_pad, d_pad] store dtype, cluster-ordered
    perm: jax.Array  # [n_pad] i32 original ordinals (-1 = padding)
    centroids: jax.Array  # [nb, d_pad] f32 bucket means
    radius: jax.Array  # [nb] f32 max residual norm (dead buckets: -inf-ish)
    count: jax.Array  # scalar i32 live rows

    @property
    def n_buckets(self) -> int:
        return self.centroids.shape[0]


def _chunked_argmax_assign(emb_f32, centroids, chunk: int):
    """argmax_k (emb @ centroids.T) in row chunks — never materializes the
    [n, k] score matrix (31 GB at 1M × 7813)."""
    n = emb_f32.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    padded = jnp.pad(emb_f32, ((0, pad), (0, 0)))
    blocks = padded.reshape(n_chunks, chunk, -1)

    def one(block):
        scores = jax.lax.dot_general(
            block,
            centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    return jax.lax.map(one, blocks).reshape(-1)[:n]


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
        oh = jax.nn.one_hot(a, k, dtype=jnp.float32)  # [chunk, k]
        sums = sums + jax.lax.dot_general(
            oh, block, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + oh.sum(axis=0)
        return (sums, counts), None

    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32))
    (sums, counts), _ = jax.lax.scan(one, init, (tr, asn))
    return sums, counts


@functools.partial(
    jax.jit, static_argnames=("train_rows", "iters", "nb")
)
def _ivf_build_impl(emb, count, key, *, train_rows: int, iters: int, nb: int):
    n_pad, d_pad = emb.shape
    emb_f = emb.astype(jnp.float32)
    live = jnp.arange(n_pad, dtype=jnp.int32) < count

    # --- train k-means on a sample of live rows --------------------------
    t = min(train_rows, n_pad)
    idx = jax.random.randint(key, (t,), 0, jnp.maximum(count, 1), jnp.int32)
    train = jnp.take(emb_f, idx, axis=0)
    init_idx = jax.random.randint(
        jax.random.fold_in(key, 1), (nb,), 0, jnp.maximum(count, 1), jnp.int32
    )
    centroids = jnp.take(emb_f, init_idx, axis=0)

    def lloyd(c, _):
        a = _chunked_argmax_assign(train, c, _TRAIN_CHUNK)
        sums, counts = _chunked_cluster_sums(train, a, nb, _TRAIN_CHUNK)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous centroid.
        c2 = jnp.where(counts[:, None] > 0, means, c)
        # Cosine k-means: normalize the mean directions.
        norm = jnp.linalg.norm(c2, axis=1, keepdims=True)
        return jnp.where(norm > 1e-9, c2 / norm, c2), None

    centroids, _ = jax.lax.scan(lloyd, centroids, None, length=iters)

    # --- assign every live row, order by cluster ------------------------
    assign = _chunked_argmax_assign(emb_f, centroids, _ASSIGN_CHUNK)
    sort_key = jnp.where(live, assign, jnp.int32(2**30))
    order = jnp.argsort(sort_key, stable=True).astype(jnp.int32)
    emb_r = jnp.take(emb, order, axis=0)
    perm = jnp.where(jnp.take(live, order), order, -1)

    # --- per-128-row-bucket summaries ------------------------------------
    rows = emb_r.astype(jnp.float32).reshape(nb, _BUCKET_ROWS, d_pad)
    valid = (perm >= 0).reshape(nb, _BUCKET_ROWS)
    w = valid.astype(jnp.float32)
    counts_b = w.sum(axis=1)
    cent = (rows * w[:, :, None]).sum(axis=1) / jnp.maximum(counts_b, 1.0)[
        :, None
    ]
    resid = jnp.linalg.norm(rows - cent[:, None, :], axis=2)
    radius = jnp.max(jnp.where(valid, resid, -jnp.inf), axis=1)
    radius = jnp.where(counts_b > 0, radius, _BOUND_DEAD)
    return emb_r, perm, cent, radius


def ivf_build(
    emb: jax.Array,
    count,
    *,
    key: int = 0,
    train_rows: int = 131072,
    iters: int = 8,
) -> IVFState:
    """Build an IVF index over the live rows of a (padded) store buffer.

    One-time device cost ~O(iters · train_rows · nb · d + n · nb · d)
    matmul FLOPs (~1-2 s at 1M × 384 on one v5e). Buckets are 128 rows to
    match the exact2 rescore kernel's block shape.
    """
    n_pad = emb.shape[0]
    if n_pad % _BUCKET_ROWS:
        raise ValueError(f"store padding must be a multiple of {_BUCKET_ROWS}")
    nb = n_pad // _BUCKET_ROWS
    count = jnp.asarray(count, jnp.int32).reshape(())
    emb_r, perm, cent, radius = _ivf_build_impl(
        emb,
        count,
        jax.random.PRNGKey(key),
        train_rows=min(train_rows, n_pad),
        iters=iters,
        nb=nb,
    )
    return IVFState(emb_r, perm, cent, radius, count)


def _ivf_topk_impl(
    emb_r, perm, centroids, radius, count, queries, *, k: int, B: int,
    use_pallas: bool, use_radius: bool,
):
    qs = queries.astype(jnp.float32)
    qc = jax.lax.dot_general(
        qs, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [b, nb]
    dead = radius <= _BOUND_DEAD
    if use_radius:
        bounds = qc + radius[None, :]
    else:
        bounds = qc  # approx mode: tighter selection, no sound certificate
    bounds = jnp.where(dead[None, :], _BOUND_DEAD * 2.0, bounds)
    vals, idx_r, cert = _exact2_phase2_rescore(
        emb_r, queries, count, bounds, k=k, B=B, use_pallas=use_pallas,
        eps=_CERT_EPS_IVF,
    )
    # Map reordered positions back to original ordinals.
    safe = jnp.clip(idx_r, 0, perm.shape[0] - 1)
    idx = jnp.where(idx_r >= 0, jnp.take(perm, safe), -1)
    if not use_radius:
        cert = jnp.zeros_like(cert)  # centroid scores are not upper bounds
    return vals, idx, cert


_ivf_topk_jit = jax.jit(
    _ivf_topk_impl, static_argnames=("k", "B", "use_pallas", "use_radius")
)


def ivf_topk_program(
    emb_r, perm, centroids, radius, count, queries, k: int, *,
    B: int = 16, use_pallas: bool = True, use_radius: bool = True,
):
    """Jit-composable IVF top-k (state unpacked so callers can lax.map it).

    Returns ``(scores [b,k], ordinals [b,k], cert [b])`` — scores in the
    public (cos+1)/2 space, ordinals ORIGINAL row ids, cert True where the
    result is provably the exact top-k (up to eps ties).
    """
    nb = centroids.shape[0]
    return _ivf_topk_impl(
        emb_r, perm, centroids, radius, count, queries,
        k=k, B=min(B, nb), use_pallas=use_pallas, use_radius=use_radius,
    )


def ivf_topk(
    state: IVFState,
    queries,
    k: int,
    *,
    B: int = 16,
    use_pallas: bool | None = None,
    use_radius: bool = True,
):
    """Top-k over a built IVF index (host entry point)."""
    from .topk import _use_pallas

    if use_pallas is None:
        use_pallas = _use_pallas() and state.emb_r.dtype != jnp.float64
    queries = jnp.asarray(queries)
    if queries.ndim == 1:
        vals, idx, cert = ivf_topk(
            state, queries[None, :], k, B=B, use_pallas=use_pallas,
            use_radius=use_radius,
        )
        return vals[0], idx[0], cert[0]
    nb = state.n_buckets
    return _ivf_topk_jit(
        state.emb_r, state.perm, state.centroids, state.radius, state.count,
        queries, k=k, B=min(B, nb), use_pallas=use_pallas,
        use_radius=use_radius,
    )
