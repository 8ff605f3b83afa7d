"""Sharded device IVF: per-shard learned buckets + all-gather winner merge.

Each shard builds an INDEPENDENT IVF index (ops/ivf.py: k-means buckets,
exact outlier tail, per-query exactness certificate) over its OWN rows —
build compute (training, assignment matmuls, reorder gathers) runs entirely
on the owning device with zero cross-shard traffic. The fragment axis is
the long axis (SURVEY.md §2.11, BASELINE.json config #5: 1M+ fragments
sharded with distributed top-k); keeping the build local is what makes the
IVF advantage scale linearly with shards.

A query is ONE SPMD program (shard_map over the store's (dp, shard) mesh):

  1. per-shard IVF search over the local index: phase-1 centroid bounds,
     exact rescore of the top-B local buckets, exact scan of the local
     outlier tail (Pallas on TPU, XLA elsewhere);
  2. local→global ordinal shift + the same tiny all_gather winner merge as
     the exact sharded path (k is small: the collective moves S*k pairs);
  3. certificate all_gather + AND.

Certificate soundness across the merge: the merged k-th score is >= every
shard's local k-th score (the union's k best dominate any one shard's k
best elementwise). Shard s certifies that every bucket IT excluded has
bound <= local-kth + eps <= merged-kth + eps; the shards' excluded sets
cover all excluded buckets, and every tail was scanned exactly, so
AND(certs) certifies the merged result globally.

Rows appended after the snapshot are found via an exact interval scan of
the suffix (the single-chip policy, ``vectorstore.VectorStore._topk_ivf``),
merged in score space on the host — the suffix is exact, so certificates
stay sound.
"""

from __future__ import annotations

import functools
from typing import TYPE_CHECKING, Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.5 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..ops.ivf import _BOUND_DEAD, IVFState, ivf_build, ivf_topk_program
from ..ops.topk import _BUCKET_ROWS
from .mesh import AXIS_DP, AXIS_SHARD

if TYPE_CHECKING:
    from .sharded import ShardedVectorStore

__all__ = ["ShardedIVF", "build_sharded_ivf"]


class ShardedIVF(NamedTuple):
    """Per-shard IVF indexes assembled into globally-sharded arrays.

    Every array's leading axis is sharded over ``shard`` (block layout:
    shard s's slice holds s's LOCAL index); ``perm``/``out_perm`` hold
    LOCAL row ordinals — the query program adds ``s * local_n``.
    ``local_n`` is the store's rows-per-shard AT BUILD TIME (later buffer
    growth redistributes shard ownership but never moves global ordinals,
    so the build-time offset stays correct). ``built_count`` is the store
    watermark the snapshot covers.
    """

    emb_r: jax.Array  # [S*n_in_pad, d_pad] cluster-ordered local rows
    perm: jax.Array  # [S*n_in_pad] i32 LOCAL ordinals (-1 padding)
    centroids: jax.Array  # [S*nb, d_pad] f32
    radius: jax.Array  # [S*nb] f32 (_BOUND_DEAD = dead bucket)
    bucket_fill: jax.Array  # [S*nb] i32
    count_in: jax.Array  # [S] i32 live inliers per shard
    out_emb: jax.Array  # [S*m_pad, d_pad] outlier rows
    out_perm: jax.Array  # [S*m_pad] i32 LOCAL ordinals (-1 padding)
    count_out: jax.Array  # [S] i32 live outliers per shard
    local_n: int  # store rows-per-shard at build time (ordinal offset unit)
    built_count: int  # store count covered by this snapshot

    @property
    def device_arrays(self) -> tuple[jax.Array, ...]:
        return self[:9]


def _shard_blocks(buf: jax.Array, n_shard: int):
    """One committed single-device block per shard (dp replicas deduped),
    ordered by global row offset."""
    by_start: dict[int, jax.Array] = {}
    for sh in buf.addressable_shards:
        start = sh.index[0].start or 0
        if start not in by_start:
            by_start[start] = sh.data
    starts = sorted(by_start)
    assert len(starts) == n_shard, (len(starts), n_shard)
    return [by_start[s] for s in starts]


def _device_of(arr: jax.Array):
    return next(iter(arr.devices()))


def _pad_state(st: IVFState, n_in_pad: int, m_pad: int) -> IVFState:
    """Pad one shard's state to the fleet-wide common shapes (added buckets
    are dead: radius sentinel, zero fill, -1 perms)."""
    nb = n_in_pad // _BUCKET_ROWS
    d_in = n_in_pad - st.emb_r.shape[0]
    d_nb = nb - st.centroids.shape[0]
    d_m = m_pad - st.out_emb.shape[0]
    if d_in == 0 and d_m == 0 and d_nb == 0:
        return st
    return IVFState(
        jnp.pad(st.emb_r, ((0, d_in), (0, 0))),
        jnp.pad(st.perm, (0, d_in), constant_values=-1),
        jnp.pad(st.centroids, ((0, d_nb), (0, 0))),
        jnp.pad(st.radius, (0, d_nb), constant_values=_BOUND_DEAD),
        jnp.pad(st.bucket_fill, (0, d_nb)),
        st.count_in,
        jnp.pad(st.out_emb, ((0, d_m), (0, 0))),
        jnp.pad(st.out_perm, (0, d_m), constant_values=-1),
        st.count_out,
    )


def _empty_state(n_in_pad: int, m_pad: int, d_pad: int, dtype) -> IVFState:
    """A dead index for a shard with no live rows (uniform SPMD shapes)."""
    nb = n_in_pad // _BUCKET_ROWS
    zero = jnp.asarray(0, jnp.int32)
    return IVFState(
        jnp.zeros((n_in_pad, d_pad), dtype),
        jnp.full((n_in_pad,), -1, jnp.int32),
        jnp.zeros((nb, d_pad), jnp.float32),
        jnp.full((nb,), _BOUND_DEAD, jnp.float32),
        jnp.zeros((nb,), jnp.int32),
        zero,
        jnp.zeros((m_pad, d_pad), dtype),
        jnp.full((m_pad,), -1, jnp.int32),
        zero,
    )


def _assemble(mesh: Mesh, pieces, row_spec) -> jax.Array:
    """Stack per-shard pieces into one globally-sharded array. Pieces stay
    on their build device; dp replicas are device-to-device copies (ICI on
    real meshes)."""
    sharding = NamedSharding(mesh, row_spec)
    bufs = []
    grid = mesh.devices  # [n_dp, n_shard]
    for i_dp in range(grid.shape[0]):
        for s in range(grid.shape[1]):
            dev = grid[i_dp, s]
            p = pieces[s]
            bufs.append(p if _device_of(p) == dev else jax.device_put(p, dev))
    gshape = (len(pieces) * pieces[0].shape[0],) + tuple(pieces[0].shape[1:])
    return jax.make_array_from_single_device_arrays(gshape, sharding, bufs)


def build_sharded_ivf(store: ShardedVectorStore, **build_kwargs: Any) -> ShardedIVF:
    """Build per-shard IVF indexes over a ShardedVectorStore's live rows.

    ``build_kwargs`` forward to :func:`ops.ivf.ivf_build` (outlier_frac,
    rows_per_cluster, train_rows, iters, key...). Shards with no live rows
    get a dead index (their certificate contribution is forced True by the
    query program). Raises on an empty or quantized store.
    """
    store._flush()
    if store.count == 0:
        raise ValueError("build_sharded_ivf: store is empty")
    if store._quantized:
        raise ValueError("sharded IVF supports float32/bfloat16 stores only")
    mesh = store.mesh
    n_shard = store.n_shard
    cap = store.buf.shape[0]
    local_n = cap // n_shard
    blocks = _shard_blocks(store.buf, n_shard)
    d_pad = store.buf.shape[1]

    states: list[IVFState | None] = []
    for s, block in enumerate(blocks):
        c_local = min(max(store.count - s * local_n, 0), local_n)
        if c_local == 0:
            states.append(None)
            continue
        # Uncommitted intermediates (perm uploads, zeros) must land on the
        # owning device so the whole build stays shard-local.
        with jax.default_device(_device_of(block)):
            states.append(ivf_build(block, c_local, **build_kwargs))

    live = [st for st in states if st is not None]
    n_in_pad = max(st.emb_r.shape[0] for st in live)
    m_pad = max(st.out_emb.shape[0] for st in live)
    dtype = live[0].emb_r.dtype
    padded: list[IVFState] = []
    for s, st in enumerate(states):
        with jax.default_device(_device_of(blocks[s])):
            padded.append(
                _pad_state(st, n_in_pad, m_pad)
                if st is not None
                else _empty_state(n_in_pad, m_pad, d_pad, dtype)
            )

    row = P(AXIS_SHARD, None)
    vec = P(AXIS_SHARD)
    return ShardedIVF(
        _assemble(mesh, [st.emb_r for st in padded], row),
        _assemble(mesh, [st.perm for st in padded], vec),
        _assemble(mesh, [st.centroids for st in padded], row),
        _assemble(mesh, [st.radius for st in padded], vec),
        _assemble(mesh, [st.bucket_fill for st in padded], vec),
        _assemble(mesh, [st.count_in.reshape(1) for st in padded], vec),
        _assemble(mesh, [st.out_emb for st in padded], row),
        _assemble(mesh, [st.out_perm for st in padded], vec),
        _assemble(mesh, [st.count_out.reshape(1) for st in padded], vec),
        local_n,
        store.count,
    )


@functools.lru_cache(maxsize=32)
def _sharded_ivf_topk_cached(
    mesh: Mesh, k: int, B: int, use_pallas: bool, local_n: int
):
    from .sharded import _merge_shard_winners

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=(
            P(AXIS_SHARD, None),  # emb_r
            P(AXIS_SHARD),  # perm
            P(AXIS_SHARD, None),  # centroids
            P(AXIS_SHARD),  # radius
            P(AXIS_SHARD),  # bucket_fill
            P(AXIS_SHARD),  # count_in
            P(AXIS_SHARD, None),  # out_emb
            P(AXIS_SHARD),  # out_perm
            P(AXIS_SHARD),  # count_out
            P(AXIS_DP, None),  # queries
            P(),  # min_score
        ),
        out_specs=(P(AXIS_DP, None), P(AXIS_DP, None), P(AXIS_DP)),
        check_vma=False,  # outputs replicate over 'shard' via all_gather
    )
    def _search(
        emb_r, perm, cent, radius, fill, cin, oemb, operm, cout, q, min_score
    ):
        nb = cent.shape[0]
        vals, idx, cert = ivf_topk_program(
            emb_r, perm, cent, radius, fill, cin[0], oemb, operm, cout[0], q,
            k, B=min(B, nb), use_pallas=use_pallas,
        )
        shard = jax.lax.axis_index(AXIS_SHARD)
        idx = jnp.where(idx >= 0, idx + shard * local_n, -1)
        # A shard with no live rows contributes nothing — its (vacuous)
        # certificate must not veto the fleet's.
        cert = cert | ((cin[0] + cout[0]) == 0)
        mvals, midx = _merge_shard_winners(vals, idx, k, min_score)
        cert_all = jnp.all(
            jax.lax.all_gather(cert, AXIS_SHARD, axis=0), axis=0
        )
        return mvals, midx, cert_all

    return jax.jit(_search)


def sharded_ivf_search_dispatch(
    store: ShardedVectorStore,
    ivf: ShardedIVF,
    q_padded: np.ndarray,
    k: int,
    min_score: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Dispatch the SPMD per-shard IVF search (async; pair with a collect).

    ``q_padded`` is the store's padded query batch. Returns device arrays
    (vals, idx, cert) — ordinals are GLOBAL.
    """
    from .sharded import _query_sharding, _replicated

    use_pallas = store.mesh.devices.flat[0].platform == "tpu"
    fn = _sharded_ivf_topk_cached(
        store.mesh, k, store.ivf_b, use_pallas, ivf.local_n
    )
    return fn(
        *ivf.device_arrays,
        jax.device_put(q_padded, _query_sharding(store.mesh)),
        jax.device_put(
            jnp.asarray([min_score], jnp.float32), _replicated(store.mesh)
        ),
    )
