"""Device posting-list engine: CSR term postings + fused score accumulation.

SURVEY.md §7: secondary structured indexes become device-side CSR posting
lists (term-id -> offsets + semref ids + scores) so a compiled query fuses
term matching -> scope masking -> score accumulation -> top-k in one XLA
program, replacing the host VM's per-term dict loops
(reference `knowpro/query.py:174-206,446-489`).

Accumulation semantics mirror ``MatchAccumulator`` (`collections.py:73-106,
222-245`): exact terms add score*weight and bump hit counts; related terms
accumulate separately and only count for semrefs with no exact match
(``add_term_matches_if_new``); the total folds related in via
``log(hits+1) * avg`` smoothing.

Layout: the CSR arrays live in padded device buffers (capacity doubling).
The program processes query terms in fixed posting windows (bucketed by the
longest posting list among the queried terms) so shapes stay static.
"""

from __future__ import annotations

import functools
from typing import TYPE_CHECKING, Any

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from jax.sharding import Mesh

from ..native import create_interner
from .append import round_up

__all__ = [
    "DevicePostingsIndex",
    "accumulate_postings",
    "accumulate_postings_segmented",
]

_WINDOW_BUCKETS = (64, 256, 1024, 4096, 16384)
_TERM_BUCKETS = (8, 32, 128, 512)
_SEG_BUCKETS = (4, 16, 64, 256)
# Max active semrefs per segment on the compact transfer path
# (conversations with semref_cap > 2x this use it; overflow falls back to
# the dense transfer). The actual fetch is sliced to the observed max
# count, bucketed by _COMPACT_FETCH_BUCKETS.
_COMPACT_CAP = 8192
# Conversations with semref capacity above this use the sparse COO route
# (transfer = active runs only). Below it the dense [n_seg, cap] transfer
# is small enough to win. Measured on a tunnel-attached v5e at 10k
# semrefs (cap 16384): dense 21.0 ms/query vs sparse 6.0 — the dense
# download (4 x seg_pad x cap f32) dominates well before the old
# 2*_COMPACT_CAP gate engaged.
_SPARSE_MIN_CAP = 2048
_COMPACT_FETCH_BUCKETS = (256, 1024, 4096, 8192)
# COO result-size buckets for the sort+scan sparse kernel (total active
# (segment, semref) runs per device call).
_COO_BUCKETS = (4096, 16384, 65536, 262144)
# COO entry-count buckets (total postings across the call's ops — ragged
# flattening makes this the sort size; the dense kernels' window bucketing
# would pay t_pad x the LONGEST posting list instead).
_COO_E_BUCKETS = (4096, 16384, 65536, 262144, 1048576, 4194304)

# Op kinds for the segmented accumulator.
OP_EXACT = 0
OP_RELATED = 1
OP_BOOST = 2  # membership-only scatter for the entity-boost mask

_BIG_POS = np.int32(2**30)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return round_up(max(n, 1), buckets[-1])


@functools.partial(jax.jit, static_argnames=("window", "semref_cap"))
def accumulate_postings(
    offsets: jax.Array,  # [terms_cap+1] i64 CSR offsets
    post_semrefs: jax.Array,  # [post_cap] i32
    post_scores: jax.Array,  # [post_cap] f32
    tids: jax.Array,  # [t_pad] i32 query term ids (-1 = padding)
    weights: jax.Array,  # [t_pad] f32 per-term weight
    exact: jax.Array,  # [t_pad] bool exact vs related
    scope_mask: jax.Array,  # [semref_cap] bool (True = in scope)
    *,
    window: int,
    semref_cap: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One fused pass: gather each query term's postings (fixed window),
    scatter-add exact/related score+hit tallies, fold with log smoothing.

    Returns (total_score[semref_cap], exact_hits, related_hits) — semrefs
    with zero hits have score 0.
    """
    t_pad = tids.shape[0]
    safe_tids = jnp.clip(tids, 0, offsets.shape[0] - 2)
    starts = offsets[safe_tids]  # [t_pad]
    sizes = offsets[safe_tids + 1] - starts
    term_valid = tids >= 0

    # [t_pad, window] posting positions, masked past each term's size.
    lane = jnp.arange(window, dtype=jnp.int32)[None, :]
    pos = starts[:, None] + lane
    valid = (lane < sizes[:, None]) & term_valid[:, None]
    pos = jnp.clip(pos, 0, post_semrefs.shape[0] - 1)

    semref_ids = post_semrefs[pos]  # [t_pad, window]
    scores = post_scores[pos] * weights[:, None]
    valid = valid & scope_mask[semref_ids]

    flat_ids = jnp.where(valid, semref_ids, semref_cap)  # OOB rows drop
    flat_scores = jnp.where(valid, scores, 0.0)
    ones = valid.astype(jnp.float32)
    is_exact = exact[:, None]

    zeros = jnp.zeros(semref_cap, jnp.float32)
    exact_score = zeros.at[flat_ids].add(
        jnp.where(is_exact, flat_scores, 0.0), mode="drop"
    )
    exact_hits = zeros.at[flat_ids].add(
        jnp.where(is_exact, ones, 0.0), mode="drop"
    )
    related_score = zeros.at[flat_ids].add(
        jnp.where(is_exact, 0.0, flat_scores), mode="drop"
    )
    related_hits = zeros.at[flat_ids].add(
        jnp.where(is_exact, 0.0, ones), mode="drop"
    )

    # Related-only matches keep hit_count 0 but still score; related
    # contributions to exact-matched semrefs are dropped
    # (add_term_matches_if_new semantics).
    has_exact = exact_hits > 0
    related_score = jnp.where(has_exact, 0.0, related_score)
    related_hits_eff = jnp.where(has_exact, 0.0, related_hits)
    smooth = jnp.where(
        related_hits_eff > 1,
        jnp.log(related_hits_eff + 1.0)
        * related_score
        / jnp.maximum(related_hits_eff, 1.0),
        related_score,
    )
    total = exact_score + smooth
    return total, exact_hits, related_hits_eff


@functools.partial(
    jax.jit, static_argnames=("window", "semref_cap", "n_seg", "dedup_related")
)
def accumulate_postings_segmented(*args: Any, **kwargs: Any) -> tuple[jax.Array, jax.Array, jax.Array]:
    return _accumulate_segmented_impl(*args, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("window", "semref_cap", "n_seg", "dedup_related", "cap"),
)
def accumulate_postings_segmented_compact(
    *args: Any, cap: int, **kwargs: Any
) -> jax.Array:
    """Segmented accumulation + on-device sparse compaction.

    The dense [n_seg, semref_cap] result arrays are huge but mostly zero
    (a query touches a few hundred semrefs of potentially 100k+); through
    a network-tunneled device the dense device->host transfer dominates
    the whole query. Compact on device instead: per segment, scatter each
    active column to its cumsum rank (ascending ordinal order preserved)
    and return [n_seg, cap] blocks + their column indices + true counts.
    The host scatters back to dense (cheap, local); counts > cap signal an
    overflow and the caller falls back to the dense variant (lossless
    guard).
    """
    exact_score, exact_hits, related_score, related_hits, op_hit = (
        _accumulate_segmented_impl(*args, **kwargs)
    )
    active = (exact_hits > 0) | (related_hits > 0)
    counts = active.sum(axis=1).astype(jnp.int32)
    # Compact via exclusive-cumsum positions + scatter (O(n); a stable
    # argsort over [n_seg, semref_cap] measured as the dominant device cost
    # at 100k semrefs). Ascending ordinal order is preserved by cumsum.
    n_seg_rows, width = active.shape
    pos = jnp.cumsum(active, axis=1).astype(jnp.int32) - 1
    dest = jnp.where(active & (pos < cap), pos, cap)
    rows = jnp.broadcast_to(
        jnp.arange(n_seg_rows, dtype=jnp.int32)[:, None], active.shape
    )
    cols = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.int32)[None, :], active.shape
    )
    order = (
        jnp.zeros((n_seg_rows, cap), jnp.int32)
        .at[rows, dest]
        .add(cols, mode="drop")
    )

    def gather(a):
        return (
            jnp.zeros((n_seg_rows, cap), a.dtype).at[rows, dest].add(a, mode="drop")
        )

    # One stacked block -> one device->host transfer (each fetched leaf
    # pays a full round trip on tunneled devices).
    packed = jnp.stack(
        [
            gather(exact_score),
            gather(exact_hits),
            gather(related_score),
            gather(related_hits),
        ],
        axis=0,
    )
    return packed, op_hit, order, counts


def _segmented_scan_sum(values, first):
    """Per-run prefix sums over sorted runs (first marks run starts).

    Associative segmented-sum: runs are short, so f32 partials stay exact-ish
    (a GLOBAL cumsum would accumulate ~1e6 and destroy per-run precision).
    """
    def combine(a, b):
        v1, f1 = a
        v2, f2 = b
        return jnp.where(f2, v2, v1 + v2), f1 | f2

    out, _ = jax.lax.associative_scan(combine, (values, first))
    return out


def _segmented_fill_first(values, first):
    """Broadcast each run's FIRST value over the run (sorted runs)."""
    def combine(a, b):
        v1, f1 = a
        v2, f2 = b
        return jnp.where(f2, v2, v1), f1 | f2

    out, _ = jax.lax.associative_scan(combine, (values, first))
    return out


# Composite sort granularity: key * _POS_P + position. Positions are op
# indices (< t_pad <= 512 after bucketing); boost entries carry _POS_P - 1 so
# they sort after every scoring entry of their run.
_POS_P = 8192


@functools.partial(
    jax.jit,
    static_argnames=("e_pad", "semref_cap", "n_seg", "dedup_related", "r_max"),
)
def accumulate_postings_segmented_coo(
    offsets: jax.Array,
    post_semrefs: jax.Array,
    post_scores: jax.Array,
    tids: jax.Array,
    weights: jax.Array,
    segs: jax.Array,
    kinds: jax.Array,
    positions: jax.Array,
    ktype_gate: jax.Array,
    scope_ids: jax.Array,
    scope_masks: jax.Array,
    semref_ktype: jax.Array,
    boost_factor: jax.Array,
    *,
    e_pad: int,
    semref_cap: int,
    n_seg: int,
    dedup_related: bool = False,
    r_max: int = 4096,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Scatter-free segmented accumulation: sort + segmented scans.

    XLA lowers data-dependent scatter-adds to a serial loop on TPU — the
    dense kernel measured ~1 s/call at 100k semrefs. This formulation is
    TPU-shaped: flatten the ops' posting lists RAGGED (entry j maps to its
    op via a searchsorted over cumulative sizes, so the entry count is the
    TOTAL postings queried — not t_pad x the longest list; a single hot
    term no longer inflates every op's window), ONE sort by (segment,
    semref, op-position), then per-run segmented scans implement every
    MatchAccumulator rule:

      * run = all entries of one (leaf segment, semref);
      * first-adder: the run's min op position is its first sorted entry;
        a related op contributes iff its position IS that minimum
        (``add_term_matches_if_new``);
      * dedup_related: duplicate (op, semref) posting entries sort adjacent
        — only the first counts;
      * boost membership: boost entries sort to the run tail; a reversed
        segmented scan broadcasts "run has boost" back over the run, and
        scoring contributions multiply by ``boost_factor``;
      * a second sort compacts run totals (emitted at run ends) to the
        front in ascending (segment, semref) order.

    Returns (keys [r_max] i32 = seg * (semref_cap+1) + semref (ascending;
    padding = 2^30), sums [4, r_max] f32, n_runs scalar i32, op_hit [t_pad]).
    """
    t_pad = tids.shape[0]
    safe_tids = jnp.clip(tids, 0, offsets.shape[0] - 2)
    starts = offsets[safe_tids].astype(jnp.int32)
    term_valid = tids >= 0
    sizes = jnp.where(
        term_valid, (offsets[safe_tids + 1] - offsets[safe_tids]), 0
    ).astype(jnp.int32)
    cum = jnp.cumsum(sizes)  # [t_pad]
    total = cum[-1]

    # Ragged flattening: entry j belongs to the op whose cumulative-size
    # span contains j. searchsorted over [t_pad] is log-cost per entry.
    j = jnp.arange(e_pad, dtype=jnp.int32)
    op_idx = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    safe_op = jnp.clip(op_idx, 0, t_pad - 1)
    prev = jnp.where(safe_op > 0, cum[safe_op - 1], 0)
    within = j - prev
    valid = j < total

    pos_idx = jnp.clip(starts[safe_op] + within, 0, post_semrefs.shape[0] - 1)
    ids = post_semrefs[pos_idx]  # [e_pad]
    base_scores = post_scores[pos_idx] * weights[safe_op]

    gate = ktype_gate.astype(jnp.int8)[safe_op]
    gate_ok = (gate < 0) | (semref_ktype[ids] == gate)
    op_kind = kinds[safe_op]
    scoring = op_kind <= OP_RELATED
    scope_ok = scope_masks[scope_ids[safe_op], ids]
    valid_scoring = valid & scoring & gate_ok & scope_ok
    valid_boost = valid & (op_kind == OP_BOOST)
    # Per-op any(valid_scoring): op entries are contiguous in j, so the op
    # slice reduces via cumsum differences at the boundaries (no scatter).
    vs_cum = jnp.cumsum(valid_scoring.astype(jnp.int32))
    hi = jnp.clip(cum - 1, 0, e_pad - 1)
    at_hi = jnp.where(cum > 0, vs_cum[hi], 0)
    lo_cum = jnp.concatenate([jnp.zeros((1,), jnp.int32), at_hi[:-1]])
    op_hit = (at_hi - lo_cum) > 0

    live = valid_scoring | valid_boost
    seg_e = segs[safe_op]
    # Two-key sort (segment-major key, op position): stays in int32 —
    # lookup_ops_sparse guards n_seg * (semref_cap + 1) < 2^30 before
    # dispatching here, and x64 is off on TPU so a composite 64-bit key
    # would silently overflow.
    key = seg_e.astype(jnp.int32) * jnp.int32(semref_cap + 1) + ids
    dead_key = jnp.int32(2**30)
    key_flat = jnp.where(live, key, dead_key)
    pos_flat = jnp.where(
        valid_scoring,
        jnp.minimum(positions[safe_op], _POS_P - 2),
        _POS_P - 1,  # boost entries: after all scoring entries of the run
    ).astype(jnp.int32)

    score_flat = jnp.where(valid_scoring, base_scores, 0.0)
    is_exact = valid_scoring & (op_kind == OP_EXACT)
    is_rel = valid_scoring & (op_kind == OP_RELATED)
    is_boost = valid_boost

    key_s, pos_s, score_s, exact_s, rel_s, boost_s = jax.lax.sort(
        (key_flat, pos_flat, score_flat, is_exact, is_rel, is_boost),
        num_keys=2,
    )

    e = key_s.shape[0]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    )
    last = jnp.concatenate([key_s[1:] != key_s[:-1], jnp.ones((1,), bool)])

    # First-adder: the run's first sorted entry has the min op position.
    run_min_pos = _segmented_fill_first(pos_s, first)
    winner = rel_s & (pos_s == run_min_pos)
    if dedup_related:
        dup_first = first | jnp.concatenate(
            [jnp.ones((1,), bool), pos_s[1:] != pos_s[:-1]]
        )
        winner = winner & dup_first

    # Boost membership: reversed segmented scan broadcasts the run's boost
    # count (runs reversed: `last` becomes the start flag).
    boost_cum_rev = _segmented_scan_sum(
        boost_s[::-1].astype(jnp.float32), last[::-1]
    )[::-1]
    mult = jnp.where(boost_cum_rev > 0, boost_factor, 1.0)
    score_eff = score_s * mult

    sums = [
        _segmented_scan_sum(jnp.where(exact_s, score_eff, 0.0), first),
        _segmented_scan_sum(exact_s.astype(jnp.float32), first),
        _segmented_scan_sum(jnp.where(winner, score_eff, 0.0), first),
        _segmented_scan_sum(winner.astype(jnp.float32), first),
    ]
    scoring_count = _segmented_scan_sum(
        (exact_s | rel_s).astype(jnp.float32), first
    )
    live_s = key_s < dead_key
    valid_end = last & live_s & (scoring_count > 0)

    # Compaction sort: valid run totals to the front, ascending (seg, id).
    key2 = jnp.where(valid_end, key_s, dead_key)
    key2_s, k_out, es_out, eh_out, rs_out, rh_out = jax.lax.sort(
        (key2, key_s, *sums), num_keys=1
    )
    n_runs = valid_end.sum().astype(jnp.int32)
    r = min(r_max, e)
    sums_out = jnp.stack(
        [es_out[:r], eh_out[:r], rs_out[:r], rh_out[:r]], axis=0
    )
    return k_out[:r], sums_out, n_runs, op_hit


# DP-sharded COO dispatch: one op group per data-parallel mesh rank, CSR
# postings REPLICATED (they are small next to the embedding plane), op
# arrays stacked on a leading axis sharded over the mesh's dp axis. The
# COO program vmaps cleanly — sorts and segmented scans run over the
# trailing axis — so SPMD partitioning is a pure leading-axis split with
# no cross-rank collectives.
_COO_DP_CACHE: dict = {}


def accumulate_postings_segmented_coo_dp(
    mesh: Mesh,
    offsets: jax.Array,
    post_semrefs: jax.Array,
    post_scores: jax.Array,
    tids: jax.Array,  # [n_dp, t_pad]
    weights: jax.Array,
    segs: jax.Array,
    kinds: jax.Array,
    positions: jax.Array,
    ktype_gate: jax.Array,
    scope_ids: jax.Array,
    scope_masks: jax.Array,  # [n_scopes, semref_cap] shared
    semref_ktype: jax.Array,
    boost_factor: jax.Array,
    *,
    e_pad: int,
    semref_cap: int,
    n_seg: int,
    dedup_related: bool,
    r_max: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched :func:`accumulate_postings_segmented_coo` over mesh dp ranks.

    Returns stacked (keys [n_dp, r], sums [n_dp, 4, r], n_runs [n_dp],
    op_hit [n_dp, t_pad]); each rank's keys use its LOCAL segment ids.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    statics = (e_pad, semref_cap, n_seg, dedup_related, r_max)
    cache_key = (mesh, statics)
    fn = _COO_DP_CACHE.get(cache_key)
    if fn is None:
        dp_axis = mesh.axis_names[0]
        rep = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P(dp_axis))
        inner = functools.partial(
            accumulate_postings_segmented_coo.__wrapped__,
            e_pad=e_pad,
            semref_cap=semref_cap,
            n_seg=n_seg,
            dedup_related=dedup_related,
            r_max=r_max,
        )
        batched = jax.vmap(
            inner,
            in_axes=(
                None, None, None,  # CSR: offsets / semrefs / scores
                0, 0, 0, 0, 0, 0, 0,  # per-rank op arrays
                None, None, None,  # scope masks / ktype / boost
            ),
        )
        fn = jax.jit(
            batched,
            in_shardings=(
                rep, rep, rep,
                dp, dp, dp, dp, dp, dp, dp,
                rep, rep, rep,
            ),
        )
        _COO_DP_CACHE[cache_key] = fn
    return fn(
        offsets, post_semrefs, post_scores,
        tids, weights, segs, kinds, positions, ktype_gate, scope_ids,
        scope_masks, semref_ktype, boost_factor,
    )


def _accumulate_segmented_impl(
    offsets: jax.Array,  # [terms_cap+1] i64 CSR offsets
    post_semrefs: jax.Array,  # [post_cap] i32
    post_scores: jax.Array,  # [post_cap] f32
    tids: jax.Array,  # [t_pad] i32 query term ids (-1 = padding)
    weights: jax.Array,  # [t_pad] f32 per-op weight
    segs: jax.Array,  # [t_pad] i32 leaf segment per op
    kinds: jax.Array,  # [t_pad] i8: 0 exact, 1 related, 2 boost-membership
    positions: jax.Array,  # [t_pad] i32 op position within its leaf (VM order)
    ktype_gate: jax.Array,  # [t_pad] i8: -1 none, else required knowledge type
    scope_ids: jax.Array,  # [t_pad] i32 row into scope_masks per op
    scope_masks: jax.Array,  # [n_scopes, semref_cap] bool (True = in scope)
    semref_ktype: jax.Array,  # [semref_cap] i8
    boost_factor: jax.Array,  # scalar f32 entity-boost multiplier
    *,
    window: int,
    semref_cap: int,
    n_seg: int,
    dedup_related: bool = False,
):
    """Per-leaf-segment raw accumulation replicating the host VM's
    per-sub-expression ``MatchAccumulator`` bookkeeping in one fused pass:

      * exact ops always scatter-add (score*weight, +1 hit) into their leaf;
      * related ops follow ``add_term_matches_if_new``: a related op
        contributes to a semref only if NO earlier op of the same leaf (in VM
        order) added that semref — computed via a scatter-min of op
        positions;
      * boost ops build a per-leaf membership mask (entity name/type
        postings); scoring contributions of that leaf multiply by
        ``boost_factor`` where the mask is set (the x10 entity boost,
        reference search.py boost_entities);
      * per-op knowledge-type gates replicate the tag/topic-restricted
        lookups; the scope mask replicates range filtering.

    Returns (exact_score, exact_hits, related_score, related_hits) each
    [n_seg, semref_cap], plus op_hit[t_pad] (op had >= 1 in-scope posting).
    """
    safe_tids = jnp.clip(tids, 0, offsets.shape[0] - 2)
    starts = offsets[safe_tids]
    sizes = offsets[safe_tids + 1] - starts
    term_valid = tids >= 0

    lane = jnp.arange(window, dtype=jnp.int32)[None, :]
    pos_idx = jnp.clip(starts[:, None] + lane, 0, post_semrefs.shape[0] - 1)
    valid = (lane < sizes[:, None]) & term_valid[:, None]

    ids = post_semrefs[pos_idx]  # [t_pad, window]
    base_scores = post_scores[pos_idx] * weights[:, None]
    seg2d = jnp.broadcast_to(segs[:, None], ids.shape)

    gate = ktype_gate.astype(jnp.int8)
    gate_ok = (gate[:, None] < 0) | (semref_ktype[ids] == gate[:, None])
    scoring = kinds[:, None] <= OP_RELATED
    # Per-op scope row: lets one fused call serve MANY queries, each with
    # its own scope mask.
    scope_ok = scope_masks[scope_ids[:, None], ids]
    valid_scoring = valid & scoring & gate_ok & scope_ok

    # Boost membership (no scope/ktype gates: the VM booster inspects the
    # semref's knowledge, not a scoped lookup).
    valid_boost = valid & (kinds[:, None] == OP_BOOST)
    boost_ids = jnp.where(valid_boost, ids, semref_cap)
    boost = (
        jnp.zeros((n_seg, semref_cap), jnp.int8)
        .at[seg2d, boost_ids]
        .max(valid_boost.astype(jnp.int8), mode="drop")
    )
    mult = jnp.where(boost[seg2d, ids] > 0, boost_factor, 1.0)
    scores = base_scores * mult

    is_exact = valid_scoring & (kinds[:, None] == OP_EXACT)
    is_related = valid_scoring & (kinds[:, None] == OP_RELATED)

    if dedup_related:
        # A related lookup counts each semref at most once even when the
        # posting list contains duplicates (the VM's if_new sees the semref
        # already added after the first occurrence; exact lookups DO
        # double-count, matching add_term_matches). Keep only the first
        # in-list occurrence per (op, semref): stable-sort the window by
        # semref id, flag first occurrences, un-permute.
        sort_keys = jnp.where(is_related, ids, jnp.int32(2**31 - 1))
        order = jnp.argsort(sort_keys, axis=1, stable=True)
        sorted_keys = jnp.take_along_axis(sort_keys, order, axis=1)
        first_sorted = jnp.concatenate(
            [
                jnp.ones_like(sorted_keys[:, :1], dtype=bool),
                sorted_keys[:, 1:] != sorted_keys[:, :-1],
            ],
            axis=1,
        )
        inverse = jnp.argsort(order, axis=1, stable=True)
        is_related = is_related & jnp.take_along_axis(first_sorted, inverse, axis=1)

    zeros2 = jnp.zeros((n_seg, semref_cap), jnp.float32)
    ex_ids = jnp.where(is_exact, ids, semref_cap)
    exact_score = zeros2.at[seg2d, ex_ids].add(
        jnp.where(is_exact, scores, 0.0), mode="drop"
    )
    exact_hits = zeros2.at[seg2d, ex_ids].add(
        is_exact.astype(jnp.float32), mode="drop"
    )

    # First adder per (leaf, semref): the earliest valid scoring op. A
    # related op contributes only when it IS the first adder.
    any_ids = jnp.where(valid_scoring, ids, semref_cap)
    pos_grid = jnp.where(valid_scoring, positions[:, None], _BIG_POS)
    first = (
        jnp.full((n_seg, semref_cap), _BIG_POS, jnp.int32)
        .at[seg2d, any_ids]
        .min(pos_grid, mode="drop")
    )
    winner = is_related & (positions[:, None] == first[seg2d, ids])
    rel_ids = jnp.where(winner, ids, semref_cap)
    related_score = zeros2.at[seg2d, rel_ids].add(
        jnp.where(winner, scores, 0.0), mode="drop"
    )
    related_hits = zeros2.at[seg2d, rel_ids].add(
        winner.astype(jnp.float32), mode="drop"
    )

    op_hit = valid_scoring.any(axis=1)
    return exact_score, exact_hits, related_score, related_hits, op_hit


class DevicePostingsIndex:
    """Term -> scored semref postings with a device-compiled accumulator.

    Host side interns terms (C++ interner when available) and accumulates
    postings; ``build()`` lays them out as CSR and uploads. ``lookup_terms``
    runs the fused accumulation for a batch of (term, weight, exact) triples.
    """

    def __init__(self):
        self._interner = create_interner()
        self._built = False
        self._offsets = None
        self._semrefs = None
        self._scores = None
        self._semref_cap = 0
        self._n_semrefs = 0
        self._max_postings = 0
        self._offsets_host: np.ndarray | None = None
        self._semrefs_host: np.ndarray | None = None
        self._term_has_dups: np.ndarray = np.zeros(0, dtype=bool)
        # Device-side caches: the semref-ktype vector and the all-True scope
        # mask are identical across calls — re-uploading them costs a
        # transfer per query on tunneled devices.
        self._ktype_cache: tuple[np.ndarray, jax.Array] | None = None
        self._true_mask_cache: dict[int, jax.Array] = {}
        # Adaptive compact-fetch size: start small, remember the largest
        # active-column count seen so the common case needs ONE device->host
        # fetch (counts + packed block together) instead of two round trips.
        self._fetch_hint = _COMPACT_FETCH_BUCKETS[0]
        # Adaptive COO result size for the sort+scan sparse kernel.
        self._coo_hint = _COO_BUCKETS[0]
        # Observability: SPMD dp dispatches actually taken (dryrun stage 5
        # and tests assert the mesh path engaged rather than a fallback).
        self.dp_calls = 0

    def add_term(self, term: str, semref_id: int, score: float = 1.0) -> None:
        tid = self._interner.intern(term)
        self._interner.add_posting(tid, semref_id, score)
        self._n_semrefs = max(self._n_semrefs, semref_id + 1)
        self._built = False

    def add_terms_batch(
        self, terms: list[tuple[str, int]] | list[tuple[str, int, float]]
    ) -> None:
        for entry in terms:
            if len(entry) == 2:
                self.add_term(entry[0], entry[1])
            else:
                self.add_term(entry[0], entry[1], entry[2])

    def __len__(self) -> int:
        return len(self._interner)

    @property
    def posting_count(self) -> int:
        return self._interner.posting_count()

    def build(self) -> None:
        """(Re)upload CSR arrays to the device."""
        offsets, semrefs, scores = self._interner.build_csr()
        n_terms = len(offsets) - 1
        terms_cap = round_up(max(n_terms, 1), 128)
        post_cap = round_up(max(len(semrefs), 1), 1024)
        off_padded = np.full(terms_cap + 1, offsets[-1], dtype=np.int64)
        off_padded[: n_terms + 1] = offsets
        sem_padded = np.zeros(post_cap, dtype=np.int32)
        sem_padded[: len(semrefs)] = semrefs
        score_padded = np.zeros(post_cap, dtype=np.float32)
        score_padded[: len(scores)] = scores
        self._offsets = jnp.asarray(off_padded)
        self._semrefs = jnp.asarray(sem_padded)
        self._scores = jnp.asarray(score_padded)
        self._semref_cap = round_up(max(self._n_semrefs, 1), 1024)
        sizes = np.diff(offsets)
        self._max_postings = int(sizes.max()) if len(sizes) else 0
        self._offsets_host = off_padded
        self._semrefs_host = sem_padded
        # Terms whose posting list repeats a semref (e.g. an entity whose
        # name equals one of its types): related lookups must dedup these.
        self._term_has_dups = np.zeros(n_terms, dtype=bool)
        if len(semrefs):
            term_of = np.repeat(np.arange(n_terms, dtype=np.int64), sizes)
            combo = term_of * (self._semref_cap + 1) + np.asarray(semrefs)
            combo_sorted = np.sort(combo)
            dup_pos = np.flatnonzero(combo_sorted[1:] == combo_sorted[:-1])
            if dup_pos.size:
                dup_terms = (combo_sorted[dup_pos] // (self._semref_cap + 1)).astype(
                    np.int64
                )
                self._term_has_dups[dup_terms] = True
        self._ktype_cache = None  # semref_cap may have changed
        self._true_mask_cache.clear()
        self._built = True

    def lookup(self, term: str) -> int:
        """Interned id for a term, or -1 if absent."""
        return self._interner.lookup(term)

    def posting_size(self, tid: int) -> int:
        """Host-side posting-list length for an interned term id."""
        if not self._built:
            self.build()
        if tid < 0:
            return 0
        if self._offsets_host is None:
            self._offsets_host = np.asarray(self._offsets)
        return int(self._offsets_host[tid + 1] - self._offsets_host[tid])

    def posting_semrefs(self, tid: int) -> np.ndarray:
        """Host-side posting list (semref ordinals, in index insertion
        order) for an interned term id — used to replicate the host VM's
        accumulator insertion order, which downstream stages observe."""
        if not self._built:
            self.build()
        if tid < 0:
            return np.empty(0, dtype=np.int32)
        start = int(self._offsets_host[tid])
        stop = int(self._offsets_host[tid + 1])
        return self._semrefs_host[start:stop]

    def lookup_ops(
        self,
        ops: list[tuple[int, float, int, int, int, int, int]],
        n_seg: int,
        semref_ktype: np.ndarray,
        scopes: list[np.ndarray | None] | None = None,
        boost_factor: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Segmented fused accumulation (multi-query capable).

        ``ops``: (tid, weight, seg, kind, position, ktype_gate, scope_id)
        per lookup op (tid from :meth:`lookup`; kind per OP_* constants;
        ktype_gate -1 or a knowledge-type code; scope_id indexes ``scopes``).
        ``scopes``: one bool mask (or None = everything) per scope id —
        distinct queries batched into one call carry distinct scope rows.
        Returns host arrays (exact_score[n_seg, n], exact_hits,
        related_score, related_hits, op_hit[len(ops)]) truncated to
        n_semrefs.
        """
        if not self._built:
            self.build()
        operands, statics, seg_pad = self._prepare_operands(
            ops, n_seg, semref_ktype, scopes, boost_factor
        )
        n = self._n_semrefs

        cap = min(_COMPACT_CAP, self._semref_cap)
        if self._semref_cap > _SPARSE_MIN_CAP:
            # Large conversation: compact on device, expand on host — the
            # dense [n_seg, semref_cap] download dominates otherwise. ONE
            # device->host fetch brings counts + a packed slice sized by the
            # adaptive hint (the largest active count seen so far); only a
            # hint overflow pays a second fetch. On tunneled devices every
            # fetch is a full round trip, so the steady state is 1 RTT.
            packed, op_hit_dev, order, counts_dev = (
                accumulate_postings_segmented_compact(
                    *operands, cap=cap, **statics
                )
            )
            m = min(self._fetch_hint, cap)
            counts, packed_np, order_np, op_hit = jax.device_get(
                (counts_dev, packed[:, :, :m], order[:, :m], op_hit_dev)
            )
            max_count = int(counts.max(initial=0))
            if max_count <= cap:
                if max_count > m:
                    # Clamp to the packed block width: JAX slicing past cap
                    # silently truncates, and a wider host-side `valid` mask
                    # would then shape-mismatch the fetched arrays (caps
                    # between fetch buckets, e.g. 3072, hit this).
                    m = min(_bucket(max_count, _COMPACT_FETCH_BUCKETS), cap)
                    self._fetch_hint = max(self._fetch_hint, m)
                    packed_np, order_np = jax.device_get(
                        (packed[:, :, :m], order[:, :m])
                    )
                # Scatter back only each segment's first counts[s] slots:
                # unused slots carry (order 0, value 0) and a full-width
                # fancy assignment would let those trailing writes clobber
                # an ACTIVE semref 0 (last duplicate wins in numpy).
                valid = np.arange(m)[None, :] < np.minimum(counts, m)[:, None]
                rr = np.broadcast_to(
                    np.arange(seg_pad, dtype=np.int64)[:, None], order_np.shape
                )[valid]
                cc = order_np[valid]
                out = []
                for block in packed_np:
                    dense = np.zeros((seg_pad, self._semref_cap), np.float32)
                    dense[rr, cc] = block[valid]
                    out.append(dense[:n_seg, :n])
                return (*out, op_hit[: len(ops)])
            # Overflow (a segment matched more than cap semrefs): lossless
            # fallback to the dense transfer.

        exact_score, exact_hits, related_score, related_hits, op_hit = (
            jax.device_get(accumulate_postings_segmented(*operands, **statics))
        )
        return (
            exact_score[:n_seg, :n],
            exact_hits[:n_seg, :n],
            related_score[:n_seg, :n],
            related_hits[:n_seg, :n],
            op_hit[: len(ops)],
        )

    def lookup_ops_sparse(
        self,
        ops: list[tuple[int, float, int, int, int, int, int]],
        n_seg: int,
        semref_ktype: np.ndarray,
        scopes: list[np.ndarray | None] | None = None,
        boost_factor: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
        """Compact-form segmented accumulation for large conversations.

        Returns ``(cols [n_seg, m] i32 ascending-ordinal active columns,
        packed [4, n_seg, m] f32 (exact_score/exact_hits/related_score/
        related_hits), counts [n_seg] i32, op_hit [len(ops)] bool)`` — or
        None when the dense path must take over (caller falls back to
        :meth:`lookup_ops`): small conversation (dense is cheaper there),
        total postings past the largest entry bucket, active (seg, semref)
        runs past the largest result bucket, or a query whose shape cannot
        ride the COO kernel's int32 packing (see the guards below).
        The combine then runs over each query's active-column union instead
        of dense [n_seg, n_semrefs] arrays. Device side is the scatter-free
        sort+scan COO kernel (:func:`accumulate_postings_segmented_coo`).
        """
        if self._semref_cap <= _SPARSE_MIN_CAP:
            return None
        # The COO kernel packs (segment, semref) into ONE int32 sort key
        # (x64 is off on TPU); past 2^30 live keys collide with the padding
        # sentinel and real runs get dropped. Nothing upstream enforces the
        # budget for direct callers of this public method, so check here.
        if n_seg * (self._semref_cap + 1) >= 2**30:
            return None
        # Secondary sort key clamps op positions to _POS_P - 2; beyond that
        # distinct positions collide and first-adder tie-breaking diverges
        # from the dense kernel. Leaves that wide ride the dense path.
        if ops and max(op[4] for op in ops) > _POS_P - 2:
            return None
        if not self._built:
            self.build()
        total = sum(
            self.posting_size(op[0]) for op in ops if op[0] >= 0
        )
        if total > _COO_E_BUCKETS[-1]:
            return None  # pathological query: dense path's gates decide
        e_pad = _bucket(max(total, 1), _COO_E_BUCKETS)
        operands, statics, seg_pad = self._prepare_operands(
            ops, n_seg, semref_ktype, scopes, boost_factor
        )
        statics_coo = dict(
            e_pad=e_pad,
            semref_cap=statics["semref_cap"],
            n_seg=statics["n_seg"],
            dedup_related=statics["dedup_related"],
        )
        r = self._coo_hint
        while True:
            keys_dev, sums_dev, n_runs_dev, op_hit_dev = (
                accumulate_postings_segmented_coo(
                    *operands, r_max=r, **statics_coo
                )
            )
            n_runs, keys_np, sums_np, op_hit = jax.device_get(
                (n_runs_dev, keys_dev, sums_dev, op_hit_dev)
            )
            n_runs = int(n_runs)
            if n_runs <= keys_np.shape[0]:
                break
            if n_runs > _COO_BUCKETS[-1]:
                # Enormous result set: dense path wins. Checked on n_runs,
                # not the retry width — _bucket() rounds past the last
                # bucket, so gating on `r` would both skip this fallback
                # when the FIRST call overflows and inflate _coo_hint (and
                # every later fetch + compiled variant) without bound.
                return None
            r = _bucket(n_runs, _COO_BUCKETS)
            self._coo_hint = max(self._coo_hint, r)

        keys_np = keys_np[:n_runs].astype(np.int64)
        sums_np = sums_np[:, :n_runs]
        width = self._semref_cap + 1
        seg_of = keys_np // width
        col_of = (keys_np % width).astype(np.int32)
        counts = np.bincount(seg_of, minlength=seg_pad).astype(np.int32)
        m = int(counts.max(initial=0))
        cols = np.zeros((n_seg, max(m, 1)), dtype=np.int32)
        packed = np.zeros((4, n_seg, max(m, 1)), dtype=np.float32)
        starts = np.concatenate([[0], np.cumsum(counts)])
        for s in range(n_seg):
            c = counts[s]
            if not c:
                continue
            sl = slice(starts[s], starts[s] + c)
            cols[s, :c] = col_of[sl]
            packed[:, s, :c] = sums_np[:, sl]
        return cols, packed, counts[:n_seg], op_hit[: len(ops)]

    def lookup_ops_sparse_dp(
        self,
        ops: list[tuple[int, float, int, int, int, int, int]],
        n_seg: int,
        semref_ktype: np.ndarray,
        scopes: list[np.ndarray | None] | None = None,
        boost_factor: float = 1.0,
        *,
        mesh: Mesh | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
        """:meth:`lookup_ops_sparse` over a mesh: segments split into one
        contiguous group per data-parallel rank (balanced by posting
        totals), postings replicated, op arrays dp-sharded — one SPMD
        device call evaluates every rank's group. Same return contract as
        :meth:`lookup_ops_sparse` (global segment numbering); None routes
        the caller to the dense path.
        """
        if mesh is None or mesh.shape[mesh.axis_names[0]] <= 1 or n_seg < 2:
            return self.lookup_ops_sparse(
                ops, n_seg, semref_ktype, scopes, boost_factor
            )
        if self._semref_cap <= _SPARSE_MIN_CAP:
            return None
        if ops and max(op[4] for op in ops) > _POS_P - 2:
            return None
        if not self._built:
            self.build()
        n_dp = mesh.shape[mesh.axis_names[0]]

        # Contiguous segment ranges balanced by posting totals.
        seg_cost = np.zeros(n_seg, dtype=np.int64)
        for op in ops:
            if op[0] >= 0:
                seg_cost[op[2]] += self.posting_size(op[0])
        total = int(seg_cost.sum())
        if total > _COO_E_BUCKETS[-1] * n_dp:
            return None
        cum = np.cumsum(seg_cost)
        bounds = sorted(
            {0, n_seg}
            | {
                int(np.searchsorted(cum, total * g / n_dp))
                for g in range(1, n_dp)
            }
        )
        ranges = list(zip(bounds[:-1], bounds[1:]))
        while len(ranges) < n_dp:
            ranges.append((n_seg, n_seg))
        ranges = ranges[:n_dp]

        groups: list[list[int]] = [[] for _ in ranges]
        for oi, op in enumerate(ops):
            for g, (lo, hi) in enumerate(ranges):
                if lo <= op[2] < hi:
                    groups[g].append(oi)
                    break
        t_pad = _bucket(max((len(g) for g in groups), default=1) or 1,
                        _TERM_BUCKETS)
        e_need = 1
        for g in groups:
            e_need = max(
                e_need,
                sum(self.posting_size(ops[oi][0]) for oi in g if ops[oi][0] >= 0),
            )
        e_pad = _bucket(e_need, _COO_E_BUCKETS)
        seg_pad = _bucket(
            max((hi - lo for lo, hi in ranges), default=1) or 1, _SEG_BUCKETS
        )
        if seg_pad * (self._semref_cap + 1) >= 2**30:
            return None
        self.dp_calls += 1

        # Shared device operands (CSR, scope masks, ktype) via the common
        # packer; its per-op arrays are replaced by the stacked ones below.
        operands, statics, _ = self._prepare_operands(
            ops, n_seg, semref_ktype, scopes, boost_factor
        )
        offsets_d, semrefs_d, scores_d = operands[:3]
        masks_dev, ktype_dev, boost_dev = operands[10], operands[11], operands[12]

        tids = np.full((n_dp, t_pad), -1, np.int32)
        weights = np.zeros((n_dp, t_pad), np.float32)
        segs = np.zeros((n_dp, t_pad), np.int32)
        kinds = np.zeros((n_dp, t_pad), np.int8)
        positions = np.zeros((n_dp, t_pad), np.int32)
        gates = np.full((n_dp, t_pad), -1, np.int8)
        scope_ids = np.zeros((n_dp, t_pad), np.int32)
        for g, idxs in enumerate(groups):
            lo = ranges[g][0]
            for i, oi in enumerate(idxs):
                tid, w, seg, kind, pos, gate, sid = ops[oi]
                tids[g, i] = tid
                weights[g, i] = w
                segs[g, i] = seg - lo
                kinds[g, i] = kind
                positions[g, i] = pos
                gates[g, i] = gate
                scope_ids[g, i] = sid

        r = self._coo_hint
        while True:
            keys_dev, sums_dev, n_runs_dev, op_hit_dev = (
                accumulate_postings_segmented_coo_dp(
                    mesh,
                    offsets_d, semrefs_d, scores_d,
                    jnp.asarray(tids), jnp.asarray(weights), jnp.asarray(segs),
                    jnp.asarray(kinds), jnp.asarray(positions),
                    jnp.asarray(gates), jnp.asarray(scope_ids),
                    masks_dev, ktype_dev, boost_dev,
                    e_pad=e_pad,
                    semref_cap=self._semref_cap,
                    n_seg=seg_pad,
                    dedup_related=statics["dedup_related"],
                    r_max=r,
                )
            )
            n_runs_np, keys_np, sums_np, op_hit_np = jax.device_get(
                (n_runs_dev, keys_dev, sums_dev, op_hit_dev)
            )
            mx = int(n_runs_np.max(initial=0))
            if mx <= keys_np.shape[1]:
                break
            if mx > _COO_BUCKETS[-1]:
                return None
            r = _bucket(mx, _COO_BUCKETS)
            self._coo_hint = max(self._coo_hint, r)

        # Decode each rank's local keys back to global segments; groups are
        # segment-ordered and keys ascend within a group, so the
        # concatenation keeps the (seg, col) ascending order the combine
        # relies on.
        width = self._semref_cap + 1
        seg_parts, col_parts, sum_parts = [], [], []
        for g in range(len(ranges)):
            nr = int(n_runs_np[g])
            kz = keys_np[g, :nr].astype(np.int64)
            seg_parts.append(kz // width + ranges[g][0])
            col_parts.append((kz % width).astype(np.int32))
            sum_parts.append(sums_np[g][:, :nr])
        seg_of = np.concatenate(seg_parts) if seg_parts else np.zeros(0, np.int64)
        col_of = np.concatenate(col_parts) if col_parts else np.zeros(0, np.int32)
        sums_cat = (
            np.concatenate(sum_parts, axis=1)
            if sum_parts
            else np.zeros((4, 0), np.float32)
        )
        counts = np.bincount(seg_of, minlength=n_seg).astype(np.int32)
        m = int(counts.max(initial=0))
        cols = np.zeros((n_seg, max(m, 1)), dtype=np.int32)
        packed = np.zeros((4, n_seg, max(m, 1)), dtype=np.float32)
        starts = np.concatenate([[0], np.cumsum(counts)])
        for s in range(n_seg):
            c = counts[s]
            if not c:
                continue
            sl = slice(starts[s], starts[s] + c)
            cols[s, :c] = col_of[sl]
            packed[:, s, :c] = sums_cat[:, sl]
        op_hit = np.zeros(len(ops), dtype=bool)
        for g, idxs in enumerate(groups):
            for i, oi in enumerate(idxs):
                op_hit[oi] = bool(op_hit_np[g, i])
        return cols, packed, counts[:n_seg], op_hit

    def _prepare_operands(
        self, ops, n_seg, semref_ktype, scopes, boost_factor
    ):
        """Shared operand packing for the segmented accumulation calls."""
        t_pad = _bucket(len(ops), _TERM_BUCKETS)
        seg_pad = _bucket(n_seg, _SEG_BUCKETS)
        tids = np.full(t_pad, -1, dtype=np.int32)
        weights = np.zeros(t_pad, dtype=np.float32)
        segs = np.zeros(t_pad, dtype=np.int32)
        kinds = np.zeros(t_pad, dtype=np.int8)
        positions = np.zeros(t_pad, dtype=np.int32)
        gates = np.full(t_pad, -1, dtype=np.int8)
        scope_ids = np.zeros(t_pad, dtype=np.int32)
        max_size = 1
        dedup_related = False
        for i, (tid, weight, seg, kind, position, gate, scope_id) in enumerate(ops):
            tids[i] = tid
            weights[i] = weight
            segs[i] = seg
            kinds[i] = kind
            positions[i] = position
            gates[i] = gate
            scope_ids[i] = scope_id
            if tid >= 0:
                max_size = max(max_size, self.posting_size(tid))
                if kind == OP_RELATED and self._term_has_dups[tid]:
                    dedup_related = True
        window = _bucket(max_size, _WINDOW_BUCKETS)

        scopes = scopes or [None]
        n_scopes = _bucket(len(scopes), (1, 2, 4, 8, 16))
        if all(s is None for s in scopes):
            masks_dev = self._true_mask_cache.get(n_scopes)
            if masks_dev is None or masks_dev.shape[1] != self._semref_cap:
                masks_dev = jnp.ones((n_scopes, self._semref_cap), dtype=bool)
                self._true_mask_cache[n_scopes] = masks_dev
        else:
            masks = np.zeros((n_scopes, self._semref_cap), dtype=bool)
            for row, scope in enumerate(scopes):
                if scope is None:
                    masks[row, :] = True
                else:
                    masks[row, : len(scope)] = scope
            masks_dev = jnp.asarray(masks)
        # Value-keyed cache (a few µs even at 100k codes): identity keying
        # would serve a stale device vector to callers that edit the ktype
        # array in place and pass the same ndarray object. The cached host
        # copy is ours, so later caller mutations can't alias into the key.
        cached = self._ktype_cache
        if (
            cached is None
            or cached[0].shape != semref_ktype.shape
            or not np.array_equal(cached[0], semref_ktype)
        ):
            ktype_padded = np.full(self._semref_cap, -1, dtype=np.int8)
            ktype_padded[: len(semref_ktype)] = semref_ktype
            self._ktype_cache = (
                np.array(semref_ktype, copy=True),
                jnp.asarray(ktype_padded),
            )
        ktype_dev = self._ktype_cache[1]

        operands = (
            self._offsets,
            self._semrefs,
            self._scores,
            jnp.asarray(tids),
            jnp.asarray(weights),
            jnp.asarray(segs),
            jnp.asarray(kinds),
            jnp.asarray(positions),
            jnp.asarray(gates),
            jnp.asarray(scope_ids),
            masks_dev,
            ktype_dev,
            jnp.float32(boost_factor),
        )
        statics = dict(
            window=window,
            semref_cap=self._semref_cap,
            n_seg=seg_pad,
            dedup_related=dedup_related,
        )
        return operands, statics, seg_pad

    def lookup_terms(
        self,
        terms: list[tuple[str, float, bool]],
        scope_semrefs: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Fused accumulation for (term_text, weight, is_exact) triples.

        scope_semrefs: optional bool mask over semref ordinals (True = in
        scope). Returns (total_score, exact_hits, related_hits) arrays over
        semref ordinals (length n_semrefs).
        """
        if not self._built:
            self.build()
        t_pad = _bucket(len(terms), _TERM_BUCKETS)
        tids = np.full(t_pad, -1, dtype=np.int32)
        weights = np.zeros(t_pad, dtype=np.float32)
        exact = np.zeros(t_pad, dtype=bool)
        max_size = 1
        offsets_host = None
        for i, (text, weight, is_exact) in enumerate(terms):
            tid = self._interner.lookup(text)
            tids[i] = tid
            weights[i] = weight
            exact[i] = is_exact
        # Window: the longest posting list among queried terms (bucketed).
        if any(t >= 0 for t in tids):
            if offsets_host is None:
                offsets_host = np.asarray(self._offsets)
            for t in tids:
                if t >= 0:
                    max_size = max(
                        max_size, int(offsets_host[t + 1] - offsets_host[t])
                    )
        window = _bucket(max_size, _WINDOW_BUCKETS)

        if scope_semrefs is None:
            mask = np.ones(self._semref_cap, dtype=bool)
        else:
            mask = np.zeros(self._semref_cap, dtype=bool)
            mask[: len(scope_semrefs)] = scope_semrefs

        total, exact_hits, related_hits = accumulate_postings(
            self._offsets,
            self._semrefs,
            self._scores,
            jnp.asarray(tids),
            jnp.asarray(weights),
            jnp.asarray(exact),
            jnp.asarray(mask),
            window=window,
            semref_cap=self._semref_cap,
        )
        n = self._n_semrefs
        return (
            np.asarray(total)[:n],
            np.asarray(exact_hits)[:n],
            np.asarray(related_hits)[:n],
        )
