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

import jax
import jax.numpy as jnp
import numpy as np

from ..native import create_interner
from .append import round_up

__all__ = ["DevicePostingsIndex", "accumulate_postings"]

_WINDOW_BUCKETS = (64, 256, 1024, 4096, 16384)
_TERM_BUCKETS = (8, 32, 128, 512)


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
):
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
        self._built = True

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
