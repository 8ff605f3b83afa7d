"""Accumulator / collection math matrix.

Pins the scoring-machinery semantics the query engines (host VM and device
executor) both rely on: Match bookkeeping, smoothing, union/intersect,
hit-count selection, MessageAccumulator's order-sensitive max-merge,
TopNCollection tie behavior, TextRange scoping, and the term sets.
Coverage mirrors the reference's test_collections.py (560 LoC).
"""

import pytest

from typeagent_tpu.knowpro.collections import (
    Match,
    MatchAccumulator,
    MessageAccumulator,
    PropertyTermSet,
    SemanticRefAccumulator,
    TermSet,
    TextRangeCollection,
    TextRangesInScope,
    TopNCollection,
    get_smooth_score,
    get_top_k,
    Scored,
)
from typeagent_tpu.knowpro.interfaces import (
    ScoredSemanticRefOrdinal,
    Term,
    TextLocation,
    TextRange,
)


def match_of(acc, value):
    m = acc.get_match(value)
    assert m is not None
    return m


# ---------------------------------------------------------------------------
# get_smooth_score
# ---------------------------------------------------------------------------


def test_smooth_score_zero_hits():
    assert get_smooth_score(5.0, 0) == 0.0


def test_smooth_score_one_hit_is_identity():
    assert get_smooth_score(5.0, 1) == 5.0


def test_smooth_score_many_hits_log_dampened():
    import math

    assert get_smooth_score(6.0, 3) == pytest.approx(math.log(4) * 2.0)
    # Dampening: N hits score less than N times one hit...
    assert get_smooth_score(10.0, 10) < 10.0
    # ...but more hits of the same strength still score higher.
    assert get_smooth_score(4.0, 4) > get_smooth_score(2.0, 2)


# ---------------------------------------------------------------------------
# MatchAccumulator basics
# ---------------------------------------------------------------------------


def test_exact_add_bumps_score_and_hits():
    acc = MatchAccumulator()
    acc.add("v", 2.0, True)
    acc.add("v", 3.0, True)
    m = match_of(acc, "v")
    assert (m.score, m.hit_count) == (5.0, 2)
    assert (m.related_score, m.related_hit_count) == (0.0, 0)


def test_related_add_keeps_exact_fields_zero():
    acc = MatchAccumulator()
    acc.add("v", 0.5, False)
    acc.add("v", 0.7, False)
    m = match_of(acc, "v")
    assert (m.score, m.hit_count) == (0.0, 0)
    assert (m.related_score, m.related_hit_count) == (pytest.approx(1.2), 2)


def test_calculate_total_score_folds_smoothed_related():
    acc = MatchAccumulator()
    acc.add("v", 2.0, True)
    acc.add("v", 0.6, False)
    acc.add("v", 0.4, False)
    acc.calculate_total_score()
    m = match_of(acc, "v")
    assert m.score == pytest.approx(2.0 + get_smooth_score(1.0, 2))


def test_calculate_total_score_single_related_is_raw():
    acc = MatchAccumulator()
    acc.add("v", 0.9, False)
    acc.calculate_total_score()
    assert match_of(acc, "v").score == pytest.approx(0.9)


def test_union_sums_all_four_fields():
    a = MatchAccumulator()
    a.add("v", 1.0, True)
    a.add("v", 0.5, False)
    b = MatchAccumulator()
    b.add("v", 2.0, True)
    b.add("v", 0.25, False)
    b.add("w", 1.0, True)
    a.add_union(b)
    m = match_of(a, "v")
    assert (m.score, m.hit_count) == (3.0, 2)
    assert (m.related_score, m.related_hit_count) == (0.75, 2)
    assert "w" in a


def test_intersect_keeps_only_common_and_sums():
    a = MatchAccumulator()
    a.add("v", 1.0, True)
    a.add("x", 1.0, True)
    b = MatchAccumulator()
    b.add("v", 2.0, True)
    b.add("y", 1.0, True)
    out = MatchAccumulator()
    a.intersect(b, out)
    assert set(out.get_matched_values()) == {"v"}
    assert match_of(out, "v").score == 3.0
    assert match_of(out, "v").hit_count == 2


def test_max_hit_count_and_selection():
    acc = MatchAccumulator()
    acc.add("a", 1.0, True)
    acc.add("b", 1.0, True)
    acc.add("b", 1.0, True)
    acc.add("c", 9.0, False)  # related-only: hit_count 0
    assert acc.get_max_hit_count() == 2
    assert {m.value for m in acc.get_with_hit_count(2)} == {"b"}
    acc.select_with_hit_count(2)
    assert set(acc.get_matched_values()) == {"b"}


def test_get_sorted_by_score_desc_stable():
    acc = MatchAccumulator()
    acc.add("low", 1.0, True)
    acc.add("hi", 3.0, True)
    acc.add("mid", 2.0, True)
    acc.add("mid2", 2.0, True)
    ranked = [m.value for m in acc.get_sorted_by_score()]
    assert ranked[0] == "hi"
    # Equal scores keep insertion order (stable sort).
    assert ranked[1:3] == ["mid", "mid2"]


def test_select_top_n_scoring_with_min_hit():
    acc = MatchAccumulator()
    for i in range(5):
        acc.add(i, float(i), True)
    acc.add(4, 1.0, True)  # ordinal 4: 2 hits
    kept = acc.select_top_n_scoring(max_matches=2, min_hit_count=2)
    assert kept == 1
    assert set(acc.get_matched_values()) == {4}


def test_select_top_n_no_limit_sorts_only():
    acc = MatchAccumulator()
    acc.add("a", 1.0, True)
    acc.add("b", 5.0, True)
    acc.select_top_n_scoring(None)
    assert [m.value for m in acc.get_matches()] == ["b", "a"]


# ---------------------------------------------------------------------------
# SemanticRefAccumulator term-match bookkeeping
# ---------------------------------------------------------------------------


def scored(*pairs):
    return [ScoredSemanticRefOrdinal(o, s) for o, s in pairs]


def test_add_term_matches_weights_and_texts():
    acc = SemanticRefAccumulator()
    acc.add_term_matches(Term("bach", weight=2.0), scored((1, 1.0), (2, 0.5)), True)
    assert match_of(acc, 1).score == 2.0
    assert match_of(acc, 2).score == 1.0
    assert acc.search_term_matches == {"bach"}


def test_add_term_matches_empty_list_still_records_text():
    acc = SemanticRefAccumulator()
    acc.add_term_matches(Term("ghost"), [], True)
    assert len(acc) == 0
    assert acc.search_term_matches == {"ghost"}


def test_add_term_matches_none_records_nothing():
    acc = SemanticRefAccumulator()
    acc.add_term_matches(Term("ghost"), None, True)
    assert acc.search_term_matches == set()


def test_add_if_new_skips_existing_ordinals():
    acc = SemanticRefAccumulator()
    acc.add_term_matches(Term("main"), scored((1, 1.0)), True)
    acc.add_term_matches_if_new(Term("main"), scored((1, 1.0), (2, 1.0)), False, 0.5)
    m1 = match_of(acc, 1)
    assert (m1.hit_count, m1.related_hit_count) == (1, 0)  # not re-scored
    m2 = match_of(acc, 2)
    assert (m2.related_score, m2.related_hit_count) == (0.5, 1)


def test_effective_weight_falls_back_to_term_weight():
    acc = SemanticRefAccumulator()
    acc.add_term_matches(Term("t", weight=3.0), scored((1, 1.0)), True, weight=None)
    assert match_of(acc, 1).score == 3.0
    acc2 = SemanticRefAccumulator()
    acc2.add_term_matches(Term("t"), scored((1, 1.0)), True, weight=None)
    assert match_of(acc2, 1).score == 1.0


def test_union_merges_term_texts():
    a = SemanticRefAccumulator()
    a.add_term_matches(Term("x"), scored((1, 1.0)), True)
    b = SemanticRefAccumulator()
    b.add_term_matches(Term("y"), scored((2, 1.0)), True)
    a.add_union(b)
    assert a.search_term_matches == {"x", "y"}


def test_intersect_merges_texts_only_when_nonempty():
    a = SemanticRefAccumulator()
    a.add_term_matches(Term("x"), scored((1, 1.0)), True)
    b = SemanticRefAccumulator()
    b.add_term_matches(Term("y"), scored((2, 1.0)), True)
    out = a.intersect(b)
    assert len(out) == 0
    assert out.search_term_matches == set()
    c = SemanticRefAccumulator()
    c.add_term_matches(Term("z"), scored((1, 2.0)), True)
    out2 = a.intersect(c)
    assert len(out2) == 1
    assert out2.search_term_matches == {"x", "z"}


def test_to_scored_semantic_refs_order():
    acc = SemanticRefAccumulator()
    acc.add_term_matches(Term("t"), scored((5, 1.0), (7, 3.0), (9, 2.0)), True)
    out = acc.to_scored_semantic_refs()
    assert [(x.semantic_ref_ordinal, x.score) for x in out] == [
        (7, 3.0),
        (9, 2.0),
        (5, 1.0),
    ]


# ---------------------------------------------------------------------------
# MessageAccumulator: ORDER-SENSITIVE max-merge (devices must replicate it)
# ---------------------------------------------------------------------------


def test_message_add_max_merge_order_sensitivity():
    """Score sequence 10, 0.9 -> 1 hit; 0.9, 10 -> 2 hits. The hit count
    records IMPROVEMENTS, so insertion order is observable downstream."""
    a = MessageAccumulator()
    a.add(0, 10.0)
    a.add(0, 0.9)
    assert (match_of(a, 0).score, match_of(a, 0).hit_count) == (10.0, 1)
    b = MessageAccumulator()
    b.add(0, 0.9)
    b.add(0, 10.0)
    assert (match_of(b, 0).score, match_of(b, 0).hit_count) == (10.0, 2)


def test_message_equal_score_does_not_bump():
    acc = MessageAccumulator()
    acc.add(3, 2.0)
    acc.add(3, 2.0)
    assert match_of(acc, 3).hit_count == 1


def test_add_messages_for_semantic_ref_covers_range():
    from typeagent_tpu.knowpro.interfaces import SemanticRef
    from typeagent_tpu.knowpro import kplib

    ref = SemanticRef(
        0,
        TextRange(TextLocation(2), TextLocation(5)),
        kplib.ConcreteEntity("e", ["t"]),
    )
    acc = MessageAccumulator()
    acc.add_messages_for_semantic_ref(ref, 1.5)
    assert sorted(acc.get_matched_values()) == [2, 3, 4, 5]


def test_message_smooth_scores():
    acc = MessageAccumulator()
    acc.add(0, 4.0)
    acc.add(0, 6.0)  # improvement -> hits 2
    acc.smooth_scores()
    assert match_of(acc, 0).score == pytest.approx(get_smooth_score(6.0, 2))


def test_message_intersect_returns_message_accumulator():
    a = MessageAccumulator()
    a.add(1, 1.0)
    a.add(2, 1.0)
    b = MessageAccumulator()
    b.add(2, 3.0)
    out = a.intersect(b)
    assert isinstance(out, MessageAccumulator)
    assert sorted(out.get_matched_values()) == [2]


# ---------------------------------------------------------------------------
# TopNCollection / get_top_k
# ---------------------------------------------------------------------------


def test_topn_keeps_best_n():
    top = TopNCollection(3)
    for i, s in enumerate([5.0, 1.0, 3.0, 4.0, 2.0]):
        top.push(i, s)
    assert top.values_by_rank() == [0, 3, 2]


def test_topn_tie_keeps_first_inserted():
    top = TopNCollection(2)
    top.push("first", 1.0)
    top.push("second", 1.0)
    top.push("third", 1.0)
    assert set(top.values_by_rank()) == {"first", "second"}


def test_get_top_k():
    items = [Scored(i, float(i % 7)) for i in range(20)]
    ranked = get_top_k(items, 3)
    assert [s.score for s in ranked] == [6.0, 6.0, 5.0]


# ---------------------------------------------------------------------------
# TextRangeCollection / TextRangesInScope
# ---------------------------------------------------------------------------


def r(sm, sc=0, em=None, ec=0):
    end = TextLocation(em, ec) if em is not None else None
    return TextRange(TextLocation(sm, sc), end)


def test_range_collection_sorted_insert_and_dedupe():
    coll = TextRangeCollection()
    assert coll.add_range(r(5))
    assert coll.add_range(r(2))
    assert not coll.add_range(r(5))  # duplicate
    assert [x.start.message_ordinal for x in coll] == [2, 5]


def test_contains_range_point_and_interval():
    coll = TextRangeCollection([r(2, em=6)], True)
    assert coll.contains_range(r(3))
    assert coll.contains_range(r(2, em=6))
    assert not coll.contains_range(r(1))
    assert not coll.contains_range(r(5, em=7))  # extends past the end


def test_contains_range_chunk_granularity():
    # Range covering message 1 chunks [1, 3).
    coll = TextRangeCollection([r(1, 1, 1, 3)], True)
    assert coll.contains_range(r(1, 1))
    assert coll.contains_range(r(1, 2))
    assert not coll.contains_range(r(1, 0))
    assert not coll.contains_range(r(1, 3))


def test_contains_range_overlapping_candidates():
    # Two ranges with the same start; the longer one must be found even
    # though it is not the bisect neighbor.
    coll = TextRangeCollection()
    coll.add_range(r(0, em=2))
    coll.add_range(r(0, em=9))
    coll.add_range(r(1, em=3))
    assert coll.contains_range(r(4, em=8))


def test_ranges_in_scope_is_selector_intersection():
    scope = TextRangesInScope()
    scope.add_text_ranges(TextRangeCollection([r(0, em=5)], True))
    scope.add_text_ranges(TextRangeCollection([r(3, em=8)], True))
    assert scope.is_range_in_scope(r(4))
    assert not scope.is_range_in_scope(r(1))  # fails selector 2
    assert not scope.is_range_in_scope(r(7))  # fails selector 1


def test_empty_scope_accepts_everything():
    scope = TextRangesInScope()
    assert scope.is_range_in_scope(r(123))


def test_empty_collection_rejects_everything():
    scope = TextRangesInScope()
    scope.add_text_ranges(TextRangeCollection())
    assert not scope.is_range_in_scope(r(0))


# ---------------------------------------------------------------------------
# TermSet / PropertyTermSet
# ---------------------------------------------------------------------------


def test_term_set_keyed_by_text():
    ts = TermSet()
    assert ts.add(Term("a", weight=1.0))
    assert not ts.add(Term("a", weight=9.0))
    assert Term("a") in ts
    assert ts.get_weight(Term("a")) == 1.0


def test_term_set_union_keeps_max_weight_in_place():
    first = Term("a", weight=1.0)
    ts = TermSet([first])
    ts.add_or_union(Term("a", weight=5.0))
    assert ts.get("a") is first  # aliasing preserved
    assert first.weight == 5.0
    ts.add_or_union(Term("a", weight=2.0))
    assert first.weight == 5.0


def test_property_term_set_dedupe():
    ps = PropertyTermSet()
    ps.add("name", Term("bach"))
    assert ps.has("name", Term("bach"))
    assert ps.has("name", "bach")
    assert not ps.has("type", "bach")
    ps.clear()
    assert not ps.has("name", "bach")
