"""Edge-behavior matrix for accumulators, term sets, and query helpers.

Ports the behavioral corners the reference pins in its `tests/test_query.py`
and `tests/test_collections.py` (801 + 560 LoC there): exact/related add
ordering, if_new transitions, min-hit filtering of related-only matches,
TermSet/PropertyTermSet algebra, scope filtering, provenance copying through
group-by, timestamp-index edge cases, and the text/term matching helpers.
Constructions are our own; the pinned BEHAVIORS are the contract.
"""

import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.collections import (
    MatchAccumulator,
    PropertyTermSet,
    Scored,
    SemanticRefAccumulator,
    TermSet,
    TextRangeCollection,
    TextRangesInScope,
    TopNCollection,
    add_to_set,
    get_smooth_score,
    get_top_k,
)
from typeagent_tpu.knowpro.interfaces import (
    DateRange,
    Topic,
    Datetime,
    ScoredSemanticRefOrdinal,
    SearchTerm,
    SemanticRef,
    Term,
    TextLocation,
    TextRange,
)
from typeagent_tpu.knowpro.query import (
    get_matching_term_for_text,
    get_text_range_for_date_range,
    is_conversation_searchable,
    lookup_knowledge_type,
    lookup_term,
    lookup_term_filtered,
    match_entity_name_or_type,
    match_search_term_to_one_of_text,
    match_search_term_to_text,
)
from typeagent_tpu.storage.memory.collections import (
    MemoryMessageCollection,
    MemorySemanticRefCollection,
)
from typeagent_tpu.storage.memory.indexes import TermToSemanticRefIndex


def _range(msg, chunk=0, end_msg=None):
    end = TextLocation(end_msg) if end_msg is not None else None
    return TextRange(start=TextLocation(msg, chunk), end=end)


def _entity_ref(ordinal, name, types=("thing",), msg=None):
    return SemanticRef(
        semantic_ref_ordinal=ordinal,
        range=_range(msg if msg is not None else ordinal),
        knowledge=kplib.ConcreteEntity(name=name, type=list(types)),
    )


# ---------------------------------------------------------------------------
# MatchAccumulator: exact/related interplay corners
# ---------------------------------------------------------------------------


def test_related_then_exact_same_value():
    """A related add followed by an exact add of the SAME value: exact
    fields start counting; the earlier related contribution is retained."""
    acc = MatchAccumulator()
    acc.add("v", 0.4, is_exact_match=False)
    acc.add("v", 1.0, is_exact_match=True)
    m = acc.get_match("v")
    assert m.hit_count == 1 and m.score == 1.0
    assert m.related_hit_count == 1 and m.related_score == pytest.approx(0.4)


def test_exact_then_related_same_value():
    acc = MatchAccumulator()
    acc.add("v", 1.0, is_exact_match=True)
    acc.add("v", 0.4, is_exact_match=False)
    m = acc.get_match("v")
    assert m.hit_count == 1 and m.score == 1.0
    assert m.related_hit_count == 1 and m.related_score == pytest.approx(0.4)


def test_multiple_related_adds_accumulate_separately():
    acc = MatchAccumulator()
    for s in (0.2, 0.3, 0.4):
        acc.add("v", s, is_exact_match=False)
    m = acc.get_match("v")
    assert m.hit_count == 0 and m.score == 0.0
    assert m.related_hit_count == 3
    assert m.related_score == pytest.approx(0.9)


def test_related_only_matches_filtered_by_min_hit_count():
    """Related-only matches keep hit_count 0, so a min-hit filter of 1
    removes them while exact matches survive."""
    acc = MatchAccumulator()
    acc.add("related_only", 0.9, is_exact_match=False)
    acc.add("exact", 0.5, is_exact_match=True)
    survivors = [m.value for m in acc.matches_with_min_hit_count(1)]
    assert survivors == ["exact"]
    assert acc.select_with_hit_count(1) == 1
    assert [m.value for m in acc] == ["exact"]


def test_total_score_includes_smoothed_related():
    acc = MatchAccumulator()
    acc.add("v", 1.0, is_exact_match=True)
    acc.add("v", 0.6, is_exact_match=False)
    acc.add("v", 0.6, is_exact_match=False)
    acc.calculate_total_score()
    m = acc.get_match("v")
    assert m.score == pytest.approx(1.0 + get_smooth_score(1.2, 2))


def test_get_smooth_score_matrix():
    assert get_smooth_score(5.0, 0) == 0.0
    assert get_smooth_score(5.0, 1) == 5.0
    import math

    assert get_smooth_score(6.0, 3) == pytest.approx(math.log(4) * 6.0 / 3)
    # Smoothing dampens: many weak hits never beat their own sum.
    assert get_smooth_score(10.0, 10) < 10.0


def test_set_matches_clear_flag():
    from typeagent_tpu.knowpro.collections import Match

    acc = MatchAccumulator()
    acc.add("old", 1.0)
    acc.set_matches(
        [Match(value="new", score=2.0, hit_count=1, related_score=0.0,
               related_hit_count=0)],
        clear=True,
    )
    assert "old" not in acc and "new" in acc


# ---------------------------------------------------------------------------
# TermSet / PropertyTermSet algebra
# ---------------------------------------------------------------------------


def test_termset_add_rejects_duplicates():
    ts = TermSet()
    assert ts.add(Term("alpha", 1.0)) is True
    assert ts.add(Term("alpha", 9.0)) is False  # first weight wins on add()
    assert ts.get("alpha").weight == 1.0
    assert len(ts) == 1


def test_termset_add_or_union_single_keeps_max_weight():
    ts = TermSet([Term("alpha", 1.0)])
    ts.add_or_union(Term("alpha", 3.0))
    assert ts.get_weight(Term("alpha")) == 3.0
    ts.add_or_union(Term("alpha", 2.0))  # lower: unchanged
    assert ts.get_weight(Term("alpha")) == 3.0


def test_termset_add_or_union_list_and_none():
    ts = TermSet()
    ts.add_or_union([Term("a", 1.0), Term("b")])
    ts.add_or_union(None)  # no-op
    assert {t.text for t in ts.values()} == {"a", "b"}


def test_termset_get_by_str_and_term():
    ts = TermSet([Term("needle", 2.0)])
    assert ts.get("needle").weight == 2.0
    assert ts.get(Term("needle")).weight == 2.0
    assert ts.get("missing") is None


def test_termset_get_weight_none_for_weightless():
    ts = TermSet([Term("plain")])
    assert ts.get_weight(Term("plain")) is None


def test_termset_remove_and_clear():
    ts = TermSet([Term("a"), Term("b")])
    ts.remove(Term("a"))
    assert "a" not in {t.text for t in ts.values()}
    ts.remove(Term("ghost"))  # removing an absent term is a no-op
    ts.clear()
    assert len(ts) == 0


def test_termset_contains_and_iteration_order():
    ts = TermSet()
    for text in ("z", "a", "m"):
        ts.add(Term(text))
    assert Term("a") in ts and Term("q") not in ts
    assert [t.text for t in ts.values()] == ["z", "a", "m"]  # insertion order


def test_property_termset_add_has_clear():
    ps = PropertyTermSet()
    ps.add("name", Term("Ada"))
    assert ps.has("name", Term("Ada"))
    assert not ps.has("type", Term("Ada"))
    ps.add("name", Term("Ada"))  # duplicate: still a single entry
    ps.clear()
    assert not ps.has("name", Term("Ada"))


def test_add_to_set_utility():
    target = {1}
    add_to_set(target, [1, 2, 3])
    assert target == {1, 2, 3}


# ---------------------------------------------------------------------------
# TopN / get_top_k
# ---------------------------------------------------------------------------


def test_topn_by_rank_descending_and_capacity():
    top = TopNCollection(3)
    for i, score in enumerate([0.5, 0.9, 0.1, 0.7, 0.3]):
        top.push(i, score)
    ranked = top.by_rank()
    assert [s.item for s in ranked] == [1, 3, 0]
    assert [s.score for s in ranked] == [0.9, 0.7, 0.5]
    assert top.values_by_rank() == [1, 3, 0]


def test_topn_reset():
    top = TopNCollection(2)
    top.push("x", 1.0)
    top.reset()
    assert len(top) == 0


def test_get_top_k_over_scored_iterable():
    items = [Scored(item=c, score=s) for c, s in zip("abcde", (3, 1, 5, 2, 4))]
    best = get_top_k(items, 2)
    assert [(s.item, s.score) for s in best] == [("c", 5), ("e", 4)]


# ---------------------------------------------------------------------------
# SemanticRefAccumulator: scope, provenance, type grouping
# ---------------------------------------------------------------------------


def _scored(ordinal, score=1.0):
    return ScoredSemanticRefOrdinal(ordinal, score)


@pytest.fixture
def refs():
    return [
        _entity_ref(0, "Ada", ("person",), msg=0),
        _entity_ref(1, "Babbage", ("person",), msg=1),
        SemanticRef(
            semantic_ref_ordinal=2,
            range=_range(2),
            knowledge=Topic(text="computing"),
        ),
        _entity_ref(3, "Engine", ("machine",), msg=3),
    ]


async def test_get_semantic_refs_fetches_matched(refs):
    collection = MemorySemanticRefCollection(refs)
    acc = SemanticRefAccumulator()
    acc.add(0, 1.0)
    acc.add(3, 0.5)
    fetched = await acc.get_semantic_refs(collection, lambda r: True)
    assert [r.semantic_ref_ordinal for r in fetched] == [0, 3]
    people_only = await acc.get_semantic_refs(
        collection, lambda r: "person" in r.knowledge.type
    )
    assert [r.semantic_ref_ordinal for r in people_only] == [0]


async def test_get_matches_in_scope_filters_by_ranges(refs):
    acc = SemanticRefAccumulator(search_term_matches={"ada"})
    for o in range(4):
        acc.add(o, 1.0)
    scope = TextRangesInScope()
    scope.add_text_ranges(
        TextRangeCollection([_range(0), _range(3)])
    )
    collection = MemorySemanticRefCollection(refs)
    scoped = await acc.get_matches_in_scope(collection, scope)
    assert sorted(scoped.get_matched_values()) == [0, 3]
    # Provenance (search_term_matches) carries onto the filtered result.
    assert scoped.search_term_matches == {"ada"}


async def test_group_matches_by_type_copies_provenance(refs):
    collection = MemorySemanticRefCollection(refs)
    acc = SemanticRefAccumulator(search_term_matches={"hit"})
    for o in range(4):
        acc.add(o, 1.0)
    groups = await acc.group_matches_by_type(collection)
    assert set(groups) == {"entity", "topic"}
    assert sorted(groups["entity"].get_matched_values()) == [0, 1, 3]
    assert list(groups["topic"].get_matched_values()) == [2]
    for group in groups.values():
        assert group.search_term_matches == {"hit"}


def test_add_term_matches_if_new_skips_previously_added():
    acc = SemanticRefAccumulator()
    term = Term("alpha", 1.0)
    acc.add_term_matches(term, [_scored(0), _scored(1)], is_exact_match=True)
    acc.add_term_matches_if_new(
        Term("alpha-related", 0.5), [_scored(1), _scored(2)], is_exact_match=False
    )
    # Ordinal 1 was already added by the exact pass -> only 2 is new.
    assert acc.get_match(1).related_hit_count == 0
    assert acc.get_match(2).related_hit_count == 1


# ---------------------------------------------------------------------------
# Text/term matching helpers
# ---------------------------------------------------------------------------


def test_get_matching_term_for_text_main_and_related():
    st = SearchTerm(
        term=Term("Lovelace", 2.0),
        related_terms=[Term("Ada"), Term("Countess")],
    )
    assert get_matching_term_for_text(st, "lovelace").weight == 2.0
    assert get_matching_term_for_text(st, "ADA").text == "Ada"
    assert get_matching_term_for_text(st, "Byron") is None


def test_match_search_term_to_text_none_and_empty():
    st = SearchTerm(term=Term("x"))
    assert not match_search_term_to_text(st, None)
    assert not match_search_term_to_text(st, "")
    assert match_search_term_to_text(st, "X")


def test_match_search_term_to_one_of_text():
    st = SearchTerm(term=Term("cat"))
    assert match_search_term_to_one_of_text(st, ["dog", "CAT"])
    assert not match_search_term_to_one_of_text(st, ["dog"])
    assert not match_search_term_to_one_of_text(st, None)


def test_match_entity_name_or_type():
    entity = kplib.ConcreteEntity(name="Analytical Engine", type=["machine", "invention"])
    assert match_entity_name_or_type(
        SearchTerm(term=Term("analytical engine")), entity
    )
    assert match_entity_name_or_type(SearchTerm(term=Term("INVENTION")), entity)
    assert not match_entity_name_or_type(SearchTerm(term=Term("person")), entity)


# ---------------------------------------------------------------------------
# Searchability + index lookups
# ---------------------------------------------------------------------------


class _Probe:
    def __init__(self, index, refs):
        self.semantic_ref_index = index
        self.semantic_refs = refs


def test_is_conversation_searchable_matrix(refs):
    index = TermToSemanticRefIndex()
    collection = MemorySemanticRefCollection(refs)
    assert is_conversation_searchable(_Probe(index, collection))
    assert not is_conversation_searchable(_Probe(None, collection))
    assert not is_conversation_searchable(_Probe(index, None))
    assert not is_conversation_searchable(_Probe(None, None))


async def _build_term_index():
    index = TermToSemanticRefIndex()
    await index.add_term("ada", _scored(0))
    await index.add_term("person", _scored(0, 0.9))
    await index.add_term("person", _scored(1, 0.8))
    return index


async def test_lookup_term_no_scope_passthrough(refs):
    term_index = await _build_term_index()
    collection = MemorySemanticRefCollection(refs)
    hits = await lookup_term(term_index, Term("person"), collection)
    assert [h.semantic_ref_ordinal for h in hits] == [0, 1]
    assert await lookup_term(term_index, Term("ghost"), collection) in (None, [])


async def test_lookup_term_with_scope_and_ktype(refs):
    term_index = await _build_term_index()
    collection = MemorySemanticRefCollection(refs)
    scope = TextRangesInScope()
    scope.add_text_ranges(TextRangeCollection([_range(1)]))
    hits = await lookup_term(
        term_index, Term("person"), collection, scope, knowledge_type="entity"
    )
    assert [h.semantic_ref_ordinal for h in hits] == [1]
    # Wrong knowledge type: filter drops everything.
    hits = await lookup_term(
        term_index, Term("person"), collection, scope, knowledge_type="topic"
    )
    assert hits == []


async def test_lookup_term_filtered_none_when_term_missing(refs):
    term_index = await _build_term_index()
    collection = MemorySemanticRefCollection(refs)
    out = await lookup_term_filtered(
        term_index, Term("missing"), collection, lambda m, sr: True
    )
    assert out is None


async def test_lookup_knowledge_type_scans_collection(refs):
    collection = MemorySemanticRefCollection(refs)
    topics = await lookup_knowledge_type(collection, "topic")
    assert [t.semantic_ref_ordinal for t in topics] == [2]
    assert all(t.score == 1.0 for t in topics)
    entities = await lookup_knowledge_type(collection, "entity")
    assert [e.semantic_ref_ordinal for e in entities] == [0, 1, 3]


# ---------------------------------------------------------------------------
# Date-range scan edges
# ---------------------------------------------------------------------------


class _Msg:
    def __init__(self, ts):
        self.timestamp = ts
        self.text_chunks = ["x"]
        self.tags = []


class _Conv:
    def __init__(self, messages):
        self.messages = MemoryMessageCollection(list(messages))


def _drange(lo, hi):
    return DateRange(
        start=Datetime.fromisoformat(lo),
        end=Datetime.fromisoformat(hi),
    )


async def test_date_range_none_timestamps_are_skipped():
    conv = _Conv(
        [
            _Msg(None),
            _Msg("2024-03-02T00:00:00"),
            _Msg("2024-03-03T00:00:00"),
            _Msg(None),
        ]
    )
    r = await get_text_range_for_date_range(
        conv, _drange("2024-03-01T00:00:00", "2024-03-04T00:00:00")
    )
    assert (r.start.message_ordinal, r.end.message_ordinal) == (1, 3)


async def test_date_range_all_none_returns_none():
    conv = _Conv([_Msg(None), _Msg(None)])
    assert (
        await get_text_range_for_date_range(
            conv, _drange("2024-03-01T00:00:00", "2024-03-04T00:00:00")
        )
        is None
    )


async def test_date_range_single_message_hit():
    conv = _Conv(
        [
            _Msg("2024-02-01T00:00:00"),
            _Msg("2024-03-02T12:00:00"),
            _Msg("2024-04-01T00:00:00"),
        ]
    )
    r = await get_text_range_for_date_range(
        conv, _drange("2024-03-01T00:00:00", "2024-03-31T00:00:00")
    )
    assert (r.start.message_ordinal, r.end.message_ordinal) == (1, 2)


async def test_date_range_no_messages_in_range():
    conv = _Conv([_Msg("2020-01-01T00:00:00")])
    assert (
        await get_text_range_for_date_range(
            conv, _drange("2024-03-01T00:00:00", "2024-03-31T00:00:00")
        )
        is None
    )
