"""Deep behavior matrix for the core data-model types in knowpro/interfaces.py.

Pins the ordering, equality, containment, and wire-format semantics the rest
of the framework (collections, scope masks, serialization) builds on.
Reference parity: /root/reference/tests/test_interfaces.py and
/root/reference/src/typeagent/knowpro/interfaces_core.py (TextRange ordering
with exclusive ends, point-range logical equivalence, half-open DateRange).
"""

import random

import pytest

from typeagent_tpu.knowpro.interfaces import (
    DateRange,
    Datetime,
    PropertySearchTerm,
    ScoredSemanticRefOrdinal,
    SearchSelectExpr,
    SearchTerm,
    SearchTermGroup,
    SemanticRef,
    SemanticRefSearchResult,
    Tag,
    Term,
    TextLocation,
    TextRange,
    Thread,
    Topic,
    WhenFilter,
)
from typeagent_tpu.knowpro import kplib


def loc(m: int, c: int = 0) -> TextLocation:
    return TextLocation(message_ordinal=m, chunk_ordinal=c)


def rng(ms: int, cs: int = 0, me: int | None = None, ce: int = 0) -> TextRange:
    end = None if me is None else loc(me, ce)
    return TextRange(start=loc(ms, cs), end=end)


# ---------------------------------------------------------------------------
# TextLocation
# ---------------------------------------------------------------------------


class TestTextLocation:
    def test_lexicographic_ordering(self):
        # message ordinal dominates; chunk ordinal breaks ties
        assert loc(1, 9) < loc(2, 0)
        assert loc(3, 1) < loc(3, 2)
        assert loc(3, 2) <= loc(3, 2)
        assert loc(4, 0) > loc(3, 99)
        assert loc(5, 5) == loc(5, 5)
        assert loc(5, 5) != loc(5, 6)

    def test_sort_order(self):
        locs = [loc(2, 1), loc(0, 3), loc(2, 0), loc(0, 0), loc(1, 7)]
        assert sorted(locs) == [loc(0, 0), loc(0, 3), loc(1, 7), loc(2, 0), loc(2, 1)]

    def test_wire_format_camel_case(self):
        data = loc(3, 7).serialize()
        assert data == {"messageOrdinal": 3, "chunkOrdinal": 7}
        assert TextLocation.deserialize(data) == loc(3, 7)

    def test_default_chunk_is_zero(self):
        assert TextLocation(message_ordinal=4) == loc(4, 0)


# ---------------------------------------------------------------------------
# TextRange equality (incl. point-range logical equivalence)
# ---------------------------------------------------------------------------

EQUALITY_CASES = [
    # (a, b, equal?)
    (rng(1, 2, 4, 5), rng(1, 2, 4, 5), True),  # identical explicit ends
    (rng(1, 2, 4, 5), rng(1, 2, 4, 6), False),  # differing explicit ends
    (rng(1, 2), rng(1, 2), True),  # identical point ranges
    (rng(1, 2), rng(4, 0), False),  # different points
    # A point range IS its single-chunk explicit expansion [c, c+1):
    (rng(3, 7), rng(3, 7, 3, 8), True),
    (rng(3, 7), rng(3, 7, 3, 9), False),  # wider explicit end
    (rng(3, 7), rng(3, 8), False),  # different start chunk
    (rng(3, 7, 3, 8), rng(3, 7, 3, 8), True),
]


class TestTextRangeEquality:
    @pytest.mark.parametrize("a,b,equal", EQUALITY_CASES)
    def test_matrix(self, a, b, equal):
        assert (a == b) is equal
        assert (b == a) is equal  # symmetric
        assert (a != b) is (not equal)

    def test_non_range_operand(self):
        assert rng(1, 2) != "not a TextRange"
        assert rng(1, 2) is not None
        assert not (rng(1, 2) == 17)


# ---------------------------------------------------------------------------
# TextRange ordering
# ---------------------------------------------------------------------------


class TestTextRangeOrdering:
    def test_start_dominates(self):
        a, b = rng(1, 2, 4, 5), rng(2, 3, 5, 6)
        assert a < b and b > a and a <= a and b >= b

    def test_point_sorts_before_wider_range_at_same_start(self):
        point = rng(1, 2)  # effective end (1, 3)
        wide = rng(1, 2, 4, 5)
        assert point < wide
        assert wide > point
        assert point <= wide and not (point >= wide)

    def test_point_equals_its_expansion_in_every_operator(self):
        point = rng(3, 7)
        expansion = rng(3, 7, 3, 8)
        assert point <= expansion and point >= expansion
        assert not (point < expansion) and not (point > expansion)

    def test_total_sort_with_mixed_none_ends(self):
        ranges = [
            rng(2, 0, 3, 0),
            rng(0, 5),
            rng(0, 5, 0, 9),
            rng(0, 0),
            rng(2, 0),
            rng(0, 5, 2, 0),
        ]
        random.Random(7).shuffle(ranges)
        ordered = sorted(ranges)
        assert ordered == [
            rng(0, 0),
            rng(0, 5),  # point: effective end (0, 6)
            rng(0, 5, 0, 9),
            rng(0, 5, 2, 0),
            rng(2, 0),  # point at message 2
            rng(2, 0, 3, 0),
        ]


# ---------------------------------------------------------------------------
# TextRange containment (end exclusive)
# ---------------------------------------------------------------------------

CONTAINS_CASES = [
    # (outer, inner, contained?)
    (rng(0, 0, 10, 0), rng(2, 0, 3, 0), True),  # strict interior
    (rng(0, 0, 10, 0), rng(0, 0, 10, 0), True),  # self
    (rng(0, 0, 10, 0), rng(9, 9), True),  # point before exclusive end
    (rng(0, 0, 10, 0), rng(10, 0), False),  # point AT exclusive end
    (rng(2, 0, 3, 0), rng(1, 9), False),  # starts before outer
    (rng(2, 0, 3, 0), rng(2, 0, 3, 1), False),  # overhangs outer end
    (rng(5, 0), rng(5, 0), True),  # point contains itself
    (rng(5, 0), rng(5, 0, 5, 1), True),  # ... and its expansion
    (rng(5, 0), rng(5, 1), False),  # next chunk is outside a point
    (rng(5, 0, 6, 0), rng(5, 3), True),  # chunk point inside message span
]


class TestTextRangeContains:
    @pytest.mark.parametrize("outer,inner,contained", CONTAINS_CASES)
    def test_matrix(self, outer, inner, contained):
        assert (inner in outer) is contained

    def test_containment_is_transitive(self):
        a, b, c = rng(0, 0, 10, 0), rng(2, 0, 8, 0), rng(3, 0, 4, 0)
        assert b in a and c in b and c in a


# ---------------------------------------------------------------------------
# TextRange wire format
# ---------------------------------------------------------------------------


class TestTextRangeSerialization:
    def test_explicit_end(self):
        data = rng(1, 2, 4, 5).serialize()
        assert data == {
            "start": {"messageOrdinal": 1, "chunkOrdinal": 2},
            "end": {"messageOrdinal": 4, "chunkOrdinal": 5},
        }
        assert TextRange.deserialize(data) == rng(1, 2, 4, 5)

    def test_none_end_is_omitted(self):
        data = rng(3, 7).serialize()
        assert data == {"start": {"messageOrdinal": 3, "chunkOrdinal": 7}}
        restored = TextRange.deserialize(data)
        assert restored.end is None
        assert restored == rng(3, 7)


# ---------------------------------------------------------------------------
# DateRange
# ---------------------------------------------------------------------------


class TestDateRange:
    def test_half_open(self):
        dr = DateRange(start=Datetime(2025, 1, 1), end=Datetime(2025, 1, 10))
        assert Datetime(2025, 1, 1) in dr  # inclusive start
        assert Datetime(2025, 1, 5, 12, 30) in dr
        assert Datetime(2025, 1, 9, 23, 59, 59, 999999) in dr
        assert Datetime(2025, 1, 10) not in dr  # exclusive end
        assert Datetime(2024, 12, 31, 23, 59, 59) not in dr

    def test_none_end_unbounded_above(self):
        dr = DateRange(start=Datetime(2025, 1, 1))
        assert Datetime(2025, 1, 1) in dr
        assert Datetime(2099, 12, 31) in dr
        assert Datetime(2024, 12, 31) not in dr


# ---------------------------------------------------------------------------
# SemanticRef round-trips, one per knowledge type
# ---------------------------------------------------------------------------


def _entity() -> kplib.ConcreteEntity:
    return kplib.ConcreteEntity(
        name="Johann Sebastian Bach",
        type=["person", "composer"],
        facets=[kplib.Facet(name="era", value="baroque")],
    )


def _action() -> kplib.Action:
    return kplib.Action(
        verbs=["compose"],
        verb_tense="past",
        subject_entity_name="Bach",
        object_entity_name="fugue",
        indirect_object_entity_name="none",
    )


SEMREF_CASES = [
    ("entity", _entity()),
    ("action", _action()),
    ("topic", Topic(text="counterpoint")),
    ("tag", Tag(text="music-history")),
]


class TestSemanticRefSerialization:
    @pytest.mark.parametrize("ktype,knowledge", SEMREF_CASES)
    def test_round_trip(self, ktype, knowledge):
        ref = SemanticRef(
            semantic_ref_ordinal=42, range=rng(1, 0, 2, 0), knowledge=knowledge
        )
        data = ref.serialize()
        assert data["semanticRefOrdinal"] == 42
        assert data["knowledgeType"] == ktype
        restored = SemanticRef.deserialize(data)
        assert restored.semantic_ref_ordinal == 42
        assert restored.range == ref.range
        assert restored.knowledge.knowledge_type == ktype
        assert restored.knowledge == knowledge

    def test_entity_wire_fields_are_camel_case(self):
        ref = SemanticRef(
            semantic_ref_ordinal=0, range=rng(0, 0), knowledge=_action()
        )
        k = ref.serialize()["knowledge"]
        assert k["subjectEntityName"] == "Bach"
        assert k["objectEntityName"] == "fugue"
        assert k["indirectObjectEntityName"] == "none"
        assert k["verbTense"] == "past"


class TestThreadSerialization:
    def test_round_trip(self):
        thread = Thread(
            description="opening banter", ranges=[rng(0, 0, 3, 0), rng(7, 0)]
        )
        restored = Thread.deserialize(thread.serialize())
        assert restored.description == "opening banter"
        assert list(restored.ranges) == [rng(0, 0, 3, 0), rng(7, 0)]


# ---------------------------------------------------------------------------
# Search expression construction semantics
# ---------------------------------------------------------------------------


class TestSearchExpressionTypes:
    def test_search_term_related_semantics(self):
        # None = resolver MAY expand; [] = expansion explicitly disabled.
        assert SearchTerm(term=Term("book")).related_terms is None
        assert SearchTerm(term=Term("book"), related_terms=[]).related_terms == []

    def test_term_weight_optional_and_hashable(self):
        t = Term("novel", weight=0.8)
        assert t.text == "novel" and t.weight == 0.8
        assert Term("novel").weight is None
        assert len({Term("a"), Term("a"), Term("b")}) >= 2  # usable in sets

    def test_property_search_term_well_known_and_free_form(self):
        well_known = PropertySearchTerm("name", SearchTerm(term=Term("Bach")))
        assert well_known.property_name == "name"
        free = PropertySearchTerm(
            SearchTerm(term=Term("hue")), SearchTerm(term=Term("red"))
        )
        assert isinstance(free.property_name, SearchTerm)
        assert free.property_name.term.text == "hue"

    def test_group_default_terms_not_shared_between_instances(self):
        g1 = SearchTermGroup(boolean_op="or")
        g2 = SearchTermGroup(boolean_op="and")
        g1.terms.append(SearchTerm(term=Term("x")))
        assert g2.terms == []  # no shared mutable default

    def test_groups_nest(self):
        inner = SearchTermGroup(boolean_op="and", terms=[SearchTerm(term=Term("a"))])
        outer = SearchTermGroup(boolean_op="or_max", terms=[inner])
        assert outer.terms[0] is inner
        assert outer.boolean_op == "or_max"

    def test_when_filter_defaults_all_none(self):
        w = WhenFilter()
        assert (
            w.knowledge_type is None
            and w.date_range is None
            and w.thread_description is None
            and w.tags is None
            and w.scope_defining_terms is None
            and w.text_ranges_in_scope is None
        )

    def test_select_expr(self):
        group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(term=Term("x"))])
        expr = SearchSelectExpr(search_term_group=group)
        assert expr.when is None
        expr2 = SearchSelectExpr(
            search_term_group=group, when=WhenFilter(knowledge_type="entity")
        )
        assert expr2.when.knowledge_type == "entity"

    def test_search_result_shape(self):
        res = SemanticRefSearchResult(
            term_matches={"bach"},
            semantic_ref_matches=[ScoredSemanticRefOrdinal(3, 1.5)],
        )
        assert res.term_matches == {"bach"}
        assert res.semantic_ref_matches[0].semantic_ref_ordinal == 3
        assert res.semantic_ref_matches[0].score == 1.5

    def test_scored_ordinal_round_trip(self):
        s = ScoredSemanticRefOrdinal(7, 2.25)
        data = s.serialize()
        assert data == {"semanticRefOrdinal": 7, "score": 2.25}
        restored = ScoredSemanticRefOrdinal.deserialize(data)
        assert restored.semantic_ref_ordinal == 7 and restored.score == 2.25
