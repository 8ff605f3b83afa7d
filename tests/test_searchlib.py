"""searchlib term-group builders (parity: reference tests/test_searchlib.py)."""

import pytest

from typeagent_tpu.knowpro.interfaces import PropertySearchTerm, SearchTerm
from typeagent_tpu.knowpro.searchlib import (
    create_and_term_group,
    create_entity_search_term_group,
    create_multiple_choice_question,
    create_or_max_term_group,
    create_or_term_group,
    create_property_search_term,
    create_property_search_terms,
    create_search_term,
    create_search_terms,
    create_tag_search_term_group,
    create_topic_search_term_group,
)


def test_create_search_term():
    term = create_search_term("book", weight=2.0)
    assert term.term.text == "book" and term.term.weight == 2.0
    assert term.related_terms is None  # resolver may expand
    exact = create_search_term("book", exact_match_value=True)
    assert exact.related_terms == []  # expansion blocked


def test_create_property_search_term_well_known_vs_free():
    known = create_property_search_term("name", "Bach")
    assert known.property_name == "name"  # literal, not SearchTerm
    free = create_property_search_term("hue", "red")
    assert isinstance(free.property_name, SearchTerm)
    assert free.property_name.term.text == "hue"
    exact = create_property_search_term("name", "Bach", exact_match_value=True)
    assert exact.property_value.related_terms == []


def test_boolean_group_builders():
    t = create_search_term("x")
    assert create_and_term_group(t).boolean_op == "and"
    assert create_or_term_group(t).boolean_op == "or"
    assert create_or_max_term_group(t).boolean_op == "or_max"


def test_create_search_terms_with_embedded_related():
    terms = create_search_terms(["novel;book;bestseller", "JAZZ"])
    assert terms[0].term.text == "novel"
    assert [t.text for t in terms[0].related_terms] == ["book", "bestseller"]
    assert terms[1].term.text == "jazz"
    assert terms[1].related_terms is None


def test_create_property_search_terms_multi_value():
    terms = create_property_search_terms({"type": "book, movie", "name": "Bach"})
    assert len(terms) == 3
    assert [t.property_value.term.text for t in terms] == ["book", "movie", "Bach"]


def test_topic_entity_tag_groups():
    topic = create_topic_search_term_group(["music", "art"])
    assert topic.boolean_op == "or_max" and len(topic.terms) == 2
    assert all(t.property_name == "topic" for t in topic.terms)

    entity = create_entity_search_term_group(
        name="Bach", type_="person", facet_name="era", facet_value="baroque"
    )
    # facet.* are not well-known property names -> wrapped as SearchTerms
    names = [
        t.property_name if isinstance(t.property_name, str)
        else t.property_name.term.text
        for t in entity.terms
    ]
    assert names == ["name", "type", "facet.name", "facet.value"]
    assert isinstance(entity.terms[2].property_name, SearchTerm)

    tags = create_tag_search_term_group(["a"])
    assert tags.terms[0].property_name == "tag"
    # tags default to exact match
    assert tags.terms[0].property_value.related_terms == []


def test_multiple_choice_question():
    q = create_multiple_choice_question("Pick one", ["a", "b"])
    assert "Pick one" in q and "- a" in q and "- None of the above" in q
    assert create_multiple_choice_question("Q", []) == "Q"


def test_create_search_terms_semicolon_related():
    terms = create_search_terms(["novel;book;bestseller", "music"])
    assert len(terms) == 2
    assert terms[0].term.text == "novel"
    assert [t.text for t in terms[0].related_terms] == ["book", "bestseller"]
    assert terms[1].term.text == "music"
    assert terms[1].related_terms is None


def test_create_search_terms_lowercases_and_strips():
    [term] = create_search_terms(["  Novel ; BOOK "])
    assert term.term.text == "novel"
    assert [t.text for t in term.related_terms] == ["book"]


def test_create_search_terms_skips_empty():
    assert create_search_terms(["", "  ", ";"]) == []
    assert create_search_terms([";;x"])[0].term.text == "x"


def test_create_property_search_terms_comma_multivalue():
    terms = create_property_search_terms({"name": "Bach, Gould", "type": "person"})
    pairs = [(t.property_name, t.property_value.term.text) for t in terms]
    assert pairs == [("name", "Bach"), ("name", "Gould"), ("type", "person")]


def test_topic_group_exact_match_blocks_expansion():
    group = create_topic_search_term_group(["jazz", "blues"], exact_match=True)
    assert group.boolean_op == "or_max"
    assert [t.property_value.term.text for t in group.terms] == ["jazz", "blues"]
    assert all(t.property_value.related_terms == [] for t in group.terms)
    fuzzy = create_topic_search_term_group("jazz")
    assert fuzzy.terms[0].property_value.related_terms is None


def test_entity_group_includes_only_given_parts():
    def name_of(term):
        # facet.* are not well-known property names: they compile to
        # SearchTerm property names (facet-style), reference parity.
        name = term.property_name
        return name if isinstance(name, str) else name.term.text

    group = create_entity_search_term_group(name="Bach", facet_value="baroque")
    pairs = [(name_of(t), t.property_value.term.text) for t in group.terms]
    assert pairs == [("name", "Bach"), ("facet.value", "baroque")]
    assert isinstance(group.terms[0].property_name, str)
    assert isinstance(group.terms[1].property_name, SearchTerm)
    full = create_entity_search_term_group(
        name="n", type_="t", facet_name="f", facet_value="v"
    )
    assert [name_of(t) for t in full.terms] == [
        "name",
        "type",
        "facet.name",
        "facet.value",
    ]


def test_tag_group_defaults_exact():
    group = create_tag_search_term_group(["alpha", "beta"])
    assert group.boolean_op == "or_max"
    assert all(t.property_name == "tag" for t in group.terms)
    assert all(t.property_value.related_terms == [] for t in group.terms)
    fuzzy = create_tag_search_term_group(["alpha"], exact_match=False)
    assert fuzzy.terms[0].property_value.related_terms is None


def test_group_builders_shape():
    a = create_search_term("x")
    b = create_search_term("y")
    assert create_and_term_group(a, b).boolean_op == "and"
    assert create_or_term_group(a).boolean_op == "or"
    assert create_or_max_term_group().terms == []


def test_multiple_choice_question_formatting():
    text = create_multiple_choice_question("Pick one", ["A", " B "], add_none=True)
    assert "Multiple choice question:" in text
    assert "- A\n" in text and "- B\n" in text
    assert "- None of the above" in text
    no_none = create_multiple_choice_question("Pick", ["A"], add_none=False)
    assert "None of the above" not in no_none
    bare = create_multiple_choice_question("Just a question", [])
    assert bare == "Just a question"


# ---------------------------------------------------------------------------
# Reference-matrix edges (tests/test_searchlib.py there: weight+exact
# combos, all well-known names, empty/nested groups, facet-only entities)
# ---------------------------------------------------------------------------


def test_create_search_term_weight_and_exact_combos():
    t = create_search_term("bach")
    assert t.term.weight is None and t.related_terms is None
    t = create_search_term("bach", weight=2.5)
    assert t.term.weight == 2.5 and t.related_terms is None
    t = create_search_term("bach", exact_match_value=True)
    assert t.related_terms == []
    t = create_search_term("bach", weight=0.5, exact_match_value=True)
    assert t.term.weight == 0.5 and t.related_terms == []


@pytest.mark.parametrize(
    "name",
    ["name", "type", "verb", "subject", "object", "indirectObject", "tag", "topic"],
)
def test_all_well_known_property_names_stay_strings(name):
    pst = create_property_search_term(name, "v")
    assert pst.property_name == name  # not wrapped into a SearchTerm


def test_empty_term_groups():
    for builder, op in (
        (create_and_term_group, "and"),
        (create_or_term_group, "or"),
        (create_or_max_term_group, "or_max"),
    ):
        g = builder()
        assert g.boolean_op == op and g.terms == []


def test_nested_term_groups_preserve_structure():
    inner = create_or_term_group(create_search_term("a"), create_search_term("b"))
    outer = create_and_term_group(inner, create_search_term("c"))
    assert outer.boolean_op == "and"
    assert outer.terms[0] is inner
    assert outer.terms[0].terms[1].term.text == "b"


def test_entity_group_facet_value_only():
    g = create_entity_search_term_group(facet_value="harpsichord")
    assert len(g.terms) == 1
    # facet.* names are NOT well-known: they wrap into a SearchTerm.
    assert g.terms[0].property_name.term.text == "facet.value"


def test_entity_group_empty_returns_empty_or_max():
    g = create_entity_search_term_group()
    assert g.boolean_op == "or_max" and g.terms == []


def test_multiple_choice_question_empty_choices():
    q = create_multiple_choice_question("Pick one", [])
    # No choices -> the bare question, no multiple-choice scaffolding.
    assert q == "Pick one"


def test_property_search_terms_whitespace_values_filtered():
    terms = create_property_search_terms({"type": "book,  , movie"})
    values = [t.property_value.term.text for t in terms]
    assert values == ["book", "movie"]


def test_parse_degenerate_search_term_entries_drop():
    # ";", " ; ", and "" carry no main term -> dropped entirely
    # (reference pins _parse_search_term(";") -> None).
    terms = create_search_terms([";", " ; ", "", "real;alias"])
    assert [t.term.text for t in terms] == ["real"]
    assert [r.text for r in terms[0].related_terms] == ["alias"]


def test_parse_search_term_trims_embedded_whitespace():
    terms = create_search_terms(["  NOVEL ; BOOK ;  BESTSELLER  "])
    assert terms[0].term.text == "novel"
    assert [r.text for r in terms[0].related_terms] == ["book", "bestseller"]


def test_multiple_choice_question_no_none_option():
    q = create_multiple_choice_question("Pick", ["a", "b"], add_none=False)
    assert "- a\n" in q and "- b\n" in q
    assert "None of the above" not in q


def test_multiple_choice_question_strips_choice_whitespace():
    q = create_multiple_choice_question("Pick", ["  padded  ", "ok"])
    assert "- padded\n" in q
    assert "- None of the above\n" in q


async def test_get_semantic_refs_from_scored_ordinals_preserves_order():
    from typeagent_tpu.knowpro import kplib
    from typeagent_tpu.knowpro.interfaces import (
        ScoredSemanticRefOrdinal,
        SemanticRef,
        TextLocation,
        TextRange,
    )
    from typeagent_tpu.knowpro.searchlib import get_semantic_refs_from_scored_ordinals
    from typeagent_tpu.storage.memory.collections import MemorySemanticRefCollection

    refs = MemorySemanticRefCollection()
    await refs.extend(
        [
            SemanticRef(
                i, TextRange(TextLocation(i, 0)), kplib.ConcreteEntity(f"e{i}", ["t"])
            )
            for i in range(4)
        ]
    )
    scored = [
        ScoredSemanticRefOrdinal(2, 1.0),
        ScoredSemanticRefOrdinal(0, 0.8),
        ScoredSemanticRefOrdinal(3, 0.6),
    ]
    got = await get_semantic_refs_from_scored_ordinals(refs, scored)
    assert [r.semantic_ref_ordinal for r in got] == [2, 0, 3]


async def test_get_semantic_refs_from_empty_scored_list():
    from typeagent_tpu.knowpro.searchlib import get_semantic_refs_from_scored_ordinals
    from typeagent_tpu.storage.memory.collections import MemorySemanticRefCollection

    assert await get_semantic_refs_from_scored_ordinals(
        MemorySemanticRefCollection(), []
    ) == []
