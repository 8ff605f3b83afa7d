"""searchlib term-group builders (parity: reference tests/test_searchlib.py)."""

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
