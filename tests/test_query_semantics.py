"""Query VM semantic edge cases (reference: tests/test_query.py family)."""

import pytest

from tests.test_query_pipeline import build_conversation
from typeagent_tpu.knowpro.interfaces import (
    PropertySearchTerm,
    SearchTerm,
    SearchTermGroup,
    Term,
    WhenFilter,
)
from typeagent_tpu.knowpro.query import (
    GetScoredMessagesExpr,
    MatchSearchTermExpr,
    MatchTermsOrMaxExpr,
    MessagesFromKnowledgeExpr,
    QueryEvalContext,
    RankMessagesBySimilarityExpr,
    SelectMessagesInCharBudget,
    get_matching_term_for_text,
    match_entity_name_or_type,
)
from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.search import (
    SearchOptions,
    search_conversation,
    search_conversation_knowledge,
)


async def test_or_max_keeps_only_max_hit_matches():
    conv = await build_conversation()
    # 'bach' entity matched by both terms (name + as subject-entity term);
    # 'glenn gould' matched once.
    expr = MatchTermsOrMaxExpr(
        [
            MatchSearchTermExpr(SearchTerm(Term("bach"))),
            MatchSearchTermExpr(SearchTerm(Term("composer"))),
        ]
    )
    ctx = QueryEvalContext(
        conv,
        conv.secondary_indexes.property_to_semantic_ref_index,
        conv.secondary_indexes.timestamp_index,
    )
    result = await expr.eval(ctx)
    max_hits = result.get_max_hit_count()
    assert max_hits == 2
    assert all(m.hit_count == 2 for m in result)


async def test_when_knowledge_type_filter():
    conv = await build_conversation()
    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    result = await search_conversation_knowledge(
        conv,
        group,
        WhenFilter(knowledge_type="entity"),
        SearchOptions(exact_match=True),
    )
    assert set(result) == {"entity"}
    result = await search_conversation_knowledge(
        conv,
        group,
        WhenFilter(knowledge_type="action"),
        SearchOptions(exact_match=True),
    )
    assert set(result) == {"action"}


async def test_max_knowledge_matches_caps_per_type():
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[PropertySearchTerm("topic", SearchTerm(Term("*")))],
    )
    result = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True, max_knowledge_matches=1)
    )
    assert len(result["topic"].semantic_ref_matches) == 1


async def test_message_rerank_via_subset_embedding():
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[SearchTerm(Term("Alice")), SearchTerm(Term("Bob"))],
    )
    # All 3 messages match via metadata entities; re-rank by similarity to
    # message 2's text must put message 2 first.
    result = await search_conversation(
        conv,
        group,
        options=SearchOptions(exact_match=True, max_message_matches=2),
        raw_search_query="Glenn Gould recorded them twice on piano.",
    )
    assert len(result.message_matches) == 2
    assert result.message_matches[0].message_ordinal == 2
    assert result.message_matches[0].score == pytest.approx(1.0, abs=1e-4)


async def test_char_budget_selection():
    conv = await build_conversation()
    ctx = QueryEvalContext(
        conv,
        conv.secondary_indexes.property_to_semantic_ref_index,
        conv.secondary_indexes.timestamp_index,
    )
    knowledge = await search_conversation_knowledge(
        conv,
        SearchTermGroup(
            boolean_op="or",
            terms=[SearchTerm(Term("Alice")), SearchTerm(Term("Bob"))],
        ),
        options=SearchOptions(exact_match=True),
    )
    expr = GetScoredMessagesExpr(
        SelectMessagesInCharBudget(MessagesFromKnowledgeExpr(knowledge), 40)
    )
    scored = await expr.eval(ctx)
    total_chars = 0
    for m in scored:
        message = await conv.messages.get_item(m.message_ordinal)
        total_chars += sum(len(c) for c in message.text_chunks)
    assert 0 < total_chars <= 40


def test_term_text_matching_helpers():
    st = SearchTerm(Term("Novel"), related_terms=[Term("book")])
    assert get_matching_term_for_text(st, "NOVEL").text == "Novel"
    assert get_matching_term_for_text(st, "Book").text == "book"
    assert get_matching_term_for_text(st, "poem") is None
    entity = kplib.ConcreteEntity("Gatsby", ["novel", "classic"])
    assert match_entity_name_or_type(SearchTerm(Term("gatsby")), entity)
    assert match_entity_name_or_type(SearchTerm(Term("classic")), entity)
    assert not match_entity_name_or_type(SearchTerm(Term("poem")), entity)


async def test_related_terms_expansion_through_fuzzy_index():
    """Non-exact searches resolve related terms from the fuzzy index."""
    conv = await build_conversation()
    # Index the term list into the fuzzy index with a low threshold copy.
    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    result = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=False)
    )
    # Exact matches still dominate; the query should not blow up and should
    # contain bach's entity (fuzzy threshold 0.99 keeps noise out).
    assert result and "entity" in result


async def test_search_not_searchable_conversation():
    from dataclasses import dataclass, field

    @dataclass
    class Empty:
        name_tag: str = "empty"
        tags: list = field(default_factory=list)
        messages: object = None
        semantic_refs: object = None
        semantic_ref_index: object = None
        secondary_indexes: object = None

    result = await search_conversation_knowledge(
        Empty(), SearchTermGroup(boolean_op="or", terms=[])
    )
    assert result is None
