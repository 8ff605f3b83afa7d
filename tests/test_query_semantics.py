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


# ---------------------------------------------------------------------------
# VM expression edges (reference test_query.py family)
# ---------------------------------------------------------------------------


async def make_context(conv):
    indexes = conv.secondary_indexes
    return QueryEvalContext(
        conv,
        indexes.property_to_semantic_ref_index,
        indexes.timestamp_index,
    )


async def test_and_expr_requires_all_terms():
    from typeagent_tpu.knowpro.query import MatchTermsAndExpr

    conv = await build_conversation()
    context = await make_context(conv)
    both = MatchTermsAndExpr(
        [
            MatchSearchTermExpr(SearchTerm(Term("bach"))),
            MatchSearchTermExpr(SearchTerm(Term("composer"))),
        ]
    )
    result = await both.eval(context)
    assert len(result) > 0
    for match in result:
        ref = await conv.semantic_refs.get_item(match.value)
        assert ref.knowledge.knowledge_type == "entity"
        assert ref.knowledge.name == "Bach"
    # One impossible term empties the whole AND.
    context2 = await make_context(conv)
    impossible = MatchTermsAndExpr(
        [
            MatchSearchTermExpr(SearchTerm(Term("bach"))),
            MatchSearchTermExpr(SearchTerm(Term("no-such-term"))),
        ]
    )
    assert len(await impossible.eval(context2)) == 0


async def test_where_semantic_ref_predicates():
    from typeagent_tpu.knowpro.query import (
        KnowledgeTypePredicate,
        MatchTermsOrExpr,
        WhereSemanticRefExpr,
    )

    conv = await build_conversation()
    context = await make_context(conv)
    source = MatchTermsOrExpr([MatchSearchTermExpr(SearchTerm(Term("bach")))])
    where = WhereSemanticRefExpr(source, [KnowledgeTypePredicate("action")])
    result = await where.eval(context)
    for match in result:
        ref = await conv.semantic_refs.get_item(match.value)
        assert ref.knowledge.knowledge_type == "action"
    # Texts survive filtering (SemanticRefAccumulator(search_term_matches)).
    assert "bach" in result.search_term_matches


async def test_group_by_knowledge_type_expr():
    from typeagent_tpu.knowpro.query import (
        GroupByKnowledgeTypeExpr,
        MatchTermsOrExpr,
    )

    conv = await build_conversation()
    context = await make_context(conv)
    groups = await GroupByKnowledgeTypeExpr(
        MatchTermsOrExpr([MatchSearchTermExpr(SearchTerm(Term("bach")))])
    ).eval(context)
    assert set(groups) >= {"entity", "action"}
    for accumulator in groups.values():
        assert accumulator.search_term_matches == {"bach"}


async def test_tag_and_topic_wildcard_exprs():
    from typeagent_tpu.knowpro.query import MatchTagExpr, MatchTopicExpr

    conv = await build_conversation()
    context = await make_context(conv)
    topics = await MatchTopicExpr(SearchTerm(Term("*"))).eval(context)
    assert topics is not None
    for match in topics:
        ref = await conv.semantic_refs.get_item(match.value)
        assert ref.knowledge.knowledge_type == "topic"
    context2 = await make_context(conv)
    tags = await MatchTagExpr(SearchTerm(Term("*"))).eval(context2)
    assert tags is None  # fixture has no tag semrefs -> empty -> None


async def test_topic_expr_ktype_gate_with_scope():
    """A topic lookup for a term that only exists as an entity name must
    return nothing (the knowledge-type gate under the always-present
    scope object)."""
    from typeagent_tpu.knowpro.query import MatchTopicExpr

    conv = await build_conversation()
    context = await make_context(conv)
    result = await MatchTopicExpr(SearchTerm(Term("bach"))).eval(context)
    assert result is None


async def test_date_range_selector_uses_timestamp_index():
    from datetime import timezone

    from typeagent_tpu.knowpro.interfaces import DateRange, Datetime
    from typeagent_tpu.knowpro.query import TextRangesInDateRangeSelector

    conv = await build_conversation()
    context = await make_context(conv)
    selector = TextRangesInDateRangeSelector(
        DateRange(
            start=Datetime(2024, 3, 1, tzinfo=timezone.utc),
            end=Datetime(2024, 3, 2, tzinfo=timezone.utc),
        )
    )
    ranges = await selector.eval(context)
    ordinals = [r.start.message_ordinal for r in ranges]
    assert ordinals == [0, 1]  # message 2 is on 2024-03-02


async def test_scope_expr_intersects_selectors():
    from typeagent_tpu.knowpro.collections import TextRangeCollection
    from typeagent_tpu.knowpro.interfaces import TextLocation, TextRange
    from typeagent_tpu.knowpro.query import GetScopeExpr, TextRangeSelector

    conv = await build_conversation()
    context = await make_context(conv)
    scope = await GetScopeExpr(
        [
            TextRangeSelector([TextRange(TextLocation(0), TextLocation(2))]),
            TextRangeSelector([TextRange(TextLocation(1), TextLocation(3))]),
        ]
    ).eval(context)
    assert scope.is_range_in_scope(TextRange(TextLocation(1)))
    assert not scope.is_range_in_scope(TextRange(TextLocation(0)))
    assert not scope.is_range_in_scope(TextRange(TextLocation(2)))


async def test_message_boolean_exprs():
    from typeagent_tpu.knowpro.query import (
        MatchMessagesAndExpr,
        MatchMessagesOrExpr,
    )

    conv = await build_conversation()
    context = await make_context(conv)
    union = await MatchMessagesOrExpr(
        [
            MatchSearchTermExpr(SearchTerm(Term("bach"))),
            MatchSearchTermExpr(SearchTerm(Term("glenn gould"))),
        ]
    ).eval(context)
    assert sorted(union.get_matched_values()) == [1, 2]
    context2 = await make_context(conv)
    both = await MatchMessagesAndExpr(
        [
            MatchSearchTermExpr(SearchTerm(Term("bach"))),
            MatchSearchTermExpr(SearchTerm(Term("glenn gould"))),
        ]
    ).eval(context2)
    assert list(both.get_matched_values()) == []  # different messages


async def test_select_top_n_knowledge_group_expr():
    from typeagent_tpu.knowpro.query import (
        GroupByKnowledgeTypeExpr,
        MatchTermsOrExpr,
        SelectTopNKnowledgeGroupExpr,
    )

    conv = await build_conversation()
    context = await make_context(conv)
    groups = await SelectTopNKnowledgeGroupExpr(
        GroupByKnowledgeTypeExpr(
            MatchTermsOrExpr(
                [
                    MatchSearchTermExpr(SearchTerm(Term("bach"))),
                    MatchSearchTermExpr(SearchTerm(Term("goldberg variations"))),
                ]
            )
        ),
        max_matches=1,
    ).eval(context)
    for accumulator in groups.values():
        assert len(accumulator) <= 1


async def test_lookup_term_filtered_none_for_missing():
    from typeagent_tpu.knowpro.interfaces import Term as CoreTerm
    from typeagent_tpu.knowpro.query import lookup_term_filtered

    conv = await build_conversation()
    result = await lookup_term_filtered(
        conv.semantic_ref_index,
        CoreTerm("no-such-term"),
        conv.semantic_refs,
        lambda meta, scored: True,
    )
    assert result is None


# ---------------------------------------------------------------------------
# Micro-unit edges from the reference's test_query.py matrix
# ---------------------------------------------------------------------------


async def test_score_booster_rescores_lookups():
    """Custom boosters rescale per-lookup scores before accumulation
    (reference query.py score_booster contract)."""
    from typeagent_tpu.knowpro.interfaces import ScoredSemanticRefOrdinal

    conv = await build_conversation()
    ctx = QueryEvalContext(
        conv,
        conv.secondary_indexes.property_to_semantic_ref_index,
        conv.secondary_indexes.timestamp_index,
    )

    def boost(search_term, semantic_ref, scored):
        return ScoredSemanticRefOrdinal(
            scored.semantic_ref_ordinal, scored.score * 7.0
        )

    plain = await MatchSearchTermExpr(SearchTerm(Term("bach"))).eval(ctx)
    ctx.clear_matched_terms()
    boosted = await MatchSearchTermExpr(
        SearchTerm(Term("bach")), score_booster=boost
    ).eval(ctx)
    assert plain is not None and boosted is not None
    plain_scores = {m.value: m.score for m in plain}
    boosted_scores = {m.value: m.score for m in boosted}
    assert set(plain_scores) == set(boosted_scores)
    for value, score in plain_scores.items():
        assert boosted_scores[value] == pytest.approx(score * 7.0)


async def test_user_property_matches_facets():
    """A free (non-well-known) property name matches facet name/value pairs:
    instrument(harpsichord) hits the Goldberg Variations entity."""
    conv = await build_conversation()
    result = await search_conversation_knowledge(
        conv,
        SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    SearchTerm(Term("instrument")),
                    SearchTerm(Term("harpsichord"), related_terms=[]),
                )
            ],
        ),
        options=SearchOptions(exact_match=True),
    )
    assert "entity" in result
    names = set()
    for m in result["entity"].semantic_ref_matches:
        sr = await conv.semantic_refs.get_item(m.semantic_ref_ordinal)
        names.add(sr.knowledge.name)
    assert "Goldberg Variations" in names


async def test_user_property_facet_value_wildcard():
    """instrument(*) matches on facet NAME alone (wildcard value skips the
    facet.value half)."""
    conv = await build_conversation()
    result = await search_conversation_knowledge(
        conv,
        SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    SearchTerm(Term("instrument")),
                    SearchTerm(Term("*"), related_terms=[]),
                )
            ],
        ),
        options=SearchOptions(exact_match=True),
    )
    assert "entity" in result
    assert result["entity"].semantic_ref_matches


async def test_user_property_wrong_facet_value_no_match():
    conv = await build_conversation()
    result = await search_conversation_knowledge(
        conv,
        SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    SearchTerm(Term("instrument")),
                    SearchTerm(Term("tuba"), related_terms=[]),
                )
            ],
        ),
        options=SearchOptions(exact_match=True),
    )
    # facet name still matches; the wrong value must not ADD matches beyond
    # the name hits, and hit counts stay at 1 (no value reinforcement).
    if "entity" in result:
        ordinals = [m.semantic_ref_ordinal for m in result["entity"].semantic_ref_matches]
        assert len(ordinals) == len(set(ordinals))


async def test_clear_matched_terms_resets_dedupe():
    conv = await build_conversation()
    ctx = QueryEvalContext(
        conv,
        conv.secondary_indexes.property_to_semantic_ref_index,
        conv.secondary_indexes.timestamp_index,
    )
    expr = MatchSearchTermExpr(SearchTerm(Term("bach")))
    first = await expr.eval(ctx)
    assert first is not None and len(ctx.matched_terms) > 0
    # Second eval in the same context is deduped away entirely.
    second = await expr.eval(ctx)
    assert second is None or not list(second)
    ctx.clear_matched_terms()
    third = await expr.eval(ctx)
    assert third is not None
    assert {m.value for m in third} == {m.value for m in first}


async def test_date_range_skips_none_timestamps():
    from datetime import datetime, timezone

    from typeagent_tpu.knowpro.interfaces import DateRange
    from typeagent_tpu.knowpro.query import get_text_range_for_date_range
    from typeagent_tpu.knowpro.universal_message import (
        ConversationMessage,
        ConversationMessageMeta,
    )

    class _Conv:
        def __init__(self, messages):
            from typeagent_tpu.storage.memory.collections import (
                MemoryMessageCollection,
            )

            self.messages = MemoryMessageCollection(list(messages))

    def m(ts):
        return ConversationMessage(
            ["x"], ConversationMessageMeta("A"), timestamp=ts
        )

    rng = DateRange(
        datetime(2024, 3, 1, tzinfo=timezone.utc),
        datetime(2024, 3, 3, tzinfo=timezone.utc),
    )
    # None timestamps are skipped; dated neighbors still bound the range.
    conv = _Conv([m(None), m("2024-03-01T10:00:00Z"), m("2024-03-02T10:00:00Z")])
    tr = await get_text_range_for_date_range(conv, rng)
    assert tr is not None
    assert (tr.start.message_ordinal, tr.end.message_ordinal) == (1, 3)
    # All-None timestamps -> no range.
    conv = _Conv([m(None), m(None)])
    assert await get_text_range_for_date_range(conv, rng) is None
