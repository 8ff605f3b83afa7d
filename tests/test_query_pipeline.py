"""Query pipeline: accumulator math, compiler shapes, end-to-end search."""

from dataclasses import dataclass, field

import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.collections import (
    MatchAccumulator,
    MessageAccumulator,
    SemanticRefAccumulator,
    TextRangeCollection,
    TextRangesInScope,
    get_smooth_score,
)
from typeagent_tpu.knowpro.convsettings import (
    MessageTextIndexSettings,
    RelatedTermIndexSettings,
)
from typeagent_tpu.knowpro.interfaces import (
    PropertySearchTerm,
    ScoredSemanticRefOrdinal,
    SearchTerm,
    SearchTermGroup,
    SemanticRef,
    Term,
    TextLocation,
    TextRange,
    WhenFilter,
)
from typeagent_tpu.knowpro.propindex import build_property_index
from typeagent_tpu.knowpro.search import (
    SearchOptions,
    search_conversation,
    search_conversation_knowledge,
)
from typeagent_tpu.knowpro.searchlang import (
    LanguageQueryCompileOptions,
    SearchQueryCompiler,
    compile_search_query,
    date_range_from_datetime_range,
)
from typeagent_tpu.knowpro.search_query_schema import (
    ActionTerm,
    EntityTerm,
    SearchExpr,
    SearchFilter,
    SearchQuery,
    VerbsTerm,
)
from typeagent_tpu.knowpro.date_time_schema import DateTime, DateTimeRange, DateVal
from typeagent_tpu.knowpro.secindex import ConversationSecondaryIndexes
from typeagent_tpu.knowpro.semrefindex import add_metadata_to_index_from_list
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.storage.memory import MemoryStorageProvider
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings


# ---------------------------------------------------------------------------
# Accumulator math
# ---------------------------------------------------------------------------


def test_match_accumulator_exact_vs_related():
    acc = MatchAccumulator()
    acc.add("a", 1.0, True)
    acc.add("a", 2.0, True)
    acc.add("a", 0.5, False)
    m = acc.get_match("a")
    assert m.hit_count == 2 and m.score == 3.0
    assert m.related_hit_count == 1 and m.related_score == 0.5
    # related-only values keep hit_count 0
    acc.add("b", 0.9, False)
    assert acc.get_match("b").hit_count == 0
    assert acc.get_max_hit_count() == 2


def test_smooth_score():
    import math

    assert get_smooth_score(5.0, 1) == 5.0
    assert get_smooth_score(6.0, 2) == pytest.approx(math.log(3) * 3.0)
    assert get_smooth_score(0.0, 0) == 0.0


def test_total_score_folds_related():
    import math

    acc = MatchAccumulator()
    acc.add("x", 10.0, True)
    acc.add("x", 4.0, False)
    acc.add("x", 4.0, False)
    acc.calculate_total_score()
    # 10 + log(3) * (8/2)
    assert acc.get_match("x").score == pytest.approx(10.0 + math.log(3) * 4.0)


def test_top_n_and_hit_count_filters():
    acc = MatchAccumulator()
    for i, score in enumerate([5.0, 3.0, 8.0, 1.0]):
        acc.add(i, score, True)
    acc.add(2, 1.0, True)  # ordinal 2 now has 2 hits, score 9
    top2 = acc.get_top_n_scoring(2)
    assert [m.value for m in top2] == [2, 0]
    assert len(acc.get_with_hit_count(2)) == 1
    assert acc.select_top_n_scoring(1) == 1
    assert [m.value for m in acc] == [2]


def test_message_accumulator_max_merge():
    acc = MessageAccumulator()
    acc.add(7, 0.5)
    acc.add(7, 0.3)  # lower: ignored
    m = acc.get_match(7)
    assert m.score == 0.5 and m.hit_count == 1
    acc.add(7, 0.9)  # higher: replaces, bumps hits
    assert m.score == 0.9 and m.hit_count == 2


def test_text_ranges_scope_intersection():
    def r(start, end=None):
        return TextRange(
            TextLocation(start), TextLocation(end) if end is not None else None
        )

    sel1 = TextRangeCollection([r(0, 10)])
    sel2 = TextRangeCollection([r(5, 8)])
    scope = TextRangesInScope()
    scope.add_text_ranges(sel1)
    scope.add_text_ranges(sel2)
    assert scope.is_range_in_scope(r(6))
    assert not scope.is_range_in_scope(r(3))  # rejected by sel2
    assert not scope.is_range_in_scope(r(12))  # rejected by both


# ---------------------------------------------------------------------------
# Conversation fixture (memory provider backed)
# ---------------------------------------------------------------------------


@dataclass
class FakeConversation:
    name_tag: str = "test"
    tags: list = field(default_factory=list)
    messages: object = None
    semantic_refs: object = None
    semantic_ref_index: object = None
    secondary_indexes: object = None


async def build_conversation():
    model = create_test_embedding_model(24)
    provider = MemoryStorageProvider(
        message_text_settings=MessageTextIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0)
        ),
        related_terms_settings=RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0, max_matches=5)
        ),
    )
    conv = FakeConversation(
        messages=provider.messages,
        semantic_refs=provider.semantic_refs,
        semantic_ref_index=provider.semantic_ref_index,
        secondary_indexes=ConversationSecondaryIndexes(provider),
    )
    messages = [
        ConversationMessage(
            ["I love the Goldberg Variations."],
            ConversationMessageMeta("Alice", ["Bob"]),
            timestamp="2024-03-01T10:00:00Z",
        ),
        ConversationMessage(
            ["Bach composed the Goldberg Variations for harpsichord."],
            ConversationMessageMeta("Bob", ["Alice"]),
            timestamp="2024-03-01T10:01:00Z",
        ),
        ConversationMessage(
            ["Glenn Gould recorded them twice on piano."],
            ConversationMessageMeta("Alice", ["Bob"]),
            timestamp="2024-03-02T09:00:00Z",
        ),
    ]
    await provider.messages.extend(messages)
    await add_metadata_to_index_from_list(
        messages, provider.semantic_refs, provider.semantic_ref_index, 0
    )
    # Hand-added knowledge semrefs (as LLM extraction would produce).
    from typeagent_tpu.knowpro.semrefindex import (
        add_knowledge_batch_to_semantic_ref_index,
    )

    knowledge = kplib.KnowledgeResponse(
        entities=[
            kplib.ConcreteEntity("Bach", ["person", "composer"]),
            kplib.ConcreteEntity(
                "Goldberg Variations",
                ["music", "composition"],
                facets=[kplib.Facet("instrument", "harpsichord")],
            ),
        ],
        actions=[
            kplib.Action(
                verbs=["compose"],
                verb_tense="past",
                subject_entity_name="Bach",
                object_entity_name="Goldberg Variations",
            )
        ],
        inverse_actions=[],
        topics=["classical music"],
    )
    await add_knowledge_batch_to_semantic_ref_index(conv, [(1, 0, knowledge)])
    knowledge2 = kplib.KnowledgeResponse(
        entities=[kplib.ConcreteEntity("Glenn Gould", ["person", "pianist"])],
        actions=[
            kplib.Action(
                verbs=["record"],
                verb_tense="past",
                subject_entity_name="Glenn Gould",
                object_entity_name="Goldberg Variations",
            )
        ],
        inverse_actions=[],
        topics=["piano performance"],
    )
    await add_knowledge_batch_to_semantic_ref_index(conv, [(2, 0, knowledge2)])
    await build_property_index(conv)
    from typeagent_tpu.storage.memory.indexes import add_to_timestamp_index

    await add_to_timestamp_index(provider.timestamp_index, provider.messages, 0)
    from typeagent_tpu.storage.memory.reltermsindex import build_related_terms_index

    await build_related_terms_index(
        conv,
        RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.99, max_matches=3)
        ),
    )
    return conv


async def test_search_conversation_term_match():
    conv = await build_conversation()
    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    result = await search_conversation(
        conv, group, options=SearchOptions(exact_match=True)
    )
    assert result is not None
    assert "entity" in result.knowledge_matches
    assert result.knowledge_matches["entity"].semantic_ref_matches
    # exact-match path skips validate/prepare, so the original case survives
    assert "Bach" in result.knowledge_matches["entity"].term_matches
    assert "action" in result.knowledge_matches  # Bach-as-subject semref
    # entity matches on name get the x10 boost over plain matches
    assert result.message_matches


async def test_search_property_term():
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[
            PropertySearchTerm("name", SearchTerm(Term("Bach"), related_terms=[]))
        ],
    )
    result = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True)
    )
    assert result and "entity" in result
    # All matched semrefs must actually be the Bach entity
    for scored in result["entity"].semantic_ref_matches:
        sr = await conv.semantic_refs.get_item(scored.semantic_ref_ordinal)
        assert sr.knowledge.name == "Bach"


async def test_search_with_date_range_scope():
    conv = await build_conversation()
    from datetime import datetime, timezone

    from typeagent_tpu.knowpro.interfaces import DateRange

    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Glenn Gould"))])
    # Scope to day 1 only: Glenn Gould knowledge is on day 2 -> no matches.
    when = WhenFilter(
        date_range=DateRange(
            datetime(2024, 3, 1, tzinfo=timezone.utc),
            datetime(2024, 3, 2, tzinfo=timezone.utc),
        )
    )
    result = await search_conversation_knowledge(
        conv, group, when, SearchOptions(exact_match=True)
    )
    assert not result or not result.get("entity")
    # Widen to include day 2 -> matches appear.
    when2 = WhenFilter(
        date_range=DateRange(
            datetime(2024, 3, 1, tzinfo=timezone.utc),
            datetime(2024, 3, 3, tzinfo=timezone.utc),
        )
    )
    result = await search_conversation_knowledge(
        conv, group, when2, SearchOptions(exact_match=True)
    )
    assert result and result["entity"].semantic_ref_matches


async def test_and_group_requires_all_terms():
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="and",
        terms=[SearchTerm(Term("Bach")), SearchTerm(Term("nonexistent-term-xyz"))],
    )
    result = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True)
    )
    assert not result  # AND fails if any term has no matches


async def test_or_max_keeps_max_hit_count():
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or_max",
        terms=[SearchTerm(Term("Bach")), SearchTerm(Term("harpsichord"))],
    )
    result = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True)
    )
    assert result  # should not blow up; Bach entity matched by both? at least present


async def test_topic_wildcard():
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[PropertySearchTerm("topic", SearchTerm(Term("*")))],
    )
    result = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True)
    )
    assert result and "topic" in result
    assert len(result["topic"].semantic_ref_matches) == 2


# ---------------------------------------------------------------------------
# searchlang compiler shapes
# ---------------------------------------------------------------------------


def entity(name, types=None, facets=None, pronoun=False):
    return EntityTerm(name=name, is_name_pronoun=pronoun, type=types, facets=facets)


async def test_compile_entity_terms_shapes():
    conv = await build_conversation()
    compiler = SearchQueryCompiler(conv)
    filter = SearchFilter(
        entity_search_terms=[entity("Bach", ["person", "composer"])]
    )
    group = compiler.compile_term_group(filter)
    assert group.boolean_op == "or"
    # First term: or_max group of name/type property terms
    or_max = group.terms[0]
    assert isinstance(or_max, SearchTermGroup) and or_max.boolean_op == "or_max"
    names = [t.property_name for t in or_max.terms]
    assert names == ["name", "type", "type"]
    # Plus the entity name as a topic property term
    topic_terms = [
        t
        for t in group.terms[1:]
        if isinstance(t, PropertySearchTerm) and t.property_name == "topic"
    ]
    assert len(topic_terms) == 1


async def test_compile_summary_filter_gets_topic_wildcard():
    conv = await build_conversation()
    compiler = SearchQueryCompiler(conv)
    group = compiler.compile_term_group(SearchFilter())
    assert len(group.terms) == 1
    term = group.terms[0]
    assert isinstance(term, PropertySearchTerm)
    assert term.property_name == "topic" and term.property_value.term.text == "*"


async def test_compile_action_scope_and_fallback():
    conv = await build_conversation()
    action = ActionTerm(
        actor_entities=[entity("Bach")],
        is_informational=False,
        action_verbs=VerbsTerm(words=["compose"], tense="Past"),
        target_entities=[entity("Goldberg Variations")],
    )
    query = SearchQuery(
        search_expressions=[
            SearchExpr(
                rewritten_query="What did Bach compose?",
                filters=[SearchFilter(action_search_term=action)],
            )
        ]
    )
    exprs = compile_search_query(conv, query)
    assert len(exprs) == 1
    select = exprs[0].select_expressions[0]
    assert select.when is not None and select.when.scope_defining_terms is not None
    scope = select.when.scope_defining_terms
    # Scope contains subject + verb terms
    flat = _flatten_props(scope)
    assert ("subject", "Bach") in flat
    assert ("verb", "compose") in flat
    # Verbless fallback compile drops the verb terms
    exprs_nv = compile_search_query(
        conv, query, LanguageQueryCompileOptions(verb_scope=False)
    )
    flat_nv = _flatten_props(
        exprs_nv[0].select_expressions[0].when.scope_defining_terms
    )
    assert ("subject", "Bach") in flat_nv
    assert all(name != "verb" for name, _ in flat_nv)


def _flatten_props(group):
    out = []
    for t in group.terms:
        if isinstance(t, SearchTermGroup):
            out.extend(_flatten_props(t))
        elif isinstance(t, PropertySearchTerm):
            out.append((t.property_name if isinstance(t.property_name, str) else t.property_name.term.text, t.property_value.term.text))
    return out


async def test_informational_action_gets_no_scope():
    conv = await build_conversation()
    action = ActionTerm(
        actor_entities=[entity("Mia")],
        is_informational=True,
    )
    compiler = SearchQueryCompiler(conv)
    when = compiler.compile_when(SearchFilter(action_search_term=action))
    assert when is None


def test_date_range_rolls_bare_stop_date():
    rng = date_range_from_datetime_range(
        DateTimeRange(
            start_date=DateTime(date=DateVal(day=1, month=1, year=2024)),
            stop_date=DateTime(date=DateVal(day=5, month=1, year=2024)),
        )
    )
    assert rng.start.day == 1
    assert rng.end.day == 6  # exclusive: whole of Jan 5 included


def test_noise_terms_filtered():
    compiler = SearchQueryCompiler(FakeConversation())
    group = SearchTermGroup("or")
    compiler.add_property_term_to_group("type", "thing", group)
    compiler.add_property_term_to_group("type", "book", group)
    assert len(group.terms) == 1


async def test_compile_entity_facets_become_property_terms():
    """Facets compile to facet.name/facet.value property pairs plus topic
    terms for concrete facet values (searchlang.py compile rules)."""
    from typeagent_tpu.knowpro.search_query_schema import FacetTerm

    conv = await build_conversation()
    compiler = SearchQueryCompiler(conv)
    filter = SearchFilter(
        entity_search_terms=[
            entity("Bach", facets=[FacetTerm(facet_name="era", facet_value="baroque")])
        ]
    )
    group = compiler.compile_term_group(filter)
    flat = _flatten_props(group.terms[0])
    assert ("name", "Bach") in flat
    assert ("era", "baroque") in flat
    # Concrete facet value also matches as a topic at the group level.
    topics = [
        t.property_value.term.text
        for t in group.terms
        if isinstance(t, PropertySearchTerm) and t.property_name == "topic"
    ]
    assert "baroque" in topics


async def test_compile_wildcard_facet_value_skipped_as_topic():
    from typeagent_tpu.knowpro.search_query_schema import FacetTerm

    conv = await build_conversation()
    compiler = SearchQueryCompiler(conv)
    filter = SearchFilter(
        entity_search_terms=[
            entity("Bach", facets=[FacetTerm(facet_name="era", facet_value="*")])
        ]
    )
    group = compiler.compile_term_group(filter)
    topics = [
        t.property_value.term.text
        for t in group.terms
        if isinstance(t, PropertySearchTerm) and t.property_name == "topic"
    ]
    assert "*" not in topics


async def test_compile_pronoun_entities_excluded_from_search_terms():
    """Pronoun entities ('we', 'I') must not become search terms."""
    conv = await build_conversation()
    compiler = SearchQueryCompiler(conv)
    group = SearchTermGroup(boolean_op="or", terms=[])
    compiler.add_entity_term_as_search_terms_to_group(
        entity("we", pronoun=True), group
    )
    assert group.terms == []
    compiler.add_entity_term_as_search_terms_to_group(entity("Bach"), group)
    assert [t.term.text for t in group.terms] == ["Bach"]


async def test_compile_additional_entities_in_action():
    """'Did Jane speak about Bach with Nina' — additional entities compile
    into the action group."""
    conv = await build_conversation()
    action = ActionTerm(
        actor_entities=[entity("Jane")],
        is_informational=False,
        action_verbs=VerbsTerm(words=["speak"], tense="Past"),
        additional_entities=[entity("Bach")],
    )
    compiler = SearchQueryCompiler(conv)
    group = compiler.compile_term_group(SearchFilter(action_search_term=action))
    texts = set()
    def collect(g):
        for t in g.terms:
            if isinstance(t, SearchTermGroup):
                collect(t)
            elif isinstance(t, PropertySearchTerm):
                texts.add(t.property_value.term.text)
            else:
                texts.add(t.term.text)
    collect(group)
    assert "Bach" in texts


def test_optimize_or_max_unwraps_single_term():
    from typeagent_tpu.knowpro.searchlang import optimize_or_max

    single = SearchTermGroup(boolean_op="or_max", terms=[SearchTerm(Term("x"))])
    assert optimize_or_max(single) is single.terms[0]
    multi = SearchTermGroup(
        boolean_op="or_max", terms=[SearchTerm(Term("x")), SearchTerm(Term("y"))]
    )
    assert optimize_or_max(multi) is multi


async def test_facet_search_via_query_vm():
    """Free-form (SearchTerm) property names match facet names; a concrete
    value must also match the facet value (query.py facet VM rules)."""
    conv = await build_conversation()
    # instrument(harpsichord) -> the Goldberg Variations entity
    group = SearchTermGroup(
        boolean_op="and",
        terms=[
            PropertySearchTerm(
                SearchTerm(Term("instrument"), related_terms=[]),
                SearchTerm(Term("harpsichord"), related_terms=[]),
            )
        ],
    )
    result = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True)
    )
    assert result and "entity" in result
    sr = await conv.semantic_refs.get_item(
        result["entity"].semantic_ref_matches[0].semantic_ref_ordinal
    )
    assert sr.knowledge.name == "Goldberg Variations"
    # Wrong value still matches via the facet NAME (reference semantics:
    # name and value matches accumulate together), but scores strictly
    # below the correct-value query which hits both postings.
    right_score = result["entity"].semantic_ref_matches[0].score
    wrong = SearchTermGroup(
        boolean_op="and",
        terms=[
            PropertySearchTerm(
                SearchTerm(Term("instrument"), related_terms=[]),
                SearchTerm(Term("violin"), related_terms=[]),
            )
        ],
    )
    wrong_result = await search_conversation_knowledge(
        conv, wrong, options=SearchOptions(exact_match=True)
    )
    assert wrong_result["entity"].semantic_ref_matches[0].score < right_score
    # Wildcard value: any entity having the facet name matches.
    wildcard = SearchTermGroup(
        boolean_op="or",
        terms=[
            PropertySearchTerm(
                SearchTerm(Term("instrument"), related_terms=[]),
                SearchTerm(Term("*")),
            )
        ],
    )
    result = await search_conversation_knowledge(
        conv, wildcard, options=SearchOptions(exact_match=True)
    )
    assert result and "entity" in result


async def test_thread_scope_when_filter():
    """WhenFilter.thread_description scopes matches to the thread's ranges.

    One thread per conversation: the fake hash embedder has no semantics, so
    multiple thread descriptions can fuzzily cross-match above threshold.
    """
    from typeagent_tpu.knowpro.interfaces import Thread

    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])

    # Thread covering only message 0 — the Bach knowledge (message 1) is out.
    conv = await build_conversation()
    await conv.secondary_indexes.threads.add_thread(
        Thread("intro pleasantries", [TextRange(TextLocation(0), TextLocation(1))])
    )
    scoped_out = await search_conversation_knowledge(
        conv,
        group,
        when_filter=WhenFilter(thread_description="intro pleasantries"),
        options=SearchOptions(exact_match=True),
    )
    assert not scoped_out

    # Thread covering messages 1-2 — Bach is in scope.
    conv2 = await build_conversation()
    await conv2.secondary_indexes.threads.add_thread(
        Thread(
            "the recording discussion",
            [TextRange(TextLocation(1), TextLocation(3))],
        )
    )
    scoped_in = await search_conversation_knowledge(
        conv2,
        group,
        when_filter=WhenFilter(thread_description="the recording discussion"),
        options=SearchOptions(exact_match=True),
    )
    assert scoped_in and "entity" in scoped_in


async def test_tags_when_filter_scopes_by_tag_ranges():
    """WhenFilter.tags compiles a tag scope selector."""
    from typeagent_tpu.knowpro.interfaces import SemanticRef, Tag

    conv = await build_conversation()
    # Tag message 1 (where the Bach knowledge lives).
    ordinal = await conv.semantic_refs.size()
    await conv.semantic_refs.append(
        SemanticRef(
            ordinal,
            TextRange(TextLocation(1)),
            Tag(text="music-history"),
        )
    )
    await conv.semantic_ref_index.add_term("music-history", ordinal)
    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    tagged = await search_conversation_knowledge(
        conv,
        group,
        when_filter=WhenFilter(tags=["music-history"]),
        options=SearchOptions(exact_match=True),
    )
    assert tagged and "entity" in tagged
    untagged = await search_conversation_knowledge(
        conv,
        group,
        when_filter=WhenFilter(tags=["nonexistent-tag"]),
        options=SearchOptions(exact_match=True),
    )
    assert not untagged


def test_accumulator_union_and_intersect_semantics():
    a = MatchAccumulator()
    a.add("x", 2.0, True)
    a.add("y", 1.0, True)
    b = MatchAccumulator()
    b.add("x", 3.0, True)
    b.add("x", 0.5, False)
    b.add("z", 4.0, True)
    # Union folds matching values' exact AND related tallies.
    a.add_union(b)
    x = a.get_match("x")
    assert (x.score, x.hit_count, x.related_score, x.related_hit_count) == (
        5.0, 2, 0.5, 1,
    )
    assert {m.value for m in a} == {"x", "y", "z"}

    # Intersect keeps only shared values, combining tallies into the left.
    left = MatchAccumulator()
    left.add("p", 1.0, True)
    left.add("q", 2.0, True)
    right = MatchAccumulator()
    right.add("q", 3.0, True)
    out = MatchAccumulator()
    left.intersect(right, out)
    assert [m.value for m in out] == ["q"]
    assert out.get_match("q").score == 5.0 and out.get_match("q").hit_count == 2


def test_semref_accumulator_intersect_merges_term_matches():
    a = SemanticRefAccumulator({"alpha"})
    a.add(1, 1.0, True)
    b = SemanticRefAccumulator({"beta"})
    b.add(1, 2.0, True)
    out = a.intersect(b)
    assert out.search_term_matches == {"alpha", "beta"}
    # Empty intersection keeps term sets empty.
    c = SemanticRefAccumulator({"gamma"})
    c.add(99, 1.0, True)
    empty = a.intersect(c)
    assert len(empty) == 0 and empty.search_term_matches == set()


def test_text_range_collection_dedupe_and_point_containment():
    def r(start, end=None):
        return TextRange(
            TextLocation(start), TextLocation(end) if end is not None else None
        )

    ranges = TextRangeCollection(ensure_sorted=True)
    assert ranges.add_range(r(5, 10)) is True
    assert ranges.add_range(r(5, 10)) is False  # exact duplicate rejected
    assert ranges.add_range(r(0, 3)) is True
    assert len(ranges) == 2
    # Sorted insertion order maintained.
    assert [x.start.message_ordinal for x in ranges] == [0, 5]
    # Point range (end=None) containment.
    assert ranges.contains_range(r(7))
    assert ranges.contains_range(r(2))
    assert not ranges.contains_range(r(3))  # half-open: [0,3) excludes 3
    assert not ranges.contains_range(r(4))


def test_top_n_collection_rank_and_overflow():
    from typeagent_tpu.knowpro.collections import TopNCollection

    top = TopNCollection(3)
    for item, score in [("a", 1.0), ("b", 5.0), ("c", 3.0), ("d", 4.0), ("e", 0.5)]:
        top.push(item, score)
    assert top.values_by_rank() == ["b", "d", "c"]
    assert len(top) == 3


async def test_char_budget_counts_whole_messages():
    from typeagent_tpu.knowpro.collections import (
        get_count_of_messages_in_char_budget,
    )

    conv = await build_conversation()
    sizes = []
    for i in range(3):
        m = await conv.messages.get_item(i)
        sizes.append(sum(len(c) for c in m.text_chunks))
    # Budget for exactly the first two messages: the third must not fit.
    budget = sizes[0] + sizes[1]
    n = await get_count_of_messages_in_char_budget(conv.messages, [0, 1, 2], budget)
    assert n == 2
    # A budget one char short of the first message fits none.
    n = await get_count_of_messages_in_char_budget(conv.messages, [0], sizes[0] - 1)
    assert n == 0


def test_text_range_ordering_properties():
    """TextRange/TextLocation comparisons back bisect-based scope math:
    total order, half-open containment, end=None point semantics."""
    import random

    def loc(m, c=0):
        return TextLocation(m, c)

    rng = random.Random(7)
    locations = [loc(rng.randrange(10), rng.randrange(4)) for _ in range(50)]
    ordered = sorted(locations)
    for a, b in zip(ordered, ordered[1:]):
        assert (a.message_ordinal, a.chunk_ordinal) <= (
            b.message_ordinal, b.chunk_ordinal
        )

    outer = TextRange(loc(2), loc(6))
    assert TextRange(loc(2)) in outer           # start boundary
    assert TextRange(loc(5, 3)) in outer        # interior chunk
    assert TextRange(loc(6)) not in outer       # exclusive end
    assert TextRange(loc(3), loc(6)) in outer   # same exclusive end
    assert TextRange(loc(3), loc(7)) not in outer
    point = TextRange(loc(4))                   # end=None: ONE chunk
    assert TextRange(loc(4)) in point
    # A point range spans a single chunk, not the whole message
    # (reference interfaces_core.py _effective_end: start.chunk + 1).
    assert TextRange(loc(4), loc(5)) not in point
    assert TextRange(loc(4, 1)) not in point
    assert TextRange(loc(5)) not in point
    # ...but the point IS inside the whole-message range.
    assert point in TextRange(loc(4), loc(5))
