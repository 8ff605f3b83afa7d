"""Stage-2 compiler output shapes: SearchQuery -> SearchQueryExpr.

Deep behavioral matrix over SearchQueryCompiler, pinning the compile rules
the rest of the pipeline depends on (entity or_max groups, S.V.O. scopes,
noise/pronoun/wildcard filtering, dedupe, half-open datetime ranges, the
verbless fallback). Mirrors the coverage of the reference's
test_searchlang_compile.py (706 LoC) against this compiler's surface.
"""

import datetime

import pytest

from tests.test_query_pipeline import build_conversation
from typeagent_tpu.knowpro.date_time_schema import (
    DateTime,
    DateTimeRange,
    DateVal,
    TimeVal,
)
from typeagent_tpu.knowpro.interfaces import (
    PropertySearchTerm,
    SearchTerm,
    SearchTermGroup,
)
from typeagent_tpu.knowpro.search_query_schema import (
    ActionTerm,
    EntityTerm,
    FacetTerm,
    SearchExpr,
    SearchFilter,
    SearchQuery,
    VerbsTerm,
)
from typeagent_tpu.knowpro.searchlang import (
    LanguageQueryCompileOptions,
    SearchQueryCompiler,
    _NOISE_TERMS,
    _compile_fallback_query,
    compile_search_query,
    date_range_from_datetime_range,
    datetime_from_date_time,
    exclusive_stop_from_date_time,
    is_entity_term_list,
    optimize_or_max,
)

@pytest.fixture(scope="module")
def conv():
    import asyncio

    return asyncio.run(build_conversation())


def make_compiler(conv, **options):
    return SearchQueryCompiler(conv, LanguageQueryCompileOptions(**options))


def dt(y, m, d, hh=None, mm=0, ss=0):
    time = TimeVal(hour=hh, minute=mm, seconds=ss) if hh is not None else None
    return DateTime(date=DateVal(day=d, month=m, year=y), time=time)


def query_of(*filters, rewritten="q?"):
    return SearchQuery(
        search_expressions=[
            SearchExpr(rewritten_query=rewritten, filters=list(filters))
        ]
    )


def prop_pairs(group):
    """(name, value) pairs of all property terms, recursively."""
    out = []
    for term in group.terms:
        if isinstance(term, SearchTermGroup):
            out.extend(prop_pairs(term))
        elif isinstance(term, PropertySearchTerm):
            name = (
                term.property_name
                if isinstance(term.property_name, str)
                else term.property_name.term.text
            )
            out.append((name, term.property_value.term.text))
    return out


def plain_texts(group):
    out = []
    for term in group.terms:
        if isinstance(term, SearchTermGroup):
            out.extend(plain_texts(term))
        elif isinstance(term, SearchTerm) and not isinstance(
            term, PropertySearchTerm
        ):
            out.append(term.term.text)
    return out


# ---------------------------------------------------------------------------
# Helpers: is_entity_term_list / optimize_or_max
# ---------------------------------------------------------------------------


def test_is_entity_term_list():
    assert is_entity_term_list([EntityTerm(name="x", is_name_pronoun=False)])
    assert is_entity_term_list([])
    assert not is_entity_term_list("*")
    assert not is_entity_term_list(None)


def test_optimize_or_max_unwraps_single_term():
    lone = SearchTerm(term=__import__(
        "typeagent_tpu.knowpro.interfaces", fromlist=["Term"]
    ).Term("x"))
    group = SearchTermGroup(boolean_op="or_max", terms=[lone])
    assert optimize_or_max(group) is lone
    two = SearchTermGroup(boolean_op="or_max", terms=[lone, lone])
    assert optimize_or_max(two) is two


# ---------------------------------------------------------------------------
# Datetime handling: half-open ranges, whole-day rolls
# ---------------------------------------------------------------------------


def test_datetime_from_date_time_zeros_missing_time():
    value = datetime_from_date_time(dt(2024, 3, 5))
    assert (value.year, value.month, value.day) == (2024, 3, 5)
    assert (value.hour, value.minute, value.second) == (0, 0, 0)
    assert value.tzinfo == datetime.timezone.utc


def test_datetime_from_date_time_keeps_time():
    value = datetime_from_date_time(dt(2024, 3, 5, 14, 30, 10))
    assert (value.hour, value.minute, value.second) == (14, 30, 10)


def test_exclusive_stop_rolls_bare_date_to_next_midnight():
    stop = exclusive_stop_from_date_time(dt(2024, 3, 5))
    assert (stop.day, stop.hour) == (6, 0)


def test_exclusive_stop_rolls_over_month_end():
    stop = exclusive_stop_from_date_time(dt(2024, 1, 31))
    assert (stop.month, stop.day) == (2, 1)


def test_exclusive_stop_keeps_explicit_time():
    stop = exclusive_stop_from_date_time(dt(2024, 3, 5, 18))
    assert (stop.day, stop.hour) == (5, 18)


def test_date_range_start_only_has_open_end():
    r = date_range_from_datetime_range(
        DateTimeRange(start_date=dt(2024, 3, 5), stop_date=None)
    )
    assert r.end is None
    assert r.start.day == 5


def test_date_range_bare_stop_covers_whole_day():
    r = date_range_from_datetime_range(
        DateTimeRange(start_date=dt(2024, 3, 5), stop_date=dt(2024, 3, 7))
    )
    assert (r.end.day, r.end.hour) == (8, 0)  # exclusive next-midnight


def test_date_range_stop_with_time_is_exclusive_bound():
    r = date_range_from_datetime_range(
        DateTimeRange(
            start_date=dt(2024, 3, 5), stop_date=dt(2024, 3, 7, 17, 30)
        )
    )
    assert (r.end.day, r.end.hour, r.end.minute) == (7, 17, 30)


# ---------------------------------------------------------------------------
# compile_query / compile_search_expr shapes
# ---------------------------------------------------------------------------


def test_empty_search_expressions(conv):
    assert compile_search_query(conv, SearchQuery(search_expressions=[])) == []


def test_single_search_terms_filter(conv):
    exprs = compile_search_query(
        conv, query_of(SearchFilter(search_terms=["bach", "fugue"]))
    )
    assert len(exprs) == 1
    assert len(exprs[0].select_expressions) == 1
    group = exprs[0].select_expressions[0].search_term_group
    assert group.boolean_op == "or"
    assert plain_texts(group) == ["bach", "fugue"]


def test_multiple_filters_produce_multiple_selects(conv):
    exprs = compile_search_query(
        conv,
        query_of(
            SearchFilter(search_terms=["a"]), SearchFilter(search_terms=["b"])
        ),
    )
    assert len(exprs[0].select_expressions) == 2


def test_raw_query_preserved(conv):
    exprs = compile_search_query(
        conv, query_of(SearchFilter(search_terms=["a"]), rewritten="the question")
    )
    assert exprs[0].raw_query == "the question"


def test_empty_filter_uses_topic_wildcard(conv):
    exprs = compile_search_query(conv, query_of(SearchFilter()))
    group = exprs[0].select_expressions[0].search_term_group
    assert prop_pairs(group) == [("topic", "*")]


def test_explicitly_empty_search_terms_is_not_summary(conv):
    """Reference parity quirk: searchTerms=[] compiles to an EMPTY group,
    not the topic-* summary (only an absent field does)."""
    exprs = compile_search_query(conv, query_of(SearchFilter(search_terms=[])))
    group = exprs[0].select_expressions[0].search_term_group
    assert group.terms == []


def test_time_range_produces_when(conv):
    exprs = compile_search_query(
        conv,
        query_of(
            SearchFilter(
                search_terms=["x"],
                time_range=DateTimeRange(
                    start_date=dt(2024, 3, 1), stop_date=dt(2024, 3, 2)
                ),
            )
        ),
    )
    when = exprs[0].select_expressions[0].when
    assert when is not None and when.date_range is not None
    assert when.date_range.start.day == 1


def test_no_time_range_no_when(conv):
    exprs = compile_search_query(conv, query_of(SearchFilter(search_terms=["x"])))
    assert exprs[0].select_expressions[0].when is None


# ---------------------------------------------------------------------------
# Entity term compilation
# ---------------------------------------------------------------------------


def entity(name, types=None, facets=None, pronoun=False):
    return EntityTerm(
        name=name, is_name_pronoun=pronoun, type=types, facets=facets
    )


def compile_entities(conv, *terms, **options):
    compiler = make_compiler(conv, **options)
    group = SearchTermGroup(boolean_op="or", terms=[])
    compiler.compile_entity_terms(list(terms), group)
    return group


def test_entity_name_compiles_to_ormax_name_term_plus_topic(conv):
    group = compile_entities(conv, entity("Bach"))
    # or_max of one term is unwrapped -> name property term, then topic.
    assert prop_pairs(group) == [("name", "Bach"), ("topic", "Bach")]


def test_entity_with_type(conv):
    group = compile_entities(conv, entity("Bach", types=["person", "composer"]))
    inner = group.terms[0]
    assert isinstance(inner, SearchTermGroup) and inner.boolean_op == "or_max"
    assert prop_pairs(inner) == [
        ("name", "Bach"),
        ("type", "person"),
        ("type", "composer"),
    ]


def test_entity_with_facet_name_and_value(conv):
    group = compile_entities(
        conv,
        entity(
            "piano",
            facets=[FacetTerm(facet_name="era", facet_value="baroque")],
        ),
    )
    pairs = prop_pairs(group)
    assert ("era", "baroque") in pairs
    # Concrete facet values also match as topics.
    assert ("topic", "baroque") in pairs


def test_entity_with_wildcard_facet_value(conv):
    group = compile_entities(
        conv,
        entity("piano", facets=[FacetTerm(facet_name="era", facet_value="*")]),
    )
    pairs = prop_pairs(group)
    assert ("facet.name", "era") in pairs
    assert all(v != "*" for n, v in pairs if n == "topic")


def test_entity_with_wildcard_facet_name(conv):
    group = compile_entities(
        conv,
        entity(
            "piano", facets=[FacetTerm(facet_name="*", facet_value="baroque")]
        ),
    )
    assert ("facet.value", "baroque") in prop_pairs(group)


def test_entity_with_both_facet_wildcards_drops_facet(conv):
    group = compile_entities(
        conv, entity("piano", facets=[FacetTerm(facet_name="*", facet_value="*")])
    )
    pairs = prop_pairs(group)
    assert all(n not in ("facet.name", "facet.value") for n, _ in pairs)


def test_pronoun_entity_skips_topic_but_keeps_name(conv):
    """Pronoun names still compile to a name property term (the entity
    group), but the topic echo is skipped — reference parity
    (add_entity_name_to_group checks is_name_pronoun; add_entity_term_to_group
    does not)."""
    compiler = make_compiler(conv)
    group = SearchTermGroup(boolean_op="or", terms=[])
    compiler.compile_entity_terms([entity("him", pronoun=True)], group)
    pairs = prop_pairs(group)
    assert ("name", "him") in pairs
    assert all(n != "topic" for n, _ in pairs)


def test_star_entity_name_ignored(conv):
    group = compile_entities(conv, entity("*"))
    assert prop_pairs(group) == []


def test_noise_property_value_ignored(conv):
    group = compile_entities(conv, entity("thing"))
    assert prop_pairs(group) == []


def test_custom_term_filter_excludes_property_terms(conv):
    group = compile_entities(
        conv, entity("Bach"), term_filter=lambda t: t != "Bach"
    )
    assert prop_pairs(group) == []


# ---------------------------------------------------------------------------
# Noise / searchable-string guards
# ---------------------------------------------------------------------------


def test_is_searchable_string(conv):
    compiler = make_compiler(conv)
    assert compiler.is_searchable_string("bach")
    assert not compiler.is_searchable_string("")
    assert not compiler.is_searchable_string("*")
    filtered = make_compiler(conv, term_filter=lambda t: t.startswith("a"))
    assert filtered.is_searchable_string("abc")
    assert not filtered.is_searchable_string("bach")


def test_noise_terms_case_insensitive(conv):
    compiler = make_compiler(conv)
    for word in _NOISE_TERMS:
        assert compiler.is_noise_term(word)
        assert compiler.is_noise_term(word.upper())
    assert not compiler.is_noise_term("bach")


# ---------------------------------------------------------------------------
# Dedupe via PropertyTermSet
# ---------------------------------------------------------------------------


def test_duplicate_property_term_not_added_twice(conv):
    compiler = make_compiler(conv)
    group = SearchTermGroup(boolean_op="or", terms=[])
    compiler.add_property_term_to_group("name", "Bach", group)
    compiler.add_property_term_to_group("name", "Bach", group)
    assert len(group.terms) == 1


def test_different_property_names_both_added(conv):
    compiler = make_compiler(conv)
    group = SearchTermGroup(boolean_op="or", terms=[])
    compiler.add_property_term_to_group("name", "Bach", group)
    compiler.add_property_term_to_group("topic", "Bach", group)
    assert len(group.terms) == 2


def test_dedupe_disabled_allows_duplicates(conv):
    compiler = make_compiler(conv)
    compiler.dedupe = False
    group = SearchTermGroup(boolean_op="or", terms=[])
    compiler.add_property_term_to_group("name", "Bach", group)
    compiler.add_property_term_to_group("name", "Bach", group)
    assert len(group.terms) == 2


# ---------------------------------------------------------------------------
# Action terms: or_max select group + S.V.O. scope
# ---------------------------------------------------------------------------


def action(
    actors="*", targets=None, additional=None, verbs=None, informational=False
):
    return ActionTerm(
        actor_entities=actors,
        target_entities=targets,
        additional_entities=additional,
        action_verbs=VerbsTerm(words=verbs) if verbs else None,
        is_informational=informational,
    )


def test_action_verbs_become_topic_terms_in_ormax(conv):
    compiler = make_compiler(conv)
    group = compiler.compile_action_term_as_search_terms(
        action(verbs=["compose", "write"])
    )
    inner = group.terms[0]
    assert inner.boolean_op == "or_max"
    assert prop_pairs(inner) == [("topic", "compose"), ("topic", "write")]


def test_action_target_and_additional_entities_as_search_terms(conv):
    compiler = make_compiler(conv)
    group = compiler.compile_action_term_as_search_terms(
        action(
            actors=[entity("Bob")],
            targets=[entity("report", types=["document"])],
            additional=[entity("budget")],
        )
    )
    texts = plain_texts(group)
    assert texts == ["Bob", "report", "document", "budget"]


def test_informational_action_no_scope(conv):
    compiler = make_compiler(conv)
    when = compiler.compile_when(
        SearchFilter(
            action_search_term=action(actors=[entity("Bob")], informational=True)
        )
    )
    assert when is None


def test_star_actor_no_scope(conv):
    compiler = make_compiler(conv)
    when = compiler.compile_when(
        SearchFilter(action_search_term=action(actors="*", verbs=["say"]))
    )
    assert when is None


def test_actor_entities_list_adds_scope(conv):
    compiler = make_compiler(conv)
    when = compiler.compile_when(
        SearchFilter(action_search_term=action(actors=[entity("Bob")], verbs=["say"]))
    )
    assert when is not None and when.scope_defining_terms is not None
    pairs = prop_pairs(when.scope_defining_terms)
    assert ("subject", "Bob") in pairs
    assert ("verb", "say") in pairs


def test_exact_scope_always_adds_scope(conv):
    compiler = make_compiler(conv, exact_scope=True)
    assert compiler.should_add_scope(action(verbs=["say"]))
    relaxed = make_compiler(conv)
    assert not relaxed.should_add_scope(action(verbs=["say"]))


def test_scope_svo_shape_with_targets(conv):
    compiler = make_compiler(conv)
    scope = compiler.compile_scope(
        action(
            actors=[entity("Bob")],
            targets=[entity("report"), entity("memo")],
            verbs=["send"],
        )
    )
    # Two targets -> AND of two S.V.O. groups.
    assert scope.boolean_op == "and"
    assert len(scope.terms) == 2
    for svo in scope.terms:
        pairs = prop_pairs(svo)
        assert ("subject", "Bob") in pairs
        assert ("verb", "send") in pairs
    assert ("object", "report") in prop_pairs(scope.terms[0])
    assert ("object", "memo") in prop_pairs(scope.terms[1])


def test_scope_without_verbs_when_verb_scope_off(conv):
    compiler = make_compiler(conv)
    scope = compiler.compile_scope(
        action(actors=[entity("Bob")], targets=[entity("report")], verbs=["send"]),
        include_verbs=False,
    )
    assert all(n != "verb" for n, _ in prop_pairs(scope))


def test_scope_includes_additional_entities_when_asked(conv):
    compiler = make_compiler(conv)
    scope = compiler.compile_scope(
        action(actors=[entity("Bob")], additional=[entity("budget")], verbs=["say"]),
        include_additional_entities=True,
    )
    assert ("name", "budget") in prop_pairs(scope)


# ---------------------------------------------------------------------------
# Fallback (verbless-scope) compilation
# ---------------------------------------------------------------------------


def _scoped_query():
    # A target is required for verb stripping to be observable: with no
    # targets the compiler always emits subject+verb (reference
    # compile_action_term falls through to compile_subject_and_verb).
    return query_of(
        SearchFilter(
            action_search_term=action(
                actors=[entity("Bob")],
                targets=[entity("report")],
                verbs=["say"],
            )
        )
    )


def test_fallback_requires_verb_scope_and_fuzzy(conv):
    assert (
        _compile_fallback_query(
            conv, _scoped_query(), LanguageQueryCompileOptions(exact_scope=True)
        )
        is None
    )
    assert (
        _compile_fallback_query(
            conv, _scoped_query(), LanguageQueryCompileOptions(verb_scope=False)
        )
        is None
    )


def test_fallback_strips_verbs_from_scope(conv):
    exprs = _compile_fallback_query(
        conv, _scoped_query(), LanguageQueryCompileOptions()
    )
    assert exprs is not None
    when = exprs[0].select_expressions[0].when
    assert when is not None and when.scope_defining_terms is not None
    pairs = prop_pairs(when.scope_defining_terms)
    assert ("subject", "Bob") in pairs
    assert all(n != "verb" for n, _ in pairs)
    # The primary compile keeps the verbs (sanity contrast).
    primary = compile_search_query(conv, _scoped_query())
    assert ("verb", "say") in prop_pairs(
        primary[0].select_expressions[0].when.scope_defining_terms
    )


# ---------------------------------------------------------------------------
# compile_search_terms helper
# ---------------------------------------------------------------------------


def test_compile_search_terms_returns_and_appends(conv):
    compiler = make_compiler(conv)
    fresh = compiler.compile_search_terms(["a", "b"])
    assert plain_texts(fresh) == ["a", "b"]
    existing = SearchTermGroup(boolean_op="or", terms=[])
    compiler.compile_search_terms(["c"], existing)
    assert plain_texts(existing) == ["c"]
