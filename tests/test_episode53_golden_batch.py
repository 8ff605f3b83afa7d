"""Batch replay of the reference's real Episode-53 query corpus vs goldens.

The 67-query corpus (`Episode_53_Search_results.json` in the reference's
testdata) carries real LLM stage-1 translations and fully compiled stage-2/3
trees — real related-term weights, or_max entity groups, scope-defining term
groups with required related terms, date ranges. Replaying the compiled
trees hermetically (parity role: reference ``make eval``, `Makefile:38-42`)
pins stage-3 + accumulator + scope semantics over production-shaped queries,
and certifies the device executor against the host VM on every one of them.
"""

import json
import os

import pytest

from typeagent_tpu.tools import eval_episode53 as ev

pytestmark = pytest.mark.skipif(
    not ev.corpus_available(), reason="reference Episode-53 corpus not available"
)


@pytest.fixture(scope="module")
def conversation():
    import asyncio

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(ev.load_episode53_conversation())
    finally:
        loop.close()


@pytest.fixture(scope="module")
def corpus():
    return ev.load_query_corpus()


@pytest.fixture(scope="module")
def golden():
    with open(ev.GOLDEN_FILE) as f:
        return json.load(f)


async def test_corpus_shape(corpus):
    # The corpus must keep exercising the interesting compiled shapes.
    n_scoped = sum(
        1
        for e in corpus
        for q in e["compiledQueryExpr"]
        for se in q["selectExpressions"]
        if (se.get("when") or {}).get("scopeDefiningTerms")
    )
    n_dated = sum(
        1
        for e in corpus
        for q in e["compiledQueryExpr"]
        for se in q["selectExpressions"]
        if (se.get("when") or {}).get("dateRange")
    )
    assert len(corpus) == 67
    assert n_scoped >= 25
    assert n_dated >= 2


async def test_host_vm_matches_golden(conversation, corpus, golden):
    records = await ev.replay_corpus(conversation, corpus, use_device_executor=False)
    assert len(records) == len(golden)
    for got, expected in zip(records, golden):
        assert got == expected, f"host VM drift on {got['searchText']!r}"


async def test_device_executor_matches_golden(conversation, corpus, golden):
    records = await ev.replay_corpus(conversation, corpus, use_device_executor=True)
    assert len(records) == len(golden)
    for got, expected in zip(records, golden):
        assert got == expected, f"device executor drift on {got['searchText']!r}"


async def test_loader_roundtrips_required_related_terms(corpus):
    # relatedTermsRequired scope terms must survive the JSON -> tree load:
    # scope semantics depend on them (reference query.py:58-75).
    found = False
    for e in corpus:
        for q in e["compiledQueryExpr"]:
            for se in q["selectExpressions"]:
                scope = (se.get("when") or {}).get("scopeDefiningTerms")
                if not scope:
                    continue
                group = ev.load_term_group(scope)
                for term in group.terms:
                    pv = getattr(term, "property_value", None)
                    if pv is not None and getattr(
                        pv, "related_terms_required", False
                    ):
                        found = True
    assert found


# ---------------------------------------------------------------------------
# Loader wire-format edges (guard the corpus asset's deserializer)
# ---------------------------------------------------------------------------


def test_loader_missing_related_terms_pins_empty():
    """Absent relatedTerms must deserialize to [] (resolution blocked), not
    None (which would re-resolve through the fake fuzzy index)."""
    group = ev.load_term_group(
        {"booleanOp": "or", "terms": [{"term": {"text": "spider"}}]}
    )
    assert group.terms[0].related_terms == []


def test_loader_free_property_name_becomes_search_term():
    from typeagent_tpu.knowpro.interfaces import SearchTerm

    group = ev.load_term_group(
        {
            "booleanOp": "or",
            "terms": [
                {
                    "propertyName": {"term": {"text": "instrument"}},
                    "propertyValue": {"term": {"text": "harpsichord"}},
                }
            ],
        }
    )
    prop = group.terms[0]
    assert isinstance(prop.property_name, SearchTerm)
    assert prop.property_name.term.text == "instrument"
    assert prop.property_value.term.text == "harpsichord"


def test_loader_when_clause_parsing():
    expr = ev.load_compiled_query_expr(
        {
            "selectExpressions": [
                {
                    "searchTermGroup": {"booleanOp": "or", "terms": []},
                    "when": {
                        "dateRange": {
                            "start": "2023-05-01T07:00:00.000Z",
                            "end": None,
                        },
                        "knowledgeType": "entity",
                        "scopeDefiningTerms": {
                            "booleanOp": "and",
                            "terms": [
                                {
                                    "term": {"text": "kevin", "weight": 10},
                                    "relatedTermsRequired": True,
                                }
                            ],
                        },
                    },
                }
            ],
            "rawQuery": "q",
        }
    )
    when = expr.select_expressions[0].when
    assert when.date_range.start.year == 2023 and when.date_range.end is None
    assert when.knowledge_type == "entity"
    scope_term = when.scope_defining_terms.terms[0]
    assert scope_term.related_terms_required is True
    assert expr.raw_query == "q"


def test_loader_nested_groups_and_weights():
    group = ev.load_term_group(
        {
            "booleanOp": "or",
            "terms": [
                {
                    "booleanOp": "or_max",
                    "terms": [
                        {
                            "term": {"text": "book", "weight": 100},
                            "relatedTerms": [{"text": "novel", "weight": 0.87}],
                        }
                    ],
                }
            ],
        }
    )
    inner = group.terms[0]
    assert inner.boolean_op == "or_max"
    st = inner.terms[0]
    assert st.term.weight == 100
    assert st.related_terms[0].text == "novel"
    assert st.related_terms[0].weight == 0.87
