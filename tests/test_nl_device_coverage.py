"""NL-shaped query fuzz: the device engine must take EVERY query the
stage-2 compiler can produce from a stage-1 SearchQuery — no fallback —
and match the host VM.

The generic differential suite (test_device_vm_differential.py) fuzzes raw
SearchTermGroup trees, some of which only hand-built callers can create;
this suite generates random stage-1 LLM outputs (EntityTerm/ActionTerm/
topics/time ranges, wildcards, facets, pronouns) and compiles them through
the REAL stages 2+3, certifying that for natural-language queries the
device executor is the query engine, not a fast path.
"""

import numpy as np
import pytest

from tests.test_device_vm_differential import (
    VERBS,
    WORDS,
    assert_results_equivalent,
    build_fuzz_conversation,
)
from typeagent_tpu.knowpro.date_time_schema import DateTime, DateTimeRange, DateVal
from typeagent_tpu.knowpro.device_executor import DeviceQueryExecutor
from typeagent_tpu.knowpro.query import QueryEvalContext
from typeagent_tpu.knowpro.search import QueryCompiler, SearchOptions, run_query
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
    compile_search_query,
)


def word(rng) -> str:
    return str(rng.choice(WORDS))


def rand_entity(rng) -> EntityTerm:
    name = "*" if rng.random() < 0.06 else word(rng)
    entity = EntityTerm(
        name=name, is_name_pronoun=bool(rng.random() < 0.08)
    )
    if rng.random() < 0.45:
        k = int(rng.integers(1, 3))
        entity.type = [str(w) for w in rng.choice(WORDS, size=k, replace=False)]
    if rng.random() < 0.35:
        entity.facets = [
            FacetTerm(
                facet_name="*" if rng.random() < 0.15 else word(rng),
                facet_value="*" if rng.random() < 0.25 else word(rng),
            )
        ]
    return entity


def rand_action(rng) -> ActionTerm:
    actors = (
        "*"
        if rng.random() < 0.3
        else [rand_entity(rng) for _ in range(int(rng.integers(1, 3)))]
    )
    action = ActionTerm(
        actor_entities=actors,
        is_informational=bool(rng.random() < 0.3),
    )
    if rng.random() < 0.8:
        action.action_verbs = VerbsTerm(
            words=[str(v) for v in rng.choice(VERBS, size=int(rng.integers(1, 3)))],
            tense=str(rng.choice(["Past", "Present", "Future"])),
        )
    if rng.random() < 0.6:
        action.target_entities = [rand_entity(rng)]
    if rng.random() < 0.3:
        action.additional_entities = [rand_entity(rng)]
    return action


def rand_filter(rng) -> SearchFilter:
    f = SearchFilter()
    if rng.random() < 0.6:
        f.entity_search_terms = [
            rand_entity(rng) for _ in range(int(rng.integers(1, 4)))
        ]
    if rng.random() < 0.5:
        f.action_search_term = rand_action(rng)
    if rng.random() < 0.5:
        f.search_terms = [word(rng) for _ in range(int(rng.integers(1, 3)))]
    if f.entity_search_terms is None and f.action_search_term is None:
        f.search_terms = f.search_terms or [word(rng)]
    if rng.random() < 0.3:
        start_day = int(rng.integers(1, 20))
        f.time_range = DateTimeRange(
            start_date=DateTime(date=DateVal(day=start_day, month=3, year=2024)),
            stop_date=(
                DateTime(date=DateVal(day=start_day + 7, month=3, year=2024))
                if rng.random() < 0.7
                else None
            ),
        )
    return f


def rand_query(rng) -> SearchQuery:
    exprs = [
        SearchExpr(
            rewritten_query=f"fuzz query {i}",
            filters=[rand_filter(rng) for _ in range(int(rng.integers(1, 3)))],
        )
        for i in range(int(rng.integers(1, 3)))
    ]
    return SearchQuery(search_expressions=exprs)


async def run_nl_coverage(seed: int, n_queries: int) -> tuple[int, int]:
    rng = np.random.default_rng(seed)
    conv = await build_fuzz_conversation(rng)
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    indexes = conv.secondary_indexes
    total = 0
    covered = 0
    for qi in range(n_queries):
        query = rand_query(rng)
        compiled = compile_search_query(
            conv, query, LanguageQueryCompileOptions()
        )
        options = SearchOptions(exact_match=bool(rng.random() < 0.3))
        for expr in compiled:
            for select in expr.select_expressions:
                total += 1
                compiler = QueryCompiler(conv, indexes)
                knowledge_query = await compiler.compile_knowledge_query(
                    select.search_term_group, select.when, options
                )
                context = QueryEvalContext(
                    conv,
                    indexes.property_to_semantic_ref_index,
                    indexes.timestamp_index,
                )
                device = await executor.execute(knowledge_query, context)
                host = await run_query(conv, options, knowledge_query)
                if device is None:
                    continue
                covered += 1
                assert_results_equivalent(
                    device, host, (seed, qi, select.search_term_group, select.when)
                )
    return covered, total


@pytest.mark.parametrize("seed", [5, 77, 2024])
async def test_nl_queries_fully_device_covered(seed):
    covered, total = await run_nl_coverage(seed, 25)
    assert total >= 25
    # Every stage-2-compiled natural-language query must take the device
    # route: a drop below 100% means a REACHABLE fallback appeared.
    assert covered == total, f"device fallback on NL queries: {covered}/{total}"
