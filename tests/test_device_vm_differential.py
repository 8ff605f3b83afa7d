"""Differential suite: device executor == host VM over randomized queries.

The device engine evaluates the SAME stage-3 compiled tree as the host VM
(`search.py:QueryCompiler`), so for every query it can express, results must
match exactly: per-(ktype, ordinal) scores, membership, and the
term_matches bookkeeping. This suite generates randomized conversations and
query trees (nested and/or/or_max, property terms, related terms, duplicate
texts, wildcards, when-filters with date ranges / knowledge types / scope
ranges at chunk granularity) and asserts parity, also tracking how much of
the query space the device engine covers (it must stay the default engine,
not an opt-in corner).
"""

import os

import numpy as np
import pytest

from typeagent_tpu.knowpro import kplib
from typeagent_tpu.knowpro.convsettings import (
    MessageTextIndexSettings,
    RelatedTermIndexSettings,
)
from typeagent_tpu.knowpro.device_executor import DeviceQueryExecutor
from typeagent_tpu.knowpro.interfaces import (
    DateRange,
    Datetime,
    PropertySearchTerm,
    SearchTerm,
    SearchTermGroup,
    Term,
    TextLocation,
    TextRange,
    WhenFilter,
)
from typeagent_tpu.knowpro.propindex import build_property_index
from typeagent_tpu.knowpro.query import QueryEvalContext
from typeagent_tpu.knowpro.search import QueryCompiler, SearchOptions, run_query
from typeagent_tpu.knowpro.secindex import ConversationSecondaryIndexes
from typeagent_tpu.knowpro.semrefindex import (
    add_knowledge_batch_to_semantic_ref_index,
    add_metadata_to_index_from_list,
)
from typeagent_tpu.knowpro.universal_message import (
    ConversationMessage,
    ConversationMessageMeta,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.storage.memory import MemoryStorageProvider
from typeagent_tpu.vectorstore import TextEmbeddingIndexSettings

from tests.test_query_pipeline import FakeConversation

WORDS = [
    "bach", "gould", "piano", "harpsichord", "fugue", "variation",
    "counterpoint", "recording", "sonata", "concert", "composer",
    "pianist", "baroque", "melody", "tempo",
]
VERBS = ["compose", "record", "perform", "discuss", "praise"]
SPEAKERS = ["Alice", "Bob", "Carol"]


async def build_fuzz_conversation(rng: np.random.Generator):
    model = create_test_embedding_model(16)
    provider = MemoryStorageProvider(
        message_text_settings=MessageTextIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0)
        ),
        related_terms_settings=RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.0, max_matches=3)
        ),
    )
    conv = FakeConversation(
        messages=provider.messages,
        semantic_refs=provider.semantic_refs,
        semantic_ref_index=provider.semantic_ref_index,
        secondary_indexes=ConversationSecondaryIndexes(provider),
    )
    n_messages = 14
    messages = [
        ConversationMessage(
            [f"message {i} about {rng.choice(WORDS)}", f"chunk two of {i}"],
            ConversationMessageMeta(
                str(rng.choice(SPEAKERS)), [str(rng.choice(SPEAKERS))]
            ),
            timestamp=f"2024-03-{(i % 27) + 1:02d}T10:00:00Z",
            tags=[str(rng.choice(WORDS))] if rng.random() < 0.3 else [],
        )
        for i in range(n_messages)
    ]
    await provider.messages.extend(messages)
    await add_metadata_to_index_from_list(
        messages, provider.semantic_refs, provider.semantic_ref_index, 0
    )
    batch = []
    for i in range(n_messages):
        if rng.random() < 0.25:
            continue
        entities = [
            kplib.ConcreteEntity(
                str(rng.choice(WORDS)),
                [str(w) for w in rng.choice(WORDS, size=2, replace=False)],
                facets=(
                    [kplib.Facet(str(rng.choice(WORDS)), str(rng.choice(WORDS)))]
                    if rng.random() < 0.5
                    else None
                ),
            )
            for _ in range(int(rng.integers(1, 3)))
        ]
        actions = (
            [
                kplib.Action(
                    verbs=[str(rng.choice(VERBS))],
                    verb_tense="past",
                    subject_entity_name=str(rng.choice(WORDS)),
                    object_entity_name=str(rng.choice(WORDS)),
                )
            ]
            if rng.random() < 0.6
            else []
        )
        topics = [str(rng.choice(WORDS))] if rng.random() < 0.6 else []
        chunk = int(rng.integers(0, 2))  # chunk-granular knowledge ranges
        batch.append(
            (
                i,
                chunk,
                kplib.KnowledgeResponse(
                    entities=entities,
                    actions=actions,
                    inverse_actions=[],
                    topics=topics,
                ),
            )
        )
    await add_knowledge_batch_to_semantic_ref_index(conv, batch)
    await build_property_index(conv)
    from typeagent_tpu.storage.memory.indexes import add_to_timestamp_index

    await add_to_timestamp_index(provider.timestamp_index, provider.messages, 0)
    from typeagent_tpu.storage.memory.reltermsindex import (
        build_related_terms_index,
    )

    await build_related_terms_index(
        conv,
        RelatedTermIndexSettings(
            TextEmbeddingIndexSettings(model, min_score=0.5, max_matches=3)
        ),
    )
    return conv


def random_search_term(rng) -> SearchTerm:
    text = str(rng.choice(WORDS + ["unknown-term", "*"]))
    weight = float(rng.choice([1.0, 2.0, 10.0])) if rng.random() < 0.4 else None
    related = None
    if rng.random() < 0.5:
        related = [
            Term(
                str(rng.choice(WORDS)),
                weight=float(np.round(rng.uniform(0.3, 1.0), 2)),
            )
            for _ in range(int(rng.integers(1, 4)))
        ]
    return SearchTerm(Term(text, weight=weight), related_terms=related)


def random_property_term(rng) -> PropertySearchTerm:
    name = str(rng.choice(["name", "type", "topic", "tag", "verb", "object"]))
    value = random_search_term(rng)
    if rng.random() < 0.15:
        # Facet-style free-form property name (SearchTerm name).
        return PropertySearchTerm(random_search_term(rng), value)
    return PropertySearchTerm(name, value)


def random_group(rng, depth: int = 0) -> SearchTermGroup:
    op = str(rng.choice(["or", "or_max", "and"] if depth else ["or", "or_max"]))
    n_terms = int(rng.integers(1, 5))
    terms = []
    for _ in range(n_terms):
        roll = rng.random()
        if roll < 0.15 and depth < 2:
            terms.append(random_group(rng, depth + 1))
        elif roll < 0.45:
            terms.append(random_property_term(rng))
        else:
            terms.append(random_search_term(rng))
    return SearchTermGroup(boolean_op=op, terms=terms)


def random_when_filter(rng) -> WhenFilter | None:
    roll = rng.random()
    if roll < 0.5:
        return None
    filter = WhenFilter()
    if rng.random() < 0.4:
        day = int(rng.integers(1, 20))
        filter.date_range = DateRange(
            start=Datetime(2024, 3, day),
            end=Datetime(2024, 3, day + int(rng.integers(1, 8))),
        )
    if rng.random() < 0.3:
        filter.knowledge_type = str(rng.choice(["entity", "topic", "action"]))
    if rng.random() < 0.3:
        start_msg = int(rng.integers(0, 10))
        start_chunk = int(rng.integers(0, 2))
        filter.text_ranges_in_scope = [
            TextRange(
                TextLocation(start_msg, start_chunk),
                TextLocation(start_msg + int(rng.integers(1, 5))),
            )
        ]
    if rng.random() < 0.3:
        # Message-derived scope: a term group whose matching messages bound
        # the query (the action-scope pattern stage 2 emits). Evaluated by
        # host selectors on BOTH routes; parity must still hold through the
        # scope -> mask -> device pipeline.
        filter.scope_defining_terms = SearchTermGroup(
            boolean_op=str(rng.choice(["or", "and", "or_max"])),
            terms=[
                random_property_term(rng)
                if rng.random() < 0.5
                else random_search_term(rng)
                for _ in range(int(rng.integers(1, 3)))
            ],
        )
    if rng.random() < 0.2:
        filter.tags = [str(rng.choice(WORDS))]
    return filter


def result_fingerprint(result):
    if not result:
        return {}
    return {
        ktype: (
            sorted(
                (m.semantic_ref_ordinal, round(float(m.score), 4))
                for m in r.semantic_ref_matches
            ),
            frozenset(r.term_matches),
        )
        for ktype, r in result.items()
    }


def assert_sequences_equivalent(dev_pairs, host_pairs, detail):
    """Exact order parity, tolerating reordering only WITHIN runs of
    approx-equal scores (float32-vs-float64 drift can flip strict
    comparisons between near-identical scores; the insertion-order
    replication makes everything else deterministic)."""
    assert len(dev_pairs) == len(host_pairs), (detail, dev_pairs, host_pairs)
    i = 0
    while i < len(host_pairs):
        j = i + 1
        while (
            j < len(host_pairs)
            and abs(host_pairs[j][1] - host_pairs[i][1]) < 2e-3
        ):
            j += 1
        dev_run = {o for o, _ in dev_pairs[i:j]}
        host_run = {o for o, _ in host_pairs[i:j]}
        assert dev_run == host_run, (detail, i, j, dev_pairs, host_pairs)
        for (_, ds), (_, hs) in zip(dev_pairs[i:j], host_pairs[i:j]):
            assert ds == pytest.approx(hs, abs=2e-3), (detail, dev_pairs, host_pairs)
        i = j


def assert_results_equivalent(device, host, detail):
    device = device or {}
    host = host or {}
    # Dict (knowledge-type) order is observable downstream: must match.
    assert list(device.keys()) == list(host.keys()), (detail, device, host)
    for ktype in device:
        assert device[ktype].term_matches == host[ktype].term_matches, (
            detail,
            ktype,
        )
        dev_pairs = [
            (m.semantic_ref_ordinal, float(m.score))
            for m in device[ktype].semantic_ref_matches
        ]
        host_pairs = [
            (m.semantic_ref_ordinal, float(m.score))
            for m in host[ktype].semantic_ref_matches
        ]
        assert_sequences_equivalent(dev_pairs, host_pairs, (detail, ktype))


async def run_differential(seed: int, n_queries: int) -> tuple[int, int]:
    rng = np.random.default_rng(seed)
    conv = await build_fuzz_conversation(rng)
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    indexes = conv.secondary_indexes
    covered = 0
    for qi in range(n_queries):
        group = random_group(rng)
        when = random_when_filter(rng)
        options = SearchOptions(
            exact_match=bool(rng.random() < 0.4),
            max_knowledge_matches=(
                int(rng.integers(1, 8)) if rng.random() < 0.3 else None
            ),
        )
        compiler = QueryCompiler(conv, indexes)
        query = await compiler.compile_knowledge_query(group, when, options)
        context = QueryEvalContext(
            conv,
            indexes.property_to_semantic_ref_index,
            indexes.timestamp_index,
        )
        device = await executor.execute(query, context)
        host = await run_query(conv, options, query)
        if device is None:
            continue
        covered += 1
        assert_results_equivalent(device, host, (seed, qi, group, when, options))
    return covered, n_queries


async def test_full_pipeline_message_matches_parity():
    """search_conversation end-to-end: message matches (which observe
    knowledge-match ordering through the order-sensitive MessageAccumulator)
    must agree between routes."""
    from typeagent_tpu.knowpro.search import search_conversation

    rng = np.random.default_rng(99)
    conv = await build_fuzz_conversation(rng)
    checked = 0
    for qi in range(15):
        group = random_group(rng)
        when = random_when_filter(rng)
        base = dict(
            exact_match=bool(rng.random() < 0.5),
            max_message_matches=int(rng.integers(2, 10)),
        )
        dev = await search_conversation(
            conv, group, when,
            SearchOptions(use_device_executor=True, **base),
            raw_search_query="what happened with the recording?",
        )
        host = await search_conversation(
            conv, group, when,
            SearchOptions(use_device_executor=False, **base),
            raw_search_query="what happened with the recording?",
        )
        assert (dev is None) == (host is None)
        if dev is None:
            continue
        checked += 1
        assert_results_equivalent(
            dev.knowledge_matches, host.knowledge_matches, (99, qi, group)
        )
        dev_msgs = [(m.message_ordinal, round(float(m.score), 3))
                    for m in dev.message_matches]
        host_msgs = [(m.message_ordinal, round(float(m.score), 3))
                     for m in host.message_matches]
        assert dev_msgs == host_msgs, (qi, group, when, dev_msgs, host_msgs)
    assert checked >= 10


# Deep sweeps: TAT_FUZZ_SEEDS=64 python -m pytest -k differential
_FUZZ_SEEDS = int(os.environ.get("TAT_FUZZ_SEEDS", "3"))


@pytest.mark.parametrize("seed", [7, 42, 1234, *range(2000, 1997 + _FUZZ_SEEDS)])
async def test_device_vm_differential(seed):
    covered, total = await run_differential(seed, 40)
    # The device engine must cover the overwhelming share of compiled
    # queries — it is the default engine, not a fast path for corner cases.
    assert covered >= int(0.85 * total), (covered, total)


async def test_execute_batch_matches_sequential():
    """N queries (mixed scopes, related terms, booleans) in ONE fused device
    call must equal per-query execution — per-op scope rows keep each
    query's when-filter separate."""
    rng = np.random.default_rng(17)
    conv = await build_fuzz_conversation(rng)
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    indexes = conv.secondary_indexes
    context = QueryEvalContext(
        conv, indexes.property_to_semantic_ref_index, indexes.timestamp_index
    )
    compiled = []
    for _ in range(12):
        group = random_group(rng)
        when = random_when_filter(rng)
        options = SearchOptions(exact_match=bool(rng.random() < 0.5))
        compiler = QueryCompiler(conv, indexes)
        compiled.append(
            await compiler.compile_knowledge_query(group, when, options)
        )
    batch = await executor.execute_batch(compiled, context)
    covered = 0
    for query, batched in zip(compiled, batch):
        single = await executor.execute(query, context)
        assert (batched is None) == (single is None)
        if batched is None:
            continue
        covered += 1
        assert_results_equivalent(batched, single, query)
    assert covered >= 8


async def test_search_conversation_knowledge_batch_api():
    """Public batch API == sequential search_conversation_knowledge."""
    from typeagent_tpu.knowpro.search import (
        search_conversation_knowledge,
        search_conversation_knowledge_batch,
    )

    rng = np.random.default_rng(23)
    conv = await build_fuzz_conversation(rng)
    selects = []
    for _ in range(6):
        selects.append((random_group(rng), random_when_filter(rng)))
    options = SearchOptions(exact_match=True)
    batch = await search_conversation_knowledge_batch(conv, selects, options)
    for (group, when), batched in zip(selects, batch):
        single = await search_conversation_knowledge(conv, group, when, options)
        assert_results_equivalent(batched, single, group)


async def test_device_scope_eval_matches_host_selectors():
    """_eval_scope's device-routed message-member sets == the host
    selector evaluation, over randomized compiled scopes."""
    rng = np.random.default_rng(31)
    conv = await build_fuzz_conversation(rng)
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    indexes = conv.secondary_indexes

    checked = 0
    for qi in range(25):
        group = random_group(rng)
        when = WhenFilter()
        when.scope_defining_terms = SearchTermGroup(
            boolean_op=str(rng.choice(["or", "and", "or_max"])),
            terms=[
                random_property_term(rng)
                if rng.random() < 0.5
                else random_search_term(rng)
                for _ in range(int(rng.integers(1, 4)))
            ],
        )
        compiler = QueryCompiler(conv, indexes)
        query = await compiler.compile_knowledge_query(
            group, when, SearchOptions(exact_match=bool(rng.random() < 0.5))
        )
        unwrapped = executor._unwrap(query)
        if unwrapped is None:
            continue
        expr = unwrapped[0]
        if expr.get_scope_expr is None:
            continue
        checked += 1
        context = QueryEvalContext(
            conv,
            indexes.property_to_semantic_ref_index,
            indexes.timestamp_index,
        )
        device_scope = await executor._eval_scope(expr.get_scope_expr, context)
        context2 = QueryEvalContext(
            conv,
            indexes.property_to_semantic_ref_index,
            indexes.timestamp_index,
        )
        host_scope = await expr.get_scope_expr.eval(context2)

        def ranges_of(scope):
            return [
                [
                    (
                        r.start.message_ordinal,
                        r.start.chunk_ordinal,
                        (r.end.message_ordinal, r.end.chunk_ordinal)
                        if r.end
                        else None,
                    )
                    for r in coll
                ]
                for coll in (scope.text_ranges or [])
            ]

        assert ranges_of(device_scope) == ranges_of(host_scope), (qi, when)
    assert checked >= 15


async def test_differential_through_compact_transfer(monkeypatch):
    """The sparse-compaction transfer path (large conversations) must be
    invisible to correctness: re-run the randomized differential with the
    cap forced low enough that every fused call takes the compact route
    (including overflow->dense fallbacks when a query matches more)."""
    from typeagent_tpu.ops import postings as P

    calls = []
    real = P.accumulate_postings_segmented_compact

    def counting(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 16)
    monkeypatch.setattr(P, "_COMPACT_CAP", 8)
    monkeypatch.setattr(P, "_COMPACT_FETCH_BUCKETS", (4, 8))
    monkeypatch.setattr(P, "accumulate_postings_segmented_compact", counting)
    # The COO sparse route would intercept first; force the dense/compact
    # transfer path this test pins.
    monkeypatch.setattr(
        P.DevicePostingsIndex, "lookup_ops_sparse", lambda self, *a, **k: None
    )
    covered, total = await run_differential(31337, 25)
    assert covered >= int(0.85 * total), (covered, total)
    assert calls  # the compact route actually ran


async def test_differential_compact_no_overflow(monkeypatch):
    """Same with a cap big enough that no segment overflows: the sliced
    fetch + host re-expansion path end-to-end."""
    from typeagent_tpu.ops import postings as P

    calls = []
    real = P.accumulate_postings_segmented_compact

    def counting(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 48)
    monkeypatch.setattr(P, "_COMPACT_CAP", 24)
    monkeypatch.setattr(P, "_COMPACT_FETCH_BUCKETS", (8, 24))
    monkeypatch.setattr(P, "accumulate_postings_segmented_compact", counting)
    monkeypatch.setattr(
        P.DevicePostingsIndex, "lookup_ops_sparse", lambda self, *a, **k: None
    )
    covered, total = await run_differential(777, 25)
    assert covered >= int(0.85 * total), (covered, total)
    assert calls  # the compact route actually ran


async def test_differential_through_sparse_union_combine(monkeypatch):
    """The union-compressed combine (large conversations) must be invisible
    to correctness: force the sparse route (low cap) and verify it is the
    one actually taken by asserting lookup_ops_sparse returns non-None."""
    from typeagent_tpu.ops import postings as P
    from typeagent_tpu.ops.postings import DevicePostingsIndex

    sparse_hits = []
    real = DevicePostingsIndex.lookup_ops_sparse

    def counting(self, *args, **kwargs):
        out = real(self, *args, **kwargs)
        sparse_hits.append(out is not None)
        return out

    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 32)
    monkeypatch.setattr(P, "_COMPACT_CAP", 16)
    monkeypatch.setattr(P, "_COMPACT_FETCH_BUCKETS", (8, 16))
    monkeypatch.setattr(DevicePostingsIndex, "lookup_ops_sparse", counting)
    covered, total = await run_differential(2024, 25)
    assert covered >= int(0.85 * total), (covered, total)
    assert any(sparse_hits)  # the union combine actually ran


async def test_differential_under_tiny_device_budgets(monkeypatch):
    """Budget pressure must never change RESULTS — only call shapes.

    Shrinks every packing budget (dense entries, sparse entries, gather
    elements) and the compact cap so plan groups constantly re-pack, the
    sparse->dense fallback re-checks the dense budgets, and member chunks
    split; the differential still must match the host VM everywhere."""
    from typeagent_tpu.knowpro import device_executor as DE
    from typeagent_tpu.ops import postings as P

    monkeypatch.setenv("TAT_GROUP_THREADS", "1")  # cover the threaded branch
    monkeypatch.setattr(P, "_SPARSE_MIN_CAP", 32)
    monkeypatch.setattr(P, "_COMPACT_CAP", 16)
    monkeypatch.setattr(P, "_COMPACT_FETCH_BUCKETS", (8, 16))
    monkeypatch.setattr(DE, "_MAX_DENSE_ENTRIES", 8 * 1024)
    monkeypatch.setattr(DE, "_MAX_SPARSE_ENTRIES", 16 * 1024)
    monkeypatch.setattr(DE, "_MAX_GATHER_ELEMENTS", 4 * 1024)
    covered, total = await run_differential(4242, 25)
    # Tiny budgets legitimately push more queries to the host VM; whatever
    # stays device-routed must agree (assert_results_equivalent inside).
    assert total == 25
