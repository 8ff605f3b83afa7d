"""Device query executor vs the host query VM on a real conversation."""

import numpy as np
import pytest

from tests.test_query_pipeline import build_conversation
from typeagent_tpu.knowpro.device_executor import DeviceQueryExecutor
from typeagent_tpu.knowpro.interfaces import (
    PropertySearchTerm,
    SearchTerm,
    SearchTermGroup,
    Term,
)
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation_knowledge


def host_options(**kw):
    return SearchOptions(exact_match=True, use_device_executor=False, **kw)


async def both_results(conv, group, **kwargs):
    host = await search_conversation_knowledge(conv, group, options=host_options())
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    device = await executor.search(group, **kwargs)
    return host, device


def as_score_map(result):
    if not result:
        return {}
    return {
        (ktype, m.semantic_ref_ordinal): m.score
        for ktype, r in result.items()
        for m in r.semantic_ref_matches
    }


async def test_flat_or_matches_host_vm():
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[
            SearchTerm(Term("Bach", weight=10.0)),
            SearchTerm(Term("harpsichord", weight=2.0)),
        ],
    )
    host, device = await both_results(conv, group)
    # Exact parity including the x10 entity boost (device replicates the
    # booster via name/type property membership masks).
    assert as_score_map(device) == pytest.approx(as_score_map(host))
    assert as_score_map(device)


async def test_property_terms_match_host_vm():
    conv = await build_conversation()
    # NOTE: action property names (subject/verb/object/indirectObject) are
    # scope-defining in the compiler, so use entity properties here.
    group = SearchTermGroup(
        boolean_op="or",
        terms=[
            PropertySearchTerm("name", SearchTerm(Term("Bach"), related_terms=[])),
            PropertySearchTerm(
                "type", SearchTerm(Term("pianist"), related_terms=[])
            ),
        ],
    )
    host, device = await both_results(conv, group)
    assert as_score_map(device) == pytest.approx(as_score_map(host))


async def test_action_property_scope_matches_host_vm():
    """Host applies action-term scope; device gets the same scope explicitly."""
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[
            PropertySearchTerm("name", SearchTerm(Term("Bach"), related_terms=[])),
            PropertySearchTerm(
                "subject", SearchTerm(Term("Glenn Gould"), related_terms=[])
            ),
        ],
    )
    host = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True)
    )
    # The subject term scopes to its matching messages: only the action on
    # message 2 survives; the Bach entity on message 1 is out of scope.
    assert set(host) == {"action"}


async def test_device_scope_filtering():
    conv = await build_conversation()
    from typeagent_tpu.knowpro.collections import (
        TextRangeCollection,
        TextRangesInScope,
    )
    from typeagent_tpu.knowpro.interfaces import TextLocation, TextRange

    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    # Scope to message 0 only: the Bach knowledge lives on message 1.
    scope = TextRangesInScope()
    scope.add_text_ranges(
        TextRangeCollection([TextRange(TextLocation(0), TextLocation(1))])
    )
    result = await executor.search(group, ranges_in_scope=scope)
    assert result == {}
    # Scope covering message 1 finds it.
    scope2 = TextRangesInScope()
    scope2.add_text_ranges(
        TextRangeCollection([TextRange(TextLocation(0), TextLocation(3))])
    )
    result = await executor.search(group, ranges_in_scope=scope2)
    assert result and "entity" in result


async def test_device_executor_handles_complex_groups():
    """Nested groups, AND groups and topic wildcards run on device with
    exact host-VM parity (round-1 fallbacks, now first-class)."""
    conv = await build_conversation()
    groups = [
        SearchTermGroup(
            boolean_op="or",
            terms=[
                SearchTermGroup(boolean_op="and", terms=[SearchTerm(Term("x"))])
            ],
        ),
        SearchTermGroup(boolean_op="and", terms=[SearchTerm(Term("x"))]),
        SearchTermGroup(
            boolean_op="or",
            terms=[PropertySearchTerm("topic", SearchTerm(Term("*")))],
        ),
        SearchTermGroup(
            boolean_op="and",
            terms=[SearchTerm(Term("Bach")), SearchTerm(Term("composer"))],
        ),
        SearchTermGroup(
            boolean_op="or",
            terms=[
                SearchTerm(Term("harpsichord")),
                SearchTermGroup(
                    boolean_op="and",
                    terms=[
                        SearchTerm(Term("Bach")),
                        SearchTerm(Term("composer")),
                    ],
                ),
            ],
        ),
    ]
    for group in groups:
        host, device = await both_results(conv, group)
        assert device is not None, group
        assert as_score_map(device) == pytest.approx(as_score_map(host)), group
    # The wildcard topic scan actually matched something.
    host, device = await both_results(conv, groups[2])
    assert "topic" in device


async def test_device_related_terms_accumulate():
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[
            SearchTerm(
                Term("nonexistent-main", weight=10.0),
                related_terms=[Term("bach", weight=0.9)],
            )
        ],
    )
    host, device = await both_results(conv, group)
    assert device and "entity" in device
    assert as_score_map(device) == pytest.approx(as_score_map(host))
    # Related-only matches score at related weight x the entity boost (the
    # related text matches the entity's name, reference boost_entities).
    top = device["entity"].semantic_ref_matches[0]
    assert top.score == pytest.approx(9.0)


async def test_public_api_device_executor_flag():
    """SearchOptions(use_device_executor=True) through the normal entry point."""
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[SearchTerm(Term("Bach")), SearchTerm(Term("harpsichord"))],
    )
    host = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True)
    )
    device = await search_conversation_knowledge(
        conv,
        group,
        options=SearchOptions(exact_match=True, use_device_executor=True),
    )
    assert set(as_score_map(device)) == set(as_score_map(host))
    # Complex group falls back to the host VM transparently.
    nested = SearchTermGroup(
        boolean_op="and",
        terms=[SearchTerm(Term("Bach")), SearchTerm(Term("classical music"))],
    )
    via_flag = await search_conversation_knowledge(
        conv, nested, options=SearchOptions(exact_match=True, use_device_executor=True)
    )
    direct = await search_conversation_knowledge(
        conv, nested, options=SearchOptions(exact_match=True)
    )
    assert as_score_map(via_flag) == as_score_map(direct)


async def test_incremental_sync_matches_full_rebuild():
    """After more ingest, executor.sync() folds only the new semrefs and
    agrees exactly with a freshly built executor."""
    from typeagent_tpu.knowpro import kplib
    from typeagent_tpu.knowpro.semrefindex import (
        add_knowledge_batch_to_semantic_ref_index,
    )
    from typeagent_tpu.knowpro.propindex import add_to_property_index

    conv = await build_conversation()
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    n_before = executor._n_semrefs

    knowledge = kplib.KnowledgeResponse(
        entities=[
            kplib.ConcreteEntity(
                "Wanda Landowska",
                ["person", "harpsichordist"],
                facets=[kplib.Facet("era", "20th century")],
            )
        ],
        actions=[
            kplib.Action(
                verbs=["perform"],
                verb_tense="past",
                subject_entity_name="Wanda Landowska",
                object_entity_name="Goldberg Variations",
            )
        ],
        inverse_actions=[],
        topics=["harpsichord revival"],
    )
    start = await conv.semantic_refs.size()
    await add_knowledge_batch_to_semantic_ref_index(conv, [(2, 0, knowledge)])
    await add_to_property_index(conv, start)

    await executor.sync()  # incremental path
    assert executor._n_semrefs > n_before

    fresh = DeviceQueryExecutor(conv)
    await fresh.sync()  # full rebuild

    groups = [
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Wanda Landowska"))]),
        SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    "name", SearchTerm(Term("wanda landowska"), related_terms=[])
                ),
                PropertySearchTerm(
                    "type", SearchTerm(Term("harpsichordist"), related_terms=[])
                ),
            ],
        ),
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))]),
        SearchTermGroup(
            boolean_op="or", terms=[SearchTerm(Term("harpsichord revival"))]
        ),
    ]
    for group in groups:
        inc = await executor.search(group)
        full = await fresh.search(group)
        assert as_score_map(inc) == pytest.approx(as_score_map(full))
        assert inc  # the new knowledge is findable
    # Old knowledge still intact via the incremental executor.
    old = await executor.search(
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    )
    assert old and "entity" in old


async def test_or_max_hit_count_filter_matches_host():
    """or_max keeps only matches at the max exact-hit count (> 1), device
    and host identically."""
    conv = await build_conversation()
    # "Bach" + "composer": the Bach entity matches both (name + type);
    # other semrefs match at most one.
    group = SearchTermGroup(
        boolean_op="or_max",
        terms=[
            SearchTerm(Term("Bach")),
            SearchTerm(Term("composer")),
        ],
    )
    host = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True)
    )
    device = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True, use_device_executor=True)
    )
    host_keys = as_score_map(host)
    device_keys = as_score_map(device)
    assert set(device_keys) == set(host_keys) != set()
    # The max-hit filter fired: every surviving entity matched both terms.
    for (ktype, ordinal) in device_keys:
        if ktype == "entity":
            sr = await conv.semantic_refs.get_item(ordinal)
            assert sr.knowledge.name == "Bach"


async def test_related_term_per_subexpression_parity():
    """Round-1's fused-accumulator parity guards are gone: per-sub-expression
    segmented accumulation handles multi-subterm related groups, multi-
    related subterms and duplicate term texts with exact VM parity."""
    conv = await build_conversation()
    groups = [
        # Multiple subterms + related terms (add_if_new is per-subexpression).
        SearchTermGroup(
            boolean_op="or",
            terms=[
                SearchTerm(
                    Term("Bach"), related_terms=[Term("composer", weight=0.9)]
                ),
                SearchTerm(Term("harpsichord")),
            ],
        ),
        # One subterm, several related terms (first-adder rule).
        SearchTermGroup(
            boolean_op="or",
            terms=[
                SearchTerm(
                    Term("Bach"),
                    related_terms=[
                        Term("composer", weight=0.9),
                        Term("organist", weight=0.8),
                    ],
                )
            ],
        ),
        # Identical duplicate term texts (matched_terms dedupe).
        SearchTermGroup(
            boolean_op="or",
            terms=[SearchTerm(Term("Bach")), SearchTerm(Term("Bach", weight=2.0))],
        ),
        # Related terms under or_max.
        SearchTermGroup(
            boolean_op="or_max",
            terms=[
                SearchTerm(
                    Term("Bach"), related_terms=[Term("organist", weight=0.7)]
                ),
                SearchTerm(Term("composer")),
            ],
        ),
    ]
    for group in groups:
        host, device = await both_results(conv, group)
        assert device is not None, group
        assert as_score_map(device) == pytest.approx(as_score_map(host)), group
    # The public API routes through the device engine by default.
    via_default = await search_conversation_knowledge(
        conv, groups[0], options=SearchOptions(exact_match=True)
    )
    direct = await search_conversation_knowledge(
        conv, groups[0], options=host_options()
    )
    assert as_score_map(via_default) == pytest.approx(as_score_map(direct))
    assert as_score_map(direct) != {}


async def test_or_max_with_scope_on_device():
    """or_max and scope filtering compose in one device program."""
    from typeagent_tpu.knowpro.collections import (
        TextRangeCollection,
        TextRangesInScope,
    )
    from typeagent_tpu.knowpro.interfaces import TextLocation, TextRange

    conv = await build_conversation()
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    group = SearchTermGroup(
        boolean_op="or_max",
        terms=[SearchTerm(Term("Bach")), SearchTerm(Term("composer"))],
    )
    # Scope includes message 1 (where Bach lives): or_max keeps the 2-hit
    # Bach entity.
    scope = TextRangesInScope()
    scope.add_text_ranges(
        TextRangeCollection([TextRange(TextLocation(0), TextLocation(2))])
    )
    result = await executor.search(group, ranges_in_scope=scope)
    assert result and "entity" in result
    top = await conv.semantic_refs.get_item(
        result["entity"].semantic_ref_matches[0].semantic_ref_ordinal
    )
    assert top.knowledge.name == "Bach"
    # Scope excluding message 1 removes everything.
    scope2 = TextRangesInScope()
    scope2.add_text_ranges(
        TextRangeCollection([TextRange(TextLocation(0), TextLocation(1))])
    )
    assert await executor.search(group, ranges_in_scope=scope2) == {}


async def test_shrunk_conversation_triggers_full_rebuild():
    """A semref count below the watermark (cleared/reloaded conversation)
    falls through to a full rebuild instead of corrupt incremental state."""
    conv = await build_conversation()
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    real_count = executor._n_semrefs
    executor._n_semrefs = real_count + 100  # simulate a stale watermark
    await executor.sync()  # count "shrank" -> full rebuild
    assert executor._n_semrefs == real_count
    result = await executor.search(
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    )
    assert result and "entity" in result


async def test_chunk_granular_scope_mask_matches_host_oracle():
    """_scope_mask (vectorized, chunk-granular) == is_range_in_scope for
    randomized selector collections over chunk-boundary semref ranges."""
    import numpy as np

    from typeagent_tpu.knowpro.collections import (
        TextRangeCollection,
        TextRangesInScope,
    )
    from typeagent_tpu.knowpro.interfaces import TextLocation, TextRange

    conv = await build_conversation()
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    n = executor._n_semrefs
    metadata = await conv.semantic_refs.get_metadata_multiple(list(range(n)))

    rng = np.random.default_rng(5)
    for trial in range(25):
        scope = TextRangesInScope()
        for _ in range(int(rng.integers(1, 3))):
            ranges = []
            for _ in range(int(rng.integers(1, 4))):
                sm = int(rng.integers(0, 4))
                sc = int(rng.integers(0, 3))
                if rng.random() < 0.4:
                    end = None  # point range (one chunk)
                else:
                    em = sm + int(rng.integers(0, 3))
                    ec = int(rng.integers(0, 3))
                    if (em, ec) <= (sm, sc):
                        em, ec = sm, sc + 1
                    end = TextLocation(em, ec)
                ranges.append(TextRange(TextLocation(sm, sc), end))
            scope.add_text_ranges(TextRangeCollection(ranges, True))
        mask = executor._scope_mask(scope)
        expect = np.array(
            [scope.is_range_in_scope(m.range) for m in metadata], dtype=bool
        )
        np.testing.assert_array_equal(mask, expect, err_msg=f"trial {trial}")


def test_engine_router_sampling_and_follow():
    from typeagent_tpu.knowpro.search import _EngineRouter

    r = _EngineRouter()
    # Samples each engine once before following anyone.
    assert r.pick() == "device"
    r.record("device", 50.0)
    assert r.pick() == "host"
    r.record("host", 10.0)
    # Host is faster -> follow host.
    assert r.pick() == "host"
    # EMA shift: device becomes much faster -> probe eventually flips route.
    for _ in range(r.PROBE_EVERY + 1):
        pick = r.pick()
        r.record(pick, 1.0 if pick == "device" else 100.0)
    assert r.pick() == "device"


async def test_auto_engine_route_matches_both_engines():
    """use_device_executor="auto" returns identical results while routing
    through BOTH engines across repeated calls (sampling phase)."""
    conv = await build_conversation()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[SearchTerm(Term("Bach")), SearchTerm(Term("harpsichord"))],
    )
    host = await search_conversation_knowledge(
        conv, group, options=SearchOptions(exact_match=True, use_device_executor=False)
    )
    results = [
        await search_conversation_knowledge(
            conv,
            group,
            options=SearchOptions(exact_match=True, use_device_executor="auto"),
        )
        for _ in range(4)
    ]
    for res in results:
        assert as_score_map(res) == pytest.approx(as_score_map(host))
    router = conv._engine_router
    assert router.ms["device"] is not None and router.ms["host"] is not None


def test_engine_route_env_default(monkeypatch):
    import importlib

    from typeagent_tpu.knowpro import search as S

    assert S._default_engine_route() in (True, "auto", False)
    monkeypatch.setenv("TAT_ENGINE_ROUTE", "auto")
    assert S._default_engine_route() == "auto"
    monkeypatch.setenv("TAT_ENGINE_ROUTE", "host")
    assert S._default_engine_route() is False
    monkeypatch.setenv("TAT_ENGINE_ROUTE", "device")
    assert S._default_engine_route() is True


async def test_string_host_option_routes_host(monkeypatch):
    """SearchOptions(use_device_executor="host") must run the host VM:
    bool("host") is True, so a bare bool() cast would silently route the
    explicit host request to the DEVICE engine."""
    from typeagent_tpu.knowpro import search as S

    assert S._route_device("host") is False
    assert S._route_device("vm") is False
    assert S._route_device("false") is False
    assert S._route_device("device") is True
    assert S._route_device(True) is True
    assert S._route_device(False) is False

    conv = await build_conversation()
    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])

    def boom(*a, **k):  # pragma: no cover - the failure signal
        raise AssertionError("device executor must not run for 'host'")

    monkeypatch.setattr(S, "_try_device_executor", boom)
    got = await search_conversation_knowledge(
        conv,
        group,
        options=SearchOptions(exact_match=True, use_device_executor="host"),
    )
    want = await search_conversation_knowledge(
        conv, group, options=host_options()
    )
    assert as_score_map(got) == pytest.approx(as_score_map(want))


async def test_auto_router_converges_when_device_cannot_serve(monkeypatch):
    """If the device engine keeps returning None (inexpressible queries),
    the auto router must still collect a device sample (attempt + fallback
    cost) and converge to host instead of re-paying the futile attempt on
    every call."""
    from typeagent_tpu.knowpro import search as S

    conv = await build_conversation()
    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])

    async def no_device(*a, **k):
        return None

    monkeypatch.setattr(S, "_try_device_executor", no_device)
    opts = SearchOptions(exact_match=True, use_device_executor="auto")
    want = await search_conversation_knowledge(conv, group, options=host_options())
    for _ in range(3):
        got = await search_conversation_knowledge(conv, group, options=opts)
        assert as_score_map(got) == pytest.approx(as_score_map(want))
    router = conv._engine_router
    assert router.ms["device"] is not None  # the failed attempt was charged
    assert router.ms["host"] is not None
    # With both samples present the router follows an EMA instead of
    # force-probing device on every call (timing magnitudes at this tiny
    # scale are noise, so only the convergence mechanics are pinned).


async def test_auto_router_records_on_mixed_batches(monkeypatch):
    """A batch where the device answers only SOME queries must still feed
    the router: without per-engine samples from mixed batches, ms stays
    {None, None} and pick() routes device forever without ever probing the
    host (the futile per-batch fallback cost never converges away)."""
    from typeagent_tpu.knowpro import search as S
    from typeagent_tpu.knowpro.search import search_conversation_knowledge_batch

    conv = await build_conversation()
    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    selects = [(group, None), (group, None)]
    sentinel = {"entity": "device-answered"}

    class HalfDeviceExecutor:
        async def execute_batch(self, compiled, context):
            # First query device-answered, second inexpressible.
            return [sentinel, None]

    async def fake_get_executor(conversation):
        return HalfDeviceExecutor(), None

    monkeypatch.setattr(S, "_get_device_executor", fake_get_executor)
    opts = SearchOptions(exact_match=True, use_device_executor="auto")
    results = await search_conversation_knowledge_batch(conv, selects, opts)
    assert results[0] is sentinel
    assert results[1] is not None and results[1] is not sentinel
    router = conv._engine_router
    assert router.ms["device"] is not None  # mixed batch recorded a sample
    assert router.ms["host"] is not None


async def test_dropped_plan_falls_back_to_host(monkeypatch):
    """_run_plan_group may drop a plan that is too large even alone (COO
    run overflow + over-budget dense repack); search() must treat that as
    a host-VM-fallback signal, not crash on a missing key."""
    conv = await build_conversation()
    group = SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("Bach"))])
    executor = DeviceQueryExecutor(conv)
    await executor.sync()
    monkeypatch.setattr(
        executor, "_run_plan_group", lambda plans, force_dense=False: {}
    )
    assert await executor.search(group) is None
