"""Corpus-seeded mutation differential: device executor == host VM.

Takes the reference's 67 real compiled query trees (Episode-53 corpus) and
applies deterministic structural mutations — boolean-op swaps, weight
perturbations, related-term truncation, scope stripping, knowledge-type
pins — then asserts both query engines agree on every mutant. Mutants stay
production-shaped (they start from real stage-2 output), which stresses the
device executor's compile/fallback boundary far better than synthetic
trees.
"""

import copy
import json
import random

import pytest

from typeagent_tpu.knowpro.search import SearchOptions, run_search_query
from typeagent_tpu.tools import eval_episode53 as ev

pytestmark = pytest.mark.skipif(
    not ev.corpus_available(), reason="reference Episode-53 corpus not available"
)


@pytest.fixture(scope="module")
def conversation():
    import asyncio

    return asyncio.new_event_loop().run_until_complete(
        ev.load_episode53_conversation()
    )


def _walk_terms(node):
    """Yield every term dict (search / property / group) in a compiled tree."""
    yield node
    for t in node.get("terms", []):
        yield from _walk_terms(t)


def _mutate(compiled: dict, rng: random.Random) -> dict:
    """One randomized structural mutation of a compiled-query JSON tree."""
    tree = copy.deepcopy(compiled)
    ops = []
    for se in tree["selectExpressions"]:
        group = se["searchTermGroup"]
        terms = [t for t in _walk_terms(group)]
        groups = [t for t in terms if "booleanOp" in t]
        searches = [t for t in terms if "term" in t]
        props = [t for t in terms if "propertyName" in t]

        if groups and rng.random() < 0.5:
            g = rng.choice(groups)
            g["booleanOp"] = rng.choice(["or", "or_max", "and"])
            ops.append(f"op->{g['booleanOp']}")
        if searches and rng.random() < 0.6:
            s = rng.choice(searches)
            s["term"]["weight"] = round(rng.uniform(0.1, 150.0), 3)
            ops.append("weight")
        if searches and rng.random() < 0.5:
            s = rng.choice(searches)
            rel = s.get("relatedTerms") or []
            s["relatedTerms"] = rel[: rng.randrange(0, len(rel) + 1)]
            ops.append("truncate-related")
        if props and rng.random() < 0.3:
            p = rng.choice(props)
            pv = p["propertyValue"]
            pv["term"]["weight"] = round(rng.uniform(1.0, 100.0), 3)
            ops.append("prop-weight")
        when = se.get("when")
        if when and rng.random() < 0.4:
            se["when"] = None
            ops.append("drop-when")
        elif rng.random() < 0.2:
            se["when"] = {"knowledgeType": rng.choice(["entity", "topic", "action"])}
            ops.append("pin-ktype")
    return tree


def _assert_equivalent(dev_results, host_results, detail):
    """Tolerant equivalence: exact ordinal/order parity modulo float32-vs-
    float64 drift, via the established differential comparators."""
    from tests.test_device_vm_differential import (
        assert_results_equivalent,
        assert_sequences_equivalent,
    )

    assert len(dev_results) == len(host_results), detail
    for rd, rh in zip(dev_results, host_results):
        assert_results_equivalent(rd.knowledge_matches, rh.knowledge_matches, detail)
        dev_msgs = [(m.message_ordinal, float(m.score)) for m in rd.message_matches]
        host_msgs = [(m.message_ordinal, float(m.score)) for m in rh.message_matches]
        assert_sequences_equivalent(dev_msgs, host_msgs, (detail, "messages"))


async def test_mutated_corpus_device_matches_vm(conversation):
    corpus = ev.load_query_corpus()
    rng = random.Random(53)
    mutants = []
    for _ in range(24):
        entry = rng.choice(corpus)
        mutants.append((entry["searchText"], _mutate(entry["compiledQueryExpr"][0], rng)))

    for text, tree in mutants:
        expr_host = ev.load_compiled_query_expr(tree)
        expr_dev = ev.load_compiled_query_expr(tree)
        oh = SearchOptions(exact_match=False, max_message_matches=25)
        oh.use_device_executor = False
        od = SearchOptions(exact_match=False, max_message_matches=25)
        od.use_device_executor = True
        rh = await run_search_query(conversation, expr_host, oh, text)
        rd = await run_search_query(conversation, expr_dev, od, text)
        _assert_equivalent(
            rd, rh, f"mutant of {text!r}: {json.dumps(tree)[:300]}"
        )
