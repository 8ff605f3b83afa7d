"""Benchmark/tool harnesses run in-process at tiny sizes.

(Parity role: reference tests/test_benchmark_embeddings.py and
test_repeat_embedding_benchmarks.py — the benchmark drivers themselves are
tested so perf tooling doesn't rot.)
"""

import os

import pytest

from typeagent_tpu.utils.metrics import METRICS
from typeagent_tpu.utils.trace import current_span, span

REFERENCE_FIXTURE = "/root/reference/tests/testdata/Episode_53_AdrianTchaikovsky_index"


def test_run_benchmark_small():
    from typeagent_tpu.tools.benchmark_vectorstore import run_benchmark

    stats = run_benchmark(n_vectors=512, dim=16, max_hits=5, iterations=2, batch=4)
    assert stats["n_vectors"] == 512
    assert stats["qps"] > 0
    assert stats["min_us"] <= stats["median_us"] <= stats["max_us"]


def test_semref_write_benchmark_fixture():
    from typeagent_tpu.tools.benchmark_semref_writes import make_refs

    refs, terms = make_refs(20)
    assert len(refs) == 20
    assert all(r.semantic_ref_ordinal == i for i, r in enumerate(refs))
    assert terms and all(isinstance(t[0], str) for t in terms)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_FIXTURE + "_data.json"),
    reason="reference fixture not available",
)
async def test_load_json_to_sqlite(tmp_path, monkeypatch):
    monkeypatch.setenv("OPENAI_EMBEDDING_MODEL", "test:1536")
    from typeagent_tpu.tools.load_json import load_json_to_sqlite

    db = str(tmp_path / "loaded.db")
    await load_json_to_sqlite(REFERENCE_FIXTURE, db)

    import sqlite3

    con = sqlite3.connect(db)
    n_msgs = con.execute("SELECT COUNT(*) FROM Messages").fetchone()[0]
    n_refs = con.execute("SELECT COUNT(*) FROM SemanticRefs").fetchone()[0]
    n_terms = con.execute(
        "SELECT COUNT(DISTINCT term) FROM SemanticRefIndex"
    ).fetchone()[0]
    con.close()
    assert n_msgs == 106
    assert n_refs > 1000
    assert n_terms > 1000


def test_trace_spans_nest_and_record():
    with span("outer", conversation="x") as outer:
        assert current_span() is outer
        with span("inner") as inner:
            assert inner.parent is outer
            assert inner.path == "outer/inner"
            inner.set(rows=3)
    assert current_span() is None
    stats = METRICS.stats("span.outer/inner")
    assert stats is not None and stats.count >= 1


async def test_benchmark_embeddings_self_retrieval_sweep(tmp_path, capsys):
    """The retrieval-quality harness: every message retrieves itself at
    min_score 0 on a fresh conversation (hit rate 1.0, MRR 1.0)."""
    from typeagent_tpu import create_conversation
    from typeagent_tpu.knowpro.convsettings import ConversationSettings
    from typeagent_tpu.knowpro.universal_message import (
        ConversationMessage,
        ConversationMessageMeta,
    )
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.tools.benchmark_embeddings import evaluate

    db = str(tmp_path / "quality.db")
    settings = ConversationSettings(model=create_test_embedding_model(16))
    settings.semantic_ref_index_settings.auto_extract_knowledge = False
    conv = await create_conversation(db, ConversationMessage, settings=settings)
    await conv.add_messages_with_indexing(
        [
            ConversationMessage([t], ConversationMessageMeta("A"))
            for t in ("alpha facts", "beta figures", "gamma findings")
        ]
    )
    await conv.storage_provider.close()

    await evaluate(
        db=db,
        index_path=None,
        min_scores=[0.0],
        max_hits_list=[3],
        embedding_model_spec="test:16",
        limit=None,
    )
    out = capsys.readouterr().out
    assert "Evaluating self-retrieval over 3 messages" in out
    row = [line for line in out.splitlines() if line.strip().startswith("0.00")][0]
    cols = row.split()
    assert cols == ["0.00", "3", "1.000", "1.000"]


async def test_benchmark_pipeline_stages(capsys):
    """The full-pipeline benchmark's deterministic stage-1 queries drive
    stages 2-4 end-to-end (host engine, tiny scale) and the per-stage
    metrics registry records both timers."""
    import random

    from typeagent_tpu.tools.benchmark_pipeline import (
        make_search_queries,
        run_pipeline,
    )
    from typeagent_tpu.tools.benchmark_engine import build_conversation
    from typeagent_tpu.utils.metrics import MetricsRegistry

    rng = random.Random(3)
    conv = await build_conversation(40, rng)
    queries = make_search_queries(6, rng)
    reg = MetricsRegistry()
    contexts = await run_pipeline(conv, queries, use_device=False, reg=reg)
    assert contexts > 0  # stage 4 produced entities/topics/messages
    report = reg.report()["latency"]
    assert report["stage2+3.search"]["count"] == 6
    assert report["stage4.context"]["count"] == 6


async def test_benchmark_pipeline_concurrent_matches_sequential(capsys):
    """N concurrent query() pipelines (verdict r4 #4) produce the same
    contexts as the sequential run — the async subset re-rank and
    off-loop device-executor fetches change scheduling, never results."""
    import random

    from typeagent_tpu.tools.benchmark_pipeline import (
        make_search_queries,
        run_pipeline,
        run_pipeline_concurrent,
    )
    from typeagent_tpu.tools.benchmark_engine import build_conversation
    from typeagent_tpu.utils.metrics import MetricsRegistry

    rng = random.Random(5)
    conv = await build_conversation(40, rng)
    queries = make_search_queries(8, rng)
    for use_device in (False, True):
        seq = await run_pipeline(
            conv, queries, use_device=use_device, reg=MetricsRegistry()
        )
        creg = MetricsRegistry()
        conc = await run_pipeline_concurrent(
            conv, queries, use_device=use_device, reg=creg, concurrency=4
        )
        assert conc == seq
        assert creg.report()["latency"]["stage2+3.search"]["count"] == 8
