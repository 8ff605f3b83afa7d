"""Answers stage: context building, merging, concurrency, fast-stop."""

import asyncio
import json

import pytest

from tests.test_query_pipeline import build_conversation
from typeagent_tpu.knowpro import answers
from typeagent_tpu.knowpro.answer_response_schema import AnswerResponse
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
from typeagent_tpu.models.adapters import FakeChatModel


async def search_bach(conv):
    return await search_conversation(
        conv,
        SearchTermGroup(
            boolean_op="or",
            terms=[SearchTerm(Term("Bach")), SearchTerm(Term("classical music"))],
        ),
        options=SearchOptions(exact_match=True),
        raw_search_query="What do we know about Bach?",
    )


async def test_make_context_merges_entities_and_topics():
    conv = await build_conversation()
    result = await search_bach(conv)
    context = await answers.make_context(result, conv)
    entity_names = [k.knowledge.name for k in context.entities]
    assert "bach" in entity_names
    # Source-ordinal enrichment: origin/audience/time range from messages.
    bach = next(k for k in context.entities if k.knowledge.name == "bach")
    assert bach.time_range is not None
    topic_texts = [k.knowledge.text for k in context.topics]
    assert "classical music" in topic_texts
    assert context.messages  # message matches included


async def test_generate_answer_prompt_contains_context():
    conv = await build_conversation()
    result = await search_bach(conv)
    model = FakeChatModel(
        [json.dumps({"type": "Answered", "answer": "Bach composed them."})]
    )
    translator = answers.create_answer_translator(model)
    answer = await answers.generate_answer(translator, result, conv)
    assert answer.type == "Answered"
    prompt_text = "".join(s["content"] for s in model.prompts[0])
    assert "[ANSWER CONTEXT]" in prompt_text
    assert "What do we know about Bach?" in prompt_text
    assert "bach" in prompt_text  # merged entity made it into the context


async def test_generate_answers_combines_multiple():
    conv = await build_conversation()
    result = await search_bach(conv)
    model = FakeChatModel(
        [
            json.dumps({"type": "Answered", "answer": "Part one."}),
            json.dumps({"type": "Answered", "answer": "Part two."}),
            json.dumps({"type": "Answered", "answer": "Part one and part two."}),
        ]
    )
    translator = answers.create_answer_translator(model)
    all_answers, combined = await answers.generate_answers(
        translator, [result, result], conv, "question?"
    )
    assert len(all_answers) == 2
    assert combined.answer == "Part one and part two."
    # The combine prompt lists the partial answers.
    combine_prompt = "".join(s["content"] for s in model.prompts[-1])
    assert "Part one." in combine_prompt and "Part two." in combine_prompt


async def test_generate_answers_no_answer_path():
    conv = await build_conversation()
    result = await search_bach(conv)
    model = FakeChatModel(
        [
            json.dumps({"type": "NoAnswer", "whyNoAnswer": "nothing relevant"}),
            json.dumps({"type": "NoAnswer", "whyNoAnswer": "still nothing"}),
        ]
    )
    translator = answers.create_answer_translator(model)
    _, combined = await answers.generate_answers(
        translator, [result, result], conv, "question?"
    )
    assert combined.type == "NoAnswer"


async def test_fast_stop_skips_pending_results():
    conv = await build_conversation()
    result = await search_bach(conv)

    class SlowFake:
        def __init__(self):
            self.calls = 0

        async def complete(self, prompt):
            self.calls += 1
            from typeagent_tpu.models.result import Success

            return Success(json.dumps({"type": "Answered", "answer": "Got it."}))

    model = SlowFake()
    translator = answers.create_answer_translator(model)
    settings = answers.AnswerGeneratorSettings(concurrency=1, fast_stop=True)
    all_answers, combined = await answers.generate_answers(
        translator, [result] * 5, conv, "q?", settings=settings
    )
    # First good answer short-circuits the remaining four.
    assert len(all_answers) == 1
    assert combined.answer == "Got it."
    assert model.calls == 1


def test_dictify_drops_none_and_integral_floats():
    data = answers.dictify(
        {"a": None, "b": [1.0, 2.5], "c": {"d": None, "e": "x"}}
    )
    assert data == {"b": [1, 2.5], "c": {"e": "x"}}


# ---------------------------------------------------------------------------
# Merging helpers (facets, entities, topics)
# ---------------------------------------------------------------------------


def _scored_entity(name, types, facets=None, score=1.0, msg=0):
    from typeagent_tpu.knowpro import kplib
    from typeagent_tpu.knowpro.collections import Scored
    from typeagent_tpu.knowpro.interfaces import (
        SemanticRef,
        TextLocation,
        TextRange,
    )

    ref = SemanticRef(
        0,
        TextRange(TextLocation(msg, 0)),
        kplib.ConcreteEntity(name, types, facets=facets),
    )
    return Scored(ref, score)


def _scored_topic(text, score=1.0, msg=0):
    from typeagent_tpu.knowpro import kplib
    from typeagent_tpu.knowpro.collections import Scored
    from typeagent_tpu.knowpro.interfaces import (
        SemanticRef,
        TextLocation,
        TextRange,
    )

    from typeagent_tpu.knowpro.interfaces import Topic

    ref = SemanticRef(0, TextRange(TextLocation(msg, 0)), Topic(text))
    return Scored(ref, score)


def test_facets_merge_values_and_lowercase():
    from typeagent_tpu.knowpro import kplib

    merged = answers.facets_to_merged_facets(
        [
            kplib.Facet("Era", "Baroque"),
            kplib.Facet("era", "LATE baroque"),
            kplib.Facet("count", 2.5),
            kplib.Facet("verified", True),
        ]
    )
    assert merged["era"] == ["baroque", "late baroque"]
    assert merged["count"] == ["2.5"]
    assert merged["verified"] == ["true"]
    facets = answers.merged_facets_to_facets(merged)
    by_name = {f.name: f.value for f in facets}
    assert by_name["era"] == "baroque; late baroque"


def test_merge_entities_unions_types_and_facets_keeps_max_score():
    from typeagent_tpu.knowpro import kplib

    merged = answers.merge_scored_concrete_entities(
        [
            _scored_entity(
                "Bach", ["Person"], [kplib.Facet("era", "baroque")], 0.5, msg=1
            ),
            _scored_entity(
                "BACH", ["composer"], [kplib.Facet("era", "late")], 0.9, msg=3
            ),
            _scored_entity("Gould", ["pianist"], None, 0.7, msg=2),
        ],
        merge_ordinals=True,
    )
    assert set(merged) == {"bach", "gould"}
    bach = merged["bach"]
    assert bach.score == 0.9  # max
    assert bach.item.type == ["composer", "person"]  # sorted union, lowered
    assert bach.item.facets["era"] == ["baroque", "late"]
    assert bach.item.source_message_ordinals == {1, 3}
    entity = answers.merged_to_concrete_entity(bach.item)
    assert entity.name == "bach"
    assert entity.facets[0].value == "baroque; late"


def test_merge_topics_dedupes_by_text_max_score():
    merged = answers.merge_scored_topics(
        [
            _scored_topic("music", 0.4, msg=0),
            _scored_topic("music", 0.8, msg=5),
            _scored_topic("art", 0.6, msg=1),
        ],
        merge_ordinals=True,
    )
    assert set(merged) == {"music", "art"}
    assert merged["music"].score == 0.8
    assert merged["music"].item.source_message_ordinals == {0, 5}


# ---------------------------------------------------------------------------
# Enclosing ranges
# ---------------------------------------------------------------------------


def test_text_range_from_message_range():
    from typeagent_tpu.knowpro.interfaces import TextLocation

    point = answers.text_range_from_message_range(3, 3)
    assert point.start == TextLocation(3) and point.end is None
    span = answers.text_range_from_message_range(1, 4)
    assert span.start == TextLocation(1) and span.end == TextLocation(4)
    with pytest.raises(ValueError):
        answers.text_range_from_message_range(4, 1)


def test_get_enclosing_text_range():
    r = answers.get_enclosing_text_range([7, 2, 5])
    assert r.start.message_ordinal == 2 and r.end.message_ordinal == 7
    assert answers.get_enclosing_text_range([]) is None
    point = answers.get_enclosing_text_range([4])
    assert point.start.message_ordinal == 4 and point.end is None


async def test_enclosing_date_range_from_messages():
    conv = await build_conversation()
    dr = await answers.get_enclosing_data_range_for_messages(
        conv.messages, [0, 2]
    )
    assert dr is not None
    assert dr.start.day == 1
    assert dr.end is not None and dr.end.day == 2
    # Single ordinal -> point range, no end.
    point = await answers.get_enclosing_data_range_for_messages(conv.messages, [1])
    assert point.end is None
    # No ordinals -> None.
    assert (
        await answers.get_enclosing_data_range_for_messages(conv.messages, [])
        is None
    )


async def test_enclosing_metadata_collects_speakers_and_listeners():
    conv = await build_conversation()
    meta = await answers.get_enclosing_metadata_for_messages(
        conv.messages, [0, 1, 2]
    )
    assert set(meta.source) == {"Alice", "Bob"}
    assert set(meta.dest) == {"Alice", "Bob"}


# ---------------------------------------------------------------------------
# Concurrency limit
# ---------------------------------------------------------------------------


async def test_generate_answers_respects_concurrency_limit():
    conv = await build_conversation()
    result = await search_bach(conv)
    results = [result] * 6

    active = {"now": 0, "peak": 0}

    class SlowModel:
        model_name = "slow"

        async def complete(self, prompt):
            from typeagent_tpu.models.result import Success

            active["now"] += 1
            active["peak"] = max(active["peak"], active["now"])
            await asyncio.sleep(0.02)
            active["now"] -= 1
            return Success(json.dumps({"type": "NoAnswer", "whyNoAnswer": "x"}))

    translator = answers.create_answer_translator(SlowModel())
    settings = answers.AnswerGeneratorSettings(concurrency=2, fast_stop=False)
    collected, combined = await answers.generate_answers(
        translator, results, conv, "q?", settings=settings
    )
    assert len(collected) == 6
    assert active["peak"] <= 2


async def test_fast_stop_false_processes_all():
    conv = await build_conversation()
    result = await search_bach(conv)
    results = [result] * 4
    calls = {"n": 0}

    class CountingModel:
        model_name = "counting"

        async def complete(self, prompt):
            from typeagent_tpu.models.result import Success

            calls["n"] += 1
            return Success(
                json.dumps({"type": "Answered", "answer": f"answer {calls['n']}"})
            )

    translator = answers.create_answer_translator(CountingModel())
    settings = answers.AnswerGeneratorSettings(concurrency=1, fast_stop=False)
    collected, _ = await answers.generate_answers(
        translator, results, conv, "q?", settings=settings
    )
    # fast_stop off: every result generated an answer (+1 combine call).
    assert len(collected) == 4
    assert calls["n"] >= 4
