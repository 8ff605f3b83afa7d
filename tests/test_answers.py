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
