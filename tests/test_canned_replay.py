"""Canned-LLM replay: the hermetic chat model behind the 4-stage golden eval.

Unit half: CannedChatModel's prompt routing (recorded stage-1 JSON, crafted
stage-4 answers, combine blending). Integration half (reference corpus
required): the full 4-stage pipeline — recorded stage-1 translation → real
stage-2/3 compile+search → real generate_answers/combine_answers over
crafted completions — reproduces the committed answer goldens byte for byte
(parity role: the answer half of reference ``make eval``, reference
`Makefile:38-42`, `tools/query.py:1275-1347`).
"""

import json
import pprint

import pytest

from typeagent_tpu.models.canned import CannedChatModel
from typeagent_tpu.models.result import Failure, Success
from typeagent_tpu.tools import eval_episode53 as ev

# ---------------------------------------------------------------------------
# Unit: prompt routing
# ---------------------------------------------------------------------------


def _msg(content: str) -> list[dict]:
    return [{"role": "user", "content": content}]


async def test_stage1_replays_recorded_translation():
    recorded = {"searchExpressions": [{"rewrittenQuery": "books?", "filters": []}]}
    model = CannedChatModel({"List all books": recorded})
    prompt = (
        'You are a service that translates user requests into JSON objects '
        'of type "SearchQuery".\n'
        'The following is the user request:\n"""\nList all books\n"""\n'
    )
    result = await model.complete(_msg(prompt))
    assert isinstance(result, Success)
    assert json.loads(result.value) == recorded
    assert model.calls["stage1"] == 1


async def test_stage1_unrecorded_question_fails():
    model = CannedChatModel({})
    prompt = '"SearchQuery"\n"""\nnever recorded\n"""\n'
    result = await model.complete(_msg(prompt))
    assert isinstance(result, Failure)


async def test_answer_crafts_from_context_entities_and_topics():
    context = {
        "entities": [
            {"knowledge": {"name": "Adrian", "type": ["person"]}},
            {"knowledge": {"name": "Children of Time", "type": ["book"]}},
        ],
        "topics": [{"knowledge": {"knowledge_type": "topic", "text": "sci-fi"}}],
    }
    prompt = "[ANSWER CONTEXT]\n===\n" + pprint.pformat(context, width=200) + "\n==="
    model = CannedChatModel()
    result = await model.complete(_msg(prompt))
    assert isinstance(result, Success)
    parsed = json.loads(result.value)
    assert parsed["type"] == "Answered"
    assert "Adrian" in parsed["answer"]
    assert "Children of Time" in parsed["answer"]
    assert "sci-fi" in parsed["answer"]


async def test_answer_empty_context_is_noanswer():
    model = CannedChatModel()
    result = await model.complete(_msg("[ANSWER CONTEXT]\n===\n{}\n==="))
    assert isinstance(result, Success)
    assert json.loads(result.value)["type"] == "NoAnswer"


async def test_combine_blends_and_dedupes_partials():
    model = CannedChatModel()
    prompt = (
        "*** Original Question ***\nList all books\n*** Partial answers ***\n"
        "===\nChildren of Time. Shards of Earth.\n===\n"
        "Shards of Earth. Cage of Souls.\n===\n"
    )
    result = await model.complete(_msg(prompt))
    assert isinstance(result, Success)
    parsed = json.loads(result.value)
    assert parsed["type"] == "Answered"
    assert parsed["answer"].count("Shards of Earth") == 1
    assert "Children of Time" in parsed["answer"]
    assert "Cage of Souls" in parsed["answer"]
    assert model.calls["combine"] == 1


async def test_unrecognized_prompt_shape_fails():
    model = CannedChatModel()
    result = await model.complete(_msg("what is the weather"))
    assert isinstance(result, Failure)


# ---------------------------------------------------------------------------
# Integration: 4-stage replay vs committed goldens (subset for speed; the
# full 67-query sweep runs in `make eval-episode53`)
# ---------------------------------------------------------------------------

needs_corpus = pytest.mark.skipif(
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


@needs_corpus
async def test_four_stage_replay_matches_answer_goldens(conversation):
    corpus = ev.load_query_corpus()[:2]
    with open(ev.ANSWERS_GOLDEN_FILE) as f:
        golden = json.load(f)
    records = await ev.replay_answers(conversation, corpus, use_device_executor=False)
    # [query0, query1, blend-of-first-two, callCounts]
    assert records[0] == golden[0]
    assert records[1] == golden[1]
    assert records[2] == golden[-2]  # the combine-coverage blend record
    counts = records[3]["callCounts"]
    assert counts["stage1"] == 2
    assert counts["combine"] == 1  # combine_answers really ran
    # Each replayed answer came from the crafted stage-4 path, not a stub.
    assert all(r["combined"]["type"] == "Answered" for r in records[:3])


@needs_corpus
async def test_query_entrypoint_runs_all_four_stages(conversation):
    """ConversationBase.query() end-to-end over the canned model: the public
    entry point wires the same translators the replay uses."""
    from typeagent_tpu.knowpro import answers, searchlang

    corpus = ev.load_query_corpus()
    model = CannedChatModel({e["searchText"]: e["searchQueryExpr"] for e in corpus})
    conversation._query_translator = searchlang.create_search_query_translator(model)
    conversation._answer_translator = answers.create_answer_translator(model)
    answer = await conversation.query(corpus[0]["searchText"])
    assert isinstance(answer, str) and answer
    assert "Search failed" not in answer
    assert model.calls["stage1"] == 1 and model.calls["answer"] >= 1
