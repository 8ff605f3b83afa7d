"""Format compatibility with the reference's real serialized fixture.

Loads microsoft/typeagent-py's Episode-53 index snapshot (camelCase JSON;
its embedding sidecar is absent, so embeddings are recomputed through the
model — the reference's own tooling does the same) and verifies the full
six-index rebuild + search.
"""

import os

import pytest

from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.interfaces import (
    PropertySearchTerm,
    SearchTerm,
    SearchTermGroup,
    Term,
)
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation_knowledge
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.podcasts.podcast import Podcast

FIXTURE = "/root/reference/tests/testdata/Episode_53_AdrianTchaikovsky_index"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE + "_data.json"),
    reason="reference fixture not available",
)


async def load_episode53():
    settings = ConversationSettings(model=create_test_embedding_model(1536))
    return await Podcast.read_from_file(FIXTURE, settings)


async def test_load_reference_episode53_index():
    pod = await load_episode53()
    assert pod.name_tag == "E53"
    assert await pod.messages.size() == 106
    assert await pod.semantic_refs.size() == 1641
    assert await pod.semantic_ref_index.size() == 1188
    sec = pod.secondary_indexes
    assert await sec.message_index.size() == 106
    assert await sec.term_to_related_terms_index.fuzzy_index.size() == 1188
    # Messages deserialized with metadata intact (message 0 is an
    # unattributed title card; later turns carry speakers).
    m0 = await pod.messages.get_item(0)
    assert m0.text_chunks and m0.timestamp
    speakers = {
        (await pod.messages.get_item(i)).metadata.speaker for i in range(1, 10)
    }
    assert any(speakers)


async def test_search_reference_episode53_index():
    pod = await load_episode53()
    result = await search_conversation_knowledge(
        pod,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("spider"))]),
        options=SearchOptions(exact_match=True),
    )
    assert "entity" in result
    top = await pod.semantic_refs.get_item(
        result["entity"].semantic_ref_matches[0].semantic_ref_ordinal
    )
    assert top.knowledge.name == "spider"
    # Property index rebuilt from the deserialized semrefs.
    result = await search_conversation_knowledge(
        pod,
        SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    "name", SearchTerm(Term("Adrian Tchaikovsky"), related_terms=[])
                )
            ],
        ),
        options=SearchOptions(exact_match=True),
    )
    assert result and "entity" in result


async def test_episode53_action_and_facet_search():
    """SVO property search + facet search over the reference's real index."""
    pod = await load_episode53()
    # Subject search: actions performed by the podcast host.
    result = await search_conversation_knowledge(
        pod,
        SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    "subject",
                    SearchTerm(Term("Adrian Tchaikovsky"), related_terms=[]),
                )
            ],
        ),
        options=SearchOptions(exact_match=True),
    )
    assert result and "action" in result
    top = await pod.semantic_refs.get_item(
        result["action"].semantic_ref_matches[0].semantic_ref_ordinal
    )
    from typeagent_tpu.knowpro import kplib
    assert isinstance(top.knowledge, kplib.Action)
    assert top.knowledge.subject_entity_name.lower() == "adrian tchaikovsky"


async def test_episode53_topic_and_tag_shapes():
    pod = await load_episode53()
    result = await search_conversation_knowledge(
        pod,
        SearchTermGroup(
            boolean_op="or",
            terms=[PropertySearchTerm("topic", SearchTerm(Term("*")))],
        ),
        options=SearchOptions(exact_match=True, max_knowledge_matches=20),
    )
    assert result and "topic" in result
    assert len(result["topic"].semantic_ref_matches) == 20
    # Every matched ordinal dereferences to a Topic semref.
    from typeagent_tpu.knowpro.interfaces import Topic

    for m in result["topic"].semantic_ref_matches[:5]:
        sr = await pod.semantic_refs.get_item(m.semantic_ref_ordinal)
        assert isinstance(sr.knowledge, Topic)


async def test_episode53_device_executor_agrees_with_host():
    """Device postings executor over the real 1641-semref index."""
    pod = await load_episode53()
    group = SearchTermGroup(
        boolean_op="or",
        terms=[SearchTerm(Term("spider")), SearchTerm(Term("evolution"))],
    )
    host = await search_conversation_knowledge(
        pod, group, options=SearchOptions(exact_match=True)
    )
    device = await search_conversation_knowledge(
        pod, group, options=SearchOptions(exact_match=True, use_device_executor=True)
    )
    def keys(r):
        return {
            (kt, m.semantic_ref_ordinal)
            for kt, res in (r or {}).items()
            for m in res.semantic_ref_matches
        }
    assert keys(device) == keys(host) != set()


async def test_episode53_pinned_goldens():
    """Exact semref ordinals + scores for structured searches over the
    reference's real index, pinned in tests/testdata/golden_episode53.json.
    Any regression in index rebuild, scoring, or format parity breaks this."""
    import json

    golden_path = os.path.join(
        os.path.dirname(__file__), "testdata", "golden_episode53.json"
    )
    golden = json.load(open(golden_path))
    queries = {
        "spider-or-evolution": SearchTermGroup(
            boolean_op="or",
            terms=[SearchTerm(Term("spider")), SearchTerm(Term("evolution"))],
        ),
        "name-adrian": SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    "name", SearchTerm(Term("Adrian Tchaikovsky"), related_terms=[])
                )
            ],
        ),
        "subject-adrian-actions": SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    "subject",
                    SearchTerm(Term("Adrian Tchaikovsky"), related_terms=[]),
                )
            ],
        ),
        "topic-books": SearchTermGroup(
            boolean_op="or",
            terms=[
                PropertySearchTerm(
                    "topic", SearchTerm(Term("science fiction"), related_terms=[])
                )
            ],
        ),
    }
    pod = await load_episode53()
    for case in golden:
        result = await search_conversation_knowledge(
            pod,
            queries[case["name"]],
            options=SearchOptions(exact_match=True, max_knowledge_matches=10),
        )
        got = {
            ktype: [
                [m.semantic_ref_ordinal, round(m.score, 4)]
                for m in r.semantic_ref_matches
            ]
            for ktype, r in sorted((result or {}).items())
        }
        assert got == case["matches"], case["name"]
