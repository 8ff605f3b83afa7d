"""Full streaming ingest of the real Episode-53 transcript (offline).

Exercises the whole pipeline at realistic scale: 100+ speaker turns through
producer/dispatcher/reassembler with batched commits into SQLite, then
search + snapshot.
"""

import os

import pytest

from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.podcasts.podcast_ingest import ingest_podcast, parse_podcast_transcript

TRANSCRIPT = "/root/reference/tests/testdata/Episode_53_AdrianTchaikovsky.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TRANSCRIPT), reason="reference transcript not available"
)


def test_parse_episode53_turns():
    with open(TRANSCRIPT) as f:
        msgs = parse_podcast_transcript(f.readlines())
    assert len(msgs) > 50
    speakers = {m.metadata.speaker for m in msgs if m.metadata.speaker}
    assert {"kevin scott", "adrian tchaikovsky"} <= speakers
    # Listeners assigned: everyone else in the episode.
    kevin_msg = next(m for m in msgs if m.metadata.speaker == "kevin scott")
    assert "adrian tchaikovsky" in kevin_msg.metadata.recipients


async def test_streaming_ingest_episode53_to_sqlite(tmp_path):
    db = str(tmp_path / "e53.db")
    settings = ConversationSettings(model=create_test_embedding_model(24))
    settings.semantic_ref_index_settings.auto_extract_knowledge = False
    pod = await ingest_podcast(
        TRANSCRIPT,
        settings,
        dbname=db,
        batch_size=16,  # many streaming commits
    )
    n = await pod.messages.size()
    assert n > 50
    assert await pod.semantic_refs.size() > n  # metadata knowledge per turn
    assert await pod.secondary_indexes.message_index.size() >= n

    # Proportional timestamps are monotonically non-decreasing.
    stamps = [
        (await pod.messages.get_item(i)).timestamp for i in range(0, n, 10)
    ]
    assert stamps == sorted(stamps)

    # Search for the guest across metadata knowledge.
    result = await search_conversation(
        pod,
        SearchTermGroup(
            boolean_op="or", terms=[SearchTerm(Term("adrian tchaikovsky"))]
        ),
        options=SearchOptions(exact_match=True, max_message_matches=5),
        raw_search_query="Adrian Tchaikovsky",
    )
    assert result.knowledge_matches["entity"].semantic_ref_matches
    assert result.message_matches

    # Source ids marked for restartability.
    assert await pod.storage_provider.is_source_ingested(f"{TRANSCRIPT}#0")
    await pod.storage_provider.close()
