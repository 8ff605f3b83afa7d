"""Domain adapters: podcasts, WebVTT transcripts, emails."""

import os
from datetime import datetime, timezone

import pytest

from typeagent_tpu.emails.email_import import (
    get_last_response_in_thread,
    import_email_string,
)
from typeagent_tpu.emails.email_memory import EmailMemory
from typeagent_tpu.emails.email_message import EmailMessage
from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.interfaces import SearchTerm, SearchTermGroup, Term
from typeagent_tpu.knowpro.search import SearchOptions, search_conversation
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.podcasts.podcast import Podcast, split_participant_name
from typeagent_tpu.podcasts.podcast_ingest import (
    assign_timestamps_proportionally,
    ingest_podcast,
    parse_podcast_transcript,
)
from typeagent_tpu.transcripts import vtt
from typeagent_tpu.transcripts.transcript_ingest import (
    get_transcript_duration,
    get_transcript_speakers,
    ingest_vtt_transcript,
    parse_voice_tags,
)

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")


def make_settings():
    settings = ConversationSettings(model=create_test_embedding_model(16))
    settings.semantic_ref_index_settings.auto_extract_knowledge = False
    return settings


# ---------------------------------------------------------------------------
# Podcasts
# ---------------------------------------------------------------------------


def test_parse_podcast_transcript():
    with open(os.path.join(TESTDATA, "mini_podcast.txt")) as f:
        msgs = parse_podcast_transcript(f.readlines())
    assert len(msgs) == 4
    assert msgs[0].metadata.speaker == "alice johnson"
    assert msgs[1].metadata.speaker == "bob"
    # Continuation line folded into Bob's message
    assert "Keyserlingk" in msgs[1].text_chunks[0]
    # Listeners = other participants
    assert msgs[0].metadata.recipients == ["bob"]
    assert msgs[1].metadata.recipients == ["alice johnson"]


def test_assign_timestamps_proportionally():
    with open(os.path.join(TESTDATA, "mini_podcast.txt")) as f:
        msgs = parse_podcast_transcript(f.readlines())
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    assign_timestamps_proportionally(msgs, base, 60.0)
    assert msgs[0].timestamp == "2024-01-01T00:00:00Z"
    stamps = [m.timestamp for m in msgs]
    assert stamps == sorted(stamps)
    assert all(ts.endswith("Z") for ts in stamps)


async def test_ingest_podcast_end_to_end():
    settings = make_settings()
    pod = await ingest_podcast(
        os.path.join(TESTDATA, "mini_podcast.txt"),
        settings,
        start_date=datetime(2024, 1, 1, tzinfo=timezone.utc),
        length_minutes=10.0,
    )
    assert isinstance(pod, Podcast)
    assert await pod.messages.size() == 4
    # Metadata knowledge indexed (speakers as entities)
    found = await search_conversation(
        pod,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("bob"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="bob",
    )
    assert found.knowledge_matches
    # Participant aliases built on demand
    await pod.build_participant_aliases()
    aliases = pod.secondary_indexes.term_to_related_terms_index.aliases
    related = await aliases.lookup_term("alice")
    assert related and "alice johnson" in {t.text for t in related}


async def test_podcast_snapshot_roundtrip(tmp_path):
    settings = make_settings()
    pod = await ingest_podcast(
        os.path.join(TESTDATA, "mini_podcast.txt"), settings,
        start_date=datetime(2024, 1, 1, tzinfo=timezone.utc),
    )
    base = str(tmp_path / "pod")
    await pod.write_to_file(base)
    assert os.path.exists(base + "_data.json")
    assert os.path.exists(base + "_embeddings.bin")

    pod2 = await Podcast.read_from_file(base, make_settings())
    assert await pod2.messages.size() == 4
    assert pod2.name_tag == pod.name_tag
    found = await search_conversation(
        pod2,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("bob"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="bob",
    )
    assert found.knowledge_matches


def test_split_participant_name():
    assert split_participant_name("alice").first_name == "alice"
    p = split_participant_name("alice johnson")
    assert (p.first_name, p.last_name) == ("alice", "johnson")
    p = split_participant_name("ludwig van beethoven")
    assert (p.first_name, p.last_name) == ("ludwig", "van beethoven")


# ---------------------------------------------------------------------------
# Transcripts / VTT
# ---------------------------------------------------------------------------


def test_vtt_parser():
    captions = vtt.read(os.path.join(TESTDATA, "mini.vtt"))
    assert len(captions) == 4  # NOTE block skipped; cue ids optional
    assert captions[0].start == "00:00:01.000"
    assert "Welcome everyone" in captions[0].text
    assert "<v Alice>" in captions[0].raw_text
    assert "<v" not in captions[0].text


def test_vtt_timestamp_to_seconds():
    assert vtt.timestamp_to_seconds("00:01:30.500") == pytest.approx(90.5)
    assert vtt.timestamp_to_seconds("01:30.500") == pytest.approx(90.5)


def test_parse_voice_tags():
    assert parse_voice_tags("<v Alice>Hello there</v>") == [("Alice", "Hello there")]
    assert parse_voice_tags("<v A>Hi<v B>Yo") == [("A", "Hi"), ("B", "Yo")]
    assert parse_voice_tags("no tags here") == [(None, "no tags here")]


def test_transcript_probes():
    path = os.path.join(TESTDATA, "mini.vtt")
    assert get_transcript_speakers(path) == {"Alice", "Bob"}
    assert get_transcript_duration(path) == pytest.approx(15.0)


async def test_ingest_vtt_transcript():
    settings = make_settings()
    transcript = await ingest_vtt_transcript(
        os.path.join(TESTDATA, "mini.vtt"),
        settings,
        start_date=datetime(2024, 2, 1, tzinfo=timezone.utc),
    )
    # Bob's consecutive cues merged -> 3 messages
    assert await transcript.messages.size() == 3
    m1 = await transcript.messages.get_item(1)
    assert m1.metadata.speaker == "Bob"
    assert "baroque keyboard works" in m1.text_chunks[0]
    # Timestamp = base + cue offset
    assert m1.timestamp == "2024-02-01T00:00:04.500000Z"


@pytest.mark.skipif(
    not os.path.exists("/root/reference/tests/testdata/Parrot_Sketch.vtt"),
    reason="reference fixture not available",
)
def test_vtt_parser_against_reference_fixture():
    captions = vtt.read("/root/reference/tests/testdata/Parrot_Sketch.vtt")
    assert len(captions) > 10
    speakers = get_transcript_speakers("/root/reference/tests/testdata/Parrot_Sketch.vtt")
    assert speakers  # voice tags present in this fixture


# ---------------------------------------------------------------------------
# Emails
# ---------------------------------------------------------------------------


def test_import_email_string():
    with open(os.path.join(TESTDATA, "sample.eml")) as f:
        email = import_email_string(f.read())
    assert email.metadata.sender == "Alice Johnson <alice@example.com>"
    assert len(email.metadata.recipients) == 2
    assert email.metadata.cc == ["dave@example.com"]
    assert email.metadata.subject == "Quarterly report draft"
    assert email.metadata.id == "<abc123@example.com>"
    assert email.timestamp.startswith("2024-05-06T10:30:00")
    # Subject prepended to body
    assert email.text_chunks[0].startswith("Quarterly report draft")
    assert "revenue numbers" in email.text_chunks[0]


def test_email_metadata_knowledge():
    with open(os.path.join(TESTDATA, "sample.eml")) as f:
        email = import_email_string(f.read())
    knowledge = email.get_knowledge()
    names = {e.name for e in knowledge.entities}
    assert "Alice Johnson" in names
    assert "alice@example.com" in names
    assert "email" in names
    verbs = {v for a in knowledge.actions for v in a.verbs}
    assert verbs == {"sent", "received"}
    assert knowledge.topics == ["Quarterly report draft"]


def test_get_last_response_in_thread():
    text = "Latest reply here.\n\nFrom: Someone <x@y.z>\nSent: Monday\nOld text"
    assert get_last_response_in_thread(text) == "Latest reply here."
    text2 = "Reply\n\n-----Original Message-----\nolder"
    assert get_last_response_in_thread(text2) == "Reply"


async def test_email_memory_end_to_end():
    settings = make_settings()
    memory = await EmailMemory.create(settings, name="mailbox")
    # EmailMemory force-enables LLM extraction (parity); disable for hermetic test.
    memory.settings.semantic_ref_index_settings.auto_extract_knowledge = False
    with open(os.path.join(TESTDATA, "sample.eml")) as f:
        email = import_email_string(f.read())
    email.source_id = email.metadata.id
    await memory.add_messages_with_indexing([email])
    assert await memory.messages.size() == 1
    # noise terms loaded; searchable-term filter active
    assert "the" in memory.noise_terms
    assert not memory._is_searchable_term("the")
    assert memory._is_searchable_term("quarterly")
    # verb synonyms loaded into aliases
    aliases = memory.secondary_indexes.term_to_related_terms_index.aliases
    related = await aliases.lookup_term("wrote")
    assert related and related[0].text == "send"
    # metadata knowledge searchable
    found = await search_conversation(
        memory,
        SearchTermGroup(boolean_op="or", terms=[SearchTerm(Term("alice johnson"))]),
        options=SearchOptions(exact_match=True),
        raw_search_query="alice",
    )
    assert found.knowledge_matches
    # restartability
    assert await memory.storage_provider.is_source_ingested("<abc123@example.com>")
