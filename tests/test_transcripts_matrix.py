"""Deep matrix for transcript ingestion: speaker extraction, name splitting,
speaker aliases, and snapshot round-trips.

Reference parity: /root/reference/tests/test_transcripts.py (speaker
extraction formats, timestamp conversion, split_speaker_name incl. the
"van" particle, alias bidirectionality, serialize/deserialize round-trip,
deserialize-into-non-empty raises).
"""

import os
from datetime import datetime, timezone

import pytest

from typeagent_tpu.knowpro.convsettings import ConversationSettings
from typeagent_tpu.knowpro.nameutils import (
    SpeakerName,
    collect_speaker_aliases,
    split_speaker_name,
)
from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.transcripts import vtt
from typeagent_tpu.transcripts.transcript import Transcript
from typeagent_tpu.transcripts.transcript_ingest import (
    extract_speaker_from_text,
    ingest_vtt_transcript,
    parse_vtt_messages,
    webvtt_timestamp_to_seconds,
)

FULL_NAME_VTT = """\
WEBVTT

00:00:01.000 --> 00:00:04.000
<v Kevin Scott>Welcome to the show.

00:00:04.500 --> 00:00:08.000
<v Ada Lovelace>Happy to be here, Kevin.

00:00:08.500 --> 00:00:12.000
<v Kevin Scott>Let's talk about engines.
"""


def make_settings():
    settings = ConversationSettings(model=create_test_embedding_model(16))
    settings.semantic_ref_index_settings.auto_extract_knowledge = False
    return settings


async def ingest_full_name_vtt(tmp_path, name="fullnames"):
    path = str(tmp_path / f"{name}.vtt")
    with open(path, "w") as f:
        f.write(FULL_NAME_VTT)
    return await ingest_vtt_transcript(
        path, make_settings(), start_date=datetime(2024, 3, 1, tzinfo=timezone.utc)
    )


# ---------------------------------------------------------------------------
# Speaker extraction from cue text (no voice tags)
# ---------------------------------------------------------------------------

SPEAKER_TEXT_CASES = [
    ("SPEAKER: Hello world", "SPEAKER", "Hello world"),
    ("[John] This is a test", "John", "This is a test"),
    ("- Mary: Another test", "Mary", "Another test"),
    ("Just plain text without speaker", None, "Just plain text without speaker"),
    ("VETERINARIAN: How can I help you?", "VETERINARIAN", "How can I help you?"),
    ("(Dr. Smith) Let me examine the patient", "Dr. Smith", "Let me examine the patient"),
    ("", None, ""),
    ("NARRATOR: Once upon a time...", "NARRATOR", "Once upon a time..."),
    # lowercase colon prefixes are NOT treated as speakers (uppercase-only rule)
    ("note: not a speaker", None, "note: not a speaker"),
]


@pytest.mark.parametrize("text,speaker,rest", SPEAKER_TEXT_CASES)
def test_extract_speaker_from_text(text, speaker, rest):
    assert extract_speaker_from_text(text) == (speaker, rest)


TIMESTAMP_CASES = [
    ("00:00:07.599", 7.599),
    ("00:01:30.000", 90.0),
    ("01:05:45.123", 3945.123),
    ("10.5", 10.5),  # bare seconds
    ("01:30", 90.0),  # MM:SS
]


@pytest.mark.parametrize("ts,seconds", TIMESTAMP_CASES)
def test_webvtt_timestamp_to_seconds(ts, seconds):
    assert webvtt_timestamp_to_seconds(ts) == pytest.approx(seconds, abs=1e-3)


# ---------------------------------------------------------------------------
# Name splitting & alias collection
# ---------------------------------------------------------------------------


class TestSplitSpeakerName:
    def test_empty_returns_none(self):
        assert split_speaker_name("") is None
        assert split_speaker_name("   ") is None

    def test_single_word(self):
        assert split_speaker_name("alice") == SpeakerName(first_name="alice")

    def test_two_words(self):
        assert split_speaker_name("alice johnson") == SpeakerName(
            first_name="alice", last_name="johnson"
        )

    def test_three_words_middle_name(self):
        assert split_speaker_name("johann sebastian bach") == SpeakerName(
            first_name="johann", middle_name="sebastian", last_name="bach"
        )

    def test_van_particle_merges_into_last_name(self):
        assert split_speaker_name("ludwig van beethoven") == SpeakerName(
            first_name="ludwig", last_name="van beethoven"
        )
        # Case-insensitive particle
        assert split_speaker_name("Ludwig VAN Beethoven") == SpeakerName(
            first_name="Ludwig", last_name="VAN Beethoven"
        )

    def test_extra_whitespace_collapsed_in_long_last_name(self):
        parsed = split_speaker_name("maria de   la cruz")
        assert parsed == SpeakerName(
            first_name="maria", middle_name="de", last_name="la cruz"
        )


class TestCollectSpeakerAliases:
    def test_full_name_aliases_both_directions(self):
        aliases = collect_speaker_aliases(["Kevin Scott", "Kevin Scott"])
        assert aliases["kevin"] == {"kevin scott"}
        assert aliases["kevin scott"] == {"kevin"}

    def test_single_word_names_alias_nothing(self):
        assert collect_speaker_aliases(["alice", "BOB"]) == {}

    def test_none_and_empty_skipped(self):
        assert collect_speaker_aliases([None, "", "Ada Lovelace"]) == {
            "ada": {"ada lovelace"},
            "ada lovelace": {"ada"},
        }

    def test_shared_first_names_accumulate(self):
        aliases = collect_speaker_aliases(["Ada Lovelace", "Ada Yonath"])
        assert aliases["ada"] == {"ada lovelace", "ada yonath"}
        assert aliases["ada lovelace"] == {"ada"}
        assert aliases["ada yonath"] == {"ada"}


# ---------------------------------------------------------------------------
# Transcript speaker aliases end-to-end
# ---------------------------------------------------------------------------


async def test_transcript_build_speaker_aliases(tmp_path):
    transcript = await ingest_full_name_vtt(tmp_path)
    assert isinstance(transcript, Transcript)
    await transcript.build_speaker_aliases()
    aliases = transcript.secondary_indexes.term_to_related_terms_index.aliases
    related = await aliases.lookup_term("kevin")
    assert related and {t.text for t in related} == {"kevin scott"}
    reverse = await aliases.lookup_term("kevin scott")
    assert reverse and {t.text for t in reverse} == {"kevin"}
    related_ada = await aliases.lookup_term("ada")
    assert related_ada and {t.text for t in related_ada} == {"ada lovelace"}


async def test_transcript_snapshot_roundtrip(tmp_path):
    transcript = await ingest_full_name_vtt(tmp_path)
    assert await transcript.messages.size() == 3  # two Kevin cues NOT adjacent
    base = str(tmp_path / "snap")
    await transcript.write_to_file(base)
    assert os.path.exists(base + "_data.json")

    restored = await Transcript.read_from_file(base, make_settings())
    assert await restored.messages.size() == 3
    m0 = await restored.messages.get_item(0)
    assert m0.metadata.speaker == "Kevin Scott"
    assert m0.timestamp == "2024-03-01T00:00:01Z"
    assert restored.name_tag == transcript.name_tag


async def test_transcript_deserialize_non_empty_raises(tmp_path):
    transcript = await ingest_full_name_vtt(tmp_path)
    data = await transcript.serialize()
    with pytest.raises(RuntimeError, match="non-empty"):
        await transcript.deserialize(data)


async def test_aliases_rebuilt_when_snapshot_lacks_related_terms(tmp_path):
    transcript = await ingest_full_name_vtt(tmp_path)
    data = await transcript.serialize()
    data.pop("relatedTermsIndexData", None)

    fresh = await Transcript.create(make_settings(), name="fresh")
    await fresh.deserialize(data)
    aliases = fresh.secondary_indexes.term_to_related_terms_index.aliases
    related = await aliases.lookup_term("ada")
    assert related and {t.text for t in related} == {"ada lovelace"}


# ---------------------------------------------------------------------------
# parse_vtt_messages knobs
# ---------------------------------------------------------------------------


def _caption(start, end, raw):
    text = vtt.parse(f"WEBVTT\n\n{start} --> {end}\n{raw}\n")[0]
    return text


def test_text_based_speaker_detection():
    captions = vtt.parse(
        "WEBVTT\n\n"
        "00:00:01.000 --> 00:00:02.000\nNARRATOR: Once upon a time\n\n"
        "00:00:02.500 --> 00:00:04.000\nplain continuation text\n"
    )
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    msgs = parse_vtt_messages(
        captions, base, use_text_based_speaker_detection=True
    )
    assert msgs[0].metadata.speaker == "NARRATOR"
    assert msgs[0].text_chunks[0] == "Once upon a time"
    # the untagged cue has no speaker -> separate, speakerless message
    assert msgs[1].metadata.speaker is None


def test_merge_consecutive_same_speaker_disabled():
    captions = vtt.parse(
        "WEBVTT\n\n"
        "00:00:01.000 --> 00:00:02.000\n<v Bob>First cue.\n\n"
        "00:00:02.500 --> 00:00:04.000\n<v Bob>Second cue.\n"
    )
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    merged = parse_vtt_messages(captions, base, merge_consecutive_same_speaker=True)
    assert len(merged) == 1
    assert merged[0].text_chunks == ["First cue. Second cue."]
    unmerged = parse_vtt_messages(captions, base, merge_consecutive_same_speaker=False)
    assert len(unmerged) == 2
    assert unmerged[1].timestamp == "2024-01-01T00:00:02.500000Z"
