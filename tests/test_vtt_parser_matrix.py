"""WebVTT parser edge matrix (transcripts/vtt.py — our own parser; the
reference depends on webvtt-py).

Pins the parser against the WebVTT constructs real transcript files use:
header metadata, BOM, NOTE/STYLE/REGION blocks, cue identifiers, short and
long timestamp forms, cue settings, multi-line payloads, voice tags, and
malformed inputs.
"""

import pytest

from typeagent_tpu.transcripts import vtt


def test_minimal_file():
    caps = vtt.parse("WEBVTT\n\n00:00.000 --> 00:02.000\nhello\n")
    assert len(caps) == 1
    assert caps[0].start == "00:00.000" and caps[0].end == "00:02.000"
    assert caps[0].text == "hello"


def test_header_with_metadata_line():
    content = "WEBVTT - This file has a description\n\n00:01.000 --> 00:02.000\nx\n"
    assert len(vtt.parse(content)) == 1


def test_bom_is_stripped():
    content = "﻿WEBVTT\n\n00:01.000 --> 00:02.000\nx\n"
    assert len(vtt.parse(content)) == 1


def test_missing_header_raises():
    with pytest.raises(vtt.WebVTTParseError, match="WEBVTT"):
        vtt.parse("00:01.000 --> 00:02.000\nx\n")


def test_empty_file_raises():
    with pytest.raises(vtt.WebVTTParseError):
        vtt.parse("")


def test_note_style_region_blocks_skipped():
    content = (
        "WEBVTT\n\n"
        "NOTE this is a comment\nspanning two lines\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "REGION\nid:bill width:40%\n\n"
        "00:01.000 --> 00:02.000\nactual cue\n"
    )
    caps = vtt.parse(content)
    assert [c.text for c in caps] == ["actual cue"]


def test_cue_identifiers_are_optional():
    content = (
        "WEBVTT\n\n"
        "intro-cue\n00:01.000 --> 00:02.000\nwith id\n\n"
        "00:03.000 --> 00:04.000\nwithout id\n"
    )
    caps = vtt.parse(content)
    assert [c.text for c in caps] == ["with id", "without id"]


def test_hours_form_and_short_form_timestamps():
    content = (
        "WEBVTT\n\n"
        "01:02:03.500 --> 01:02:04.000\nlong form\n\n"
        "02:03.500 --> 02:04.000\nshort form\n"
    )
    caps = vtt.parse(content)
    assert caps[0].start == "01:02:03.500"
    assert caps[1].start == "02:03.500"


def test_cue_settings_after_timing_ignored():
    content = (
        "WEBVTT\n\n"
        "00:01.000 --> 00:02.000 position:10% line:5 align:start\npositioned\n"
    )
    caps = vtt.parse(content)
    assert caps[0].text == "positioned"
    assert caps[0].end == "00:02.000"


def test_multiline_payload_joined_with_newlines():
    content = "WEBVTT\n\n00:01.000 --> 00:02.000\nline one\nline two\n"
    caps = vtt.parse(content)
    assert caps[0].raw_text == "line one\nline two"
    assert caps[0].text == "line one\nline two"


def test_voice_tags_stripped_from_text_kept_in_raw():
    content = (
        "WEBVTT\n\n"
        "00:01.000 --> 00:02.000\n<v Shopkeeper>It's resting</v>\n"
    )
    caps = vtt.parse(content)
    assert "<v Shopkeeper>" in caps[0].raw_text
    assert caps[0].text == "It's resting"


def test_inline_formatting_tags_stripped():
    content = (
        "WEBVTT\n\n"
        "00:01.000 --> 00:02.000\n<b>bold</b> and <i.loud>italic</i>\n"
    )
    assert vtt.parse(content)[0].text == "bold and italic"


def test_garbage_between_cues_skipped():
    content = (
        "WEBVTT\n\n"
        "this line is not a cue and has no timing after it\n\n"
        "00:01.000 --> 00:02.000\nreal\n"
    )
    caps = vtt.parse(content)
    assert [c.text for c in caps] == ["real"]


def test_crlf_line_endings():
    content = "WEBVTT\r\n\r\n00:01.000 --> 00:02.000\r\nwindows\r\n"
    caps = vtt.parse(content)
    assert caps[0].text == "windows"


def test_no_trailing_newline():
    caps = vtt.parse("WEBVTT\n\n00:01.000 --> 00:02.000\nlast")
    assert caps[0].text == "last"


def test_consecutive_cues_no_ids():
    content = "WEBVTT\n\n" + "\n".join(
        f"00:0{i}.000 --> 00:0{i + 1}.000\ncue {i}\n" for i in range(1, 5)
    )
    caps = vtt.parse(content)
    assert [c.text for c in caps] == [f"cue {i}" for i in range(1, 5)]


@pytest.mark.parametrize(
    "ts,expected",
    [
        ("00:00.000", 0.0),
        ("00:01.500", 1.5),
        ("01:00.000", 60.0),
        ("01:02:03.250", 3723.25),
        ("10:00:00.000", 36000.0),
    ],
)
def test_timestamp_to_seconds(ts, expected):
    assert vtt.timestamp_to_seconds(ts) == pytest.approx(expected)


def test_read_roundtrip(tmp_path):
    p = tmp_path / "t.vtt"
    p.write_text(
        "WEBVTT\n\n00:01.000 --> 00:02.000\n<v Alice>hi there\n",
        encoding="utf-8",
    )
    caps = vtt.read(str(p))
    assert caps[0].text == "hi there"
